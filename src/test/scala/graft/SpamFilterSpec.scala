package graft

import graft.ml.SpamFilter
import graft.sources.DataGen
import org.apache.spark.sql.functions._

class SpamFilterSpec extends SparkSpec {

  test("NaiveBayes pipeline separates the corpus and scores reviews") {
    val corpus = DataGen.smsCorpus(400, seed = 19L)
    val (trainSeq, testSeq) = corpus.splitAt(300)
    val model = SpamFilter.train(DataGen.smsCorpusDF(spark, trainSeq))

    val acc = SpamFilter.accuracy(model, DataGen.smsCorpusDF(spark, testSeq))
    assert(acc >= 0.95, s"held-out accuracy $acc below 0.95")

    // scoring plugs into the reviews schema (title + text concat)
    val users = DataGen.users(10, seed = 11L)
    val items = DataGen.items(20)
    val reviews = DataGen.reviewsDF(spark,
      DataGen.hourOfReviews(users, items, 1700000000L - (1700000000L % 3600)))
    val scored = SpamFilter.score(model, reviews)
    assert(scored.columns.contains("spam_pred"))
    assert(scored.count() == reviews.count())
    val preds = scored.select(countDistinct(col("spam_pred"))).head().getLong(0)
    assert(preds >= 1 && preds <= 2)
  }
}
