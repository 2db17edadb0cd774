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

  test("model scores a live reviews stream identically to the batch path") {
    val corpus = DataGen.smsCorpus(400, seed = 19L)
    val model = SpamFilter.train(DataGen.smsCorpusDF(spark, corpus.take(300)))
    val users = DataGen.users(8, seed = 53L)
    val items = DataGen.items(15)
    val reviews = DataGen.hourOfReviews(users, items, 1700000000L - (1700000000L % 3600))
    val inDir = java.nio.file.Files.createTempDirectory("graft-spam-stream").toString
    DataGen.reviewsDF(spark, reviews).write.mode("overwrite").json(inDir)

    // model.transform is row-local, so the SAME score() call runs on the
    // stream — the diagram's "Spam Filter (Lambda)" as a streaming stage
    val stream = graft.streaming.Streams.reviewsStream(spark, inDir)
    val q = SpamFilter.score(model, stream)
      .select(col("user_ip"), col("review_title"), col("spam_pred"))
      .writeStream.format("memory").queryName("spam_stream_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("spam_stream_test")
    assert(streamed.count() == reviews.size)
    // batch path over the identical input must agree prediction-for-prediction
    val batch = SpamFilter.score(model,
      graft.sources.EventLog.readJsonLines(spark, inDir,
        graft.sources.EventLog.reviewsRawSchema))
      .select(col("user_ip"), col("review_title"), col("spam_pred"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
