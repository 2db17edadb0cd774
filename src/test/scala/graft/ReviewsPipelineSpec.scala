package graft

import java.nio.file.Files

import graft.ml.SpamFilter
import graft.operators.ViewsPipeline
import graft.sources.{DataGen, EventLog}
import org.apache.spark.sql.functions._

/** End-to-end reviews pipeline (reference diagram.svg:3 reviews branch):
  * JSON-lines reviews → IP filter → spam filter → per-item review-score
  * analytics, in batch and with streaming spam scoring. */
class ReviewsPipelineSpec extends SparkSpec {

  test("reviews branch end-to-end: filter, score, aggregate; batch == stream") {
    val users = DataGen.users(20, seed = 11L)
    val items = DataGen.items(40)
    val hourStart = 1700000000L - (1700000000L % 3600)
    val reviews = DataGen.hourOfReviews(users, items, hourStart, seed = 17L)
    val botIps = users.filter(_.isBot).map(_.userIp).toSet

    val inDir = Files.createTempDirectory("graft-reviews").toString
    DataGen.reviewsDF(spark, reviews).write.mode("overwrite").json(inDir)

    // S3: schema-on-read scan of the reviews stream drop
    val raw = EventLog.readJsonLines(spark, inDir, EventLog.reviewsRawSchema)
    val cleaned = ViewsPipeline.clean(raw)

    // F1: IP filter against the detected deny set (from the views-side job)
    val denied = DataGen.usersDF(spark, users.filter(_.isBot))
      .select(col("user_ip"), (current_timestamp() + expr("INTERVAL 1 HOUR")).as("expires_at"))
    val filtered = ViewsPipeline.filterSuspicious(cleaned, denied, current_timestamp())
    assert(filtered.filter(col("user_ip").isin(botIps.toSeq: _*)).count() == 0)

    // M1: spam scoring
    val model = SpamFilter.train(DataGen.smsCorpusDF(spark, DataGen.smsCorpus(300)))
    val scored = SpamFilter.score(model, filtered)
    assert(scored.count() == filtered.count())

    // A6: per-item review-score aggregates over ham reviews
    val ham = scored.filter(col("spam_pred") === 0.0)
    val agg = ham.groupBy(col("item_id"))
      .agg(count(lit(1)).as("n_reviews"), avg(col("review_stars")).as("avg_stars"))
    val rows = agg.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(r.fieldIndex("avg_stars")) >= 0
      && r.getDouble(r.fieldIndex("avg_stars")) <= 5))

    // streaming twin: the same model.transform inside a file stream
    val stream = spark.readStream.schema(EventLog.reviewsRawSchema)
      .json(inDir).transform(ViewsPipeline.clean)
    val q = SpamFilter.score(model, stream)
      .writeStream.format("memory").queryName("reviews_scored")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("reviews_scored")
    assert(streamed.count() == cleaned.count()) // unfiltered stream, all rows scored
    // batch and stream agree on per-row spam predictions
    val b = scored.select("user_ip", "ts", "item_id", "spam_pred")
    val st = streamed.select("user_ip", "ts", "item_id", "spam_pred")
    assert(st.join(b, Seq("user_ip", "ts", "item_id", "spam_pred"), "left_semi").count() ==
      b.count())
  }
}
