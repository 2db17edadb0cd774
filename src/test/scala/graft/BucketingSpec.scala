package graft

import graft.sources.{Bucketing, DataGen}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join with zero shuffle exchanges") {
    import spark.implicits._
    val users = DataGen.users(20, seed = 11L)
    val items = DataGen.items(50)
    val h0 = 1700000000L - (1700000000L % 3600)
    val views = DataGen.viewsDF(spark,
      DataGen.hourOfViews(users, items, h0, seed = 13L))
    val profile = users.map(u => (u.userIp, u.deviceType, if (u.isBot) 1 else 0))
      .toDF("user_ip", "device_type_p", "is_bot")

    spark.sql("DROP TABLE IF EXISTS views_b")
    spark.sql("DROP TABLE IF EXISTS profile_b")
    Bucketing.writeBucketed(views, "views_b", "user_ip", buckets = 8)
    Bucketing.writeBucketed(profile, "profile_b", "user_ip", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.bucketedJoin(spark, "views_b", "profile_b", "user_ip")
      assert(Bucketing.hasNoShuffle(joined.select(col("user_ip"), col("is_bot"))),
        "bucketed join plan contains an Exchange:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      // and it is the same result as the plain join
      val plain = views.join(profile, "user_ip").count()
      assert(joined.count() == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS views_b")
      spark.sql("DROP TABLE IF EXISTS profile_b")
    }
  }
}
