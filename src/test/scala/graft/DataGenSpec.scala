package graft

import graft.sources.DataGen

class DataGenSpec extends SparkSpec {

  test("users are distinct by ip, labeled, ~10% bots") {
    val us = DataGen.users(50, seed = 11L)
    assert(us.size == 50)
    assert(us.map(_.userIp).distinct.size == 50)
    val bots = us.count(_.isBot)
    assert(bots >= 1 && bots <= 15, s"expected ~5 bots in 50, got $bots")
    // NULL sentinel only on 'other' devices (reference generator.py:75)
    assert(us.forall(u => (u.deviceId == "NULL") == (u.deviceType == "other")))
  }

  test("items cover 1000..1099 with categories 1..13") {
    val is = DataGen.items(100)
    assert(is.map(_.itemId) == (1000 until 1100).map(_.toString))
    assert(is.forall(i => (1 to 13).contains(i.category.toInt)))
  }

  test("human hours are evenly spaced <=1000 events; bot hours burst sub-second") {
    val us = DataGen.users(30, seed = 11L)
    val is = DataGen.items(100)
    val start = 1700000000L - (1700000000L % 3600)
    val views = DataGen.hourOfViews(us, is, start, seed = 13L)
    val byUser = views.groupBy(_.userIp)
    val botIps = us.filter(_.isBot).map(_.userIp).toSet
    assert(botIps.nonEmpty)
    val humanCounts = byUser.filter(v => !botIps.contains(v._1)).map(_._2.size)
    assert(humanCounts.forall(c => c >= 100 && c <= 1000))
    val botCounts = byUser.filter(v => botIps.contains(v._1)).map(_._2.size)
    // bots emit at ~1 line/sec expected -> well above most humans' floor
    assert(botCounts.forall(_ > 1000), s"bot counts too low: $botCounts")
    // events globally sorted
    assert(views.map(_.ts) == views.map(_.ts).sorted)
  }

  test("distributed generation is deterministic and keeps the rate envelope") {
    val us = DataGen.users(30, seed = 31L)
    val is = DataGen.items(40)
    def gen() = DataGen.distViews(spark, us, is, 1700000000L, hours = 1, seed = 7L)
    val a = gen().collect().map(_.toString).sorted.toSeq
    val b = gen().collect().map(_.toString).sorted.toSeq
    assert(a == b, "same seed must produce identical rows")
    // per-user rates stay inside the reference envelope: humans <= 1000/hr
    val perUser = gen().groupBy("user_ip").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bots = us.filter(_.isBot).map(_.userIp).toSet
    perUser.foreach { case (ip, n) =>
      if (bots.contains(ip)) assert(n > 100, s"bot $ip only $n rows")
      else assert(n >= 100 && n <= 1000, s"human $ip has $n rows")
    }
  }

  test("sms corpus is labeled, lowercase, mixed") {
    val c = DataGen.smsCorpus(200)
    assert(c.size == 200)
    assert(c.map(_.label).toSet == Set("ham", "spam"))
    assert(c.forall(l => l.text == l.text.toLowerCase))
    val spamFrac = c.count(_.label == "spam").toDouble / c.size
    assert(spamFrac > 0.05 && spamFrac < 0.3)
  }
}
