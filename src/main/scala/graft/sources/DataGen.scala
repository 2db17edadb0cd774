package graft.sources

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeded re-implementation of the reference workload generator
  * (reference log-generator/generator.py:71-193) — same schemas and
  * distributions, explicit seed, no AWS.
  *
  * Distributions (cited to the reference):
  *   - users: IPv4 a.b.c.d with a∈[11,191], b∈[1,223], c,d∈[1,254];
  *     device_type uniform over {mobile:ios, mobile:android, other};
  *     device_id ∈ [100000,1000000] or literal "NULL" for other;
  *     is_bot w.p. 0.1 (generator.py:71-77,37)
  *   - items: ids 1000..1099, category ∈ [1,13] (generator.py:80-84)
  *   - human hour: n ∈ [100,1000] lines evenly spaced 3600/n s
  *     (generator.py:125-136)
  *   - bot hour: inter-arrival 16 ms w.p. 0.85 else the human step,
  *     until the hour ends (generator.py:144-154)
  *   - events globally sorted by ts; ts format yyyy-MM-dd'T'HH:mm:ss'Z'
  *     (generator.py:156,42)
  *
  * The review corpus stands in for the UCI SMS corpus (unavailable
  * offline): deterministic ham/spam templates with the same shape —
  * lowercase text, label + text, spam ratio ~0.13.
  */
object DataGen {

  final case class User(userIp: String, deviceType: String, deviceId: String, isBot: Boolean)
  final case class Item(itemId: String, title: String, description: String, category: String)
  final case class View(itemId: String, ts: String, deviceType: String, deviceId: String, userIp: String)
  final case class Review(itemId: String, ts: String, deviceType: String, deviceId: String,
      userIp: String, reviewTitle: String, reviewText: String, reviewStars: Int)
  final case class LabeledSms(label: String, text: String)

  val TsFormat: DateTimeFormatter =
    DateTimeFormatter.ofPattern(EventLog.TsPattern).withZone(ZoneOffset.UTC)

  def items(n: Int = 100, seed: Long = 7L): Seq[Item] = {
    val rnd = new Random(seed)
    (1000 until (1000 + n)).map { id =>
      Item(id.toString, s"item #$id", s"description of item $id", (1 + rnd.nextInt(13)).toString)
    }
  }

  def users(n: Int = 50, seed: Long = 11L, botProbability: Double = 0.1): Seq[User] = {
    val rnd = new Random(seed)
    // distinct by IP, like the reference's dict-keyed-by-ip dedup
    Iterator.continually {
      val ip = s"${11 + rnd.nextInt(181)}.${1 + rnd.nextInt(223)}." +
        s"${1 + rnd.nextInt(254)}.${1 + rnd.nextInt(254)}"
      val dt = Seq("mobile:ios", "mobile:android", "other")(rnd.nextInt(3))
      val di = if (dt == "other") "NULL" else (100000 + rnd.nextInt(900001)).toString
      User(ip, dt, di, rnd.nextDouble() < botProbability)
    }.distinctBy(_.userIp).take(n).toSeq
  }

  /** One hour of view events for all users, globally sorted by ts. */
  def hourOfViews(us: Seq[User], is: Seq[Item], startEpochS: Long, seed: Long = 13L,
      minLines: Int = 100, maxLines: Int = 1000): Seq[View] = {
    val rnd = new Random(seed)
    val views = us.flatMap { u =>
      eventTimesForHour(u.isBot, startEpochS, rnd, minLines, maxLines).map { tMillis =>
        val item = is(rnd.nextInt(is.size))
        View(item.itemId, TsFormat.format(Instant.ofEpochSecond(tMillis / 1000)),
          u.deviceType, u.deviceId, u.userIp)
      }
    }
    views.sortBy(_.ts)
  }

  /** One hour of review events (views fields + title/text/stars). */
  def hourOfReviews(us: Seq[User], is: Seq[Item], startEpochS: Long, seed: Long = 17L,
      minLines: Int = 10, maxLines: Int = 100): Seq[Review] = {
    val rnd = new Random(seed)
    val corpus = smsCorpus()
    val reviews = us.flatMap { u =>
      eventTimesForHour(u.isBot, startEpochS, rnd, minLines, maxLines).map { tMillis =>
        val item = is(rnd.nextInt(is.size))
        val words = corpus(rnd.nextInt(corpus.size)).text.split(" ")
        Review(item.itemId, TsFormat.format(Instant.ofEpochSecond(tMillis / 1000)),
          u.deviceType, u.deviceId, u.userIp,
          words.take(3).mkString(" "), words.drop(3).mkString(" "), rnd.nextInt(6))
      }
    }
    reviews.sortBy(_.ts)
  }

  /** Event times (epoch millis) within [start, start+1h): even spacing for
    * humans, 16ms-burst mixture for bots (reference generator.py:125-154). */
  private def eventTimesForHour(isBot: Boolean, startEpochS: Long, rnd: Random,
      minLines: Int, maxLines: Int): Seq[Long] = {
    val endMs = (startEpochS + 3600) * 1000
    val nLines = minLines + rnd.nextInt(maxLines - minLines + 1)
    val stepMs = 3600000L / nLines
    if (!isBot) {
      Iterator.iterate(startEpochS * 1000)(_ + stepMs)
        .takeWhile(_ < endMs).take(nLines).toSeq
    } else {
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      var t = startEpochS * 1000
      while (t < endMs) {
        buf += t
        t += (if (rnd.nextDouble() < 0.15) stepMs else 16L)
      }
      buf.toSeq
    }
  }

  /** Distributed views generation: same distributions as [[hourOfViews]]
    * but synthesized executor-side — one task per user slice, a
    * deterministic per-(user,hour) RNG seed, no driver-side row
    * materialization. This is the 100 TB-shaped generator: scaling
    * users/hours scales tasks, not driver memory. */
  def distViews(s: SparkSession, us: Seq[User], is: Seq[Item], startEpochS: Long,
      hours: Int, seed: Long = 13L, minLines: Int = 100, maxLines: Int = 1000): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val users = us.toArray
    val items = is.toArray
    val slices = math.max(1, math.min(users.length, 256)) // 0 slices is illegal
    s.sparkContext.parallelize(users.indices, slices)
      .flatMap { ui =>
        val u = users(ui)
        (0 until hours).iterator.flatMap { h =>
          val rnd = new Random(seed ^ (ui.toLong << 20) ^ h.toLong)
          eventTimesForHour(u.isBot, startEpochS + h * 3600L, rnd, minLines, maxLines)
            .map { tMillis =>
              val item = items(rnd.nextInt(items.length))
              View(item.itemId, TsFormat.format(Instant.ofEpochSecond(tMillis / 1000)),
                u.deviceType, u.deviceId, u.userIp)
            }
        }
      }
      .toDF("item_id", "ts", "device_type", "device_id", "user_ip")
  }

  /** Deterministic stand-in for the SMS spam corpus (label, lowercase text). */
  def smsCorpus(n: Int = 400, seed: Long = 19L, spamRatio: Double = 0.13): Seq[LabeledSms] = {
    val rnd = new Random(seed)
    val hamTemplates = Seq(
      "ok lar i will meet you at the canteen later",
      "are we still going to the cinema tonight",
      "can you pick up milk on the way home",
      "see you at lunch then we can talk about the trip",
      "sorry i missed your call i was in a meeting",
      "happy birthday hope you have a lovely day",
      "the match starts at seven do you want to watch it",
      "i am running late the bus did not come",
      "thanks for the notes they really helped",
      "let me know when you get home safe")
    val spamTemplates = Seq(
      "congratulations you have won a free prize claim now by calling this number",
      "urgent your mobile number has been awarded a cash bonus text win to claim",
      "free entry in a weekly competition to win tickets text now",
      "you have been selected for a guaranteed loan apply today no credit check",
      "winner you have won a holiday call immediately to collect your reward",
      "claim your free ringtone now reply yes to subscribe special offer",
      "cash prize waiting for you dial the hotline before midnight",
      "exclusive deal just for you buy one get one free limited time offer")
    (0 until n).map { i =>
      val spam = rnd.nextDouble() < spamRatio
      val base = if (spam) spamTemplates(rnd.nextInt(spamTemplates.size))
        else hamTemplates(rnd.nextInt(hamTemplates.size))
      // vary the text so documents aren't exact dups
      LabeledSms(if (spam) "spam" else "ham", s"$base ${wordNoise(rnd)}")
    }
  }

  private def wordNoise(rnd: Random): String =
    Seq.fill(1 + rnd.nextInt(3))(Seq("today", "tomorrow", "friend", "please", "now",
      "soon", "maybe", "really")(rnd.nextInt(8))).mkString(" ")

  // ---- Spark-side constructors -------------------------------------

  def usersDF(s: SparkSession, us: Seq[User]): DataFrame = {
    import s.implicits._
    us.map(u => (u.userIp, u.deviceType, u.deviceId, if (u.isBot) "1" else "0"))
      .toDF("user_ip", "device_type", "device_id", "is_bot")
  }

  def itemsDF(s: SparkSession, is: Seq[Item]): DataFrame = {
    import s.implicits._
    is.map(i => (i.itemId, i.title, i.description, i.category))
      .toDF("item_id", "title", "description", "category")
  }

  def viewsDF(s: SparkSession, vs: Seq[View]): DataFrame = {
    import s.implicits._
    vs.map(v => (v.itemId, v.ts, v.deviceType, v.deviceId, v.userIp))
      .toDF("item_id", "ts", "device_type", "device_id", "user_ip")
  }

  def reviewsDF(s: SparkSession, rs: Seq[Review]): DataFrame = {
    import s.implicits._
    rs.map(r => (r.itemId, r.ts, r.deviceType, r.deviceId, r.userIp,
        r.reviewTitle, r.reviewText, r.reviewStars))
      .toDF("item_id", "ts", "device_type", "device_id", "user_ip",
        "review_title", "review_text", "review_stars")
  }

  def smsCorpusDF(s: SparkSession, c: Seq[LabeledSms]): DataFrame = {
    import s.implicits._
    c.map(l => (l.label, l.text)).toDF("label", "text")
  }
}
