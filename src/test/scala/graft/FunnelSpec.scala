package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

import scala.util.Random

class FunnelSpec extends SparkSpec {

  private val alphabet = Vector("v", "c", "p", "s", "e", "x")

  test("greedy scan == brute-force regex depth on random histories (2/3/5-step)") {
    val rnd = new Random(42)
    val patterns = Seq(
      IndexedSeq("v", "c"),
      IndexedSeq("v", "c", "p"),
      IndexedSeq("s", "v", "c", "p", "x"))
    for (pat <- patterns; trial <- 1 to 200) {
      val hist = Vector.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size)))
      val (n, d) = Funnel.scan(pat, hist.iterator)
      val brute = Funnel.bruteForceDepth(pat, hist)
      assert(n == hist.size)
      assert(d == brute, s"pattern=$pat trial=$trial hist=${hist.mkString} greedy=$d brute=$brute")
    }
  }

  test("scan handles empty history and repeated steps") {
    assert(Funnel.scan(IndexedSeq("v", "c", "p"), Iterator.empty) == (0L, 0))
    // pattern with a repeated symbol: v v c needs TWO v's before the c
    val pat = IndexedSeq("v", "v", "c")
    assert(Funnel.scan(pat, Iterator("v", "c", "v", "c"))._2 == 3)
    assert(Funnel.scan(pat, Iterator("v", "c", "c"))._2 == 1)
    assert(Funnel.bruteForceDepth(pat, Seq("v", "c", "c")) == 1)
  }

  test("funnelDepth operator == unbounded collect_list reference on events data") {
    val events = Tables.events(spark, TestSession.sfDir)
    val kernel = Funnel.funnelDepth(events, Seq("v", "c", "p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the exact DataFrame shape the kernel replaced (fine at spec scale)
    val reference = events
      .groupBy(col("user_id"))
      .agg(collect_list(struct(unix_micros(col("ts")).as("t"),
        col("event_id").as("id"),
        substring(col("event_type"), 1, 1).as("c"))).as("xs"))
      .select(col("user_id"),
        concat_ws("", expr("transform(array_sort(xs), x -> x.c)")).as("s"))
      .select(col("user_id"),
        length(col("s")).cast("long").as("n_events"),
        when(col("s").rlike("v.*c.*p"), 3)
          .when(col("s").rlike("v.*c"), 2)
          .when(col("s").rlike("v"), 1)
          .otherwise(0).as("funnel_depth"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(kernel == reference)
    assert(kernel.nonEmpty)
  }

  test("funnelDepth plan: one exchange, no collect_list, no window") {
    val plan = Funnel.funnelDepth(Tables.events(spark, TestSession.sfDir), Seq("v", "c", "p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"))
    assert(!plan.contains("Window"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one hash exchange, plan:\n$plan")
  }

  test("predicate funnel: greedy scan == block-regex semantics on random masks") {
    // each row is a 3-bit mask (predicates may overlap); depth-d truth
    // is the block-aligned regex the q122 oracle uses
    def greedy(masks: Seq[String]): Int = {
      var d = 0
      masks.foreach { m => if (d < 3 && m.charAt(d) == '1') d += 1 }
      d
    }
    def regexDepth(masks: Seq[String]): Int = {
      val s = masks.mkString
      if (s.matches("([01]{3})*1[01][01]([01]{3})*[01]1[01]([01]{3})*[01][01]1([01]{3})*")) 3
      else if (s.matches("([01]{3})*1[01][01]([01]{3})*[01]1[01]([01]{3})*")) 2
      else if (s.matches("([01]{3})*1[01][01]([01]{3})*")) 1
      else 0
    }
    val rnd = new Random(5)
    for (trial <- 1 to 300) {
      val masks = Vector.fill(rnd.nextInt(16))(
        Vector.fill(3)(if (rnd.nextBoolean()) '1' else '0').mkString)
      assert(greedy(masks) == regexDepth(masks), s"trial $trial masks=$masks")
    }
  }

  test("funnelDepthPredicates operator == local greedy replay on events data") {
    val events = Tables.events(spark, TestSession.sfDir)
    val steps = Seq(
      col("event_type") === "view" && col("value") >= 10.0,
      col("event_type") === "click",
      col("event_type") === "purchase" && col("value") >= 50.0)
    val got = Funnel.funnelDepthPredicates(events, steps)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val rows = events.select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val expected = rows.groupBy(_._1).map { case (u, hs) =>
      val ordered = hs.sortBy(h => (h._2, h._3))
      var d = 0
      ordered.foreach { case (_, _, _, et, v) =>
        val hit = d match {
          case 0 => et == "view" && v >= 10.0
          case 1 => et == "click"
          case 2 => et == "purchase" && v >= 50.0
          case _ => false
        }
        if (d < 3 && hit) d += 1
      }
      u -> ((ordered.length.toLong, d))
    }
    assert(got == expected)
    assert(got.values.exists(_._2 == 3), "fixture should reach depth 3 for someone")
  }

  // independent ground truth for the windowed funnel: depth = max d
  // such that SOME index-increasing chain matches steps 0..d-1 with
  // every chain event within `w` of the chain's first event (full
  // exponential search with short-circuit — test scale only)
  private def bruteWindowedDepth(evs: IndexedSeq[(Long, String)], k: Int, w: Long): Int = {
    def reachable(d: Int): Boolean = {
      def rec(pos: Int, step: Int, anchor: Long): Boolean =
        step == d || (pos until evs.length).exists { i =>
          val (t, m) = evs(i)
          m.charAt(step) == '1' &&
            (step == 0 || t - anchor <= w) &&
            rec(i + 1, step + 1, if (step == 0) t else anchor)
        }
      rec(0, 0, 0L)
    }
    (k to 1 by -1).find(reachable).getOrElse(0)
  }

  test("windowed anchor scan == brute-force chain search on random histories") {
    val rnd = new Random(11)
    for (trial <- 1 to 500) {
      val w = 1 + rnd.nextInt(20)
      // small time range forces ties and window-boundary hits
      val evs = Vector.fill(rnd.nextInt(14))(
        (rnd.nextInt(30).toLong,
          Vector.fill(3)(if (rnd.nextInt(3) == 0) '1' else '0').mkString))
        .sortBy(_._1)
      val scan = new Funnel.AnchorScan(3, w.toLong, (m, d) => m.charAt(d) == '1')
      evs.foreach { case (t, m) => scan.update(t, m) }
      val brute = bruteWindowedDepth(evs, 3, w.toLong)
      assert(scan.depth == brute, s"trial=$trial w=$w evs=$evs scan=${scan.depth} brute=$brute")
    }
  }

  test("anchor scan save/load round-trips mid-history") {
    val rnd = new Random(13)
    for (trial <- 1 to 100) {
      val evs = Vector.fill(6 + rnd.nextInt(8))(
        (rnd.nextInt(40).toLong,
          Vector.fill(3)(if (rnd.nextInt(3) == 0) '1' else '0').mkString))
        .sortBy(_._1)
      val cut = rnd.nextInt(evs.length)
      val whole = new Funnel.AnchorScan(3, 15L, (m, d) => m.charAt(d) == '1')
      evs.foreach { case (t, m) => whole.update(t, m) }
      val first = new Funnel.AnchorScan(3, 15L, (m, d) => m.charAt(d) == '1')
      evs.take(cut).foreach { case (t, m) => first.update(t, m) }
      val second = new Funnel.AnchorScan(3, 15L, (m, d) => m.charAt(d) == '1')
      second.load(first.save)
      evs.drop(cut).foreach { case (t, m) => second.update(t, m) }
      assert(second.depth == whole.depth, s"trial=$trial cut=$cut evs=$evs")
    }
  }

  test("funnelDepthWindowed operator == brute-force chain search on events data") {
    val events = Tables.events(spark, TestSession.sfDir)
    val w = 12L * 3600 * 1000000
    val steps = Seq(col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    val got = Funnel.funnelDepthWindowed(events, steps, w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val rows = events.select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = rows.groupBy(_._1).map { case (u, hs) =>
      val ordered = hs.sortBy(h => (h._2, h._3)).map { case (_, t, _, et) =>
        (t, Seq("view", "click", "purchase").map(s => if (et == s) '1' else '0').mkString)
      }.toIndexedSeq
      u -> ((ordered.length.toLong, bruteWindowedDepth(ordered, 3, w)))
    }
    assert(got == expected)
    assert(got.values.map(_._2).toSet.size >= 2, "window should split depths in the fixture")
  }

  test("a huge window reduces the windowed funnel to the subsequence funnel") {
    val events = Tables.events(spark, TestSession.sfDir)
    val steps = Seq(col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    val windowed = Funnel.funnelDepthWindowed(events, steps, Long.MaxValue / 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plain = Funnel.funnelDepthPredicates(events, steps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(windowed == plain)
  }

  test("funnelDepth is exact under a 100x hot key") {
    import spark.implicits._
    val rnd = new Random(7)
    // hot user 1 with 5000 events, 40 cold users with ~50 each
    val rows = (1 to 5000).map(i => (1L, i.toLong, i.toLong)) ++
      (2 to 41).flatMap(u => (1 to 50).map(i => (u.toLong, i.toLong, (u * 1000 + i).toLong)))
    val types = Vector("view", "click", "purchase", "signup", "error")
    val df = rows.map { case (u, t, id) => (u, t, id, types(rnd.nextInt(types.size))) }
      .toDF("user_id", "t_us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("t_us")).as("ts"),
        col("event_id"), col("event_type"))
      .repartition(8)
    val got = Funnel.funnelDepth(df, Seq("v", "c", "p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got(1L)._1 == 5000L)
    assert(got.size == 41)
    // brute-force check every user
    val histories = df.select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    for ((u, hs) <- histories) {
      val ordered = hs.sortBy(h => (h._2, h._3)).map(_._4).toSeq
      assert(got(u) == ((ordered.size.toLong, Funnel.bruteForceDepth(IndexedSeq("v", "c", "p"), ordered))), s"user $u")
    }
  }
}
