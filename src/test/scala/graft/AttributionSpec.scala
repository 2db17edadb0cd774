package graft

import org.apache.spark.sql.functions._

import graft.operators.Attribution

/** Brute-force recomputes and axioms for the attribution tier
  * (q282/q283): Shapley from an independent coalition walk with its
  * efficiency/symmetry/null-player axioms, Markov against a
  * double-precision absorbing-chain solve plus structural
  * monotonicity.
  */
class AttributionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  /** Independent session reconstruction: 2h-gap sessions per user in
    * (ts, event_id) order, truncated at first purchase. */
  private def sessions: Seq[Seq[String]] = {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    evs.groupBy(_._1).values.flatMap { userEvs =>
      val sorted = userEvs.sortBy(e => (e._2, e._3))
      val sess = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var lastUs = Long.MinValue
      sorted.foreach { e =>
        if (lastUs != Long.MinValue && e._2 - lastUs > 7200000000L)
          sess += scala.collection.mutable.ArrayBuffer.empty[String]
        sess.last += e._4
        lastUs = e._2
      }
      sess.map { p =>
        val i = p.indexOf("purchase")
        (if (i >= 0) p.take(i + 1) else p).toSeq
      }
    }.toSeq
  }

  test("q282 Shapley equals an independent coalition-lattice walk; axioms hold") {
    val bits = Map("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val conv = sessions.filter(_.contains("purchase"))
    val census = conv
      .map(p => p.filter(bits.contains).map(bits).distinct.sum)
      .groupBy(identity).map { case (m, xs) => m -> xs.size.toLong }
    def v(sMask: Int): Long =
      census.filter { case (m, _) => (m & sMask) == m }.values.sum
    val w = Array(6L, 2L, 2L, 6L) // |S|!(3-|S|)! for n=4
    val exp = bits.map { case (ch, bit) =>
      val sum = (0 until 16).filter(s => (s & bit) == 0).map { sMask =>
        w(Integer.bitCount(sMask)) * (v(sMask | bit) - v(sMask))
      }.sum
      ch -> (1000000L * sum / 24L)
    }
    val got = byName("q282_shapley_attribution").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == bits.keySet)
    for ((ch, bit) <- bits) {
      assert(got(ch)._1 == exp(ch), s"shapley_micro at $ch")
      assert(got(ch)._2 == v(bit), s"v_solo at $ch")
      assert(got(ch)._3 == v(15) - v(0) && got(ch)._4 == v(0))
    }
    // efficiency: sum phi = v(full) - v(empty) up to one truncation per channel
    val total = got.values.map(_._1).sum
    assert(math.abs(total - 1000000L * (v(15) - v(0))) < 4 * 24,
      s"efficiency: $total vs ${1000000L * (v(15) - v(0))}")
    // null player: every phi is non-negative here (v is monotone by
    // construction: adding a channel can only admit more sessions)
    got.values.foreach { case (phi, _, _, _) => assert(phi >= 0L) }
  }

  test("shapleyReport refuses more than MaxShapleyChannels channels, loudly") {
    // VERDICT r15 #6: the 2^n coalition lattice is safe only because the
    // fixture has 4 channels; above ~12 it explodes silently. The guard
    // must fire BEFORE any job runs, with a message that points the
    // caller at the scalable alternative (q283's Markov model).
    val paths = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(1 AS BIGINT) AS sid", "event_type AS st")
    val tooMany = (1 to Attribution.MaxShapleyChannels + 1).map(i => s"ch$i")
    val e = intercept[IllegalArgumentException] {
      Attribution.shapleyReport(spark, paths, tooMany)
    }
    assert(e.getMessage.contains("q283") && e.getMessage.contains("Markov"),
      s"guard message must point at the >12-channel path: ${e.getMessage}")
    // at the cap boundary it must NOT throw (plan construction only)
    Attribution.shapleyReport(spark, paths,
      (1 to Attribution.MaxShapleyChannels).map(i => s"ch$i"))
  }

  test("shapleyReport generalizes: n=2 hand-computed lattice") {
    // two channels, three converting sessions: {A}, {B}, {A,B} and one
    // non-converting {A}. v(∅)=0, v({A})=1, v({B})=1, v({A,B})=3.
    // phi_A = [0!1!(v(A)-v(∅)) + 1!0!(v(AB)-v(B))] / 2! = (1+2)/2 = 1.5
    // phi_B symmetric = 1.5.
    val s = spark
    import s.implicits._
    val paths = Seq(
      (1L, 1L, "A"), (1L, 1L, "conv"),
      (2L, 1L, "B"), (2L, 1L, "conv"),
      (3L, 1L, "A"), (3L, 1L, "B"), (3L, 1L, "conv"),
      (4L, 1L, "A")).toDF("user_id", "sid", "st")
    val got = Attribution.shapleyReport(spark, paths, Seq("A", "B"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((1500000L, 1L, 3L, 0L)), s"A: ${got("A")}")
    assert(got("B") == ((1500000L, 1L, 3L, 0L)), s"B: ${got("B")}")
  }

  test("q283 Markov matches a double-precision absorbing solve; monotone removal") {
    val got = byName("q283_markov_attribution").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet ==
      Set("(none)", "click", "error", "signup", "view"))
    val p0 = got("(none)")._1
    assert(got("(none)")._2 == 0L)
    got.foreach { case (_, (p, re)) =>
      assert(p <= p0 && re >= 0L, "removal cannot raise conversion")
    }
    // independent check: double-precision value iteration (500 steps)
    // from independently reconstructed paths must agree within the
    // integer truncation envelope (40 iterations x 1 ppm floor each)
    val edges = sessions.flatMap { p =>
      val st = p.map(t => if (t == "purchase") "conv" else t)
      ("start" +: st).sliding(2).map {
        case Seq(a, b) => (a, b)
      }.toSeq ++ (if (st.last != "conv") Seq((st.last, "null")) else Nil)
    }
    val tc = edges.groupBy(identity).map { case ((a, b), xs) =>
      (a, b, xs.size.toLong)
    }.toSeq
    def solve(removed: Option[String]): Double = {
      val adj = tc.filter(t => !removed.contains(t._1))
        .map { case (s, nx, c) => (s, if (removed.contains(nx)) "null" else nx, c) }
      val tot = adj.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
      var v = tot.keys.map(_ -> 0.0).toMap
      for (_ <- 0 until 500)
        v = tot.map { case (s, t) =>
          s -> adj.filter(_._1 == s).map { case (_, nx, c) =>
            c * (nx match {
              case "conv" => 1.0; case "null" => 0.0
              case o => v.getOrElse(o, 0.0)
            })
          }.sum / t
        }
      v.getOrElse("start", 0.0)
    }
    for ((ch, (p, _)) <- got) {
      val ref = solve(Some(ch).filter(_ != "(none)")) * 1e6
      assert(math.abs(p - ref) <= 60.0,
        s"$ch: integer $p vs double ${ref.round} beyond the truncation envelope")
    }
    // the shared kernel IS what the query ran
    assert(Attribution.markovConvPpm(tc, None) == p0)
  }
}
