package graft

import graft.operators.MisraGries
import org.apache.spark.sql.functions._

/** Training-tier soak: the bounded-state claims of the LLM-data
  * operators — Misra-Gries heavy hitters (q86's two-pass shape),
  * scan-side stratified sampling (q81's hash gate), windowless vocab
  * coverage (q82's TakeOrdered + array-math shape) — under ~10^8-row
  * volume, with EXACT ground truth known by construction:
  *
  *   - keys/tokens/langs derive from `spark.range(id)` arithmetic, so
  *     every true frequency is a closed-form expression of n — the soak
  *     asserts the answers, not just that the jobs finish;
  *   - generation is executor-side (range → expressions): driver memory
  *     stays flat no matter the row count;
  *   - heavy keys sit far above the MG guarantee threshold n/(m+1) and
  *     the tail sits far below it, so summary membership is provable.
  *
  * Usage: TrainingSoak [nRows]   (default 1e8)
  * Prints one JSON line with wall times + pass/fail per tier.
  */
object TrainingSoak {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    require(n % 100 == 0 && n % 20 == 0, s"n must be divisible by 100, got $n")
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", "graft-training-soak")
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- 1) Misra-Gries heavy hitters (q86 shape) ------------------
    // Three heavy keys at 10% / 6% / 4%; tail uniform over ~1M keys
    // (each ~0.8*n/1e6 — 5 orders below the m=31 threshold n/32≈3.1%).
    val m = 31
    val keys = spark.range(n).select(
      when(col("id") % 100 < 10, lit(2000001L))
        .when(col("id") % 100 < 16, lit(2000002L))
        .when(col("id") % 100 < 20, lit(2000003L))
        .otherwise(col("id") % 1000000L).as("k"))
    val trueCounts = Map(2000001L -> n / 10, 2000002L -> n * 6 / 100, 2000003L -> n * 4 / 100)

    val mgAgg = udaf(new MisraGries(m), org.apache.spark.sql.Encoders.scalaLong)
    val ((summary, exact), mgSec) = timed {
      import spark.implicits._
      val cand = keys.agg(mgAgg(col("k")).as("s"))
        .select(explode(col("s.xs")).as("x"))
        .select(col("x.k").as("k"), col("x.c").as("c_est"))
      val sm = cand.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // pass 2, exactly like q86: exact counts for the <= m candidates.
      // The candidate keys are re-injected from the ALREADY-COLLECTED
      // summary as a literal broadcast frame — joining against `cand`
      // itself would re-execute its full lineage and run the n-row MG
      // aggregation a second time, making the soak three passes.
      val candKeys = sm.keys.toSeq.toDF("k")
      val ex = keys.join(broadcast(candKeys), Seq("k"), "left_semi")
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (sm, ex)
    }
    // MG guarantees: summary ≤ m entries; every key with freq > n/(m+1)
    // present; estimates underestimate by at most n/(m+1); pass-2 exact
    // counts must equal the constructed truth.
    val mgBound = n / (m + 1)
    val mgOk = summary.size <= m &&
      trueCounts.forall { case (k, c) =>
        summary.contains(k) &&
          summary(k) <= c && c - summary(k) <= mgBound &&
          exact.get(k).contains(c)
      }

    // ---- 2) Stratified sampling gate (q81 shape) -------------------
    // lang from id arithmetic: 70% en / 20% fr / 10% de; gate keeps
    // 10% of en, 50% elsewhere — pure scalar predicate, no shuffle
    // before the 3-group aggregate.
    val P = 1000003L
    val langCol = when(col("id") % 10 < 7, "en")
      .when(col("id") % 10 < 9, "fr").otherwise("de")
    val gate = ((lit(31L) * col("id") + 7L) % P) % 1000 <
      when(col("lang") === "en", 100).otherwise(500)
    val (rates, sampleSec) = timed {
      spark.range(n).select(col("id"), langCol.as("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(gate, 1L).otherwise(0L)).as("n_sampled"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val sampleOk = rates("en")._1 == n * 7 / 10 &&
      math.abs(rates("en")._2.toDouble / rates("en")._1 - 0.10) < 0.005 &&
      math.abs(rates("fr")._2.toDouble / rates("fr")._1 - 0.50) < 0.005 &&
      math.abs(rates("de")._2.toDouble / rates("de")._1 - 0.50) < 0.005

    // ---- 3) Vocab coverage (q82 shape) -----------------------------
    // Five heavy tokens t0..t4 at exactly 5% each; ~1M-token tail. Same
    // plan shape as q82: one groupBy (map-side combine over token
    // cardinality), materialized once, TakeOrdered-20 → single array
    // row → rank/cumsum as array arithmetic. Zero windows.
    val tokCol = when(col("id") % 20 < 5, concat(lit("t"), (col("id") % 20).cast("string")))
      .otherwise(concat(lit("x"), (col("id") % P).cast("string")))
    val (top, vocabSec) = timed {
      val tc = spark.range(n).select(tokCol.as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val total = tc.agg(sum(col("cnt")).cast("bigint").as("total_cnt"))
      tc.orderBy(col("cnt").desc, col("tok")).limit(20)
        .select(struct((-col("cnt")).as("nc"), col("tok").as("tok"),
          col("cnt").as("cnt")).as("x"))
        .agg(sort_array(collect_list(col("x"))).as("xs"))
        .select(col("xs"), posexplode(col("xs")))
        .select(col("xs"), (col("pos") + 1).as("rk"),
          col("col.tok").as("tok"), col("col.cnt").as("cnt"), col("pos"))
        .withColumn("cum_cnt",
          expr("CAST(aggregate(slice(xs, 1, pos + 1), CAST(0 AS BIGINT), (acc, v) -> acc + v.cnt) AS BIGINT)"))
        .crossJoin(broadcast(total))
        .select(col("rk"), col("tok"), col("cnt"), col("cum_cnt"), col("total_cnt"))
        .collect()
    }
    val heavy = n / 20
    val vocabOk = top.length == 20 &&
      (0 until 5).forall { i =>
        val r = top(i)
        r.getString(r.fieldIndex("tok")) == s"t$i" &&
          r.getLong(r.fieldIndex("cnt")) == heavy &&
          r.getLong(r.fieldIndex("cum_cnt")) == heavy * (i + 1)
      } &&
      top.forall(r => r.getLong(r.fieldIndex("total_cnt")) == n)

    // ---- 4) IVF multi-probe ANN recall (q90 shape) -----------------
    // nIvf = n/10 synthetic 8-dim vectors over a 16-entry codebook:
    // v(id)[d] = center(id%16, d) + jitter(id, d) with |jitter| <= 0.02
    // and DISTINCT center patterns >= 1 apart in L2^2 (the center
    // formula cycles with period 7, so some codebook entries coincide —
    // deliberately: equidistant assignment and probe ties must break to
    // the lower cid on every path, and a tie-break bug would surface as
    // lost recall). Every vector's true nearest neighbors sit within
    // jitter distance, far under the inter-pattern separation. The IVF
    // path is the EXACT q90 mechanism — codebook as one broadcast array
    // row, scan-side argmin assignment (zero row blowup), nprobe=2,
    // k-bounded top-k — and the exact baseline is an independent
    // per-query TakeOrdered over the full corpus. With this geometry
    // recall@10 is deterministically 1.0; anything less means the cell
    // pruning dropped a true neighbor, i.e. a real IVF bug, not noise.
    val nIvf = math.max(n / 10, 100000L)
    val kNN = 10
    val centers = Array.tabulate(16)(c =>
      Array.tabulate(8)(d => ((c * 31 + d * 17) % 7 - 3).toDouble))
    val centersArr = centers.zipWithIndex.map { case (cv, cid) =>
      s"named_struct('cid', ${cid}L, 'cv', array(${cv.mkString("D,")}D))"
    }.mkString("array(", ",", ")")
    val vExpr = "transform(sequence(0, 7), d -> " +
      "CAST(((id % 16) * 31 + d * 17) % 7 - 3 AS DOUBLE) + " +
      "((id div 16 + d) % 5 - 2) * 0.01D)"
    val cdsExpr = s"transform($centersArr, ct -> named_struct(" +
      "'d', aggregate(zip_with(v, ct.cv, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b), " +
      "'cid', ct.cid))"
    val emb = spark.range(nIvf).select(col("id"), expr(vExpr).as("v"))
    val ((ivfTop, exactTop), ivfSec) = timed {
      import spark.implicits._
      // IVF path: scan-side assignment + probe join + bounded top-k
      val assigned = emb
        .withColumn("cell", expr(s"array_min($cdsExpr).cid"))
      val probes = emb.filter(col("id") < 5)
        .select(col("id").as("query_id"), col("v").as("qvec"),
          explode(expr(s"transform(slice(array_sort($cdsExpr), 1, 2), x -> x.cid)")).as("pcid"))
      val topk = udaf(new operators.BoundedTopKD(kNN),
        org.apache.spark.sql.Encoders.product[operators.ScoredD])
      val cand = assigned
        .join(broadcast(probes), col("cell") === col("pcid") && col("query_id") =!= col("id"))
        .withColumn("negd",
          -expr("aggregate(zip_with(v, qvec, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"))
      val ivf = cand.groupBy(col("query_id"))
        .agg(topk(col("negd"), col("id")).as("tk"))
        .select(col("query_id"), explode(col("tk.xs.k")).as("id"))
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      // exact baseline: independent TakeOrdered per query over ALL rows
      val qrows = emb.filter(col("id") < 5).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val exact = qrows.map { case (qid, qv) =>
        val qvLit = qv.map(d => s"CAST($d AS DOUBLE)").mkString("array(", ",", ")")
        qid -> emb.filter(col("id") =!= qid)
          .withColumn("dist",
            expr(s"aggregate(zip_with(v, $qvLit, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"))
          .orderBy(col("dist"), col("id")).limit(kNN)
          .select(col("id")).collect().map(_.getLong(0)).toSet
      }.toMap
      (ivf, exact)
    }
    val recalls = exactTop.map { case (qid, ex) =>
      ivfTop.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / kNN
    }
    val ivfRecall = if (recalls.isEmpty) 0.0 else recalls.sum / recalls.size
    val ivfOk = exactTop.size == 5 && recalls.forall(_ == 1.0)

    // ---- 5) As-of join kernel (q104 shape) -------------------------
    // n synthetic events over U users: event id -> user id%U, event
    // time t = id micros, and every 4th event PER USER (seq = id div U,
    // seq % 4 == 3) is a probe (purchase), the rest build rows (views).
    // A probe's latest view at-or-before is therefore ALWAYS the same
    // user's previous event, id - U: every probe matches, every gap is
    // exactly U micros, and the match-id sum is sum(probe ids) - U * nP
    // — all closed-form, so the soak asserts the kernel's answers at
    // 10^8 rows, not just that the window job finishes. One hash
    // shuffle on user; per-user history (n/U rows) sorts inside its
    // partition — the kernel's scale claim is exactly this shape.
    val asofU = 10000L
    require(n % (4 * asofU) == 0, s"n must be divisible by ${4 * asofU}")
    val asofEv = spark.range(n).select(
      (col("id") % asofU).as("k"), col("id"), col("id").as("t"),
      (expr(s"(id div $asofU) % 4") === 3).as("is_probe"))
    val (asofAgg, asofSec) = timed {
      operators.TemporalJoins.asofKernel(
          build = asofEv.filter(!col("is_probe")),
          probe = asofEv.filter(col("is_probe")))
        .agg(count(lit(1)).as("n_probe"),
          count(col("b_id")).as("n_matched"),
          min(col("t") - col("b_t")).as("gap_min"),
          max(col("t") - col("b_t")).as("gap_max"),
          sum(col("id") - col("b_id")).as("idgap_sum"))
        .collect()(0)
    }
    val nProbe = n / 4
    val asofOk = asofAgg.getLong(0) == nProbe &&
      asofAgg.getLong(1) == nProbe &&
      asofAgg.getLong(2) == asofU && asofAgg.getLong(3) == asofU &&
      asofAgg.getLong(4) == asofU * nProbe

    // ---- 6) Range-join kernel (q105 shape) -------------------------
    // Points at every integer micro 0..n-1; one interval per 100k
    // points, each [s, s + 10003) — half-open, with both boundary
    // points (t = s kept, t = e shed) genuinely exercised at every
    // interval. Every interval provably contains exactly 10003 points
    // (the last interval ends 89997 micros before n), so
    // count/min/max/sum are all closed-form.
    val rjW = 10003L; val rjStride = 100000L
    require(n % rjStride == 0 && n >= rjStride, s"n must be divisible by $rjStride")
    val rjPts = spark.range(n).select(col("id").as("t_us"))
    val rjIvs = spark.range(n / rjStride).select(col("id"),
      (col("id") * rjStride).as("s_us"), (col("id") * rjStride + rjW).as("e_us"))
    val (rjAgg, rjSec) = timed {
      operators.TemporalJoins.rangeCountKernel(rjIvs, rjPts)
        .agg(count(lit(1)).as("n_ivs"),
          min(col("n_points")).as("pmin"), max(col("n_points")).as("pmax"),
          sum(col("n_points")).as("psum"))
        .collect()(0)
    }
    val nIvs = n / rjStride
    val rangeOk = rjAgg.getLong(0) == nIvs &&
      rjAgg.getLong(1) == rjW && rjAgg.getLong(2) == rjW &&
      rjAgg.getLong(3) == rjW * nIvs

    // ---- 7) Funnel kernel (q112 shape) -----------------------------
    // user = id mod U, per-user position p = id div U, so each user's
    // id-ordered history is its position order and every depth is
    // closed-form by user class (u mod 4):
    //   class 0: v@1 c@3 p@5            -> depth 3
    //   class 1: c@1 v@3 p@5 (c too early) -> depth 1
    //   class 2: v@1 c@3 (no purchase)  -> depth 2
    //   class 3: c@1 p@3 (no view)      -> depth 0
    // Run twice: WIDE (1e6 users x n/1e6 events) and HOT (100 users x
    // n/100 events each — the bot-grade history that OOMed the old
    // collect_list shape; the sort-based kernel streams it with O(1)
    // per-key state, so this stanza IS the 100 TB memory-shape proof).
    // The windowed (q123) kernel runs over the same frame with
    // W = 2*users MICROS: per-user events sit exactly `users` micros
    // apart, so v@1->c@3 spans 2W/2 = W (inside) while v@1->p@5 spans
    // 2W (outside) — class 0 drops from depth 3 to 2, class 1 loses
    // its post-view click and lands at 1, giving closed-form counts
    // {0: U/4, 1: U/4, 2: U/2}.
    def funnelStanza(users: Long): (Boolean, Double, Boolean, Double) = {
      require(n % users == 0 && users % 4 == 0 && n / users >= 6)
      val per = n / users
      val cls = (col("id") % users) % 4
      val p = expr(s"id div $users")
      val ev = spark.range(n).select(
        (col("id") % users).as("user_id"),
        timestamp_micros(col("id")).as("ts"),
        col("id").as("event_id"),
        when(cls === 0 && p === 1, "view")
          .when(cls === 0 && p === 3, "click")
          .when(cls === 0 && p === 5, "purchase")
          .when(cls === 1 && p === 1, "click")
          .when(cls === 1 && p === 3, "view")
          .when(cls === 1 && p === 5, "purchase")
          .when(cls === 2 && p === 1, "view")
          .when(cls === 2 && p === 3, "click")
          .when(cls === 3 && p === 1, "click")
          .when(cls === 3 && p === 3, "purchase")
          .otherwise("x").as("event_type"))
      val (rows, sec) = timed {
        operators.Funnel.funnelDepth(ev, Seq("v", "c", "p"))
          .groupBy(col("funnel_depth"))
          .agg(count(lit(1)).as("nu"), sum(col("n_events")).as("ne"))
          .collect()
      }
      val got = rows.map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val ok = got.size == 4 &&
        (0 to 3).forall(d => got.get(d).contains((users / 4, users / 4 * per)))
      val (wrows, wsec) = timed {
        operators.Funnel.funnelDepthWindowed(ev, Seq(
          col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"), 2L * users)
          .groupBy(col("funnel_depth"))
          .agg(count(lit(1)).as("nu"), sum(col("n_events")).as("ne"))
          .collect()
      }
      val wgot = wrows.map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val wok = wgot.size == 3 &&
        wgot.get(0).contains((users / 4, users / 4 * per)) &&
        wgot.get(1).contains((users / 4, users / 4 * per)) &&
        wgot.get(2).contains((users / 2, users / 2 * per))
      (ok, sec, wok, wsec)
    }
    val (funnelWideOk, funnelWideSec, funnelWinWideOk, funnelWinWideSec) = funnelStanza(1000000L)
    val (funnelHotOk, funnelHotSec, funnelWinHotOk, funnelWinHotSec) = funnelStanza(100L)

    // ---- vec_sum + gram_upper imperative aggregates (q138/q139/q143
    // state shape) at n rows, dim 8, closed-form ground truth:
    // vm[d] = (id % 1000) + d, so with x cycling uniformly over 0..999
    // (n % 1000 == 0):
    //   S[d]    = n/1000 * Σx + n*d                    (Σx = 499500)
    //   G[i][j] = n/1000 * (Σx² + (i+j)Σx + 1000·i·j)  (Σx² = 332833500)
    // One aggregation pass computes BOTH: per-partition state is one
    // 8-long and one 28-long array folded in place — the soak proves the
    // in-place update + element-wise merge exact at 10^8 rows.
    val (vecaggOk, vecaggSec) = {
      require(n % 1000 == 0, s"vec/gram soak needs n % 1000 == 0, got $n")
      graft.plans.GraftFunctions.register(spark)
      val dim = 8
      val df = spark.range(n).select(expr(
        s"transform(sequence(0, ${dim - 1}), d -> id % 1000L + d)").as("vm"))
      val ((sums, gram), sec) = timed {
        val r = df.agg(
          call_function("vec_sum", col("vm")).as("s"),
          call_function("gram_upper", col("vm")).as("g")).collect()(0)
        (r.getSeq[Long](0).toSeq, r.getSeq[Long](1).toSeq)
      }
      val sx = 499500L; val sx2 = 332833500L; val c = n / 1000L
      val expectS = (0 until dim).map(d => c * sx + n * d)
      val expectG = for {
        i <- 0 until dim; j <- (i + 1) until dim
      } yield c * (sx2 + (i + j) * sx + 1000L * i * j)
      (sums == expectS && gram == expectG, sec)
    }

    // ---- HLL registers (q153 shape) at n rows, K = 10^6 TRUE distinct
    // keys (id % 1e6 — sequential, the exact adversarial input the
    // squaring avalanche pass exists for). The register build is the
    // q153 pipeline verbatim: base-131 fold over the zero-padded key,
    // (h²+h) mod p mix, reg = h % 64, rho = 25 - bitlen(h DIV 64),
    // groupBy(reg).max — ONE pass over 10^8 rows collapsing map-side to
    // 64 rows. Ground truth is closed-form (K known by construction);
    // m = 64 gives ~13% standard error, so ±30% is a 2.3σ gate.
    val (hllOk, hllEst, hllSec) = {
      graft.plans.GraftFunctions.register(spark)
      val trueK = 1000000L
      val (est, sec) = timed {
        val regs = spark.range(n)
          .select(call_function("rolling_hash",
            lpad((col("id") % trueK).cast("string"), 12, "0")).as("h0"))
          .select(expr("(h0 * h0 + h0) % 1000000007").as("h"))
          .select((col("h") % 64).as("reg"), expr("h DIV 64").as("rest"))
          .groupBy(col("reg"))
          .agg(max(expr(
            "CASE WHEN rest = 0 THEN 25L ELSE CAST(25 - length(bin(rest)) AS BIGINT) END")).as("rho"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val sumpow = (0L until 64L).map(r => 1L << (25 - regs.getOrElse(r, 0L)).toInt).sum
        709L * 4096 * 33554432 / (1000 * sumpow)
      }
      (est > trueK * 70 / 100 && est < trueK * 130 / 100, est, sec)
    }

    // ---- histogram-inversion robust stats (q170/q178 shape) at n rows.
    // cents = id % 10000 per four types (id % 4). gcd(4, 10000) = 4, so
    // type t sees exactly the 2500 residues ≡ t (mod 4), each with
    // n/10000 rows — closed-form order statistics: median = 4996 + t
    // (the 1250th of type t's sorted values), p05 = 496 + t,
    // p95 = 9496 + t, and the deviation histogram (multiples of 4, two
    // values per level except the extremes) gives MAD = 2500 for every
    // type. The windows run over the per-type HISTOGRAM — 10^8 event
    // rows collapse to 10^4 histogram rows before any window sees
    // them, which is precisely the domain-bounded claim those queries
    // make.
    val (robustOk, robustSec) = {
      // Round n down to the 40000-cycle (as the regression stanza does
      // with n/384*384) instead of require-failing the whole soak on an
      // off-cycle row count; the closed-form order statistics need
      // complete 4-type x 10000-residue cycles.
      val nR = math.max(n / 40000L * 40000L, 40000L)
      import org.apache.spark.sql.expressions.Window
      val ((medGot, madGot), sec) = timed {
        val hist = spark.range(nR)
          .select((col("id") % 4).cast("string").as("ty"), (col("id") % 10000L).as("cents"))
          .groupBy(col("ty"), col("cents")).agg(count(lit(1)).as("cnt"))
        val cum = Window.partitionBy(col("ty")).orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy(col("ty"))
        val med = hist
          .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
          .withColumn("nn", sum(col("cnt")).over(whole).cast("long"))
          .groupBy(col("ty"))
          .agg(min(when(expr("cum >= (nn + 1) DIV 2"), col("cents"))).as("median"),
            min(when(expr("cum >= (5 * nn + 99) DIV 100"), col("cents"))).as("p05"),
            min(when(expr("cum >= (95 * nn + 99) DIV 100"), col("cents"))).as("p95"))
        val dev = hist.join(med.select(col("ty"), col("median")), "ty")
          .groupBy(col("ty"), abs(col("cents") - col("median")).as("d"))
          .agg(sum(col("cnt")).cast("long").as("cnt"))
        val cumD = Window.partitionBy(col("ty")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mad = dev
          .withColumn("cum", sum(col("cnt")).over(cumD).cast("long"))
          .withColumn("nn", sum(col("cnt")).over(whole).cast("long"))
          .groupBy(col("ty"))
          .agg(min(when(expr("cum >= (nn + 1) DIV 2"), col("d"))).as("mad"))
        (med.collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap,
          mad.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      }
      val ok = (0 to 3).forall { t =>
        medGot.get(t.toString).contains((4996L + t, 496L + t, 9496L + t)) &&
          madGot.get(t.toString).contains(2500L)
      }
      (ok, sec)
    }

    // ---- exact regression by Cramer (q191 shape) at ~n rows: t = id
    // mod 128, h = id mod 24, y = 3t + 5h + 7 EXACTLY, with n truncated
    // to the 384-cycle so the design matrix is non-degenerate. A
    // perfectly linear target makes the least-squares solution the true
    // coefficients as exact rationals, so the soak gates on the
    // millicoefficients being literally (7000, 3000, 5000) out of the
    // DECIMAL(38) determinant arithmetic — at 10^8 rows the
    // determinants reach ~10^30, which is the headroom claim in q191's
    // scaladoc exercised for real.
    val (regOk, regSec) = {
      val nr = n / 384 * 384
      val (res, sec) = timed {
        val m = spark.range(nr).select(
            (col("id") % 128).as("t"), (col("id") % 24).as("h"),
            (lit(3L) * (col("id") % 128) + lit(5L) * (col("id") % 24) + 7L).as("y"))
          .agg(count(lit(1)).as("n"),
            sum(col("t")).cast("long").as("st"), sum(col("h")).cast("long").as("sh"),
            sum(col("t") * col("t")).cast("long").as("stt"),
            sum(col("t") * col("h")).cast("long").as("sth"),
            sum(col("h") * col("h")).cast("long").as("shh"),
            sum(col("y")).cast("long").as("sy"),
            sum(col("t") * col("y")).cast("long").as("sty"),
            sum(col("h") * col("y")).cast("long").as("shy"))
        val D = "DECIMAL(38,0)"
        m.selectExpr(
            s"""CAST(n AS $D) * (CAST(stt AS $D)*shh - CAST(sth AS $D)*sth)
               |  - CAST(st AS $D) * (CAST(st AS $D)*shh - CAST(sth AS $D)*sh)
               |  + CAST(sh AS $D) * (CAST(st AS $D)*sth - CAST(stt AS $D)*sh) AS den""".stripMargin,
            s"""CAST(sy AS $D) * (CAST(stt AS $D)*shh - CAST(sth AS $D)*sth)
               |  - CAST(st AS $D) * (CAST(sty AS $D)*shh - CAST(sth AS $D)*shy)
               |  + CAST(sh AS $D) * (CAST(sty AS $D)*sth - CAST(stt AS $D)*shy) AS d0""".stripMargin,
            s"""CAST(n AS $D) * (CAST(sty AS $D)*shh - CAST(shy AS $D)*sth)
               |  - CAST(sy AS $D) * (CAST(st AS $D)*shh - CAST(sh AS $D)*sth)
               |  + CAST(sh AS $D) * (CAST(st AS $D)*shy - CAST(sh AS $D)*sty) AS d1""".stripMargin,
            s"""CAST(n AS $D) * (CAST(stt AS $D)*shy - CAST(sth AS $D)*sty)
               |  - CAST(st AS $D) * (CAST(st AS $D)*shy - CAST(sh AS $D)*sty)
               |  + CAST(sy AS $D) * (CAST(st AS $D)*sth - CAST(sh AS $D)*stt) AS d2""".stripMargin)
          .selectExpr(
            "CAST((1000 * d0) DIV den AS BIGINT) AS b0",
            "CAST((1000 * d1) DIV den AS BIGINT) AS b1",
            "CAST((1000 * d2) DIV den AS BIGINT) AS b2",
            "CAST(den = 0 AS BOOLEAN) AS degenerate")
          .collect()(0)
      }
      val ok = !res.getBoolean(3) && res.getLong(0) == 7000L &&
        res.getLong(1) == 3000L && res.getLong(2) == 5000L
      (ok, sec)
    }

    // ---- exactsubstr removal census (q245 shape) -------------------
    // n/100 synthetic 80-token docs, generated executor-side: in every
    // decade of doc ids, docs 10g and 10g+1 share a 55-token planted
    // passage at token positions 11..65 (their other 25 tokens are
    // doc-unique), the remaining eight docs are fully unique. Closed
    // form: the content-VERIFIED census must contain exactly
    // 2*(D/10) rows, every one (n_tokens 80, dup_tokens 55, n_runs 1,
    // longest_run 55) — window anchors i in [11,16] are the only
    // duplicated ones and they merge into one 55-token run.
    // floor at one decade: a tiny-but-valid n (e.g. 500) would make dd
    // zero, the census empty, and the min/max aggregates NULL — the
    // stanza must report ok=false/true, never NPE before the JSON line
    val dd = math.max(10L, (n / 100) / 10 * 10)
    val (esAgg, esSec) = timed {
      val docs = spark.range(dd).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 79), i -> CASE
          |  WHEN id % 10 < 2 AND i BETWEEN 10 AND 64
          |    THEN concat('p', id DIV 10, '_', i - 10)
          |  ELSE concat('u', id, '_', i) END))""".stripMargin).as("text"))
      operators.Dedup.exactSubstrCensus(docs, 50)
        .agg(count(lit(1)).as("rows"),
          min(col("n_tokens")).as("tl"), max(col("n_tokens")).as("th"),
          min(col("dup_tokens")).as("dl"), max(col("dup_tokens")).as("dh"),
          min(col("n_runs")).as("rl"), max(col("n_runs")).as("rh"),
          min(col("longest_run")).as("ll"), max(col("longest_run")).as("lh"))
        .collect()(0)
    }
    val esOk = esAgg.getLong(0) == 2L * (dd / 10) &&
      esAgg.getLong(1) == 80L && esAgg.getLong(2) == 80L &&
      esAgg.getLong(3) == 55L && esAgg.getLong(4) == 55L &&
      esAgg.getLong(5) == 1L && esAgg.getLong(6) == 1L &&
      esAgg.getLong(7) == 55L && esAgg.getLong(8) == 55L

    // ---- next-fit packing census (q259 kernel) ---------------------
    // n/10 synthetic 50-token docs over 64 sources (source = id % 64,
    // so within a source doc_ids are contiguous strides and the sorted
    // scan sees dp = D/64 docs each). Closed form at W=128: constant
    // length 50 packs exactly two docs per bin (50+50=100 fits, +50
    // overflows), so with dp even every source reports n_bins = dp/2,
    // packed = 50*dp, fill_pm = (1000*50*dp) DIV ((dp/2)*128) = 781,
    // trunc 0 — the recurrence exercises BOTH branches every step.
    // D rounds to a multiple of 1280 so dp is even and >= 20.
    val pd = math.max(1280L, (n / 10) / 1280 * 1280)
    val (packAgg, packSec) = timed {
      val docs = spark.range(pd).select(
        concat(lit("src"), (col("id") % 64).cast("string")).as("source"),
        col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(1, 50), i -> 'x'))").as("text"))
      operators.TrainingOps.nextFitCensus(docs, 128L)
        .agg(count(lit(1)).as("srcs"),
          sum(col("n_bins")).as("bins"), sum(col("packed_tokens")).as("packed"),
          min(col("fill_pm")).as("fl"), max(col("fill_pm")).as("fh"),
          sum(col("trunc_tokens")).as("tr"))
        .collect()(0)
    }
    val packOk = packAgg.getLong(0) == 64L &&
      packAgg.getLong(1) == pd / 2 && packAgg.getLong(2) == 50L * pd &&
      packAgg.getLong(3) == 781L && packAgg.getLong(4) == 781L &&
      packAgg.getLong(5) == 0L

    // ---- distribution-drift chart (q273/StreamDrift kernel) --------
    // n rows over H=100 hours (n/H each), value digit = (id DIV H)%10
    // — uniform over 0..9 within every hour BY CONSTRUCTION (n/H is a
    // multiple of 10), except hour 0 whose digits shift by +100 (full
    // separation). Reference: the same uniform 0..9. Closed form per
    // the single-numerator statistic: every hour reports KS 0 / W1 0
    // except hour 0 with KS = 1000 and W1 = exactly 100 length-units
    // (4.5 + 91 + 4.5 gap-weighted) = 100000 milli — the uniform
    // masses divide exactly, no truncation slack anywhere. State:
    // H x 20 histogram cells total, independent of n.
    // rows round down to a multiple of 1000 (H=100 hours x 10 digits)
    // so the per-hour digit distribution is exactly uniform
    val nd = math.max(1000L, n / 1000 * 1000)
    val (driftAgg, driftSec) = timed {
      import spark.implicits._
      val H = 100L
      val ref = operators.Drift.referenceCdfs(
        (0 until 30).map(i => ("a", (i % 10).toLong)).toDF("source", "n_chars"),
        "n_chars")
      val stream = spark.range(nd).select(lit("a").as("source"),
        expr(s"timestamp_seconds((id % $H) * 3600)").as("ts"),
        expr(s"CASE WHEN id % $H = 0 THEN 100 + (id DIV $H) % 10 " +
          s"ELSE (id DIV $H) % 10 END").as("v"))
      operators.Drift.driftChart(stream, ref, "v")
        .groupBy().agg(count(lit(1)).as("hours"),
          sum(col("n_window")).as("nw"),
          sum(col("ks_pm")).as("ks_sum"), max(col("ks_pm")).as("ks_max"),
          sum(col("w1_milli")).as("w1_sum"), max(col("w1_milli")).as("w1_max"))
        .collect()(0)
    }
    val driftOk = driftAgg.getLong(0) == 100L && driftAgg.getLong(1) == nd &&
      driftAgg.getLong(2) == 1000L && driftAgg.getLong(3) == 1000L &&
      driftAgg.getLong(4) == 100000L && driftAgg.getLong(5) == 100000L

    println(
      s"""{"metric":"training_soak","rows":$n,""" +
        s""""hll_sec":$hllSec,"hll_est":$hllEst,"hll_ok":$hllOk,""" +
        s""""vecagg_sec":$vecaggSec,"vecagg_ok":$vecaggOk,""" +
        s""""mg_sec":$mgSec,"mg_summary_size":${summary.size},"mg_m":$m,"mg_ok":$mgOk,""" +
        s""""sample_sec":$sampleSec,"sample_ok":$sampleOk,""" +
        s""""vocab_sec":$vocabSec,"vocab_ok":$vocabOk,""" +
        s""""ivf_rows":$nIvf,"ivf_sec":$ivfSec,"ivf_recall":$ivfRecall,"ivf_ok":$ivfOk,""" +
        s""""asof_sec":$asofSec,"asof_ok":$asofOk,""" +
        s""""range_sec":$rjSec,"range_ok":$rangeOk,""" +
        s""""funnel_wide_sec":$funnelWideSec,"funnel_wide_ok":$funnelWideOk,""" +
        s""""funnel_hot_sec":$funnelHotSec,"funnel_hot_ok":$funnelHotOk,""" +
        s""""funnel_win_wide_sec":$funnelWinWideSec,"funnel_win_wide_ok":$funnelWinWideOk,""" +
        s""""funnel_win_hot_sec":$funnelWinHotSec,"funnel_win_hot_ok":$funnelWinHotOk,""" +
        s""""robust_sec":$robustSec,"robust_ok":$robustOk,""" +
        s""""regression_sec":$regSec,"regression_ok":$regOk,""" +
        s""""exactsubstr_docs":$dd,"exactsubstr_sec":$esSec,"exactsubstr_ok":$esOk,""" +
        s""""pack_docs":$pd,"pack_sec":$packSec,"pack_ok":$packOk,""" +
        s""""drift_rows":$nd,"drift_sec":$driftSec,"drift_ok":$driftOk}""")
    spark.stop()
    if (!(mgOk && sampleOk && vocabOk && ivfOk && asofOk && rangeOk &&
        funnelWideOk && funnelHotOk && funnelWinWideOk && funnelWinHotOk &&
        vecaggOk && hllOk && robustOk && regOk && esOk && packOk)) sys.exit(1)
  }
}
