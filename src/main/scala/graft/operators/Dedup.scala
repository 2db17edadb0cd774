package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents`: exact hash dedup, MinHash+LSH
  * near-dup candidates, n-gram Jaccard verification, and SimHash
  * bucketing — the standard large-corpus training-data pipeline stack.
  *
  * Everything is built from cross-engine-deterministic primitives so the
  * DuckDB oracle can replay it exactly: word 3-gram shingles, md5-based
  * minhash (lexicographic min over hex digests per seed), md5-nibble
  * SimHash bits.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup = groupBy(fingerprint) — one hash shuffle, map-side
  *     partial counts; pick min(doc_id) as survivor, no sort.
  *   - MinHash: explode to (doc, shingle) → per-doc signature via
  *     min-per-seed aggregation (one shuffle on doc_id), then explode to
  *     (band_key) and self-join *within band buckets only* — the LSH
  *     trick that replaces the O(n²) pair space with bucket-local joins.
  *   - Jaccard verify runs ONLY on LSH candidate pairs (candidate set is
  *     orders of magnitude smaller than n²).
  *   - SimHash: 16-bit signature via bit-position explode (16x row blowup,
  *     still linear); identical-signature buckets are the candidates.
  */
object Dedup {

  val NumSeeds = 8   // minhash signature length
  val BandSize = 2   // rows per LSH band => 4 bands, sim threshold ~ (1/4)^(1/2) = 0.5
  val NumBands: Int = NumSeeds / BandSize

  /** Per-session, per-key DataFrame cache, keyed by the session OBJECT
    * (identity), evicted by a listener on application end. Weak keying
    * cannot work here: the cached DataFrames strongly reference their
    * SparkSession (df.queryExecution → session), so a WeakHashMap whose
    * values are DataFrames keeps its own keys strongly reachable and
    * never evicts — the leak it was meant to prevent. The listener fires
    * when the session's SparkContext stops, dropping the entry (and with
    * it the cached plans and the session reference). A session whose
    * context is already stopped is never inserted. */
  private[graft] final class SessionCache {
    SessionCache.registry.add(this)
    private val m = new java.util.concurrent.ConcurrentHashMap[
      SparkSession, scala.collection.mutable.Map[String, DataFrame]]()
    def getOrElseUpdate(s: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
      val inner = m.computeIfAbsent(s, { sess =>
        sess.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
              m.remove(sess)
          })
        scala.collection.mutable.Map.empty[String, DataFrame]
      })
      inner.synchronized(inner.getOrElseUpdate(key, mk))
    }
    /** Unpersist and forget every frame this cache holds for `s`; the
      * next getOrElseUpdate rebuilds (and re-persists) from scratch. */
    def clear(s: SparkSession): Unit = {
      val inner = m.remove(s)
      if (inner != null) inner.synchronized {
        inner.values.foreach { df =>
          try df.unpersist(blocking = false)
          catch { case _: Throwable => () } // session may be stopping
        }
      }
    }
  }

  /** Every SessionCache instance in the engine, so Graft.clearCaches can
    * drop them all without each operator file exporting its own hook.
    * Instances are object-level vals (bounded, ~10), never per-query. */
  private[graft] object SessionCache {
    private val registry =
      java.util.concurrent.ConcurrentHashMap.newKeySet[SessionCache]()
    private[graft] def clearAll(s: SparkSession): Unit =
      registry.forEach(_.clear(s))
  }

  /** (doc_id, shingle): distinct word-3-gram shingles per doc.
    * Guard sequence() against <3-token docs (Spark sequence descends when
    * stop<start). Cached: the LSH candidate self-join and the Jaccard
    * verify both walk this lineage several times — without the cache the
    * whole shingle+minhash pipeline would be recomputed per branch. */
  /** Shingle set of an arbitrary (doc_id, text) frame — the signature
    * machinery is per-doc absolute (md5-based), so it composes into the
    * incremental path (IncrementalDedup) unchanged. */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("i", explode(when(size(col("w")) >= 3,
        sequence(lit(1), size(col("w")) - 2)).otherwise(array())))
      .select(col("doc_id"), concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("sh"))
      .distinct()

  private val shingleCache = new SessionCache
  private[operators] def shingles(s: SparkSession, dir: String): DataFrame =
    shingleCache.getOrElseUpdate(s, dir) {
      shinglesOf(Tables.documents(s, dir)).cache()
    }

  /** Same shingle set in DuckDB SQL (list slice is 1-based inclusive). */
  private[operators] val shinglesSql =
    """SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |     unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)""".stripMargin

  /** Wide per-doc minhash signature: one row per doc, one min-agg column
    * per seed. This is the scale-friendly shape: no seed-explode (8x row
    * blowup avoided), a single shuffle on doc_id, and all 8 mins combine
    * map-side in one pass. Cached — signatures feed q27, bands and the
    * Jaccard verify. */
  /** Wide signature of an arbitrary (doc_id, text) frame (see
    * [[shinglesOf]] on why this composes incrementally). */
  private[graft] def signatureWideOf(docs: DataFrame): DataFrame = {
    val aggs = (0 until NumSeeds).map(i =>
      min(md5(concat(col("sh"), lit(s":$i")))).as(s"mh$i"))
    shinglesOf(docs).groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private val sigCache = new SessionCache
  private def signatureWide(s: SparkSession, dir: String): DataFrame =
    sigCache.getOrElseUpdate(s, dir) {
      val aggs = (0 until NumSeeds).map(i =>
        min(md5(concat(col("sh"), lit(s":$i")))).as(s"mh$i"))
      shingles(s, dir).groupBy(col("doc_id"))
        .agg(aggs.head, aggs.tail: _*)
        .cache()
    }

  /** Band-key columns (bk0..bkN) appended to a wide signature — the
    * row-local LSH keys, same expression the dir-based [[bands]] uses. */
  private[graft] def withBandKeys(sigWide: DataFrame): DataFrame =
    (0 until NumBands).foldLeft(sigWide) { (d, b) =>
      val ms = (b * BandSize until (b + 1) * BandSize).map(i => s"mh$i").mkString(", ")
      d.withColumn(s"bk$b", expr(s"md5(array_join(array_sort(array($ms)), ','))"))
    }

  /** Row view (doc_id, seed, mh) of the wide signature — the
    * cross-engine-checkable shape. */
  private def signature(s: SparkSession, dir: String): DataFrame = {
    val stackArgs = (0 until NumSeeds).map(i => s"${i}L, mh$i").mkString(", ")
    signatureWide(s, dir)
      .selectExpr("doc_id", s"stack($NumSeeds, $stackArgs) AS (seed, mh)")
  }

  private val signatureSql =
    s"""SELECT doc_id, seed, min(md5(sh || ':' || seed)) AS mh
       |FROM ($shinglesSql), unnest(range(0, $NumSeeds)) AS s(seed)
       |GROUP BY doc_id, seed""".stripMargin

  /** LSH band keys: (doc_id, band, band_key = md5 of the band's sorted
    * minhashes). Derived from the wide signature with NO extra shuffle:
    * each band key is a row-local expression; the sort inside a band
    * keeps the key order-independent (matches the oracle's
    * list_sort-over-groups). */
  private def bands(s: SparkSession, dir: String): DataFrame = {
    val bandCols = (0 until NumBands).map { b =>
      val ms = (b * BandSize until (b + 1) * BandSize).map(i => s"mh$i").mkString(", ")
      s"${b}, md5(array_join(array_sort(array($ms)), ','))"
    }.mkString(", ")
    signatureWide(s, dir)
      .selectExpr("doc_id", s"stack($NumBands, $bandCols) AS (band, band_key)")
  }

  private val bandsSql =
    s"""SELECT doc_id, CAST(seed // $BandSize AS INT) AS band,
       |  md5(array_to_string(list_sort(list(mh)), ',')) AS band_key
       |FROM ($signatureSql)
       |GROUP BY doc_id, CAST(seed // $BandSize AS INT)""".stripMargin

  /** Candidate near-dup pairs: docs sharing >=1 LSH band bucket.
    * Cached: q28 emits it directly and q29 references it twice (once for
    * the doc-id semi-filter broadcast, once as the pair list) — without
    * the cache the band self-join would run three times.
    *
    * BROADCAST DISCIPLINE (VERDICT r15 #2): this artifact's row count is
    * DATA-DEPENDENT — bounded by the corpus's actual near-dup structure,
    * not by any constant — so on a duplicate-heavy web crawl at 100 TB it
    * can exceed any broadcast budget, and an unconditional `broadcast()`
    * of it would kill the job at plan time. Every verify-stage consumer
    * therefore goes through [[candPairs]]/[[candIntersections]], which
    * broadcast only while the MEASURED count stays inside
    * [[CandBroadcastMaxRows]] and otherwise fall back to a plain shuffle
    * join co-partitioned on the pair key — the same size-gated fallback
    * contract StreamExactSubstr documents for its dictionary. DedupSpec
    * proves the two paths emit identical rows. */
  private val candCache = new SessionCache
  private def candidates(s: SparkSession, dir: String): DataFrame =
    candCache.getOrElseUpdate(s, dir) {
      val b = bands(s, dir)
      val a = b.select(col("band").as("band_a"), col("band_key").as("key_a"), col("doc_id").as("doc_a"))
      val c = b.select(col("band").as("band_b"), col("band_key").as("key_b"), col("doc_id").as("doc_b"))
      a.join(c, col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
          col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(countDistinct(col("band_a")).as("n_shared_bands"))
        .cache()
    }

  private val candidatesSql =
    s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  count(DISTINCT a.band) AS n_shared_bands
       |FROM ($bandsSql) a JOIN ($bandsSql) b
       |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id""".stripMargin

  /** Broadcast budget (rows) for the candidate-pair artifact when it
    * feeds a verify-stage join. 1M pairs of three BIGINTs ≈ 24 MB on the
    * driver — comfortably inside any executor's broadcast headroom while
    * still letting the common case (candidates orders of magnitude
    * smaller than the corpus) skip the shuffle. Above the budget the
    * consumers shuffle-join instead; correctness is path-independent
    * (DedupSpec). */
  private[graft] val CandBroadcastMaxRows = 1000000L

  /** Whether the candidate set fits the broadcast budget — ONE tiny
    * count job on the family-cached frame, shared by every gated
    * consumer in the same execution. */
  private def candFitsBroadcast(s: SparkSession, dir: String,
      maxRows: Long): Boolean =
    candidates(s, dir).count() <= maxRows

  /** The (doc_a, doc_b) candidate-pair frame prepared for use as the
    * small side of a verify-stage join: broadcast-hinted only when the
    * measured count is inside `maxRows` (see [[candidates]]' broadcast
    * discipline). */
  private def candPairs(s: SparkSession, dir: String,
      maxRows: Long): DataFrame = {
    val pairs = candidates(s, dir).select(col("doc_a"), col("doc_b"))
    if (candFitsBroadcast(s, dir, maxRows)) broadcast(pairs) else pairs
  }

  /** |A∩B| distinct-shingle intersection counts per LSH candidate pair —
    * the verify-stage kernel shared by q29 (Jaccard), q145 (containment),
    * q171 (calibration) and q249 (yield curve). The candidate side is
    * size-gated per [[CandBroadcastMaxRows]]. This no-argument entry
    * point is the ONLY cached one: every query-path consumer goes
    * through it and shares the family-scoped frame (candidate-bounded,
    * one row per pair — before r16 each consumer re-ran the two
    * intersection joins per rep). A caller that needs an independent
    * evaluation at any gate — DedupSpec proving the broadcast and
    * shuffle paths identical — uses [[candIntersectionsFresh]], which
    * NEVER consults or populates the cache, even at the default gate
    * (ADVICE r16: gating the cache on the parameter VALUE silently
    * served the cached frame to a spec passing the default explicitly,
    * weakening the independence the parameter exists to prove). */
  private[graft] def candIntersections(s: SparkSession, dir: String): DataFrame =
    interCache.getOrElseUpdate(s, dir)(
      candIntersectionsFresh(s, dir, CandBroadcastMaxRows).cache())

  private val interCache = new SessionCache

  /** Uncached [[candIntersections]] at an explicit broadcast gate —
    * always a fresh evaluation, for path-independence proofs. */
  private[graft] def candIntersectionsFresh(s: SparkSession, dir: String,
      broadcastMaxRows: Long): DataFrame = {
    val sh = candShingles(s, dir)
    candPairs(s, dir, broadcastMaxRows)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** Candidate-doc shingle slice: the corpus shingle table semi-filtered
    * (broadcast, no shuffle of the big side) down to docs appearing in
    * at least one LSH candidate pair. Candidate-bounded, so tiny — but
    * THREE consumers walk it several plan branches deep each (both
    * intersection sides + sizes in q145/q171/neardupPairs), and before
    * r14 each execution re-materialized it as an eager localCheckpoint.
    * Those abandoned per-rep checkpoint blocks were exactly the storage
    * debris behind the r13 bench's q63/q145 8x in-suite inflation
    * (VERDICT r13 #1), so the slice is now a family-scoped SessionCache
    * like the artifacts it derives from: staged once per (session, dir),
    * reused by every lsh-family member and every rep, dropped at the
    * family boundary. */
  private val candShCache = new SessionCache
  private[operators] def candShingles(s: SparkSession, dir: String): DataFrame =
    candShCache.getOrElseUpdate(s, dir) {
      val cand = candidates(s, dir)
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      shingles(s, dir)
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .cache()
    }

  /** Session-cached distinct (source, doc_id, h) 8-token sliding
    * shingle table — the shared tokenize+md5 pass of q168 (per-doc
    * novelty) and q200 (per-source datasheet): both build the IDENTICAL
    * distinct shingle-host table and differ only in the roll-up.
    * `source` is a function of doc_id, so q168's (doc_id, h) projection
    * is still distinct and the counts are unchanged. The two consumers
    * form the `span8` cache family. (q151/q158's 12-token span tables
    * are NOT shareable with this: q151 needs raw occurrence counts, not
    * the distinct table.) */
  private val span8Cache = new SessionCache
  private[operators] def span8(s: SparkSession, dir: String): DataFrame =
    span8Cache.getOrElseUpdate(s, dir) {
      graft.Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          filter(split(col("text"), "\\s+"), x => x =!= "").as("w"))
        .withColumn("nw", expr("greatest(size(w) - 7, 0)"))
        .select(col("source"), col("doc_id"), col("w"),
          explode(expr(
            "CASE WHEN nw > 0 THEN sequence(CAST(1 AS BIGINT), nw) ELSE array() END")).as("i"))
        .select(col("source"), col("doc_id"),
          md5(concat_ws(" ",
            slice(col("w"), col("i").cast("int"), lit(8)))).as("h"))
        .distinct()
        .transform(graft.Graft.cacheScopedCheckpoint)
    }

  /** The q29 result as a reusable stage: LSH-candidate pairs verified by
    * exact shingle Jaccard >= `minJaccard`. Consumed by the curation
    * pipeline (Curation.scala) for near-dup removal and clustering.
    * Cached: the verified pair set is tiny (hundreds of rows at sf0.1)
    * and three operators consume it — recomputing the intersection joins
    * per consumer would triple the dedup-suite cost. */
  private val pairCache = new SessionCache
  private[operators] def neardupPairs(s: SparkSession, dir: String,
      minJaccard: Double = 0.2): DataFrame =
    pairCache.getOrElseUpdate(s, s"$dir#$minJaccard")(
      neardupPairsUncached(s, dir, minJaccard).cache())

  private def neardupPairsUncached(s: SparkSession, dir: String,
      minJaccard: Double): DataFrame = {
    // The candidate set is usually orders of magnitude smaller than the
    // corpus (that's the whole point of LSH) — so the intersection join
    // runs on the cached candidate-shingle slice ([[candShingles]]),
    // never on the corpus shingle table, with the candidate side
    // size-gated ([[candIntersections]]). Without the slice the
    // (doc_b, sh) join shuffles every shingle in the corpus; with it,
    // only candidates' shingles move.
    val sh = candShingles(s, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = candIntersections(s, dir)
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }

  /** DuckDB equivalent of [[neardupPairs]] at the default threshold. */
  private[operators] val neardupSql: String =
    s"""WITH cand AS ($candidatesSql),
       |  sh AS ($shinglesSql),
       |  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |  inter AS (
       |    SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |    FROM cand c
       |    JOIN sh sa ON sa.doc_id = c.doc_a
       |    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |    GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b, i.n_common,
       |  CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= 0.2""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q26_dedup_exact",
      """Exact dedup via content fingerprint: per-lang doc counts vs
        |distinct-fingerprint counts plus the surviving min(doc_id) set
        |size. One shuffle on the fingerprint; survivor choice is
        |min(doc_id) (no sort, just a min agg).""".stripMargin,
      """WITH fp AS (
        |  SELECT lang, md5(text) AS f, min(doc_id) AS survivor_id
        |  FROM documents GROUP BY lang, md5(text))
        |SELECT lang, count(*) AS n_unique, min(survivor_id) AS first_survivor
        |FROM fp GROUP BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"), md5(col("text")).as("f"))
        .agg(min(col("doc_id")).as("survivor_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_unique"), min(col("survivor_id")).as("first_survivor"))
    },

    // ----------------------------------------------------------------
    q("q27_minhash_signatures",
      """MinHash signatures (8 seeds, md5-based): the per-doc sketch that
        |feeds LSH. Output is every (doc, seed, minhash) row — the full
        |signature matrix is the strongest cross-engine check of the
        |sketch computation.""".stripMargin,
      signatureSql) { (s, dir) => signature(s, dir) },

    // ----------------------------------------------------------------
    q("q28_lsh_candidates",
      """MinHash-LSH near-dup candidate pairs (4 bands x 2 rows): docs
        |sharing at least one band bucket, with the shared-band count.
        |The self-join runs inside band buckets only — at 100 TB this is
        |the difference between O(n^2) and linear-with-small-buckets.""".stripMargin,
      candidatesSql) { (s, dir) => candidates(s, dir) },

    // ----------------------------------------------------------------
    q("q29_neardup_jaccard",
      """n-gram Jaccard verification of LSH candidates: exact 3-gram
        |shingle Jaccard computed ONLY for candidate pairs (intersection
        |via shingle join, union by inclusion-exclusion). Keeps pairs with
        |J >= 0.2. Jaccard is a ratio of exact integers — bitwise
        |deterministic.""".stripMargin,
      neardupSql) { (s, dir) =>
      neardupPairs(s, dir)
    },

    // ----------------------------------------------------------------
    q("q30_simhash",
      """16-bit SimHash from md5 nibbles: per-token hash bits weighted
        |+1/-1, sign-aggregated per bit position, recomposed to a 16-bit
        |signature; identical signatures = near-dup bucket (bucket size
        |via window sharing the same shuffle). Bit math is integer
        |div/mod only — exactly portable.""".stripMargin,
      s"""WITH $simhashSqlCtes
        |SELECT doc_id, simhash16,
        |  count(*) OVER (PARTITION BY simhash16) AS bucket_size
        |FROM sig""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      simhashSig(s, dir)
        .withColumn("bucket_size", count(lit(1)).over(Window.partitionBy(col("simhash16"))))
        .select(col("doc_id"), col("simhash16"), col("bucket_size"))
    },

    // ----------------------------------------------------------------
    q("q77_simhash_hamming",
      """SimHash near-dup pairs within Hamming distance 3 of the 60-bit
        |signature, found WITHOUT an all-pairs scan via the block
        |scheme of Manku/Jain/Das Sarma ("Detecting Near-Duplicates for
        |Web Crawling", WWW 2007, §3): the 60 bits split into 5 blocks
        |of 12; any pair differing in <=3 bits leaves >=2 blocks
        |untouched (pigeonhole), so it agrees EXACTLY on at least one
        |of the C(5,2)=10 block-PAIR keys — the bucket join over 24-bit
        |keys is provably complete, not approximate. Candidates verify
        |with one bit_count(xor) each. The 24-bit key space (16.7M
        |values) is what survives scale: a 16-bit signature's 4-bit
        |bands have 16 bucket values, so band buckets saturate into an
        |O(n^2/16) join — the pre-round-13 version planned 362M
        |candidates and spilled 50 GB at sf1 (SCALE.md §8); block-pair
        |keys keep buckets near-singleton until billions of docs, and
        |widening blocks/signature is the published knob beyond that.
        |Measured candidate:output ratio is ~4.4 at sf0.1 (780k
        |candidates for 178k true pairs).""".stripMargin,
      s"""WITH $simhashSql60Ctes,
        |keys AS (
        |  SELECT doc_id, simhash60, c,
        |    ((simhash60 // (CAST(1 AS BIGINT) << (12 *
        |        (CASE WHEN c <= 3 THEN 0 WHEN c <= 6 THEN 1 WHEN c <= 8 THEN 2 ELSE 3 END)))) % 4096) * 4096
        |      + ((simhash60 // (CAST(1 AS BIGINT) << (12 *
        |        (CASE c WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 4 WHEN 4 THEN 2
        |                WHEN 5 THEN 3 WHEN 6 THEN 4 WHEN 7 THEN 3 ELSE 4 END)))) % 4096) AS kv
        |  FROM sig60, unnest(range(0, 10)) AS t(c)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |         a.simhash60 AS sig_a, b2.simhash60 AS sig_b
        |  FROM keys a JOIN keys b2
        |    ON a.c = b2.c AND a.kv = b2.kv AND a.doc_id < b2.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin) { (s, dir) =>
      val sig = simhashSig60(s, dir)
      val keys = sig
        .withColumn("c", explode(sequence(lit(0), lit(9))))
        .withColumn("kv", expr(
          """((simhash60 div shiftleft(CAST(1 AS BIGINT), 12 *
            |    (CASE WHEN c <= 3 THEN 0 WHEN c <= 6 THEN 1 WHEN c <= 8 THEN 2 ELSE 3 END))) % 4096) * 4096
            |  + ((simhash60 div shiftleft(CAST(1 AS BIGINT), 12 *
            |    (CASE c WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 4 WHEN 4 THEN 2
            |            WHEN 5 THEN 3 WHEN 6 THEN 4 WHEN 7 THEN 3 ELSE 4 END))) % 4096)""".stripMargin))
      val a = keys.select(col("c"), col("kv"),
        col("doc_id").as("doc_a"), col("simhash60").as("sig_a"))
      val bb = keys.select(col("c"), col("kv"),
        col("doc_id").as("doc_b"), col("simhash60").as("sig_b"))
      a.join(bb, Seq("c", "kv"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
        .distinct()
        .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS INT)"))
        .filter(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    },

    // ----------------------------------------------------------------
    q("q145_containment",
      """ASYMMETRIC near-dup detection: shingle containment
        ||A∩B| / min(|A|,|B|) over the LSH candidate pairs — the rule
        |that catches what symmetric Jaccard (q29) structurally misses:
        |a short document quoted wholesale inside a long one has low
        |Jaccard (the union is dominated by the long doc) but high
        |containment, and containment ≥ Jaccard always. This is the
        |subset/quotation sweep a curation pipeline runs AFTER Jaccard
        |dedup. Integer permille with floor division so both engines
        |agree exactly; threshold 300‰. Scale shape identical to q29's
        |verify stage: candidates come from the LSH band join (never
        |all pairs), the shingle table is broadcast-semi-filtered down
        |to candidate docs before the intersection join, and sizes are
        |per-doc aggregates of the same filtered table.""".stripMargin,
      s"""WITH cand AS ($candidatesSql),
        |  sh AS ($shinglesSql),
        |  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |  inter AS (
        |    SELECT c.doc_a, c.doc_b, count(*) AS n_common
        |    FROM cand c
        |    JOIN sh sa ON sa.doc_id = c.doc_a
        |    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
        |    GROUP BY c.doc_a, c.doc_b)
        |SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
        |  CAST((i.n_common * 1000) // least(za.n, zb.n) AS BIGINT) AS containment_pm
        |FROM inter i
        |JOIN sizes za ON za.doc_id = i.doc_a
        |JOIN sizes zb ON zb.doc_id = i.doc_b
        |WHERE (i.n_common * 1000) // least(za.n, zb.n) >= 300""".stripMargin) { (s, dir) =>
      // candidate-doc shingles: the family-scoped [[candShingles]] cache
      // (three plan branches read it; a per-execution checkpoint here
      // was the r13 bench-churn offender — see the cache's scaladoc);
      // the candidate-pair side is size-gated ([[candIntersections]])
      val sh = candShingles(s, dir)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = candIntersections(s, dir)
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("containment_pm",
          expr("(n_common * 1000) DIV least(na, nb)"))
        .filter(col("containment_pm") >= 300)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("containment_pm"))
    },

    // ----------------------------------------------------------------
    q("q151_dup_spans",
      """Exact-substring duplication detection (the Lee et al. 2022
        |"Deduplicating Training Data" signal, at 12-token granularity):
        |every SLIDING 12-token span (stride 1 — unlike q95's fixed
        |non-overlapping chunks, a duplicated passage is caught at ANY
        |token offset), reported when it recurs across >= 2 distinct
        |documents, with its occurrence count and first host doc. This
        |is the detector a curation pipeline runs to find boilerplate
        |and templated text that survives document-level dedup. Scale
        |shape: spans hash scan-side (explode the index RANGE, slice +
        |md5 — the token array is never materialized twice), the only
        |shuffle keys on the 128-bit span hash with map-side combine,
        |and output is bounded by the duplicated-span count, not the
        |corpus. distinct-doc counting rides the same agg (count
        |distinct over the hash-partitioned groups — exact, no
        |sketch).""".stripMargin,
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |x AS (SELECT doc_id, w, greatest(len(w) - 11, 0) AS nw FROM w),
        |e AS (SELECT doc_id, unnest(range(1, nw + 1)) AS i, w FROM x),
        |h AS (SELECT doc_id,
        |        md5(array_to_string(w[i:(i+11)], ' ')) AS span_hash FROM e)
        |SELECT span_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_occurrences, CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM h GROUP BY 1
        |HAVING count(DISTINCT doc_id) >= 2""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), "\\s+"), x => x =!= "").as("w"))
        .withColumn("nw", expr("greatest(size(w) - 11, 0)"))
        .select(col("doc_id"), col("w"),
          explode(expr(
            "CASE WHEN nw > 0 THEN sequence(CAST(1 AS BIGINT), nw) ELSE array() END")).as("i"))
        .select(col("doc_id"),
          md5(concat_ws(" ",
            slice(col("w"), col("i").cast("int"), lit(12)))).as("span_hash"))
        .groupBy(col("span_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
    },

    // ----------------------------------------------------------------
    q("q158_source_overlap",
      """Cross-SOURCE contamination matrix — q151's span signal rolled
        |up to provenance: for every ordered source pair (a, b), how
        |many distinct 12-token spans of a's documents also appear in
        |b's (a ≠ b), plus the count of a's spans overall — the
        |who-copies-from-whom report that decides which source to drop
        |when leakage shows up, and the aggregate a licensing audit
        |starts from. Scale shape: the span table builds exactly like
        |q151 (scan-side index-range explode + md5, one hash-keyed
        |dedup to distinct (span, source)); the pair space comes from
        |joining that DEDUPED table to itself on the span hash — join
        |input is distinct spans × sources (bounded by content volume,
        |collapsing all repetition), output collapses immediately to
        ||sources|² rows with map-side combine. The denominator rides
        |the same deduped table, so the corpus is tokenized ONCE.""".stripMargin,
      """WITH w AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |x AS (SELECT doc_id, source, w, greatest(len(w) - 11, 0) AS nw FROM w),
        |e AS (SELECT source, unnest(range(1, nw + 1)) AS i, w FROM x),
        |sp AS (SELECT DISTINCT source,
        |         md5(array_to_string(w[i:(i+11)], ' ')) AS h FROM e),
        |den AS (SELECT source, count(*)::BIGINT AS n_spans FROM sp GROUP BY 1)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  count(*)::BIGINT AS n_shared, den.n_spans AS n_spans_a
        |FROM sp a JOIN sp b ON a.h = b.h AND a.source <> b.source
        |JOIN den ON den.source = a.source
        |GROUP BY 1, 2, 4""".stripMargin) { (s, dir) =>
      val sp = Tables.documents(s, dir)
        .select(col("source"),
          filter(split(col("text"), "\\s+"), x => x =!= "").as("w"))
        .withColumn("nw", expr("greatest(size(w) - 11, 0)"))
        .select(col("source"), col("w"),
          explode(expr(
            "CASE WHEN nw > 0 THEN sequence(CAST(1 AS BIGINT), nw) ELSE array() END")).as("i"))
        .select(col("source"),
          md5(concat_ws(" ",
            slice(col("w"), col("i").cast("int"), lit(12)))).as("h"))
        .distinct()
      val den = sp.groupBy(col("source")).agg(count(lit(1)).as("n_spans"))
      sp.as("a")
        .join(sp.as("b"),
          col("a.h") === col("b.h") && col("a.source") =!= col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(den.select(col("source").as("source_a"),
          col("n_spans").as("n_spans_a"))), Seq("source_a"))
        .select(col("source_a"), col("source_b"), col("n_shared"), col("n_spans_a"))
    },

    // ----------------------------------------------------------------
    q("q95_chunk_dedup",
      """Span-level dedup (the C4 "line dedup" rule, with fixed 8-token
        |chunks standing in for lines since the corpus has no newlines):
        |every chunk is kept only at its FIRST corpus occurrence —
        |ordered by (doc_id, chunk index) — and each doc reports how many
        |of its chunks survive plus a fingerprint of its reassembled
        |deduped text. Shape at 100 TB: chunks shuffle once on their md5
        |content key for the global first-occurrence aggregate (a
        |min(struct) — no window over a content partition whose hot key
        |could be corpus-sized), the occurrence join streams both sides
        |on the same key, and reassembly is a per-doc sort of a
        |doc-bounded list. The oracle recomputes the whole rule —
        |chunking arithmetic, first-occurrence tie-breaks, reassembled
        |md5 — in DuckDB.""".stripMargin,
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS idx,
        |    array_to_string(w[8*i+1 : 8*i+8], ' ') AS chunk
        |  FROM w, unnest(range(0, (len(w) + 7) // 8)) AS t(i)),
        |mk AS (
        |  SELECT doc_id, idx, chunk,
        |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn
        |  FROM ch)
        |SELECT doc_id,
        |  count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx), ''))
        |    AS kept_fp
        |FROM mk GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val chunks = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("idx", explode(expr("sequence(0, (size(w) + 7) div 8 - 1)")))
        .select(col("doc_id"), col("idx"),
          concat_ws(" ", slice(col("w"), col("idx") * 8 + 1, lit(8))).as("chunk"))
        .withColumn("ck", md5(col("chunk")))
      // global first occurrence per content key: a min(struct) aggregate,
      // NOT row_number over a content partition — a billion-fold repeated
      // chunk is one aggregation cell here, not one task's sort
      val first = chunks.groupBy(col("ck"))
        .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
      val marked = chunks.join(first, "ck")
        .withColumn("is_first",
          col("f.doc_id") === col("doc_id") && col("f.idx") === col("idx"))
      marked.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(when(col("is_first"),
              struct(col("idx"), col("chunk"))))),
            x => x.getField("chunk")))).as("kept_fp"))
    },

    // ----------------------------------------------------------------
    q("q168_shingle_novelty",
      """Per-document NOVELTY score — the curation signal that ranks
        |docs by how much text they contribute that the corpus (in
        |doc_id order — the ingestion order here) has not already
        |seen: the permille of the doc's DISTINCT 8-token shingles
        |whose first corpus occurrence (min doc_id over all hosts) is
        |this doc.  Complements q151 (which reports the duplicated
        |spans themselves) and q95 (which cuts at fixed chunk
        |boundaries): novelty is the doc-level roll-up a sampler
        |weights by, computed at sliding-window granularity so a
        |shifted copy scores near zero.  Scale shape: distinct
        |(shingle, doc) pairs build scan-side exactly like q151; the
        |first-host table is one min aggregate on the shingle hash;
        |the verdict join runs shingle-keyed against the SAME
        |partitioning (co-partitioned, no extra exchange) and
        |collapses immediately to doc-keyed counts.  Docs shorter
        |than 8 tokens have no shingles and drop out — they carry no
        |evidence either way.""".stripMargin,
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |x AS (SELECT doc_id, w, greatest(len(w) - 7, 0) AS nw FROM w),
        |e AS (SELECT doc_id, unnest(range(1, nw + 1)) AS i, w FROM x),
        |sp AS (SELECT DISTINCT doc_id,
        |         md5(array_to_string(w[i:(i+7)], ' ')) AS h FROM e),
        |firsts AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS first_doc
        |           FROM sp GROUP BY 1)
        |SELECT sp.doc_id, count(*)::BIGINT AS n_shingles,
        |  CAST(sum(CASE WHEN firsts.first_doc = sp.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  (1000 * CAST(sum(CASE WHEN firsts.first_doc = sp.doc_id THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*) AS novel_permille
        |FROM sp JOIN firsts USING (h)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      // the session-cached shared 8-token shingle table (see [[span8]]);
      // source is a function of doc_id, so this projection stays
      // distinct at (doc_id, h)
      val sp = span8(s, dir).select(col("doc_id"), col("h"))
      // first-occurrence via an h-partitioned window min (the q200
      // rewrite): groupBy(h) + join(h) walked the explode+md5+distinct
      // pipeline once per branch
      sp.withColumn("first_doc", expr("min(doc_id) OVER (PARTITION BY h)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .cast("long").as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          expr("(1000 * n_novel) DIV n_shingles").as("novel_permille"))
    },

    // ----------------------------------------------------------------
    q("q171_minhash_calibration",
      """MinHash CALIBRATION report — the sketch-quality audit a dedup
        |pipeline runs before trusting q28's thresholds: for every LSH
        |candidate pair, the sketch's Jaccard estimate (matching seeds
        |out of 8, the standard MinHash estimator) side by side with
        |the EXACT shingle Jaccard, plus the absolute error — all in
        |integer permille, floor-divided, so both engines agree
        |bit-for-bit.  This quantifies the estimator's variance at
        |signature length 8 on real data (the k=8 standard error is
        |~0.5/√8 ≈ 17%; pairs outside that band are the ones a longer
        |signature would fix).  Scale shape: everything is bounded by
        |the CANDIDATE set (the LSH point): the wide signature joins
        |to the pair list twice by doc id, and the exact intersection
        |reuses q29's semi-filtered shingle join — corpus-sized tables
        |are touched only by the already-computed signature/shingle
        |stages.""".stripMargin,
      s"""WITH cand AS ($candidatesSql),
        |  sig AS ($signatureSql),
        |  m AS (
        |    SELECT cand.doc_a, cand.doc_b,
        |      CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |    FROM cand
        |    JOIN sig sa ON sa.doc_id = cand.doc_a
        |    JOIN sig sb ON sb.doc_id = cand.doc_b AND sb.seed = sa.seed
        |    GROUP BY 1, 2),
        |  sh AS ($shinglesSql),
        |  sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
        |  inter AS (
        |    SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_common
        |    FROM cand c
        |    JOIN sh sa ON sa.doc_id = c.doc_a
        |    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
        |    GROUP BY 1, 2)
        |SELECT m.doc_a, m.doc_b, m.n_match,
        |  (1000 * m.n_match) // ${NumSeeds} AS est_permille,
        |  (1000 * coalesce(inter.n_common, 0))
        |    // (za.n + zb.n - coalesce(inter.n_common, 0)) AS exact_permille,
        |  abs((1000 * m.n_match) // ${NumSeeds}
        |    - (1000 * coalesce(inter.n_common, 0))
        |      // (za.n + zb.n - coalesce(inter.n_common, 0))) AS err_permille
        |FROM m
        |LEFT JOIN inter ON inter.doc_a = m.doc_a AND inter.doc_b = m.doc_b
        |JOIN sizes za ON za.doc_id = m.doc_a
        |JOIN sizes zb ON zb.doc_id = m.doc_b""".stripMargin) { (s, dir) =>
      val sigA = signatureWide(s, dir)
      val matchExpr = (0 until NumSeeds)
        .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      // both pair-sized sides ride the same size gate: if the candidate
      // set fits the budget so does its grouped intersection output
      // (inter rows ⊆ candidate pairs)
      val fits = candFitsBroadcast(s, dir, CandBroadcastMaxRows)
      val m = candPairs(s, dir, CandBroadcastMaxRows)
        .join(sigA.as("a"), col("a.doc_id") === col("doc_a"))
        .join(sigA.as("b"), col("b.doc_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"), matchExpr.as("n_match"))
      // candidate-doc shingles: the family-scoped [[candShingles]] cache
      // (three plan branches read it; a per-execution checkpoint here
      // was the r13 bench-churn offender — see the cache's scaladoc)
      val sh = candShingles(s, dir)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = candIntersections(s, dir)
      m.join(if (fits) broadcast(inter) else inter, Seq("doc_a", "doc_b"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_match"),
          expr(s"(1000 * n_match) DIV $NumSeeds").as("est_permille"),
          expr("(1000 * n_common) DIV (na + nb - n_common)").as("exact_permille"),
          expr(s"""abs((1000 * n_match) DIV $NumSeeds
                  |  - (1000 * n_common) DIV (na + nb - n_common))""".stripMargin)
            .as("err_permille"))
    },

    // ----------------------------------------------------------------
    q("q200_source_datasheet",
      """The per-source DATASHEET — the one-page provenance summary a
        |dataset release ships (datasheets-for-datasets, distilled to
        |the signals this engine computes exactly): per source, volume
        |(docs, chars), language breadth, mean quality (corpus stopword
        |permille over total tokens — a ratio of sums, not a mean of
        |ratios), exact-duplicate permille (md5 fingerprint shared with
        |ANY doc corpus-wide, q26's key), and content novelty permille
        |(distinct 8-token shingles first hosted by this source's docs,
        |q168's signal rolled up to provenance).  Scale shape: quality
        |and language ride ONE corpus scan into a source-keyed
        |aggregate; the fingerprint pass is one content-keyed shuffle
        |joined back source-keyed; the shingle pass reuses q168's
        |span-hash shuffle with the roll-up collapsing to |sources|
        |rows.  Every column is an exact integer or floor-divided
        |permille — the whole datasheet is hash-provable.""".stripMargin,
      """WITH base AS (
        |  SELECT source, doc_id, md5(text) AS f,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
        |    CAST(length(text) AS BIGINT) AS n_chars, lang
        |  FROM documents),
        |fp AS (SELECT f, count(*)::BIGINT AS copies FROM base GROUP BY 1),
        |perdoc AS (
        |  SELECT base.source, base.doc_id, base.n_tokens, base.n_stop,
        |    base.n_chars, base.lang, (fp.copies > 1) AS is_dup
        |  FROM base JOIN fp ON fp.f = base.f),
        |w AS (
        |  SELECT source, doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |x AS (SELECT source, doc_id, w, greatest(len(w) - 7, 0) AS nw FROM w),
        |e AS (SELECT source, doc_id, unnest(range(1, nw + 1)) AS i, w FROM x),
        |sp AS (SELECT DISTINCT source, doc_id,
        |         md5(array_to_string(w[i:(i+7)], ' ')) AS h FROM e),
        |firsts AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS first_doc
        |           FROM sp GROUP BY 1),
        |nov AS (
        |  SELECT sp.source, count(*)::BIGINT AS n_shingles,
        |    CAST(sum(CASE WHEN firsts.first_doc = sp.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM sp JOIN firsts USING (h)
        |  GROUP BY 1)
        |SELECT p.source, count(*)::BIGINT AS n_docs,
        |  CAST(sum(p.n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT p.lang) AS BIGINT) AS n_langs,
        |  (1000 * CAST(sum(p.n_stop) AS BIGINT)) // CAST(sum(p.n_tokens) AS BIGINT)
        |    AS stop_permille,
        |  (1000 * CAST(sum(CASE WHEN p.is_dup THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*) AS dup_permille,
        |  (1000 * max(nov.n_novel)) // max(nov.n_shingles) AS novel_permille
        |FROM perdoc p LEFT JOIN nov ON nov.source = p.source
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val stopList = Seq("the", "a", "of", "and", "to").map(w => s"'$w'").mkString(",")
      val base = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), md5(col("text")).as("f"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))"))
            .cast("long").as("n_stop"),
          length(col("text")).cast("long").as("n_chars"), col("lang"))
      // dup flag via a fingerprint-partitioned window: one shuffle of
      // base by f, instead of groupBy(f) + join(f) walking the string-
      // heavy documents projection twice
      val perdoc = base
        .withColumn("is_dup", expr("count(1) OVER (PARTITION BY f) > 1"))
      // the session-cached shared 8-token shingle table (see [[span8]])
      val sp = span8(s, dir)
      // first-occurrence via an h-partitioned window min — the
      // groupBy(h) + join(h) form evaluated the whole explode+md5+
      // distinct shingle pipeline once per branch
      val nov = sp
        .withColumn("first_doc", expr("min(doc_id) OVER (PARTITION BY h)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .cast("long").as("n_novel"))
      // LEFT join: a source whose documents are all shorter than 8 tokens
      // has no shingles and no nov row — it must still appear in its own
      // provenance summary (novel_permille NULL, identically in DuckDB:
      // 1000 * NULL DIV NULL = NULL in both engines).
      perdoc.join(broadcast(nov), Seq("source"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          expr("(1000 * CAST(sum(n_stop) AS BIGINT)) DIV CAST(sum(n_tokens) AS BIGINT)")
            .as("stop_permille"),
          expr("(1000 * CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)) DIV count(1)")
            .as("dup_permille"),
          expr("(1000 * max(n_novel)) DIV max(n_shingles)").as("novel_permille"))
    },

    // ----------------------------------------------------------------
    q("q208_boilerplate_chunks",
      """Boilerplate-chunk REMOVAL — the C4 line filter (Raffel et al.
        |2020) as RefinedWeb re-states it (Penedo et al. 2023): a
        |chunk whose content appears in >= 3 DISTINCT documents is
        |boilerplate (nav bars, licence footers) and EVERY occurrence
        |is dropped — complementing q95, which keeps the FIRST copy of
        |every chunk (dedup), where this keeps NONE of the repeated
        |ones (template removal). Same fixed 8-token chunking as q95
        |(the corpus has no newlines to cut at). Per doc: chunk
        |counts, removed counts, and the md5 of the reassembled
        |cleaned text. Scale shape: chunks shuffle ONCE on their
        |content hash for the distinct-doc census; the census joins
        |back on that same key (co-partitioned); reassembly is a
        |doc-bounded sorted collect. The census relation is bounded
        |by |distinct chunks|, never materializing pairs — the same
        |discipline as q95/q168.""".stripMargin,
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS idx,
        |    array_to_string(w[8*i+1 : 8*i+8], ' ') AS chunk
        |  FROM w, unnest(range(0, (len(w) + 7) // 8)) AS t(i)),
        |census AS (
        |  SELECT md5(chunk) AS ck, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        |  FROM ch GROUP BY 1),
        |mk AS (
        |  SELECT doc_id, idx, chunk, nd >= 3 AS boiler
        |  FROM ch JOIN census ON census.ck = md5(chunk))
        |SELECT doc_id, count(*)::BIGINT AS n_chunks,
        |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  (1000 * CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*) AS boiler_permille,
        |  md5(coalesce(string_agg(CASE WHEN NOT boiler THEN chunk END, ' ' ORDER BY idx), ''))
        |    AS clean_fp
        |FROM mk GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val chunks = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("idx", explode(expr("sequence(0, (size(w) + 7) div 8 - 1)")))
        .select(col("doc_id"), col("idx"),
          concat_ws(" ", slice(col("w"), col("idx") * 8 + 1, lit(8))).as("chunk"))
        .withColumn("ck", md5(col("chunk")))
      val census = chunks.groupBy(col("ck"))
        .agg(countDistinct(col("doc_id")).cast("bigint").as("nd"))
      chunks.join(census, "ck")
        .withColumn("boiler", col("nd") >= 3)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("boiler"), 1L).otherwise(0L)).cast("bigint").as("n_boiler"),
          expr("(1000 * CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)) DIV count(1)")
            .as("boiler_permille"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(when(!col("boiler"),
              struct(col("idx"), col("chunk"))))),
            x => x.getField("chunk")))).as("clean_fp"))
    },

    // ----------------------------------------------------------------
    q("q245_exactsubstr",
      """ExactSubstr deduplication census (Lee et al. 2021,
        |"Deduplicating Training Data Makes Language Models Better",
        |arXiv 2107.06499 §4.1): for every document, the EXACT number of
        |token positions covered by some 50-token window that appears
        |verbatim more than once in the corpus (the paper's 50-token
        |removal threshold), the count of maximal removed intervals
        |after merging overlapping/adjacent windows, and the longest
        |such interval — the per-doc removal plan ExactSubstr derives
        |from its suffix array. q151 reports which 12-token spans
        |recur; this is the long-passage tier: what would actually be
        |CUT, with coverage merged the way the paper merges byte
        |ranges. Scale shape (the distributed reformulation of the
        |suffix array): stride-1 anchors hash scan-side and shuffle as
        |(hash, doc, pos) 24-byte rows with map-side combine — span
        |BYTES never move for the full corpus. Positions whose hash
        |recurs are semi-joined back (candidate-bounded), their actual
        |50-token text re-derived from a semi-filtered token slice and
        |VERIFIED by content equality — a hash collision cannot create
        |a false removal. Interval merging is one keyed window over
        |candidate positions (per-doc, bounded by doc length); output
        |is bounded by documents containing duplicated passages, never
        |the corpus.""".stripMargin,
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |x AS (SELECT doc_id, w, len(w) AS n,
        |        greatest(len(w) - 49, 0) AS nw FROM w),
        |sp AS (SELECT doc_id, unnest(range(1, nw + 1)) AS i, w FROM x),
        |sh AS (SELECT doc_id, i, array_to_string(w[i:(i+49)], ' ') AS s FROM sp),
        |dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1),
        |cand AS (SELECT doc_id, i FROM sh JOIN dup USING (s)),
        |brk AS (SELECT doc_id, i,
        |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 50
        |         THEN 0 ELSE 1 END AS b
        |  FROM cand),
        |grp AS (SELECT doc_id, i,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS g FROM brk),
        |runs AS (SELECT doc_id, g, min(i) AS lo, max(i) AS hi
        |  FROM grp GROUP BY doc_id, g)
        |SELECT r.doc_id, CAST(x.n AS BIGINT) AS n_tokens,
        |  CAST(sum(r.hi + 50 - r.lo) AS BIGINT) AS dup_tokens,
        |  CAST(count(*) AS BIGINT) AS n_runs,
        |  CAST(max(r.hi + 50 - r.lo) AS BIGINT) AS longest_run
        |FROM runs r JOIN x ON x.doc_id = r.doc_id
        |GROUP BY r.doc_id, x.n""".stripMargin) { (s, dir) =>
      exactSubstrCensus(Tables.documents(s, dir), 50)
    },

    // ----------------------------------------------------------------
    q("q249_dedup_yield",
      """Dedup threshold-yield curve — the calibration sweep a curation
        |run does BEFORE committing to a Jaccard cutoff (the threshold
        |sensitivity analyses of Lee et al. 2021 §5 and the SlimPajama/
        |RefinedWeb dedup reports): for every candidate threshold t in
        |100..900 permille, how many verified near-dup pairs qualify,
        |how many documents they touch, and how many the keep-smallest-
        |id rule would remove. q29 verifies pairs at ONE threshold;
        |this is the whole curve, so the operator that PICKS the
        |threshold is itself oracle-gated. Scale shape: rides the lsh
        |family's staged artifacts end to end (bands → candidates →
        |candidate-bounded shingle slice); exact Jaccard permille per
        |candidate pair is computed once; the 9-row threshold table
        |broadcasts through a non-equi join (qualified rows <= 9x the
        |verified-pair count — output-bounded, never corpus-bounded);
        |the curve is zero-filled from the threshold side so empty
        |levels are real rows.""".stripMargin,
      s"""WITH cand AS ($candidatesSql),
        |  sh AS ($shinglesSql),
        |  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |  inter AS (
        |    SELECT c.doc_a, c.doc_b, count(*) AS n_common
        |    FROM cand c
        |    JOIN sh sa ON sa.doc_id = c.doc_a
        |    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
        |    GROUP BY c.doc_a, c.doc_b),
        |  jp AS (
        |    SELECT i.doc_a, i.doc_b,
        |      (1000 * CAST(i.n_common AS BIGINT)) // (za.n + zb.n - i.n_common) AS jpm
        |    FROM inter i
        |    JOIN sizes za ON za.doc_id = i.doc_a
        |    JOIN sizes zb ON zb.doc_id = i.doc_b),
        |  th AS (SELECT CAST(unnest(range(100, 1000, 100)) AS BIGINT) AS threshold_pm),
        |  qual AS (SELECT th.threshold_pm, jp.doc_a, jp.doc_b
        |    FROM jp JOIN th ON jp.jpm >= th.threshold_pm),
        |  byp AS (SELECT threshold_pm, count(*)::BIGINT AS n_pairs,
        |      count(DISTINCT doc_b)::BIGINT AS n_removed
        |    FROM qual GROUP BY 1),
        |  byd AS (SELECT threshold_pm, count(DISTINCT d)::BIGINT AS n_docs
        |    FROM (SELECT threshold_pm, doc_a AS d FROM qual
        |          UNION ALL SELECT threshold_pm, doc_b FROM qual)
        |    GROUP BY 1)
        |SELECT th.threshold_pm,
        |  coalesce(byp.n_pairs, 0) AS n_pairs,
        |  coalesce(byd.n_docs, 0) AS n_docs_touched,
        |  coalesce(byp.n_removed, 0) AS n_removed_keepfirst
        |FROM th LEFT JOIN byp USING (threshold_pm)
        |LEFT JOIN byd USING (threshold_pm)""".stripMargin) { (s, dir) =>
      val sh = candShingles(s, dir)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = candIntersections(s, dir)
      // pair-bounded, but BOTH census branches (per-pair counts and the
      // doc-explode distinct) walk it — staged once per execution so the
      // intersection join never re-runs per branch
      val jp = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          expr("(1000 * CAST(n_common AS BIGINT)) DIV (na + nb - n_common)")
            .as("jpm"))
        .transform(graft.Graft.stagedCheckpoint)
      val th = s.range(1, 10)
        .select((col("id") * 100).cast("bigint").as("threshold_pm"))
      val qual = jp.join(broadcast(th), col("jpm") >= col("threshold_pm"))
      val byp = qual.groupBy(col("threshold_pm"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          countDistinct(col("doc_b")).cast("bigint").as("n_removed"))
      val byd = qual
        .select(col("threshold_pm"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .groupBy(col("threshold_pm"))
        .agg(countDistinct(col("d")).cast("bigint").as("n_docs"))
      th.join(byp, Seq("threshold_pm"), "left")
        .join(byd, Seq("threshold_pm"), "left")
        .select(col("threshold_pm"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs_touched"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed_keepfirst"))
    })

  /** q245's frame transform over an arbitrary (doc_id, text) frame —
    * the seam ExactSubstrSpec's planted-duplicate fixtures drive. See
    * the q245 registration for semantics and the scale argument. */
  private[graft] def exactSubstrCensus(docs: DataFrame, L: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val toks = docs
        .select(col("doc_id"),
          filter(split(col("text"), "\\s+"), x => x =!= "").as("w"))
      val anchors = toks
        .withColumn("nw", expr(s"greatest(size(w) - ${L - 1}, 0)"))
        .select(col("doc_id"), col("w"),
          explode(expr(
            "CASE WHEN nw > 0 THEN sequence(CAST(1 AS BIGINT), nw) ELSE array() END"))
            .as("i"))
        .select(col("doc_id"), col("i"),
          xxhash64(concat_ws(" ",
            slice(col("w"), col("i").cast("int"), lit(L)))).as("h"))
      // anchoring: the only corpus-sized shuffle keys on the 64-bit
      // hash; recurring hashes (bounded by duplicated spans + rare
      // collisions) come back as candidate positions
      val dupH = anchors.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
      val cand = anchors.join(dupH, Seq("h"), "left_semi")
        .select(col("doc_id"), col("i"))
      // verification: re-derive the actual 50-token text for candidate
      // positions only (token slices semi-filtered to candidate docs —
      // broadcast, the corpus side never shuffles) and demand content
      // equality, so a 64-bit collision cannot fabricate a removal
      val candDocs = cand.select(col("doc_id")).distinct()
      val candSpans = toks
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .join(cand, Seq("doc_id"))
        .select(col("doc_id"), col("i"),
          concat_ws(" ", slice(col("w"), col("i").cast("int"), lit(L))).as("s"))
      val ver = candSpans
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("s"))))
        .filter(col("cnt") > 1)
        .select(col("doc_id"), col("i"))
      val nt = toks.select(col("doc_id"), size(col("w")).cast("bigint").as("n_tokens"))
      removalRuns(ver, L)
        .join(nt, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
          col("n_runs"), col("longest_run"))
  }

  /** Interval-merge of verified duplicated anchor positions (doc_id, i)
    * into per-doc removal statistics — the paper's byte-range union in
    * token space: windows at i1 < i2 overlap or adjoin iff i2 <= i1 + L.
    * One keyed per-doc window over candidate positions (bounded by doc
    * length). Shared by q245's [[exactSubstrCensus]] and the
    * anchor-store incremental path ([[IncrementalExactSubstr]]). */
  private[graft] def removalRuns(ver: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    ver
      .withColumn("b",
        when(col("i") - lag(col("i"), 1).over(wd) <= L, 0L).otherwise(1L))
      .withColumn("g", sum(col("b")).over(wd))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("i")).as("lo"), max(col("i")).as("hi"))
      .groupBy(col("doc_id"))
      .agg(sum(col("hi") + L - col("lo")).cast("bigint").as("dup_tokens"),
        count(lit(1)).cast("bigint").as("n_runs"),
        max(col("hi") + L - col("lo")).cast("bigint").as("longest_run"))
  }

  /** 16-bit SimHash signature per doc (doc_id, simhash16), cached per
    * (session, dir) — q30's bucket profile (a sketch DEMO, never a
    * join key at scale; q77 joins on [[simhashSig60]]). Single shuffle
    * on doc_id for the bit aggregate; the 16x bit-position explode is
    * linear. */
  private val simhashCache = new SessionCache
  private[operators] def simhashSig(s: SparkSession, dir: String): DataFrame =
    simhashCache.getOrElseUpdate(s, dir) {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .distinct()
      val nib = toks.select(col("doc_id") +: (1 to 4).map(i =>
        (instr(lit("0123456789abcdef"), substring(md5(col("w")), i, 1)) - 1).as(s"v$i")): _*)
      val bits = nib
        .withColumn("p", explode(sequence(lit(0), lit(15))))
        .withColumn("nibv",
          when(expr("p div 4") === 0, col("v1"))
            .when(expr("p div 4") === 1, col("v2"))
            .when(expr("p div 4") === 2, col("v3"))
            .otherwise(col("v4")))
        .withColumn("mask", expr("CASE p % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END"))
        .withColumn("bit", expr("(nibv div mask) % 2"))
        .groupBy(col("doc_id"), col("p"))
        .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("bsum"))
      bits
        .withColumn("weight", expr("shiftleft(1, 15 - p)"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("bsum") >= 0, col("weight")).otherwise(0)).cast("bigint").as("simhash16"))
        .cache()
    }

  /** 60-bit SimHash signature per doc (doc_id, simhash60), cached per
    * (session, dir) — the join-grade signature q77's Hamming search
    * buckets on. Same construction as [[simhashSig]] but over the first
    * 15 md5 hex nibbles (60 bit positions). Width is what makes the
    * signature JOINABLE at scale: a 16-bit space (65,536 values)
    * saturates at corpus size, so 16-bit bucket joins degenerate to
    * O(n^2 / buckets) — the pre-round-13 q77 planned 362M candidate
    * rows and spilled 50 GB at sf1 (SCALE.md §8). At 60 bits,
    * signature agreement tracks real token overlap instead of sketch
    * saturation. One md5 per distinct token; the 60x bit-position
    * explode and the two aggregates are linear in token count. */
  private val simhash60Cache = new SessionCache
  private[operators] def simhashSig60(s: SparkSession, dir: String): DataFrame =
    simhash60Cache.getOrElseUpdate(s, dir) {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .distinct()
      val bits = toks
        .withColumn("h", substring(md5(col("w")), 1, 15))
        .withColumn("p", explode(sequence(lit(0), lit(59))))
        .withColumn("nibv",
          expr("instr('0123456789abcdef', substring(h, p div 4 + 1, 1)) - 1"))
        .withColumn("mask", expr("CASE p % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END"))
        .withColumn("bit", expr("(nibv div mask) % 2"))
        .groupBy(col("doc_id"), col("p"))
        .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("bsum"))
      bits
        .withColumn("weight", expr("shiftleft(CAST(1 AS BIGINT), 59 - p)"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("bsum") >= 0, col("weight")).otherwise(0)).cast("bigint").as("simhash60"))
        .cache()
    }

  /** DuckDB twin of [[simhashSig60]] as a CTE chain ending in
    * `sig60(doc_id, simhash60)`. */
  private[operators] def simhashSql60Ctes: String =
    """toks60 AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |bits60 AS (
      |  SELECT doc_id, p,
      |    sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(w), p // 4 + 1, 1)) - 1)
      |          // (CASE p % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
      |        THEN 1 ELSE -1 END) AS bsum
      |  FROM toks60, unnest(range(0, 60)) AS t(p)
      |  GROUP BY doc_id, p),
      |sig60 AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN bsum >= 0 THEN (CAST(1 AS BIGINT) << (59 - p)) ELSE 0 END)
      |      AS BIGINT) AS simhash60
      |  FROM bits60 GROUP BY doc_id)""".stripMargin

  /** DuckDB twin of [[simhashSig]] as a CTE chain ending in
    * `sig(doc_id, simhash16)`. (A def, not a val: it is interpolated
    * inside `defs`' initializer, which runs before later vals would
    * initialize.) */
  private[operators] def simhashSqlCtes: String =
    """toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |nib AS (
      |  SELECT doc_id, w,
      |    strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1 AS v1,
      |    strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1 AS v2,
      |    strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1 AS v3,
      |    strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1 AS v4
      |  FROM toks),
      |bits AS (
      |  SELECT doc_id, p,
      |    sum(CASE WHEN ((CASE p // 4 WHEN 0 THEN v1 WHEN 1 THEN v2 WHEN 2 THEN v3 ELSE v4 END)
      |          // (CASE p % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
      |        THEN 1 ELSE -1 END) AS bsum
      |  FROM nib, unnest(range(0, 16)) AS t(p)
      |  GROUP BY doc_id, p),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN bsum >= 0 THEN
      |      (CASE p WHEN 0 THEN 32768 WHEN 1 THEN 16384 WHEN 2 THEN 8192 WHEN 3 THEN 4096
      |              WHEN 4 THEN 2048 WHEN 5 THEN 1024 WHEN 6 THEN 512 WHEN 7 THEN 256
      |              WHEN 8 THEN 128 WHEN 9 THEN 64 WHEN 10 THEN 32 WHEN 11 THEN 16
      |              WHEN 12 THEN 8 WHEN 13 THEN 4 WHEN 14 THEN 2 ELSE 1 END)
      |      ELSE 0 END) AS BIGINT) AS simhash16
      |  FROM bits GROUP BY doc_id)""".stripMargin
}
