package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus-statistics tier q212-q214: each test recomputes
  * the statistic from the raw `documents` table with plain Scala
  * collections and compares exactly — independent of both the Spark
  * plan and the DuckDB oracle, so a shared misreading of the published
  * definition can't pass by agreement. Tokenization under test is the
  * q82 family: lower, split on single space, drop empty.
  */
class CorpusStatsSpec extends SparkSpec {

  private val sfDir = TestSession.sfDir
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  /** (doc_id, source, tokens) for every document, q82 tokenization. */
  private lazy val docs: Array[(Long, String, Array[String])] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1).filter(_.nonEmpty)))

  test("q212 vocab growth equals a Scala recompute and the samples nest") {
    val rows = byName("q212_vocab_growth").run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    def lvl(docId: Long): Long = ((31L * docId + 7L) % 2147483647L) % 1000L / 100L + 1L
    val byLvl = docs.groupBy { case (id, _, _) => lvl(id) }
    val firstLvl = docs.flatMap { case (id, _, toks) => toks.map(_ -> lvl(id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val levels = byLvl.keySet
    val expected = levels.map { l =>
      val newTypes = firstLvl.count(_._2 == l).toLong
      val docsCum = byLvl.filter(_._1 <= l).values.map(_.length.toLong).sum
      val toksCum = byLvl.filter(_._1 <= l).values.flatten.map(_._3.length.toLong).sum
      val vocabCum = firstLvl.count(_._2 <= l).toLong
      l -> ((docsCum, toksCum, vocabCum, newTypes))
    }.toMap
    assert(rows == expected, "vocab growth diverges from the Scala recompute")
    // nesting: every cumulative column is monotone non-decreasing in level,
    // and the top level covers the whole corpus exactly
    val ordered = rows.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted, "cumulative columns must be monotone")
    val top = rows(rows.keys.max)
    assert(top._1 == docs.length.toLong, "top level must contain every doc")
    assert(top._3 == firstLvl.size.toLong, "top level must contain the full vocabulary")
  }

  test("q213 lexical diversity equals a Scala recompute per source") {
    val rows = byName("q213_lexical_diversity").run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val expected = docs.groupBy(_._2).map { case (src, rs) =>
      val counts = rs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong)
      val types = counts.size.toLong
      val tokens = counts.values.sum
      val hapax = counts.count(_._2 == 1L).toLong
      src -> ((types, tokens, hapax, 1000000L * types / tokens, 1000L * hapax / types))
    }
    assert(rows == expected, "lexical diversity diverges from the Scala recompute")
    rows.values.foreach { case (types, tokens, hapax, _, _) =>
      assert(hapax <= types && types <= tokens)
    }
  }

  test("q220 duplicate-ngram rate equals a Scala sliding-window recompute") {
    // NOTE: q220/q221 shingle on the RAW text (the q27 dedup
    // convention), not the lowercased q82 tokenization
    val raw = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expected = raw.groupBy(_._1).map { case (src, rs) =>
      val grams = rs.flatMap(_._2.sliding(3).filter(_.length == 3).map(_.mkString(" ")))
      val counts = grams.groupBy(identity).view.mapValues(_.length.toLong)
      val total = counts.values.sum
      val dup = total - counts.size
      src -> ((total, counts.size.toLong, dup, 1000L * dup / total))
    }
    val got = byName("q220_dup_ngram_rate").run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, "dup-ngram rate diverges from the sliding recompute")
    got.values.foreach { case (total, distinct, dup, _) =>
      assert(dup == total - distinct && dup >= 0)
    }
  }

  test("q221 top ngrams equal a Scala recompute with running coverage") {
    val grams = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1).sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")))
    val counts = grams.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val total = counts.map(_._2).sum
    val top = counts.sortBy { case (sh, c) => (-c, sh) }.take(20)
    val expected = top.zipWithIndex.map { case ((sh, c), i) =>
      (i + 1L, sh, c, top.take(i + 1).map(_._2).sum, total)
    }
    val got = byName("q221_top_ngrams").run(spark, sfDir).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expected, "top ngrams diverge from the Scala recompute")
  }

  test("q214 vocab overlap equals a Scala set recompute for every source pair") {
    val rows = byName("q214_vocab_overlap").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    val vocab = docs.groupBy(_._2).view.mapValues(_.flatMap(_._3).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
    } yield {
      val na = vocab(a).size.toLong; val nb = vocab(b).size.toLong
      val union = na + nb - inter
      (a, b) -> ((na, nb, inter, union, 1000L * inter / union, 1000L * inter / math.min(na, nb)))
    }).toMap
    assert(rows == expected, "vocab overlap diverges from the Scala set recompute")
  }

  test("q233 collocations equal a Scala Dice recompute over adjacent pairs") {
    val uni = docs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val big = docs.flatMap { case (_, _, w) =>
      w.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c >= 5 }.toMap
    val scored = big.toSeq.map { case ((v, t), np) =>
      (s"$v $t", np, uni(v), uni(t), 2000L * np / (uni(v) + uni(t)))
    }
    val expected = scored.sortBy { case (bg, _, _, _, dice) => (-dice, bg) }
      .take(20).zipWithIndex
      .map { case ((bg, np, nv, nw, dice), i) => (i + 1L, bg, np, nv, nw, dice) }
      .toSet
    val rows = byName("q233_collocations").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows == expected, "Dice collocations diverge from the Scala recompute")
  }

  test("q234 keyness equals a Scala simple-maths recompute per source") {
    val st = docs.flatMap { case (_, src, w) => w.map(t => (src, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tt = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val srcN = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nAll = st.values.sum
    val expected = srcN.keys.flatMap { src =>
      val terms = st.collect { case ((s, t), c) if s == src => (t, c) }.toSeq
      val scored = terms.map { case (t, c) =>
        val fpmIn = 1000000L * c / srcN(src)
        val fpmOut = 1000000L * (tt(t) - c) / (nAll - srcN(src))
        (t, c, fpmIn, fpmOut, 1000L * (fpmIn + 100) / (fpmOut + 100))
      }
      scored.sortBy { case (t, _, _, _, k) => (-k, t) }.take(5).zipWithIndex
        .map { case ((t, c, fi, fo, k), i) => (src, i + 1L, t, c, fi, fo, k) }
    }.toSet
    val rows = byName("q234_keyness").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(rows == expected, "keyness diverges from the Scala recompute")
    // every keyness must be positive and a source's rank-1 term must be
    // at least as key as its rank-5 term
    rows.groupBy(_._1).values.foreach { rs =>
      val byRk = rs.toSeq.sortBy(_._2).map(_._7)
      assert(byRk.head >= byRk.last && byRk.forall(_ > 0))
    }
  }

  test("q236 Simpson diversity equals a Scala recompute; probability bounds hold") {
    val rows = byName("q236_simpson_diversity").run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val expected = docs.groupBy(_._2).map { case (src, rs) =>
      val counts = rs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong)
      val n = counts.values.sum
      val rp = counts.values.map(c => c * (c - 1)).sum
      val conc = 1000000L * rp / (n * (n - 1))
      src -> ((n, counts.size.toLong, rp, conc, 1000000L - conc))
    }
    assert(rows == expected, "Simpson index diverges from the Scala recompute")
    rows.values.foreach { case (n, v, rp, conc, gini) =>
      assert(conc >= 0 && conc <= 1000000L && conc + gini == 1000000L)
      assert(rp <= n * (n - 1), "repeat pairs are a subset of all pairs")
      assert(v > 1 || conc == 1000000L, "a one-type source is pure concentration")
    }
  }

  test("q237 q-gram spectrum cosine equals a Scala recompute; bounded by 1") {
    val prof: Map[String, Map[String, Long]] = docs.groupBy(_._2).map {
      case (src, rs) =>
        src -> rs.flatMap(_._3.sliding(3).filter(_.length == 3).map(_.mkString(" ")))
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }
    val srcs = prof.keys.toSeq.sorted
    val n2 = prof.view.mapValues(_.values.map(c => c * c).sum).toMap
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      dot = prof(a).keysIterator.map(sh => prof(a)(sh) * prof(b).getOrElse(sh, 0L)).sum
      if dot > 0
    } yield (a, b, dot, n2(a), n2(b),
      1000000L * dot / n2(a) * dot / n2(b))).toSet
    val rows = byName("q237_qgram_spectrum").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows == expected, "spectrum cosine diverges from the Scala recompute")
    rows.foreach { case (_, _, dot, na, nb, c2) =>
      assert(c2 >= 0 && c2 <= 1000000L, "cos^2 is a probability-scaled ratio")
      assert(dot * dot <= na * nb, "Cauchy-Schwarz must hold on exact integers")
    }
  }

  test("q222 unseen mass / Chao1 equals a Scala recompute and bounds hold") {
    val rows = byName("q222_unseen_mass").run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val expected = docs.groupBy(_._2).map { case (src, rs) =>
      val counts = rs.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong)
      val n = counts.values.sum
      val v = counts.size.toLong
      val n1 = counts.count(_._2 == 1L).toLong
      val n2 = counts.count(_._2 == 2L).toLong
      src -> ((n, v, n1, n2, 1000L * n1 / n, v + n1 * (n1 - 1) / (2 * (n2 + 1))))
    }
    assert(rows == expected, "unseen-mass estimators diverge from the Scala recompute")
    // estimator sanity: Chao1 lower-bounds richness at >= observed types,
    // and the unseen mass is a probability share (< 1000 permille)
    rows.values.foreach { case (n, v, n1, _, mass, chao1) =>
      assert(chao1 >= v, "Chao1 must never fall below observed richness")
      assert(mass >= 0 && mass < 1000, "unseen mass must be a sub-unit share")
      assert(n1 <= v && v <= n, "counter ordering n1 <= V <= N must hold")
    }
  }
}
