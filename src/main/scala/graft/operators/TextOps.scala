package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting, and corpus-level lexical
  * statistics (vocabulary growth, diversity, cross-source overlap).
  *
  * The per-document tier (q22-q25, q206) is embarrassingly parallel
  * row-level transforms — no shuffle, full whole-stage codegen, and at
  * 100 TB they scan-bound exactly like the reference's review-text
  * stages (SURVEY.md §2.9 M2, reference generator.py:63,181-183
  * lowercase/split normalization). The corpus-statistics tier
  * (q212-q214) adds exactly one vocab-keyed shuffle each (map-side
  * combine; state bounded by vocabulary size, never corpus size).
  *
  * Determinism notes: tokenization is whitespace split (the corpus is
  * pre-normalized), hashes are md5 hex (identical in Spark and DuckDB),
  * ratios are double divisions of exact integers.
  */
object TextOps {

  /** Stopword list used for quality scoring / language ID. */
  val Stopwords = Seq("the", "a", "of", "and", "to")

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q22_token_stats",
      """Token counting (whitespace + alpha-token regex — the BPE-ish
        |pre-tokenizer shape): per-doc token/char counts.""".stripMargin,
      """SELECT doc_id, lang,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
        |  length(text) AS n_chars_measured,
        |  n_chars
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("bigint").as("n_alpha_tokens"),
        length(col("text")).cast("bigint").as("n_chars_measured"),
        col("n_chars"))
    },

    // ----------------------------------------------------------------
    q("q23_quality_score",
      """Quality scoring: length, stopword ratio, mean token length —
        |the standard pre-training heuristics (C4/Gopher-style rules).
        |Pure scalar math over exact integer counts; the score is a
        |single double expression so both engines agree bitwise.""".stripMargin,
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens, n_stop,
        |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |  CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_token_len,
        |  CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
        |        AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.01 THEN 1 ELSE 0 END AS keep_flag
        |FROM t""".stripMargin) { (s, dir) =>
      val stopList = Stopwords.map(w => s"'$w'").mkString(",")
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
        .withColumn("n_stop",
          size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))")).cast("bigint"))
        .withColumn("n_chars_m", length(col("text")).cast("bigint"))
        .select(
          col("doc_id"), col("lang"), col("n_tokens"), col("n_stop"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
          ((col("n_chars_m") - col("n_tokens") + 1).cast("double") / col("n_tokens")).as("avg_token_len"),
          when(col("n_tokens").between(20, 1000) &&
            col("n_stop").cast("double") / col("n_tokens") >= 0.01, 1)
            .otherwise(0).as("keep_flag"))
    },

    // ----------------------------------------------------------------
    q("q24_lang_id",
      """Language-ID heuristic (marker-token n-gram scoring) evaluated as
        |a confusion matrix vs the labeled lang column. On this synthetic
        |corpus the text is English-ish regardless of label, so the value
        |is the deterministic evaluation plumbing, not accuracy.""".stripMargin,
      """WITH pred AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','to'))) > 0 THEN 'en' ELSE 'und' END AS lang_pred
        |  FROM documents)
        |SELECT lang, lang_pred, count(*) AS n_docs
        |FROM pred GROUP BY lang, lang_pred""".stripMargin) { (s, dir) =>
      val stopList = Stopwords.map(w => s"'$w'").mkString(",")
      Tables.documents(s, dir)
        .withColumn("lang_pred",
          when(size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))")) > 0, "en")
            .otherwise("und"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // ----------------------------------------------------------------
    q("q25_fingerprint",
      """Document fingerprinting: md5 of whitespace-normalized text plus
        |per-fingerprint duplicate count (window). The fingerprint is the
        |exact-dedup key at scale — grouping by it is a plain
        |hash-shuffle, and the window shares that shuffle.""".stripMargin,
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')) AS fp,
        |  count(*) OVER (PARTITION BY md5(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'))) AS dup_count
        |FROM documents""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val fp = md5(regexp_replace(lower(col("text")), "[ \t\n\r\f]+", " "))
      Tables.documents(s, dir)
        .withColumn("fp", fp)
        .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .select(col("doc_id"), col("fp"), col("dup_count"))
    },

    // ----------------------------------------------------------------
    q("q91_repetition_ratio",
      """Intra-document repetition (Gopher-style quality rule): the
        |fraction of word 2-grams that are duplicates of an earlier
        |2-gram in the SAME document. Computed entirely array-native —
        |transform builds the 2-gram list, array_distinct dedups it,
        |two size() calls give the counts — so the operator is a pure
        |scan-side projection: zero shuffle, full codegen, and at
        |100 TB it rides the same scan as the other quality signals.
        |The repetitive flag uses integer cross-multiplication
        |((n - distinct) * 10 > n * 3 <=> dup fraction > 0.3), so no
        |float division exists anywhere in the row.""".stripMargin,
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) >= 2
        |         THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |         ELSE CAST([] AS VARCHAR[]) END AS g2
        |  FROM w)
        |SELECT doc_id,
        |  CAST(len(g2) AS BIGINT) AS n_2grams,
        |  CAST(len(list_distinct(g2)) AS BIGINT) AS n_distinct_2grams,
        |  CAST(CASE WHEN (len(g2) - len(list_distinct(g2))) * 10 > len(g2) * 3
        |       THEN 1 ELSE 0 END AS BIGINT) AS repetitive
        |FROM g""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .withColumn("g2", expr(
          """CASE WHEN size(w) >= 2
            |THEN transform(sequence(1, size(w) - 1),
            |     i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))
            |ELSE array() END""".stripMargin))
        .select(col("doc_id"),
          size(col("g2")).cast("bigint").as("n_2grams"),
          size(array_distinct(col("g2"))).cast("bigint").as("n_distinct_2grams"),
          ((size(col("g2")) - size(array_distinct(col("g2")))) * 10 >
            size(col("g2")) * 3).cast("bigint").as("repetitive"))
    },

    // ----------------------------------------------------------------
    q("q96_pii_scrub",
      """PII scrubbing — the redaction pass every pre-training corpus
        |runs: detect and replace email addresses and phone numbers with
        |typed placeholders, reporting match counts and a fingerprint of
        |the redacted text. The corpus text carries no PII, so each row
        |deterministically injects doc_id-derived emails (doc_id mod 3
        |occurrences) and phone numbers (doc_id mod 2) first — giving
        |the regexes real, position-varied work that the oracle
        |re-derives from the same arithmetic. Patterns stay inside the
        |Java-regex/RE2 common subset (classes, +, {n,}), and the
        |DuckDB side passes the 'g' flag (its regexp_replace is
        |first-match-only by default, Spark's is global). Entirely
        |scan-side: zero shuffle, full codegen.""".stripMargin,
      """WITH t AS (
        |  SELECT doc_id,
        |    text || repeat(' contact user' || CAST(doc_id AS VARCHAR) || '@example.com',
        |                   CAST(doc_id % 3 AS INT))
        |         || repeat(' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'),
        |                   CAST(doc_id % 2 AS INT)) AS t2
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, t2,
        |    regexp_replace(regexp_replace(t2,
        |      '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t2, '\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  CAST(length(redacted) AS BIGINT) AS n_redacted_chars,
        |  md5(redacted) AS redacted_fp
        |FROM r""".stripMargin) { (s, dir) =>
      val EmailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val PhoneRe = "\\d{3}-\\d{4}"
      Tables.documents(s, dir)
        .withColumn("t2", expr(
          """concat(text,
            |  repeat(concat(' contact user', CAST(doc_id AS STRING), '@example.com'),
            |         CAST(doc_id % 3 AS INT)),
            |  repeat(concat(' call 555-01', lpad(CAST(doc_id % 100 AS STRING), 2, '0')),
            |         CAST(doc_id % 2 AS INT)))""".stripMargin))
        .withColumn("redacted",
          regexp_replace(regexp_replace(col("t2"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t2"), lit(EmailRe), lit(0))).cast("bigint").as("n_emails"),
          size(regexp_extract_all(col("t2"), lit(PhoneRe), lit(0))).cast("bigint").as("n_phones"),
          length(col("redacted")).cast("bigint").as("n_redacted_chars"),
          md5(col("redacted")).as("redacted_fp"))
    },

    // ----------------------------------------------------------------
    q("q98_rolling_fingerprint",
      """Polynomial rolling-hash document fingerprinting (the Rabin-Karp
        |/ winnowing family, vs q25's md5): fold every character's code
        |point through h = (h*131 + c) mod 1e9+7, plus the MIN of the
        |per-64-char-block rolling hashes — the winnowing-style content
        |fingerprint that survives document reordering at block
        |granularity. Runs through the NATIVE codegen expressions
        |(plans/RollingHash: one fused primitive loop per row, inlined
        |into whole-stage codegen) — the higher-order-function
        |formulation of the same recurrence measured ~4 ms/doc
        |interpreted, the costliest scan op in the suite. All integer
        |arithmetic (the accumulator stays under 2^37, no overflow on
        |either engine), code-point-indexed identically on both sides.
        |Entirely scan-side: zero shuffle, one projection. The oracle
        |re-folds the same recurrence with list_reduce.""".stripMargin,
      """WITH codes AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS cs
        |  FROM documents),
        |blocks AS (
        |  SELECT doc_id, cs, CAST(ceil(len(cs) / 64.0) AS BIGINT) AS n_blocks
        |  FROM codes)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
        |    (a, c) -> (a * 131 + c) % 1000000007) AS rh_full,
        |  list_min(list_transform(range(0, n_blocks), b ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs[64*b+1 : 64*b+64]),
        |      (a, c) -> (a * 131 + c) % 1000000007))) AS rh_min_block,
        |  n_blocks
        |FROM blocks""".stripMargin) { (s, dir) =>
      graft.plans.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          call_function("rolling_hash", col("text")).as("rh_full"),
          call_function("rolling_minblock_hash", col("text")).as("rh_min_block"),
          expr("CAST(ceil(length(text) / 64.0) AS BIGINT)").as("n_blocks"))
    },

    // ----------------------------------------------------------------
    q("q152_winnowing",
      """TRUE winnowing fingerprint selection (Schleimer et al. SIGMOD
        |2003, the MOSS algorithm) — the passage-overlap primitive q98's
        |per-doc scalars can't provide: character 8-gram rolling hashes
        |(q98's exact base-131 recurrence), a sliding 16-hash window,
        |each window's MINIMUM selected; the distinct selections are the
        |doc's fingerprint set. The guarantee: any shared passage of
        |>= 23 chars (w + k - 1) between two docs yields a shared
        |fingerprint, at ~2/(w+1) expected density — overlap detection
        |becomes a fingerprint equi-join, never a text comparison. Runs
        |through the NATIVE plans/Winnow expression: one static JVM
        |kernel call per row inside whole-stage codegen (primitive
        |arrays, no boxing, eval/codegen share the kernel). Scan-side:
        |explode of a per-doc bounded array, zero shuffle. The oracle
        |re-derives every gram hash, window minimum, and the distinct
        |set in DuckDB list algebra.""".stripMargin,
      """WITH codes AS (
        |  SELECT doc_id, list_transform(range(1, length(text) + 1),
        |    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS cs
        |  FROM documents),
        |g AS (SELECT doc_id, cs, greatest(len(cs) - 7, 0) AS m FROM codes),
        |h AS (
        |  SELECT doc_id, m,
        |    list_transform(range(1, m + 1),
        |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+7]),
        |        (a, c) -> (a * 131 + c) % 1000000007)) AS hs
        |  FROM g),
        |wins AS (
        |  SELECT doc_id, hs,
        |    CASE WHEN m <= 0 THEN 0 ELSE greatest(m - 15, 1) END AS nwin
        |  FROM h)
        |SELECT doc_id,
        |  CAST(unnest(list_distinct(list_transform(range(1, nwin + 1),
        |    j -> list_min(hs[j:j+15])))) AS BIGINT) AS fp
        |FROM wins""".stripMargin) { (s, dir) =>
      graft.plans.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(call_function("winnow_fingerprints", col("text"))).as("fp"))
    },

    // ----------------------------------------------------------------
    q("q100_bigram_vocab",
      """BPE-style merge-candidate counting — the inner step of
        |tokenizer training: count every adjacent token pair across the
        |corpus and keep the top 50 (the pair a BPE trainer would merge
        |next, iterated). Scale shape: pair expansion is scan-side
        |(q91's array-transform bigram construction, then explode — no
        |join), counting is one hash shuffle with map-side combine over
        |pair cardinality (not corpus size), and the global top-50 is a
        |TakeOrdered — never a full sort, never a partition-less window.
        |The (cnt desc, bigram asc) order makes the cutoff
        |deterministic under ties.""".stripMargin,
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT unnest(CASE WHEN len(w) >= 2
        |    THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS bigram
        |  FROM w)
        |SELECT bigram, count(*) AS cnt
        |FROM g GROUP BY bigram
        |ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(split(col("text"), " ").as("w"))
        .select(explode(expr(
          """CASE WHEN size(w) >= 2
            |THEN transform(sequence(1, size(w) - 1),
            |     i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))
            |ELSE array() END""".stripMargin)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram")).limit(50)
    },

    // ----------------------------------------------------------------
    q("q156_pmi_collocations",
      """Collocation extraction by pointwise mutual information — the
        |phrase-mining step between q100's raw bigram counts and a
        |tokenizer/phrase vocabulary: PMI = log of
        |c_ab·N_u² / (N_b·c_a·c_b), and since log is monotone the
        |ranking needs only the RATIO, carried as an integer in parts
        |per million through DECIMAL(38) intermediates — no log(), no
        |floats, no cross-engine drift (the classic failure here is two
        |engines disagreeing in the 15th bit of a log and swapping two
        |ranks). Min support c_ab >= 5 applies BEFORE the marginal
        |joins, so only supported pairs (a vanishing fraction of pair
        |space) ever join the unigram table. Scale shape: pair and
        |unigram counting are one hash shuffle each with map-side
        |combine over vocabulary cardinality; the two scalar totals
        |broadcast; top-30 is TakeOrdered with a deterministic
        |(pmi desc, bigram) tie break.""".stripMargin,
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b
        |      FROM w WHERE len(w) >= 2),
        |pp AS (SELECT a, b FROM p WHERE a <> '' AND b <> ''),
        |cab AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM pp GROUP BY 1, 2),
        |u AS (SELECT t, count(*)::BIGINT AS c
        |      FROM (SELECT unnest(w) AS t FROM w) WHERE t <> '' GROUP BY 1),
        |nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_u FROM u),
        |nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_b FROM cab)
        |SELECT a || ' ' || b AS bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
        |  CAST((CAST(c_ab AS HUGEINT) * n_u * n_u * 1000000)
        |       // (CAST(n_b AS HUGEINT) * ua.c * ub.c) AS BIGINT) AS pmi_ppm
        |FROM cab JOIN u ua ON ua.t = cab.a JOIN u ub ON ub.t = cab.b, nu, nb
        |WHERE c_ab >= 5
        |ORDER BY pmi_ppm DESC, bigram LIMIT 30""".stripMargin) { (s, dir) =>
      val w = Tables.documents(s, dir).select(split(col("text"), " ").as("w"))
      val pairs = w.filter(size(col("w")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(w) - 1),
            |          i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))""".stripMargin)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= "" && col("b") =!= "")
      val cab = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      val uni = w.select(explode(col("w")).as("t")).filter(col("t") =!= "")
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val nu = uni.agg(sum(col("c")).cast("long").as("n_u"))
      val nb = cab.agg(sum(col("c_ab")).cast("long").as("n_b"))
      cab.filter(col("c_ab") >= 5)
        .join(uni.select(col("t").as("a"), col("c").as("c_a")), Seq("a"))
        .join(uni.select(col("t").as("b"), col("c").as("c_b")), Seq("b"))
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(concat_ws(" ", col("a"), col("b")).as("bigram"),
          col("c_ab"), col("c_a"), col("c_b"),
          expr("""CAST((CAST(c_ab AS DECIMAL(38,0)) * n_u * n_u * 1000000)
                 |     DIV (CAST(n_b AS DECIMAL(38,0)) * c_a * c_b) AS BIGINT)""".stripMargin)
            .as("pmi_ppm"))
        .orderBy(col("pmi_ppm").desc, col("bigram")).limit(30)
    },

    // ----------------------------------------------------------------
    q("q111_unicode_nfc",
      """Unicode NFC normalization — the text-pipeline prerequisite every
        |byte-keyed dedup (q26/q95/q98) silently assumes: the same
        |visible string can arrive composed (U+00E9) or decomposed
        |(e + U+0301) and must hash identically. Spark has no built-in
        |normalizer, so this runs graft's native codegen
        |`nfc_normalize` Expression (plans/UnicodeNorm — inlines into
        |whole-stage codegen, no per-row boxing); the oracle runs
        |DuckDB's independent built-in of the same public UAX #15
        |algorithm, pinning the transform byte-for-byte. The fixture
        |splices deterministic decomposed sequences (combining acute /
        |diaeresis, doc_id-varied repetition) onto each document's text
        |scan-side; a pure projection — zero shuffle at any scale.""".stripMargin,
      """WITH r AS (
        |  SELECT doc_id,
        |    substr(text, 1, 16) || ' nai' || chr(776) || 've cafe' || chr(769)
        |      || ' ' || repeat('o' || chr(776), CAST(doc_id % 4 AS INT)) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS nfc,
        |  CAST(length(raw) AS BIGINT) AS raw_chars,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_chars,
        |  (nfc_normalize(raw) <> raw) AS changed
        |FROM r""".stripMargin) { (s, dir) =>
      graft.plans.GraftFunctions.register(s)
      // the literals below are DECOMPOSED (base letter + combining
      // diaeresis U+0308 / acute U+0301), matching the oracle's
      // chr(776)/chr(769) splices — NFC genuinely rewrites them
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 16),
            lit(" naïve café "),
            expr("repeat('ö', CAST(doc_id % 4 AS INT))")).as("raw"))
        .select(col("doc_id"),
          expr("nfc_normalize(raw)").as("nfc"),
          length(col("raw")).cast("long").as("raw_chars"),
          length(expr("nfc_normalize(raw)")).cast("long").as("nfc_chars"),
          expr("nfc_normalize(raw) != raw").as("changed"))
    },

    // ----------------------------------------------------------------
    q("q128_char_diversity",
      """Character-distribution diversity — the quality-filter signal
        |that catches degenerate text ("aaaa...", keyboard mash, base64
        |blobs) that q23's length/stopword ratios miss: per document,
        |the Gini impurity 1 - Σ p_c² of the alphanumeric character
        |distribution, plus the distinct-character count. Impurity is
        |RATIONAL in the counts (unlike Shannon entropy's logs), so it
        |runs in exact integer arithmetic: ((m² - Σ cnt²)·1e6) div m²
        |ppm, bit-identical in both engines. Per-character counts come
        |from the replace trick — cnt(c) = len(s) - len(replace(s, c))
        |— 36 codegen'd scalar passes per row, a pure scan-side
        |projection: zero shuffle, zero row blowup at any scale. The
        |oracle instead unnests a 36-row alphabet frame against the
        |corpus (cross join + re-aggregate) — same counts from an
        |independent relational formulation.""".stripMargin,
      """WITH a AS (
        |  SELECT chr(CAST(97 + i AS INTEGER)) AS ch FROM range(0, 26) r(i)
        |  UNION ALL SELECT chr(CAST(48 + i AS INTEGER)) FROM range(0, 10) r(i)),
        |c AS (
        |  SELECT doc_id, ch,
        |    CAST(len(lower(text)) - len(replace(lower(text), ch, '')) AS BIGINT) AS cnt
        |  FROM documents, a),
        |s AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS m,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS ss,
        |    CAST(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_chars
        |  FROM c GROUP BY 1)
        |SELECT doc_id, m AS n_alnum, n_distinct_chars,
        |  CASE WHEN m = 0 THEN 0 ELSE ((m * m - ss) * 1000000) // (m * m) END AS gini_ppm
        |FROM s""".stripMargin) { (s, dir) =>
      val alphabet: Seq[Char] = ('a' to 'z') ++ ('0' to '9')
      val cnts = alphabet.map(c =>
        (length(lower(col("text"))) -
          length(expr(s"replace(lower(text), '$c', '')")))
          .cast("long").as(s"c_$c"))
      Tables.documents(s, dir)
        .select(col("doc_id") +: cnts: _*)
        .select(col("doc_id"),
          alphabet.map(c => col(s"c_$c")).reduce(_ + _).as("m"),
          alphabet.map(c => col(s"c_$c") * col(s"c_$c")).reduce(_ + _).as("ss"),
          alphabet.map(c => when(col(s"c_$c") > 0, 1L).otherwise(0L)).reduce(_ + _)
            .as("n_distinct_chars"))
        .select(col("doc_id"), col("m").as("n_alnum"), col("n_distinct_chars"),
          when(col("m") === 0, 0L)
            .otherwise(expr("((m * m - ss) * 1000000) DIV (m * m)")).as("gini_ppm"))
    },

    // ----------------------------------------------------------------
    q("q192_quality_dup_profile",
      """Quality-decile × duplication CROSS-SIGNAL profile — the
        |calibration curve a curation pipeline reads before composing
        |its filters (if low-quality docs are also the duplicated ones,
        |one filter is redundant): docs ranked into 10 exact deciles by
        |stopword permille (q23's signal as an integer), each decile
        |reporting its exact-duplicate rate (q26's fingerprint, shared
        |content = md5 collision across docs).  The global rank over
        |the (score, doc_id) total order comes from DistributedRank
        |(range repartition + local sort + triangular offset join —
        |q85's scale shape, no partition-less window anywhere); the
        |oracle builds the SAME total order with plain SQL windows,
        |pinning the decile boundaries exactly.""".stripMargin,
      """WITH t AS (
        |  SELECT doc_id, md5(text) AS f,
        |    (1000 * CAST(len(list_filter(string_split(text, ' '),
        |       x -> x IN ('the','a','of','and','to'))) AS BIGINT))
        |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |fp AS (SELECT f, count(*)::BIGINT AS n_copies FROM t GROUP BY 1),
        |hist AS (SELECT score, count(*)::BIGINT AS cnt FROM t GROUP BY 1),
        |cum AS (
        |  SELECT score,
        |    CAST(sum(cnt) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS BIGINT) AS below,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n
        |  FROM hist),
        |r AS (
        |  SELECT t.doc_id, t.score, fp.n_copies > 1 AS is_dup,
        |    cum.below + row_number() OVER (PARTITION BY t.score ORDER BY t.doc_id) AS rank,
        |    cum.n
        |  FROM t JOIN fp ON fp.f = t.f JOIN cum ON cum.score = t.score)
        |SELECT ((rank - 1) * 10) // n AS decile, count(*)::BIGINT AS n_docs,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
        |  (1000 * CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*) AS dup_permille,
        |  min(score) AS min_score, max(score) AS max_score
        |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
      val stopList = Stopwords.map(w => s"'$w'").mkString(",")
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("f"),
          expr(s"""(1000 * CAST(size(filter(split(text, ' '),
                  |  x -> x IN ($stopList))) AS BIGINT))
                  |DIV CAST(size(split(text, ' ')) AS BIGINT)""".stripMargin)
            .as("score"))
      val fp = t.groupBy(col("f")).agg(count(lit(1)).as("n_copies"))
      DistributedRank.withGlobalRank(t.join(fp, "f"),
          Seq(col("score"), col("doc_id")), "rank", "n")
        .select(expr("((rank - 1) * 10) DIV n").as("decile"),
          col("score"), (col("n_copies") > 1).as("is_dup"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).cast("long").as("n_dups"),
          expr("(1000 * CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)) DIV count(1)")
            .as("dup_permille"),
          min(col("score")).as("min_score"), max(col("score")).as("max_score"))
    },

    // ----------------------------------------------------------------
    q("q206_gopher_rules",
      """Rule-battery document filtering with per-rule rejection
        |attribution — the Gopher quality heuristics (Rae et al. 2021,
        |Table A1) adapted to this corpus (word-count bounds, mean-
        |word-length bounds, short-word fraction, required-stopword
        |presence, top-word repetition), reported per SOURCE so a
        |curator sees WHICH rule rejects WHAT share of each feed —
        |the attribution report q23's single pass/fail score cannot
        |give. Every threshold comparison is integer cross-
        |multiplication (ratio*1000 vs bound*denominator) — no
        |division anywhere, so both engines agree bitwise. Scale
        |shape: all five measures are row-local array HOFs (bounded
        |by the ~100-word docs), the only shuffle is the |sources|-row
        |partial agg — scan-bound at 100 TB exactly like q22-q25.""".stripMargin,
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w,
        |    CAST(length(text) AS BIGINT) AS nc
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source,
        |    CAST(len(w) AS BIGINT) AS nw,
        |    (nc - len(w) + 1) AS sumlen,
        |    CAST(len(list_filter(w, x -> length(x) <= 2)) AS BIGINT) AS nshort,
        |    CAST(len(list_distinct(list_filter(w,
        |      x -> x IN ('the','a','of','and','to')))) AS BIGINT) AS nstopd,
        |    CAST(list_max(list_transform(list_distinct(w),
        |      u -> len(list_filter(w, x -> x = u)))) AS BIGINT) AS ntop
        |  FROM t),
        |f AS (
        |  SELECT source,
        |    CASE WHEN nw < 30 OR nw > 90 THEN 1 ELSE 0 END AS f_words,
        |    CASE WHEN sumlen * 1000 < 3500 * nw
        |           OR sumlen * 1000 > 4800 * nw THEN 1 ELSE 0 END AS f_wordlen,
        |    CASE WHEN nshort * 1000 > 120 * nw THEN 1 ELSE 0 END AS f_short,
        |    CASE WHEN nstopd < 2 THEN 1 ELSE 0 END AS f_stop,
        |    CASE WHEN ntop * 1000 > 120 * nw THEN 1 ELSE 0 END AS f_rep
        |  FROM m)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  CAST(sum(f_words) AS BIGINT) AS n_fail_words,
        |  CAST(sum(f_wordlen) AS BIGINT) AS n_fail_wordlen,
        |  CAST(sum(f_short) AS BIGINT) AS n_fail_short,
        |  CAST(sum(f_stop) AS BIGINT) AS n_fail_stop,
        |  CAST(sum(f_rep) AS BIGINT) AS n_fail_rep,
        |  CAST(sum(CASE WHEN f_words + f_wordlen + f_short + f_stop + f_rep = 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  (1000 * CAST(sum(CASE WHEN f_words + f_wordlen + f_short + f_stop + f_rep = 0
        |           THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS pass_permille
        |FROM f GROUP BY 1""".stripMargin) { (s, dir) =>
      gopherFlags(Tables.documents(s, dir).select(col("source"), col("text")))
        .groupBy(col("source"))
        .agg(gopherCensusAggs.head, gopherCensusAggs.tail: _*)
    },

    // ----------------------------------------------------------------
    q("q212_vocab_growth",
      """Heaps'-law vocabulary-growth curve (Heaps 1978; the corpus-
        |scale audit WIMBD runs, Elazar et al. 2023): how many NEW word
        |types each additional tranche of corpus contributes — the
        |curve that says whether a corpus is still adding vocabulary or
        |re-treading it. Tranches are NESTED deterministic samples from
        |q81's affine hash-gate family (level L = docs with
        |((31·doc_id+7) mod p) mod 1000 < 100·L), so level 10 is the
        |whole corpus and every level is reproducible on any cluster
        |size — rand() cannot promise that, and corpus ORDER (the
        |textbook formulation) would need a partition-less global sort.
        |A type's first-appearance level is min(level) over docs
        |containing it. All-integer outputs. Scale shape: two
        |column-pruned scans (per-level doc/token tallies; explode +
        |token-keyed min agg, vocab-sized state with map-side combine);
        |the 10-row level table cumulates through a broadcast non-equi
        |self-join — no WindowExec, no corpus re-shuffle.""".stripMargin,
      """WITH d AS (
        |  SELECT ((31 * doc_id + 7) % 2147483647) % 1000 AS g,
        |         lower(text) AS lt
        |  FROM documents),
        |dl AS (
        |  SELECT g // 100 + 1 AS lvl,
        |    CAST(len(list_filter(string_split(lt, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_toks,
        |    lt FROM d),
        |lv AS (
        |  SELECT lvl, count(*)::BIGINT AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM dl GROUP BY 1),
        |tk AS (SELECT lvl, unnest(string_split(lt, ' ')) AS tok FROM dl),
        |ft AS (SELECT tok, min(lvl) AS first_lvl FROM tk WHERE tok <> '' GROUP BY 1),
        |nt AS (SELECT first_lvl AS lvl, count(*)::BIGINT AS new_types FROM ft GROUP BY 1),
        |base AS (
        |  SELECT lv.lvl, lv.n_docs, lv.n_tokens,
        |    CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types
        |  FROM lv LEFT JOIN nt USING (lvl))
        |SELECT a.lvl,
        |  CAST(sum(b.n_docs) AS BIGINT) AS docs_cum,
        |  CAST(sum(b.n_tokens) AS BIGINT) AS tokens_cum,
        |  CAST(sum(b.new_types) AS BIGINT) AS vocab_cum,
        |  max(a.new_types) AS new_types
        |FROM base a JOIN base b ON b.lvl <= a.lvl
        |GROUP BY a.lvl""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        (((col("doc_id") * 31L + 7L) % 2147483647L) % 1000L).as("g"),
        split(lower(col("text")), " ").as("w"))
        .select(expr("g DIV 100 + 1").as("lvl"), col("w"))
      val lv = d.select(col("lvl"),
          expr("CAST(size(filter(w, x -> x <> '')) AS BIGINT)").as("n_toks"))
        .groupBy(col("lvl"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_toks")).cast("bigint").as("n_tokens"))
      val nt = d.select(col("lvl"), explode(col("w")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(min(col("lvl")).as("first_lvl"))
        .groupBy(col("first_lvl").as("lvl"))
        .agg(count(lit(1)).cast("bigint").as("new_types"))
      val base = lv.join(nt, Seq("lvl"), "left")
        .select(col("lvl"), col("n_docs"), col("n_tokens"),
          coalesce(col("new_types"), lit(0L)).cast("bigint").as("new_types"))
      val b = base.select(col("lvl").as("l2"), col("n_docs").as("d2"),
        col("n_tokens").as("t2"), col("new_types").as("v2"))
      base.join(broadcast(b), col("l2") <= col("lvl"))
        .groupBy(col("lvl"))
        .agg(sum(col("d2")).cast("bigint").as("docs_cum"),
          sum(col("t2")).cast("bigint").as("tokens_cum"),
          sum(col("v2")).cast("bigint").as("vocab_cum"),
          max(col("new_types")).as("new_types"))
    },

    // ----------------------------------------------------------------
    q("q213_lexical_diversity",
      """Lexical-diversity profile per source — the word-frequency-
        |distribution statistics of Baayen 2001 ("Word Frequency
        |Distributions"): type count, token count, type-token ratio,
        |and the hapax-legomena share (types occurring exactly once —
        |the estimator core of vocabulary-richness measures and the
        |tell for template-generated feeds, whose hapax share
        |collapses). Ratios are BIGINT floor divisions of exact counts
        |(micro/permille), so both engines agree bitwise. Scale shape:
        |explode + (source, token)-keyed count with map-side combine —
        |state is vocab-sized per source, never corpus-sized — then a
        ||sources|-row roll-up; one shuffle end to end.""".stripMargin,
      """WITH tc AS (
        |  SELECT source, tok, count(*)::BIGINT AS cnt FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |    FROM documents)
        |  WHERE tok <> '' GROUP BY 1, 2)
        |SELECT source,
        |  count(*)::BIGINT AS n_types,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  (1000000 * count(*)::BIGINT) // CAST(sum(cnt) AS BIGINT) AS ttr_micro,
        |  (1000 * CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*)::BIGINT AS hapax_permille
        |FROM tc GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("bigint").as("n_types"),
          sum(col("cnt")).cast("bigint").as("n_tokens"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).cast("bigint").as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_tokens"), col("n_hapax"),
          expr("(1000000 * n_types) DIV n_tokens").as("ttr_micro"),
          expr("(1000 * n_hapax) DIV n_types").as("hapax_permille"))
    },

    // ----------------------------------------------------------------
    q("q214_vocab_overlap",
      """Cross-source vocabulary-overlap matrix — pairwise Jaccard and
        |containment over each source's word-TYPE set (the WIMBD-style
        |corpus-comparison audit, Elazar et al. 2023: how much of feed
        |A's vocabulary feed B already covers — the signal for whether
        |a new feed adds lexical diversity or duplicates an existing
        |one). Exact integers: intersections are counted, unions are
        ||A|+|B|−|A∩B|, ratios are BIGINT permille floor divisions.
        |Scale shape: the type sets come from one (source, token)
        |distinct agg (vocab-sized); the pair stage self-joins ON TOKEN
        |(co-partitioned, output ≤ |sources|²/2 rows per token — never
        |a doc-pair space); the |sources|-row size table broadcasts
        |onto the ≤ |sources|²/2-row result.""".stripMargin,
      """WITH st AS (
        |  SELECT DISTINCT source, tok FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |    FROM documents)
        |  WHERE tok <> ''),
        |sz AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY 1),
        |pr AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_common
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT pr.src_a, pr.src_b,
        |  sa.n AS n_types_a, sb.n AS n_types_b, pr.n_common,
        |  (sa.n + sb.n - pr.n_common) AS n_union,
        |  (1000 * pr.n_common) // (sa.n + sb.n - pr.n_common) AS jaccard_permille,
        |  (1000 * pr.n_common) // least(sa.n, sb.n) AS containment_permille
        |FROM pr
        |JOIN sz sa ON pr.src_a = sa.source
        |JOIN sz sb ON pr.src_b = sb.source""".stripMargin) { (s, dir) =>
      val st = Tables.documents(s, dir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
      val sz = st.groupBy(col("source")).agg(count(lit(1)).cast("bigint").as("n"))
      val pr = st.select(col("source").as("src_a"), col("tok"))
        .join(st.select(col("source").as("src_b"), col("tok")), Seq("tok"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).cast("bigint").as("n_common"))
      pr.join(broadcast(sz.select(col("source").as("src_a"), col("n").as("n_types_a"))), Seq("src_a"))
        .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("n_types_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_types_a"), col("n_types_b"),
          col("n_common"),
          (col("n_types_a") + col("n_types_b") - col("n_common")).as("n_union"),
          expr("(1000 * n_common) DIV (n_types_a + n_types_b - n_common)").as("jaccard_permille"),
          expr("(1000 * n_common) DIV least(n_types_a, n_types_b)").as("containment_permille"))
    },

    // ----------------------------------------------------------------
    q("q220_dup_ngram_rate",
      """Duplicate-n-gram rate per source — WIMBD's duplicated-n-gram
        |audit (Elazar et al. 2023: the share of n-gram OCCURRENCES
        |that repeat an already-seen n-gram, the corpus-level
        |repetition signal that predicts memorization; Lee et al.
        |2021's dedup paper motivates the same measure): word 3-gram
        |shingles WITH multiplicity (the q27 shingle convention minus
        |the distinct), counted per (source, shingle), rolled up to
        |total / distinct / duplicate occurrences and an integer
        |permille rate. Scale shape: one (source, shingle)-keyed count
        |with map-side combine — state is distinct-shingle-sized,
        |which replicas don't grow — then a |sources|-row roll-up.""".stripMargin,
      """WITH sg AS (
        |  SELECT source, array_to_string(w[i:i+2], ' ') AS sh
        |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents),
        |       unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
        |tc AS (SELECT source, sh, count(*)::BIGINT AS cnt FROM sg GROUP BY 1, 2)
        |SELECT source,
        |  CAST(sum(cnt) AS BIGINT) AS n_ngrams,
        |  count(*)::BIGINT AS n_distinct,
        |  CAST(sum(cnt - 1) AS BIGINT) AS n_dup_occurrences,
        |  (1000 * CAST(sum(cnt - 1) AS BIGINT)) // CAST(sum(cnt) AS BIGINT)
        |    AS dup_permille
        |FROM tc GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), split(col("text"), " ").as("w"))
        .withColumn("i", explode(when(size(col("w")) >= 3,
          sequence(lit(1), size(col("w")) - 2)).otherwise(array())))
        .select(col("source"),
          concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("sh"))
        .groupBy(col("source"), col("sh")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).cast("bigint").as("n_ngrams"),
          count(lit(1)).cast("bigint").as("n_distinct"),
          sum(col("cnt") - 1).cast("bigint").as("n_dup_occurrences"))
        .select(col("source"), col("n_ngrams"), col("n_distinct"),
          col("n_dup_occurrences"),
          expr("(1000 * n_dup_occurrences) DIV n_ngrams").as("dup_permille"))
    },

    // ----------------------------------------------------------------
    q("q221_top_ngrams",
      """Most-common n-grams — the other half of WIMBD's n-gram audit
        |(Elazar et al. 2023 report the corpus's top n-grams verbatim;
        |a handful of boilerplate 3-grams dominating the head is the
        |classic symptom q208's chunk filter then removes): global
        |word-3-gram counts, top 20 by (count desc, shingle), with
        |rank, running coverage and the corpus total — q82's
        |zero-window shape (TakeOrdered into ONE sorted array row;
        |rank is array position, the running sum an aggregate over a
        |slice; the total is a scalar aggregate broadcast back) over
        |shingles instead of unigrams. The shingle-count aggregate is
        |materialized once (localCheckpoint) because it feeds both the
        |total and the top-20 — without it the explode+groupBy corpus
        |pass would run twice (the q82 r4 finding).""".stripMargin,
      """WITH sg AS (
        |  SELECT array_to_string(w[i:i+2], ' ') AS sh
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents),
        |       unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
        |tc AS (SELECT sh, count(*) AS cnt FROM sg GROUP BY sh),
        |ranked AS (
        |  SELECT sh, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, sh) AS rk,
        |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, sh
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS total_cnt
        |  FROM tc)
        |SELECT rk, sh, cnt, cum_cnt, total_cnt
        |FROM ranked WHERE rk <= 20""".stripMargin) { (s, dir) =>
      val tc = Tables.documents(s, dir)
        .select(split(col("text"), " ").as("w"))
        .withColumn("i", explode(when(size(col("w")) >= 3,
          sequence(lit(1), size(col("w")) - 2)).otherwise(array())))
        .select(concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("sh"))
        .groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
        .transform(graft.Graft.stagedCheckpoint)
      val total = tc.agg(sum(col("cnt")).cast("bigint").as("total_cnt"))
      val top = tc.orderBy(col("cnt").desc, col("sh")).limit(20)
        .select(struct((-col("cnt")).as("nc"), col("sh").as("sh"),
          col("cnt").as("cnt")).as("x"))
        .agg(sort_array(collect_list(col("x"))).as("xs"))
      top.select(col("xs"), posexplode(col("xs")))
        .select(col("xs"), (col("pos") + 1).as("rk"),
          col("col.sh").as("sh"), col("col.cnt").as("cnt"), col("pos"))
        .withColumn("cum_cnt",
          expr("CAST(aggregate(slice(xs, 1, pos + 1), CAST(0 AS BIGINT), (acc, v) -> acc + v.cnt) AS BIGINT)"))
        .crossJoin(broadcast(total))
        .select(col("rk"), col("sh"), col("cnt"), col("cum_cnt"), col("total_cnt"))
    },

    // ----------------------------------------------------------------
    q("q222_unseen_mass",
      """Good-Turing unseen-vocabulary mass + Chao1 richness per source
        |— the "how much of this source's vocabulary have we NOT seen
        |yet" estimate that closes the q212 Heaps-curve story: the
        |growth curve says vocabulary is still arriving, this says how
        |much probability mass the unseen tail holds. Good-Turing
        |(Good 1953; Gale & Sampson 1995's simple-GT exposition) puts
        |the unseen mass at N1/N — the share of tokens that are hapax
        |legomena — and Chao1 (Chao 1984) lower-bounds total species
        |richness at V + N1·(N1−1)/(2·(N2+1)) (the bias-corrected form,
        |exact in integers — no floating estimator anywhere). Both need
        |only the frequency-of-frequencies head (N1, N2), which is why
        |they run at corpus scale: state is vocabulary-sized, the
        |estimators are arithmetic over five per-source counters.
        |Scale shape: ONE (source, token)-keyed count with map-side
        |combine (the same shuffle q213's diversity profile pays —
        |replicas of a doc don't grow distinct-key state), then a
        ||sources|-row conditional roll-up; output is |sources| rows.""".stripMargin,
      """WITH tc AS (
        |  SELECT source, tok, count(*)::BIGINT AS cnt
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY 1, 2)
        |SELECT source,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  count(*)::BIGINT AS v_types,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_hapax,
        |  CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2_dis,
        |  (1000 * CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(sum(cnt) AS BIGINT) AS unseen_mass_permille,
        |  count(*)::BIGINT
        |    + CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      * (CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) - 1)
        |      // (2 * (CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) + 1))
        |    AS chao1_richness
        |FROM tc GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).cast("bigint").as("n_tokens"),
          count(lit(1)).cast("bigint").as("v_types"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).cast("bigint").as("n1_hapax"),
          sum(when(col("cnt") === 2, 1L).otherwise(0L)).cast("bigint").as("n2_dis"))
        .select(col("source"), col("n_tokens"), col("v_types"),
          col("n1_hapax"), col("n2_dis"),
          expr("(1000 * n1_hapax) DIV n_tokens").as("unseen_mass_permille"),
          expr("v_types + (n1_hapax * (n1_hapax - 1)) DIV (2 * (n2_dis + 1))")
            .as("chao1_richness"))
    },

    // ----------------------------------------------------------------
    q("q236_simpson_diversity",
      """Gini-Simpson lexical diversity per source — Simpson 1949's
        |concentration index in its UNBIASED small-sample form
        |(Σ c(c−1) / N(N−1), the probability two tokens drawn WITHOUT
        |replacement are the same type), reported as both concentration
        |and its Gini-Simpson complement in exact integer micro units —
        |the log-free diversity measure (Shannon entropy needs ln; this
        |is the member of the Hill-number family that runs exact, and
        |ecology ships it for the same reason). Complements q213's
        |TTR/hapax profile (type-count view) and q222's unseen-mass
        |(tail view) with the repeat-probability view. Scale shape: the
        |q213 shuffle exactly — ONE (source, token)-keyed count with
        |map-side combine, vocab-bounded state — then a |sources|-row
        |conditional roll-up; Σ c(c−1) is computed per term INSIDE the
        |roll-up, never materializing probabilities.""".stripMargin,
      """WITH tc AS (
        |  SELECT source, tok, count(*)::BIGINT AS cnt
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY 1, 2)
        |SELECT source,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  count(*)::BIGINT AS v_types,
        |  CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS repeat_pairs,
        |  (1000000 * CAST(sum(cnt * (cnt - 1)) AS BIGINT))
        |    // greatest(CAST(sum(cnt) AS BIGINT) * (CAST(sum(cnt) AS BIGINT) - 1), 1)
        |    AS concentration_micro,
        |  1000000 - (1000000 * CAST(sum(cnt * (cnt - 1)) AS BIGINT))
        |    // greatest(CAST(sum(cnt) AS BIGINT) * (CAST(sum(cnt) AS BIGINT) - 1), 1)
        |    AS gini_simpson_micro
        |FROM tc GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).cast("bigint").as("n_tokens"),
          count(lit(1)).cast("bigint").as("v_types"),
          sum(expr("cnt * (cnt - 1)")).cast("bigint").as("repeat_pairs"))
        .select(col("source"), col("n_tokens"), col("v_types"),
          col("repeat_pairs"),
          // greatest(...,1): a source with exactly one token has n*(n-1) == 0
          // (NULL in Spark, error in DuckDB) — q244's zero-denominator guard.
          expr("(1000000 * repeat_pairs) DIV greatest(n_tokens * (n_tokens - 1), 1)")
            .as("concentration_micro"),
          expr("""1000000 - (1000000 * repeat_pairs)
                 |DIV greatest(n_tokens * (n_tokens - 1), 1)""".stripMargin)
            .as("gini_simpson_micro"))
    },

    // ----------------------------------------------------------------
    q("q237_qgram_spectrum",
      """Pairwise SOURCE similarity by q-gram frequency spectra —
        |Ukkonen 1992's q-gram profile distance, reported as the
        |frequency-weighted cosine between each source pair's word-
        |3-gram COUNT vectors: where q214's Jaccard sees only which
        |shingles exist, the spectrum cosine sees how often — two
        |sources sharing rare shingles at matching rates score high
        |even when their vocabularies overlap broadly with everyone.
        |Exact and sqrt-free: the SQUARED cosine in micro units by the
        |TWO-STEP floor ((10⁶·dot div n2_a)·dot div n2_b) — same
        |deterministic integers in both engines, and every intermediate
        |is bounded by 10⁶·dot, so the expression survives norms far
        |past where the single-expression (dot²·10⁶) form overflows
        |int64 (dot > 3·10⁶ — a few hundred× this corpus).
        |Scale shape: one (source, shingle) count with map-side combine
        |(distinct-shingle state); the pair stage self-joins ON SHINGLE
        |(co-partitioned, ≤ |sources|²/2 rows per shingle — never a doc
        |pair space, q214's join discipline); per-source norms are a
        ||sources|-row broadcast onto the 190-row result.""".stripMargin,
      """WITH sg AS (
        |  SELECT source, array_to_string(w[i:i+2], ' ') AS sh
        |  FROM (SELECT source, string_split(lower(text), ' ') AS w FROM documents),
        |       unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
        |tc AS (SELECT source, sh, count(*)::BIGINT AS cnt FROM sg GROUP BY 1, 2),
        |nrm AS (
        |  SELECT source, CAST(sum(cnt * cnt) AS BIGINT) AS n2 FROM tc GROUP BY 1),
        |dots AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(sum(a.cnt * b.cnt) AS BIGINT) AS dot
        |  FROM tc a JOIN tc b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT d.src_a, d.src_b, d.dot, na.n2 AS n2_a, nb.n2 AS n2_b,
        |  ((1000000 * d.dot) // na.n2) * d.dot // nb.n2 AS cos2_micro
        |FROM dots d
        |JOIN nrm na ON na.source = d.src_a
        |JOIN nrm nb ON nb.source = d.src_b""".stripMargin) { (s, dir) =>
      val tc = Tables.documents(s, dir)
        .select(col("source"), split(lower(col("text")), " ").as("w"))
        .withColumn("i", explode(when(size(col("w")) >= 3,
          sequence(lit(1), size(col("w")) - 2)).otherwise(array())))
        .select(col("source"),
          concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("sh"))
        .groupBy(col("source"), col("sh")).agg(count(lit(1)).cast("bigint").as("cnt"))
        .transform(graft.Graft.stagedCheckpoint)
      val nrm = tc.groupBy(col("source"))
        .agg(sum(expr("cnt * cnt")).cast("bigint").as("n2"))
      tc.select(col("source").as("src_a"), col("sh"), col("cnt").as("ca"))
        .join(tc.select(col("source").as("src_b"), col("sh"), col("cnt").as("cb")),
          Seq("sh"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(sum(expr("ca * cb")).cast("bigint").as("dot"))
        .join(broadcast(nrm.select(col("source").as("src_a"), col("n2").as("n2_a"))),
          Seq("src_a"))
        .join(broadcast(nrm.select(col("source").as("src_b"), col("n2").as("n2_b"))),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("dot"), col("n2_a"), col("n2_b"),
          expr("((1000000 * dot) DIV n2_a) * dot DIV n2_b").as("cos2_micro"))
    },

    // ----------------------------------------------------------------
    q("q233_collocations",
      """Collocation extraction by Dice coefficient — the association
        |measure of Smadja, McKeown & Hatzivassiloglou 1996 (Dice 1945;
        |the log-free member of the PMI family, which is why it runs
        |exact here): for adjacent word pairs with joint count ≥ 5,
        |dice = 2·c(vw) / (c(v) + c(w)) in integer permille, top 20 by
        |(dice desc, bigram) with unigram and joint counts alongside —
        |the phrase-lexicon builder between q221's raw top-n-grams and
        |q224's phrase search. Scale shape: ONE bigram-keyed count and
        |ONE unigram-keyed count, both with map-side combine and
        |vocab-bounded state; the two unigram joins hit the ≥5-filtered
        |bigram head (candidate-sized, broadcast-able at any corpus
        |size because the ≥5 floor bounds it by corpus/5); the rank is
        |TakeOrdered(20) into one sorted array row (the q82/q221
        |zero-window shape — no partition-less window).""".stripMargin,
      """WITH w AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |bg AS (
        |  SELECT w[i] AS v, w[i+1] AS t, count(*)::BIGINT AS n_pair
        |  FROM w, unnest(range(1, greatest(len(w), 1))) AS x(i)
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |ug AS (
        |  SELECT tok, count(*)::BIGINT AS n
        |  FROM (SELECT unnest(w) AS tok FROM w) WHERE tok <> '' GROUP BY 1),
        |d AS (
        |  SELECT bg.v || ' ' || bg.t AS bigram, bg.n_pair,
        |    uv.n AS n_v, ut.n AS n_w,
        |    (2000 * bg.n_pair) // (uv.n + ut.n) AS dice_permille
        |  FROM bg JOIN ug uv ON uv.tok = bg.v JOIN ug ut ON ut.tok = bg.t)
        |SELECT CAST(row_number() OVER (ORDER BY dice_permille DESC, bigram)
        |    AS BIGINT) AS rk,
        |  bigram, n_pair, n_v, n_w, dice_permille
        |FROM d ORDER BY dice_permille DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(split(lower(col("text")), " ").as("w"))
      val bg = words
        .withColumn("i", explode(when(size(col("w")) >= 2,
          sequence(lit(1), size(col("w")) - 1)).otherwise(array())))
        .select(col("w")(col("i") - 1).as("v"), col("w")(col("i")).as("t"))
        .groupBy(col("v"), col("t")).agg(count(lit(1)).cast("bigint").as("n_pair"))
        .filter(col("n_pair") >= 5)
      val ug = words.select(explode(col("w")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).cast("bigint").as("n"))
      bg.join(ug.select(col("tok").as("v"), col("n").as("n_v")), Seq("v"))
        .join(ug.select(col("tok").as("t"), col("n").as("n_w")), Seq("t"))
        .select(concat_ws(" ", col("v"), col("t")).as("bigram"),
          col("n_pair"), col("n_v"), col("n_w"),
          expr("(2000 * n_pair) DIV (n_v + n_w)").as("dice_permille"))
        .orderBy(col("dice_permille").desc, col("bigram")).limit(20)
        .select(struct((-col("dice_permille")).as("nd"), col("bigram"),
          col("n_pair"), col("n_v"), col("n_w"),
          col("dice_permille")).as("x"))
        .agg(sort_array(collect_list(col("x"))).as("xs"))
        .select(posexplode(col("xs")))
        .select((col("pos") + 1).cast("bigint").as("rk"),
          col("col.bigram").as("bigram"), col("col.n_pair").as("n_pair"),
          col("col.n_v").as("n_v"), col("col.n_w").as("n_w"),
          col("col.dice_permille").as("dice_permille"))
    },

    // ----------------------------------------------------------------
    q("q234_keyness",
      """Corpus keyness by the Sketch Engine "simple maths" score
        |(Kilgarriff 2009, "Simple maths for keywords") — for each
        |source, which terms are most CHARACTERISTIC of it versus the
        |rest of the corpus: keyness = (fpm_in + k) / (fpm_out + k)
        |with smoothing constant k = 100 per-million (Kilgarriff's
        |published default neighborhood; the additive k is what makes
        |the measure log-free and zero-safe, which is why Sketch Engine
        |ships it instead of chi-squared at corpus scale — and why it
        |runs EXACT here, in integer per-million frequencies and a
        |milli-ratio floor division). Top 5 terms per source by
        |(keyness desc, term). Scale shape: ONE (source, term) count
        |with map-side combine; per-term corpus totals DERIVED from it
        |(the corpus is not re-read); per-source token totals are a
        ||sources|-row broadcast; the rank window partitions by source
        |— never partition-less.""".stripMargin,
      """WITH st AS (
        |  SELECT source, tok, count(*)::BIGINT AS cnt
        |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY 1, 2),
        |tt AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS tot FROM st GROUP BY 1),
        |src AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_src FROM st GROUP BY 1),
        |all_ AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM st),
        |sc AS (
        |  SELECT st.source, st.tok, st.cnt,
        |    (1000000 * st.cnt) // src.n_src AS fpm_in,
        |    (1000000 * (tt.tot - st.cnt)) // greatest(all_.n_all - src.n_src, 1) AS fpm_out
        |  FROM st JOIN src ON src.source = st.source
        |  JOIN tt ON tt.tok = st.tok, all_),
        |r AS (
        |  SELECT source, tok, cnt, fpm_in, fpm_out,
        |    (1000 * (fpm_in + 100)) // (fpm_out + 100) AS keyness_milli,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY (1000 * (fpm_in + 100)) // (fpm_out + 100) DESC, tok) AS rk
        |  FROM sc)
        |SELECT source, CAST(rk AS BIGINT) AS rk, tok, cnt,
        |  fpm_in, fpm_out, keyness_milli
        |FROM r WHERE rk <= 5""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val st = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .transform(graft.Graft.stagedCheckpoint)
      val tt = st.groupBy(col("tok")).agg(sum(col("cnt")).cast("bigint").as("tot"))
      val src = st.groupBy(col("source"))
        .agg(sum(col("cnt")).cast("bigint").as("n_src"))
      val all = st.agg(sum(col("cnt")).cast("bigint").as("n_all"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("keyness_milli").desc, col("tok"))
      st.join(broadcast(src), Seq("source"))
        .join(tt, Seq("tok"))
        .crossJoin(broadcast(all))
        .select(col("source"), col("tok"), col("cnt"),
          expr("(1000000 * cnt) DIV n_src").as("fpm_in"),
          // greatest(...,1): on a single-source corpus n_all == n_src and the
          // raw denominator is zero — Spark DIV would return NULL while
          // DuckDB // raises, so the degenerate case is pinned to the
          // q244 zero-denominator convention in BOTH engines.
          expr("(1000000 * (tot - cnt)) DIV greatest(n_all - n_src, 1)")
            .as("fpm_out"))
        .withColumn("keyness_milli",
          expr("(1000 * (fpm_in + 100)) DIV (fpm_out + 100)"))
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("tok"), col("cnt"),
          col("fpm_in"), col("fpm_out"), col("keyness_milli"))
    },

    // ----------------------------------------------------------------
    q("q247_zipf_slope",
      """Zipf rank-frequency slope per source (Zipf 1949; Piantadosi
        |2014's review of rank-frequency fitting): the OLS slope of
        |log2(frequency) against log2(rank) over each source's token
        |spectrum — the classic one-number corpus-health check (natural
        |text sits near -1; templated or truncated-vocabulary text
        |drifts off). Exactness discipline: both logs are FLOOR log2
        |computed as length(bin(n)) - 1 — pure integer, identical in
        |both engines, no transcendentals — so the regression moments
        |and the milli slope are exact BIGINT arithmetic (the dyadic-
        |bucket analog of the q228 integer-regression move). Scale
        |shape: one (source, token)-keyed count with map-side combine
        |(vocab-sized state), the rank window partitions by source over
        |vocab-sized rows, and the regression collapses to |sources|
        |rows of five moments; at extreme per-source vocabularies the
        |same moments aggregate by (x, y) bucket pair first — the sums
        |are identical, the state drops to 64x64.""".stripMargin,
      """WITH tk AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, count(*)::BIGINT AS cnt
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
        |r AS (SELECT source, tok, cnt,
        |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok) AS rk
        |  FROM tc),
        |xy AS (SELECT source, cnt,
        |    CAST(length(bin(rk)) - 1 AS BIGINT) AS x,
        |    CAST(length(bin(cnt)) - 1 AS BIGINT) AS y
        |  FROM r),
        |m AS (SELECT source, count(*)::BIGINT AS n_types,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(max(x) AS BIGINT) AS max_rank_log2
        |  FROM xy GROUP BY 1)
        |SELECT source, n_types, n_tokens, max_rank_log2,
        |  (1000 * (n_types * sxy - sx * sy))
        |    // greatest(n_types * sxx - sx * sx, 1) AS slope_milli
        |FROM m""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tc = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("tok"))
      tc.withColumn("rk", row_number().over(w).cast("bigint"))
        .select(col("source"), col("cnt"),
          expr("CAST(length(bin(rk)) - 1 AS BIGINT)").as("x"),
          expr("CAST(length(bin(cnt)) - 1 AS BIGINT)").as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("bigint").as("n_types"),
          sum(col("cnt")).cast("bigint").as("n_tokens"),
          sum(col("x")).cast("bigint").as("sx"),
          sum(col("y")).cast("bigint").as("sy"),
          sum(expr("x * y")).cast("bigint").as("sxy"),
          sum(expr("x * x")).cast("bigint").as("sxx"),
          max(col("x")).cast("bigint").as("max_rank_log2"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          col("max_rank_log2"),
          // greatest(...,1): a single-type source has zero x-variance —
          // the q244 zero-denominator convention
          expr("""(1000 * (n_types * sxy - sx * sy))
                 |DIV greatest(n_types * sxx - sx * sx, 1)""".stripMargin)
            .as("slope_milli"))
    },

    // ----------------------------------------------------------------
    q("q255_gk_lambda",
      """Goodman-Kruskal lambda between source and language (Goodman &
        |Kruskal 1954 §5 — the proportional-reduction-in-error measure
        |for NOMINAL pairs): how much better one predicts a document's
        |language knowing its source (and vice versa) than by always
        |guessing the modal class. lambda(A|B) = (sum_b max_a O(a,b) -
        |max_a R_a) / (n - max_a R_a), both directions reported in
        |milli. Chosen over chi-square deliberately: lambda is PURE
        |integer counts and one guarded division — no squared terms to
        |overflow, no expected-frequency fractions — so it is exact at
        |any corpus size where counts fit int64 (the chi-square
        |numerator (n*O - R*C)^2 overflows 1e6-scaled int64 already at
        |~5e4 docs). A zero lambda is evidence of independence the
        |driver's iid generator should (and does) produce. Scale shape:
        |ONE (source, lang) contingency agg with map-side combine —
        |state is cells-sized, never corpus-sized — then every moment
        |is a roll-up of that tiny frame; three 1-row broadcasts
        |assemble the answer. Modal ties resolve by MAX, which is
        |tie-order-free in both engines.""".stripMargin,
      """WITH o AS (SELECT source, lang, count(*)::BIGINT AS n
        |  FROM documents GROUP BY 1, 2),
        |n_ AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs FROM o),
        |bs AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_best_lang
        |  FROM (SELECT source, max(n) AS mx FROM o GROUP BY 1)),
        |bl AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_best_src
        |  FROM (SELECT lang, max(n) AS mx FROM o GROUP BY 1)),
        |ml AS (SELECT CAST(max(s) AS BIGINT) AS modal_lang
        |  FROM (SELECT lang, sum(n) AS s FROM o GROUP BY 1)),
        |ms AS (SELECT CAST(max(s) AS BIGINT) AS modal_src
        |  FROM (SELECT source, sum(n) AS s FROM o GROUP BY 1))
        |SELECT n_.n_docs,
        |  (1000 * (bs.sum_best_lang - ml.modal_lang))
        |    // greatest(n_.n_docs - ml.modal_lang, 1) AS lambda_lang_milli,
        |  (1000 * (bl.sum_best_src - ms.modal_src))
        |    // greatest(n_.n_docs - ms.modal_src, 1) AS lambda_source_milli
        |FROM n_, bs, bl, ml, ms""".stripMargin) { (s, dir) =>
      // cells-sized, but FIVE moment branches read it — staged once so
      // the corpus contingency scan never re-runs per branch
      val o = Tables.documents(s, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n"))
        .transform(graft.Graft.stagedCheckpoint)
      val nDocs = o.agg(sum(col("n")).cast("bigint").as("n_docs"))
      val bs = o.groupBy(col("source")).agg(max(col("n")).as("mx"))
        .agg(sum(col("mx")).cast("bigint").as("sum_best_lang"))
      val bl = o.groupBy(col("lang")).agg(max(col("n")).as("mx"))
        .agg(sum(col("mx")).cast("bigint").as("sum_best_src"))
      val ml = o.groupBy(col("lang")).agg(sum(col("n")).as("s"))
        .agg(max(col("s")).cast("bigint").as("modal_lang"))
      val ms = o.groupBy(col("source")).agg(sum(col("n")).as("s"))
        .agg(max(col("s")).cast("bigint").as("modal_src"))
      nDocs.crossJoin(broadcast(bs)).crossJoin(broadcast(bl))
        .crossJoin(broadcast(ml)).crossJoin(broadcast(ms))
        .select(col("n_docs"),
          expr("""(1000 * (sum_best_lang - modal_lang))
                 |DIV greatest(n_docs - modal_lang, 1)""".stripMargin)
            .as("lambda_lang_milli"),
          expr("""(1000 * (sum_best_src - modal_src))
                 |DIV greatest(n_docs - modal_src, 1)""".stripMargin)
            .as("lambda_source_milli"))
    },

    // ----------------------------------------------------------------
    q("q256_shannon_entropy",
      """Lexical Shannon entropy per source (Shannon 1948; the WIMBD-
        |tier diversity number q213's TTR and q236's Gini-Simpson
        |approximate from below): H = sum_t (c_t/N) * log2(N/c_t) in
        |micro-bits per token, plus efficiency H / log2(V) in permille
        |(Pielou 1966's evenness). The log that q236 declared impossible
        |("log-free so it runs exact where Shannon entropy cannot") is
        |a QUANTIZED DYADIC log2: bitlen-1 plus a 64-entry mantissa
        |correction table computed once JVM-side and interpolated as
        |literals into BOTH engines (the q153 micro-nat idiom) — a
        |one-sided mantissa floor at most log2(65/64) = 0.0224 bits
        |below true log2 per term, and the reported value is pinned
        |exactly cross-engine by shared-constant construction
        |(Log2TableSpec pins the bound, exactness at powers of two,
        |and monotonicity).
        |Scale shape: q213's (source, token) count exactly — map-side
        |combine, vocab-sized state — then ONE |sources|-row roll-up;
        |the log2 is row-local arithmetic on the count column, no
        |joins, no windows.""".stripMargin,
      {
        val l2c = log2MicroDuck("tc.c")
        val l2n = log2MicroDuck("ns.n")
        val l2v = log2MicroDuck("ns.v")
        s"""WITH tk AS (
          |  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
          |  FROM documents),
          |tc AS (SELECT source, tok, count(*)::BIGINT AS c
          |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
          |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
          |    count(*)::BIGINT AS v FROM tc GROUP BY 1)
          |SELECT tc.source, ns.n AS n_tokens, ns.v AS n_types,
          |  CAST(sum(tc.c * ($l2n - $l2c)) // ns.n AS BIGINT)
          |    AS entropy_microbits,
          |  CAST((1000 * (CAST(sum(tc.c * ($l2n - $l2c)) AS BIGINT) // ns.n))
          |    // greatest($l2v, 1) AS BIGINT) AS evenness_pm
          |FROM tc JOIN ns USING (source)
          |GROUP BY tc.source, ns.n, ns.v""".stripMargin
      }) { (s, dir) =>
      val tc = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).cast("bigint").as("c"))
        .transform(graft.Graft.stagedCheckpoint) // two branches read it
      val ns = tc.groupBy(col("source"))
        .agg(sum(col("c")).cast("bigint").as("n"),
          count(lit(1)).cast("bigint").as("v"))
      tc.join(ns, Seq("source"))
        .groupBy(col("source"), col("n"), col("v"))
        .agg(sum(col("c") * (expr(log2MicroSpark("n")) - expr(log2MicroSpark("c"))))
          .cast("bigint").as("hsum"))
        .select(col("source"), col("n").as("n_tokens"), col("v").as("n_types"),
          expr("hsum DIV n").cast("bigint").as("entropy_microbits"),
          expr(s"""(1000 * (hsum DIV n))
                  |DIV greatest(${log2MicroSpark("v")}, 1)""".stripMargin)
            .cast("bigint").as("evenness_pm"))
    },

    // ----------------------------------------------------------------
    q("q257_selector_kappa",
      """Inter-selector agreement audit (Cohen 1960's kappa): every
        |data-curation pipeline stacks several keep/drop gates, and the
        |FIRST question about a new gate is how much it agrees with the
        |ones already deployed beyond what their base rates force —
        |near-total agreement means the new gate is redundant, negative
        |kappa means the gates are fighting. Raters here: A = the
        |Gopher rule battery (q206's gopherFlags, shared VERBATIM —
        |all five rules pass), B = the C4-style heuristic gate (q23's
        |keep_flag: 20 <= words <= 1000 and stopword ratio >= 1%,
        |integer cross-multiplied). Per source: the 2x2 confusion
        |counts, raw agreement permille, and kappa in milli-units,
        |kappa = (n*(n11+n00) - pe_num) / (n^2 - pe_num) with
        |pe_num = r1*c1 + r0*c0 from the marginals — all BIGINT, the
        |signed division via the q143 sign-symmetric split (magnitude
        |DIV, sign reapplied) so Spark's truncating DIV and DuckDB's
        |flooring // cannot disagree on negative kappa; pe = 1 (both
        |raters constant) reports kappa 0 by convention. Scale shape:
        |both gates are row-local array HOFs computed in ONE scan,
        |the only shuffle is the |sources|-row partial agg — q206's
        |exact cost, nothing added.""".stripMargin,
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w,
        |    CAST(length(text) AS BIGINT) AS nc
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source,
        |    CAST(len(w) AS BIGINT) AS nw,
        |    (nc - len(w) + 1) AS sumlen,
        |    CAST(len(list_filter(w, x -> length(x) <= 2)) AS BIGINT) AS nshort,
        |    CAST(len(list_distinct(list_filter(w,
        |      x -> x IN ('the','a','of','and','to')))) AS BIGINT) AS nstopd,
        |    CAST(list_max(list_transform(list_distinct(w),
        |      u -> len(list_filter(w, x -> x = u)))) AS BIGINT) AS ntop,
        |    CAST(len(list_filter(w,
        |      x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS nstop
        |  FROM t),
        |g AS (
        |  SELECT source,
        |    CASE WHEN (CASE WHEN nw < 30 OR nw > 90 THEN 1 ELSE 0 END)
        |            + (CASE WHEN sumlen * 1000 < 3500 * nw
        |                      OR sumlen * 1000 > 4800 * nw THEN 1 ELSE 0 END)
        |            + (CASE WHEN nshort * 1000 > 120 * nw THEN 1 ELSE 0 END)
        |            + (CASE WHEN nstopd < 2 THEN 1 ELSE 0 END)
        |            + (CASE WHEN ntop * 1000 > 120 * nw THEN 1 ELSE 0 END) = 0
        |         THEN 1 ELSE 0 END AS a,
        |    CASE WHEN nw BETWEEN 20 AND 1000 AND nstop * 100 >= nw
        |         THEN 1 ELSE 0 END AS b
        |  FROM m),
        |c AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |    CAST(sum(a * b) AS BIGINT) AS n11,
        |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
        |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        |  FROM g GROUP BY 1)
        |SELECT source, n_docs, n11, n10, n01, n00,
        |  (1000 * (n11 + n00)) // n_docs AS agree_pm,
        |  CASE WHEN n_docs * n_docs
        |         - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) = 0
        |       THEN 0
        |       WHEN n_docs * (n11 + n00)
        |         - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) >= 0
        |       THEN (1000 * (n_docs * (n11 + n00)
        |         - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
        |         // (n_docs * n_docs
        |         - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
        |       ELSE -((1000 * (((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |         - n_docs * (n11 + n00)))
        |         // (n_docs * n_docs
        |         - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
        |  END AS kappa_milli
        |FROM c""".stripMargin) { (s, dir) =>
      val stopList = Stopwords.map(w => s"'$w'").mkString(",")
      val base = Tables.documents(s, dir)
        .withColumn("bt", size(split(col("text"), " ")).cast("bigint"))
        .withColumn("bs",
          size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))")).cast("bigint"))
        .withColumn("b",
          when(col("bt").between(20, 1000) && col("bs") * 100 >= col("bt"), 1L)
            .otherwise(0L))
        .select(col("source"), col("b"), col("text"))
      gopherFlags(base)
        .withColumn("a",
          when(col("f_words") + col("f_wordlen") + col("f_short") +
            col("f_stop") + col("f_rep") === 0, 1L).otherwise(0L))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("a") * col("b")).cast("bigint").as("n11"),
          sum(col("a") * (lit(1L) - col("b"))).cast("bigint").as("n10"),
          sum((lit(1L) - col("a")) * col("b")).cast("bigint").as("n01"),
          sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).cast("bigint").as("n00"))
        .select(col("source"), col("n_docs"),
          col("n11"), col("n10"), col("n01"), col("n00"),
          expr("(1000 * (n11 + n00)) DIV n_docs").as("agree_pm"),
          expr("""CASE WHEN n_docs * n_docs
                 |       - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) = 0
                 |     THEN 0L
                 |     WHEN n_docs * (n11 + n00)
                 |       - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) >= 0
                 |     THEN (1000 * (n_docs * (n11 + n00)
                 |       - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
                 |       DIV (n_docs * n_docs
                 |       - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                 |     ELSE -((1000 * (((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 |       - n_docs * (n11 + n00)))
                 |       DIV (n_docs * n_docs
                 |       - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
                 |END""".stripMargin).as("kappa_milli"))
    },

    // ----------------------------------------------------------------
    q("q260_token_dispersion",
      """Token dispersion across sources — Gries 2008's DP (deviation
        |of proportions), the corpus-linguistics number q234's keyness
        |cannot give: keyness asks IS this token over-represented in
        |one source, DP asks how UNEVENLY the token spreads over ALL
        |of them at once (DP 0 = distributed exactly like the corpus,
        |1 = confined to one source) — the single-score tell for
        |template/boilerplate tokens that a frequency cut misses
        |because they are common EVERYWHERE they appear. DP_t =
        |(1/2)*sum_s |c_ts/C_t - N_s/N| in micro units, every share a
        |floor division of exact BIGINTs ((1e6*x) DIV y — dividing
        |EARLY keeps every product within 1e6*count, so the formula
        |survives corpus sizes where the cross-multiplied form
        |N*c_ts overflows); sources where the token is absent
        |contribute their expected share, folded in as (exp_all -
        |exp_present) — a per-corpus constant minus a per-token sum,
        |never a dense token x source expansion. Scale shape: ONE
        |(source, token) count (map-side combine, vocab-bounded
        |state), re-keyed by token for the totals (the two frames
        |co-partition on tok so the join adds no exchange), the
        |20-row source-mass table and the 1-row exp_all broadcast.
        |Reported for tokens with C_t >= 100 (the census is about
        |FREQUENT tokens that hide by being spread).""".stripMargin,
      """WITH tk AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, count(*)::BIGINT AS c
        |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS nsrc
        |  FROM tc GROUP BY 1),
        |nn AS (SELECT CAST(sum(nsrc) AS BIGINT) AS n FROM ns),
        |ea AS (SELECT CAST(sum((1000000 * ns.nsrc) // nn.n) AS BIGINT) AS exp_all
        |  FROM ns, nn),
        |ct AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ctot,
        |         count(*)::BIGINT AS n_src
        |  FROM tc GROUP BY 1),
        |d AS (SELECT tc.tok,
        |        CAST(sum(abs((1000000 * tc.c) // ct.ctot
        |          - (1000000 * ns.nsrc) // nn.n)) AS BIGINT) AS dpres,
        |        CAST(sum((1000000 * ns.nsrc) // nn.n) AS BIGINT) AS epres
        |      FROM tc JOIN ct USING (tok) JOIN ns USING (source), nn
        |      GROUP BY 1)
        |SELECT d.tok, ct.ctot AS c_total, ct.n_src,
        |  (d.dpres + ea.exp_all - d.epres) // 2 AS dp_micro
        |FROM d JOIN ct ON ct.tok = d.tok, ea
        |WHERE ct.ctot >= 100""".stripMargin) { (s, dir) =>
      val tc = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).cast("bigint").as("c"))
        .transform(graft.Graft.stagedCheckpoint) // three consumers below
      val ns = tc.groupBy(col("source"))
        .agg(sum(col("c")).cast("bigint").as("nsrc"))
      val nn = ns.agg(sum(col("nsrc")).cast("bigint").as("n"))
      val nsn = ns.crossJoin(broadcast(nn)) // 20 rows: (source, nsrc, n)
      val expAll = nsn
        .agg(sum(expr("(1000000 * nsrc) DIV n")).cast("bigint").as("exp_all"))
      val ct = tc.groupBy(col("tok"))
        .agg(sum(col("c")).cast("bigint").as("ctot"),
          count(lit(1)).cast("bigint").as("n_src"))
      tc.join(broadcast(nsn), Seq("source"))
        .join(ct, Seq("tok")) // both sides keyed by tok: no extra exchange
        // group on tok ALONE (ctot/n_src are functionally dependent —
        // max() carries them) so the agg exchange reuses the join's
        // tok partitioning instead of re-keying on a composite
        .groupBy(col("tok"))
        .agg(
          max(col("ctot")).as("ctot"),
          max(col("n_src")).as("n_src"),
          sum(abs(expr("(1000000 * c) DIV ctot - (1000000 * nsrc) DIV n")))
            .cast("bigint").as("dpres"),
          sum(expr("(1000000 * nsrc) DIV n")).cast("bigint").as("epres"))
        .filter(col("ctot") >= 100)
        .crossJoin(broadcast(expAll))
        .select(col("tok"), col("ctot").as("c_total"), col("n_src"),
          expr("(dpres + exp_all - epres) DIV 2").as("dp_micro"))
    })

  /** Quantized dyadic log2 in integer micro-bits, identical in both
    * engines by SHARED-CONSTANT construction (the q153 micro-nat
    * idiom): log2(x) = (bitlen-1) + log2(m/64) where m = the top 7
    * mantissa bits, and the 64 mantissa corrections are computed ONCE
    * here and interpolated as literals into both the Spark expression
    * and the DuckDB oracle. Quantization is one-sided
    * (mantissa floor): at most log2(65/64) ≈ 0.0224 bits BELOW true
    * log2, never above — a diagnostic-grade log whose VALUE is
    * nonetheless pinned exactly cross-engine, which is what unlocks
    * entropy-family statistics q236 had to avoid ("log-free so it runs
    * exact where Shannon entropy cannot"). Valid for 1 <= x < 2^57
    * (the x*64 mantissa scale must not overflow). Lazy: `defs` above
    * initializes first and its oracle strings interpolate this. */
  private lazy val log2MantMicro: IndexedSeq[Long] =
    (64 to 127).map(m => math.round(math.log(m / 64.0) / math.log(2.0) * 1e6))

  /** Spark SQL form of the quantized log2 (micro-bits) of column
    * expression `c` (must be >= 1). */
  private[graft] def log2MicroSpark(c: String): String = {
    val arr = log2MantMicro.mkString("array(", "L, ", "L)")
    s"""(CAST(length(bin($c)) - 1 AS BIGINT) * 1000000
       | + element_at($arr, CAST(($c * 64)
       |     DIV CAST(power(2, length(bin($c)) - 1) AS BIGINT) AS INT) - 63))""".stripMargin
  }

  /** DuckDB form of the same quantized log2 (1-based list indexing). */
  private[graft] def log2MicroDuck(c: String): String = {
    val arr = log2MantMicro.mkString("[", ", ", "]")
    s"""(CAST(length(bin($c)) - 1 AS BIGINT) * 1000000
       | + ($arr)[CAST(($c * 64)
       |     // CAST(power(2, length(bin($c)) - 1) AS BIGINT) AS INT) - 63])""".stripMargin
  }

  /** q206's rule battery as a frame transform: appends the five 0/1
    * fail flags to whatever key columns ride along with `text` (and
    * drops the intermediate measures). Shared VERBATIM by batch q206
    * and the streaming census kernel ([[graft.streaming.StreamGopher]])
    * — the stream ≡ batch proof covers this exact code path. Pure
    * row-local array HOFs; integer cross-multiplied thresholds.
    */
  private[graft] def gopherFlags(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(",")
    df.withColumn("w", split(col("text"), " "))
      .withColumn("nw", size(col("w")).cast("bigint"))
      .withColumn("sumlen", length(col("text")).cast("bigint") - col("nw") + 1)
      .withColumn("nshort", expr("CAST(size(filter(w, x -> length(x) <= 2)) AS BIGINT)"))
      .withColumn("nstopd",
        expr(s"CAST(size(array_distinct(filter(w, x -> x IN ($stopList)))) AS BIGINT)"))
      .withColumn("ntop",
        expr("CAST(array_max(transform(array_distinct(w), u -> size(filter(w, x -> x = u)))) AS BIGINT)"))
      .withColumn("f_words", when(col("nw") < 30 || col("nw") > 90, 1).otherwise(0))
      .withColumn("f_wordlen", when(col("sumlen") * 1000 < col("nw") * 3500 ||
        col("sumlen") * 1000 > col("nw") * 4800, 1).otherwise(0))
      .withColumn("f_short", when(col("nshort") * 1000 > col("nw") * 120, 1).otherwise(0))
      .withColumn("f_stop", when(col("nstopd") < 2, 1).otherwise(0))
      .withColumn("f_rep", when(col("ntop") * 1000 > col("nw") * 120, 1).otherwise(0))
      .drop("text", "w", "nw", "sumlen", "nshort", "nstopd", "ntop")
  }

  /** The census aggregates over [[gopherFlags]] output — per-rule fail
    * counts, all-rules pass count, pass permille. */
  private[graft] def gopherCensusAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_docs"),
    sum(col("f_words")).cast("bigint").as("n_fail_words"),
    sum(col("f_wordlen")).cast("bigint").as("n_fail_wordlen"),
    sum(col("f_short")).cast("bigint").as("n_fail_short"),
    sum(col("f_stop")).cast("bigint").as("n_fail_stop"),
    sum(col("f_rep")).cast("bigint").as("n_fail_rep"),
    sum(when(col("f_words") + col("f_wordlen") + col("f_short") +
      col("f_stop") + col("f_rep") === 0, 1L).otherwise(0L))
      .cast("bigint").as("n_pass"),
    expr("""(1000 * CAST(sum(CASE WHEN f_words + f_wordlen + f_short + f_stop + f_rep = 0
           |         THEN 1 ELSE 0 END) AS BIGINT)) DIV count(1)""".stripMargin)
      .as("pass_permille"))
}
