package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, and a batched decode/feature-extract stage.
  *
  * The feature extractor ([[decodeFeatures]]) is real end-to-end and
  * dispatches on payload content:
  *   - recognized image containers go through [[ImageHeader]]'s strict
  *     byte-level decode (PNG/BMP/JPEG/GIF — magic, CRC, marker-walk
  *     validation) and the features are the DECODED header facts
  *     (format, dimensions, bit depth, container size);
  *   - everything else gets content-statistic features (rolling byte
  *     sums — a real, if simple, content fingerprint). A learned
  *     embedding model would slot in here; this container can't host
  *     one, and the byte statistics keep the branch deterministic and
  *     oracle-checkable.
  * Everything around the extractor — schema, batch shape, mapPartitions
  * plumbing, partition sizing — is what matters at 100 TB:
  *   - media bytes never pass through a shuffle (decode runs in the scan
  *     stage, feature vectors are ~KB vs media ~MB);
  *   - decode is batched per partition (amortizes model/codec init,
  *     the JVM-side equivalent of a Pandas-UDF batch);
  *   - output is columnar-friendly (fixed-width float array + struct).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("source", StringType, nullable = true))), nullable = true)))

  /** Wrap any table with an id + payload-bytes column into the canonical
    * media frame. (Documents stand in for media in the test data.) */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit("application/octet-stream").as("mime"),
        // BYTE length of the binary payload — length(string) counts
        // characters and undercounts multi-byte UTF-8, which would make
        // block sampling silently drop payload tails
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** Assert `df` is a canonical media frame ([[mediaSchema]] shape). */
  def validateMediaFrame(df: DataFrame): Unit = {
    val got = df.schema.map(f => (f.name, f.dataType.simpleString))
    val want = mediaSchema.map(f => (f.name, f.dataType.simpleString))
    require(got == want, s"not a canonical media frame: got $got, want $want")
  }

  /** Content-statistic features for payloads that are NOT recognized
    * images: deterministic rolling byte sums, emitted in exact "milli"
    * units ((v mod 1000)/1000, so round(f*1000) recovers the integer
    * accumulator losslessly for cross-engine comparison). This is the
    * branch where a learned embedding model would plug in. */
  def byteStatFeatures(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val acc = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      acc(i % dims) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000).toFloat / 1000f)
  }

  /** Format code used in header-derived feature vectors (0 = not an
    * image; stable across releases, so downstream models can one-hot). */
  val FormatCodes: Map[String, Long] =
    Map("png" -> 1L, "bmp" -> 2L, "jpeg" -> 3L, "gif" -> 4L)

  /** REAL feature extraction: strict header decode first; a recognized
    * image yields features built from the DECODED facts (format code,
    * width, height, bit depth, container bytes, pixel count, min/max
    * extent), anything else falls through to [[byteStatFeatures]].
    * Both branches emit exact milli units — no float arithmetic that
    * could diverge between engines. */
  def decodeFeatures(bytes: Array[Byte], dims: Int = 8): Array[Float] =
    ImageHeader.decode(bytes) match {
      case Some(m) =>
        val base = Array(
          FormatCodes(m.format), m.width, m.height, m.bitsPerPixel,
          bytes.length.toLong, m.width * m.height,
          math.min(m.width, m.height), math.max(m.width, m.height))
        Array.tabulate(dims)(i => (base(i % base.length) % 1000).toFloat / 1000f)
      case None => byteStatFeatures(bytes, dims)
    }

  /** Batched decode/feature-extract over the canonical media frame:
    * mapPartitions so per-partition init (codec, model session) happens
    * once, not per row. */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    validateMediaFrame(media)
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "media") :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val keepIdx = media.schema.fields.zipWithIndex.filterNot(_._1.name == "media").map(_._2)
    media.mapPartitions { rows =>
      // per-partition init would go here (load codec / model once)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats = if (bytes == null) null else decodeFeatures(bytes, dims)
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ feats)
      }
    }(enc)
  }

  /** REAL header decode over the canonical media frame: PNG/BMP headers
    * parsed per row ([[ImageHeader.decode]] — strict magic, CRC and
    * size checks), batched via mapPartitions exactly like
    * [[extractFeatures]]. Unrecognized payloads decode to format
    * "unknown" with null dimensions — never an error, because at 100 TB
    * a corrupt file must not kill the pipeline. */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    validateMediaFrame(media)
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("bit_depth", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val keepIdx = media.schema.fields.zipWithIndex.filterNot(_._1.name == "media").map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] = ImageHeader.decode(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(m) => Seq(m.format, m.width, m.height, m.bitsPerPixel)
          case None    => Seq("unknown", null, null, null)
        }
        Row.fromSeq(keepIdx.map(r.get).toSeq ++ extra)
      }
    }(enc)
  }

  /** REAL audio-header decode over the canonical media frame with
    * content dispatch: PCM WAV (RIFF/WAVE chunk walk, redundant-field
    * re-derivation), FLAC (STREAMINFO metadata-chain walk) and MP3
    * (ID3v2 skip + MPEG frame-header chain walk) parsed
    * per row ([[AudioHeader.decode]]), batched via mapPartitions
    * exactly like [[decodeImageMeta]]. Unrecognized or corrupted
    * payloads decode to format "unknown" with null fields — never an
    * error. Durations are exact integer microseconds, so the output
    * never carries engine-dependent float rounding. */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    validateMediaFrame(media)
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("format", StringType, nullable = false),
      StructField("channels", LongType, nullable = true),
      StructField("sample_rate", LongType, nullable = true),
      StructField("bit_depth", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_us", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val keepIdx = media.schema.fields.zipWithIndex.filterNot(_._1.name == "media").map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] = AudioHeader.decode(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(m) =>
            Seq(m.format, m.channels, m.sampleRate, m.bitsPerSample, m.nFrames, m.durationUs)
          case None => Seq("unknown", null, null, null, null, null)
        }
        Row.fromSeq(keepIdx.map(r.get).toSeq ++ extra)
      }
    }(enc)
  }

  /** PCM PAYLOAD featurization over the canonical media frame — the
    * stage past [[decodeAudioMeta]]'s header walk, the audio twin of the
    * ImagePixels pipeline: each WAV's sample data is decoded to the
    * canonical 16-bit amplitude scale and folded into scalar signal
    * features (peak, integer mean-square energy, zero-crossing count) in
    * ONE O(1)-state pass per payload ([[AudioHeader.decodePcmFeatures]]).
    * Bytes never shuffle — the features leave the scan, the payloads do
    * not. Corrupted or non-PCM payloads yield format "unknown" with null
    * features, never an error. */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    validateMediaFrame(media)
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("format", StringType, nullable = false),
      StructField("peak_abs", LongType, nullable = true),
      StructField("mean_sq", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true),
      StructField("n_samples", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val keepIdx = media.schema.fields.zipWithIndex.filterNot(_._1.name == "media").map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] = AudioHeader.decodePcmFeatures(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(f) => Seq("wav", f.peakAbs, f.meanSq, f.zeroCrossings, f.nSamples)
          case None    => Seq("unknown", null, null, null, null)
        }
        Row.fromSeq(keepIdx.map(r.get).toSeq ++ extra)
      }
    }(enc)
  }

  /** REAL video-container decode over the canonical media frame: the
    * third modality, completing image/audio/video. Each payload is
    * parsed by [[VideoHeader.decodeMp4]] (strict ISO BMFF box walk —
    * exact tiling at every nesting level, one mvhd, per-trak tkhd,
    * integral 16.16 dimensions), batched via mapPartitions exactly like
    * the image and audio stages. Unrecognized or corrupted payloads
    * decode to format "unknown" with null fields — never an error. */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    validateMediaFrame(media)
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("format", StringType, nullable = false),
      StructField("major_brand", StringType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration_us", LongType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_tracks", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val keepIdx = media.schema.fields.zipWithIndex.filterNot(_._1.name == "media").map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] = VideoHeader.decodeMp4(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(m) =>
            Seq(m.format, m.brand, m.timescale, m.durationUs, m.width, m.height, m.nTracks)
          case None => Seq("unknown", null, null, null, null, null, null)
        }
        Row.fromSeq(keepIdx.map(r.get).toSeq ++ extra)
      }
    }(enc)
  }

  /** REAL image resize over the canonical media frame: each payload that
    * decodes as an 8-bit RGB(A) PNG ([[ImagePixels]] — full chunk-CRC +
    * zlib + filter validation) is nearest-neighbor resized to w2 x h2
    * and RE-ENCODED as a PNG; undecodable payloads pass through as null
    * media (never an error). The thumbnail/preprocess kernel every
    * vision-data pipeline runs, batched per partition like the other
    * decode stages; resized bytes are ~KB, so downstream stages shuffle
    * thumbnails, not originals. */
  def resizeImages(media: DataFrame, w2: Int, h2: Int,
      kernel: String = "nearest"): DataFrame = {
    validateMediaFrame(media)
    val enc = Encoders.row(media.schema)
    val mediaIdx = media.schema.fieldIndex("media")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val resized =
          if (bytes == null) null
          else ImagePixels.resizePng(bytes, w2, h2, kernel).orNull
        val meta = r.getAs[Row](metaIdx)
        val newMeta =
          if (meta == null) null
          else Row(meta.get(0), if (resized == null) null else resized.length.toLong, meta.get(2))
        Row.fromSeq(r.toSeq.updated(mediaIdx, resized).updated(metaIdx, newMeta))
      }
    }(enc)
  }

  /** REAL frame sampling over the canonical media frame: every
    * `stride`-th sample (frame) of each MP4's sample table, located the
    * way a real frame reader does it — strict whole-file decode, then
    * the trak's stts (timestamps), stsz (sizes) and stco (chunk offset)
    * tables ([[VideoHeader.decodeSampleTable]]) resolve each selected
    * frame to (index, exact integer-microsecond pts, absolute byte
    * offset, byte size). ONE linear walk per payload with O(1) state
    * (running tick count + byte offset); output is bounded by
    * n_samples/stride rows of a few longs each — payload bytes never
    * shuffle, and the emitted (offset, size) spans are exactly what a
    * downstream ranged-read decode stage would fetch. Payloads without
    * a valid sample table yield no rows, never an error. */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride $stride")
    validateMediaFrame(media)
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "media") ++ Seq(
      StructField("sample_idx", LongType, nullable = false),
      StructField("pts_us", LongType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    val mediaIdx = media.schema.fieldIndex("media")
    val keepIdx = media.schema.fields.zipWithIndex.filterNot(_._1.name == "media").map(_._2)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        VideoHeader.decodeSampleTable(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(st) =>
            val keep = keepIdx.map(r.get).toSeq
            val out = Seq.newBuilder[Row]
            var pts = 0L // ticks before the current sample
            var off = st.chunkOffset
            var run = 0
            var inRun = 0L
            var i = 0
            while (i < st.sampleSizes.length) {
              val sz = st.sampleSizes(i)
              if (i % stride == 0)
                out += Row.fromSeq(keep ++ Seq(i.toLong,
                  pts * 1000000L / st.mediaTimescale, off, sz))
              pts += st.sttsRuns(run)._2
              inRun += 1
              if (inRun == st.sttsRuns(run)._1 && run < st.sttsRuns.length - 1) {
                run += 1; inRun = 0
              }
              off += sz
              i += 1
            }
            out.result()
          case None => Nil
        }
      }
    }(enc)
  }

  /** Shared fixture for the pixel-pipeline queries (q103/q118): one
    * doc_id-derived RGB PNG per document row — pixel(x,y,ch) =
    * (7*doc_id + 5*x + 3*y + 11*ch) mod 256, w = doc_id%32+1,
    * h = doc_id%24+1, filter type doc_id%5 — as a canonical media
    * frame. The matching oracles recompute the same arithmetic. */
  /** Shared fixture for the audio queries (q108/q132): one doc_id-derived
    * PCM WAV per document row (channels doc_id%3+1, rate 8000+4000·(doc_id
    * %5), bits 8·(doc_id%4+1), frames doc_id%200+1; sample bytes follow
    * encodeWav's frame%251 ramp), with every 7th row's riff size byte
    * corrupted so strict decode must reject it — the no-false-positive
    * proof branch shared by both queries' oracles. */
  private def docWavMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val bytes = AudioHeader.encodeWav(
          channels = (id % 3 + 1).toInt,
          sampleRate = (8000 + (id % 5) * 4000).toInt,
          bitsPerSample = (8 * (id % 4 + 1)).toInt,
          nFrames = (id % 200 + 1).toInt)
        if (id % 7 == 3) bytes(4) = (bytes(4) + 1).toByte
        (id, bytes)
      }
      .toDF("doc_id", "payload")
      .withColumn("src", lit("synthetic"))
    asMediaFrame(payloads, "doc_id", "payload", "src")
  }

  private def docPatternPngs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (id % 32 + 1).toInt
        val h = (id % 24 + 1).toInt
        val px = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          val y = i / (w * 3); val x = (i % (w * 3)) / 3; val ch = i % 3
          px(i) = ((id * 7 + x * 5 + y * 3 + ch * 11) % 256).toByte
          i += 1
        }
        (id, ImagePixels.encodePng(ImagePixels.Raster(w, h, 3, px),
          filterId = (id % 5).toInt))
      }
      .toDF("doc_id", "payload")
      .withColumn("src", lit("synthetic"))
    asMediaFrame(payloads, "doc_id", "payload", "src")
  }

  /** Shared second-decode checksum stage for the pixel-pipeline
    * queries: decode each (resized) PNG payload and reduce its pixels
    * to (sum, position-weighted sum mod 1e9+7). */
  private def pixelChecksums(resized: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("out_w", LongType, nullable = true),
      StructField("out_h", LongType, nullable = true),
      StructField("checksum", LongType, nullable = true),
      StructField("wsum", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val idIdx = resized.schema.fieldIndex("media_id")
    val mIdx = resized.schema.fieldIndex("media")
    resized.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](mIdx)
        ImagePixels.decodePng(bytes) match {
          case Some(rast) =>
            var s = 0L; var ws = 0L
            var i = 0
            while (i < rast.pixels.length) {
              val v = rast.pixels(i) & 0xff
              s += v; ws += v.toLong * (i + 1)
              i += 1
            }
            Row(id, rast.width.toLong, rast.height.toLong, s, ws % 1000000007L)
          case None => Row(id, null, null, null, null)
        }
      }
    }(enc)
  }

  def sampleBlocks(media: DataFrame, blockSize: Int = 64, every: Int = 4): DataFrame = {
    validateMediaFrame(media)
    media.withColumn("blocks",
      // empty payload -> empty block list (greatest(-1,0)=0 would emit
      // one spurious empty block via sequence(0,0))
      expr(s"CASE WHEN meta.n_bytes = 0 THEN CAST(array() AS ARRAY<BINARY>) ELSE " +
        s"transform(sequence(0, CAST(greatest(ceil(meta.n_bytes / $blockSize / $every) - 1, 0) AS INT)), " +
        s"i -> substring(media, i * $blockSize * $every + 1, $blockSize)) END"))
      .drop("media")
  }

  val defs: Seq[QueryDef] = Seq(
    q("q33_multimodal_features",
      """REAL multimodal feature pipeline with content dispatch: a mixed
        |corpus (even doc_id rows carry a structurally valid PNG whose
        |dimensions derive from doc_id; odd rows carry the raw UTF-8
        |text bytes) flows through the canonical media frame and ONE
        |batched extractor. Recognized images take the strict-decode
        |branch — features are the DECODED header facts (format code,
        |width, height, bit depth, container bytes, pixel count, min/max
        |extent) — and unrecognized payloads take the byte-statistics
        |branch. The oracle recomputes BOTH branches independently
        |(image features from doc_id arithmetic, byte-sum features from
        |hex pairs), so the dispatch itself and each branch's math are
        |pinned cross-engine. Features are compared as exact milli
        |integers (round(f*1000)) — no float formatting in the hash.""".stripMargin,
      """WITH b AS (
        |  SELECT doc_id, source, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 2 = 1
        |), by AS (
        |  SELECT doc_id, source, n,
        |         list_transform(range(0, n),
        |           i -> ('0x'||substring(h, 2*i+1, 2))::BIGINT) AS bytes
        |  FROM b
        |), textfeat AS (
        |  SELECT doc_id AS media_id, n AS n_bytes, source,
        |    array_to_string(list_transform(range(0, 8), d ->
        |      coalesce(list_sum(list_transform(
        |        range(0, CAST(ceil((n - d) / 8.0) AS BIGINT)),
        |        k -> bytes[d + 8*k + 1])), 0) % 1000), ',') AS features_milli
        |  FROM by
        |), imgfeat AS (
        |  SELECT doc_id AS media_id, CAST(33 AS BIGINT) AS n_bytes, source,
        |    array_to_string([1, doc_id % 100 + 1, doc_id % 37 + 1, 24, 33,
        |      ((doc_id % 100 + 1) * (doc_id % 37 + 1)) % 1000,
        |      least(doc_id % 100 + 1, doc_id % 37 + 1),
        |      greatest(doc_id % 100 + 1, doc_id % 37 + 1)], ',') AS features_milli
        |  FROM documents WHERE doc_id % 2 = 0
        |)
        |SELECT * FROM imgfeat UNION ALL SELECT * FROM textfeat""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long"), col("text"), col("source"))
        .as[(Long, String, String)]
        .map { case (id, text, src) =>
          val bytes =
            if (id % 2 == 0)
              ImageHeader.encodePng((id % 100 + 1).toInt, (id % 37 + 1).toInt,
                bitDepth = 8, colorType = 2)
            else if (text == null) null
            else text.getBytes("UTF-8")
          (id, bytes, src)
        }
        .toDF("doc_id", "payload", "source")
      val media = asMediaFrame(payloads, "doc_id", "payload", "source")
      extractFeatures(media)
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.source").as("source"),
          // features are v/1000f with v an exact milli integer in
          // [0,999]: round(f*1000) recovers v exactly on both branches
          array_join(transform(col("features"),
            f => round(f.cast("double") * 1000).cast("long").cast("string")), ",")
            .as("features_milli"))
    },

    q("q76_block_sampling",
      """Frame-sampling stub over the binary payload: every 4th 64-byte
        |block (the video-frame-sample shape — linear scan, bounded
        |output, payload bytes never shuffled whole). The oracle
        |recomputes block count and the first/last block bytes from the
        |hex rendering, pinning the sampling arithmetic (offsets,
        |stride, tail clamping) cross-engine.""".stripMargin,
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN 0
        |       ELSE CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT)
        |  END AS n_blocks,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN NULL
        |       ELSE substr(hex(encode(text)), 1, 128) END AS first_block_hex,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN NULL
        |       ELSE substr(hex(encode(text)),
        |         (CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) - 1) * 512 + 1,
        |         128) END AS last_block_hex
        |FROM documents""".stripMargin) { (s, dir) =>
      val media = asMediaFrame(Tables.documents(s, dir), "doc_id", "text", "source")
      sampleBlocks(media, blockSize = 64, every = 4)
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          size(col("blocks")).cast("long").as("n_blocks"),
          // try_element_at: NULL (not an ANSI error) on the empty-payload
          // empty block list, mirroring the oracle's CASE NULL
          expr("hex(try_element_at(blocks, 1))").as("first_block_hex"),
          expr("hex(try_element_at(blocks, -1))").as("last_block_hex"))
    },

    q("q89_image_decode",
      """REAL image-header decode end-to-end: each document row is
        |wrapped into a structurally valid PNG (even doc_id) or BMP (odd
        |doc_id) whose dimensions derive from doc_id, pushed through the
        |canonical media frame and the batched mapPartitions decoder
        |(ImageHeader: strict magic + IHDR CRC / BMP size validation),
        |and the decoded width/height/bit-depth come back out. The
        |oracle computes the expected dimensions AND the expected
        |container byte size independently from doc_id arithmetic
        |(PNG: 8 sig + 25 IHDR = 33 bytes; BMP: 54 header +
        |4-byte-padded rows), so a decode or encode bug on either
        |format turns the row red — no codec library involved, pure
        |public byte formats.""".stripMargin,
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        |  doc_id % 100 + 1 AS width,
        |  doc_id % 37 + 1 AS height,
        |  CAST(24 AS BIGINT) AS bit_depth,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(33 AS BIGINT)
        |       ELSE 54 + ((24 * (doc_id % 100 + 1) + 31) // 32) * 4
        |              * (doc_id % 37 + 1)
        |  END AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      // payload construction is itself distributed (Dataset.map in the
      // scan stage) — dims small enough that even sf0.1's 5k docs stay
      // a few MB per partition, and the bytes never cross a shuffle
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val w = (id % 100 + 1).toInt
          val h = (id % 37 + 1).toInt
          val bytes =
            if (id % 2 == 0) ImageHeader.encodePng(w, h, bitDepth = 8, colorType = 2)
            else ImageHeader.encodeBmp(w, h, bpp = 24)
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      val media = asMediaFrame(payloads, "doc_id", "payload", "src")
      decodeImageMeta(media)
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("bit_depth"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q94_image_formats",
      """JPEG + GIF header decode end-to-end — the q89 shape extended to
        |the two remaining mainstream containers: each document row is
        |wrapped into a structurally valid JPEG (even doc_id; JFIF APP0
        |+ SOF0 marker walk) or GIF89a (odd doc_id; logical screen
        |descriptor + global color table + trailer) whose dimensions and
        |bit depth derive from doc_id, pushed through the canonical
        |media frame and the batched mapPartitions decoder, and the
        |decoded fields come back out. The oracle recomputes expected
        |dimensions AND exact container byte sizes from doc_id
        |arithmetic (JPEG: fixed 41-byte SOI+APP0+SOF0+EOI skeleton;
        |GIF: 14 + 3*2^bpp with the color-table size implied by the
        |packed bits), so an encode or decode bug on either format —
        |including a wrong color-table size or a broken marker-length
        |walk — turns the row red.""".stripMargin,
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'gif' END AS format,
        |  doc_id % 200 + 1 AS width,
        |  doc_id % 41 + 1 AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(24 AS BIGINT)
        |       ELSE doc_id % 8 + 1 END AS bit_depth,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(41 AS BIGINT)
        |       ELSE 14 + 3 * (1 << (doc_id % 8 + 1)) END AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val w = (id % 200 + 1).toInt
          val h = (id % 41 + 1).toInt
          val bytes =
            if (id % 2 == 0) ImageHeader.encodeJpeg(w, h)
            else ImageHeader.encodeGif(w, h, bpp = (id % 8 + 1).toInt)
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      val media = asMediaFrame(payloads, "doc_id", "payload", "src")
      decodeImageMeta(media)
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("bit_depth"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q103_image_resize",
      """REAL pixel pipeline end-to-end — decode, resize, re-encode,
        |decode again, all with no image library: each document row
        |becomes a full RGB PNG whose PIXELS derive from doc_id
        |arithmetic (pixel(x,y,ch) = (7*doc_id + 5*sx + 3*sy + 11*ch)
        |mod 256), written under a doc_id-varied filter type so the
        |corpus exercises all five spec filters; the payload flows
        |through the canonical media frame into resizeImages (chunk-CRC
        |+ zlib + filter-validated decode, nearest-neighbor 16x16,
        |re-encode), and the RESIZED PNG is decoded a second time to
        |produce pixel checksums. The oracle recomputes every sampled
        |pixel from the same arithmetic (source index x*w div 16), so a
        |bug anywhere in the filter math, the inflate/deflate framing,
        |the resampling indices, or the second decode turns the row red.
        |Integer checksums only — the encoded byte stream (whose length
        |is a zlib implementation detail) is never compared.""".stripMargin,
      """SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
        |  CAST(list_sum(list_transform(range(0, 768), i ->
        |    (doc_id * 7
        |     + ((i % 48) // 3) * (doc_id % 32 + 1) // 16 * 5
        |     + (i // 48) * (doc_id % 24 + 1) // 16 * 3
        |     + (i % 3) * 11) % 256)) AS BIGINT) AS checksum,
        |  CAST(list_sum(list_transform(range(0, 768), i ->
        |    ((doc_id * 7
        |      + ((i % 48) // 3) * (doc_id % 32 + 1) // 16 * 5
        |      + (i // 48) * (doc_id % 24 + 1) // 16 * 3
        |      + (i % 3) * 11) % 256) * (i + 1))) % 1000000007 AS BIGINT) AS wsum
        |FROM documents""".stripMargin) { (s, dir) =>
      pixelChecksums(resizeImages(docPatternPngs(s, dir), 16, 16))
    },

    q("q108_audio_meta",
      """REAL audio-header decode end-to-end — the q89 shape extended to
        |the audio modality: each document row is wrapped into a
        |structurally valid PCM WAV whose channels / sample rate / bit
        |depth / frame count all derive from doc_id, pushed through the
        |canonical media frame and the batched mapPartitions decoder
        |(AudioHeader: strict RIFF chunk walk with redundant-field
        |re-derivation), and the decoded fields come back out — including
        |an exact integer-microsecond duration. Every 7th row's riff
        |size byte is deliberately corrupted and must decode to
        |"unknown" with null fields, proving the strict validation
        |actually rejects (a lenient parser would return garbage, not
        |null). The oracle recomputes every field AND the exact container
        |byte size (44-byte canonical header + frames x block align)
        |from doc_id arithmetic, so an encode or decode bug on any field
        |turns the row red.""".stripMargin,
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 7 = 3 THEN 'unknown' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL ELSE doc_id % 3 + 1 END AS channels,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |       ELSE 8000 + (doc_id % 5) * 4000 END AS sample_rate,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL ELSE 8 * (doc_id % 4 + 1) END AS bit_depth,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL ELSE doc_id % 200 + 1 END AS n_frames,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |       ELSE (doc_id % 200 + 1) * 1000000 // (8000 + (doc_id % 5) * 4000)
        |  END AS duration_us,
        |  44 + (doc_id % 200 + 1) * (doc_id % 3 + 1) * (doc_id % 4 + 1)
        |     + ((doc_id % 200 + 1) * (doc_id % 3 + 1) * (doc_id % 4 + 1)) % 2 AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      decodeAudioMeta(docWavMedia(s, dir))
        .select(col("media_id"), col("format"), col("channels"),
          col("sample_rate"), col("bit_depth"), col("n_frames"),
          col("duration_us"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q115_audio_formats",
      """FLAC + WAV decode through ONE dispatching decoder — the audio
        |twin of q94's jpeg/gif pairing: even doc_id rows carry a
        |minimal legal FLAC metadata stream (STREAMINFO with the packed
        |20/3/5/36-bit rate/channels/bps/samples field), odd rows a PCM
        |WAV, all parameters doc_id-derived, and the SAME batched
        |decodeAudioMeta stage must identify and parse both. The oracle
        |recomputes every decoded field, the exact integer-microsecond
        |duration (floor division in both engines) and the exact
        |container size (FLAC: fixed 42-byte metadata stream; WAV:
        |44 + frames x block align) from doc_id arithmetic — a wrong
        |bit offset in the packed STREAMINFO field or a broken dispatch
        |turns the row red.""".stripMargin,
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 1
        |       ELSE doc_id % 3 + 1 END AS channels,
        |  CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 10) * 4000
        |       ELSE 8000 + (doc_id % 5) * 4000 END AS sample_rate,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id % 29 + 4
        |       ELSE 8 * (doc_id % 4 + 1) END AS bit_depth,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id % 100000
        |       ELSE doc_id % 200 + 1 END AS n_frames,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN (doc_id % 100000) * 1000000 // (8000 + (doc_id % 10) * 4000)
        |       ELSE (doc_id % 200 + 1) * 1000000 // (8000 + (doc_id % 5) * 4000)
        |  END AS duration_us,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(42 AS BIGINT)
        |       ELSE 44 + (doc_id % 200 + 1) * (doc_id % 3 + 1) * (doc_id % 4 + 1)
        |          + ((doc_id % 200 + 1) * (doc_id % 3 + 1) * (doc_id % 4 + 1)) % 2
        |  END AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val bytes =
            if (id % 2 == 0)
              AudioHeader.encodeFlac(
                channels = (id % 8 + 1).toInt,
                sampleRate = (8000 + (id % 10) * 4000).toInt,
                bitsPerSample = (id % 29 + 4).toInt,
                totalSamples = id % 100000)
            else
              AudioHeader.encodeWav(
                channels = (id % 3 + 1).toInt,
                sampleRate = (8000 + (id % 5) * 4000).toInt,
                bitsPerSample = (8 * (id % 4 + 1)).toInt,
                nFrames = (id % 200 + 1).toInt)
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      val media = asMediaFrame(payloads, "doc_id", "payload", "src")
      decodeAudioMeta(media)
        .select(col("media_id"), col("format"), col("channels"),
          col("sample_rate"), col("bit_depth"), col("n_frames"),
          col("duration_us"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q117_audio_mp3",
      """MP3 decode through the dispatching audio stage — the compressed
        |format real-world payloads actually arrive in: each row carries
        |an ID3v2.3-tagged MPEG Layer III stream (AudioHeader.encodeMp3)
        |whose version spans all three MPEG generations (the sample rate
        |selects MPEG1 / MPEG2 / MPEG2.5 and with it the
        |samples-per-frame constant 1152 vs 576), bitrate from the
        |published Layer III tables, and a doc_id-sized zero-filled ID3
        |tag that the decoder must skip via the syncsafe 28-bit length.
        |The strict frame walk requires every frame header legal and
        |consistent and the chain to tile the buffer exactly; every 11th
        |row's first frame sync byte is zeroed and must come back
        |"unknown" with null fields. The oracle recomputes channels /
        |rate / total samples / exact integer-microsecond duration AND
        |the exact byte size (10 + id3 body + frames x floor(spf/8 x
        |bitrate / rate)) from doc_id arithmetic — a wrong table entry,
        |frame-length formula, or ID3 skip turns rows red. bit_depth is
        |0 by convention: compressed audio has no PCM width.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(CASE doc_id % 9 WHEN 0 THEN 44100 WHEN 1 THEN 48000 WHEN 2 THEN 32000
        |      WHEN 3 THEN 22050 WHEN 4 THEN 24000 WHEN 5 THEN 16000
        |      WHEN 6 THEN 11025 WHEN 7 THEN 12000 ELSE 8000 END AS BIGINT) AS rate,
        |    CASE WHEN doc_id % 9 < 3 THEN 1152 ELSE 576 END AS spf,
        |    CASE doc_id % 5 WHEN 0 THEN 32 WHEN 1 THEN 48 WHEN 2 THEN 64
        |      WHEN 3 THEN 96 ELSE 128 END AS br,
        |    doc_id % 30 + 1 AS frames, doc_id % 64 AS id3,
        |    doc_id % 2 + 1 AS chans, doc_id % 11 = 5 AS bad
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE WHEN bad THEN 'unknown' ELSE 'mp3' END AS format,
        |  CASE WHEN bad THEN NULL ELSE chans END AS channels,
        |  CASE WHEN bad THEN NULL ELSE rate END AS sample_rate,
        |  CASE WHEN bad THEN NULL ELSE CAST(0 AS BIGINT) END AS bit_depth,
        |  CASE WHEN bad THEN NULL ELSE frames * spf END AS n_frames,
        |  CASE WHEN bad THEN NULL ELSE frames * spf * 1000000 // rate END AS duration_us,
        |  10 + id3 + frames * ((spf // 8 * br * 1000) // rate) AS n_bytes
        |FROM p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rates = Array(44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000)
      val brs = Array(32, 48, 64, 96, 128)
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val bytes = AudioHeader.encodeMp3(
            channels = (id % 2 + 1).toInt,
            sampleRate = rates((id % 9).toInt),
            bitrateKbps = brs((id % 5).toInt),
            nMpegFrames = (id % 30 + 1).toInt,
            id3Body = (id % 64).toInt)
          // zero the first frame's sync byte: the strict walk must
          // reject the whole payload, not resync past garbage
          if (id % 11 == 5) bytes(10 + (id % 64).toInt) = 0
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      val media = asMediaFrame(payloads, "doc_id", "payload", "src")
      decodeAudioMeta(media)
        .select(col("media_id"), col("format"), col("channels"),
          col("sample_rate"), col("bit_depth"), col("n_frames"),
          col("duration_us"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q119_audio_dispatch",
      """ALL FOUR audio containers through the ONE dispatching decode
        |stage — the production shape where a 100 TB media corpus
        |carries whatever encoders produced: doc_id % 4 selects PCM WAV
        |/ FLAC / MP3 / Ogg-Vorbis, every parameter doc_id-derived, and
        |the same batched decodeAudioMeta must identify and strictly
        |parse each (Ogg adds the container's own non-reflected CRC-32
        |page checksums — java.util.zip cannot verify those, so
        |AudioHeader carries the direct-polynomial implementation from
        |RFC 3533). The oracle recomputes every field and every exact
        |container byte size per format family; a dispatch
        |misclassification, a wrong Vorbis ident offset, or a lacing
        |miscount turns rows red. Lossy formats report bit_depth 0.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id, doc_id % 4 AS m,
        |    doc_id % 3 + 1 AS wch, 8000 + (doc_id % 5) * 4000 AS wrate,
        |    8 * (doc_id % 3 + 1) AS wbits, doc_id % 199 + 1 AS wframes,
        |    doc_id % 7 + 1 AS fch, 8000 + (doc_id % 9) * 4000 AS frate,
        |    doc_id % 29 + 4 AS fbits, doc_id % 100000 AS fsamp,
        |    CAST(CASE doc_id % 9 WHEN 0 THEN 44100 WHEN 1 THEN 48000 WHEN 2 THEN 32000
        |      WHEN 3 THEN 22050 WHEN 4 THEN 24000 WHEN 5 THEN 16000
        |      WHEN 6 THEN 11025 WHEN 7 THEN 12000 ELSE 8000 END AS BIGINT) AS mrate,
        |    CASE WHEN doc_id % 9 < 3 THEN 1152 ELSE 576 END AS mspf,
        |    CASE doc_id % 5 WHEN 0 THEN 32 WHEN 1 THEN 48 WHEN 2 THEN 64
        |      WHEN 3 THEN 96 ELSE 128 END AS mbr,
        |    doc_id % 30 + 1 AS mframes, doc_id % 64 AS mid3,
        |    (doc_id // 4) % 2 + 1 AS mch,
        |    doc_id % 7 + 1 AS och, 8000 + (doc_id % 11) * 1000 AS orate,
        |    doc_id % 1000000 AS osamp
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE m WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' WHEN 2 THEN 'mp3' ELSE 'ogg' END AS format,
        |  CASE m WHEN 0 THEN wch WHEN 1 THEN fch WHEN 2 THEN mch ELSE och END AS channels,
        |  CASE m WHEN 0 THEN wrate WHEN 1 THEN frate WHEN 2 THEN mrate ELSE orate END AS sample_rate,
        |  CASE m WHEN 0 THEN wbits WHEN 1 THEN fbits ELSE CAST(0 AS BIGINT) END AS bit_depth,
        |  CASE m WHEN 0 THEN wframes WHEN 1 THEN fsamp WHEN 2 THEN mframes * mspf ELSE osamp END AS n_frames,
        |  CASE m WHEN 0 THEN wframes * 1000000 // wrate
        |        WHEN 1 THEN fsamp * 1000000 // frate
        |        WHEN 2 THEN mframes * mspf * 1000000 // mrate
        |        ELSE osamp * 1000000 // orate END AS duration_us,
        |  CASE m WHEN 0 THEN 44 + wframes * wch * (wbits // 8)
        |                      + (wframes * wch * (wbits // 8)) % 2
        |        WHEN 1 THEN CAST(42 AS BIGINT)
        |        WHEN 2 THEN 10 + mid3 + mframes * ((mspf // 8 * mbr * 1000) // mrate)
        |        ELSE CAST(85 AS BIGINT) END AS n_bytes
        |FROM p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rates = Array(44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000)
      val brs = Array(32, 48, 64, 96, 128)
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val bytes = (id % 4) match {
            case 0 => AudioHeader.encodeWav(
              (id % 3 + 1).toInt, (8000 + (id % 5) * 4000).toInt,
              (8 * (id % 3 + 1)).toInt, (id % 199 + 1).toInt)
            case 1 => AudioHeader.encodeFlac(
              (id % 7 + 1).toInt, (8000 + (id % 9) * 4000).toInt,
              (id % 29 + 4).toInt, id % 100000)
            case 2 => AudioHeader.encodeMp3(
              ((id / 4) % 2 + 1).toInt, rates((id % 9).toInt),
              brs((id % 5).toInt), (id % 30 + 1).toInt, (id % 64).toInt)
            case _ => AudioHeader.encodeOgg(
              (id % 7 + 1).toInt, (8000 + (id % 11) * 1000).toInt, id % 1000000)
          }
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      val media = asMediaFrame(payloads, "doc_id", "payload", "src")
      decodeAudioMeta(media)
        .select(col("media_id"), col("format"), col("channels"),
          col("sample_rate"), col("bit_depth"), col("n_frames"),
          col("duration_us"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q120_video_meta",
      """REAL video-container decode end-to-end — the modality family
        |completed (image q89/q94/q103, audio q108/q115/q117/q119, now
        |video): each document row becomes a structurally valid MP4
        |(ISO BMFF: ftyp + moov[mvhd + per-track trak/tkhd] + mdat)
        |whose timescale / duration / track count / dimensions all
        |derive from doc_id, pushed through the canonical media frame
        |and the batched decodeVideoMeta stage (VideoHeader: strict box
        |walk, exact tiling at every nesting level, version-implied
        |fullbox sizes, integral 16.16 dimensions). Every 13th row gets
        |its moov size field corrupted and must come back "unknown"
        |with null fields. The oracle recomputes every field AND the
        |exact container byte size (24 + 8 + 108 + 100 x tracks + 8 +
        |mdat) from doc_id arithmetic.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id,
        |    1000 + (doc_id % 9) * 600 AS tscale, doc_id % 100000 AS dur,
        |    doc_id % 3 + 1 AS ntrk, 160 * (doc_id % 8 + 1) AS w,
        |    90 * (doc_id % 8 + 1) AS h, doc_id % 256 AS mdat,
        |    doc_id % 13 = 7 AS bad
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE WHEN bad THEN 'unknown' ELSE 'mp4' END AS format,
        |  CASE WHEN bad THEN NULL ELSE 'isom' END AS major_brand,
        |  CASE WHEN bad THEN NULL ELSE tscale END AS timescale,
        |  CASE WHEN bad THEN NULL ELSE dur * 1000000 // tscale END AS duration_us,
        |  CASE WHEN bad THEN NULL ELSE w END AS width,
        |  CASE WHEN bad THEN NULL ELSE h END AS height,
        |  CASE WHEN bad THEN NULL ELSE ntrk END AS n_tracks,
        |  24 + 8 + 108 + 100 * ntrk + 8 + mdat AS n_bytes
        |FROM p""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val k = (id % 8 + 1).toInt
          val bytes = VideoHeader.encodeMp4(
            brand = "isom",
            timescale = 1000 + (id % 9) * 600,
            duration = id % 100000,
            tracks = Seq.fill((id % 3 + 1).toInt)((160 * k, 90 * k)),
            mdatBytes = (id % 256).toInt)
          // corrupt the moov box's size field: the strict walk must
          // reject the whole payload rather than misparse past it
          if (id % 13 == 7) bytes(27) = (bytes(27) + 1).toByte
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      val media = asMediaFrame(payloads, "doc_id", "payload", "src")
      decodeVideoMeta(media)
        .select(col("media_id"), col("format"), col("major_brand"),
          col("timescale"), col("duration_us"), col("width"), col("height"),
          col("n_tracks"), col("meta.n_bytes").as("n_bytes"))
    },

    q("q118_image_resize_bilinear",
      """The q103 pixel pipeline with the BILINEAR resampler — the
        |kernel training-image pipelines actually default to: the same
        |doc_id-derived RGB PNGs (all five spec filters) flow through
        |decode → bilinear 16x16 resize → re-encode → second decode →
        |pixel checksums. The resampler is exact fixed-point (source
        |coordinate ((2x+1)w - 16)/32 clamped at 0, 2x2 blend over
        |denominator 1024 with floor division — ImagePixels.
        |resizeBilinear), so the oracle below recomputes EVERY output
        |pixel from first principles in SQL: same neighborhood indices,
        |same integer weights, same floor-divide. Any float creeping
        |into the blend, a half-pixel convention slip, or a clamp bug
        |changes some pixel at some doc_id and turns that row red.""".stripMargin,
      """WITH g AS (
        |  SELECT doc_id, i,
        |    (i % 48) // 3 AS x2, i // 48 AS y2, i % 3 AS ch,
        |    doc_id % 32 + 1 AS w, doc_id % 24 + 1 AS h
        |  FROM documents, range(0, 768) t(i)),
        |f AS (
        |  SELECT *, greatest((2 * x2 + 1) * w - 16, 0) AS tx,
        |            greatest((2 * y2 + 1) * h - 16, 0) AS ty FROM g),
        |e AS (
        |  SELECT *, tx // 32 AS x0, tx % 32 AS fx, least(tx // 32 + 1, w - 1) AS x1,
        |            ty // 32 AS y0, ty % 32 AS fy, least(ty // 32 + 1, h - 1) AS y1 FROM f),
        |v AS (
        |  SELECT doc_id, i,
        |    ((32 - fy) * ((32 - fx) * ((doc_id * 7 + x0 * 5 + y0 * 3 + ch * 11) % 256)
        |                + fx * ((doc_id * 7 + x1 * 5 + y0 * 3 + ch * 11) % 256))
        |     + fy * ((32 - fx) * ((doc_id * 7 + x0 * 5 + y1 * 3 + ch * 11) % 256)
        |           + fx * ((doc_id * 7 + x1 * 5 + y1 * 3 + ch * 11) % 256))) // 1024 AS val
        |  FROM e)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
        |  CAST(sum(val) AS BIGINT) AS checksum,
        |  CAST(sum(val * (i + 1)) % 1000000007 AS BIGINT) AS wsum
        |FROM v GROUP BY doc_id""".stripMargin) { (s, dir) =>
      pixelChecksums(resizeImages(docPatternPngs(s, dir), 16, 16, kernel = "bilinear"))
    },

    // ----------------------------------------------------------------
    q("q124_image_resize_area",
      """The q103 pixel pipeline with the AREA-AVERAGE (box-filter)
        |resampler — the anti-aliasing downsample kernel thumbnail
        |pipelines reach for: the same doc_id-derived RGB PNGs flow
        |through decode → area 16x16 resize → re-encode → second decode
        |→ pixel checksums. The kernel is exact integer coverage
        |arithmetic (per-axis overlap weights wx = max(0, min((x+1)w,
        |(sx+1)*16) - max(x*w, sx*16)), value = floor(Σ wx*wy*p /
        |(w*h)) — ImagePixels.resizeArea), so the oracle recomputes
        |EVERY output pixel from first principles in SQL. The double
        |coverage sum is evaluated SEPARABLY (x-axis partial sums, then
        |the y-axis fold) — exact because only the final floor-divide
        |rounds — keeping the oracle's cross join linear in (w + h)
        |instead of w*h per output pixel. Source widths 1..32 and
        |heights 1..24 exercise both down- and up-scaling through the
        |same coverage formula.""".stripMargin,
      """WITH rs AS (
        |  SELECT doc_id, x2, sy, ch, w, h,
        |    sum(greatest(0, least((x2 + 1) * w, (sx + 1) * 16) - greatest(x2 * w, sx * 16))
        |        * ((doc_id * 7 + sx * 5 + sy * 3 + ch * 11) % 256)) AS rowsum
        |  FROM (SELECT doc_id, doc_id % 32 + 1 AS w, doc_id % 24 + 1 AS h FROM documents) d,
        |       range(0, 16) x(x2), range(0, 24) s1(sy), range(0, 3) c(ch), range(0, 32) s2(sx)
        |  WHERE sx < w AND sy < h
        |  GROUP BY ALL),
        |v AS (
        |  SELECT doc_id, (y2 * 16 + x2) * 3 + ch AS i,
        |    sum(greatest(0, least((y2 + 1) * h, (sy + 1) * 16) - greatest(y2 * h, sy * 16))
        |        * rowsum) // (w * h) AS val
        |  FROM rs, range(0, 16) yy(y2)
        |  GROUP BY doc_id, y2, x2, ch, w, h)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
        |  CAST(sum(val) AS BIGINT) AS checksum,
        |  CAST(sum(val * (i + 1)) % 1000000007 AS BIGINT) AS wsum
        |FROM v GROUP BY doc_id""".stripMargin) { (s, dir) =>
      pixelChecksums(resizeImages(docPatternPngs(s, dir), 16, 16, kernel = "area"))
    },

    // ----------------------------------------------------------------
    q("q132_audio_features",
      """PCM PAYLOAD featurization — the audio twin of the q103 pixel
        |pipeline, taking the audio modality past headers into the
        |sample data: each doc_id-derived WAV (q108's fixture, including
        |its corrupted every-7th row) flows through the strict header
        |walk and then ONE O(1)-state pass over the data chunk
        |(AudioHeader.decodePcmFeatures), producing peak amplitude,
        |integer mean-square energy, and the per-channel zero-crossing
        |count, all on the canonical 16-bit amplitude scale (8-bit
        |samples centered+scaled, wider samples floor-divided to their
        |top 16 bits) so features are comparable across container bit
        |depths. Bytes never shuffle — features leave the scan, payloads
        |do not, and state per payload is three accumulators plus one
        |previous-frame value per channel regardless of duration. The
        |oracle recomputes EVERY sample value from the encoder's
        |frame%251 byte ramp in SQL — amplitude mapping, floor-divide
        |mean square, strict sign-flip crossing rule (a zero sample
        |breaks a run) — so a sign-extension bug, an off-by-one in the
        |sample walk, or a channel-interleave slip turns rows red.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id, doc_id % 3 + 1 AS ch, 8 * (doc_id % 4 + 1) AS bits,
        |         doc_id % 200 + 1 AS n, doc_id % 7 = 3 AS bad
        |  FROM documents),
        |s AS (
        |  SELECT p.doc_id, p.ch,
        |    CASE WHEN p.bits = 8 THEN ((f % 251) - 128) * 256
        |         WHEN (f % 251) >= 128 THEN (f % 251) * 257 - 65536
        |         ELSE (f % 251) * 257 END AS v,
        |    CASE WHEN f = 0 THEN NULL
        |         WHEN p.bits = 8 THEN (((f - 1) % 251) - 128) * 256
        |         WHEN ((f - 1) % 251) >= 128 THEN ((f - 1) % 251) * 257 - 65536
        |         ELSE ((f - 1) % 251) * 257 END AS pv
        |  FROM p, range(0, 200) t(f)
        |  WHERE NOT p.bad AND f < p.n),
        |a AS (
        |  SELECT doc_id,
        |    CAST(max(abs(v)) AS BIGINT) AS peak_abs,
        |    CAST(sum(v * v) // count(*) AS BIGINT) AS mean_sq,
        |    CAST(any_value(ch) * count(*) FILTER (WHERE pv * v < 0) AS BIGINT)
        |      AS zero_crossings,
        |    CAST(any_value(ch) * count(*) AS BIGINT) AS n_samples
        |  FROM s GROUP BY doc_id)
        |SELECT p.doc_id AS media_id,
        |  CASE WHEN p.bad THEN 'unknown' ELSE 'wav' END AS format,
        |  a.peak_abs, a.mean_sq, a.zero_crossings, a.n_samples
        |FROM p LEFT JOIN a ON p.doc_id = a.doc_id""".stripMargin) { (s, dir) =>
      decodeAudioFeatures(docWavMedia(s, dir))
        .select(col("media_id"), col("format"), col("peak_abs"),
          col("mean_sq"), col("zero_crossings"), col("n_samples"))
    },

    // ----------------------------------------------------------------
    q("q133_frame_sampling",
      """FRAME SAMPLING through REAL MP4 sample tables — the q120 video
        |modality taken past the movie header into the structures an
        |actual frame reader walks: each doc_id-derived MP4 now carries
        |a full mdia/minf/stbl chain (mdhd media timescale, stts
        |time-to-sample runs with TWO different deltas, per-sample stsz
        |sizes, single-chunk stsc/stco) and a correctly sized mdat, and
        |the sampling stage (Multimodal.sampleVideoFrames) selects every
        |3rd frame, resolving it to exact integer-microsecond pts and
        |the absolute (byte_offset, n_bytes) span a ranged read would
        |fetch — one linear walk, O(1) state, output bounded by n/stride
        |rows. Every 7th payload's stco chunk offset is corrupted to
        |point past the file; the strict table validation (offset + Σ
        |sizes must land inside the file) must reject the whole payload
        |— zero rows — even though the box framing itself is intact.
        |The oracle recomputes every selected frame's pts (split stts
        |runs), its prefix-sum byte offset and the closed-form header
        |size from doc_id arithmetic.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id,
        |    1000 * (doc_id % 4 + 1) AS tsc,
        |    doc_id % 60 + 1 AS n,
        |    (doc_id % 60 + 2) // 2 AS r1,
        |    100 + (doc_id % 7) * 10 AS d1,
        |    200 + (doc_id % 5) * 20 AS d2,
        |    doc_id % 7 = 3 AS bad
        |  FROM documents),
        |s AS (
        |  SELECT p.doc_id, p.tsc, p.n, p.r1, p.d1, p.d2, i,
        |    100 + ((p.doc_id + i) % 50) AS sz,
        |    CAST(sum(100 + ((p.doc_id + i) % 50)) OVER (
        |      PARTITION BY p.doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS pre
        |  FROM p, range(0, 60) t(i)
        |  WHERE NOT p.bad AND i < p.n)
        |SELECT doc_id AS media_id, CAST(i AS BIGINT) AS sample_idx,
        |  CAST((CASE WHEN i < r1 THEN i * d1
        |             ELSE r1 * d1 + (i - r1) * d2 END) * 1000000 // tsc AS BIGINT)
        |    AS pts_us,
        |  CAST(388 + 8 * (CASE WHEN n = 1 THEN 1 ELSE 2 END) + 4 * n
        |       + coalesce(pre, 0) AS BIGINT) AS byte_offset,
        |  CAST(sz AS BIGINT) AS n_bytes
        |FROM s WHERE i % 3 = 0""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val n = (id % 60 + 1).toInt
          val r1 = (n + 1) / 2
          val d1 = 100L + (id % 7) * 10
          val d2 = 200L + (id % 5) * 20
          val runs =
            if (n == r1) Seq((r1.toLong, d1))
            else Seq((r1.toLong, d1), ((n - r1).toLong, d2))
          val sizes = (0 until n).map(i => 100L + ((id + i) % 50))
          val mdat = sizes.sum.toInt
          val bytes = VideoHeader.encodeMp4("isom", 90000L, id % 1000 + 1,
            Seq((640, 360)), mdat, Some((1000L * (id % 4 + 1), runs, sizes)))
          // corrupt the stco chunk offset's high byte: the box framing
          // stays valid, but the index now points past the file — the
          // table-level strictness must reject, not emit bogus spans
          if (id % 7 == 3) {
            val pos = bytes.length - mdat - 12
            bytes(pos) = (bytes(pos) + 1).toByte
          }
          (id, bytes)
        }
        .toDF("doc_id", "payload")
        .withColumn("src", lit("synthetic"))
      sampleVideoFrames(asMediaFrame(payloads, "doc_id", "payload", "src"), stride = 3)
        .select(col("media_id"), col("sample_idx"), col("pts_us"),
          col("byte_offset"), col("n_bytes"))
    },

    // ----------------------------------------------------------------
    q("q134_image_resize_bicubic",
      """The q103 pixel pipeline with the BICUBIC (Catmull-Rom)
        |resampler — completing the classic kernel family (nearest
        |q103, bilinear q118, area q124, bicubic here), the high-quality
        |choice when training images are upscaled. Catmull-Rom's
        |rational coefficients (denominator 2) make an EXACT fixed-point
        |formulation possible: the four tap weights are integer cubics
        |in the 1/32 fractional position summing to 65536, the 4x4
        |separable blend divides once by 65536² with a +256·den bias so
        |the negative-lobe numerator floors identically in both engines,
        |and the result clamps to [0,255] (overshoot is the kernel's
        |defining property — the oracle exercises it on every sharp
        |pattern edge). Taps replicate the border. The oracle recomputes
        |EVERY output pixel from first principles: same tap indices,
        |same integer cubic weights, same bias/floor/clamp.""".stripMargin,
      """WITH g AS (
        |  SELECT doc_id, i,
        |    (i % 48) // 3 AS x2, i // 48 AS y2, i % 3 AS ch,
        |    doc_id % 32 + 1 AS w, doc_id % 24 + 1 AS h
        |  FROM documents, range(0, 768) t(i)),
        |f AS (
        |  SELECT *, greatest((2 * x2 + 1) * w - 16, 0) AS tx,
        |            greatest((2 * y2 + 1) * h - 16, 0) AS ty FROM g),
        |e AS (
        |  SELECT *, tx // 32 AS x0, tx % 32 AS fx,
        |            ty // 32 AS y0, ty % 32 AS fy FROM f),
        |tap AS (
        |  SELECT doc_id, i, ch, fx, fy, kx.k AS kx, ky.k AS ky,
        |    least(greatest(x0 - 1 + kx.k, 0), w - 1) AS xi,
        |    least(greatest(y0 - 1 + ky.k, 0), h - 1) AS yj
        |  FROM e, range(0, 4) kx(k), range(0, 4) ky(k)),
        |v AS (
        |  SELECT doc_id, i,
        |    (sum(
        |       (CASE kx WHEN 0 THEN -fx*fx*fx + 64*fx*fx - 1024*fx
        |                WHEN 1 THEN 3*fx*fx*fx - 160*fx*fx + 65536
        |                WHEN 2 THEN -3*fx*fx*fx + 128*fx*fx + 1024*fx
        |                ELSE fx*fx*fx - 32*fx*fx END)
        |     * (CASE ky WHEN 0 THEN -fy*fy*fy + 64*fy*fy - 1024*fy
        |                WHEN 1 THEN 3*fy*fy*fy - 160*fy*fy + 65536
        |                WHEN 2 THEN -3*fy*fy*fy + 128*fy*fy + 1024*fy
        |                ELSE fy*fy*fy - 32*fy*fy END)
        |     * ((doc_id * 7 + xi * 5 + yj * 3 + ch * 11) % 256))
        |     + 256 * 4294967296) // 4294967296 - 256 AS raw
        |  FROM tap GROUP BY doc_id, i)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
        |  CAST(sum(least(greatest(raw, 0), 255)) AS BIGINT) AS checksum,
        |  CAST(sum(least(greatest(raw, 0), 255) * (i + 1)) % 1000000007 AS BIGINT) AS wsum
        |FROM v GROUP BY doc_id""".stripMargin) { (s, dir) =>
      pixelChecksums(resizeImages(docPatternPngs(s, dir), 16, 16, kernel = "bicubic"))
    },

    q("q219_audio_fingerprint",
      """Perceptual near-duplicate AUDIO dedup by sign-of-delta
        |fingerprint — the Haitsma & Kalker 2002 scheme (the fingerprint
        |bit is the SIGN of the energy difference between consecutive
        |frames; amplitude stands in for per-band energy on this
        |deterministic PCM corpus): strict-decode each WAV, nearest-
        |resample channel 0 onto a 33-point grid (exact integer indices,
        |the resizeNearest convention), pack the 32 rise/fall bits into
        |one BIGINT, and census the collision classes — q215's dHash
        |shape on the audio modality, completing the perceptual-dedup
        |pair. Every 7th row's corrupted riff size must strict-reject
        |and stay OUT of the census (the oracle excludes exactly those
        |rows from first principles, so a lenient decoder that hashed
        |garbage would shift a class and turn rows red). The oracle
        |replays resample indices, the 8/16/24/32-bit amplitude mapping
        |and every comparison from doc_id arithmetic. Scale shape: one
        |batched mapPartitions pass, 8 bytes out per clip; 64-bit-keyed
        |mergeable census; output bounded by collision classes.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id, 8 * (doc_id % 4 + 1) AS bits, doc_id % 200 + 1 AS fr
        |  FROM documents WHERE doc_id % 7 <> 3),
        |g AS (
        |  SELECT doc_id, t.t AS t, bits,
        |    (t.t * fr) // 33 AS fa, ((t.t + 1) * fr) // 33 AS fb
        |  FROM p, range(0, 32) t(t)),
        |v AS (
        |  SELECT doc_id, t,
        |    CASE WHEN bits = 8 THEN ((fa % 251) - 128) * 256
        |         WHEN (fa % 251) >= 128 THEN (fa % 251) * 257 - 65536
        |         ELSE (fa % 251) * 257 END AS va,
        |    CASE WHEN bits = 8 THEN ((fb % 251) - 128) * 256
        |         WHEN (fb % 251) >= 128 THEN (fb % 251) * 257 - 65536
        |         ELSE (fb % 251) * 257 END AS vb
        |  FROM g),
        |f AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vb > va THEN CAST(1 AS BIGINT) << t
        |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS fp
        |  FROM v GROUP BY 1)
        |SELECT fp, count(*)::BIGINT AS n_clips,
        |  min(doc_id) AS keep_doc, max(doc_id) AS max_doc
        |FROM f GROUP BY 1 HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      fingerprintStage(docWavMedia(s, dir))
        .filter(col("fp").isNotNull)
        .groupBy(col("fp"))
        .agg(count(lit(1)).cast("bigint").as("n_clips"),
          min(col("media_id")).as("keep_doc"),
          max(col("media_id")).as("max_doc"))
        .filter(col("n_clips") >= 2)
    },

    q("q226_video_fingerprint",
      """Perceptual near-duplicate VIDEO dedup by temporal fingerprint —
        |q219's Haitsma-Kalker sign-of-delta scheme lifted to the video
        |modality (per-frame ENERGY stands in for the per-band energy;
        |the published video analogs — TIRI-DCT, Coskun et al. 2006 —
        |all reduce to "hash a coarse temporal energy profile"): strict-
        |decode each MP4's REAL sample tables (the q133 machinery),
        |walk every 3rd frame's (byte_offset, n_bytes) span, sum the
        |span's payload bytes into a frame energy IN THE SAME scan pass
        |(index-then-fetch without a second read — at 100 TB the span
        |walk is the ranged GET), and pack the 7 rise/fall bits of the
        |8 sampled energies into one BIGINT. The fixture gives every
        |video class-derived frame content plus a PER-VIDEO brightness
        |shift (uniform, no byte wrap) — equal-size frames make the
        |energy deltas shift-invariant, so same-class videos collide by
        |construction, the q215 gradient-invariance story in time.
        |Corrupt stco rows (every 7th doc) strict-reject and stay OUT
        |of the census. The oracle replays frame sizes, the modular
        |content formula, every energy and every comparison from doc_id
        |arithmetic. Scale shape: one batched mapPartitions pass, 8
        |bytes out per video; 64-bit-keyed mergeable census; output
        |bounded by collision classes.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id, doc_id % 12 AS cls,
        |    64 + ((doc_id % 12) % 5) * 16 AS sz, doc_id % 64 AS shift
        |  FROM documents WHERE doc_id % 7 <> 3),
        |e AS (
        |  SELECT doc_id,  k.k AS k,
        |    CAST(sum((cls * 17 + 45 * k.k * k.k + 3 * j.j) % 128)
        |         + max(shift * sz) AS BIGINT) AS energy
        |  FROM p, range(0, 8) k(k), range(0, 128) j(j)
        |  WHERE j.j < sz GROUP BY 1, 2),
        |f AS (
        |  SELECT a.doc_id,
        |    CAST(sum(CASE WHEN b.energy > a.energy THEN CAST(1 AS BIGINT) << a.k
        |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS fp
        |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.k = a.k + 1
        |  GROUP BY 1)
        |SELECT fp, count(*)::BIGINT AS n_videos,
        |  min(doc_id) AS keep_doc, max(doc_id) AS max_doc
        |FROM f GROUP BY 1 HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      videoFingerprintStage(docContentMp4s(s, dir), stride = 3)
        .filter(col("fp").isNotNull)
        .groupBy(col("fp"))
        .agg(count(lit(1)).cast("bigint").as("n_videos"),
          min(col("media_id")).as("keep_doc"),
          max(col("media_id")).as("max_doc"))
        .filter(col("n_videos") >= 2)
    },

    q("q241_gif_animation",
      """ANIMATED-GIF frame census through the REAL GIF89a block
        |grammar — the q133 move (header → the structures a frame
        |reader walks) on the image modality: each doc_id-derived GIF
        |carries a NETSCAPE2.0 loop extension and per-frame Graphic
        |Control Extensions + image descriptors + length-prefixed data
        |sub-blocks, and the strict walk (ImageHeader.decodeGifAnimation
        |— spec §23-§26 grammar, no LZW inflation: a frame INDEXER only
        |needs offsets and timing) yields frames, total display time
        |and loop count per animation. Every 7th payload's first GCE
        |block-size byte is corrupted 4→5 — the header-level decode
        |still passes (magic, LSD, color table, trailer all intact), so
        |ONLY the walk's fixed-size check can reject it; a lenient
        |walker that skipped by the declared size would mis-frame the
        |stream and turn rows red. The oracle replays frame counts,
        |every per-frame delay and the loop count from doc_id
        |arithmetic. Scale shape: one batched mapPartitions pass, ~24
        |bytes out per animation; output is |docs| rows.""".stripMargin,
      """WITH p AS (
        |  SELECT doc_id, doc_id % 10 + 1 AS n, doc_id % 4 AS loop_count
        |  FROM documents WHERE doc_id % 7 <> 3),
        |d AS (
        |  SELECT doc_id, CAST(sum(4 + (doc_id + i) % 6) AS BIGINT) AS total_cs
        |  FROM p, range(0, 10) t(i) WHERE i < n GROUP BY 1)
        |SELECT p.doc_id AS media_id, CAST(p.n AS BIGINT) AS n_frames,
        |  d.total_cs AS total_delay_cs,
        |  CAST(p.loop_count AS BIGINT) AS loop_count,
        |  (1000 * d.total_cs) // p.n AS mean_delay_milli
        |FROM p JOIN d ON d.doc_id = p.doc_id""".stripMargin) { (s, dir) =>
      gifAnimStage(docAnimatedGifs(s, dir))
        .filter(col("n_frames").isNotNull)
        .select(col("media_id"), col("n_frames"), col("total_delay_cs"),
          col("loop_count"),
          expr("(1000 * total_delay_cs) DIV n_frames").as("mean_delay_milli"))
    },

    q("q215_image_dhash",
      """Perceptual near-duplicate IMAGE dedup by difference hash —
        |the dHash of Krawetz 2013 ("Kind of Like That"), the
        |perceptual-hash family LAION-scale curation dedups images
        |with (Webster et al. 2023, "On the De-duplication of
        |LAION-2B"): decode each PNG, nearest-resize to the canonical
        |9x8 thumbnail, grayscale by integer channel mean, and pack
        |the 64 horizontal-gradient sign bits (gray(x+1,y) > gray(x,y))
        |into two 32-bit BIGINT halves (a single signed 64-bit would
        |overflow at bit 63 in the oracle). The census then groups on
        |the hash and reports every collision class — images that
        |differ only by a uniform brightness shift (the fixture's
        |7·doc_id term) legitimately collide, which is the POINT of a
        |gradient hash. The oracle recomputes the full pipeline —
        |resize indices x·w div 9, the channel-mean gray, every
        |comparison — from doc_id arithmetic, so a bug in decode,
        |resample indexing, or bit packing turns rows red. Scale
        |shape: bytes die inside one batched mapPartitions pass
        |(16 bytes out per image); the census is a 64-bit-keyed
        |mergeable agg with map-side combine; output is bounded by
        |the number of collision CLASSES, never corpus size.""".stripMargin,
      dhashOracleSql) { (s, dir) =>
      dhashStage(docPatternPngs(s, dir))
        .filter(col("hash_hi").isNotNull)
        .groupBy(col("hash_hi"), col("hash_lo"))
        .agg(count(lit(1)).cast("bigint").as("n_images"),
          min(col("media_id")).as("keep_doc"),
          max(col("media_id")).as("max_doc"))
        .filter(col("n_images") >= 2)
    })

  /** q226's fixture: one doc_id-derived MP4 per document with REAL
    * sample tables (q133's encodeMp4 stbl chain) and a CONTENT-FILLED
    * mdat — 24 equal-size frames (sz = 64 + (cls%5)·16, cls = doc_id%12)
    * whose byte j of frame i is ((cls·17 + 5·i² + 3·j) mod 128) plus a
    * per-video brightness shift (doc_id mod 64; bytes stay ≤ 190, no
    * wrap — the shift must cancel in energy DELTAS, and a modular wrap
    * would break that invariance). Every 7th doc's stco offset is
    * corrupted exactly like q133 so strict decode rejects it. */
  private def docContentMp4s(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val cls = (id % 12).toInt
        val n = 24
        val sz = 64 + (cls % 5) * 16
        val shift = (id % 64).toInt
        val mdat = n * sz
        val bytes = VideoHeader.encodeMp4("isom", 90000L, n.toLong,
          Seq((320, 240)), mdat,
          Some((90000L, Seq((n.toLong, 3000L + cls * 100)),
            Seq.fill(n)(sz.toLong))))
        val base = bytes.length - mdat
        var i = 0
        while (i < n) {
          var j = 0
          while (j < sz) {
            bytes(base + i * sz + j) =
              (((cls * 17 + 5 * i * i + 3 * j) % 128) + shift).toByte
            j += 1
          }
          i += 1
        }
        if (id % 7 == 3) {
          val pos = bytes.length - mdat - 12
          bytes(pos) = (bytes(pos) + 1).toByte
        }
        (id, bytes)
      }
      .toDF("doc_id", "payload")
      .withColumn("src", lit("synthetic"))
    asMediaFrame(payloads, "doc_id", "payload", "src")
  }

  /** Temporal fingerprint stage: strict-decode the MP4 sample tables,
    * sum each stride-th frame's payload bytes (unsigned) into a frame
    * energy during the SAME pass — the span walk never leaves the scan
    * — and pack the rise/fall bits of consecutive sampled energies
    * into one BIGINT (bit k−1 set iff energy_k > energy_{k−1}).
    * Payloads that fail table validation fingerprint to null. */
  private[graft] def videoFingerprintStage(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](mIdx)
        VideoHeader.decodeSampleTable(payload) match {
          case Some(st) =>
            val energies = scala.collection.mutable.ArrayBuffer.empty[Long]
            var off = st.chunkOffset
            var i = 0
            while (i < st.sampleSizes.length) {
              val szi = st.sampleSizes(i)
              if (i % stride == 0) {
                var sum = 0L
                var j = 0L
                while (j < szi) {
                  sum += payload((off + j).toInt) & 0xff
                  j += 1
                }
                energies += sum
              }
              off += szi
              i += 1
            }
            var fp = 0L
            var k = 1
            while (k < energies.length) {
              if (energies(k) > energies(k - 1)) fp |= 1L << (k - 1)
              k += 1
            }
            Row(id, fp)
          case None => Row(id, null)
        }
      }
    }(enc)
  }

  /** q241's fixture: one doc_id-derived animated GIF per document —
    * n = id%10+1 frames with per-frame delay 4+(id+i)%6 cs and
    * (id+37·i)%300+1 bytes of payload, loop count id%4, bpp 2. Every
    * 7th doc's FIRST GCE block-size byte is corrupted 4→5: the
    * header-level decode still accepts the file, so only the
    * animation walk's strict fixed-size check can reject it. */
  private def docAnimatedGifs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.documents(s, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val n = (id % 10 + 1).toInt
        val frames = (0 until n).map { i =>
          val len = ((id + 37L * i) % 300 + 1).toInt
          val data = Array.tabulate(len)(j => ((id + i + j) % 251).toByte)
          ((4 + (id + i) % 6).toInt, data)
        }
        val bytes = ImageHeader.encodeAnimatedGif(
          (id % 32 + 1).toInt, (id % 24 + 1).toInt, 2, frames, (id % 4).toInt)
        if (id % 7 == 3) {
          val gcePos = 13 + 3 * (1 << 2) + 19 + 2 // LSD+GCT, NETSCAPE ext, size byte
          bytes(gcePos) = 5.toByte
        }
        (id, bytes)
      }
      .toDF("doc_id", "payload")
      .withColumn("src", lit("synthetic"))
    asMediaFrame(payloads, "doc_id", "payload", "src")
  }

  /** Animation-census stage: strict GIF89a block walk per payload
    * (frames, total delay, loop count); payloads the walk rejects
    * census to null columns. */
  private[graft] def gifAnimStage(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = true),
      StructField("total_delay_cs", LongType, nullable = true),
      StructField("loop_count", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        ImageHeader.decodeGifAnimation(r.getAs[Array[Byte]](mIdx)) match {
          case Some(a) =>
            Row(id, a.nFrames, a.totalDelayCs, a.loopCount.getOrElse(-1L))
          case None => Row(id, null, null, null)
        }
      }
    }(enc)
  }

  /** dHash stage: strict-decode each PNG payload, nearest-resize to
    * 9x8, grayscale by integer channel mean, pack the 64 horizontal
    * gradient bits into two 32-bit halves (rows 0-3 -> hash_hi,
    * rows 4-7 -> hash_lo). Unrecognized payloads hash to null. */
  private def dhashStage(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("hash_hi", LongType, nullable = true),
      StructField("hash_lo", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        ImagePixels.decodePng(r.getAs[Array[Byte]](mIdx)) match {
          case Some(rast) =>
            val small = ImagePixels.resizeNearest(rast, 9, 8)
            val nc = small.channels
            def gray(x: Int, y: Int): Int = {
              val base = (y * 9 + x) * nc
              var s = 0; var c = 0
              while (c < nc) { s += small.pixels(base + c) & 0xff; c += 1 }
              s / nc
            }
            var hi = 0L; var lo = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (gray(x + 1, y) > gray(x, y)) {
                  if (y < 4) hi |= 1L << (y * 8 + x)
                  else lo |= 1L << ((y - 4) * 8 + x)
                }
                x += 1
              }
              y += 1
            }
            Row(id, hi, lo)
          case None => Row(id, null, null)
        }
      }
    }(enc)
  }

  /** Fingerprint stage: strict-decode each WAV payload and reduce it
    * to the 32-bit Haitsma-Kalker sign-of-delta fingerprint
    * ([[AudioHeader.pcmFingerprint]]). Rejected payloads fingerprint
    * to null. */
  private def fingerprintStage(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        AudioHeader.pcmFingerprint(r.getAs[Array[Byte]](mIdx)) match {
          case Some(fp) => Row(id, fp)
          case None     => Row(id, null)
        }
      }
    }(enc)
  }

  /** The fixture's gray value at resized cell (sx, sy) as a DuckDB
    * expression: channel-mean of the three doc_id-derived planes,
    * each reduced mod 256 BEFORE the mean (bytes wrap per channel). */
  private def duckGray(sx: String, sy: String): String =
    s"((7 * doc_id + 5 * ($sx) + 3 * ($sy)) % 256 " +
      s"+ (7 * doc_id + 5 * ($sx) + 3 * ($sy) + 11) % 256 " +
      s"+ (7 * doc_id + 5 * ($sx) + 3 * ($sy) + 22) % 256) // 3"

  /** One 32-bit dHash half (rows yoff..yoff+3) from doc_id arithmetic:
    * nearest-resize source indices x*w div 9 / y*h div 8, gradient
    * sign bits packed little-endian within the half. */
  private def dhashHalfSql(yoff: Int): String = {
    val sy = s"((i // 8 + $yoff) * (doc_id % 24 + 1)) // 8"
    val sxl = "((i % 8) * (doc_id % 32 + 1)) // 9"
    val sxr = "((i % 8 + 1) * (doc_id % 32 + 1)) // 9"
    s"""CAST(list_sum(list_transform(range(0, 32), i ->
       |    CASE WHEN ${duckGray(sxr, sy)} > ${duckGray(sxl, sy)}
       |         THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""".stripMargin
  }

  private def dhashOracleSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    ${dhashHalfSql(0)} AS hash_hi,
       |    ${dhashHalfSql(4)} AS hash_lo
       |  FROM documents)
       |SELECT hash_hi, hash_lo, count(*)::BIGINT AS n_images,
       |  min(doc_id) AS keep_doc, max(doc_id) AS max_doc
       |FROM h GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
}
