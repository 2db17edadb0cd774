package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.rowsOnly
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, and a batched decode/feature-extract stage.
  *
  * The decode itself is STUBBED (this container has no image/audio
  * codecs): `fakeDecodeFeatures` derives a deterministic feature vector
  * from the bytes. Everything around it — schema, batch shape,
  * mapPartitions plumbing, partition sizing — is real and is what
  * matters at 100 TB:
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

  /** STUB decoder: deterministic 8-dim feature vector from the payload
    * bytes (rolling byte sums). Replace with a real codec+model; the
    * signature (Iterator of batches in, features out) is the contract. */
  def fakeDecodeFeatures(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
    val acc = new Array[Long](dims)
    var i = 0
    while (i < bytes.length) {
      acc(i % dims) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000).toFloat / 1000f)
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
        val feats = if (bytes == null) null else fakeDecodeFeatures(bytes, dims)
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ feats)
      }
    }(enc)
  }

  /** Frame-sampling stub: pick every k-th fixed-size block of the payload
    * (the video-frame-sample shape: linear scan, bounded output). */
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
    rowsOnly("q33_multimodal_features",
      """Binary-column pipeline on the documents payload: canonical media
        |frame (binary + metadata struct) → batched stub decode →
        |8-dim feature vectors. Not SQL-expressible (mapPartitions stage);
        |rows-only check. The vector is emitted CSV-joined plus an L2
        |norm — the harness comparator sorts rows with pandas, which
        |cannot hash raw float arrays; the scalar forms carry the same
        |information for a rows-only signal.""".stripMargin) { (s, dir) =>
      val media = asMediaFrame(Tables.documents(s, dir), "doc_id", "text", "source")
      extractFeatures(media)
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.source").as("source"),
          array_join(transform(col("features"), f => f.cast("string")), ",")
            .as("features_csv"),
          sqrt(aggregate(transform(col("features"),
            f => f.cast("double") * f.cast("double")),
            lit(0.0), (acc, x) => acc + x)).as("l2"))
    })
}
