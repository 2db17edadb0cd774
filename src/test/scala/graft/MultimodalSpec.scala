package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "hello media world", "src1"), (2L, "another payload", "src2"),
      (3L, null.asInstanceOf[String], "src3"))
      .toDF("doc_id", "text", "source")
  }

  test("canonical media frame: binary payload + typed metadata struct") {
    val m = Multimodal.asMediaFrame(docs, "doc_id", "text", "source")
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = m.filter(col("media_id") === 1).select("meta.n_bytes").head().getLong(0)
    assert(meta == "hello media world".length)
    // n_bytes counts BYTES: multi-byte UTF-8 must not undercount
    import spark.implicits._
    val utf8 = Multimodal.asMediaFrame(
      Seq((9L, "héllo wörld", "s")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
    assert(utf8.select("meta.n_bytes").head().getLong(0)
      == "héllo wörld".getBytes("UTF-8").length)
  }

  test("batched stub decode yields deterministic fixed-width features; nulls pass through") {
    val m = Multimodal.asMediaFrame(docs, "doc_id", "text", "source")
    val f1 = Multimodal.extractFeatures(m).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(m).orderBy("media_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.head.getSeq[Float](f1.head.fieldIndex("features")).size == 8)
    assert(f1.last.isNullAt(f1.last.fieldIndex("features"))) // null payload
    // media column dropped before anything downstream (bytes don't travel)
    assert(!f1.head.schema.fieldNames.contains("media"))
  }

  test("block sampling bounds output size") {
    val m = Multimodal.asMediaFrame(docs.filter(col("doc_id") === 1), "doc_id", "text", "source")
    val b = Multimodal.sampleBlocks(m, blockSize = 4, every = 2).select("blocks").head()
    val blocks = b.getSeq[Array[Byte]](0)
    assert(blocks.nonEmpty)
    assert(blocks.forall(_.length <= 4))
  }
}
