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

  test("batched feature extraction yields deterministic fixed-width features; nulls pass through") {
    val m = Multimodal.asMediaFrame(docs, "doc_id", "text", "source")
    val f1 = Multimodal.extractFeatures(m).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(m).orderBy("media_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    assert(f1.head.getSeq[Float](f1.head.fieldIndex("features")).size == 8)
    assert(f1.last.isNullAt(f1.last.fieldIndex("features"))) // null payload
    // media column dropped before anything downstream (bytes don't travel)
    assert(!f1.head.schema.fieldNames.contains("media"))
  }

  test("decodeFeatures dispatches: images get decoded-header features, text gets byte stats") {
    import graft.operators.ImageHeader
    val png = ImageHeader.encodePng(640, 480, 8, 2) // 33 bytes, 24 bpp
    val imgFeats = Multimodal.decodeFeatures(png)
    // [fmt=png(1), w%1000, h%1000, bpp, container bytes, (w*h)%1000,
    //  min extent, max extent] in exact milli units
    assert(imgFeats.map(f => math.round(f * 1000f)).toSeq ==
      Seq(1, 640, 480, 24, 33, (640 * 480) % 1000, 480, 640))
    val text = "just a plain document".getBytes("UTF-8")
    assert(Multimodal.decodeFeatures(text).toSeq == Multimodal.byteStatFeatures(text).toSeq)
    // dims > base length cycles the header facts deterministically
    assert(Multimodal.decodeFeatures(png, dims = 10).length == 10)
  }

  // ---- real header decode (ImageHeader) ----

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG decode: hand-built fixture bytes (real 1x1 RGBA IHDR, real CRC)") {
    // the canonical 1x1 PNG header: signature + IHDR(1,1,depth 8,
    // color type 6) with its well-known CRC 1F15C489
    val png = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 000000 1F15C489")
    val m = graft.operators.ImageHeader.decode(png)
    assert(m.contains(graft.operators.ImageHeader.ImgMeta("png", 1, 1, 32)))
    // corrupt the CRC by one bit -> strict decoder rejects
    val bad = png.clone(); bad(png.length - 1) = (bad(png.length - 1) ^ 1).toByte
    assert(graft.operators.ImageHeader.decode(bad).isEmpty)
    // truncated -> rejected
    assert(graft.operators.ImageHeader.decode(png.take(20)).isEmpty)
  }

  test("BMP decode: hand-built fixture bytes (1x1 24bpp, 58-byte file)") {
    // BITMAPFILEHEADER(size 58, offset 54) + BITMAPINFOHEADER(40, 1x1,
    // planes 1, 24bpp) + one blue pixel + row padding
    val bmp = hexBytes(
      "424D 3A000000 0000 0000 36000000" +
        "28000000 01000000 01000000 0100 1800 00000000 04000000" +
        "130B0000 130B0000 00000000 00000000" +
        "0000FF 00")
    val m = graft.operators.ImageHeader.decode(bmp)
    assert(m.contains(graft.operators.ImageHeader.ImgMeta("bmp", 1, 1, 24)))
    // declared size mismatch (extra byte) -> rejected
    assert(graft.operators.ImageHeader.decode(bmp :+ 0.toByte).isEmpty)
  }

  test("encoders round-trip through the decoder; text never false-positives") {
    import graft.operators.ImageHeader
    assert(ImageHeader.decode(ImageHeader.encodePng(640, 480, 8, 2))
      .contains(ImageHeader.ImgMeta("png", 640, 480, 24)))
    assert(ImageHeader.decode(ImageHeader.encodePng(7, 3, 16, 0))
      .contains(ImageHeader.ImgMeta("png", 7, 3, 16)))
    assert(ImageHeader.decode(ImageHeader.encodeBmp(101, 37, 24))
      .contains(ImageHeader.ImgMeta("bmp", 101, 37, 24)))
    assert(ImageHeader.decode("BMarkdown is not a bitmap".getBytes("UTF-8")).isEmpty)
    assert(ImageHeader.decode("plain document text".getBytes("UTF-8")).isEmpty)
    assert(ImageHeader.decode(Array.empty[Byte]).isEmpty)
    assert(ImageHeader.decode(null).isEmpty)
  }

  test("decodeImageMeta over the media frame: images decode, text is unknown") {
    import spark.implicits._
    import graft.operators.ImageHeader
    val rows = Seq(
      (1L, ImageHeader.encodePng(12, 34, 8, 6), "s"),
      (2L, ImageHeader.encodeBmp(5, 9, 24), "s"),
      (3L, "not an image at all".getBytes("UTF-8"), "s"),
      (4L, null.asInstanceOf[Array[Byte]], "s"))
      .toDF("doc_id", "payload", "source")
    val out = Multimodal.decodeImageMeta(
      Multimodal.asMediaFrame(rows, "doc_id", "payload", "source"))
      .orderBy("media_id").collect()
    def fmt(i: Int) = out(i).getString(out(i).fieldIndex("format"))
    def dim(i: Int, c: String) = out(i).getLong(out(i).fieldIndex(c))
    assert(fmt(0) == "png" && dim(0, "width") == 12 && dim(0, "height") == 34
      && dim(0, "bit_depth") == 32)
    assert(fmt(1) == "bmp" && dim(1, "width") == 5 && dim(1, "height") == 9
      && dim(1, "bit_depth") == 24)
    assert(fmt(2) == "unknown" && out(2).isNullAt(out(2).fieldIndex("width")))
    assert(fmt(3) == "unknown" && out(3).isNullAt(out(3).fieldIndex("width")))
  }

  test("JPEG decode: all SOFn frame markers, strict marker walk") {
    import graft.operators.ImageHeader
    val jpg = ImageHeader.encodeJpeg(200, 100)
    assert(ImageHeader.decode(jpg).contains(ImageHeader.ImgMeta("jpeg", 200, 100, 24)))
    // SOF3 (lossless) has the identical frame-header layout; precision
    // 4 is legal for lossless but NOT for DCT frames
    val sof3 = jpg.clone()
    sof3(21) = 0xc3.toByte // SOF0 -> SOF3 (marker byte after APP0's 18 bytes + FF)
    sof3(24) = 4.toByte    // precision 4: lossless-only
    assert(ImageHeader.decode(sof3).contains(ImageHeader.ImgMeta("jpeg", 200, 100, 12)))
    // the same precision on a DCT frame (SOF0) must reject
    val badPrec = jpg.clone(); badPrec(24) = 4.toByte
    assert(ImageHeader.decode(badPrec).isEmpty)
    // DHT (C4) in the SOFn range must NOT be parsed as a frame header
    val dht = jpg.clone(); dht(21) = 0xc4.toByte
    assert(ImageHeader.decode(dht).isEmpty) // walks to EOI with no SOF -> meta None
    // a second SOI mid-stream is malformed
    val dupSoi = jpg.clone(); dupSoi(21) = 0xd8.toByte
    assert(ImageHeader.decode(dupSoi).isEmpty)
    // truncation mid-segment rejects
    assert(ImageHeader.decode(jpg.take(jpg.length - 3)).isEmpty)
  }

  test("GIF decode: block-introducer check closes the text false-positive window") {
    import graft.operators.ImageHeader
    val gif = ImageHeader.encodeGif(64, 32, bpp = 2)
    assert(ImageHeader.decode(gif).contains(ImageHeader.ImgMeta("gif", 64, 32, 2)))
    // a text payload dressed as a GIF: magic + plausible LSD + arbitrary
    // prose + ';' — rejected because the byte after the declared color
    // table is not a legal block introducer (0x2C / 0x21 / 0x3B)
    val prose = "GIF89a here is some ordinary document text that ends with ;"
      .getBytes("US-ASCII")
    // force a plausible LSD on top of the prose: positive dims, GCT
    // flag set with a small table so offset 13+gct lands inside prose
    prose(6) = 1; prose(7) = 0; prose(8) = 1; prose(9) = 0 // 1x1
    prose(10) = 0x80.toByte // GCT present, bpp 1 -> 6-byte table
    assert(ImageHeader.decode(prose).isEmpty)
    // but an extension block (0x21) after the table is legal
    val withExt = gif.dropRight(1) ++ Array(0x21.toByte, 0xfe.toByte, 0x00.toByte, 0x3b.toByte)
    assert(ImageHeader.decode(withExt).contains(ImageHeader.ImgMeta("gif", 64, 32, 2)))
    // missing trailer rejects
    assert(ImageHeader.decode(gif.dropRight(1)).isEmpty)
  }

  test("block sampling bounds output size") {
    val m = Multimodal.asMediaFrame(docs.filter(col("doc_id") === 1), "doc_id", "text", "source")
    val b = Multimodal.sampleBlocks(m, blockSize = 4, every = 2).select("blocks").head()
    val blocks = b.getSeq[Array[Byte]](0)
    assert(blocks.nonEmpty)
    assert(blocks.forall(_.length <= 4))
  }

  test("q219 audio fingerprint census equals a pure-arithmetic recompute, corrupt rows excluded") {
    def v16(bits: Long, f: Long): Long = {
      val r = f % 251
      if (bits == 8) (r - 128) * 256
      else if (r >= 128) r * 257 - 65536
      else r * 257
    }
    def fp(id: Long): Long = {
      val bits = 8 * (id % 4 + 1); val fr = id % 200 + 1
      (0 until 32).foldLeft(0L) { (acc, t) =>
        if (v16(bits, (t + 1) * fr / 33) > v16(bits, t * fr / 33))
          acc | (1L << t)
        else acc
      }
    }
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.filter(_ % 7 != 3).groupBy(fp).collect {
      case (h, members) if members.length >= 2 =>
        h -> ((members.length.toLong, members.min, members.max))
    }.toMap
    val rows = SparkEntry.all.find(_.name == "q219_audio_fingerprint").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == expected, "fingerprint census diverges from the arithmetic recompute")
    assert(rows.nonEmpty, "fixture must produce at least one collision class")
    // corrupt clips must be absent: no class may account for an id%7==3 doc
    assert(rows.values.map(_._1).sum <= ids.count(_ % 7 != 3).toLong)
  }

  test("q215 dHash census equals a pure-arithmetic recompute (no decoder involved)") {
    // recompute each doc's dHash straight from the fixture formula —
    // independent of ImagePixels, so a decode/resize/packing bug on
    // EITHER side of the real pipeline surfaces as a mismatch
    def dhash(id: Long): (Long, Long) = {
      val w = (id % 32 + 1).toInt; val h = (id % 24 + 1).toInt
      def gray(sx: Int, sy: Int): Long = {
        val b = 7 * id + 5 * sx + 3 * sy
        (b % 256 + (b + 11) % 256 + (b + 22) % 256) / 3
      }
      var hi = 0L; var lo = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = y * h / 8
        if (gray((x + 1) * w / 9, sy) > gray(x * w / 9, sy)) {
          if (y < 4) hi |= 1L << (y * 8 + x) else lo |= 1L << ((y - 4) * 8 + x)
        }
      }
      (hi, lo)
    }
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.groupBy(dhash).collect {
      case ((hi, lo), members) if members.length >= 2 =>
        (hi, lo) -> ((members.length.toLong, members.min, members.max))
    }.toMap
    val rows = SparkEntry.all.find(_.name == "q215_image_dhash").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows == expected, "dHash census diverges from the arithmetic recompute")
    assert(rows.nonEmpty, "fixture must produce at least one collision class")
  }

  test("q226 video fingerprint census equals a pure-arithmetic recompute; shift-invariant") {
    // recompute straight from the fixture formula — independent of
    // VideoHeader's table decode, so a span-walk or packing bug on
    // either side surfaces as a mismatch. The brightness shift term
    // (doc_id % 64) is DELIBERATELY left out of the energies: equal
    // frame sizes make deltas shift-invariant, so the fingerprints
    // must agree anyway — that IS the perceptual-invariance claim.
    def fp(id: Long): Long = {
      val cls = (id % 12).toInt
      val sz = 64 + (cls % 5) * 16
      val energies = (0 until 8).map { k =>
        val i = 3 * k
        (0 until sz).map(j => ((cls * 17 + 5 * i * i + 3 * j) % 128).toLong).sum
      }
      (1 until 8).foldLeft(0L) { (acc, k) =>
        if (energies(k) > energies(k - 1)) acc | (1L << (k - 1)) else acc
      }
    }
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.filter(_ % 7 != 3).groupBy(fp).collect {
      case (h, members) if members.length >= 2 =>
        h -> ((members.length.toLong, members.min, members.max))
    }.toMap
    val rows = SparkEntry.all.find(_.name == "q226_video_fingerprint").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows == expected,
      "video fingerprint census diverges from the arithmetic recompute")
    assert(rows.nonEmpty, "fixture must produce at least one collision class")
    // corrupt videos must be absent from every class
    assert(rows.values.map(_._1).sum <= ids.count(_ % 7 != 3).toLong)
  }

  test("q241 GIF animation census equals the arithmetic replay; walk is strict") {
    val ids = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.filter(_ % 7 != 3).map { id =>
      val n = id % 10 + 1
      val total = (0L until n).map(i => 4 + (id + i) % 6).sum
      id -> ((n, total, id % 4, 1000L * total / n))
    }.toMap
    val rows = SparkEntry.all.find(_.name == "q241_gif_animation").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(rows == expected, "animation census diverges from the replay")

    // unit strictness: the static (frame-less) GIF walks to zero frames
    // with no loop extension; a corrupted GCE size byte rejects even
    // though the header-level decode still accepts the file
    val still = graft.operators.ImageHeader.encodeGif(8, 8, 2)
    assert(graft.operators.ImageHeader.decodeGifAnimation(still)
      .contains(graft.operators.ImageHeader.GifAnim(8, 8, 0, 0, None)))
    val anim = graft.operators.ImageHeader.encodeAnimatedGif(
      8, 8, 2, Seq((7, Array.fill(300)(1.toByte))), 3)
    val walked = graft.operators.ImageHeader.decodeGifAnimation(anim).get
    assert(walked == graft.operators.ImageHeader.GifAnim(8, 8, 1, 7, Some(3)))
    val broken = anim.clone()
    broken(13 + 12 + 19 + 2) = 5.toByte // GCE size 4 -> 5
    assert(graft.operators.ImageHeader.decodeGif(broken).nonEmpty,
      "header-level decode must still accept — only the walk can catch this")
    assert(graft.operators.ImageHeader.decodeGifAnimation(broken).isEmpty,
      "the strict walk must reject a malformed GCE size")
  }
}
