package graft.operators

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Pure byte-level image-header codec for the multimodal tier: parse
  * (and, for test fixtures, emit) the four most common public image
  * container formats — PNG (IHDR chunk), BMP (BITMAPINFOHEADER),
  * JPEG (JFIF/EXIF marker walk to SOF0/1/2) and GIF (87a/89a logical
  * screen descriptor) — with no codec library dependency. This replaces
  * the acknowledged decode STUB: real byte-format parsing runs inside
  * the batched mapPartitions stage (Multimodal.decodeImageMeta), so the
  * binary-column path is exercised end-to-end.
  *
  * Spec sources (public): PNG — RFC 2083 / W3C PNG spec (8-byte
  * signature, IHDR layout, CRC-32 over chunk type+data); BMP — the
  * Windows BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (>= 40 bytes)
  * layout, little-endian; JPEG — ITU T.81 marker/segment syntax with
  * the frame header (precision, lines, samples-per-line, components)
  * in SOF0/SOF1/SOF2; GIF — the GIF89a specification's header +
  * logical screen descriptor.
  *
  * Detection is STRICT on purpose: PNG verifies the full 8-byte
  * signature, the IHDR length/type fields, the spec's legal
  * depth-per-color-type table AND the IHDR CRC-32; BMP verifies the
  * "BM" magic, the declared file size against the actual byte count,
  * planes == 1 and a legal bit count; JPEG walks every marker segment
  * checking lengths against the buffer until SOS/EOI; GIF re-derives
  * the color-table size from the packed flags and checks it against
  * the actual byte count plus the 0x3B trailer. Arbitrary text/binary
  * payloads (e.g. the documents table's UTF-8 text) can therefore never
  * false-positive as an image — `decode` returns None and the caller
  * records format "unknown".
  */
object ImageHeader {

  /** Decoded header facts: `bitsPerPixel` is depth x channels for PNG,
    * the biBitCount field for BMP. */
  final case class ImgMeta(format: String, width: Long, height: Long, bitsPerPixel: Long)

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def leInt(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  /** PNG color type -> channel count (spec table: 0 grayscale, 2
    * truecolor, 3 palette index, 4 gray+alpha, 6 truecolor+alpha). */
  private val PngChannels = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)

  /** PNG spec's legal bit depths PER color type (IHDR table): grayscale
    * any of 1/2/4/8/16, palette up to 8, every other type 8 or 16.
    * Checked in decode AND encode — a depth-3 or palette-16 header is
    * spec-invalid and must not round-trip as a valid image. */
  private val PngDepths: Map[Int, Set[Int]] = Map(
    0 -> Set(1, 2, 4, 8, 16), 2 -> Set(8, 16), 3 -> Set(1, 2, 4, 8),
    4 -> Set(8, 16), 6 -> Set(8, 16))

  def decodePng(b: Array[Byte]): Option[ImgMeta] = {
    // 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
    if (b.length < 33) return None
    if (!PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    if (beInt(b, 8) != 13L) return None // IHDR data length is fixed at 13
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val crc = new CRC32
    crc.update(b, 12, 4 + 13) // CRC covers chunk type + data
    if (crc.getValue != beInt(b, 29)) return None
    val w = beInt(b, 16); val h = beInt(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val depth = b(24) & 0xff
    val colorType = b(25) & 0xff
    if (!PngDepths.get(colorType).exists(_.contains(depth))) return None
    Some(ImgMeta("png", w, h, depth.toLong * PngChannels(colorType)))
  }

  def decodeBmp(b: Array[Byte]): Option[ImgMeta] = {
    if (b.length < 54) return None // 14 file header + 40 info header
    if (!(b(0) == 'B' && b(1) == 'M')) return None
    if (leInt(b, 2) != b.length.toLong) return None // declared size must match
    if (leInt(b, 14) < 40L) return None // BITMAPINFOHEADER or later
    if (leShort(b, 26) != 1) return None // planes
    val w = leInt(b, 18).toInt; val h = leInt(b, 22).toInt
    if (w <= 0 || h == 0) return None // negative height = top-down, legal
    val bpp = leShort(b, 28)
    if (!Set(1, 4, 8, 16, 24, 32).contains(bpp)) return None
    Some(ImgMeta("bmp", w.toLong, math.abs(h).toLong, bpp.toLong))
  }

  /** JPEG: SOI + a STRICT marker walk to a start-of-frame segment.
    * ALL of T.81's SOFn frame markers are decoded — SOF0/1/2 (the DCT
    * mainstream), SOF3 lossless, SOF5-7 differential, SOF9-11
    * arithmetic-coded, SOF13-15 differential arithmetic — because the
    * frame-header layout (precision, lines, samples-per-line,
    * component count) is identical across all of them; only DHT (C4),
    * JPG (C8) and DAC (CC) interleave in that marker range and are
    * skipped as plain segments. Every segment's declared big-endian
    * length must land inside the buffer, unknown marker bytes reject
    * the payload, and the walk must terminate at SOS or EOI — the same
    * whole-structure-validated discipline as the PNG CRC check, so
    * arbitrary bytes that happen to start FF D8 cannot false-positive.
    * Precision limits per T.81: lossless frames allow 2..16 bits,
    * DCT-based frames 8/12 (16 also accepted, matching the fixture
    * encoder's lenience). bitsPerPixel = precision x components. */
  def decodeJpeg(b: Array[Byte]): Option[ImgMeta] = {
    if (b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None // SOI
    var off = 2
    var meta: Option[ImgMeta] = None
    while (off + 1 < b.length) {
      if ((b(off) & 0xff) != 0xff) return None // every segment starts FF
      var mOff = off + 1
      while (mOff < b.length && (b(mOff) & 0xff) == 0xff) mOff += 1 // fill bytes
      if (mOff >= b.length) return None
      val marker = b(mOff) & 0xff
      marker match {
        case 0xd9 => // EOI: structurally complete
          return meta
        case 0xda => // SOS: entropy-coded data follows; header walk done
          return meta
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => // standalone
          off = mOff + 1
        case 0xd8 => return None // a second SOI is malformed
        case m if m >= 0xc0 && m <= 0xfe =>
          if (mOff + 2 >= b.length) return None
          val len = ((b(mOff + 1) & 0xff) << 8) | (b(mOff + 2) & 0xff)
          if (len < 2 || mOff + 1 + len > b.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) { // any SOFn frame header (layout identical across n)
            val isLossless = m == 0xc3 || m == 0xc7 || m == 0xcb || m == 0xcf
            val p = mOff + 3
            if (len < 8) return None
            val precision = b(p) & 0xff
            val h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            val w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            val ncomp = b(p + 5) & 0xff
            val precisionOk =
              if (isLossless) precision >= 2 && precision <= 16
              else Set(8, 12, 16).contains(precision)
            if (!precisionOk) return None
            if (w <= 0 || h <= 0) return None
            if (ncomp < 1 || ncomp > 4) return None
            if (len != 8 + 3 * ncomp) return None // component specs must fit exactly
            if (meta.isDefined) return None // two frame headers = malformed
            meta = Some(ImgMeta("jpeg", w.toLong, h.toLong, precision.toLong * ncomp))
          }
          off = mOff + 1 + len
        case _ => return None // not a JPEG marker
      }
    }
    None // ran off the end without EOI/SOS: truncated
  }

  /** GIF: GIF87a/GIF89a magic + logical screen descriptor, with the
    * declared structure checked against the actual byte count — if the
    * global-color-table flag is set, the 3*2^(n+1)-byte table must be
    * present, the byte immediately AFTER the color table must be one of
    * the spec's three legal block introducers (0x2C image descriptor,
    * 0x21 extension, 0x3B trailer — anything else means the "color
    * table" was arbitrary payload bytes, so reject), and the file must
    * end with the 0x3B trailer.
    * bitsPerPixel = the GCT size exponent + 1 (entries = 2^bpp). */
  def decodeGif(b: Array[Byte]): Option[ImgMeta] = {
    if (b.length < 14) return None // 6 magic + 7 LSD + 1 trailer
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val w = leShort(b, 6); val h = leShort(b, 8)
    if (w <= 0 || h <= 0) return None
    val packed = b(10) & 0xff
    val gctFlag = (packed & 0x80) != 0
    val bpp = (packed & 0x07) + 1
    val gctBytes = if (gctFlag) 3 * (1 << bpp) else 0
    if (b.length < 13 + gctBytes + 1) return None
    val introducer = b(13 + gctBytes) & 0xff
    if (introducer != 0x2c && introducer != 0x21 && introducer != 0x3b) return None
    if ((b(b.length - 1) & 0xff) != 0x3b) return None // trailer
    Some(ImgMeta("gif", w.toLong, h.toLong, bpp.toLong))
  }

  /** Try every known format; None = not a recognized image. */
  def decode(b: Array[Byte]): Option[ImgMeta] =
    if (b == null) None
    else decodePng(b).orElse(decodeBmp(b)).orElse(decodeJpeg(b)).orElse(decodeGif(b))

  // ---- fixture encoders (used by q89's deterministic payloads and the
  // ---- codec spec; they emit structurally valid files, zero pixels)

  /** Minimal valid PNG: signature + IHDR (real CRC) + empty IDAT + IEND
    * are not needed for header decode, but the IHDR chunk is complete
    * and CRC-correct, so strict decoders of the header accept it. */
  def encodePng(width: Int, height: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(PngChannels.contains(colorType), s"bad color type $colorType")
    require(PngDepths(colorType).contains(bitDepth),
      s"bit depth $bitDepth illegal for color type $colorType")
    val data = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new CRC32
    crc.update(typeAndData)
    PngSig ++ ByteBuffer.allocate(4).putInt(13).array() ++ typeAndData ++
      ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
  }

  /** Minimal valid BMP: BITMAPFILEHEADER + BITMAPINFOHEADER + zeroed
    * pixel array (rows padded to 4 bytes, per spec), declared file size
    * == actual length so the strict decoder accepts it. */
  def encodeBmp(width: Int, height: Int, bpp: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = ((bpp * width + 31) / 32) * 4
    val pixelBytes = rowSize * height
    val fileSize = 54 + pixelBytes
    val buf = ByteBuffer.allocate(fileSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize).putShort(0).putShort(0).putInt(54) // file header
      .putInt(40).putInt(width).putInt(height) // info header
      .putShort(1).putShort(bpp.toShort)
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.array() // remaining pixel array stays zeroed
  }

  /** Minimal valid JPEG: SOI + JFIF APP0 + SOF0 frame header + EOI.
    * No scan data (no SOS/entropy segments) — the strict decoder walks
    * the marker structure to EOI and extracts dimensions from SOF0.
    * Always 41 bytes for 3 components: 2 + 18 + (2 + 17) + 2. */
  def encodeJpeg(width: Int, height: Int, precision: Int = 8, components: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(Set(8, 12, 16).contains(precision), s"bad precision $precision")
    require(components >= 1 && components <= 4, s"bad component count $components")
    val sofLen = 8 + 3 * components
    val buf = ByteBuffer.allocate(2 + 18 + 2 + sofLen + 2) // big-endian by default
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte) // identifier
      .put(1.toByte).put(1.toByte) // version 1.1
      .put(0.toByte).putShort(1).putShort(1) // no units, 1x1 density
      .put(0.toByte).put(0.toByte) // no thumbnail
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(sofLen.toShort) // SOF0
      .put(precision.toByte).putShort(height.toShort).putShort(width.toShort)
      .put(components.toByte)
    (1 to components).foreach { id =>
      buf.put(id.toByte).put(0x11.toByte).put(0.toByte) // comp id, 1x1 sampling, qtable 0
    }
    buf.put(0xff.toByte).put(0xd9.toByte) // EOI
    buf.array()
  }

  /** Animated-GIF facts a strict block walk yields without touching
    * LZW: frame count, total display time (centiseconds, summed from
    * each frame's Graphic Control Extension) and the NETSCAPE2.0 loop
    * count (None = no application extension = play once). */
  final case class GifAnim(width: Long, height: Long, nFrames: Long,
      totalDelayCs: Long, loopCount: Option[Long])

  /** Strict GIF89a ANIMATION walk (the 89a spec §23-§26 block
    * grammar): after the logical screen descriptor + global color
    * table, the stream must be a sequence of extension blocks (0x21:
    * label, then length-prefixed sub-blocks to a 0 terminator — the
    * Graphic Control Extension's 4-byte block carries the delay that
    * applies to the NEXT image; the NETSCAPE2.0 application extension
    * carries the loop count) and image descriptors (0x2C: 9-byte
    * descriptor, optional local color table, LZW minimum-code byte,
    * data sub-blocks to 0), ending at the 0x3B trailer which must be
    * the LAST byte. Any overrun, unknown introducer, malformed GCE
    * size or bytes after the trailer rejects the whole payload —
    * the q89/q94/q133 strictness discipline. */
  def decodeGifAnimation(b: Array[Byte]): Option[GifAnim] = {
    val meta = decodeGif(b).getOrElse(return None)
    val packed = b(10) & 0xff
    val gctBytes = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 0x07) + 1)) else 0
    var p = 13 + gctBytes
    var frames = 0L
    var totalDelay = 0L
    var pendingDelay = 0L
    var loop: Option[Long] = None
    def u(i: Int): Int = { if (i >= b.length) return -1; b(i) & 0xff }
    while (p < b.length) {
      u(p) match {
        case 0x3b =>
          return if (p == b.length - 1)
            Some(GifAnim(meta.width, meta.height, frames, totalDelay, loop))
          else None // bytes after the trailer: reject
        case 0x21 =>
          val label = u(p + 1)
          if (label < 0) return None
          var q = p + 2
          var first = true
          var appIsNetscape = false
          while (u(q) != 0) {
            val len = u(q)
            if (len < 0 || q + 1 + len >= b.length) return None
            if (first && label == 0xf9) {
              if (len != 4) return None // GCE block size is fixed
              pendingDelay = u(q + 2) | (u(q + 3) << 8)
            }
            if (first && label == 0xff)
              appIsNetscape = len == 11 &&
                new String(b, q + 1, 11, "US-ASCII") == "NETSCAPE2.0"
            if (!first && appIsNetscape && len == 3 && u(q + 1) == 1)
              loop = Some((u(q + 2) | (u(q + 3) << 8)).toLong)
            first = false
            q += 1 + len
          }
          p = q + 1
        case 0x2c =>
          if (p + 10 >= b.length) return None
          val ipacked = u(p + 9)
          val lctBytes =
            if ((ipacked & 0x80) != 0) 3 * (1 << ((ipacked & 0x07) + 1)) else 0
          var q = p + 10 + lctBytes + 1 // descriptor + LCT + LZW min code
          if (q > b.length) return None
          while (u(q) != 0) {
            val len = u(q)
            if (len < 0 || q + 1 + len >= b.length) return None
            q += 1 + len
          }
          frames += 1
          totalDelay += pendingDelay
          pendingDelay = 0L
          p = q + 1
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Animated GIF89a fixture: header + LSD + zeroed GCT + NETSCAPE2.0
    * loop extension + per frame (GCE with its delay, full-size image
    * descriptor, LZW min-code byte, the payload split into ≤255-byte
    * sub-blocks) + trailer. Structurally valid for
    * [[decodeGifAnimation]]'s strict walk; pixel data is arbitrary
    * bytes (the walk never inflates LZW, exactly like a real frame
    * INDEXER that only needs offsets and timing). */
  def encodeAnimatedGif(width: Int, height: Int, bpp: Int,
      frames: Seq[(Int, Array[Byte])], loopCount: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(bpp >= 1 && bpp <= 8, s"bad bpp $bpp")
    require(frames.nonEmpty, "an animation needs at least one frame")
    require(loopCount >= 0 && loopCount <= 0xffff, s"bad loop $loopCount")
    val gctBytes = 3 * (1 << bpp)
    def subBlockLen(n: Int) = n + (n + 254) / 255 + 1 // len bytes + terminator
    val total = 13 + gctBytes + 19 +
      frames.map { case (_, d) => 8 + 10 + 1 + subBlockLen(d.length) }.sum + 1
    val buf = ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(width.toShort).putShort(height.toShort)
    buf.put((0x80 | (bpp - 1)).toByte)
    buf.put(0.toByte).put(0.toByte)
    buf.position(buf.position() + gctBytes) // zeroed GCT
    // NETSCAPE2.0 application extension: 19 bytes
    buf.put(0x21.toByte).put(0xff.toByte).put(11.toByte)
    buf.put("NETSCAPE2.0".getBytes("US-ASCII"))
    buf.put(3.toByte).put(1.toByte).putShort(loopCount.toShort).put(0.toByte)
    frames.foreach { case (delayCs, data) =>
      require(delayCs >= 0 && delayCs <= 0xffff, s"bad delay $delayCs")
      // GCE: 8 bytes
      buf.put(0x21.toByte).put(0xf9.toByte).put(4.toByte)
      buf.put(0.toByte).putShort(delayCs.toShort).put(0.toByte).put(0.toByte)
      // image descriptor: 10 bytes, full frame, no LCT
      buf.put(0x2c.toByte)
      buf.putShort(0.toShort).putShort(0.toShort)
      buf.putShort(width.toShort).putShort(height.toShort)
      buf.put(0.toByte)
      buf.put(2.toByte) // LZW minimum code size (arbitrary, not inflated)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        buf.put(n.toByte)
        buf.put(data, off, n)
        off += n
      }
      buf.put(0.toByte) // data terminator
    }
    buf.put(0x3b.toByte)
    buf.array()
  }

  /** Minimal valid GIF89a: header + logical screen descriptor + global
    * color table (zeroed, 2^bpp entries) + trailer. Byte count is
    * 14 + 3 * 2^bpp, which the strict decoder re-derives and checks. */
  def encodeGif(width: Int, height: Int, bpp: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(bpp >= 1 && bpp <= 8, s"bad bpp $bpp")
    val gctBytes = 3 * (1 << bpp)
    val buf = ByteBuffer.allocate(13 + gctBytes + 1).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(width.toShort).putShort(height.toShort)
    buf.put((0x80 | (bpp - 1)).toByte) // GCT present, size exponent bpp-1
    buf.put(0.toByte).put(0.toByte) // background index, aspect ratio
    buf.position(buf.position() + gctBytes) // zeroed color table
    buf.put(0x3b.toByte) // trailer
    buf.array()
  }
}
