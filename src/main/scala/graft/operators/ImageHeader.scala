package graft.operators

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Pure byte-level image-header codec for the multimodal tier: parse
  * (and, for test fixtures, emit) the two public uncompressed-header
  * image container formats — PNG (IHDR chunk) and BMP
  * (BITMAPINFOHEADER) — with no codec library dependency. This replaces
  * the acknowledged decode STUB: real byte-format parsing runs inside
  * the batched mapPartitions stage (Multimodal.decodeImageMeta), so the
  * binary-column path is exercised end-to-end.
  *
  * Spec sources (public): PNG — RFC 2083 / W3C PNG spec (8-byte
  * signature, IHDR layout, CRC-32 over chunk type+data); BMP — the
  * Windows BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (>= 40 bytes)
  * layout, little-endian.
  *
  * Detection is STRICT on purpose: PNG verifies the full 8-byte
  * signature, the IHDR length/type fields AND the IHDR CRC-32; BMP
  * verifies the "BM" magic, the declared file size against the actual
  * byte count, planes == 1 and a legal bit count. Arbitrary text/binary
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
    PngChannels.get(b(25) & 0xff).map(ch => ImgMeta("png", w, h, depth.toLong * ch))
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

  /** Try every known format; None = not a recognized image. */
  def decode(b: Array[Byte]): Option[ImgMeta] =
    if (b == null) None else decodePng(b).orElse(decodeBmp(b))

  // ---- fixture encoders (used by q89's deterministic payloads and the
  // ---- codec spec; they emit structurally valid files, zero pixels)

  /** Minimal valid PNG: signature + IHDR (real CRC) + empty IDAT + IEND
    * are not needed for header decode, but the IHDR chunk is complete
    * and CRC-correct, so strict decoders of the header accept it. */
  def encodePng(width: Int, height: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(PngChannels.contains(colorType), s"bad color type $colorType")
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
}
