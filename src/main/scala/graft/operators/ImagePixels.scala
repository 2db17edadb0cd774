package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec — decode, nearest-neighbor resize, re-encode —
  * with no image library: PNG's pixel payload is zlib-compressed
  * scanlines (java.util.zip.Inflater/Deflater are in the JDK) behind
  * five public-spec per-row filters. This retires the "no pixel codecs
  * in this container" limitation for PNG end to end: [[ImageHeader]]
  * parses headers, this object reconstructs (and produces) the actual
  * pixel bytes.
  *
  * Scope is the strict, verifiable core: 8-bit depth, color types 2
  * (RGB) and 6 (RGBA), non-interlaced — the overwhelmingly common
  * encoder output. Everything is validated like ImageHeader: chunk
  * CRCs, IDAT zlib integrity, exact decompressed length, legal filter
  * ids. Anything else decodes to None, never an exception — a corrupt
  * file at 100 TB must not kill the pipeline.
  *
  * Spec sources (public): W3C PNG spec — chunk layout and CRC-32;
  * §6 filters (None/Sub/Up/Average/Paeth, incl. the Paeth predictor
  * tie-break order left/above/upper-left); zlib RFC 1950.
  */
object ImagePixels {

  /** Decoded raster: interleaved rows of `channels` bytes per pixel. */
  final case class Raster(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Hard cap on any raster buffer this codec will allocate (128 MiB of
    * filtered scanlines ~ a 6600x6600 RGBA image). Headers are untrusted
    * input; every allocation below is bounded by this in Long arithmetic. */
  val MaxDecodedBytes: Long = 1L << 27

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Full pixel decode of an 8-bit RGB/RGBA non-interlaced PNG. */
  def decodePng(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 45) return None // sig + IHDR + empty IDAT + IEND
    if (!PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    var off = 8
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new ByteArrayOutputStream()
    while (off + 8 <= b.length && !seenIend) {
      val len = beInt(b, off)
      if (len < 0 || off + 12 + len > b.length) return None
      val ctype = new String(b, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue != (beInt(b, off + 8 + len).toLong & 0xffffffffL)) return None
      ctype match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          w = beInt(b, off + 8); h = beInt(b, off + 12)
          val depth = b(off + 16) & 0xff
          val colorType = b(off + 17) & 0xff
          val interlace = b(off + 20) & 0xff
          if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return None
          channels = colorType match { case 2 => 3; case 6 => 4; case _ => return None }
          // Dimensions are attacker-controlled header fields: bound the
          // decoded size in Long arithmetic BEFORE any allocation, or a
          // CRC-valid PNG declaring 2^16 x 2^16 overflows Int / OOMs.
          if (h.toLong * (1L + w.toLong * channels) > MaxDecodedBytes) return None
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(b, off + 8, len)
        case "IEND" =>
          if (len != 0) return None
          seenIend = true
        case _ => () // ancillary chunks are CRC-checked and skipped
      }
      off += 12 + len
    }
    if (!seenIhdr || !seenIend) return None
    // zlib-inflate the concatenated IDAT stream to exactly h*(1+w*c)
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val n = try inf.inflate(raw) catch { case _: Exception => return None }
    val complete = inf.finished
    inf.end()
    if (!complete || n != raw.length) return None
    // unfilter scanlines in place into the output raster
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val fid = raw(y * (1 + stride)) & 0xff
      if (fid > 4) return None
      val rowOff = y * (1 + stride) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val left = if (x >= channels) out(outOff + x - channels) & 0xff else 0
        val above = if (y > 0) out(outOff - stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= channels) out(outOff - stride + x - channels) & 0xff else 0
        val recon = fid match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + above
          case 3 => cur + (left + above) / 2
          case 4 => // Paeth predictor, spec tie-break order
            val p = left + above - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - above); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft
            cur + pred
        }
        out(outOff + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Raster(w, h, channels, out))
  }

  /** Encode a raster as a valid PNG. `filterId` selects the per-row
    * filter (0..4, default 0/None) — the decoder must invert any of
    * them, so the spec exercises every filter type through here. */
  def encodePng(r: Raster, filterId: Int = 0): Array[Byte] = {
    require(r.channels == 3 || r.channels == 4, s"channels must be 3 or 4, got ${r.channels}")
    require(filterId >= 0 && filterId <= 4, s"illegal filter $filterId")
    require(r.pixels.length == r.width * r.height * r.channels, "pixel buffer size mismatch")
    val stride = r.width * r.channels
    val raw = new Array[Byte](r.height * (1 + stride))
    var y = 0
    while (y < r.height) {
      raw(y * (1 + stride)) = filterId.toByte
      var x = 0
      while (x < stride) {
        val cur = r.pixels(y * stride + x) & 0xff
        val left = if (x >= r.channels) r.pixels(y * stride + x - r.channels) & 0xff else 0
        val above = if (y > 0) r.pixels((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= r.channels) r.pixels((y - 1) * stride + x - r.channels) & 0xff else 0
        val filtered = filterId match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - above
          case 3 => cur - (left + above) / 2
          case 4 =>
            val p = left + above - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - above); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft
            cur - pred
        }
        raw(y * (1 + stride) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val zbuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val td = ctype.getBytes("US-ASCII") ++ data
      val crc = new CRC32; crc.update(td)
      ByteBuffer.allocate(4).putInt(data.length).array() ++ td ++
        ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    }
    val colorType = if (r.channels == 3) 2 else 6
    val ihdr = ByteBuffer.allocate(13)
      .putInt(r.width).putInt(r.height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** Nearest-neighbor resize: out(x,y) = in(x*w div w2, y*h div h2) —
    * integer source indexing, so both the operator and an oracle can
    * reproduce every sampled pixel exactly. */
  def resizeNearest(r: Raster, w2: Int, h2: Int): Raster = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    require(w2.toLong * h2 * r.channels <= MaxDecodedBytes, s"target ${w2}x$h2 exceeds buffer cap")
    val out = new Array[Byte](w2 * h2 * r.channels)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * r.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * r.width / w2).toInt
        var c = 0
        while (c < r.channels) {
          out((y * w2 + x) * r.channels + c) =
            r.pixels((sy * r.width + sx) * r.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(w2, h2, r.channels, out)
  }

  /** Bilinear resize in EXACT fixed-point arithmetic, so both the
    * operator and an oracle reproduce every output pixel bit-for-bit:
    * the source coordinate of output x is the rational
    * ((2x+1)*w - w2) / (2*w2) (the half-pixel-center convention,
    * clamped at 0), split into integer part x0 and numerator fraction
    * fx over denominator 2*w2; the 2x2 neighborhood then blends as
    *   ((D_y-fy)*((D_x-fx)*p00 + fx*p01) + fy*((D_x-fx)*p10 + fx*p11))
    *     floor-div (D_x*D_y)
    * — all integers, no float rounding to diverge between engines.
    * Training-image pipelines default to bilinear; nearest stays the
    * cheap option. */
  def resizeBilinear(r: Raster, w2: Int, h2: Int): Raster = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    require(w2.toLong * h2 * r.channels <= MaxDecodedBytes, s"target ${w2}x$h2 exceeds buffer cap")
    val dX = 2 * w2
    val dY = 2 * h2
    val den = dX.toLong * dY
    val out = new Array[Byte](w2 * h2 * r.channels)
    var y = 0
    while (y < h2) {
      var tY = (2 * y + 1) * r.height - h2
      if (tY < 0) tY = 0
      val y0 = tY / dY; val fy = tY % dY
      val y1 = math.min(y0 + 1, r.height - 1)
      var x = 0
      while (x < w2) {
        var tX = (2 * x + 1) * r.width - w2
        if (tX < 0) tX = 0
        val x0 = tX / dX; val fx = tX % dX
        val x1 = math.min(x0 + 1, r.width - 1)
        var c = 0
        while (c < r.channels) {
          val p00 = r.pixels((y0 * r.width + x0) * r.channels + c) & 0xff
          val p01 = r.pixels((y0 * r.width + x1) * r.channels + c) & 0xff
          val p10 = r.pixels((y1 * r.width + x0) * r.channels + c) & 0xff
          val p11 = r.pixels((y1 * r.width + x1) * r.channels + c) & 0xff
          val v = ((dY - fy).toLong * ((dX - fx).toLong * p00 + fx.toLong * p01) +
            fy.toLong * ((dX - fx).toLong * p10 + fx.toLong * p11)) / den
          out((y * w2 + x) * r.channels + c) = v.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(w2, h2, r.channels, out)
  }

  /** Bicubic (Catmull-Rom) resize in EXACT fixed-point arithmetic —
    * the high-quality kernel of the classic resampler family (nearest /
    * bilinear / area / bicubic), bit-reproducible by an oracle because
    * Catmull-Rom's coefficients are rational with denominator 2: at
    * fractional position t = fx/D (D = 2*w2, the same half-pixel
    * convention as bilinear), the four tap weights scaled by 2D³ are
    * the INTEGER cubics
    *   W0 = -fx³ + 2D·fx² - D²·fx      W1 = 3fx³ - (5D)·fx² + 2D³
    *   W2 = -3fx³ + (4D)·fx² + D²·fx   W3 = fx³ - D·fx²
    * (they sum to 2D³ for every fx). The output pixel is the separable
    *   floor( (Σ_j WY_j · Σ_i WX_i · p(x_i, y_j) + 256·DEN) / DEN ) - 256
    * clamped to [0,255], DEN = 2Dx³·2Dy³ — the +256·DEN bias keeps the
    * numerator positive so floor division is identical in every engine
    * (negative-lobe overshoot is bounded well inside ±256), and taps
    * replicate the border (index clamp), the standard edge rule. */
  def resizeBicubic(r: Raster, w2: Int, h2: Int): Raster = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    require(w2.toLong * h2 * r.channels <= MaxDecodedBytes, s"target ${w2}x$h2 exceeds buffer cap")
    val dX = 2 * w2
    val dY = 2 * h2
    val denX = 2L * dX * dX * dX
    val denY = 2L * dY * dY * dY
    val den = denX * denY
    def weights(f: Long, d: Long): Array[Long] = {
      val f2 = f * f; val f3 = f2 * f
      Array(
        -f3 + 2 * d * f2 - d * d * f,
        3 * f3 - 5 * d * f2 + 2 * d * d * d,
        -3 * f3 + 4 * d * f2 + d * d * f,
        f3 - d * f2)
    }
    val out = new Array[Byte](w2 * h2 * r.channels)
    var y = 0
    while (y < h2) {
      var tY = (2 * y + 1) * r.height - h2
      if (tY < 0) tY = 0
      val y0 = tY / dY
      val wy = weights(tY % dY, dY)
      var x = 0
      while (x < w2) {
        var tX = (2 * x + 1) * r.width - w2
        if (tX < 0) tX = 0
        val x0 = tX / dX
        val wx = weights(tX % dX, dX)
        var c = 0
        while (c < r.channels) {
          var num = 0L
          var j = 0
          while (j < 4) {
            val yj = math.min(math.max(y0 - 1 + j, 0), r.height - 1)
            var rowSum = 0L
            var i = 0
            while (i < 4) {
              val xi = math.min(math.max(x0 - 1 + i, 0), r.width - 1)
              rowSum += wx(i) * (r.pixels((yj * r.width + xi) * r.channels + c) & 0xff)
              i += 1
            }
            num += wy(j) * rowSum
            j += 1
          }
          val v = (num + 256L * den) / den - 256L
          out((y * w2 + x) * r.channels + c) =
            math.min(255L, math.max(0L, v)).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(w2, h2, r.channels, out)
  }

  /** Area-average (box-filter) resize in EXACT integer arithmetic —
    * the anti-aliasing downsample kernel (the INTER_AREA class)
    * training-image pipelines use for thumbnails, here defined for any
    * scale: output pixel x covers the source interval [x*w/w2,
    * (x+1)*w/w2); scaled by w2 per axis, the overlap of output x with
    * source column sx is the integer
    *   wx(sx) = max(0, min((x+1)*w, (sx+1)*w2) - max(x*w, sx*w2))
    * (and wy likewise), the per-axis weights sum to w (resp. h), and
    *   out(x,y,c) = floor( sum_{sx,sy} wx*wy*p(sx,sy,c) / (w*h) )
    * — all integers, bit-reproducible by an oracle from first
    * principles. Downscales average full coverage; upscales degrade to
    * sub-pixel coverage of one or two source pixels, still exact. */
  def resizeArea(r: Raster, w2: Int, h2: Int): Raster = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    require(w2.toLong * h2 * r.channels <= MaxDecodedBytes, s"target ${w2}x$h2 exceeds buffer cap")
    val w = r.width.toLong
    val h = r.height.toLong
    val den = w * h
    val out = new Array[Byte](w2 * h2 * r.channels)
    var y = 0
    while (y < h2) {
      val yLo = y * h; val yHi = (y + 1) * h // output row's interval, scaled by h2
      val sy0 = (yLo / h2).toInt
      val sy1 = ((yHi + h2 - 1) / h2).toInt // exclusive
      var x = 0
      while (x < w2) {
        val xLo = x * w; val xHi = (x + 1) * w
        val sx0 = (xLo / w2).toInt
        val sx1 = ((xHi + w2 - 1) / w2).toInt
        var c = 0
        while (c < r.channels) {
          var s = 0L
          var sy = sy0
          while (sy < sy1) {
            val wy = math.min(yHi, (sy + 1).toLong * h2) - math.max(yLo, sy.toLong * h2)
            var sx = sx0
            while (sx < sx1) {
              val wx = math.min(xHi, (sx + 1).toLong * w2) - math.max(xLo, sx.toLong * w2)
              s += wx * wy * (r.pixels((sy * r.width + sx) * r.channels + c) & 0xff)
              sx += 1
            }
            sy += 1
          }
          out((y * w2 + x) * r.channels + c) = (s / den).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Raster(w2, h2, r.channels, out)
  }

  /** Decode → resize → re-encode: the real thumbnail/preprocess kernel.
    * None when the payload isn't a decodable 8-bit RGB(A) PNG.
    * `kernel` selects the resampler: "nearest" (default), "bilinear"
    * or "area". */
  def resizePng(bytes: Array[Byte], w2: Int, h2: Int,
      kernel: String = "nearest"): Option[Array[Byte]] = {
    val resample: (Raster, Int, Int) => Raster = kernel match {
      case "nearest"  => resizeNearest
      case "bilinear" => resizeBilinear
      case "area"     => resizeArea
      case "bicubic"  => resizeBicubic
      case other      => throw new IllegalArgumentException(s"unknown kernel $other")
    }
    decodePng(bytes).map(r => encodePng(resample(r, w2, h2)))
  }
}
