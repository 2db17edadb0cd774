package graft

import graft.operators.ImagePixels
import graft.operators.ImagePixels.Raster

/** The PNG pixel codec must invert itself under every spec filter type
  * and reject corruption — pixel-exact, no image library anywhere.
  */
class ImagePixelsSpec extends SparkSpec {

  private def pattern(w: Int, h: Int, c: Int, seed: Int): Raster = {
    val px = new Array[Byte](w * h * c)
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until c)
      px((y * w + x) * c + ch) = ((seed * 7 + x * 5 + y * 3 + ch * 11) % 256).toByte
    Raster(w, h, c, px)
  }

  test("encode/decode round-trips pixel-exactly under every filter type") {
    for (filter <- 0 to 4; channels <- Seq(3, 4)) {
      val r = pattern(13, 7, channels, seed = filter + channels)
      val decoded = ImagePixels.decodePng(ImagePixels.encodePng(r, filter))
      assert(decoded.isDefined, s"filter $filter channels $channels failed to decode")
      val d = decoded.get
      assert((d.width, d.height, d.channels) == (r.width, r.height, r.channels))
      assert(d.pixels.sameElements(r.pixels),
        s"pixels drifted under filter $filter channels $channels")
    }
  }

  test("pixel encoder output is accepted by the strict header decoder too") {
    val png = ImagePixels.encodePng(pattern(5, 4, 3, 1))
    assert(graft.operators.ImageHeader.decodePng(png)
      .contains(graft.operators.ImageHeader.ImgMeta("png", 5, 4, 24)))
  }

  test("nearest-neighbor resize samples exactly in(x*w div w2, y*h div h2)") {
    val r = pattern(10, 6, 3, 2)
    val out = ImagePixels.resizeNearest(r, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * 10 / 4; val sy = y * 6 / 4
      assert(out.pixels((y * 4 + x) * 3 + c) == r.pixels((sy * 10 + sx) * 3 + c))
    }
    // upscale works too
    val up = ImagePixels.resizeNearest(r, 20, 12)
    assert(up.width == 20 && up.height == 12)
    assert(up.pixels((0 * 20 + 0) * 3) == r.pixels(0))
  }

  test("bilinear resize: identity, constants, and the exact fixed-point blend") {
    // identity: w2 == w, h2 == h makes every fraction 0 — must be the source
    val r = pattern(9, 7, 3, 5)
    assert(ImagePixels.resizeBilinear(r, 9, 7).pixels.sameElements(r.pixels))
    // a constant image stays constant at any size (weights sum to the denominator)
    val const = Raster(5, 4, 4, Array.fill(5 * 4 * 4)(173.toByte))
    for ((w2, h2) <- Seq((1, 1), (3, 9), (16, 16)))
      assert(ImagePixels.resizeBilinear(const, w2, h2).pixels.forall(_ == 173.toByte))
    // exact blend vs an independent recompute of the documented formula
    for ((w, h, w2, h2, seed) <- Seq((10, 6, 4, 4, 2), (3, 3, 16, 16, 9), (1, 1, 5, 5, 3), (32, 24, 16, 16, 7))) {
      val src = pattern(w, h, 3, seed)
      val out = ImagePixels.resizeBilinear(src, w2, h2)
      def p(x: Int, y: Int, c: Int) = src.pixels((y * w + x) * 3 + c) & 0xff
      for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3) {
        val tx = math.max((2 * x + 1) * w - w2, 0)
        val ty = math.max((2 * y + 1) * h - h2, 0)
        val x0 = tx / (2 * w2); val fx = tx % (2 * w2); val x1 = math.min(x0 + 1, w - 1)
        val y0 = ty / (2 * h2); val fy = ty % (2 * h2); val y1 = math.min(y0 + 1, h - 1)
        val dX = 2 * w2; val dY = 2 * h2
        val want = ((dY - fy).toLong * ((dX - fx).toLong * p(x0, y0, c) + fx.toLong * p(x1, y0, c)) +
          fy.toLong * ((dX - fx).toLong * p(x0, y1, c) + fx.toLong * p(x1, y1, c))) / (dX.toLong * dY)
        assert((out.pixels((y * w2 + x) * 3 + c) & 0xff) == want.toInt,
          s"($w,$h)->($w2,$h2) pixel ($x,$y,$c)")
      }
    }
    // downscale of a linear ramp averages instead of dropping pixels:
    // 4x1 ramp [0,60,120,180] -> 2x1 bilinear: centers land at source
    // 0.5 and 2.5, so (0+60)/2=30 and (120+180)/2=150 — where nearest
    // would pick [0,120]
    val ramp = Raster(4, 1, 3, Array.tabulate(12)(i => ((i / 3) * 60).toByte))
    val down = ImagePixels.resizeBilinear(ramp, 2, 1)
    assert((down.pixels(0) & 0xff) == 30 && (down.pixels(3) & 0xff) == 150)
  }

  test("bicubic resize: identity, constants, exact cubic weights, clamped overshoot") {
    // identity: every fraction 0 -> weights (0, 2D^3, 0, 0) -> exact copy
    val r = pattern(9, 7, 3, 5)
    assert(ImagePixels.resizeBicubic(r, 9, 7).pixels.sameElements(r.pixels))
    // a constant image stays constant (weights sum to the denominator)
    val const = Raster(5, 4, 4, Array.fill(5 * 4 * 4)(173.toByte))
    for ((w2, h2) <- Seq((1, 1), (3, 9), (16, 16)))
      assert(ImagePixels.resizeBicubic(const, w2, h2).pixels.forall(_ == 173.toByte))
    // exact 4x4 blend vs an independent recompute of the documented formula
    for ((w, h, w2, h2, seed) <- Seq((10, 6, 4, 4, 2), (3, 3, 16, 16, 9), (1, 1, 5, 5, 3), (32, 24, 16, 16, 7))) {
      val src = pattern(w, h, 3, seed)
      val out = ImagePixels.resizeBicubic(src, w2, h2)
      def p(x: Int, y: Int, c: Int) = src.pixels((y * w + x) * 3 + c) & 0xff
      def wts(f: Long, d: Long) = Seq(
        -f * f * f + 2 * d * f * f - d * d * f,
        3 * f * f * f - 5 * d * f * f + 2 * d * d * d,
        -3 * f * f * f + 4 * d * f * f + d * d * f,
        f * f * f - d * f * f)
      val dX = 2L * w2; val dY = 2L * h2
      val den = 2 * dX * dX * dX * 2 * dY * dY * dY
      for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3) {
        val tx = math.max((2 * x + 1) * w - w2, 0)
        val ty = math.max((2 * y + 1) * h - h2, 0)
        val wx = wts(tx % dX, dX); val wy = wts(ty % dY, dY)
        assert(wx.sum == 2 * dX * dX * dX && wy.sum == 2 * dY * dY * dY, "weights must sum to 2D^3")
        val num = (for (j <- 0 to 3; i <- 0 to 3) yield {
          val xi = math.min(math.max((tx / dX).toInt - 1 + i, 0), w - 1)
          val yj = math.min(math.max((ty / dY).toInt - 1 + j, 0), h - 1)
          wy(j) * wx(i) * p(xi, yj, c)
        }).sum
        val want = math.min(255L, math.max(0L, (num + 256L * den) / den - 256L))
        assert((out.pixels((y * w2 + x) * 3 + c) & 0xff) == want.toInt,
          s"($w,$h)->($w2,$h2) pixel ($x,$y,$c)")
      }
    }
    // Catmull-Rom overshoots on a sharp edge; output must clamp, and the
    // interpolated midpoints must sharpen past bilinear's 50% blend:
    // upscaling the 1-D step [0,0,255,255] lands samples either side of
    // the edge with negative-lobe contributions
    val step = Raster(4, 1, 1, Array[Byte](0, 0, 255.toByte, 255.toByte))
    val up = ImagePixels.resizeBicubic(step, 8, 1)
    val vals = up.pixels.map(_ & 0xff)
    assert(vals.forall(v => v >= 0 && v <= 255))
    assert(vals.head == 0 && vals.last == 255)
    assert(!vals.sameElements(ImagePixels.resizeBilinear(step, 8, 1).pixels.map(_ & 0xff)),
      "bicubic must differ from bilinear on a sharp edge")
  }

  test("area resize: identity, constants, exact coverage math, true box mean") {
    // identity: every output interval covers exactly one source pixel
    val r = pattern(9, 7, 3, 5)
    assert(ImagePixels.resizeArea(r, 9, 7).pixels.sameElements(r.pixels))
    // a constant image stays constant at any size (weights sum to w*h)
    val const = Raster(5, 4, 4, Array.fill(5 * 4 * 4)(173.toByte))
    for ((w2, h2) <- Seq((1, 1), (3, 9), (16, 16), (7, 2)))
      assert(ImagePixels.resizeArea(const, w2, h2).pixels.forall(_ == 173.toByte))
    // integer-factor downscale is the plain block mean
    val blocks = Raster(4, 2, 3, Array.tabulate(24)(i => {
      val x = (i % 12) / 3; val y = i / 12
      ((y * 4 + x) * 10).toByte // pixel value = 10 * source index
    }))
    val half = ImagePixels.resizeArea(blocks, 2, 1)
    // each output = mean of a 2x2 block: {0,10,40,50}->25, {20,30,60,70}->45
    assert((half.pixels(0) & 0xff) == 25 && (half.pixels(3) & 0xff) == 45)
    // exact coverage formula vs an independent full (non-separable)
    // recompute, across down-, up-, and mixed-scale shapes
    for ((w, h, w2, h2, seed) <- Seq((10, 6, 4, 4, 2), (3, 3, 16, 16, 9),
        (1, 1, 5, 5, 3), (32, 24, 16, 16, 7), (7, 13, 16, 5, 4))) {
      val src = pattern(w, h, 3, seed)
      val out = ImagePixels.resizeArea(src, w2, h2)
      def p(x: Int, y: Int, c: Int) = src.pixels((y * w + x) * 3 + c) & 0xff
      for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3) {
        var s = 0L
        for (sy <- 0 until h; sx <- 0 until w) {
          val wx = math.max(0L, math.min((x + 1).toLong * w, (sx + 1).toLong * w2) -
            math.max(x.toLong * w, sx.toLong * w2))
          val wy = math.max(0L, math.min((y + 1).toLong * h, (sy + 1).toLong * h2) -
            math.max(y.toLong * h, sy.toLong * h2))
          s += wx * wy * p(sx, sy, c)
        }
        val want = s / (w.toLong * h)
        assert((out.pixels((y * w2 + x) * 3 + c) & 0xff) == want.toInt,
          s"($w,$h)->($w2,$h2) pixel ($x,$y,$c)")
      }
    }
    // box averaging sees ALL source pixels where bilinear samples 2x2:
    // 4x1 ramp [0,60,120,180] -> 1x1 must be the full mean 90
    val ramp = Raster(4, 1, 3, Array.tabulate(12)(i => ((i / 3) * 60).toByte))
    assert((ImagePixels.resizeArea(ramp, 1, 1).pixels(0) & 0xff) == 90)
  }

  test("resizePng round-trips through real encode/decode") {
    val r = pattern(17, 9, 4, 3)
    val resized = ImagePixels.resizePng(ImagePixels.encodePng(r, filterId = 4), 8, 8)
    assert(resized.isDefined)
    val d = ImagePixels.decodePng(resized.get).get
    assert((d.width, d.height, d.channels) == (8, 9 min 8, 4) || d.height == 8)
    val direct = ImagePixels.resizeNearest(r, 8, 8)
    assert(d.pixels.sameElements(direct.pixels),
      "decode(resizePng(...)) must equal the direct raster resize")
  }

  test("corruption and unsupported shapes decode to None, never throw") {
    val good = ImagePixels.encodePng(pattern(6, 5, 3, 4))
    // flip one byte inside IDAT -> chunk CRC mismatch
    val bad = good.clone(); bad(good.length - 20) = (bad(good.length - 20) ^ 1).toByte
    assert(ImagePixels.decodePng(bad).isEmpty)
    // truncated
    assert(ImagePixels.decodePng(good.take(good.length - 5)).isEmpty)
    // header-only fixture (no IDAT/IEND) from ImageHeader
    assert(ImagePixels.decodePng(
      graft.operators.ImageHeader.encodePng(4, 4, 8, 2)).isEmpty)
    // 16-bit depth unsupported: build via header encoder rejected above;
    // plain text rejected
    assert(ImagePixels.decodePng("not a png at all".getBytes("UTF-8")).isEmpty)
    assert(ImagePixels.decodePng(null).isEmpty)
  }
}
