package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioHeader, ImageHeader, VideoHeader}

/** Strict MP4 (ISO BMFF) codec properties: exact roundtrip over the
  * parameter grid, and no-false-positive rejection of truncations,
  * corruptions and lookalike payloads — the family discipline shared
  * with ImageHeader and AudioHeader.
  */
class VideoHeaderSpec extends AnyFunSuite {

  test("encode/decode roundtrip across the parameter grid") {
    for {
      tscale <- Seq(1L, 1000L, 90000L, 0xfffffffeL)
      dur <- Seq(0L, 1L, 123456L)
      nTracks <- Seq(1, 2, 3)
      mdat <- Seq(0, 17, 255)
    } {
      val tracks = (1 to nTracks).map(i => (320 * i, 240 * i))
      val bytes = VideoHeader.encodeMp4("isom", tscale, dur, tracks, mdat)
      assert(bytes.length == 24 + 8 + 108 + 100 * nTracks + 8 + mdat)
      val m = VideoHeader.decodeMp4(bytes)
        .getOrElse(fail(s"no decode for ts=$tscale dur=$dur tracks=$nTracks mdat=$mdat"))
      assert(m.format == "mp4" && m.brand == "isom")
      assert(m.timescale == tscale && m.nTracks == nTracks)
      assert(m.width == 320 && m.height == 240) // first track's dimensions
      assert(m.durationUs == dur * 1000000L / tscale)
    }
  }

  test("every prefix truncation is rejected (except the legal post-moov boundary)") {
    val bytes = VideoHeader.encodeMp4("mp42", 1000L, 5000L, Seq((640, 480)), 9)
    // ftyp(24) + moov(216): a prefix ending exactly after moov is a
    // structurally complete MP4 (mdat is optional) and must decode;
    // every other cut point rejects
    val legalBoundary = 24 + 216
    for (n <- 0 until bytes.length) {
      val d = VideoHeader.decodeMp4(bytes.take(n))
      if (n == legalBoundary) assert(d.exists(_.nTracks == 1), s"boundary at $n")
      else assert(d.isEmpty, s"truncation at $n decoded")
    }
  }

  test("strictness: corrupted sizes, versions and dimensions all reject") {
    val good = VideoHeader.encodeMp4("isom", 1000L, 5000L, Seq((640, 480)), 4)
    assert(VideoHeader.decodeMp4(good).isDefined)
    // moov size off by one
    val b1 = good.clone(); b1(27) = (b1(27) + 1).toByte
    assert(VideoHeader.decodeMp4(b1).isEmpty)
    // mvhd size off by one (first moov child at 32; its size low byte at 35)
    val b2 = good.clone(); b2(35) = (b2(35) + 1).toByte
    assert(VideoHeader.decodeMp4(b2).isEmpty)
    // mvhd version 2 is reserved
    val b3 = good.clone(); b3(40) = 2
    assert(VideoHeader.decodeMp4(b3).isEmpty)
    // fractional 16.16 width: tkhd at 32+108+8 = 148, width at 148+84
    val b4 = good.clone(); b4(148 + 84 + 3) = 1
    assert(VideoHeader.decodeMp4(b4).isEmpty)
    // first box not ftyp (flip the FourCC)
    val b5 = good.clone(); b5(4) = 'x'.toByte
    assert(VideoHeader.decodeMp4(b5).isEmpty)
    // trailing garbage breaks exact tiling
    assert(VideoHeader.decodeMp4(good :+ 0.toByte).isEmpty)
    // zero timescale cannot decode: rebuild by patching mvhd timescale
    // (mvhd at 32; timescale at 32+20)
    val b6 = good.clone()
    b6(52) = 0; b6(53) = 0; b6(54) = 0; b6(55) = 0
    assert(VideoHeader.decodeMp4(b6).isEmpty)
  }

  test("lookalike and cross-modality payloads do not decode as MP4") {
    assert(VideoHeader.decodeMp4("....ftyp but not a real iso bmff file at all....".getBytes).isEmpty)
    assert(VideoHeader.decodeMp4(AudioHeader.encodeWav(1, 8000, 16, 100)).isEmpty)
    assert(VideoHeader.decodeMp4(AudioHeader.encodeOgg(2, 44100, 100L)).isEmpty)
    assert(VideoHeader.decodeMp4(ImageHeader.encodePng(10, 10, 8, 2)).isEmpty)
    assert(VideoHeader.decodeMp4(null).isEmpty)
    assert(VideoHeader.decodeMp4(Array.empty[Byte]).isEmpty)
  }

  test("sample table: encode/decode roundtrip, tkhd decode unaffected") {
    for {
      nRuns <- Seq(1, 2, 4)
      n <- Seq(1, 7, 60)
      if n >= nRuns
    } {
      val runs = (0 until nRuns).map(r => ((n / nRuns + (if (r == 0) n % nRuns else 0)).toLong, 100L + r * 50))
      val sizes = (0 until n).map(i => 80L + i % 37)
      val bytes = VideoHeader.encodeMp4("isom", 90000L, 1000L, Seq((640, 360), (320, 180)),
        sizes.sum.toInt, Some((30000L, runs, sizes)))
      // plain header decode still works and sees both tracks
      val m = VideoHeader.decodeMp4(bytes).getOrElse(fail(s"no mp4 decode n=$n runs=$nRuns"))
      assert(m.nTracks == 2 && m.width == 640)
      val st = VideoHeader.decodeSampleTable(bytes).getOrElse(fail(s"no stbl n=$n runs=$nRuns"))
      assert(st.mediaTimescale == 30000L)
      assert(st.sttsRuns == runs && st.sampleSizes == sizes)
      // the chunk offset is exactly where the mdat payload begins
      assert(st.chunkOffset == bytes.length - sizes.sum)
    }
  }

  test("sample table: strict validation rejects inconsistent tables") {
    val runs = Seq((5L, 100L))
    val sizes = (0 until 5).map(i => 100L + i)
    def enc() = VideoHeader.encodeMp4("isom", 90000L, 1000L, Seq((640, 360)),
      sizes.sum.toInt, Some((30000L, runs, sizes)))
    val good = enc()
    assert(VideoHeader.decodeSampleTable(good).isDefined)
    // no sample table at all -> None (but still a valid mp4)
    val plain = VideoHeader.encodeMp4("isom", 90000L, 1000L, Seq((640, 360)), 16)
    assert(VideoHeader.decodeMp4(plain).isDefined)
    assert(VideoHeader.decodeSampleTable(plain).isEmpty)
    // stco pointing past the file: framing intact, table rejected
    val badOff = enc()
    val pos = badOff.length - sizes.sum.toInt - 12
    badOff(pos) = (badOff(pos) + 1).toByte
    assert(VideoHeader.decodeMp4(badOff).isDefined, "box framing must still parse")
    assert(VideoHeader.decodeSampleTable(badOff).isEmpty)
    // stsz count disagreeing with stts totals rejects: bump the stts
    // run count (stts precedes stsz; run count is at stbl+8+16+... )
    val badCount = enc()
    // locate "stts" and corrupt its first run's count low byte
    val sttsAt = badCount.indices.find(i => i + 4 <= badCount.length - 4 &&
      new String(badCount, i, 4, "US-ASCII") == "stts").get
    badCount(sttsAt + 15) = (badCount(sttsAt + 15) + 1).toByte
    assert(VideoHeader.decodeSampleTable(badCount).isEmpty)
  }
}
