package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AudioHeader

/** Strict WAV codec properties: exact roundtrip over the parameter
  * grid, and no-false-positive rejection of truncations, corruptions
  * and lookalike payloads (the family discipline shared with
  * ImageHeader).
  */
class AudioHeaderSpec extends AnyFunSuite {

  test("encode/decode roundtrip across the parameter grid") {
    for {
      ch <- Seq(1, 2, 3, 8)
      rate <- Seq(8000, 16000, 44100, 48000)
      bits <- Seq(8, 16, 24, 32)
      frames <- Seq(0, 1, 7, 200)
    } {
      val bytes = AudioHeader.encodeWav(ch, rate, bits, frames)
      val dataSize = frames * ch * (bits / 8)
      assert(bytes.length == 44 + dataSize + (dataSize & 1)) // odd data carries a RIFF pad byte
      val m = AudioHeader.decodeWav(bytes)
        .getOrElse(fail(s"no decode for ch=$ch rate=$rate bits=$bits frames=$frames"))
      assert(m.format == "wav")
      assert(m.channels == ch && m.sampleRate == rate &&
        m.bitsPerSample == bits && m.nFrames == frames)
      assert(m.durationUs == frames.toLong * 1000000L / rate)
    }
  }

  test("every prefix truncation is rejected") {
    val bytes = AudioHeader.encodeWav(2, 16000, 16, 25)
    for (n <- 0 until bytes.length)
      assert(AudioHeader.decodeWav(bytes.take(n)).isEmpty, s"truncation at $n decoded")
  }

  test("single-byte header corruptions never yield garbage fields") {
    val bytes = AudioHeader.encodeWav(2, 16000, 16, 25)
    val good = AudioHeader.decodeWav(bytes).get
    // flip each of the 44 header bytes in turn; decode must either fail
    // or (for bytes the spec allows to vary, e.g. inside sample data —
    // none in [0,44)) still re-derive consistent fields
    for (i <- 0 until 44) {
      val c = bytes.clone()
      c(i) = (c(i) ^ 0x01).toByte
      AudioHeader.decodeWav(c) match {
        case None => // strict rejection — expected for structural bytes
        case Some(m) =>
          // only a sample-rate LSB flip can survive all cross-checks IF
          // it also fixes byte rate — impossible with one flipped byte,
          // so any surviving decode must equal the original
          assert(m == good, s"byte $i corruption changed decode to $m")
      }
    }
  }

  test("FLAC encode/decode roundtrip across the parameter grid") {
    for {
      ch <- Seq(1, 2, 6, 8)
      rate <- Seq(1, 8000, 44100, 655350)
      bps <- Seq(4, 16, 24, 32)
      samples <- Seq(0L, 1L, 99999L, (1L << 36) - 1)
    } {
      val bytes = AudioHeader.encodeFlac(ch, rate, bps, samples)
      assert(bytes.length == 42)
      val m = AudioHeader.decodeFlac(bytes)
        .getOrElse(fail(s"no decode for ch=$ch rate=$rate bps=$bps samples=$samples"))
      assert(m.format == "flac")
      assert(m.channels == ch && m.sampleRate == rate &&
        m.bitsPerSample == bps && m.nFrames == samples)
      assert(m.durationUs == samples * 1000000L / rate)
      // the dispatching decoder picks the right container
      assert(AudioHeader.decode(bytes).exists(_.format == "flac"))
    }
  }

  test("every FLAC prefix truncation is rejected") {
    val bytes = AudioHeader.encodeFlac(2, 44100, 16, 12345L)
    for (n <- 0 until bytes.length)
      assert(AudioHeader.decodeFlac(bytes.take(n)).isEmpty, s"truncation at $n decoded")
  }

  test("FLAC strictness: wrong first-block type/length and bad ranges reject") {
    val good = AudioHeader.encodeFlac(2, 44100, 16, 100L)
    val wrongType = good.clone(); wrongType(4) = (0x80 | 4).toByte // VORBIS_COMMENT first
    assert(AudioHeader.decodeFlac(wrongType).isEmpty)
    val wrongLen = good.clone(); wrongLen(7) = 33
    assert(AudioHeader.decodeFlac(wrongLen).isEmpty)
    val zeroRate = good.clone()
    // zero out the 20 rate bits (bytes 18-19 and the top nibble of 20)
    zeroRate(18) = 0; zeroRate(19) = 0; zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(AudioHeader.decodeFlac(zeroRate).isEmpty)
    val badBlock = good.clone(); badBlock(8) = 0; badBlock(9) = 8 // min blocksize 8 < 16
    assert(AudioHeader.decodeFlac(badBlock).isEmpty)
  }

  test("text and image payloads do not decode as WAV") {
    assert(AudioHeader.decodeWav("RIFF this is not audio WAVE data chunk!!".getBytes).isEmpty)
    assert(AudioHeader.decodeWav(Array.empty[Byte]).isEmpty)
    assert(AudioHeader.decodeWav(null).isEmpty)
    assert(AudioHeader.decodeWav(
      graft.operators.ImageHeader.encodePng(10, 10, 8, 2)).isEmpty)
  }

  test("unknown chunks are walked over, odd sizes pad-aligned") {
    // hand-build: RIFF [size] WAVE + "junk" chunk (odd size 3 + pad) +
    // canonical fmt/data — the walker must skip junk and still decode
    val base = AudioHeader.encodeWav(1, 8000, 8, 10)
    val fmtAndData = base.drop(12)
    val junk = "junk".getBytes ++ Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val body = junk ++ fmtAndData
    val out = new Array[Byte](12 + body.length)
    System.arraycopy("RIFF".getBytes, 0, out, 0, 4)
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    System.arraycopy("WAVE".getBytes, 0, out, 8, 4)
    System.arraycopy(body, 0, out, 12, body.length)
    val m = AudioHeader.decodeWav(out)
    assert(m.exists(x => x.channels == 1 && x.sampleRate == 8000 && x.nFrames == 10))
  }

  test("trailing chunks after data are size-validated (whole-structure walk)") {
    // append a trailing chunk with a size overshooting the buffer: the
    // walk must reject even though fmt/data already parsed clean
    val base = AudioHeader.encodeWav(1, 8000, 16, 10)
    val trailer = "note".getBytes ++ Array[Byte](99, 0, 0, 0) // declares 99, carries 0
    val out = base ++ trailer
    // fix the riff size so only the trailer is inconsistent
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    assert(AudioHeader.decodeWav(out).isEmpty)
    // a well-formed trailing chunk is fine
    val okTrailer = "note".getBytes ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val out2 = base ++ okTrailer
    val riffSize2 = out2.length - 8
    out2(4) = (riffSize2 & 0xff).toByte
    out2(5) = ((riffSize2 >> 8) & 0xff).toByte
    out2(6) = ((riffSize2 >> 16) & 0xff).toByte
    out2(7) = ((riffSize2 >> 24) & 0xff).toByte
    assert(AudioHeader.decodeWav(out2).exists(_.nFrames == 10))
  }

  test("MP3 encode/decode roundtrip across versions, rates and bitrates") {
    for {
      ch <- Seq(1, 2)
      rate <- Seq(44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000)
      br <- Seq(32, 48, 64, 96, 128)
      frames <- Seq(1, 3, 30)
      id3 <- Seq(0, 17, 200)
    } {
      val bytes = AudioHeader.encodeMp3(ch, rate, br, frames, id3)
      val spf = if (Seq(44100, 48000, 32000).contains(rate)) 1152 else 576
      assert(bytes.length == 10 + id3 + frames * (spf / 8 * (br * 1000) / rate))
      val m = AudioHeader.decodeMp3(bytes)
        .getOrElse(fail(s"no decode for ch=$ch rate=$rate br=$br frames=$frames id3=$id3"))
      assert(m.format == "mp3" && m.channels == ch && m.sampleRate == rate)
      assert(m.bitsPerSample == 0L)
      assert(m.nFrames == frames.toLong * spf)
      assert(m.durationUs == frames.toLong * spf * 1000000L / rate)
      // the dispatcher must route here too
      assert(AudioHeader.decode(bytes).exists(_.format == "mp3"))
    }
  }

  test("every MP3 prefix truncation is rejected (except legal frame boundaries)") {
    val bytes = AudioHeader.encodeMp3(2, 44100, 64, 3, 11)
    // MP3 carries no total-length field: a prefix ending exactly at a
    // frame boundary IS a valid shorter stream, so those offsets are
    // expected to decode (with fewer frames) — everything else rejects
    val frameBytes = 1152 / 8 * 64000 / 44100
    val boundaries = Set(10 + 11 + frameBytes, 10 + 11 + 2 * frameBytes)
    for (n <- 0 until bytes.length) {
      val d = AudioHeader.decodeMp3(bytes.take(n))
      if (boundaries(n))
        assert(d.exists(_.nFrames == (n - 21) / frameBytes * 1152L), s"boundary at $n")
      else assert(d.isEmpty, s"truncation at $n decoded")
    }
  }

  test("MP3 strictness: bad syncs, reserved fields and inconsistent chains reject") {
    val good = AudioHeader.encodeMp3(2, 44100, 64, 3, 0)
    assert(AudioHeader.decodeMp3(good).isDefined)
    // kill first frame sync
    val b1 = good.clone(); b1(10) = 0
    assert(AudioHeader.decodeMp3(b1).isEmpty)
    // bitrate index 15 (bad)
    val b2 = good.clone(); b2(12) = (0xf0 | (b2(12) & 0x0f)).toByte
    assert(AudioHeader.decodeMp3(b2).isEmpty)
    // sample-rate index 3 (reserved)
    val b3 = good.clone(); b3(12) = ((b3(12) & 0xf0) | 0x0c).toByte
    assert(AudioHeader.decodeMp3(b3).isEmpty)
    // version bits 01 (reserved)
    val b4 = good.clone(); b4(11) = ((b4(11) & 0xe7) | 0x08).toByte
    assert(AudioHeader.decodeMp3(b4).isEmpty)
    // layer bits 00 (reserved)
    val b5 = good.clone(); b5(11) = (b5(11) & 0xf9).toByte
    assert(AudioHeader.decodeMp3(b5).isEmpty)
    // chain inconsistency: switch the SECOND frame to mono
    val frameBytes = 1152 / 8 * 64000 / 44100
    val b6 = good.clone(); b6(10 + frameBytes + 3) = (0xc0 | (b6(10 + frameBytes + 3) & 0x3f)).toByte
    assert(AudioHeader.decodeMp3(b6).isEmpty)
    // malformed ID3: non-syncsafe size byte
    val b7 = good.clone(); b7(6) = 0x80.toByte
    assert(AudioHeader.decodeMp3(b7).isEmpty)
    // extra trailing byte breaks exact tiling
    assert(AudioHeader.decodeMp3(good :+ 0.toByte).isEmpty)
  }

  test("Ogg/Vorbis encode/decode roundtrip across the parameter grid") {
    for {
      ch <- Seq(1, 2, 6, 8)
      rate <- Seq(8000, 11025, 44100, 96000)
      samples <- Seq(0L, 1L, 44100L, 999999L)
    } {
      val bytes = AudioHeader.encodeOgg(ch, rate, samples)
      assert(bytes.length == 85) // 58-byte BOS page + 27-byte EOS page
      val m = AudioHeader.decodeOgg(bytes)
        .getOrElse(fail(s"no decode for ch=$ch rate=$rate samples=$samples"))
      assert(m.format == "ogg" && m.channels == ch && m.sampleRate == rate)
      assert(m.bitsPerSample == 0L && m.nFrames == samples)
      assert(m.durationUs == samples * 1000000L / rate)
      assert(AudioHeader.decode(bytes).exists(_.format == "ogg"))
    }
  }

  test("every Ogg prefix truncation is rejected") {
    val bytes = AudioHeader.encodeOgg(2, 44100, 12345L)
    for (n <- 0 until bytes.length)
      assert(AudioHeader.decodeOgg(bytes.take(n)).isEmpty, s"truncation at $n decoded")
  }

  test("Ogg strictness: page CRC, flags, serial and ident header are all enforced") {
    val good = AudioHeader.encodeOgg(2, 44100, 5000L)
    assert(AudioHeader.decodeOgg(good).isDefined)
    // flip one body byte: the Ogg CRC (direct polynomial, not
    // java.util.zip's reflected one) must catch it
    val b1 = good.clone(); b1(30) = (b1(30) ^ 1).toByte
    assert(AudioHeader.decodeOgg(b1).isEmpty)
    // clear the BOS flag on page 0 (re-CRC would be needed; CRC rejects first,
    // which is itself the correct strict behavior)
    val b2 = good.clone(); b2(5) = 0
    assert(AudioHeader.decodeOgg(b2).isEmpty)
    // truncate the EOS page off: stream has no end-of-stream page
    assert(AudioHeader.decodeOgg(good.take(58)).isEmpty)
    // wrong magic on the second page
    val b3 = good.clone(); b3(58) = 'X'.toByte
    assert(AudioHeader.decodeOgg(b3).isEmpty)
    // ident header with channels 0 cannot encode (guard) nor decode:
    // hand-corrupt channels byte (body starts at 28: 27-byte header + 1 seg)
    val b4 = good.clone(); b4(28 + 11) = 0
    assert(AudioHeader.decodeOgg(b4).isEmpty)
    // trailing garbage breaks exact tiling
    assert(AudioHeader.decodeOgg(good :+ 0.toByte).isEmpty)
  }

  test("text, WAV and FLAC payloads do not decode as MP3") {
    assert(AudioHeader.decodeMp3("ID3 is a prefix but not a tag header".getBytes).isEmpty)
    assert(AudioHeader.decodeMp3(AudioHeader.encodeWav(1, 8000, 16, 10)).isEmpty)
    assert(AudioHeader.decodeMp3(AudioHeader.encodeFlac(2, 44100, 16, 1000)).isEmpty)
    assert(AudioHeader.decodeMp3(null).isEmpty)
    assert(AudioHeader.decodeMp3(Array.empty[Byte]).isEmpty)
    // and the dispatcher keeps wav/flac routed to their own parsers
    assert(AudioHeader.decode(AudioHeader.encodeWav(1, 8000, 16, 10)).exists(_.format == "wav"))
    assert(AudioHeader.decode(AudioHeader.encodeFlac(2, 44100, 16, 1000)).exists(_.format == "flac"))
    // ogg payloads don't decode as anything else, and vice versa
    val ogg = AudioHeader.encodeOgg(2, 44100, 100L)
    assert(AudioHeader.decodeMp3(ogg).isEmpty && AudioHeader.decodeWav(ogg).isEmpty &&
      AudioHeader.decodeFlac(ogg).isEmpty)
    assert(AudioHeader.decodeOgg(AudioHeader.encodeMp3(2, 44100, 64, 3)).isEmpty)
    assert(AudioHeader.decodeOgg("OggS but not actually a page chain...".getBytes).isEmpty)
    assert(AudioHeader.decodeOgg(null).isEmpty)
  }

  /** Build a WAV and overwrite its sample data with explicit 16-bit
    * little-endian values (interleaved frame-major, like any PCM file). */
  private def wav16(channels: Int, samples: Seq[Seq[Int]]): Array[Byte] = {
    val bytes = AudioHeader.encodeWav(channels, 8000, 16, samples.length)
    for ((frame, f) <- samples.zipWithIndex; (v, c) <- frame.zipWithIndex) {
      val off = 44 + (f * channels + c) * 2
      bytes(off) = (v & 0xff).toByte
      bytes(off + 1) = ((v >> 8) & 0xff).toByte
    }
    bytes
  }

  test("pcm features: peak, exact mean square, strict zero crossings") {
    // constant signal: no crossings, meanSq = v^2 exactly
    val const = AudioHeader.decodePcmFeatures(wav16(1, Seq.fill(5)(Seq(-1000)))).get
    assert(const.peakAbs == 1000 && const.meanSq == 1000000 &&
      const.zeroCrossings == 0 && const.nSamples == 5)
    // alternating sign: a crossing at every frame step
    val alt = AudioHeader.decodePcmFeatures(
      wav16(1, Seq(Seq(300), Seq(-300), Seq(300), Seq(-300)))).get
    assert(alt.zeroCrossings == 3 && alt.peakAbs == 300)
    // a zero sample breaks the run: +,0,- is NOT a crossing
    val zer = AudioHeader.decodePcmFeatures(
      wav16(1, Seq(Seq(300), Seq(0), Seq(-300)))).get
    assert(zer.zeroCrossings == 0)
    // channels are tracked independently through the interleave:
    // ch0 alternates (2 crossings), ch1 constant (0)
    val two = AudioHeader.decodePcmFeatures(
      wav16(2, Seq(Seq(500, 7), Seq(-500, 7), Seq(500, 7)))).get
    assert(two.zeroCrossings == 2 && two.nSamples == 6)
    // mean square floors: values 300,-300,0 -> (90000+90000+0)/3 = 60000
    assert(AudioHeader.decodePcmFeatures(
      wav16(1, Seq(Seq(300), Seq(-300), Seq(0)))).get.meanSq == 60000)
  }

  test("pcm features: canonical 16-bit scale across container depths") {
    // 8-bit: byte b decodes as (b-128)*256 — encodeWav's ramp starts at
    // frame 0 -> byte 0 -> v16 = -32768
    val f8 = AudioHeader.decodePcmFeatures(AudioHeader.encodeWav(1, 8000, 8, 3)).get
    assert(f8.peakAbs == 32768 && f8.nSamples == 3)
    // 24-bit: only the top two bytes survive; craft one sample whose low
    // byte is all-ones noise below the 16-bit scale: (0xff, 0x00, 0x80)
    // LE -> signed 24-bit 0x8000ff -> floor-div 256 -> -32768
    val b = AudioHeader.encodeWav(1, 8000, 24, 1)
    b(44) = 0xff.toByte; b(45) = 0x00; b(46) = 0x80.toByte
    // data size 3 is odd -> buffer carries a RIFF pad byte; leave it 0
    val f24 = AudioHeader.decodePcmFeatures(b).get
    assert(f24.peakAbs == 32768 && f24.meanSq == 32768L * 32768L)
    // 32-bit ramp byte pattern equals the 16-bit one on the top bytes,
    // so features match the 16-bit container of the same frame count
    val f16 = AudioHeader.decodePcmFeatures(AudioHeader.encodeWav(2, 8000, 16, 150)).get
    val f32 = AudioHeader.decodePcmFeatures(AudioHeader.encodeWav(2, 8000, 32, 150)).get
    assert(f16 == f32)
  }

  test("pcm features: rejection mirrors the strict header decode") {
    assert(AudioHeader.decodePcmFeatures(AudioHeader.encodeWav(1, 8000, 16, 0)).isEmpty)
    val bad = AudioHeader.encodeWav(1, 8000, 16, 10)
    bad(4) = (bad(4) + 1).toByte
    assert(AudioHeader.decodePcmFeatures(bad).isEmpty)
    assert(AudioHeader.decodePcmFeatures(null).isEmpty)
  }
}
