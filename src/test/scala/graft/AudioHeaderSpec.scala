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
      assert(bytes.length == 44 + frames * ch * (bits / 8))
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
}
