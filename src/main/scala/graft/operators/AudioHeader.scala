package graft.operators

/** Pure byte-level audio-header codec for the multimodal tier: parse
  * (and, for test fixtures, emit) PCM WAV — the RIFF/WAVE container —
  * with no audio library dependency. Extends the [[ImageHeader]]
  * strict-decoder family to the audio modality: the same batched
  * mapPartitions stage (Multimodal.decodeAudioMeta) runs it over the
  * canonical media frame, so audio payloads get the identical
  * schema/partitioning/batch treatment images do.
  *
  * Spec source (public): the Microsoft/IBM RIFF WAVE format — a "RIFF"
  * FourCC + little-endian riff size + "WAVE" form type, then a chunk
  * walk ("fmt " must precede "data"; chunks are word-aligned, odd sizes
  * carry a pad byte). PCM "fmt " layout: wFormatTag(1=PCM) u16,
  * nChannels u16, nSamplesPerSec u32, nAvgBytesPerSec u32,
  * nBlockAlign u16, wBitsPerSample u16.
  *
  * Detection is STRICT, matching the family's no-false-positive
  * discipline: the riff size must equal the actual byte count minus 8,
  * every chunk length must fit inside the buffer, the format tag must
  * be PCM with a legal bit depth (8/16/24/32) and 1..8 channels, and
  * the fmt chunk's redundant fields (block align, byte rate) must BOTH
  * re-derive from channels x bits x rate — a payload that merely starts
  * with "RIFF" cannot decode, and a single corrupted size byte turns
  * the whole payload into format "unknown" rather than garbage fields.
  * Durations are exact integer microseconds (frames * 1e6 / rate,
  * floor) so cross-engine comparison never touches floats.
  */
object AudioHeader {

  /** Decoded header facts for one PCM WAV payload. */
  final case class AudioMeta(
      format: String,
      channels: Long,
      sampleRate: Long,
      bitsPerSample: Long,
      nFrames: Long,
      durationUs: Long)

  private def leInt(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private val LegalBits = Set(8, 16, 24, 32)

  /** Strict PCM WAV decode; None on anything not a fully consistent
    * RIFF/WAVE PCM file (never throws). */
  def decodeWav(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 44) return None
    if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "WAVE") return None
    // riff size is the byte count after offset 8; a truncated or padded
    // buffer fails here before any field is trusted
    if (leInt(bytes, 4) != bytes.length - 8L) return None

    var off = 12
    var fmt: Option[(Int, Long, Long, Int, Int)] = None // ch, rate, byteRate, align, bits
    var dataSize = -1L
    while (off + 8 <= bytes.length && dataSize < 0) {
      val id = fourCC(bytes, off)
      val size = leInt(bytes, off + 4)
      val body = off + 8
      if (size < 0 || body + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val tag = leShort(bytes, body)
          if (tag != 1) return None // PCM only
          fmt = Some((leShort(bytes, body + 2), leInt(bytes, body + 4),
            leInt(bytes, body + 8), leShort(bytes, body + 12),
            leShort(bytes, body + 14)))
        case "data" =>
          if (fmt.isEmpty) return None // fmt must precede data
          dataSize = size
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      off = body + size.toInt + (size.toInt & 1)
    }
    fmt match {
      case Some((ch, rate, byteRate, align, bits)) if dataSize >= 0 =>
        if (ch < 1 || ch > 8 || rate <= 0 || !LegalBits(bits)) return None
        val expectAlign = ch * (bits / 8)
        // redundant fields must re-derive — this is what rules out a
        // random buffer that happens to carry the magics
        if (align != expectAlign || byteRate != rate * expectAlign) return None
        if (dataSize % expectAlign != 0) return None
        val frames = dataSize / expectAlign
        Some(AudioMeta("wav", ch.toLong, rate, bits.toLong, frames,
          frames * 1000000L / rate))
      case _ => None
    }
  }

  /** Test-fixture encoder: a canonical 44-byte-header PCM WAV whose
    * sample data is a deterministic byte ramp (value = frame index mod
    * 251, per byte), so payloads are reproducible cross-run. */
  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Int): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(LegalBits(bitsPerSample), s"bits $bitsPerSample")
    require(sampleRate > 0 && nFrames >= 0)
    val align = channels * (bitsPerSample / 8)
    val dataSize = nFrames * align
    val out = new Array[Byte](44 + dataSize)
    def putCC(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4)
    def putLeInt(off: Int, v: Long): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putCC(0, "RIFF"); putLeInt(4, out.length - 8L); putCC(8, "WAVE")
    putCC(12, "fmt "); putLeInt(16, 16L)
    putLeShort(20, 1); putLeShort(22, channels)
    putLeInt(24, sampleRate.toLong); putLeInt(28, sampleRate.toLong * align)
    putLeShort(32, align); putLeShort(34, bitsPerSample)
    putCC(36, "data"); putLeInt(40, dataSize.toLong)
    var i = 0
    while (i < dataSize) { out(44 + i) = ((i / align) % 251).toByte; i += 1 }
    out
  }
}
