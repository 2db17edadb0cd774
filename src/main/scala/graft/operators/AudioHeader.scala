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
    // walk the WHOLE chunk chain, not just up to data: trailing chunks'
    // declared sizes must also tile the buffer exactly, or the payload
    // is structurally corrupt and decodes as unknown
    while (off < bytes.length) {
      if (off + 8 > bytes.length) return None // dangling partial header
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
          if (dataSize >= 0) return None // exactly one data chunk
          dataSize = size
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      off = body + size.toInt + (size.toInt & 1)
    }
    if (off != bytes.length) return None // chunks (incl. pads) must tile exactly
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

  /** Scalar signal features of one PCM payload, all computed on the
    * canonical 16-bit amplitude scale so they are comparable across
    * container bit depths (the normalization every audio-ML frontend
    * applies before featurization): 8-bit unsigned samples are centered
    * and scaled ((b-128)*256); wider samples keep their top two bytes
    * (little-endian, so the LAST two bytes of the sample) as a signed
    * 16-bit value — i.e. floor division by 2^(bits-16) of the full
    * sample, with no rounding ambiguity.
    *
    *   - peakAbs: max |v16| over every sample of every channel
    *   - meanSq:  floor(Σ v16² / nSamples) — the integer mean-square
    *     energy (RMS² without the float sqrt, exact cross-engine)
    *   - zeroCrossings: per-channel count of consecutive-FRAME sign
    *     flips (strictly negative product; a zero sample breaks a run,
    *     it never counts as a crossing), summed over channels
    *   - nSamples: frames × channels
    */
  final case class PcmFeatures(
      peakAbs: Long, meanSq: Long, zeroCrossings: Long, nSamples: Long)

  /** Decode PCM sample data into [[PcmFeatures]] — the payload-level
    * stage past [[decodeWav]]'s header walk, the audio analog of
    * ImagePixels: one O(1)-state pass over the data chunk, never
    * materializing a sample array. None iff the container fails the
    * strict header decode, or holds zero samples (no mean of nothing). */
  def decodePcmFeatures(bytes: Array[Byte]): Option[PcmFeatures] =
    decodeWav(bytes).filter(_.nFrames > 0).map { m =>
      val ch = m.channels.toInt
      val bits = m.bitsPerSample.toInt
      val bytesPer = bits / 8
      val frames = m.nFrames.toInt
      val dataOff = dataChunkOffset(bytes)
      var peak = 0L
      var sumSq = 0L
      var zc = 0L
      val prev = new Array[Int](ch) // previous frame's v16 per channel
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < ch) {
          val v = sampleV16(bytes, dataOff, ch, bits, f, c)
          val av = math.abs(v.toLong)
          if (av > peak) peak = av
          sumSq += v.toLong * v
          if (f > 0 && prev(c).toLong * v < 0) zc += 1
          prev(c) = v
          c += 1
        }
        f += 1
      }
      val n = frames.toLong * ch
      PcmFeatures(peak, sumSq / n, zc, n)
    }

  /** Offset of the data chunk's payload (structure already validated
    * by [[decodeWav]]'s strict walk). */
  private def dataChunkOffset(bytes: Array[Byte]): Int = {
    var off = 12
    var dataOff = -1
    while (dataOff < 0) {
      val id = fourCC(bytes, off)
      val size = leInt(bytes, off + 4).toInt
      if (id == "data") dataOff = off + 8
      else off = off + 8 + size + (size & 1)
    }
    dataOff
  }

  /** Channel c's sample at frame f, normalized to a signed 16-bit
    * value: 8-bit PCM is unsigned-biased, wider widths read their top
    * two bytes (hi sign-extends). */
  private def sampleV16(bytes: Array[Byte], dataOff: Int, ch: Int,
      bits: Int, f: Int, c: Int): Int = {
    val bytesPer = bits / 8
    val sOff = dataOff + (f * ch + c) * bytesPer
    if (bits == 8) ((bytes(sOff) & 0xff) - 128) * 256
    else {
      val hi = bytes(sOff + bytesPer - 1)
      val lo = bytes(sOff + bytesPer - 2) & 0xff
      (hi << 8) | lo // hi sign-extends: signed 16-bit value
    }
  }

  /** 32-bit sign-of-delta fingerprint (Haitsma & Kalker 2002, "A
    * Highly Robust Audio Fingerprinting System" — the sign of the
    * inter-frame difference is the fingerprint bit): channel 0 is
    * nearest-resampled onto a 33-point grid (exact integer source
    * indices t*frames div 33 — the resizeNearest convention) and bit t
    * is set iff the amplitude rises between grid points t and t+1.
    * Amplitude stands in for the paper's per-band energy — the corpus
    * is deterministic PCM, not spectral. None iff the strict header
    * decode rejects or the clip is empty. */
  def pcmFingerprint(bytes: Array[Byte], grid: Int = 33): Option[Long] =
    decodeWav(bytes).filter(_.nFrames > 0).map { m =>
      val ch = m.channels.toInt
      val bits = m.bitsPerSample.toInt
      val frames = m.nFrames
      val dataOff = dataChunkOffset(bytes)
      def at(t: Int): Int =
        sampleV16(bytes, dataOff, ch, bits, (t.toLong * frames / grid).toInt, 0)
      var fp = 0L
      var t = 0
      while (t < grid - 1) {
        if (at(t + 1) > at(t)) fp |= 1L << t
        t += 1
      }
      fp
    }

  /** Strict FLAC STREAMINFO decode; None on anything not a consistent
    * FLAC metadata stream (never throws). Spec source (public): the
    * FLAC format spec / RFC 9639 — "fLaC" magic, then metadata blocks
    * (1-byte last-flag+type, 24-bit big-endian length), the first of
    * which MUST be STREAMINFO (type 0, length 34) carrying min/max
    * blocksize, min/max framesize, then a packed 64-bit field:
    * 20-bit sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total
    * samples, plus a 16-byte MD5. Strictness: the full metadata chain
    * is walked and every declared block must fit the buffer; sample
    * rate / channels / bps / blocksize ranges are the spec's legal
    * ranges — a random buffer with the magic cannot decode. */
  def decodeFlac(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 42) return None
    if (fourCC(bytes, 0) != "fLaC") return None
    // walk the metadata chain; first block must be STREAMINFO
    var off = 4
    var first = true
    var meta: Option[AudioMeta] = None
    var last = false
    while (!last) {
      if (off + 4 > bytes.length) return None
      val hdr = bytes(off) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      val body = off + 4
      if (body + len > bytes.length) return None
      if (first) {
        if (btype != 0 || len != 34) return None
        val minBlock = ((bytes(body) & 0xff) << 8) | (bytes(body + 1) & 0xff)
        val maxBlock = ((bytes(body + 2) & 0xff) << 8) | (bytes(body + 3) & 0xff)
        // packed 64-bit field at body+10: rate(20) ch-1(3) bps-1(5) samples(36)
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (bytes(body + 10 + i) & 0xffL); i += 1 }
        val rate = v >>> 44
        val ch = ((v >>> 41) & 0x7) + 1
        val bps = ((v >>> 36) & 0x1f) + 1
        val samples = v & 0xfffffffffL
        if (minBlock < 16 || maxBlock < minBlock) return None
        if (rate < 1 || rate > 655350 || ch < 1 || ch > 8 || bps < 4 || bps > 32)
          return None
        meta = Some(AudioMeta("flac", ch, rate, bps, samples,
          samples * 1000000L / rate))
        first = false
      }
      off = body + len
    }
    meta
  }

  // ------------------------------------------------------------------
  // MP3: ID3v2 tag skip + MPEG audio frame-header walk. Spec sources
  // (public): the ID3v2.3/2.4 informal standards (10-byte header,
  // syncsafe 28-bit size, optional footer) and the ISO/IEC 11172-3 /
  // 13818-3 frame header layout: 11-bit sync, 2-bit version id,
  // 2-bit layer, 4-bit bitrate index, 2-bit sample-rate index,
  // padding bit, channel mode — with the published bitrate and
  // sample-rate tables per version/layer.
  // ------------------------------------------------------------------

  // bitrate tables in kbps, index 1..14 (0 = free and 15 = bad are
  // both rejected — strictness over permissiveness)
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  // sample-rate tables by version, index 0..2 (3 = reserved)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** ID3v2 tag length at the start of `b` (0 if none); -1 when a tag
    * starts but is malformed/truncated — the whole payload rejects. */
  private def id3v2Length(b: Array[Byte]): Int = {
    if (b.length < 3 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    if (b.length < 10) return -1
    val major = b(3) & 0xff
    if (major < 2 || major > 4 || (b(4) & 0xff) == 0xff) return -1
    // syncsafe: each size byte has the high bit clear
    var size = 0
    var i = 6
    while (i < 10) {
      if ((b(i) & 0x80) != 0) return -1
      size = (size << 7) | (b(i) & 0x7f)
      i += 1
    }
    val footer = ((b(5) & 0xff) & 0x10) != 0
    val total = 10 + size + (if (footer) 10 else 0)
    if (total > b.length) -1 else total
  }

  /** Strict MPEG-audio (MP3-family) decode: optional ID3v2 tag, then a
    * frame chain that must tile the remaining buffer EXACTLY, every
    * frame header legal and mutually consistent (same version / layer /
    * sample rate / channel count; bitrate may vary frame to frame —
    * VBR). None on anything else (never throws). bitsPerSample is 0:
    * compressed audio has no PCM bit depth; nFrames counts PCM samples
    * per channel (frames x samples-per-frame) so duration stays exact
    * integer micros like the other decoders. */
  def decodeMp3(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 14) return None // ID3-less minimum: one 4-byte header + payload
    val skip = id3v2Length(bytes)
    if (skip < 0) return None
    var off = skip
    if (bytes.length - off < 4) return None
    var ver = -1; var layer = -1; var rate = -1; var ch = -1
    var mpegFrames = 0L; var samples = 0L
    while (off < bytes.length) {
      if (off + 4 > bytes.length) return None
      val h1 = bytes(off) & 0xff; val h2 = bytes(off + 1) & 0xff
      val h3 = bytes(off + 2) & 0xff; val h4 = bytes(off + 3) & 0xff
      if (h1 != 0xff || (h2 & 0xe0) != 0xe0) return None
      val vb = (h2 >> 3) & 3 // 0=MPEG2.5 1=reserved 2=MPEG2 3=MPEG1
      val lb = (h2 >> 1) & 3 // 0=reserved 1=LayerIII 2=LayerII 3=LayerI
      if (vb == 1 || lb == 0) return None
      val lay = 4 - lb // 1..3
      val brIdx = (h3 >> 4) & 0xf
      if (brIdx == 0 || brIdx == 15) return None // free/bad bitrate
      val srIdx = (h3 >> 2) & 3
      if (srIdx == 3) return None
      val padding = (h3 >> 1) & 1
      val mode = (h4 >> 6) & 3
      val chans = if (mode == 3) 1 else 2
      val sr = (vb match { case 3 => SrV1; case 2 => SrV2; case _ => SrV25 })(srIdx)
      val br = 1000 * (vb match {
        case 3 => lay match { case 1 => BrV1L1; case 2 => BrV1L2; case _ => BrV1L3 }
        case _ => if (lay == 1) BrV2L1 else BrV2L23
      })(brIdx)
      val spf = lay match {
        case 1 => 384
        case 2 => 1152
        case _ => if (vb == 3) 1152 else 576
      }
      val frameBytes =
        if (lay == 1) (12 * br / sr + padding) * 4
        else spf / 8 * br / sr + padding
      if (frameBytes <= 4 || off + frameBytes > bytes.length) return None
      // consistency across the chain (bitrate excepted: VBR is legal)
      if (mpegFrames == 0L) { ver = vb; layer = lay; rate = sr; ch = chans }
      else if (vb != ver || lay != layer || sr != rate || chans != ch) return None
      mpegFrames += 1L
      samples += spf
      off += frameBytes
    }
    if (off != bytes.length || mpegFrames == 0L) return None
    Some(AudioMeta("mp3", ch.toLong, rate.toLong, 0L, samples,
      samples * 1000000L / rate))
  }

  // ------------------------------------------------------------------
  // Ogg/Vorbis: Ogg page chain walk + Vorbis identification header.
  // Spec sources (public): RFC 3533 (the Ogg encapsulation format —
  // "OggS" capture pattern, version 0, header-type flags BOS/EOS,
  // 64-bit granule position, segment/lacing table, and the page CRC:
  // CRC-32 with polynomial 0x04911db7... sic 0x04C11DB7, NOT reflected,
  // init 0, no final xor — java.util.zip.CRC32 is the reflected
  // Ethernet variant and cannot verify Ogg pages) and the Vorbis I
  // specification §4.2.2 (identification header: packet type 1,
  // "vorbis", version 0, u8 channels, u32le rate, 3x s32 bitrates,
  // packed blocksize exponents 6..13 with bs0 <= bs1, framing bit).
  // ------------------------------------------------------------------

  private val OggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Direct (non-reflected) CRC-32 over a page, with the 4 CRC field
    * bytes at `crcOff` treated as zero — exactly how Ogg defines page
    * checksums. */
  private def oggPageCrc(b: Array[Byte], off: Int, len: Int, crcOff: Int): Int = {
    var crc = 0
    var i = off
    while (i < off + len) {
      val v = if (i >= crcOff && i < crcOff + 4) 0 else b(i) & 0xff
      crc = (crc << 8) ^ OggCrcTable(((crc >>> 24) ^ v) & 0xff)
      i += 1
    }
    crc
  }

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Strict Ogg/Vorbis decode: the page chain must tile the buffer
    * exactly with verified page CRCs, one logical stream (constant
    * serial, page sequence 0,1,2,..., BOS on the first page, EOS on the
    * last), and the first packet must be a fully legal Vorbis
    * identification header. Total samples = the EOS page's granule
    * position (the Vorbis I definition of stream length); bitsPerSample
    * is 0 as for MP3 (lossy streams carry no PCM width). None on
    * anything else (never throws). */
  def decodeOgg(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 58) return None // BOS page header + ident packet
    var off = 0
    var serial = 0L
    var expectSeq = 0L
    var lastGranule = Long.MinValue
    var sawBos = false; var sawEos = false
    var ident: Option[(Long, Long)] = None // channels, rate
    while (off < bytes.length) {
      if (sawEos) return None // pages after EOS
      if (off + 27 > bytes.length) return None
      if (!(bytes(off) == 'O' && bytes(off + 1) == 'g' && bytes(off + 2) == 'g' &&
          bytes(off + 3) == 'S')) return None
      if (bytes(off + 4) != 0) return None // stream structure version
      val flags = bytes(off + 5) & 0xff
      val granule = leLong(bytes, off + 6)
      val pageSerial = leInt(bytes, off + 14)
      val pageSeq = leInt(bytes, off + 18)
      val nSegs = bytes(off + 26) & 0xff
      val segTab = off + 27
      if (segTab + nSegs > bytes.length) return None
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += bytes(segTab + s) & 0xff; s += 1 }
      val body = segTab + nSegs
      if (body + bodyLen > bytes.length) return None
      val crcStored = leInt(bytes, off + 22)
      val crcCalc = oggPageCrc(bytes, off, 27 + nSegs + bodyLen, off + 22).toLong & 0xffffffffL
      if (crcStored != crcCalc) return None
      if (expectSeq == 0L) {
        if ((flags & 0x02) == 0) return None // first page must be BOS
        sawBos = true
        serial = pageSerial
        // first packet = Vorbis identification header (30 bytes)
        if (bodyLen < 30) return None
        if ((bytes(body) & 0xff) != 1) return None // packet type 1
        if (new String(bytes, body + 1, 6, "US-ASCII") != "vorbis") return None
        if (leInt(bytes, body + 7) != 0L) return None // vorbis version
        val ch = bytes(body + 11) & 0xff
        val rate = leInt(bytes, body + 12)
        val bsByte = bytes(body + 28) & 0xff
        val bs0 = bsByte & 0x0f; val bs1 = (bsByte >> 4) & 0x0f
        if (ch < 1 || ch > 8 || rate < 1) return None
        if (bs0 < 6 || bs1 > 13 || bs0 > bs1) return None
        if ((bytes(body + 29) & 0x01) != 1) return None // framing bit
        ident = Some((ch.toLong, rate))
      } else {
        if (pageSerial != serial) return None // one logical stream only
        if ((flags & 0x02) != 0) return None // BOS past page 0
      }
      if (pageSeq != expectSeq) return None
      if ((flags & 0x04) != 0) { sawEos = true; lastGranule = granule }
      expectSeq += 1
      off = body + bodyLen
    }
    if (off != bytes.length || !sawBos || !sawEos || lastGranule < 0) return None
    ident.map { case (ch, rate) =>
      AudioMeta("ogg", ch, rate, 0L, lastGranule, lastGranule * 1000000L / rate)
    }
  }

  /** Strict audio decode with content dispatch — the audio twin of
    * ImageHeader.decode: try each container's strict parser in turn. */
  def decode(bytes: Array[Byte]): Option[AudioMeta] =
    decodeWav(bytes).orElse(decodeFlac(bytes)).orElse(decodeMp3(bytes))
      .orElse(decodeOgg(bytes))

  /** Test-fixture encoder: a minimal legal Ogg/Vorbis stream — a BOS
    * page carrying the 30-byte identification header (nominal bitrate
    * = 8 x rate as a plausible filler; the decoder ignores bitrates),
    * then an EOS page with no packets whose granule position carries
    * `totalSamples`. Real page CRCs (Ogg's direct CRC-32). */
  def encodeOgg(channels: Int, sampleRate: Int, totalSamples: Long): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(sampleRate >= 1, s"rate $sampleRate")
    require(totalSamples >= 0, s"samples $totalSamples")
    def page(flags: Int, granule: Long, seq: Int, packet: Array[Byte]): Array[Byte] = {
      val nSegs = if (packet.isEmpty) 0 else packet.length / 255 + 1
      val out = new Array[Byte](27 + nSegs + packet.length)
      out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
      out(5) = flags.toByte
      var i = 0
      while (i < 8) { out(6 + i) = ((granule >>> (8 * i)) & 0xff).toByte; i += 1 }
      out(14) = 0x7a; out(15) = 0x11; out(16) = 0x3a; out(17) = 0x01 // serial (arbitrary, constant)
      out(18) = (seq & 0xff).toByte; out(19) = ((seq >> 8) & 0xff).toByte
      out(20) = ((seq >> 16) & 0xff).toByte; out(21) = ((seq >> 24) & 0xff).toByte
      out(26) = nSegs.toByte
      var rem = packet.length
      i = 0
      while (i < nSegs) { out(27 + i) = math.min(rem, 255).toByte; rem -= 255; i += 1 }
      System.arraycopy(packet, 0, out, 27 + nSegs, packet.length)
      val crc = oggPageCrc(out, 0, out.length, 22)
      i = 0
      while (i < 4) { out(22 + i) = ((crc >>> (8 * i)) & 0xff).toByte; i += 1 }
      out
    }
    val ident = new Array[Byte](30)
    ident(0) = 1
    System.arraycopy("vorbis".getBytes("US-ASCII"), 0, ident, 1, 6)
    // version 0: bytes 7..10 stay zero
    ident(11) = channels.toByte
    var i = 0
    while (i < 4) { ident(12 + i) = ((sampleRate >>> (8 * i)) & 0xff).toByte; i += 1 }
    // max bitrate (16..19) and min bitrate (24..27) stay zero (unset)
    val nominal = 8L * sampleRate
    i = 0
    while (i < 4) { ident(20 + i) = ((nominal >>> (8 * i)) & 0xff).toByte; i += 1 }
    ident(28) = ((11 << 4) | 8).toByte // blocksizes 2^8 / 2^11 (common)
    ident(29) = 1 // framing bit
    page(0x02, 0L, 0, ident) ++ page(0x04, totalSamples, 1, Array.empty)
  }

  /** Test-fixture encoder: an MPEG1/2/2.5 Layer III stream — an ID3v2.3
    * tag with `id3Body` zero bytes, then `nMpegFrames` frames at the
    * given sample rate (must be one of the nine legal rates; the rate
    * selects the MPEG version) and bitrate (must be in that version's
    * Layer III table), padding 0, zeroed side-info/payload. The decoder
    * reads structure only, so zero payloads exercise the full walk. */
  def encodeMp3(channels: Int, sampleRate: Int, bitrateKbps: Int,
      nMpegFrames: Int, id3Body: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    require(nMpegFrames > 0 && id3Body >= 0)
    val (vb, srIdx) =
      if (SrV1.contains(sampleRate)) (3, SrV1.indexOf(sampleRate))
      else if (SrV2.contains(sampleRate)) (2, SrV2.indexOf(sampleRate))
      else if (SrV25.contains(sampleRate)) (0, SrV25.indexOf(sampleRate))
      else throw new IllegalArgumentException(s"illegal MPEG sample rate $sampleRate")
    val table = if (vb == 3) BrV1L3 else BrV2L23
    val brIdx = table.indexOf(bitrateKbps)
    require(brIdx >= 1, s"bitrate $bitrateKbps not in version's Layer III table")
    val frameBytes = (if (vb == 3) 1152 else 576) / 8 * (bitrateKbps * 1000) / sampleRate
    val out = new Array[Byte](10 + id3Body + nMpegFrames * frameBytes)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3 // ID3v2.3, rev 0, no flags
    out(6) = ((id3Body >> 21) & 0x7f).toByte
    out(7) = ((id3Body >> 14) & 0x7f).toByte
    out(8) = ((id3Body >> 7) & 0x7f).toByte
    out(9) = (id3Body & 0x7f).toByte
    val mode = if (channels == 1) 3 else 0 // stereo / mono
    var f = 0
    while (f < nMpegFrames) {
      val off = 10 + id3Body + f * frameBytes
      out(off) = 0xff.toByte
      out(off + 1) = (0xe0 | (vb << 3) | (1 << 1)).toByte // layer III bits = 01
      out(off + 2) = ((brIdx << 4) | (srIdx << 2)).toByte // padding 0
      out(off + 3) = (mode << 6).toByte
      f += 1
    }
    out
  }

  /** Test-fixture encoder: a minimal legal FLAC metadata stream — magic
    * + a single (last-flagged) STREAMINFO with blocksize 4096, unknown
    * framesizes (0) and MD5 (zeros, both legal), and the given packed
    * audio parameters. 42 bytes total; no frame data (the decoder reads
    * metadata only). */
  def encodeFlac(channels: Int, sampleRate: Int, bitsPerSample: Int,
      totalSamples: Long): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps $bitsPerSample")
    require(sampleRate >= 1 && sampleRate <= 655350, s"rate $sampleRate")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"samples $totalSamples")
    val out = new Array[Byte](42)
    System.arraycopy("fLaC".getBytes("US-ASCII"), 0, out, 0, 4)
    out(4) = 0x80.toByte // last block + type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34
    out(8) = 0x10; out(9) = 0 // min blocksize 4096
    out(10) = 0x10; out(11) = 0 // max blocksize 4096
    // framesizes unknown (0): bytes 12..17 stay zero
    val v = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples
    var i = 0
    while (i < 8) { out(18 + i) = ((v >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    // MD5 unknown (zeros): bytes 26..41 stay zero
    out
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
    // RIFF chunks are word-aligned: an odd data chunk carries a pad byte
    // (counted in the riff size, NOT in the chunk size)
    val out = new Array[Byte](44 + dataSize + (dataSize & 1))
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
