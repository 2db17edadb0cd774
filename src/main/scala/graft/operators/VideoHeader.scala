package graft.operators

/** Pure byte-level VIDEO-container codec — the third modality of the
  * [[ImageHeader]]/[[AudioHeader]] strict-decoder family: parse (and,
  * for fixtures, emit) the ISO Base Media File Format (MP4) header
  * structure with no media library.
  *
  * Spec source (public): ISO/IEC 14496-12 — a file is a sequence of
  * boxes (u32 big-endian size + FourCC type), the first of which must
  * be `ftyp` (major brand + minor version + compatible brands). The
  * `moov` box nests `mvhd` (movie header: version 0/1 fullbox carrying
  * timescale + duration) and one `trak` per track, each nesting `tkhd`
  * (track header ending in 16.16 fixed-point width/height).
  *
  * Detection is STRICT, matching the family discipline: every box size
  * must be >= 8 and the box chains must tile their container EXACTLY
  * at every nesting level, the first top-level box must be a
  * well-formed ftyp, exactly one moov with exactly one mvhd of the
  * exact version-implied size, every trak must carry exactly one
  * well-formed tkhd, the timescale must be positive, and width/height
  * must be integral in 16.16 fixed point — a random buffer or a
  * truncated file decodes to None, never to garbage fields. 64-bit
  * `largesize` boxes (size==1) and to-end-of-file boxes (size==0) are
  * out of the strict scope and reject. Durations are exact integer
  * microseconds (duration x 1e6 / timescale, floor), float-free like
  * the audio family.
  */
object VideoHeader {

  /** Decoded header facts for one MP4 payload. */
  final case class VideoMeta(
      format: String,
      brand: String,
      timescale: Long,
      durationUs: Long,
      width: Long,
      height: Long,
      nTracks: Long)

  private def beInt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def beLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Strict MP4 decode; None on anything not a fully consistent ISO
    * BMFF header structure (never throws). Reports the FIRST track's
    * pixel dimensions (the video track in the canonical layout). */
  def decodeMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 140) return None // ftyp + moov(mvhd) minimum
    var off = 0
    var brand: String = null
    var seenMoov = false
    var timescale = 0L
    var durUs = -1L
    var width = -1L
    var height = -1L
    var tracks = 0L
    while (off < bytes.length) {
      if (off + 8 > bytes.length) return None
      val size = beInt(bytes, off)
      if (size < 8 || off + size > bytes.length) return None
      val btype = fourCC(bytes, off + 4)
      if (off == 0) {
        if (btype != "ftyp" || size < 16 || (size - 16) % 4 != 0) return None
        brand = fourCC(bytes, off + 8)
      } else if (btype == "moov") {
        if (seenMoov) return None // exactly one movie box
        seenMoov = true
        var c = off + 8
        while (c < off + size) {
          if (c + 8 > off + size) return None
          val cs = beInt(bytes, c)
          if (cs < 8 || c + cs > off + size) return None
          fourCC(bytes, c + 4) match {
            case "mvhd" =>
              if (timescale > 0) return None // exactly one movie header
              val ver = bytes(c + 8) & 0xff
              val dur = ver match {
                case 0 =>
                  if (cs != 108) return None
                  timescale = beInt(bytes, c + 20)
                  beInt(bytes, c + 24)
                case 1 =>
                  if (cs != 120) return None
                  timescale = beInt(bytes, c + 28)
                  beLong(bytes, c + 32)
                case _ => return None
              }
              if (timescale < 1 || dur < 0) return None
              durUs = dur * 1000000L / timescale
            case "trak" =>
              tracks += 1
              var t = c + 8
              var found = false
              while (t < c + cs) {
                if (t + 8 > c + cs) return None
                val ts = beInt(bytes, t)
                if (ts < 8 || t + ts > c + cs) return None
                if (fourCC(bytes, t + 4) == "tkhd") {
                  if (found) return None // exactly one track header
                  found = true
                  val wOff = (bytes(t + 8) & 0xff) match {
                    case 0 => if (ts != 92) return None else t + 84
                    case 1 => if (ts != 104) return None else t + 96
                    case _ => return None
                  }
                  val w = beInt(bytes, wOff)
                  val h = beInt(bytes, wOff + 4)
                  // 16.16 fixed point must be integral pixels
                  if ((w & 0xffff) != 0 || (h & 0xffff) != 0) return None
                  if (width < 0) { width = w >>> 16; height = h >>> 16 }
                }
                t += ts.toInt
              }
              if (t != c + cs || !found) return None
            case _ => () // udta, iods, free... size-validated, skipped
          }
          c += cs.toInt
        }
        if (c != off + size) return None // moov children must tile exactly
        if (timescale < 1) return None // moov without mvhd
      } // mdat, free, skip... size-validated, skipped
      off += size.toInt
    }
    if (off != bytes.length || brand == null || !seenMoov ||
      tracks < 1 || width < 0) return None
    Some(VideoMeta("mp4", brand, timescale, durUs, width, height, tracks))
  }

  /** Test-fixture encoder: canonical ftyp (major brand + two compat
    * brands) + moov(mvhd v0 + one v0 trak per (w,h)) + an mdat of
    * `mdatBytes` zero bytes. All sizes closed-form:
    * 24 + 8 + 108 + 100*tracks + 8 + mdatBytes. */
  def encodeMp4(brand: String, timescale: Long, duration: Long,
      tracks: Seq[(Int, Int)], mdatBytes: Int): Array[Byte] = {
    require(brand.length == 4, s"brand must be a FourCC, got '$brand'")
    require(timescale >= 1 && timescale <= 0xffffffffL, s"timescale $timescale")
    require(duration >= 0 && duration <= 0xffffffffL, s"duration $duration")
    require(tracks.nonEmpty, "at least one track")
    require(mdatBytes >= 0)
    val total = 24 + 8 + 108 + 100 * tracks.size + 8 + mdatBytes
    val out = new Array[Byte](total)
    var off = 0
    def putBeInt(v: Long): Unit = {
      out(off) = ((v >>> 24) & 0xff).toByte; out(off + 1) = ((v >>> 16) & 0xff).toByte
      out(off + 2) = ((v >>> 8) & 0xff).toByte; out(off + 3) = (v & 0xff).toByte
      off += 4
    }
    def putCC(s: String): Unit = {
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4); off += 4
    }
    // ftyp: major brand, minor version, compat brands [brand, "iso2"]
    putBeInt(24); putCC("ftyp"); putCC(brand); putBeInt(0x200)
    putCC(brand); putCC("iso2")
    // moov
    putBeInt(8 + 108 + 100L * tracks.size); putCC("moov")
    // mvhd v0: creation/modification 0, rate 1.0, volume 1.0, unity matrix
    putBeInt(108); putCC("mvhd"); putBeInt(0) // version+flags
    putBeInt(0); putBeInt(0) // creation, modification
    putBeInt(timescale); putBeInt(duration)
    putBeInt(0x00010000L); putBeInt(0x01000000L) // rate 1.0; volume 1.0 + reserved
    putBeInt(0); putBeInt(0) // reserved 8
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(putBeInt)
    (1 to 6).foreach(_ => putBeInt(0)) // pre_defined 24
    putBeInt(tracks.size + 1L) // next_track_ID
    // traks
    tracks.zipWithIndex.foreach { case ((w, h), i) =>
      putBeInt(100); putCC("trak")
      putBeInt(92); putCC("tkhd"); putBeInt(0x000007L) // v0, flags enabled|in-movie|in-preview
      putBeInt(0); putBeInt(0) // creation, modification
      putBeInt(i + 1L) // track_ID
      putBeInt(0) // reserved
      putBeInt(duration)
      putBeInt(0); putBeInt(0) // reserved 8
      putBeInt(0) // layer + alternate_group
      putBeInt(0) // volume + reserved
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(putBeInt)
      putBeInt(w.toLong << 16); putBeInt(h.toLong << 16)
    }
    // mdat: declared size, zero payload
    putBeInt(8L + mdatBytes); putCC("mdat")
    out
  }
}
