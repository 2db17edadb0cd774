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

  /** The sample-table facts of one video track — the index every frame
    * read goes through in ISO BMFF: media timescale (mdhd), the
    * time-to-sample runs (stts: run length × tick delta), per-sample
    * byte sizes (stsz), and the byte offset of the single chunk holding
    * the samples (stco, canonical one-chunk layout per stsc). */
  final case class SampleTable(
      mediaTimescale: Long,
      sttsRuns: Seq[(Long, Long)],
      sampleSizes: Seq[Long],
      chunkOffset: Long)

  /** Strict sample-table decode: [[decodeMp4]]'s whole-file validation
    * first, then a targeted walk into the FIRST trak carrying an
    * mdia/minf/stbl chain. The stbl must hold exactly one each of
    * stts/stsz/stsc/stco, the stsc must describe the canonical
    * single-chunk layout (one entry: first_chunk=1, all samples,
    * description 1), stts run totals must equal the stsz sample count,
    * and chunk_offset + Σ sizes must land inside the file — an index
    * pointing past the mdat is structural corruption, not data. None
    * when no track carries a sample table or any check fails. */
  def decodeSampleTable(bytes: Array[Byte]): Option[SampleTable] =
    decodeMp4(bytes).flatMap { _ =>
      // box tiling is already proven; this walk only locates + parses
      var off = 0
      var found: Option[SampleTable] = None
      while (off < bytes.length && found.isEmpty) {
        val size = beInt(bytes, off)
        if (fourCC(bytes, off + 4) == "moov") {
          var c = off + 8
          while (c < off + size && found.isEmpty) {
            val cs = beInt(bytes, c)
            if (fourCC(bytes, c + 4) == "trak") found = parseTrakStbl(bytes, c, cs)
            c += cs.toInt
          }
        }
        off += size.toInt
      }
      found
    }

  /** Parse one trak's mdia/minf/stbl chain; None if absent or invalid. */
  private def parseTrakStbl(b: Array[Byte], trakOff: Long, trakSize: Long): Option[SampleTable] = {
    def child(parentOff: Long, parentSize: Long, cc: String): Option[(Long, Long)] = {
      var c = parentOff + 8
      var hit: Option[(Long, Long)] = None
      while (c < parentOff + parentSize) {
        val cs = beInt(b, c.toInt)
        if (fourCC(b, c.toInt + 4) == cc) {
          if (hit.isDefined) return None // exactly one of each
          hit = Some((c, cs))
        }
        c += cs
      }
      hit
    }
    for {
      (mdiaOff, mdiaSize) <- child(trakOff, trakSize, "mdia")
      (mdhdOff, mdhdSize) <- child(mdiaOff, mdiaSize, "mdhd")
      if mdhdSize == 32 && (b(mdhdOff.toInt + 8) & 0xff) == 0
      tsc = beInt(b, mdhdOff.toInt + 20)
      if tsc >= 1
      (minfOff, minfSize) <- child(mdiaOff, mdiaSize, "minf")
      (stblOff, stblSize) <- child(minfOff, minfSize, "stbl")
      (sttsOff, sttsSize) <- child(stblOff, stblSize, "stts")
      (stszOff, stszSize) <- child(stblOff, stblSize, "stsz")
      (stscOff, stscSize) <- child(stblOff, stblSize, "stsc")
      (stcoOff, stcoSize) <- child(stblOff, stblSize, "stco")
      st <- parseTables(b, sttsOff.toInt, sttsSize, stszOff.toInt, stszSize,
        stscOff.toInt, stscSize, stcoOff.toInt, stcoSize, tsc)
    } yield st
  }

  private def parseTables(b: Array[Byte], sttsOff: Int, sttsSize: Long,
      stszOff: Int, stszSize: Long, stscOff: Int, stscSize: Long,
      stcoOff: Int, stcoSize: Long, tsc: Long): Option[SampleTable] = {
    // stts: fullbox v0 + entry_count + (count, delta) pairs, exact size
    if ((b(sttsOff + 8) & 0xff) != 0) return None
    val ne = beInt(b, sttsOff + 12)
    if (ne < 1 || sttsSize != 16 + 8 * ne) return None
    val runs = (0L until ne).map { i =>
      val p = sttsOff + 16 + 8 * i.toInt
      (beInt(b, p), beInt(b, p + 4))
    }
    if (runs.exists { case (c, d) => c < 1 || d < 0 }) return None
    val total = runs.map(_._1).sum
    // stsz: default size or per-sample table; count must match stts
    if ((b(stszOff + 8) & 0xff) != 0) return None
    val defSize = beInt(b, stszOff + 12)
    val count = beInt(b, stszOff + 16)
    if (count != total) return None
    val sizes =
      if (defSize > 0) {
        if (stszSize != 20) return None
        Seq.fill(count.toInt)(defSize)
      } else {
        if (stszSize != 20 + 4 * count) return None
        (0L until count).map(i => beInt(b, stszOff + 20 + 4 * i.toInt))
      }
    // stsc: canonical one-chunk layout, exactly one entry
    if ((b(stscOff + 8) & 0xff) != 0 || stscSize != 28) return None
    if (beInt(b, stscOff + 12) != 1 || beInt(b, stscOff + 16) != 1 ||
      beInt(b, stscOff + 20) != count || beInt(b, stscOff + 24) != 1) return None
    // stco: one chunk offset, and the samples must land inside the file
    if ((b(stcoOff + 8) & 0xff) != 0 || stcoSize != 20) return None
    if (beInt(b, stcoOff + 12) != 1) return None
    val chunkOff = beInt(b, stcoOff + 16)
    if (chunkOff + sizes.sum > b.length) return None
    Some(SampleTable(tsc, runs, sizes, chunkOff))
  }

  /** Layout constants for the optional first-trak sample-table chain:
    * stbl = 8 + stts(16+8e) + stsz(20+4n) + stsc(28) + stco(20),
    * minf = 8 + stbl, mdia = 8 + mdhd(32) + minf. */
  private def mdiaSizeFor(nRuns: Int, nSamples: Int): Int =
    8 + 32 + 8 + 8 + (16 + 8 * nRuns) + (20 + 4 * nSamples) + 28 + 20

  /** Test-fixture encoder: canonical ftyp (major brand + two compat
    * brands) + moov(mvhd v0 + one v0 trak per (w,h)) + an mdat of
    * `mdatBytes` zero bytes. All sizes closed-form:
    * 24 + 8 + 108 + 100*tracks + 8 + mdatBytes (plus the mdia chain on
    * the first trak when `stbl` is given — then mdatBytes must cover
    * the declared sample bytes, and the stco offset points at the mdat
    * payload). */
  def encodeMp4(brand: String, timescale: Long, duration: Long,
      tracks: Seq[(Int, Int)], mdatBytes: Int,
      stbl: Option[(Long, Seq[(Long, Long)], Seq[Long])] = None): Array[Byte] = {
    require(brand.length == 4, s"brand must be a FourCC, got '$brand'")
    require(timescale >= 1 && timescale <= 0xffffffffL, s"timescale $timescale")
    require(duration >= 0 && duration <= 0xffffffffL, s"duration $duration")
    require(tracks.nonEmpty, "at least one track")
    require(mdatBytes >= 0)
    stbl.foreach { case (tsc, runs, sizes) =>
      require(tsc >= 1 && runs.nonEmpty && runs.map(_._1).sum == sizes.length)
      require(sizes.sum <= mdatBytes, "mdat must hold the declared samples")
    }
    val mdiaExtra = stbl.map { case (_, runs, sizes) =>
      mdiaSizeFor(runs.length, sizes.length)
    }.getOrElse(0)
    val total = 24 + 8 + 108 + 100 * tracks.size + mdiaExtra + 8 + mdatBytes
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
    putBeInt(8 + 108 + 100L * tracks.size + mdiaExtra); putCC("moov")
    // mvhd v0: creation/modification 0, rate 1.0, volume 1.0, unity matrix
    putBeInt(108); putCC("mvhd"); putBeInt(0) // version+flags
    putBeInt(0); putBeInt(0) // creation, modification
    putBeInt(timescale); putBeInt(duration)
    putBeInt(0x00010000L); putBeInt(0x01000000L) // rate 1.0; volume 1.0 + reserved
    putBeInt(0); putBeInt(0) // reserved 8
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(putBeInt)
    (1 to 6).foreach(_ => putBeInt(0)) // pre_defined 24
    putBeInt(tracks.size + 1L) // next_track_ID
    // traks (the first carries the mdia/stbl chain when requested)
    tracks.zipWithIndex.foreach { case ((w, h), i) =>
      val extra = if (i == 0) mdiaExtra else 0
      putBeInt(100L + extra); putCC("trak")
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
      if (i == 0) stbl.foreach { case (tsc, runs, sizes) =>
        val n = sizes.length
        val e = runs.length
        putBeInt(mdiaExtra.toLong); putCC("mdia")
        // mdhd v0: creation/modification 0, media timescale/duration,
        // language (und) + pre_defined
        putBeInt(32); putCC("mdhd"); putBeInt(0)
        putBeInt(0); putBeInt(0)
        putBeInt(tsc); putBeInt(runs.map { case (c, d) => c * d }.sum)
        putBeInt(0x55c40000L)
        putBeInt((mdiaExtra - 40).toLong); putCC("minf")
        putBeInt((mdiaExtra - 48).toLong); putCC("stbl")
        putBeInt(16L + 8 * e); putCC("stts"); putBeInt(0); putBeInt(e.toLong)
        runs.foreach { case (c, d) => putBeInt(c); putBeInt(d) }
        putBeInt(20L + 4 * n); putCC("stsz"); putBeInt(0)
        putBeInt(0) // per-sample sizes follow
        putBeInt(n.toLong)
        sizes.foreach(putBeInt)
        putBeInt(28); putCC("stsc"); putBeInt(0); putBeInt(1)
        putBeInt(1); putBeInt(n.toLong); putBeInt(1)
        putBeInt(20); putCC("stco"); putBeInt(0); putBeInt(1)
        putBeInt(total.toLong - mdatBytes) // the mdat payload offset
      }
    }
    // mdat: declared size, zero payload
    putBeInt(8L + mdatBytes); putCC("mdat")
    out
  }
}
