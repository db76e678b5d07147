package graft.ops

/** Minimal ISO-BMFF (MP4/MOV, ISO/IEC 14496-12) container-metadata parser —
  * pure JVM big-endian box walking over a byte array, zero dependencies.
  *
  * This is the video twin of the r6 image (`javax.imageio`) and audio
  * (`javax.sound.sampled`) upgrades: PIXEL decode genuinely needs codecs a
  * bare JVM doesn't ship (H.264/VP9/AV1), but the container metadata a
  * training-data pipeline filters on — duration, resolution, sample count,
  * brand — lives in plain big-endian structure boxes:
  *
  *   - `ftyp`             → major brand (e.g. "isom", "mp42")
  *   - `moov/mvhd`        → movie timescale + duration (version 0: u32s;
  *                          version 1: u64 duration)
  *   - `moov/trak/tkhd`   → track width/height as 16.16 fixed point
  *   - `moov/trak/mdia/hdlr` → handler type; "vide" marks the video track
  *   - `.../mdia/minf/stbl/stsz` → sample (frame) count for that track
  *
  * Only container boxes on that path (`moov`, `trak`, `mdia`, `minf`,
  * `stbl`) are descended into; everything else — including `mdat`, which
  * at 100 TB dwarfs the metadata — is skipped by size without being read,
  * so parse cost is independent of payload size once bytes are in memory.
  * Malformed input (truncated boxes, absurd sizes, missing `moov`) yields
  * `None`, never an exception: the caller's stub fallback stays the
  * never-crash path exactly as with undecodable images/audio.
  */
object Mp4Meta {

  /** Container-level video metadata; `width`/`height`/`videoSamples` come
    * from the first `vide`-handler track (0 when the movie has none). */
  final case class Meta(
      brand: String,
      durationSec: Double,
      width: Int,
      height: Int,
      videoSamples: Long)

  private final val ContainerBoxes = Set("moov", "trak", "mdia", "minf", "stbl")

  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      val root = children(bytes, 0L, bytes.length.toLong)
      val brand = root.collectFirst { case b if b.kind == "ftyp" && b.payloadLen >= 4 =>
        str4(bytes, b.payloadOff)
      }
      val moov = root.find(_.kind == "moov")
      moov.flatMap { m =>
        val inMoov = children(bytes, m.payloadOff, m.payloadLen)
        val dur = inMoov.collectFirst { case b if b.kind == "mvhd" => mvhdDuration(bytes, b) }.flatten
        val vide = inMoov.filter(_.kind == "trak").flatMap(trackMeta(bytes, _))
          .find(_._4) // prefer the video-handler track
          .orElse(inMoov.filter(_.kind == "trak").flatMap(trackMeta(bytes, _)).headOption)
        dur.map { d =>
          val (w, h, n, _) = vide.getOrElse((0, 0, 0L, false))
          Meta(brand.getOrElse(""), d, w, h, n)
        }
      }
    } catch { case _: ArrayIndexOutOfBoundsException => None }

  /** One addressable media sample (frame, for a video track): its absolute
    * byte range inside the container and whether it is a sync sample
    * (keyframe — decodable without reference frames). */
  final case class SampleRange(sampleNo: Long, offset: Long, size: Long, sync: Boolean)

  /** Hostile-input guard: never walk more than this many samples/chunks,
    * whatever the tables claim. */
  private final val MaxSamples = 1 << 20

  /** Byte ranges of the first `k` samples (frames) of the video track —
    * `syncOnly = true` restricts to keyframes, the frame-sampling shape a
    * training pipeline actually wants (a non-sync sample is undecodable
    * alone). This is the full sample-table resolution chain — `stsz`
    * (sizes) × `stsc` (sample→chunk runs) × `stco`/`co64` (chunk offsets)
    * × `stss` (sync numbers; absent ⇒ every sample is sync per the spec) —
    * so a reader can pluck exactly k compressed frames out of a remote
    * object with k ranged reads, never touching the rest of `mdat`.
    * Malformed or truncated tables yield what could be resolved safely
    * (possibly Nil), never an exception. */
  def sampleRanges(bytes: Array[Byte], k: Int, syncOnly: Boolean = false): Seq[SampleRange] =
    try {
      if (k <= 0) return Nil
      val stblOpt = for {
        moov <- children(bytes, 0L, bytes.length.toLong).find(_.kind == "moov")
        traks = children(bytes, moov.payloadOff, moov.payloadLen).filter(_.kind == "trak")
        trak <- traks.find(isVideoTrak(bytes, _)).orElse(traks.headOption)
        mdia <- children(bytes, trak.payloadOff, trak.payloadLen).find(_.kind == "mdia")
        minf <- children(bytes, mdia.payloadOff, mdia.payloadLen).find(_.kind == "minf")
        stbl <- children(bytes, minf.payloadOff, minf.payloadLen).find(_.kind == "stbl")
      } yield children(bytes, stbl.payloadOff, stbl.payloadLen)
      stblOpt match {
        case None => Nil
        case Some(boxes) =>
          val stsz = boxes.find(_.kind == "stsz")
          val stsc = boxes.find(_.kind == "stsc")
          val stco = boxes.find(_.kind == "stco")
          val co64 = boxes.find(_.kind == "co64")
          if (stsz.isEmpty || stsc.isEmpty || (stco.isEmpty && co64.isEmpty)) return Nil
          val sz = stsz.get
          if (sz.payloadLen < 12) return Nil
          val fixedSize = u32(bytes, sz.payloadOff + 4)
          val nSamples = math.min(u32(bytes, sz.payloadOff + 8), MaxSamples.toLong)
          def sampleSize(n: Long): Option[Long] = // n is 1-based
            if (n < 1 || n > nSamples) None
            else if (fixedSize != 0L) Some(fixedSize)
            else {
              val p = sz.payloadOff + 12 + 4 * (n - 1)
              if (p + 4 <= sz.payloadOff + sz.payloadLen) Some(u32(bytes, p)) else None
            }
          // chunk offsets (stco: u32 each; co64: u64 each)
          val (coBox, coWidth) = stco.map((_, 4L)).getOrElse((co64.get, 8L))
          if (coBox.payloadLen < 8) return Nil
          val nChunks = math.min(u32(bytes, coBox.payloadOff + 4), MaxSamples.toLong)
          def chunkOffset(c: Long): Option[Long] = { // c is 1-based
            if (c < 1 || c > nChunks) return None
            val p = coBox.payloadOff + 8 + coWidth * (c - 1)
            if (p + coWidth > coBox.payloadOff + coBox.payloadLen) None
            else {
              val v = if (coWidth == 4L) u32(bytes, p) else u64(bytes, p)
              // a co64 offset with the top bit set comes back negative from
              // u64 — not addressable by any reader; treat as malformed and
              // skip the chunk, same as a truncated table
              if (v < 0) None else Some(v)
            }
          }
          // stsc runs: (first_chunk, samples_per_chunk); a run covers chunks
          // up to the next entry's first_chunk (exclusive), the last to nChunks
          val sc = stsc.get
          if (sc.payloadLen < 8) return Nil
          val nRuns = math.min(u32(bytes, sc.payloadOff + 4), MaxSamples.toLong).toInt
          val runs = (0 until nRuns).flatMap { i =>
            val p = sc.payloadOff + 8 + 12L * i
            if (p + 12 <= sc.payloadOff + sc.payloadLen)
              Some((u32(bytes, p), u32(bytes, p + 4))) else None
          }
          // sync sample numbers; stss absent ⇒ all samples are sync
          val syncSet = boxes.find(_.kind == "stss").map { ss =>
            if (ss.payloadLen < 8) Set.empty[Long]
            else {
              val n = math.min(u32(bytes, ss.payloadOff + 4), MaxSamples.toLong).toInt
              (0 until n).flatMap { i =>
                val p = ss.payloadOff + 8 + 4L * i
                if (p + 4 <= ss.payloadOff + ss.payloadLen) Some(u32(bytes, p)) else None
              }.toSet
            }
          }
          def isSync(n: Long) = syncSet.forall(_.contains(n))
          // walk chunks in order, resolving each sample's (offset, size)
          val out = Seq.newBuilder[SampleRange]
          var taken = 0
          var sampleNo = 1L
          var run = 0
          var chunk = 1L
          var guard = 0
          while (taken < k && sampleNo <= nSamples && chunk <= nChunks &&
              runs.nonEmpty && guard < MaxSamples) {
            while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
            val perChunk = runs(run)._2
            chunkOffset(chunk) match {
              case None => guard = MaxSamples // unreadable table: stop cleanly
              case Some(base) =>
                var within = 0L
                var cursor = base
                while (taken < k && within < perChunk && sampleNo <= nSamples &&
                    guard < MaxSamples) {
                  sampleSize(sampleNo) match {
                    case None => guard = MaxSamples
                    case Some(s) =>
                      if (!syncOnly || isSync(sampleNo)) {
                        out += SampleRange(sampleNo, cursor, s, isSync(sampleNo))
                        taken += 1
                      }
                      cursor += s
                      within += 1
                      sampleNo += 1
                      guard += 1
                  }
                }
            }
            chunk += 1
          }
          out.result()
      }
    } catch { case _: ArrayIndexOutOfBoundsException => Nil }

  private def isVideoTrak(bytes: Array[Byte], trak: Box): Boolean =
    children(bytes, trak.payloadOff, trak.payloadLen).find(_.kind == "mdia").exists { m =>
      children(bytes, m.payloadOff, m.payloadLen).exists(b =>
        b.kind == "hdlr" && b.payloadLen >= 12 && str4(bytes, b.payloadOff + 8) == "vide")
    }

  // ---- box walking ---------------------------------------------------------

  private final case class Box(kind: String, payloadOff: Long, payloadLen: Long)

  /** All boxes directly inside [off, off+len); stops cleanly at anything
    * truncated or nonsensical rather than throwing. */
  private def children(bytes: Array[Byte], off: Long, len: Long): List[Box] = {
    val end = off + len
    val out = List.newBuilder[Box]
    var p = off
    var ok = true
    while (ok && p + 8 <= end) {
      val size32 = u32(bytes, p)
      val kind = str4(bytes, p + 4)
      // size 1 → 64-bit largesize follows the type; size 0 → box runs to end
      val (headerLen, boxLen) =
        if (size32 == 1L && p + 16 <= end) (16L, u64(bytes, p + 8))
        else if (size32 == 0L) (8L, end - p)
        else (8L, size32)
      if (boxLen < headerLen || p + boxLen > end) ok = false
      else {
        out += Box(kind, p + headerLen, boxLen - headerLen)
        p += boxLen
      }
    }
    out.result()
  }

  /** Movie duration in seconds from `mvhd` (duration / timescale). */
  private def mvhdDuration(bytes: Array[Byte], b: Box): Option[Double] = {
    if (b.payloadLen < 4) return None
    val version = bytes(idx(b.payloadOff)) & 0xff
    if (version == 0 && b.payloadLen >= 20) {
      val timescale = u32(bytes, b.payloadOff + 12)
      val duration = u32(bytes, b.payloadOff + 16)
      if (timescale > 0) Some(duration.toDouble / timescale) else None
    } else if (version == 1 && b.payloadLen >= 32) {
      val timescale = u32(bytes, b.payloadOff + 20)
      val duration = u64(bytes, b.payloadOff + 24)
      // top-bit-set u64 duration reads back negative — malformed, like a
      // truncated box
      if (timescale > 0 && duration >= 0) Some(duration.toDouble / timescale) else None
    } else None
  }

  /** (width, height, sampleCount, isVideoHandler) for one `trak`. */
  private def trackMeta(bytes: Array[Byte], trak: Box): Option[(Int, Int, Long, Boolean)] = {
    val inTrak = children(bytes, trak.payloadOff, trak.payloadLen)
    val wh = inTrak.collectFirst { case b if b.kind == "tkhd" => tkhdSize(bytes, b) }.flatten
    val mdia = inTrak.find(_.kind == "mdia")
    val inMdia = mdia.map(m => children(bytes, m.payloadOff, m.payloadLen)).getOrElse(Nil)
    val isVideo = inMdia.exists(b => b.kind == "hdlr" && b.payloadLen >= 12 &&
      str4(bytes, b.payloadOff + 8) == "vide")
    val samples = (for {
      minf <- inMdia.find(_.kind == "minf")
      stbl <- children(bytes, minf.payloadOff, minf.payloadLen).find(_.kind == "stbl")
      stsz <- children(bytes, stbl.payloadOff, stbl.payloadLen).find(_.kind == "stsz")
      if stsz.payloadLen >= 12
    } yield u32(bytes, stsz.payloadOff + 8)).getOrElse(0L)
    wh match {
      case Some((w, h)) => Some((w, h, samples, isVideo))
      case None if mdia.isDefined => Some((0, 0, samples, isVideo))
      case None => None
    }
  }

  /** Track width/height from `tkhd` — 16.16 fixed point in the last 8
    * payload bytes (after the version-dependent ids/times and the 36-byte
    * transform matrix); integer part only. */
  private def tkhdSize(bytes: Array[Byte], b: Box): Option[(Int, Int)] = {
    if (b.payloadLen < 4) return None
    // offset of width within the payload: 4 (version/flags) + the
    // version-dependent ids/times block (20 for v0, 32 for v1) + 8 reserved
    // + layer/alternate_group/volume/reserved (8) + 36-byte matrix
    val version = bytes(idx(b.payloadOff)) & 0xff
    val fixedLen = if (version == 1) 88L else 76L
    if (b.payloadLen < fixedLen + 8) None
    else Some(((u32(bytes, b.payloadOff + fixedLen) >> 16).toInt,
      (u32(bytes, b.payloadOff + fixedLen + 4) >> 16).toInt))
  }

  // ---- big-endian primitives ----------------------------------------------

  private def idx(p: Long): Int = {
    if (p < 0 || p > Int.MaxValue) throw new ArrayIndexOutOfBoundsException(p.toString)
    p.toInt
  }
  private def u32(bytes: Array[Byte], p: Long): Long = {
    val i = idx(p)
    ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
      ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
  }
  private def u64(bytes: Array[Byte], p: Long): Long =
    (u32(bytes, p) << 32) | u32(bytes, p + 4)
  private def str4(bytes: Array[Byte], p: Long): String = {
    val i = idx(p)
    new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }
}
