package graft.ops

/** Pure-JVM ISO-BMFF (MP4/MOV) header codec — the video analog of
  * [[ImageCodec]]/[[AudioCodec]]: REAL container metadata decode for
  * the multimodal seam without ffmpeg. Walks the box tree
  * ([size u32][fourcc][payload], big-endian; size 1 = 64-bit
  * largesize follows, size 0 = to-end-of-file) to `ftyp` for the
  * brand and into `moov` for `mvhd` (timescale/duration, v0 and v1
  * layouts) and `trak`→`tkhd` (16.16 fixed-point presentation
  * width/height, v0 and v1). Fixed-offset parsing is wrong here for
  * the same reason as RIFF: real muxers interleave `free`/`udta`/
  * `iods` boxes anywhere, so only the declared-size walk is correct —
  * and at 100 TB the point is precisely that a range-read of the
  * leading bytes yields the metadata without touching `mdat`.
  */
object VideoCodec {

  final case class VideoMeta(brand: String, timescale: Long,
      duration: Long, width: Long, height: Long) {
    /** Exact integer duration in µs (floor). */
    def durationUs: Long =
      if (timescale <= 0) -1L else duration * 1000000L / timescale
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the sibling boxes of [from, until) invoking f(type, payloadFrom,
    * payloadUntil); stops at the first malformed size. The cursor is a
    * Long so a hostile 32-bit size walks past the buffer and ends the
    * loop instead of wrapping negative.
    */
  private def walk(b: Array[Byte], from: Long, until: Long)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val at = i.toInt
      val size32 = u32(b, at)
      val tp = tag(b, at + 4)
      val (hdr, size): (Long, Long) =
        if (size32 == 1L && i + 16 <= until) (16L, u64(b, at + 8))
        else if (size32 == 0L) (8L, until - i) // box runs to the end
        else (8L, size32)
      if (size < hdr || i + size > until) return // malformed: stop
      f(tp, (i + hdr).toInt, (i + size).toInt)
      i += size
    }
  }

  /** Decode MP4 metadata from (at least) the leading bytes through
    * `moov`. None for non-BMFF / malformed payloads — callers route
    * those to the malformed sink like the other decoders.
    */
  def decodeMeta(b: Array[Byte]): Option[VideoMeta] = {
    if (b == null || b.length < 12 || tag(b, 4) != "ftyp") return None
    var brand: String = null
    var timescale = -1L; var duration = -1L
    var width = -1L; var height = -1L
    walk(b, 0L, b.length.toLong) { (tp, from, until) =>
      tp match {
        case "ftyp" if until - from >= 4 => brand = tag(b, from)
        case "moov" =>
          walk(b, from.toLong, until.toLong) { (mtp, mfrom, muntil) =>
            mtp match {
              case "mvhd" if muntil - mfrom >= 4 =>
                val v = b(mfrom) & 0xff
                if (v == 0 && muntil - mfrom >= 20) {
                  timescale = u32(b, mfrom + 12)
                  duration = u32(b, mfrom + 16)
                } else if (v == 1 && muntil - mfrom >= 32) {
                  timescale = u32(b, mfrom + 20)
                  duration = u64(b, mfrom + 24)
                }
              case "trak" =>
                walk(b, mfrom.toLong, muntil.toLong) { (ttp, tfrom, tuntil) =>
                  if (ttp == "tkhd" && tuntil - tfrom >= 4) {
                    val v = b(tfrom) & 0xff
                    // width/height are the LAST 8 bytes of the fixed
                    // v0 (84) / v1 (96) payload, 16.16 fixed point
                    val need = if (v == 0) 84 else 96
                    if (tuntil - tfrom >= need) {
                      width = u32(b, tfrom + need - 8) >> 16
                      height = u32(b, tfrom + need - 4) >> 16
                    }
                  }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    if (brand == null || timescale <= 0) None
    else Some(VideoMeta(brand, timescale, duration, width, height))
  }

  // ---- encoder (fixture/stub side) ----

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v)
  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ fourcc(tp) ++ payload

  /** Structurally real MP4 header: ftyp + a `free` box (so decoders
    * must actually walk) + moov{free, mvhd, trak{tkhd}}. `version`
    * selects the v0 (32-bit times) or v1 (64-bit) layouts in BOTH
    * mvhd and tkhd. No mdat — metadata must never need one.
    */
  def mp4Header(timescale: Long, duration: Long, width: Long,
      height: Long, version: Int = 0): Array[Byte] = {
    require(version == 0 || version == 1, "version must be 0 or 1")
    val ftyp = box("ftyp", fourcc("isom") ++ be32(512L) ++
      fourcc("isom") ++ fourcc("mp41"))
    val mvhd = box("mvhd",
      (if (version == 0)
        Array(0.toByte, 0.toByte, 0.toByte, 0.toByte) ++ // v0 + flags
          be32(0L) ++ be32(0L) ++ be32(timescale) ++ be32(duration)
      else
        Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
          be64(0L) ++ be64(0L) ++ be32(timescale) ++ be64(duration)) ++
        be32(0x00010000L) ++ Array(0x01.toByte, 0x00.toByte) ++ // rate, volume
        new Array[Byte](10) ++ new Array[Byte](36) ++ // reserved, matrix
        new Array[Byte](24) ++ be32(2L)) // predefined, next track id
    val tkhd = box("tkhd",
      (if (version == 0)
        Array(0.toByte, 0.toByte, 0.toByte, 7.toByte) ++ // v0, enabled
          be32(0L) ++ be32(0L) ++ be32(1L) ++ be32(0L) ++ be32(duration)
      else
        Array(1.toByte, 0.toByte, 0.toByte, 7.toByte) ++
          be64(0L) ++ be64(0L) ++ be32(1L) ++ be32(0L) ++ be64(duration)) ++
        new Array[Byte](8) ++ // reserved
        new Array[Byte](2) ++ new Array[Byte](2) ++ new Array[Byte](2) ++
        new Array[Byte](2) ++ // layer, alternate, volume, reserved
        new Array[Byte](36) ++ // matrix
        be32(width << 16) ++ be32(height << 16))
    val moov = box("moov",
      box("free", new Array[Byte](4)) ++ mvhd ++ box("trak", tkhd))
    ftyp ++ box("free", new Array[Byte](6)) ++ moov
  }

  // ---- RIFF-AVI frame container (MJPEG / PNG-in-AVI) ----
  //
  // The one in-JDK route to real video FRAME content: an AVI is a
  // RIFF tree whose `movi` list carries one compressed chunk per
  // frame ('00dc'), and with an MJPEG ('MJPG') or PNG ('MPNG')
  // handler each chunk is a standalone still image that
  // [[ImageCodec.decodePixels]] already decodes — so frame-level
  // pixel work needs only this container walk, no ffmpeg. Same
  // parsing discipline as the WAV walker in [[AudioCodec]]: declared
  // chunk sizes with a Long cursor (a hostile 32-bit size walks past
  // the buffer and stops, never wraps negative), word-aligned pads,
  // no fixed offsets.

  /** A parsed AVI: stream handler fourcc, declared dimensions, frame
    * interval (µs, from avih), and the raw per-frame payloads in
    * stream order. Frame payloads are SLICES of the container —
    * decoding them is the caller's (budgeted) step.
    */
  final case class AviVideo(handler: String, width: Int, height: Int,
      usPerFrame: Long, frames: Vector[Array[Byte]])

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Walk RIFF sibling chunks in [from, until): f(id, payloadFrom,
    * payloadUntil). LIST/RIFF payloads INCLUDE their 4-byte list type
    * (callers read it and recurse past it). Stops at the first
    * malformed size.
    */
  private def riffWalk(b: Array[Byte], from: Long, until: Long)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val at = i.toInt
      val id = tag(b, at)
      val size = u32le(b, at + 4)
      if (i + 8 + size > until) return // malformed / hostile: stop
      f(id, (i + 8).toInt, (i + 8 + size).toInt)
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
  }

  /** Decode an AVI container to its header metadata + frame payload
    * slices. None for non-AVI / malformed payloads (no `avih`, no
    * `movi`) — callers route those to the corrupt branch like every
    * other decoder here. Frames are the '##dc'/'##db' chunks of the
    * `movi` list in order; `rec ` sub-lists (interleave grouping some
    * muxers emit) are walked through.
    */
  def decodeAvi(b: Array[Byte]): Option[AviVideo] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" ||
        tag(b, 8) != "AVI ") return None
    var usPerFrame = -1L; var w = -1; var h = -1
    var handler: String = null
    val frames = Vector.newBuilder[Array[Byte]]
    var sawMovi = false
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    def moviWalk(from: Long, until: Long): Unit =
      riffWalk(b, from, until) { (id, cf, cu) =>
        if (isFrameChunk(id)) frames += java.util.Arrays.copyOfRange(b, cf, cu)
        else if (id == "LIST" && cu - cf >= 4 && tag(b, cf) == "rec ")
          moviWalk(cf + 4L, cu.toLong)
      }
    riffWalk(b, 12L, b.length.toLong) { (id, cf, cu) =>
      if (id == "LIST" && cu - cf >= 4) tag(b, cf) match {
        case "hdrl" =>
          riffWalk(b, cf + 4L, cu.toLong) { (hid, hf, hu) =>
            if (hid == "avih" && hu - hf >= 40) {
              usPerFrame = u32le(b, hf)
              w = u32le(b, hf + 32).toInt; h = u32le(b, hf + 36).toInt
            } else if (hid == "LIST" && hu - hf >= 4 &&
                tag(b, hf) == "strl") {
              riffWalk(b, hf + 4L, hu.toLong) { (sid, sf, su) =>
                if (sid == "strh" && su - sf >= 8 &&
                    tag(b, sf) == "vids" && handler == null)
                  handler = tag(b, sf + 4)
              }
            }
          }
        case "movi" =>
          sawMovi = true
          moviWalk(cf + 4L, cu.toLong)
        case _ => ()
      }
    }
    if (usPerFrame < 0 || !sawMovi) None
    else Some(AviVideo(if (handler == null) "????" else handler,
      w, h, usPerFrame, frames.result()))
  }

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if ((payload.length & 1) == 1) Array(0.toByte)
      else Array.emptyByteArray
    fourcc(id) ++ le32(payload.length.toLong) ++ payload ++ pad
  }
  private def riffList(listType: String, payload: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourcc(listType) ++ payload)

  /** Encode a structurally real AVI around pre-encoded still-image
    * frames (JPEGs for 'MJPG', PNGs for 'MPNG'): RIFF('AVI ') {
    * LIST(hdrl){avih, LIST(strl){strh,strf}}, LIST(movi){00dc…} }.
    * No idx1 index — players want one, decoders must not need it
    * (ODML-less AVIs are valid). [[decodeAvi]] is the independent
    * walker for the round trip; frame content round-trips through
    * [[ImageCodec]].
    */
  def encodeAvi(handler: String, width: Int, height: Int,
      usPerFrame: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(handler.length == 4, s"handler must be a fourcc, got '$handler'")
    require(usPerFrame > 0, s"need usPerFrame > 0, got $usPerFrame")
    val maxBuf = frames.foldLeft(0)((m, f) => math.max(m, f.length))
    val avih = riffChunk("avih",
      le32(usPerFrame) ++ le32(0L) ++ le32(0L) ++ le32(0x10L) ++
        le32(frames.size.toLong) ++ le32(0L) ++ le32(1L) ++
        le32(maxBuf.toLong) ++ le32(width.toLong) ++ le32(height.toLong) ++
        le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L))
    val strh = riffChunk("strh",
      fourcc("vids") ++ fourcc(handler) ++ le32(0L) ++
        le16(0) ++ le16(0) ++ le32(0L) ++
        le32(usPerFrame) ++ le32(1000000L) ++ // scale/rate = frame interval
        le32(0L) ++ le32(frames.size.toLong) ++ le32(maxBuf.toLong) ++
        le32(0xffffffffL) ++ le32(0L) ++
        le16(0) ++ le16(0) ++ le16(width) ++ le16(height))
    val strf = riffChunk("strf", // BITMAPINFOHEADER
      le32(40L) ++ le32(width.toLong) ++ le32(height.toLong) ++
        le16(1) ++ le16(24) ++ fourcc(handler) ++
        le32(width.toLong * height * 3) ++ le32(0L) ++ le32(0L) ++
        le32(0L) ++ le32(0L))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi",
      frames.map(f => riffChunk("00dc", f))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length.toLong) ++ body
  }
}
