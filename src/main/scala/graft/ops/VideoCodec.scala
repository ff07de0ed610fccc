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
}
