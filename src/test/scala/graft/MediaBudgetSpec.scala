package graft

import graft.ops.{AudioCodec, ImageCodec, Multimodal, VideoCodec}

/** The size-budget gate on full-content decode, and the AVI frame
  * container. A hostile payload DECLARING huge dimensions (a
  * decompression bomb: 4 KB of header claiming 30k×30k would decode
  * to a 3.6 GB raster) must route to the corrupt/None branch from its
  * HEADER — before any raster/sample allocation exists — because an
  * OutOfMemoryError is an Error the decoders' Exception guards never
  * see. Same contract per-frame through the AVI walk.
  */
class MediaBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def realPng(w: Int, h: Int): Array[Byte] =
    ImageCodec.encodePng(w, h, (x, y) => ((x * 7 + y * 3) % 256) << 16)

  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, ((x * 11 + y * 5) % 256) << 8)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "no jpg writer")
    out.toByteArray
  }

  // ---- image budget ----

  test("decodePixels honors the pixel budget on a VALID image") {
    val png = realPng(100, 100)
    assert(ImageCodec.decodePixels(png).exists(p =>
      p.width == 100 && p.height == 100))
    // same payload, budget one pixel short of 100x100: gated, not decoded
    assert(ImageCodec.decodePixels(png, maxPixels = 9999L).isEmpty)
    assert(ImageCodec.decodePixels(png, maxPixels = 10000L).nonEmpty)
  }

  test("a bomb header (tiny payload, 30k x 30k declared) gates from the header") {
    // a structurally valid PNG header declaring 900M pixels with no
    // raster data behind it — the probe must SEE the declared dims
    // (proving the gate path runs before any full decode) and the
    // default budget must refuse it
    val bomb = ImageCodec.pngHeader(30000, 30000) ++ Array.fill(64)(0x41.toByte)
    assert(ImageCodec.probeDims(bomb).contains((30000, 30000)))
    assert(ImageCodec.decodePixels(bomb).isEmpty)
  }

  test("non-images still route to None through the probe") {
    assert(ImageCodec.probeDims("plain text".getBytes("US-ASCII")).isEmpty)
    assert(ImageCodec.decodePixels("plain text".getBytes("US-ASCII")).isEmpty)
    assert(ImageCodec.decodePixels(null).isEmpty)
    assert(ImageCodec.decodePixels(Array.emptyByteArray).isEmpty)
  }

  // ---- audio budget ----

  test("decodePcm honors the sample budget on a VALID clip") {
    val wav = AudioCodec.encodeWav(8000L,
      Array.tabulate[Short](1000)(i => (i * 13 - 500).toShort))
    assert(AudioCodec.decodePcm(wav).exists(_.samples.length == 1000))
    assert(AudioCodec.decodePcm(wav, maxSamples = 999L).isEmpty)
    assert(AudioCodec.decodePcm(wav, maxSamples = 1000L).nonEmpty)
  }

  test("a WAV header declaring 2 billion frames gates before any read") {
    // header-only payload whose data chunk CLAIMS (2^31)-1 frames (the
    // most a u32 RIFF data size can declare for 16-bit mono — 4 GB) —
    // the declared frame length must trip the budget, never readAllBytes
    val huge = AudioCodec.wavHeader(1, 8000L, 16, (1L << 31) - 1L)
    assert(AudioCodec.decodePcm(huge).isEmpty)
  }

  // ---- conf plumbing through Multimodal ----

  test("pixelStats/audioPcmStats read the session budget conf") {
    val img = Seq((1L, realPng(8, 4))).toDS()
    val wav = Seq((1L, AudioCodec.encodeWav(8000L,
      Array.tabulate[Short](64)(_.toShort)))).toDS()
    try {
      spark.conf.set(Multimodal.MaxPixelsKey, "31") // 8x4 = 32 > 31
      spark.conf.set(Multimodal.MaxSamplesKey, "63")
      assert(Multimodal.pixelStats(img).collect().head.status == "corrupt")
      assert(Multimodal.audioPcmStats(wav).collect().head.status == "corrupt")
    } finally {
      spark.conf.unset(Multimodal.MaxPixelsKey)
      spark.conf.unset(Multimodal.MaxSamplesKey)
    }
    assert(Multimodal.pixelStats(img).collect().head.status == "ok")
    assert(Multimodal.audioPcmStats(wav).collect().head.status == "ok")
  }

  // ---- AVI container ----

  test("AVI round trip with REAL MJPEG frames decodes deterministically") {
    val frames = Seq(realJpeg(16, 12), realJpeg(8, 8), realJpeg(5, 7))
    val avi = VideoCodec.encodeAvi("MJPG", 16, 12, 40000L, frames)
    val v = VideoCodec.decodeAvi(avi).get
    assert(v.handler == "MJPG" && v.width == 16 && v.height == 12 &&
      v.usPerFrame == 40000L && v.frames.size == 3)
    // every demuxed frame is a standalone JPEG the image seam decodes,
    // at the muxed dimensions
    val dims = v.frames.map(f => ImageCodec.decodePixels(f).map(p =>
      (p.width, p.height)))
    assert(dims == Seq(Some((16, 12)), Some((8, 8)), Some((5, 7))))
    // determinism: two independent decodes yield identical pixels
    val a = v.frames.map(f => ImageCodec.decodePixels(f).get.rgb.toSeq)
    val b = VideoCodec.decodeAvi(avi).get.frames
      .map(f => ImageCodec.decodePixels(f).get.rgb.toSeq)
    assert(a == b)
  }

  test("AVI with PNG frames round-trips pixels EXACTLY") {
    val f0 = realPng(6, 5)
    val avi = VideoCodec.encodeAvi("MPNG", 6, 5, 33333L, Seq(f0))
    val back = VideoCodec.decodeAvi(avi).get.frames.head
    assert(ImageCodec.decodePixels(back).get.rgb.toSeq ==
      ImageCodec.decodePixels(f0).get.rgb.toSeq)
  }

  test("odd-sized frames keep the RIFF word alignment") {
    // a 3-byte and a 5-byte chunk force pad bytes between frames; the
    // walker must step over pads, not absorb them into the next id
    val avi = VideoCodec.encodeAvi("MPNG", 1, 1, 1000L,
      Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8)))
    val v = VideoCodec.decodeAvi(avi).get
    assert(v.frames.map(_.toSeq) == Seq(Seq[Byte](1, 2, 3),
      Seq[Byte](4, 5, 6, 7, 8)))
  }

  test("frames inside a rec-list are walked through") {
    // some muxers group interleaved chunks under LIST('rec '); splice
    // one in by hand around a frame chunk
    def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def chunk(id: String, p: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(p.length.toLong) ++ p ++
        (if ((p.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    val base = VideoCodec.encodeAvi("MPNG", 1, 1, 1000L,
      Seq(Array[Byte](9, 9)))
    // rebuild: keep hdrl from base, write movi with a rec-wrapped frame
    val rec = chunk("LIST", "rec ".getBytes("US-ASCII") ++
      chunk("00dc", Array[Byte](7, 7, 7)))
    val hdrlEnd = {
      // find the movi LIST in base and cut before it (the encoder
      // layout is RIFF[12] hdrl movi, so locate 'movi')
      val s = new String(base.map(b => (b & 0xff).toChar))
      s.indexOf("movi") - 8
    }
    val body = base.slice(12, hdrlEnd) ++
      chunk("LIST", "movi".getBytes("US-ASCII") ++ rec)
    val avi = "RIFF".getBytes("US-ASCII") ++
      le32(body.length + 4L) ++ "AVI ".getBytes("US-ASCII") ++ body
    val v = VideoCodec.decodeAvi(avi).get
    assert(v.frames.map(_.toSeq) == Seq(Seq[Byte](7, 7, 7)))
  }

  test("malformed and hostile containers route to None, fast") {
    assert(VideoCodec.decodeAvi(null).isEmpty)
    assert(VideoCodec.decodeAvi("RIFFxxxx".getBytes("US-ASCII")).isEmpty)
    // hostile u32 chunk size near 2^32 must terminate (Long cursor),
    // not spin or wrap negative
    val hostile = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xf8.toByte) ++
      "AVI LIST".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      "hdrl".getBytes("US-ASCII")
    assert(VideoCodec.decodeAvi(hostile).isEmpty)
    // truncated mid-header
    val t = VideoCodec.encodeAvi("MPNG", 1, 1, 1000L,
      Seq(Array[Byte](1))).take(40)
    assert(VideoCodec.decodeAvi(t).isEmpty)
  }

  test("videoFramePixelStats routes container and frame corruption") {
    val good = realPng(4, 3)
    val avi = VideoCodec.encodeAvi("MPNG", 4, 3, 1000L,
      Seq(good, Array[Byte](0, 1, 2), good))
    val ds = Seq((1L, avi), (2L, Array[Byte](0x42))).toDS()
    val rows = Multimodal.videoFramePixelStats(ds).collect()
      .sortBy(r => (r.doc_id, r.frame_idx))
    assert(rows.map(r => (r.doc_id, r.frame_idx, r.status)).toSeq == Seq(
      (1L, 0L, "ok"), (1L, 1L, "corrupt_frame"), (1L, 2L, "ok"),
      (2L, -1L, "corrupt")))
    // frame budget applies per frame: with a 11-pixel budget the 4x3
    // frames gate to corrupt_frame as well
    try {
      spark.conf.set(Multimodal.MaxPixelsKey, "11")
      val gated = Multimodal.videoFramePixelStats(Seq((1L, avi)).toDS())
        .collect()
      assert(gated.forall(r => r.status != "ok"))
    } finally spark.conf.unset(Multimodal.MaxPixelsKey)
  }
}
