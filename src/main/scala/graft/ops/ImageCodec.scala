package graft.ops

/** Pure-JVM image header parsing — the real piece of the multimodal
  * decode seam. Reads format + dimensions straight from the payload
  * bytes (PNG IHDR, JPEG SOF, GIF logical screen descriptor), no
  * native codec libraries. This is the scalable shape for metadata
  * extraction at 100 TB: a header parse touches the first few hundred
  * bytes per object, where a full `javax.imageio.ImageIO.read` decode
  * would materialize every raster (ImageIO remains the in-JDK option
  * for the full-decode slot in [[Multimodal.decodePartitioned]]).
  *
  * Reference scope note: the reference engine has no media handling —
  * this extends the LLM-training-data surface (multimodal columns)
  * with a working decoder instead of the earlier stub.
  */
object ImageCodec {

  /** ImageIO's default stream cache is FILE-backed: every
    * `ImageIO.read`/`write`/`createImageInputStream` call creates and
    * deletes a temp file. Single-threaded that is mere overhead; on a
    * many-core executor running parallel decode tasks it serializes
    * the whole stage on temp-file churn (measured r17: a 32-task
    * decode stage ran 3× SLOWER than 1 task until this flip). All our
    * payloads are in-memory byte arrays, so the memory cache is
    * strictly better. JVM-global, set once on first use of any codec
    * entry point in this object.
    */
  javax.imageio.ImageIO.setUseCache(false)

  final case class ImageMeta(format: String, width: Int, height: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse format + dimensions from the payload head. None when the
    * bytes are not a recognized image (or are truncated before the
    * size fields) — the caller routes those to its malformed branch.
    */
  def decodeMeta(bytes: Array[Byte]): Option[ImageMeta] =
    if (bytes == null) None
    else png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes))

  /** PNG: 8-byte signature, first chunk must be IHDR; width/height are
    * big-endian u32 at offsets 16 and 20.
    */
  private def png(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 24) return None
    if (!b.take(8).sameElements(PngSig)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = u32be(b, 16); val h = u32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageMeta("png", w.toInt, h.toInt))
  }

  /** JPEG: FF D8, then marker segments; the first SOFn (C0-CF minus
    * C4/C8/CC) carries [len][precision][height u16][width u16].
    */
  private def jpeg(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
      // skip fill bytes (FF FF ... marker)
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 1 // standalone marker, no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF
      } else {
        if (j + 2 >= b.length) return None
        val len = u16be(b, j + 1)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (j + 7 >= b.length) return None
          val h = u16be(b, j + 4); val w = u16be(b, j + 6)
          return if (w > 0 && h > 0) Some(ImageMeta("jpeg", w, h)) else None
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** GIF87a/89a: width/height are little-endian u16 at offsets 6/8. */
  private def gif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w > 0 && h > 0) Some(ImageMeta("gif", w, h)) else None
  }

  // ---- header synthesizers (fixtures/specs: structurally valid
  // headers, not full images — the decoder above only reads headers) ----

  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    out.write(Array[Byte](0, 0, 0, 13), 0, 4) // IHDR length
    out.write('I'); out.write('H'); out.write('D'); out.write('R')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h)
    out.write(8); out.write(2); out.write(0); out.write(0); out.write(0)
    out.write(Array[Byte](0, 0, 0, 0), 0, 4) // CRC placeholder (not validated)
    out.toByteArray
  }

  // ---- full-raster codec (javax.imageio, in-JDK, headless-safe) ----

  /** A decoded raster: dimensions + packed 0xRRGGBB pixels row-major.
    * The FULL decode slot of the multimodal seam — real pixels, not
    * just the header (ImageIO covers PNG/JPEG/GIF/BMP in the JDK; no
    * native codec libraries involved).
    */
  final case class PixelImage(width: Int, height: Int, rgb: Array[Int])

  /** Default raster budget for [[decodePixels]]: 2^26 pixels
    * (8192×8192 — a 256 MB int raster, the most a single task should
    * ever materialize). Deployments override per call via
    * `spark.graft.decode.maxPixels` (see [[Multimodal]]).
    */
  val DefaultMaxPixels: Long = 1L << 26

  /** Cheap dimension probe through ImageIO's READER registry — the
    * header parse only (ImageReader.getWidth/getHeight read the
    * SOF/IHDR/LSD fields, never the raster), format-agnostic across
    * everything ImageIO decodes (incl. BMP, which [[decodeMeta]]'s
    * hand walkers don't cover). This is the decompression-bomb gate:
    * a payload DECLARING huge dimensions is rejected from its header
    * bytes before any w×h allocation exists.
    */
  def probeDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0); val h = r.getHeight(0)
            if (w <= 0 || h <= 0) None else Some((w, h))
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }
  }

  /** Decode the payload to pixels. None when the bytes are not a
    * decodable image — the caller routes those to its malformed/DLQ
    * branch (never an exception: ImageIO errors are data, not bugs).
    *
    * `maxPixels` is the decompression-bomb budget: the declared
    * dimensions are probed from the HEADER ([[probeDims]]) first, and
    * an over-budget payload routes to the same None branch WITHOUT
    * ever allocating its raster — essential against hostile payloads
    * (a 4 KB PNG declaring 30k×30k would otherwise allocate a 3.6 GB
    * array and OOM the executor with an Error no Exception guard
    * catches).
    */
  def decodePixels(bytes: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[PixelImage] = {
    if (bytes == null || bytes.length == 0) return None
    probeDims(bytes) match {
      case None => return None // not an image ImageIO recognizes
      case Some((w, h)) =>
        if (w.toLong * h > maxPixels) return None // bomb gate: header-declared
    }
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
          img.getWidth.toLong * img.getHeight > maxPixels) None
      else {
        val w = img.getWidth; val h = img.getHeight
        // Bulk row fetch: one getRGB(0,0,w,h,...) call converts the
        // whole raster in the library's batched path instead of one
        // colorspace conversion call PER PIXEL — the constant every
        // image and every AVI frame used to pay (r14 verdict: the
        // largest sf1 bench row rode this loop).
        val out = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < out.length) { out(i) &= 0xffffff; i += 1 }
        Some(PixelImage(w, h, out))
      }
    } catch { case _: Exception => None }
  }

  /** Encode a REAL PNG from a pixel function (x, y) → packed
    * 0xRRGGBB. PNG is lossless and ImageIO's TYPE_INT_RGB round-trip
    * is bit-exact, so [[decodePixels]] recovers exactly these values
    * — the property the pixel-stats oracle checks end to end.
    */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"need positive dims, got ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rgb(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0/JFIF stub segment the scanner must skip
    out.write(0xff); out.write(0xe0); out.write(0); out.write(16)
    out.write("JFIF".getBytes, 0, 4); (0 until 10).foreach(_ => out.write(0))
    // SOF0: len=11 (one component), precision 8, height, width
    out.write(0xff); out.write(0xc0); out.write(0); out.write(11)
    out.write(8)
    out.write((h >>> 8) & 0xff); out.write(h & 0xff)
    out.write((w >>> 8) & 0xff); out.write(w & 0xff)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    out.toByteArray
  }
}
