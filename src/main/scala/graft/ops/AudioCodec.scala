package graft.ops

/** Pure-JVM WAV (RIFF) header codec — the audio analog of
  * [[ImageCodec]]: REAL metadata decode for the multimodal seam
  * without any native codec dependency. Parses the `fmt ` and `data`
  * chunks by walking the RIFF chunk list (the JDK and ffmpeg both
  * emit extra chunks like `LIST`/`fact`, so fixed-offset parsing is
  * wrong); the declared `data` size is trusted even when the payload
  * is truncated — metadata extraction must not require the full
  * media bytes (at 100 TB the header read IS the point: range-read
  * the first KB, never the payload).
  *
  * Validated in ImageCodecSpec against `javax.sound.sampled`'s own
  * WAVE writer, the same pattern as the image parsers vs ImageIO.
  */
object AudioCodec {

  final case class AudioMeta(channels: Int, sampleRate: Long,
      bitsPerSample: Int, nFrames: Long) {
    /** Exact integer duration in µs (floor). */
    def durationUs: Long = nFrames * 1000000L / sampleRate
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode WAV metadata from (at least) the header bytes. None for
    * non-WAV / non-PCM / malformed payloads — callers route those to
    * a malformed sink, mirroring [[ImageCodec.decodeMeta]].
    */
  def decodeMeta(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    // the cursor is a Long: a hostile u32 chunk size near 2^32 must
    // walk PAST the buffer and end the loop, not wrap negative (an
    // Int cursor spins forever on size 0xFFFFFFF8)
    var i = 12L
    var channels = 0; var rate = 0L; var bits = 0; var fmtOk = false
    var dataSize = -1L
    while (i + 8 <= b.length && (dataSize < 0 || !fmtOk)) {
      val at = i.toInt
      val id = tag(b, at); val size = u32le(b, at + 4)
      // the chunk's DECLARED size must cover the 16 base fmt bytes —
      // a smaller declared size with enough buffer left would read
      // channel/rate/bits out of the NEXT chunk's bytes
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
        val audioFormat = u16le(b, at + 8)
        // PCM outright, or WAVE_FORMAT_EXTENSIBLE whose extension
        // carries the PCM SubFormat GUID (first 2 GUID bytes encode
        // the wrapped format tag; accepting any 0xfffe would decode
        // float-extensible files as if integer PCM)
        fmtOk = audioFormat == 1 ||
          (audioFormat == 0xfffe && size >= 40 && i + 8 + 26 <= b.length &&
            u16le(b, at + 32) == 1)
        channels = u16le(b, at + 10)
        rate = u32le(b, at + 12)
        bits = u16le(b, at + 22)
      } else if (id == "data") {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    if (!fmtOk || channels <= 0 || rate <= 0 || bits <= 0 || dataSize < 0)
      None
    else {
      val frameBytes = channels.toLong * (bits / 8).max(1)
      Some(AudioMeta(channels, rate, bits, dataSize / frameBytes))
    }
  }

  /** Canonical 44-byte PCM WAV header (no sample payload — the
    * declared data size stands in for it, which [[decodeMeta]]
    * honors by design).
    */
  def wavHeader(channels: Int, sampleRate: Long, bitsPerSample: Int,
      nFrames: Long): Array[Byte] = {
    val frameBytes = channels * (bitsPerSample / 8)
    val dataSize = nFrames * frameBytes
    val o = new java.io.ByteArrayOutputStream(44)
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = (0 until 4).foreach(s => o.write(((v >> (8 * s)) & 0xff).toInt))
    def ascii(s: String): Unit = o.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ascii("RIFF"); le32(36L + dataSize); ascii("WAVE")
    ascii("fmt "); le32(16L); le16(1); le16(channels)
    le32(sampleRate); le32(sampleRate * frameBytes)
    le16(frameBytes); le16(bitsPerSample)
    ascii("data"); le32(dataSize)
    o.toByteArray
  }

  // ---- full-sample codec (javax.sound.sampled, in-JDK) ----

  /** A decoded PCM clip: channel-interleaved signed 16-bit samples. */
  final case class PcmAudio(channels: Int, sampleRate: Long,
      samples: Array[Short])

  /** Encode mono 16-bit PCM samples as a REAL little-endian WAV —
    * the payload twin of [[wavHeader]]; [[decodePcm]] (the JDK's own
    * RIFF reader, nothing shared with this writer) recovers exactly
    * these values, which is the property the PCM-stats oracle checks
    * end to end.
    */
  def encodeWav(sampleRate: Long, samples: Array[Short]): Array[Byte] = {
    val head = wavHeader(1, sampleRate, 16, samples.length.toLong)
    val o = new java.io.ByteArrayOutputStream(head.length + 2 * samples.length)
    o.write(head, 0, head.length)
    samples.foreach { s =>
      o.write(s & 0xff); o.write((s >> 8) & 0xff)
    }
    o.toByteArray
  }

  /** Default sample budget for [[decodePcm]]: 2^27 16-bit samples
    * (a 256 MB short array — ~23 minutes of 48 kHz stereo, the most a
    * single task should materialize). Deployments override per call
    * via `spark.graft.decode.maxSamples` (see [[Multimodal]]).
    */
  val DefaultMaxSamples: Long = 1L << 27

  /** Decode the payload to PCM samples through
    * `javax.sound.sampled.AudioSystem` — the FULL decode slot of the
    * audio seam (the header walker above reads metadata only). None
    * when the bytes are not a decodable 16-bit PCM clip — the caller
    * routes those to its malformed/DLQ branch, never an exception.
    *
    * `maxSamples` is the oversized-payload budget, gated from the
    * HEADER-declared frame count (AudioInputStream.getFrameLength —
    * javax.sound reads it from the `data` chunk size, no samples
    * touched) before `readAllBytes` materializes anything; a giant or
    * hostile payload routes to the same None branch instead of
    * OOM-killing the executor. When the stream declares no length,
    * the payload byte count itself bounds the decode and is gated the
    * same way.
    */
  def decodePcm(bytes: Array[Byte],
      maxSamples: Long = DefaultMaxSamples): Option[PcmAudio] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) return None
        val frames = ais.getFrameLength
        val declared =
          if (frames >= 0) frames * f.getChannels
          else bytes.length.toLong / 2 // no declared length: payload bound
        if (declared > maxSamples) return None // budget gate, pre-allocation
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          val lo = raw(2 * i) & 0xff; val hi = raw(2 * i + 1)
          out(i) = (if (f.isBigEndian) ((lo << 8) | (hi & 0xff))
            else ((hi << 8) | lo)).toShort
          i += 1
        }
        Some(PcmAudio(f.getChannels, f.getSampleRate.toLong, out))
      } finally ais.close()
    } catch { case _: Exception => None }
  }
}
