package graft.ops

/** Pluggable media codecs — the REAL decode seam behind
  * [[Multimodal]]'s distributed plumbing.
  *
  * Two pure-JVM reference codecs ship with the engine (no native
  * libraries required): canonical PCM WAV (RIFF little-endian, 16-bit)
  * and uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up). Each
  * implements both directions so pipelines can synthesize payloads for
  * round-trip verification; production formats (JPEG, FLAC, MP4, ...)
  * plug in by adding a [[MediaCodec]] to [[MediaCodecs.registry]] —
  * detection is by magic bytes, decode returns the typed [[Decoded]]
  * ADT, and everything downstream (mapPartitions feature extraction,
  * schema, partitioning) is format-agnostic.
  *
  * All parsing is bounds-checked and total: malformed or truncated
  * payloads decode to None, never throw — at 100 TB some rows WILL be
  * corrupt, and a task-killing exception on row 10^12 is a pipeline
  * outage, not an error-handling strategy.
  */
sealed trait Decoded

/** Row-major, top-down, interleaved channel bytes (B,G,R for BMP). */
final case class DecodedImage(
    width: Int,
    height: Int,
    channels: Int,
    pixels: Array[Byte]) extends Decoded

/** Interleaved PCM samples. */
final case class DecodedAudio(
    sampleRate: Int,
    channels: Int,
    samples: Array[Short]) extends Decoded

trait MediaCodec extends Serializable {
  /** MIME-ish content type this codec handles. */
  def contentType: String
  /** Cheap magic-byte sniff (no full parse). */
  def detect(bytes: Array[Byte]): Boolean
  /** Total decode: None on any structural problem. */
  def decode(bytes: Array[Byte]): Option[Decoded]
}

object MediaCodecs {
  /** Registered codecs, probed in order by [[decode]]. */
  val registry: Seq[MediaCodec] = Seq(WavCodec, BmpCodec)

  /** Decode with the first codec whose magic matches. A NULL payload
    * (failed upstream fetch — the most common corrupt form at corpus
    * scale) is data, not an exception: None, like any other
    * undecodable row.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    if (bytes == null) None
    else registry.find(_.detect(bytes)).flatMap(_.decode(bytes))
}

/** Canonical-form PCM WAV: RIFF / fmt(16, PCM, 16-bit) / data. */
object WavCodec extends MediaCodec {
  val contentType = "audio/wav"

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == t.charAt(i).toByte)

  def detect(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0, "RIFF") && tag(bytes, 8, "WAVE")

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!detect(bytes)) return None
    // walk the chunk list: fmt must precede data (canonical order).
    // ALL offset arithmetic in Long: a crafted/corrupt u32 chunk size
    // near Int.MaxValue would wrap 32-bit offsets negative, slipping
    // past the bounds checks into an AIOOBE / ~2 GB allocation — the
    // exact task-killing throw this module's contract forbids
    var off = 12L
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var haveFmt = false
    while (off + 8 <= bytes.length) {
      val size = u32(bytes, off.toInt + 4) // off+8 <= length, so toInt is safe
      val body = off + 8
      if (tag(bytes, off.toInt, "fmt ")) {
        if (size < 16 || body + 16 > bytes.length) return None
        val audioFormat = u16(bytes, body.toInt)
        channels = u16(bytes, body.toInt + 2)
        sampleRate = u32(bytes, body.toInt + 4).toInt
        bits = u16(bytes, body.toInt + 14)
        if (audioFormat != 1 || bits != 16 || channels < 1 || sampleRate < 1)
          return None // only canonical PCM16 here; other formats → other codecs
        haveFmt = true
      } else if (tag(bytes, off.toInt, "data")) {
        if (!haveFmt) return None
        if (body + size > bytes.length || size % 2 != 0) return None
        val n = size.toInt // bounded by bytes.length via the Long check
        val base = body.toInt
        val samples = new Array[Short](n / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) =
            ((bytes(base + 2 * i) & 0xff) | (bytes(base + 2 * i + 1) << 8)).toShort
          i += 1
        }
        return Some(DecodedAudio(sampleRate, channels, samples))
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off = body + size + (size & 1L)
    }
    None
  }

  /** Canonical PCM16 writer (the synthesis half of round-trip tests). */
  def encode(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
    require(sampleRate >= 1 && channels >= 1, s"bad wav params $sampleRate/$channels")
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer
      .allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }
}

/** Uncompressed 24-bit BMP, BITMAPINFOHEADER, bottom-up rows padded to
  * 4-byte boundaries, pixels as interleaved B,G,R.
  */
object BmpCodec extends MediaCodec {
  val contentType = "image/bmp"

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  def detect(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!detect(bytes) || bytes.length < 54) return None
    val dataOffset = i32(bytes, 10)
    val headerSize = i32(bytes, 14)
    val width = i32(bytes, 18)
    val height = i32(bytes, 22)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    if (headerSize < 40 || planes != 1 || bpp != 24 || compression != 0)
      return None // only the uncompressed 24bpp profile here
    if (width < 1 || height == 0 || height == Int.MinValue) return None
    val topDown = height < 0
    val rows = math.abs(height)
    val stride = rowStride(width)
    if (width > (Int.MaxValue - 3) / 3 ||
      rows > (Int.MaxValue / stride) ||
      dataOffset < 54 ||
      dataOffset.toLong + stride.toLong * rows > bytes.length) return None
    val pixels = new Array[Byte](width * 3 * rows)
    var r = 0
    while (r < rows) {
      // emit top-down regardless of stored orientation
      val srcRow = if (topDown) r else rows - 1 - r
      System.arraycopy(
        bytes, dataOffset + srcRow * stride, pixels, r * width * 3, width * 3)
      r += 1
    }
    Some(DecodedImage(width, rows, 3, pixels))
  }

  /** 24bpp writer (bottom-up, padded), top-down B,G,R pixels in. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad bmp dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != ${width * height * 3}")
    val stride = rowStride(width)
    val dataSize = stride * height
    val out = java.nio.ByteBuffer
      .allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
    out.putInt(0).putInt(54)
    out.putInt(40).putInt(width).putInt(height)
    out.putShort(1).putShort(24)
    out.putInt(0).putInt(dataSize)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, default palette
    val pad = new Array[Byte](stride - width * 3)
    var r = height - 1
    while (r >= 0) { // bottom-up storage
      out.put(pixels, r * width * 3, width * 3)
      out.put(pad)
      r -= 1
    }
    out.array()
  }
}
