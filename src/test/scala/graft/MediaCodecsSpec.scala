package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** The real pure-JVM codecs: byte-exact round-trips, format-profile
  * rejection, and total (never-throwing) decode on garbage.
  */
class MediaCodecsSpec extends AnyFunSuite with SparkTestBase {

  test("wav: encode/decode round-trips samples, rate and channels") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -321)
    val bytes = WavCodec.encode(samples, sampleRate = 8000, channels = 1)
    assert(WavCodec.detect(bytes))
    val Some(DecodedAudio(rate, ch, got)) = WavCodec.decode(bytes)
    assert(rate == 8000 && ch == 1)
    assert(got.toSeq == samples.toSeq)
  }

  test("wav: canonical header fields are bit-exact") {
    val bytes = WavCodec.encode(Array[Short](7), sampleRate = 16000, channels = 2)
    assert(bytes.length == 46)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    // byte rate = rate * channels * 2 = 64000 little-endian at offset 28
    assert((bytes(28) & 0xff) == 0x00 && (bytes(29) & 0xff) == 0xfa)
  }

  test("wav: rejects truncated, non-PCM and malformed payloads without throwing") {
    val good = WavCodec.encode(Array[Short](1, 2, 3), 8000, 1)
    assert(WavCodec.decode(good.take(20)).isEmpty) // truncated mid-header
    assert(WavCodec.decode(Array[Byte]()).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(WavCodec.decode(nonPcm).isEmpty)
    val oddData = good.clone(); oddData(42) = 9 // data size no longer matches
    assert(WavCodec.decode(oddData).isEmpty)
  }

  test("wav: near-Int.MaxValue chunk sizes decode to None, never AIOOBE or a 2GB alloc") {
    // a crafted JUNK chunk size of 0x7FFFFFF0 wrapped the former 32-bit
    // offset walk negative, slipping past the bounds checks into an
    // ArrayIndexOutOfBoundsException — the walk is now done in Long
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val junk = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(0x7FFFFFF0L) ++
      Array.fill[Byte](32)(0)
    assert(WavCodec.decode(junk).isEmpty)
    // same crafted size on the data chunk: the old Int bounds check
    // wrapped and attempted a ~1 GiB Array[Short] on a 60-byte payload
    val fmt = WavCodec.encode(Array[Short](1), 8000, 1).slice(12, 36)
    val data = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(0x7FFFFFF0L) ++
      Array.fill[Byte](16)(0)
    assert(WavCodec.decode(data).isEmpty)
    // and a NULL payload is corrupt data, not an exception
    assert(graft.ops.MediaCodecs.decode(null).isEmpty)
  }

  test("bmp: encode/decode round-trips pixels top-down, including stride padding") {
    // width 3 → row stride 12 with 3 pad bytes: exercises padding
    val w = 3; val h = 2
    val px = Array.tabulate[Byte](w * h * 3)(i => (i * 7 + 1).toByte)
    val bytes = BmpCodec.encode(w, h, px)
    assert(bytes.length == 54 + 12 * h)
    assert(BmpCodec.detect(bytes))
    val Some(DecodedImage(gw, gh, ch, got)) = BmpCodec.decode(bytes)
    assert(gw == w && gh == h && ch == 3)
    assert(got.toSeq == px.toSeq)
  }

  test("bmp: decodes top-down (negative height) storage too") {
    val w = 2; val h = 2
    val px = Array.tabulate[Byte](w * h * 3)(i => i.toByte)
    val bytes = BmpCodec.encode(w, h, px)
    // flip to top-down: negate height, swap stored rows back
    val stride = 8
    val flipped = bytes.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-h).array()
    System.arraycopy(negH, 0, flipped, 22, 4)
    val row0 = bytes.slice(54, 54 + stride)
    val row1 = bytes.slice(54 + stride, 54 + 2 * stride)
    System.arraycopy(row1, 0, flipped, 54, stride)
    System.arraycopy(row0, 0, flipped, 54 + stride, stride)
    val Some(DecodedImage(_, gh, _, got)) = BmpCodec.decode(flipped)
    assert(gh == h)
    assert(got.toSeq == px.toSeq)
  }

  test("bmp: rejects wrong profile and truncation without throwing") {
    val good = BmpCodec.encode(2, 2, new Array[Byte](12))
    assert(BmpCodec.decode(good.take(53)).isEmpty)
    val bpp8 = good.clone(); bpp8(28) = 8 // not 24bpp
    assert(BmpCodec.decode(bpp8).isEmpty)
    val compressed = good.clone(); compressed(30) = 1 // RLE
    assert(BmpCodec.decode(compressed).isEmpty)
    val shortData = good.take(54 + 8).toArray // one row missing
    assert(BmpCodec.decode(shortData).isEmpty)
  }

  test("registry dispatches by magic and drops unknown formats") {
    val wav = WavCodec.encode(Array[Short](5), 8000, 1)
    val bmp = BmpCodec.encode(1, 1, new Array[Byte](3))
    assert(MediaCodecs.decode(wav).exists(_.isInstanceOf[DecodedAudio]))
    assert(MediaCodecs.decode(bmp).exists(_.isInstanceOf[DecodedImage]))
    assert(MediaCodecs.decode("plain text".getBytes).isEmpty)
  }

  test("distributed wav pipeline: features equal direct text computation") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bbb c"),
      (2L, "dddd")).toDF("doc_id", "text")
    val got = Multimodal
      .decodeAudioFeatures(Multimodal.encodeWavFromTokens(docs))
      .collect().map(f => f.doc_id -> ((f.n_samples, f.sum_abs, f.max_sample))).toMap
    // doc 1: lens 2,3,1 → samples -3000,-2000,-4000
    assert(got(1L) == (3L, 9000L, -2000L))
    // doc 2: len 4 → sample -1000
    assert(got(2L) == (1L, 1000L, -1000L))
  }

  test("resizeImage keeps every factor-th pixel, ceil dims, odd sizes included") {
    val s = spark
    import s.implicits._
    // 3x3 source (odd both axes) → 2x2 output keeping pixels (0,0),(2,0),(0,2),(2,2)
    val w = 3; val h = 3
    val px = Array.tabulate[Byte](w * h * 3)(i => i.toByte)
    val media = Seq((1L, BmpCodec.encode(w, h, px), "image/bmp"))
      .toDF("doc_id", "media", "kind")
    val out = Multimodal.resizeImage(media, factor = 2)
      .collect()
    assert(out.length == 1)
    val resized = out.head.getAs[Array[Byte]]("media")
    val Some(DecodedImage(ow, oh, _, opx)) = BmpCodec.decode(resized)
    assert(ow == 2 && oh == 2)
    def srcPix(x: Int, y: Int) = (0 until 3).map(c => px((y * w + x) * 3 + c))
    val want = Seq((0, 0), (2, 0), (0, 2), (2, 2)).flatMap { case (x, y) => srcPix(x, y) }
    assert(opx.toSeq == want)
  }

  test("distributed bmp pipeline: channel sums equal direct byte sums") {
    val s = spark
    import s.implicits._
    // 96 chars → exactly 2 rows at width 16; 40 chars → no row
    val text96 = ("ab" * 48)
    val docs = Seq((1L, text96), (2L, "x" * 40)).toDF("doc_id", "text")
    val out = Multimodal
      .decodeImageFeatures(Multimodal.encodeBmpFromText(docs, width = 16))
      .collect()
    assert(out.length == 1 && out.head.doc_id == 1L)
    val f = out.head
    assert(f.width == 16 && f.height == 2)
    val bytes = text96.getBytes("UTF-8")
    def chanSum(c: Int) = bytes.indices.filter(_ % 3 == c).map(bytes(_) & 0xff).sum.toLong
    assert((f.sum_b, f.sum_g, f.sum_r) == (chanSum(0), chanSum(1), chanSum(2)))
  }
}
