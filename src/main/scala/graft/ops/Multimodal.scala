package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs distributed via `mapPartitions`.
  *
  * Decoding is PLUGGABLE via [[MediaCodec]]: two real pure-JVM codecs
  * ship in [[MediaCodecs.registry]] (canonical PCM WAV and uncompressed
  * 24-bit BMP — [[decodeAudioFeatures]] / [[decodeImageFeatures]] run
  * them distributed), and production formats slot in beside them. The
  * 16-bucket byte histogram of [[extractFeatures]] remains as the
  * codec-free fallback for payloads no registered codec recognizes.
  */
object Multimodal {

  /** A media row: id + opaque bytes + typed metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)

  /** Extracted features: fixed-width vector + byte size. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      features: Array[Double])

  /** Wrap a documents table as a media table: text payload encoded to
    * UTF-8 bytes standing in for an image/audio blob.
    */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit("text/plain").as("kind"))

  /** Metadata projection — pure column ops, no decode: byte size and an
    * engine-portable content hash.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("media")).as("n_bytes"),
      md5(col("media")).as("content_hash"))

  /** STUB decode: deterministic 16-bucket byte histogram, normalized.
    * Replace with the real codec (image resize, audio frames, ...) —
    * the signature (bytes in, fixed-width doubles out) is the contract.
    */
  private[ops] def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 4) += 1.0
      i += 1
    }
    val n = math.max(1, bytes.length).toDouble
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Distributed feature extraction over the opaque payload: one pass
    * per partition, no shuffle, constant memory per row. This is the
    * `mapPartitions` seam where a real decoder (and its per-partition
    * init cost — model load, codec context) belongs.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init for a real decoder would happen here
        rows.map { case (id, bytes) =>
          MediaFeatures(id, bytes.length, decodeStub(bytes))
        }
      }
  }

  /** Resized media payload: original size + the downsampled bytes. */
  final case class ResizedMedia(doc_id: Long, n_bytes_in: Int, media: Array[Byte])

  /** Codec-FREE byte downsample: keep every `factor`-th byte. This is
    * the fallback for payloads no registered codec recognizes (the
    * [[extractFeatures]] stance) — real pixel-space resizing is
    * [[resizeImage]], which decodes, samples the pixel grid and
    * re-encodes. Same row-wise shape (bytes in, smaller bytes out), no
    * shuffle, constant memory.
    */
  def byteDownsample(media: DataFrame, factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          ResizedMedia(id, bytes.length, out)
        }
      }
  }

  // ------------------------------------------------------ real codecs

  /** Decoded-audio features: everything integral so cross-engine
    * compares are exact.
    */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_channels: Long,
      n_samples: Long,
      sum_abs: Long,
      max_sample: Long)

  /** Decoded-image features: dimensions plus exact per-channel sums of
    * the unsigned byte values (top-down pixel order — orientation
    * doesn't change a sum, but the decoder normalizes it anyway).
    */
  final case class ImageFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      sum_b: Long,
      sum_g: Long,
      sum_r: Long)

  /** Synthesize a PCM WAV payload per document from its token lengths
    * (sample_i = len(token_i)·1000 − 5000 CLAMPED to the 16-bit sample
    * range, mono) — the deterministic payload generator for codec
    * round-trip pipelines: the expected decoded features are computable
    * straight from the text, so an independent engine can verify the
    * encode→decode path end to end. The clamp (not a raw `.toShort`,
    * which would silently WRAP for tokens ≥ 38 chars) keeps the sample
    * arithmetic identical to the oracle's full-width integer form on
    * any corpus; the oracle SQL applies the same clamp.
    */
  def encodeWavFromTokens(docs: DataFrame, sampleRate: Int = 16000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val samples = text.split(" ").map { t =>
            math.max(Short.MinValue.toInt,
              math.min(Short.MaxValue.toInt, t.length * 1000 - 5000)).toShort
          }
          MediaRow(id, WavCodec.encode(samples, sampleRate, channels = 1), WavCodec.contentType)
        }
      }
      .toDF()
  }

  /** Distributed REAL audio decode: parse each payload with the codec
    * registry and reduce the decoded samples to exact integral
    * features. Payloads no codec accepts are dropped (at corpus scale
    * corrupt rows are data, not exceptions — count them upstream via
    * [[mediaMeta]] if the drop rate matters). Shuffle-free.
    */
  def decodeAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          MediaCodecs.decode(bytes) match {
            case Some(DecodedAudio(rate, channels, samples)) =>
              var sumAbs = 0L
              var maxS = Long.MinValue
              var i = 0
              while (i < samples.length) {
                sumAbs += math.abs(samples(i).toLong)
                if (samples(i) > maxS) maxS = samples(i).toLong
                i += 1
              }
              Some(AudioFeatures(
                id, rate.toLong, channels.toLong, samples.length.toLong,
                sumAbs, if (samples.isEmpty) 0L else maxS))
            case _ => None
          }
        }
      }
  }

  /** Synthesize a 24-bit BMP payload per document: the text's first
    * `width·3·rows` UTF-8 bytes become interleaved B,G,R pixels
    * (`rows = n_bytes div (width·3)`, complete rows only); documents
    * shorter than one row emit nothing. Deterministic counterpart of
    * [[encodeWavFromTokens]] for the image path.
    */
  def encodeBmpFromText(docs: DataFrame, width: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val rowBytes = width * 3
          val h = bytes.length / rowBytes
          if (h < 1) None
          else Some(MediaRow(
            id,
            BmpCodec.encode(width, h, java.util.Arrays.copyOf(bytes, rowBytes * h)),
            BmpCodec.contentType))
        }
      }
      .toDF()
  }

  /** REAL image resize through the codec: decode, nearest-neighbor
    * downsample by integer `factor` (keep every factor-th pixel in both
    * axes), re-encode as BMP. The full decode → transform → encode
    * triangle over actual pixel data — not the byte-skip stub of
    * [[byteDownsample]] — still a shuffle-free per-row map. Undecodable
    * payloads are dropped.
    */
  def resizeImage(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          MediaCodecs.decode(bytes) match {
            case Some(DecodedImage(w, h, 3, px)) =>
              val ow = (w + factor - 1) / factor
              val oh = (h + factor - 1) / factor
              val out = new Array[Byte](ow * oh * 3)
              var oy = 0
              while (oy < oh) {
                var ox = 0
                while (ox < ow) {
                  val src = ((oy * factor) * w + ox * factor) * 3
                  val dst = (oy * ow + ox) * 3
                  out(dst) = px(src); out(dst + 1) = px(src + 1); out(dst + 2) = px(src + 2)
                  ox += 1
                }
                oy += 1
              }
              Some(MediaRow(id, BmpCodec.encode(ow, oh, out), BmpCodec.contentType))
            case _ => None
          }
        }
      }
      .toDF()
  }

  /** Distributed REAL image decode: codec-registry parse + exact
    * per-channel sums. Undecodable payloads are dropped (see
    * [[decodeAudioFeatures]]). Shuffle-free.
    */
  def decodeImageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          MediaCodecs.decode(bytes) match {
            case Some(DecodedImage(w, h, channels, px)) if channels == 3 =>
              val sums = new Array[Long](3)
              var i = 0
              while (i < px.length) {
                sums(i % 3) += px(i) & 0xff
                i += 1
              }
              Some(ImageFeatures(id, w.toLong, h.toLong, sums(0), sums(1), sums(2)))
            case _ => None
          }
        }
      }
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Codec-FREE byte-window sampling: fixed-length windows every
    * `stride` bytes (overlapping when stride < frameLen), complete
    * windows only. The fallback shape for unrecognized payloads —
    * decoded-content frame extraction is [[frameSample]]. flatMap keeps
    * it shuffle-free; frames stream out per partition.
    */
  def byteFrames(media: DataFrame, frameLen: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameLen >= 1 && stride >= 1,
      s"frameLen/stride must be >= 1, got $frameLen/$stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.from(0)
          .map(idx => (idx, idx * stride))
          .takeWhile { case (_, start) => start + frameLen <= bytes.length }
          .map { case (idx, start) =>
            MediaFrame(id, idx, java.util.Arrays.copyOfRange(bytes, start, start + frameLen))
          }
      }
  }

  /** One DECODED frame with exact integral features: an audio
    * sample-window or an image row-band, depending on what the codec
    * registry parsed the payload as.
    */
  final case class DecodedFrame(
      doc_id: Long,
      frame_idx: Int,
      kind: String,
      n_units: Long,
      sum_abs: Long,
      max_unit: Long)

  /** REAL frame sampling through the codec registry: audio payloads
    * window their DECODED samples (`frameLen` samples every `stride`
    * samples), image payloads band their DECODED pixel rows (`frameLen`
    * rows every `stride` rows) — complete frames only, one input row →
    * N frame rows, shuffle-free. Features per frame are exact integers
    * (unit = signed sample / unsigned pixel byte): count, Σ|unit|,
    * max unit. Payloads no codec accepts emit nothing ([[byteFrames]]
    * is the codec-free fallback).
    */
  def frameSample(media: DataFrame, frameLen: Int, stride: Int): Dataset[DecodedFrame] = {
    require(frameLen >= 1 && stride >= 1,
      s"frameLen/stride must be >= 1, got $frameLen/$stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"),
        // a NULL payload (failed upstream fetch) must be corrupt DATA,
        // not a task-killing NPE in the row function
        coalesce(col("media"), lit(Array.empty[Byte])).as("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        MediaCodecs.decode(bytes) match {
          case Some(DecodedAudio(_, _, samples)) =>
            Iterator.from(0)
              .map(f => (f, f * stride))
              .takeWhile { case (_, start) => start + frameLen <= samples.length }
              .map { case (f, start) =>
                var sumAbs = 0L
                var maxU = Long.MinValue
                var i = start
                while (i < start + frameLen) {
                  val s = samples(i).toLong
                  sumAbs += math.abs(s)
                  if (s > maxU) maxU = s
                  i += 1
                }
                DecodedFrame(id, f, "audio", frameLen.toLong, sumAbs, maxU)
              }
          case Some(DecodedImage(w, h, channels, px)) =>
            val rowBytes = w * channels
            Iterator.from(0)
              .map(f => (f, f * stride))
              .takeWhile { case (_, startRow) => startRow + frameLen <= h }
              .map { case (f, startRow) =>
                var sumAbs = 0L
                var maxU = Long.MinValue
                var i = startRow * rowBytes
                val end = (startRow + frameLen) * rowBytes
                while (i < end) {
                  val b = (px(i) & 0xff).toLong
                  sumAbs += b
                  if (b > maxU) maxU = b
                  i += 1
                }
                DecodedFrame(id, f, "image", (frameLen * rowBytes).toLong, sumAbs, maxU)
              }
          case _ => Iterator.empty
        }
      }
  }
}
