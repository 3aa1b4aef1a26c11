package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs distributed via `mapPartitions`.
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): [[extractFeatures]] computes a deterministic 16-bucket
  * byte histogram as the stand-in "decoded features". The Spark-side
  * plumbing — binary schema, partition-wise batch iteration, typed
  * output schema — is real and is what a production decoder would plug
  * into (swap [[decodeStub]] for the codec call).
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
      .select(col("doc_id").cast("long"), col("media"))
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

  /** STUB resize: keep every `factor`-th byte — the deterministic
    * stand-in for an image/audio downsample. Same row-wise shape a real
    * resize has (bytes in, smaller bytes out), so swapping in a codec
    * changes only the inner loop. No shuffle, constant memory.
    */
  def resize(media: DataFrame, factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("media"))
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

  /** One sampled frame of a media payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling: fixed-length windows every `stride` bytes
    * (overlapping when stride < frameLen), complete frames only — the
    * video/audio frame-extraction shape (one input row → N frame rows).
    * flatMap keeps it shuffle-free; frames stream out per partition.
    */
  def frameSample(media: DataFrame, frameLen: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameLen >= 1 && stride >= 1,
      s"frameLen/stride must be >= 1, got $frameLen/$stride")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("media"))
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
}
