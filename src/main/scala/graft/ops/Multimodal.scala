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
}
