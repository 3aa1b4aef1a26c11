package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` doorway the legacy (v1) streaming Source API
  * requires: `Source.getBatch` must return a DataFrame whose plan is
  * marked `isStreaming = true` (MicroBatchExecution asserts it), and
  * the only constructor for that is `SparkSession.internalCreateDataFrame`
  * — `private[sql]`, hence this object lives under
  * `org.apache.spark.sql`. This is the standard shape pre-DSv2
  * connectors used; nothing else in the codebase reaches into Spark
  * internals.
  */
object GraftStreamingBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val session =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for the SINK side: the frame handed to
    * `Sink.addBatch` carries streaming leaves, so any NEW action on it
    * re-analyzes into "streaming sources must be executed with
    * writeStream.start()". Re-root its physical rows as a plain batch
    * frame — exactly what Spark's own ForeachBatchSink does.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val session =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
