package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.store.FeatureStore
import graft.streaming.StreamingIngest

/** Runnable end-to-end sample of the streaming ingest path: a memory
  * stream of feature rows flows through `StreamingIngest.start` into a
  * `FeatureStore`, and the batch PIT read serves the accumulated state.
  * `sbt "runMain graft.examples.StreamingDemo"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

    val store = new FeatureStore(spark)
    val source = MemoryStream[(String, Timestamp, Double)]
    val stream = source.toDF().toDF("entity_id", "timestamp", "value")
    val query = StreamingIngest.start(
      stream, store, "live", trigger = Trigger.ProcessingTime(0))

    source.addData(("u1", ts("2024-01-01"), 1.0), ("u2", ts("2024-01-02"), 5.0))
    query.processAllAvailable()
    println(s"[demo] after batch 1: version=${store.getTableInfo("live").version} rows=${store.getTableInfo("live").rowCount}")

    source.addData(("u1", ts("2024-01-10"), 2.0))
    query.processAllAvailable()
    println(s"[demo] after batch 2: version=${store.getTableInfo("live").version} rows=${store.getTableInfo("live").rowCount}")

    val asOfJan5 = store.get("live", Seq("u1", "u2"), ts("2024-01-05")).collect()
    println(s"[demo] PIT @Jan5:  ${asOfJan5.map(r => r.getString(0) -> r.getDouble(2)).toSeq.sortBy(_._1)}")
    val asOfJan15 = store.get("live", Seq("u1", "u2"), ts("2024-01-15")).collect()
    println(s"[demo] PIT @Jan15: ${asOfJan15.map(r => r.getString(0) -> r.getDouble(2)).toSeq.sortBy(_._1)}")

    query.stop()

    // continuously-maintained latest state (flatMapGroupsWithState)
    val events = MemoryStream[graft.streaming.StreamingFeatures.FeatureEvent]
    val stateQuery = graft.streaming.StreamingFeatures
      .latestState(events.toDS(), lateness = "365 days")
      .writeStream
      .format("memory")
      .queryName("demo_latest")
      .outputMode("update")
      .start()
    events.addData(
      graft.streaming.StreamingFeatures.FeatureEvent("u1", ts("2024-01-10"), 10.0))
    stateQuery.processAllAvailable()
    events.addData(
      graft.streaming.StreamingFeatures.FeatureEvent("u1", ts("2024-01-05"), 5.0), // late, older
      graft.streaming.StreamingFeatures.FeatureEvent("u1", ts("2024-01-20"), 20.0))
    stateQuery.processAllAvailable()
    println(s"[demo] latest-state emissions: " +
      spark.sql("SELECT entity_id, value FROM demo_latest").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq)
    stateQuery.stop()
    spark.stop()
  }
}
