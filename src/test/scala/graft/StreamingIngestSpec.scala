package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.store.FeatureStore
import graft.streaming.StreamingIngest

/** Streaming ingest: micro-batches become store versions through the
  * same register path, and the batch PIT read serves the stream's state.
  */
class StreamingIngestSpec extends AnyFunSuite with SparkTestBase {

  test("micro-batches register as versions; PIT read sees latest state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val store = new FeatureStore(s)
    val source = MemoryStream[(String, Timestamp, Double)]
    val stream = source.toDF().toDF("entity_id", "timestamp", "value")

    val query = StreamingIngest.start(
      stream, store, "live_features",
      trigger = Trigger.ProcessingTime(0))
    try {
      source.addData(("u1", ts("2024-01-01"), 1.0), ("u2", ts("2024-01-02"), 5.0))
      query.processAllAvailable()
      assert(store.getTableInfo("live_features").version == 1)

      source.addData(("u1", ts("2024-01-10"), 2.0))
      query.processAllAvailable()
      assert(store.getTableInfo("live_features").version == 2)

      // batch PIT path over the streamed table: u1's state as of Jan 5
      // is still 1.0 (Jan 10 row not yet visible at that cutoff)...
      val asOfJan5 = store
        .get("live_features", Seq("u1"), ts("2024-01-05"))
        .collect()
      assert(asOfJan5.head.getAs[Double]("value") == 1.0)
      // ...and as of Jan 15 it is the updated 2.0
      val asOfJan15 = store
        .get("live_features", Seq("u1"), ts("2024-01-15"))
        .collect()
      assert(asOfJan15.head.getAs[Double]("value") == 2.0)
    } finally query.stop()
  }

  test("replayed batch mints no duplicate version (crash-recovery idempotence)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_replay_spec").toString
    val store = new FeatureStore(s, root)
    val batch0 = Seq(("u1", ts("2024-01-01"), 1.0))
      .toDF("entity_id", "timestamp", "value")

    StreamingIngest.processBatch(store, "t")(batch0, 0L)
    assert(store.getTableInfo("t").version == 1)
    val snapshot = store.get("t", Seq("u1"), ts("2024-06-01")).collect()

    // simulated recovery: foreachBatch re-delivers batch 0 verbatim
    StreamingIngest.processBatch(store, "t")(batch0, 0L)
    assert(store.getTableInfo("t").version == 1, "replay must not mint a version")
    assert(store.getTableInfo("t").rowCount == 1, "replay must not double-append")
    assert(store.get("t", Seq("u1"), ts("2024-06-01")).collect()
      .sameElements(snapshot), "PIT read must be identical after the replay")

    // the high-water mark persists: a REOPENED store (the real recovery
    // path — driver restart reloads the catalog) still skips the replay
    val reopened = new FeatureStore(s, root)
    StreamingIngest.processBatch(reopened, "t")(batch0, 0L)
    assert(reopened.getTableInfo("t").version == 1)

    // a genuinely new batch still advances the version
    val batch1 = Seq(("u1", ts("2024-01-10"), 2.0))
      .toDF("entity_id", "timestamp", "value")
    StreamingIngest.processBatch(reopened, "t")(batch1, 1L)
    assert(reopened.getTableInfo("t").version == 2)
    assert(reopened.getTableInfo("t").rowCount == 2)
  }
}
