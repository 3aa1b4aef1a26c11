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

  test("fresh-checkpoint restart (batch ids from 0 under a new stream id) registers") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_fresh_ckpt_spec").toString
    val store = new FeatureStore(s, root)
    val day1 = Seq(("u1", ts("2024-01-01"), 1.0))
      .toDF("entity_id", "timestamp", "value")
    val day2 = Seq(("u2", ts("2024-01-02"), 2.0))
      .toDF("entity_id", "timestamp", "value")

    // first stream generation: checkpoint c1, query id A, batches 0..1
    StreamingIngest.processBatch(store, "t", "query-A")(day1, 0L)
    StreamingIngest.processBatch(store, "t", "query-A")(day2, 1L)
    assert(store.getTableInfo("t").version == 2)

    // operator deletes the corrupted checkpoint and restarts: new query
    // id B, batch ids restart at 0 — the early batches MUST register
    // (the round-5 per-table high-water silently skipped them: data loss)
    val day3 = Seq(("u3", ts("2024-01-03"), 3.0))
      .toDF("entity_id", "timestamp", "value")
    StreamingIngest.processBatch(store, "t", "query-B")(day3, 0L)
    assert(store.getTableInfo("t").version == 3,
      "batch 0 of a fresh stream generation must register, not be skipped")

    // ...and the new generation's own replay protection works
    StreamingIngest.processBatch(store, "t", "query-B")(day3, 0L)
    assert(store.getTableInfo("t").version == 3, "replay within generation B skips")

    // a reopened store remembers BOTH generations' high-waters
    val reopened = new FeatureStore(s, root)
    StreamingIngest.processBatch(reopened, "t", "query-A")(day2, 1L)
    StreamingIngest.processBatch(reopened, "t", "query-B")(day3, 0L)
    assert(reopened.getTableInfo("t").version == 3)
  }

  test("upgrade shim: a checkpoint-straddling replay under a new stream id skips once") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_upgrade_shim_spec").toString
    val store = new FeatureStore(s, root)
    def row(u: String, d: String, v: Double) =
      Seq((u, ts(d), v)).toDF("entity_id", "timestamp", "value")
    // pre-upgrade catalogs recorded the high-water under the legacy id
    // (registerBatch without a stream id = the legacy surface)
    assert(store.registerBatch("t", row("u1", "2024-01-01", 1.0), 0L).isDefined)
    assert(store.registerBatch("t", row("u2", "2024-01-02", 2.0), 1L).isDefined)
    assert(store.getTableInfo("t").version == 2)

    // post-upgrade restart from the SAME checkpoint: crash recovery
    // re-delivers the last batch (id == legacy high-water) under the
    // query's real stream id — must skip, not mint a duplicate version
    assert(store.registerBatch("t", row("u2", "2024-01-02", 2.0), 1L, "query-A").isEmpty,
      "the straddling replay must be recognized via the legacy high-water")
    assert(store.getTableInfo("t").version == 2)

    // the high-water migrated: query-A's own line now carries it, so
    // later batches advance and replay-protect normally
    assert(store.registerBatch("t", row("u3", "2024-01-03", 3.0), 2L, "query-A").isDefined)
    assert(store.getTableInfo("t").version == 3)
    assert(store.registerBatch("t", row("u3", "2024-01-03", 3.0), 2L, "query-A").isEmpty)

    // a genuinely fresh stream generation (batch 0, below the legacy
    // high-water) still registers — the shim is exact-match only
    assert(store.registerBatch("t", row("u4", "2024-01-04", 4.0), 0L, "query-B").isDefined)
    assert(store.getTableInfo("t").version == 4)

    // batch 0 is excluded from the shim even on exact match: a legacy
    // high-water of 0 is indistinguishable from a fresh stream's first
    // batch, and a visible duplicate beats silent loss
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_upgrade_zero_spec").toString
    val s2 = new FeatureStore(s, root2)
    assert(s2.registerBatch("z", row("u1", "2024-01-01", 1.0), 0L).isDefined)
    assert(s2.registerBatch("z", row("u9", "2024-01-09", 9.0), 0L, "query-C").isDefined,
      "a fresh stream's batch 0 must register even when the legacy high-water is 0")
    assert(s2.getTableInfo("z").version == 2)

    // persistence: a reopened store (driver restart) still skips a
    // crash-recovery replay of query-A's LAST batch via its own line
    val reopened = new FeatureStore(s, root)
    assert(reopened.registerBatch("t", row("u3", "2024-01-03", 3.0), 2L, "query-A").isEmpty)
  }

  test("batch-id regression within one stream throws instead of silently skipping") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_regress_spec").toString
    val store = new FeatureStore(s, root)
    val df = Seq(("u1", ts("2024-01-01"), 1.0))
      .toDF("entity_id", "timestamp", "value")
    assert(store.registerBatch("t", df, 5L, "q").isDefined)
    // same stream id, EARLIER batch id: not a replay (replays re-deliver
    // the LAST batch) — a reused streamId across checkpoint generations.
    // Loud failure, not silent data loss.
    intercept[graft.store.FeatureConcurrencyError] {
      store.registerBatch("t", df, 3L, "q")
    }
    // the exact last batch is still a skip, not an error
    assert(store.registerBatch("t", df, 5L, "q").isEmpty)

    // the operator remedy for a deliberate checkpoint-backup restore:
    // clear the stream's high-water, then the replay registers again
    assert(store.clearStreamWatermark("t", "q"))
    assert(store.registerBatch("t", df, 3L, "q").isDefined)
    // clearing an absent watermark reports false
    assert(!store.clearStreamWatermark("t", "q2"))
    assert(!store.clearStreamWatermark("nope", "q"))
  }

  test("two start() generations end-to-end: second stream's batch 0 registers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_two_gen_spec").toString
    val store = new FeatureStore(s, root)

    // generation 1 (its own query id + implicit fresh checkpoint)
    val src1 = MemoryStream[(String, Timestamp, Double)]
    val q1 = StreamingIngest.start(
      src1.toDF().toDF("entity_id", "timestamp", "value"),
      store, "live", trigger = Trigger.ProcessingTime(0))
    try {
      src1.addData(("u1", ts("2024-01-01"), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(store.getTableInfo("live").version == 1)

    // generation 2: new query, batch ids restart at 0 — must register
    val src2 = MemoryStream[(String, Timestamp, Double)]
    val q2 = StreamingIngest.start(
      src2.toDF().toDF("entity_id", "timestamp", "value"),
      store, "live", trigger = Trigger.ProcessingTime(0))
    try {
      src2.addData(("u2", ts("2024-01-02"), 2.0))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(store.getTableInfo("live").version == 2,
      "a new stream generation's batch 0 must not be mistaken for a replay")
    assert(store.get("live", Seq("u2"), ts("2024-06-01")).count() == 1)
  }

  test("startIncremental across two generations: O(delta) appends, batch 0 of gen-2 registers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_incr_gen_spec").toString
    val store = new FeatureStore(s, root)

    val src1 = MemoryStream[(String, Timestamp, Double)]
    val q1 = StreamingIngest.startIncremental(
      src1.toDF().toDF("entity_id", "timestamp", "value"),
      store, "live", trigger = Trigger.ProcessingTime(0))
    try {
      src1.addData(("u1", ts("2024-01-01"), 1.0))
      q1.processAllAvailable()
      src1.addData(("u2", ts("2024-01-02"), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(store.getTableInfo("live").version == 2)
    assert(store.getTableInfo("live").rowCount == 2)

    // generation 2 (fresh checkpoint semantics): batch ids restart at 0
    // under the new query id; its append must land, not be skipped
    val src2 = MemoryStream[(String, Timestamp, Double)]
    val q2 = StreamingIngest.startIncremental(
      src2.toDF().toDF("entity_id", "timestamp", "value"),
      store, "live", trigger = Trigger.ProcessingTime(0))
    try {
      src2.addData(("u3", ts("2024-01-03"), 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(store.getTableInfo("live").version == 3)
    assert(store.getTableInfo("live").rowCount == 3,
      "generation 2's batch 0 must append, not be mistaken for a replay")
    // the accumulated log reads exactly through the chained manifests
    assert(store.getVersion("live", 3).count() == 3)
  }

  test("auto-compaction + vacuum fire mid-stream under a reader lease: counts exact, files survive") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_stream_compact_spec").toString
    // tight knobs so every lifecycle mechanism fires within six batches:
    // maxSegments=2 → auto-compaction every other append; maxVersions=3
    // → pruning retires old segments while newer manifests still share
    // some of them; vacuum(0) after every batch → immediate reclamation
    // of everything not live, shared, or leased
    val store = new FeatureStore(s, root, maxVersions = 3)
    val src = MemoryStream[(String, Timestamp, Double)]
    val q = StreamingIngest.startIncremental(
      src.toDF().toDF("entity_id", "timestamp", "value"),
      store, "live", trigger = Trigger.ProcessingTime(0), maxSegments = 2)
    try {
      src.addData(("u1", ts("2024-01-01"), 1.0))
      q.processAllAvailable()
      assert(store.getTableInfo("live").version == 1)

      // the long reader: lease the table and hold a version-1 DataFrame
      // across compactions, prunings and vacuum passes
      val lease = store.acquireReadLease("live")
      val reader = store.getVersion("live", 1)

      (2 to 6).foreach { i =>
        src.addData((s"u$i", ts(f"2024-01-$i%02d"), i.toDouble))
        q.processAllAvailable()
        // maintenance pass interleaved with the stream, single-phase
        store.vacuum(graceMillis = 0)
      }
      // chain shape: v2={1,2}, v3 compacts to {3}, v4={3,4}, v5
      // compacts to {5}, v6={5,6} — every count must be exact through
      // compaction boundaries and concurrent reclamation
      assert(store.getTableInfo("live").version == 6)
      assert(store.getTableInfo("live").rowCount == 6)
      assert(store.getVersion("live", 6).count() == 6)
      assert(store.getVersion("live", 6).collect()
        .map(_.getAs[Double]("value")).sorted.toSeq == (1 to 6).map(_.toDouble))

      // version 1 was pruned several passes ago; only the lease kept its
      // files — the reader must still scan them exactly
      assert(reader.collect().map(_.getAs[Double]("value")).toSeq == Seq(1.0),
        "a leased reader must survive mid-stream compaction + vacuum")

      // release: the next pass reclaims the retired segments, the
      // retained window reads on untouched
      store.releaseReadLease(lease)
      store.vacuum(graceMillis = 0)
      assert(store.getVersion("live", 6).count() == 6)
      intercept[graft.store.FeatureTableNotFoundError](store.getVersion("live", 1))
    } finally q.stop()
  }

  test("registerBatch commits version + high-water in ONE catalog save (crash-atomic)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_atomic_spec").toString
    // counting double on the persistence seam: every durable commit is
    // observed; crash-atomicity = exactly one save per idempotent
    // register (version + watermark indivisible)
    class CountingIO extends graft.store.CatalogIO {
      @volatile var saves = 0
      override def save(
          r: String,
          metas: Seq[graft.store.TableMeta],
          removed: Seq[String]): Unit = {
        saves += 1
        graft.store.CatalogPersistence.save(r, metas, removed)
      }
      override def load(r: String): Seq[graft.store.TableMeta] =
        graft.store.CatalogPersistence.load(r)
    }
    val io = new CountingIO
    val store = new FeatureStore(s, root, catalogIO = io)
    val df = Seq(("u1", ts("2024-01-01"), 1.0))
      .toDF("entity_id", "timestamp", "value")

    store.registerBatch("t", df, 0L, "q")
    assert(io.saves == 1,
      s"one catalog commit per registerBatch, got ${io.saves}: a second save " +
        "reopens the crash window where a version exists without its watermark")

    // the single save carried BOTH: a reopened store skips the replay
    val reopened = new FeatureStore(s, root)
    assert(reopened.registerBatch("t", df, 0L, "q").isEmpty)
    assert(reopened.getTableInfo("t").version == 1)

    // append path: same contract
    io.saves = 0
    store.registerAppendBatch("t", df, 1L, streamId = "q")
    assert(io.saves == 1, s"registerAppendBatch must also commit once, got ${io.saves}")
    // a skipped replay writes nothing at all
    io.saves = 0
    assert(store.registerBatch("t", df, 1L, "q").isEmpty)
    assert(io.saves == 0, "a skipped replay must not touch the catalog")

    // CDC path: same single-save crash-atomicity contract
    io.saves = 0
    val corr = Seq(("u1", ts("2024-01-01"), 9.0))
      .toDF("entity_id", "timestamp", "value")
    store.registerUpsertBatch("t", corr, 2L, streamId = "q")
    assert(io.saves == 1, s"registerUpsertBatch must also commit once, got ${io.saves}")
  }

  test("startWithExpectations splits each micro-batch into table + quarantine") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val store = new FeatureStore(s)
    val source = MemoryStream[(String, Timestamp, Double)]
    val stream = source.toDF().toDF("entity_id", "timestamp", "value")
    val query = StreamingIngest.startWithExpectations(
      stream, store, "clean",
      Seq("v_nonneg" -> (org.apache.spark.sql.functions.col("value") >= 0)),
      quarantine = "dirty",
      trigger = Trigger.ProcessingTime(0))
    try {
      source.addData(("u1", ts("2024-01-01"), 1.0), ("u2", ts("2024-01-02"), -5.0))
      query.processAllAvailable()
      assert(store.getTableInfo("clean").rowCount == 1)
      assert(store.getTableInfo("dirty").rowCount == 1)
      assert(store.getVersion("dirty", 1).head()
        .getAs[String]("violated") == "v_nonneg")

      // an all-clean batch touches only the main table
      source.addData(("u3", ts("2024-01-03"), 2.0))
      query.processAllAvailable()
      assert(store.getTableInfo("clean").rowCount == 2)
      assert(store.getTableInfo("dirty").rowCount == 1)

      // an all-dirty batch touches only the quarantine
      source.addData(("u4", ts("2024-01-04"), -1.0))
      query.processAllAvailable()
      assert(store.getTableInfo("clean").rowCount == 2)
      assert(store.getTableInfo("dirty").rowCount == 2)
    } finally query.stop()
  }

  test("startUpsert applies a change stream as exactly-once MERGE batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val store = new FeatureStore(s)
    val source = MemoryStream[(String, Timestamp, Double)]
    val stream = source.toDF().toDF("entity_id", "timestamp", "value")
    val query = StreamingIngest.startUpsert(
      stream, store, "cdc", trigger = Trigger.ProcessingTime(0))
    try {
      source.addData(("u1", ts("2024-01-01"), 1.0), ("u2", ts("2024-01-02"), 5.0))
      query.processAllAvailable()
      assert(store.getTableInfo("cdc").version == 1)
      assert(store.getTableInfo("cdc").rowCount == 2)

      // batch 2: a CORRECTION of u1's Jan-1 observation plus a new key —
      // the matched key converges instead of accumulating a duplicate
      source.addData(("u1", ts("2024-01-01"), 1.5), ("u3", ts("2024-01-03"), 9.0))
      query.processAllAvailable()
      val info = store.getTableInfo("cdc")
      assert(info.version == 2)
      assert(info.rowCount == 3, "replaced, not appended")
      val v = store.get("cdc", Seq("u1"), ts("2024-06-01"))
        .head().getAs[Double]("value")
      assert(v == 1.5)
      assert(store.getTableHistory("cdc").last.operation.contains("upsert"))
    } finally query.stop()
  }

  test("replayed upsert batch is exactly-once across a store reopen") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_replay_spec").toString
    val store = new FeatureStore(s, root)
    val b0 = Seq(("u1", ts("2024-01-01"), 1.0))
      .toDF("entity_id", "timestamp", "value")
    StreamingIngest.processBatchUpsert(store, "t", "q")(b0, 0L)
    assert(store.getTableInfo("t").version == 1)

    // crash-recovery re-delivery of the same batch: nothing changes
    StreamingIngest.processBatchUpsert(store, "t", "q")(b0, 0L)
    assert(store.getTableInfo("t").version == 1)
    assert(store.getTableInfo("t").rowCount == 1)

    // a correction batch upserts (replaces, not appends)
    val b1 = Seq(("u1", ts("2024-01-01"), 2.0))
      .toDF("entity_id", "timestamp", "value")
    StreamingIngest.processBatchUpsert(store, "t", "q")(b1, 1L)
    assert(store.getTableInfo("t").version == 2)
    assert(store.getTableInfo("t").rowCount == 1)
    assert(store.get("t", Seq("u1"), ts("2024-06-01"))
      .head().getAs[Double]("value") == 2.0)

    // the watermark persisted WITH the upsert version: a reopened store
    // (the real recovery path) skips the replay of the last batch
    val reopened = new FeatureStore(s, root)
    StreamingIngest.processBatchUpsert(reopened, "t", "q")(b1, 1L)
    assert(reopened.getTableInfo("t").version == 2)
    assert(reopened.getTableInfo("t").rowCount == 1)
  }
}
