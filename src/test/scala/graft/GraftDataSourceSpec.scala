package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.store.FeatureStore

/** The `format("graft")` data source ([[graft.sources.GraftDataSource]]):
  * batch reads with time travel and pushdown-through-stats-skipping,
  * the change feed as a streaming source, the store as a streaming
  * sink (append/upsert), and the flagship composition — table
  * replication, including row deletes, through source → cdc sink.
  */
class GraftDataSourceSpec extends AnyFunSuite with SparkTestBase {

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def slice(month: Int, ent: String, v: Long): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (ent, ts(f"2024-$month%02d-05"), v),
      (ent, ts(f"2024-$month%02d-20"), v + 1))
      .toDF("entity_id", "timestamp", "feature_b")
  }

  test("batch read: current version, time travel, pushdown prunes segments") {
    val root = tmpRoot("graft_ds_batch")
    val store = new FeatureStore(spark, root)
    store.register("t", slice(1, "u1", 100L))
    store.registerAppend("t", slice(2, "u2", 2000L))

    def read = spark.read.format("graft")
      .option("root", root).option("table", "t")

    assert(read.load().count() == 4)
    assert(read.option("versionAsOf", "1").load().count() == 2)

    // pushed filter → scanWhere → column-stats segment skipping. The
    // proof the January segment is never touched: destroy it — the
    // selective read still answers (and exactly), where an unpruned
    // scan would explode
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(root, "t", "v=1").toFile)
    val feb = read.load().filter(col("feature_b") >= 2000L)
    assert(feb.count() == 2)
    assert(feb.select("feature_b").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(2000L, 2001L))

    // column pruning flows through
    assert(read.load().select("entity_id").columns.toSeq == Seq("entity_id"))
  }

  test("batch write + SQL USING graft") {
    val root = tmpRoot("graft_ds_write")
    def writer(df: DataFrame) = df.write.format("graft")
      .option("root", root).option("table", "t")

    writer(slice(1, "u1", 100L)).mode("overwrite").save()
    writer(slice(2, "u2", 2000L)).mode("append").save()
    val store = new FeatureStore(spark, root)
    assert(store.getTableInfo("t").version == 2)
    assert(store.getTableInfo("t").rowCount == 4)

    // append with option mode=upsert is a MERGE by key
    val s = spark
    import s.implicits._
    writer(Seq(("u1", ts("2024-01-05"), 111L))
      .toDF("entity_id", "timestamp", "feature_b"))
      .option("mode", "upsert").mode("append").save()
    assert(new FeatureStore(spark, root).getTableInfo("t").rowCount == 4)

    intercept[graft.store.FeatureValidationError] {
      writer(slice(3, "u3", 5L)).mode("errorifexists").save()
    }
    writer(slice(3, "u3", 5L)).mode("ignore").save() // no-op, no error
    assert(new FeatureStore(spark, root).getTableInfo("t").rowCount == 4)

    // the store is SQL-addressable: CREATE TEMPORARY VIEW ... USING
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_sql_v
         |USING graft OPTIONS (root '$root', `table` 't')""".stripMargin)
    assert(spark.sql(
      "SELECT sum(feature_b) AS s FROM graft_sql_v WHERE feature_b >= 2000")
      .head().getLong(0) == 2000L + 2001L)
  }

  test("streaming source: snapshot first, then per-commit change batches") {
    val root = tmpRoot("graft_ds_src")
    val store = new FeatureStore(spark, root)
    store.register("t", slice(1, "u1", 100L))

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "t")
      .load()
      .writeStream.format("memory").queryName("graft_src_sink")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val snap = spark.table("graft_src_sink")
      assert(snap.count() == 2)
      assert(snap.select("_change_type").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("insert"))

      // an append commit arrives as its insert rows
      store.registerAppend("t", slice(2, "u2", 2000L))
      q.processAllAvailable()
      assert(spark.table("graft_src_sink").count() == 4)

      // a row delete arrives as delete rows
      store.deleteRows("t", col("feature_b") === 100L)
      q.processAllAvailable()
      val all = spark.table("graft_src_sink")
      val dels = all.filter(col("_change_type") === "delete").collect()
      assert(dels.length == 1 && dels.head.getAs[Long]("feature_b") == 100L)
    } finally q.stop()
  }

  test("streaming source: startingVersion and startingTimestamp skip the snapshot") {
    val root = tmpRoot("graft_ds_startv")
    val store = new FeatureStore(spark, root)
    store.register("t", slice(1, "u1", 100L))
    val midpoint = System.currentTimeMillis()
    Thread.sleep(5)
    store.registerAppend("t", slice(2, "u2", 2000L))

    def collectFrom(opts: Map[String, String]): Seq[Long] = {
      val name = "graft_startv_" + math.abs(opts.hashCode())
      val reader = spark.readStream.format("graft")
        .option("root", root).option("table", "t")
      val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load()
        .writeStream.format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        q.processAllAvailable()
        spark.table(name).select("feature_b")
          .collect().map(_.getLong(0)).sorted.toSeq
      } finally q.stop()
    }
    // startingVersion 1: only the v2 append's changes, no snapshot
    assert(collectFrom(Map("startingVersion" -> "1")) == Seq(2000L, 2001L))
    // startingTimestamp between the commits resolves to the same point
    assert(collectFrom(Map("startingTimestamp" ->
      new java.sql.Timestamp(midpoint).toString)) == Seq(2000L, 2001L))
  }

  test("streaming source: maxVersionsPerBatch bounds catch-up batches") {
    val root = tmpRoot("graft_ds_maxv")
    val store = new FeatureStore(spark, root)
    store.register("t", slice(1, "u0", 0L))
    // the follower starts 4 commits behind version 1
    (1 to 4).foreach(i => store.registerAppend("t", slice(2, s"u$i", i * 10L)))

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "t")
      .option("startingVersion", "1")
      .option("maxVersionsPerBatch", "2")
      .load()
      .writeStream.format("memory").queryName("graft_maxv_sink")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      // exact content: all 4 commits' inserts, nothing dropped or doubled
      assert(spark.table("graft_maxv_sink").count() == 8)
      assert(spark.table("graft_maxv_sink")
        .select("_commit_version").distinct().count() == 4)
      // admission control: 4 pending commits / max 2 = 2 microbatches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 2,
        s"expected ceil(4/2)=2 catch-up microbatches, got ${batches.length}")
      assert(batches.forall(_.numInputRows == 4))
    } finally q.stop()
  }

  test("SQL INSERT INTO and INSERT OVERWRITE on a USING graft view") {
    val root = tmpRoot("graft_ds_insert")
    val store = new FeatureStore(spark, root)
    store.register("t", slice(1, "u1", 100L))
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_ins_v
         |USING graft OPTIONS (root '$root', `table` 't')""".stripMargin)

    // INSERT INTO appends a version through the SQL surface
    spark.sql(
      "INSERT INTO graft_ins_v VALUES ('u2', timestamp'2024-02-05 00:00:00', 7)")
    assert(new FeatureStore(spark, root).getTableInfo("t").version == 2)
    assert(spark.sql("SELECT count(*) FROM graft_ins_v").head().getLong(0) == 3)
    assert(spark.sql(
      "SELECT feature_b FROM graft_ins_v WHERE entity_id = 'u2'")
      .head().getLong(0) == 7L)

    // INSERT OVERWRITE registers a full-snapshot version; history stays
    spark.sql(
      "INSERT OVERWRITE graft_ins_v VALUES ('u9', timestamp'2024-03-05 00:00:00', 9)")
    val after = new FeatureStore(spark, root)
    assert(after.getTableInfo("t").version == 3)
    assert(spark.sql("SELECT count(*) FROM graft_ins_v").head().getLong(0) == 1)
    assert(after.getVersion("t", 2).count() == 3) // time travel intact

    // a time-travel view is read-only
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW graft_ins_v1
         |USING graft OPTIONS (root '$root', `table` 't', versionAsOf '1')""".stripMargin)
    intercept[Exception] {
      spark.sql(
        "INSERT INTO graft_ins_v1 VALUES ('ux', timestamp'2024-04-05 00:00:00', 1)")
    }
  }

  test("streaming sink: append mode accumulates versions exactly-once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = tmpRoot("graft_ds_sink")
    val source = MemoryStream[(String, Timestamp, Long)]
    val q = source.toDF().toDF("entity_id", "timestamp", "feature_b")
      .writeStream.format("graft")
      .option("root", root).option("table", "t")
      .option("checkpointLocation", tmpRoot("graft_ds_sink_ck"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(("u1", ts("2024-01-05"), 1L))
      q.processAllAvailable()
      source.addData(("u2", ts("2024-02-05"), 2L))
      q.processAllAvailable()
      val store = new FeatureStore(spark, root)
      assert(store.getTableInfo("t").version == 2)
      assert(store.getTableInfo("t").rowCount == 2)
    } finally q.stop()
  }

  test("time travel read across a schema evolution uses the as-of schema") {
    val root = tmpRoot("graft_ds_tt")
    val store = new FeatureStore(spark, root)
    store.register("t", slice(1, "u1", 100L))
    store.registerAppend("t",
      slice(2, "u2", 2000L).withColumn("extra", lit("x")),
      mergeSchema = true)
    def read = spark.read.format("graft")
      .option("root", root).option("table", "t")
    // current schema carries the evolved column
    assert(read.load().columns.contains("extra"))
    // version 1 predates it: its read must advertise (and resolve)
    // version 1's own columns
    val v1 = read.option("versionAsOf", "1").load()
    assert(!v1.columns.contains("extra"))
    assert(v1.count() == 2)
  }

  test("cdc apply resolves multi-commit batches by final state") {
    val srcRoot = tmpRoot("graft_ds_cdc_src")
    val dstRoot = tmpRoot("graft_ds_cdc_dst")
    val ck = tmpRoot("graft_ds_cdc_ck")
    val src = new FeatureStore(spark, srcRoot)
    src.register("t", slice(1, "u1", 100L))

    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", srcRoot).option("table", "t")
        .load()
        .writeStream.format("graft")
        .option("root", dstRoot).option("table", "t")
        .option("mode", "cdc")
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // snapshot replicated
    // while the follower is DOWN: insert a key (v2), then delete it
    // (v3) — one future microbatch carries both; the final state for
    // that key is DELETED, and a set-difference apply would wrongly
    // resurrect it from the v2 insert
    val s = spark
    import s.implicits._
    src.registerUpsert("t", Seq(("u9", ts("2024-03-05"), 9L))
      .toDF("entity_id", "timestamp", "feature_b"))
    src.deleteRows("t", col("entity_id") === "u9")
    run()
    val dst = new FeatureStore(spark, dstRoot)
    val replica = dst.getVersion("t", dst.getTableInfo("t").version)
    assert(replica.filter(col("entity_id") === "u9").isEmpty,
      "deleted-after-insert key resurrected by the cdc apply")
    assert(replica.count() == 2)
  }

  test("replication stress: a mixed mutation series converges with an intermittent follower") {
    val srcRoot = tmpRoot("graft_ds_stress_src")
    val dstRoot = tmpRoot("graft_ds_stress_dst")
    val ck = tmpRoot("graft_ds_stress_ck")
    val src = new FeatureStore(spark, srcRoot, maxVersions = 50)
    val s = spark
    import s.implicits._
    def rows(tag: Int, n: Int) = (0 until n).map(j =>
      (s"e${tag}_$j", ts(f"2024-${1 + tag % 3}%02d-${1 + (tag * 3 + j) % 27}%02d"),
        tag * 100L + j))
      .toDF("entity_id", "timestamp", "feature_b")
    src.register("t", rows(1, 4))

    def follow(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", srcRoot).option("table", "t")
        .load()
        .writeStream.format("graft")
        .option("root", dstRoot).option("table", "t")
        .option("mode", "cdc")
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def sameContent(): Unit = {
      val a = src.getVersion("t", src.getTableInfo("t").version)
      val d = new FeatureStore(spark, dstRoot)
      val b = d.getVersion("t", d.getTableInfo("t").version)
      assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
        "replica diverged")
    }
    // a mixed series; the follower only catches up every few steps, so
    // each microbatch spans several commits with interacting changes
    follow(); sameContent()
    src.registerAppend("t", rows(2, 3))
    src.deleteRows("t", col("feature_b") % 2 === 1)
    follow(); sameContent()
    src.registerUpsert("t", rows(2, 5)) // re-insert some deleted keys
    src.registerAppend("t", rows(3, 4))
    src.deleteRowsByKeys("t",
      rows(3, 2).select("entity_id", "timestamp"))
    follow(); sameContent()
    src.deleteRows("t", col("feature_b") >= 300L)
    src.registerUpsert("t", rows(4, 2))
    src.compact("t")
    follow(); sameContent()
  }

  test("replication survives a full-snapshot overwrite and content-preserving commits") {
    val srcRoot = tmpRoot("graft_ds_ovw_src")
    val dstRoot = tmpRoot("graft_ds_ovw_dst")
    val ck = tmpRoot("graft_ds_ovw_ck")
    val src = new FeatureStore(spark, srcRoot, maxVersions = 50)
    src.register("t", slice(1, "u1", 100L))

    def follow(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", srcRoot).option("table", "t")
        .load()
        .writeStream.format("graft")
        .option("root", dstRoot).option("table", "t")
        .option("mode", "cdc")
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def sameContent(): Unit = {
      val a = src.getVersion("t", src.getTableInfo("t").version)
      val d = new FeatureStore(spark, dstRoot)
      val b = d.getVersion("t", d.getTableInfo("t").version)
      assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
        "replica diverged")
    }
    follow(); sameContent()

    // a FULL-SNAPSHOT overwrite with entirely new keys: the change set
    // is delete-ALL-old + insert-all-new — the apply must be one atomic
    // rewrite commit (delete-then-upsert would trip the store's
    // "would remove every row" guard mid-way and wedge the stream)
    src.register("t", slice(2, "u2", 200L))
    follow(); sameContent()
    val dst = new FeatureStore(spark, dstRoot)
    assert(dst.getVersion("t", dst.getTableInfo("t").version)
      .select("entity_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("u2"))

    // a content-preserving commit (compact) resolves to an EMPTY change
    // set: the sink receives a zero-row epoch and must skip it, not
    // crash-loop on the store's non-empty-register validation
    src.compact("t")
    follow(); sameContent()

    // and the stream is still alive for real changes afterwards
    src.registerAppend("t", slice(3, "u3", 300L))
    follow(); sameContent()
  }

  test("replication: source -> cdc sink reproduces the table, deletes included") {
    val srcRoot = tmpRoot("graft_ds_repl_src")
    val dstRoot = tmpRoot("graft_ds_repl_dst")
    val src = new FeatureStore(spark, srcRoot)
    src.register("t", slice(1, "u1", 100L).unionByName(slice(2, "u2", 2000L)))

    val q = spark.readStream.format("graft")
      .option("root", srcRoot).option("table", "t")
      .load()
      .writeStream.format("graft")
      .option("root", dstRoot).option("table", "t")
      .option("mode", "cdc")
      .option("checkpointLocation", tmpRoot("graft_ds_repl_ck"))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def sameContent(): Unit = {
        val a = src.getVersion("t",
          src.getTableInfo("t").version).orderBy("entity_id", "timestamp")
        val dstStore = new FeatureStore(spark, dstRoot)
        val b = dstStore.getVersion("t",
          dstStore.getTableInfo("t").version).orderBy("entity_id", "timestamp")
        assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
          "replica diverged from source")
      }
      q.processAllAvailable()
      sameContent() // initial snapshot replicated

      // an upsert (replace one key, insert one new) replicates
      val s2 = spark
      import s2.implicits._
      src.registerUpsert("t", Seq(
        ("u1", ts("2024-01-05"), 111L),
        ("u9", ts("2024-03-05"), 9L))
        .toDF("entity_id", "timestamp", "feature_b"))
      q.processAllAvailable()
      sameContent()

      // a row DELETE replicates through the cdc apply
      src.deleteRows("t", col("feature_b") === 2000L)
      q.processAllAvailable()
      sameContent()
    } finally q.stop()
  }
}
