package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{FeatureStore, IncrementalRollup}
import graft.streaming.StreamingRollup

/** The streaming materialized view: a rollup maintained over the
  * change feed converges to the from-scratch rollup across restarts
  * and mutating commits, folding each commit exactly once.
  */
class StreamingRollupSpec extends AnyFunSuite with SparkTestBase {

  test("streaming rollup converges across restart, mutations fold exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft_sroll").toString
    val root = s"$base/root"
    val stateDir = s"$base/state"
    val ck = s"$base/ck"
    val store = new FeatureStore(spark, root)
    store.register("t", sampleFeatures)

    def run(): Unit = {
      val q = StreamingRollup.start(
        spark, root, "t", Seq("entity_id"), col("feature_b"),
        stateDir, ck, maxVersionsPerBatch = Some(1))
      try q.processAllAvailable() finally q.stop()
    }

    run() // snapshot batch only
    val s1 = StreamingRollup.currentState(spark, stateDir).get.collect()
      .map(r => r.getAs[String]("entity_id") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_value"))).toMap
    assert(s1 == Map("user_1" -> ((3L, 600L)), "user_2" -> ((2L, 3000L))))

    // mutate while the follower is DOWN: delete a whole group, upsert
    // (+5 on one row, one new entity), append — then restart from the
    // same checkpoint; with maxVersionsPerBatch=1 each commit folds as
    // its own batch
    store.deleteRows("t", col("entity_id") === "user_2")
    val s = spark
    import s.implicits._
    store.registerUpsert("t", Seq(
      ("user_1", ts("2024-01-15"), 2.0, 205L),
      ("user_3", ts("2024-03-01"), 7.0, 700L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b"))
    store.registerAppend("t", Seq(
      ("user_3", ts("2024-03-02"), 8.0, 800L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b"))
    run()

    val fin = StreamingRollup.currentState(spark, stateDir).get
    val scratch = IncrementalRollup.initialState(
      store.getVersion("t", store.getTableInfo("t").version),
      Seq("entity_id"), col("feature_b"))
    assert(fin.exceptAll(scratch).isEmpty && scratch.exceptAll(fin).isEmpty)
    val m = fin.collect().map(r => r.getAs[String]("entity_id") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_value"))).toMap
    assert(m == Map("user_1" -> ((3L, 605L)), "user_3" -> ((2L, 1500L))))

    // the prune keeps the new state plus ONE completed predecessor (a
    // grace window for readers that resolved the prior version before
    // the fold landed) — never the whole history
    val dirs = new java.io.File(stateDir).list().filter(_.startsWith("state_v"))
    assert(dirs.length <= 2 && dirs.nonEmpty, dirs.mkString(","))
  }

  test("every IVM flavor streams: stats, distinct, min/max, serving converge across mutations") {
    val base = java.nio.file.Files.createTempDirectory("graft_sroll4").toString
    val root = s"$base/root"
    val store = new FeatureStore(spark, root)
    store.register("t", sampleFeatures)

    def runAll(): Unit = {
      val qs = Seq(
        StreamingRollup.startStats(
          spark, root, "t", Seq("entity_id"), col("feature_b"),
          s"$base/st_state", s"$base/st_ck", maxVersionsPerBatch = Some(1)),
        StreamingRollup.startDistinct(
          spark, root, "t", Seq("entity_id"), col("feature_b") % 1000L,
          s"$base/d_state", s"$base/d_ck", maxVersionsPerBatch = Some(1)),
        StreamingRollup.startMinMax(
          spark, root, "t", Seq("entity_id"), col("feature_b"),
          s"$base/mm_state", s"$base/mm_ck", maxVersionsPerBatch = Some(1)),
        StreamingRollup.startServing(
          spark, root, "t", tieCols = Seq("feature_b"),
          s"$base/sv_state", s"$base/sv_ck", maxVersionsPerBatch = Some(1)))
      try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    }

    runAll() // snapshot batches
    // mutate while the followers are DOWN: the delete strips user_2's
    // max (2000) — a boundary hit the min/max rescan must recover —
    // and the upsert + append reshape user_1/user_3
    store.deleteRows("t",
      col("entity_id") === "user_2" && col("feature_b") === 2000L)
    val s = spark
    import s.implicits._
    store.registerUpsert("t", Seq(
      ("user_1", ts("2024-01-15"), 2.0, 205L),
      ("user_3", ts("2024-03-01"), 7.0, 700L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b"))
    store.registerAppend("t", Seq(
      ("user_3", ts("2024-03-02"), 8.0, 1700L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b"))
    runAll() // catch-up: each commit folds as its own batch

    val cur = store.getVersion("t", store.getTableInfo("t").version)
    val stats = StreamingRollup.currentState(spark, s"$base/st_state").get
    val statsScratch = IncrementalRollup.initialStateStats(
      cur, Seq("entity_id"), col("feature_b"))
    assert(stats.exceptAll(statsScratch).isEmpty &&
      statsScratch.exceptAll(stats).isEmpty)

    val dist = IncrementalRollup.distinctCounts(
      StreamingRollup.currentState(spark, s"$base/d_state").get,
      Seq("entity_id"))
    val dm = dist.collect().map(r => r.getAs[String]("entity_id") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct")))).toMap
    // user_3: values 700 and 1700 — SAME value mod 1000, one distinct
    assert(dm("user_3") == ((2L, 1L)), dm.toString)
    assert(dm("user_2") == ((1L, 1L)))

    val mm = StreamingRollup.currentState(spark, s"$base/mm_state").get
    val mmScratch = IncrementalRollup.initialStateMinMax(
      cur, Seq("entity_id"), col("feature_b"))
    assert(mm.exceptAll(mmScratch).isEmpty &&
      mmScratch.exceptAll(mm).isEmpty)
    val mmm = mm.collect().map(r => r.getAs[String]("entity_id") ->
      ((r.getAs[Long]("min_value"), r.getAs[Long]("max_value")))).toMap
    assert(mmm("user_2") == ((1000L, 1000L))) // rescan found the new max

    // the live SERVING table: user_2's deleted latest rescanned back to
    // the Jan-1 survivor; user_3 advanced to its newest append
    val sv = StreamingRollup.currentState(spark, s"$base/sv_state").get
    val svScratch = IncrementalRollup.initialStateServing(
      cur, tieCols = Seq("feature_b"))
    assert(sv.exceptAll(svScratch).isEmpty &&
      svScratch.exceptAll(sv).isEmpty)
    val svm = sv.collect().map(r => r.getAs[String]("entity_id") ->
      r.getAs[Long]("feature_b")).toMap
    assert(svm == Map(
      "user_1" -> 300L, "user_2" -> 1000L, "user_3" -> 1700L))
  }

  test("version-pinned folds survive an empty micro-batch (no-op upsert commit)") {
    // an upsert re-writing identical bytes commits a version whose
    // change set is EMPTY (identical-content pairs cancel) — the
    // min/max and serving folds pin the rescan version from
    // max(_commit_version), which is null on that batch; they must
    // carry the prior state forward, not NPE and kill the query
    val base = java.nio.file.Files.createTempDirectory("graft_sroll_empty").toString
    val root = s"$base/root"
    val store = new FeatureStore(spark, root)
    store.register("t", sampleFeatures)

    def runAll(): Unit = {
      val qs = Seq(
        StreamingRollup.startMinMax(
          spark, root, "t", Seq("entity_id"), col("feature_b"),
          s"$base/mm_state", s"$base/mm_ck", maxVersionsPerBatch = Some(1)),
        StreamingRollup.startServing(
          spark, root, "t", tieCols = Seq("feature_b"),
          s"$base/sv_state", s"$base/sv_ck", maxVersionsPerBatch = Some(1)))
      try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    }

    runAll() // snapshot batches
    // a no-op upsert: same keys, identical content — new commit, zero
    // change rows. With maxVersionsPerBatch=1 it arrives as its own
    // (empty) micro-batch. Then a real append the followers must still
    // fold after surviving the empty one.
    store.registerUpsert("t", sampleFeatures)
    val s = spark
    import s.implicits._
    store.registerAppend("t", Seq(
      ("user_3", ts("2024-03-01"), 7.0, 700L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b"))
    runAll()

    val cur = store.getVersion("t", store.getTableInfo("t").version)
    val mm = StreamingRollup.currentState(spark, s"$base/mm_state").get
    val mmScratch = IncrementalRollup.initialStateMinMax(
      cur, Seq("entity_id"), col("feature_b"))
    assert(mm.exceptAll(mmScratch).isEmpty &&
      mmScratch.exceptAll(mm).isEmpty)
    val sv = StreamingRollup.currentState(spark, s"$base/sv_state").get
    val svScratch = IncrementalRollup.initialStateServing(
      cur, tieCols = Seq("feature_b"))
    assert(sv.exceptAll(svScratch).isEmpty &&
      svScratch.exceptAll(sv).isEmpty)
    val svm = sv.collect().map(r => r.getAs[String]("entity_id") ->
      r.getAs[Long]("feature_b")).toMap
    assert(svm == Map(
      "user_1" -> 300L, "user_2" -> 2000L, "user_3" -> 700L))
  }

  test("crashed partial state write is invisible to readers and re-folded on replay") {
    val base = java.nio.file.Files.createTempDirectory("graft_sroll_crash").toString
    val root = s"$base/root"
    val stateDir = s"$base/state"
    val ck = s"$base/ck"
    val store = new FeatureStore(spark, root)
    store.register("t", sampleFeatures)

    def run(): Unit = {
      val q = StreamingRollup.start(
        spark, root, "t", Seq("entity_id"), col("feature_b"),
        stateDir, ck, maxVersionsPerBatch = Some(1))
      try q.processAllAvailable() finally q.stop()
    }

    run() // batch 0: snapshot folded, state_v0 carries the marker

    // simulate a crash DURING batch 1's parquet job: the table has a
    // new commit, and a marker-less partial state_v1 (only _temporary
    // debris) was left behind before the fold completed
    store.registerAppend("t", {
      val s = spark
      import s.implicits._
      Seq(("user_3", ts("2024-03-01"), 7.0, 700L))
        .toDF("entity_id", "timestamp", "feature_a", "feature_b")
    })
    val partial = new java.io.File(s"$stateDir/state_v1/_temporary")
    assert(partial.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$stateDir/state_v1/_temporary/part-0"),
      Array[Byte](1, 2, 3))

    // a reader between crash and restart must see the last COMPLETED
    // state (v0), never the corrupt max-version directory
    val mid = StreamingRollup.currentState(spark, stateDir).get.collect()
      .map(r => r.getAs[String]("entity_id") -> r.getAs[Long]("sum_value")).toMap
    assert(mid == Map("user_1" -> 600L, "user_2" -> 3000L))

    // restart: batch 1 replays, sees NO marker, overwrites the partial
    // dir and folds the append exactly once
    run()
    val fin = StreamingRollup.currentState(spark, stateDir).get
    val scratch = IncrementalRollup.initialState(
      store.getVersion("t", store.getTableInfo("t").version),
      Seq("entity_id"), col("feature_b"))
    assert(fin.exceptAll(scratch).isEmpty && scratch.exceptAll(fin).isEmpty)
    val m = fin.collect().map(r => r.getAs[String]("entity_id") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_value"))).toMap
    assert(m == Map(
      "user_1" -> ((3L, 600L)), "user_2" -> ((2L, 3000L)),
      "user_3" -> ((1L, 700L))))
  }
}
