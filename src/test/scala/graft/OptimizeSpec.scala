package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{FeatureStore, FeatureValidationError}

/** OPTIMIZE ([[FeatureStore.optimizeTable]]): clustered physical
  * rewrite — content-identical, layout range-clustered (or z-ordered)
  * so parquet file min/max become tight on the cluster keys.
  */
class OptimizeSpec extends AnyFunSuite with SparkTestBase {

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 800 rows in one calendar month, cluster keys INTERLEAVED in
    * arrival order — before optimize, every file spans the full key
    * range.
    */
  private def interleaved: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 800).map { i =>
      ("u" + (i % 10), ts(f"2024-01-${1 + i % 28}%02d"),
        (i * 37L) % 800, (i * 53L) % 800)
    }.toDF("entity_id", "timestamp", "feature_b", "value2")
  }

  /** Per-file (min, max) of a column in the given version read. */
  private def fileRanges(df: DataFrame, c: String): Seq[(Long, Long)] =
    df.groupBy(input_file_name())
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .collect().toSeq.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))

  /** At test scale AQE correctly coalesces the whole 800-row shuffle
    * into one partition (at real scale it sizes files by bytes — the
    * desired production behavior); observing the clustered LAYOUT needs
    * several output files, so run `body` with coalescing off.
    */
  private def withoutCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("range clustering: content preserved, files cover tight key ranges") {
    val store = new FeatureStore(spark, tmpRoot("graft_opt"))
    val df = interleaved
    store.register("t", df.filter(col("feature_b") % 2 === 0))
    store.registerAppend("t", df.filter(col("feature_b") % 2 === 1))
    val before = store.getVersion("t", 2)

    // pre-optimize: interleaved arrival → every file spans ~everything
    val pre = fileRanges(before, "feature_b")
    assert(pre.forall { case (lo, hi) => hi - lo > 600 })

    val info = withoutCoalesce(store.optimizeTable("t", Seq("feature_b")))
    assert(info.version == 3 && info.rowCount == 800)
    val after = store.getVersion("t", 3)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)

    // post-optimize: multiple files, each covering a tight range
    val post = fileRanges(after, "feature_b")
    assert(post.size >= 2)
    assert(post.forall { case (lo, hi) => hi - lo <= 400 },
      s"file ranges after optimize: $post")

    // DESCRIBE HISTORY shows the operation; the change feed resolves
    // the content-preserving step to zero changes without a diff
    assert(store.getTableHistory("t")
      .find(_.version == 3).flatMap(_.operation).contains("optimize"))
    assert(store.getChanges("t", 2, 3).isEmpty)

    // PIT reads and time travel are untouched
    assert(store.getVersion("t", 2).count() == 800)
    assert(store.get("t", Seq("u1"), "2024-01-28").count() == 1)
  }

  test("zorder: both dimensions shrink per file, not just the leading key") {
    val store = new FeatureStore(spark, tmpRoot("graft_opt_z"))
    store.register("t", interleaved)
    val before = store.getVersion("t", 1)

    withoutCoalesce(
      store.optimizeTable("t", Seq("feature_b", "value2"), zorder = true))
    val after = store.getVersion("t", 2)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)

    val rb = fileRanges(after, "feature_b")
    val rv = fileRanges(after, "value2")
    assert(rb.size >= 2)
    // each file covers a z-interval ≈ a quadrant: the mean covered AREA
    // must be well under the full key plane (lexicographic clustering
    // would leave value2 at full range in every file)
    val areas = rb.zip(rv).map { case ((bl, bh), (vl, vh)) =>
      (bh - bl).toDouble * (vh - vl).toDouble
    }
    val globalArea = 800.0 * 800.0
    assert(areas.sum / areas.size < 0.5 * globalArea,
      s"mean file area ${areas.sum / areas.size} vs global $globalArea")
    val vRanges = rv.map { case (lo, hi) => hi - lo }
    assert(vRanges.count(_ <= 600) >= vRanges.size / 2,
      s"value2 per-file ranges: $vRanges")
  }

  test("incremental optimize rewrites only the unclustered tail") {
    val root = tmpRoot("graft_opt_inc")
    val store = new FeatureStore(spark, root)
    val s = spark
    import s.implicits._
    store.register("t", interleaved)
    withoutCoalesce(store.optimizeTable("t", Seq("feature_b"))) // v2, full

    // new data arrives after the optimize
    val extra = (0 until 100).map { i =>
      ("x" + (i % 5), ts(f"2024-02-${1 + i % 28}%02d"),
        (i * 41L) % 800, (i * 59L) % 800)
    }.toDF("entity_id", "timestamp", "feature_b", "value2")
    store.registerAppend("t", extra) // v3, manifest [2, 3]
    val before = store.getVersion("t", 3)
    val baseFiles = java.nio.file.Files
      .list(java.nio.file.Paths.get(root, "t", "v=2")).toArray.length

    val info = withoutCoalesce(
      store.optimizeTable("t", Seq("feature_b"), incremental = true)) // v4
    assert(info.version == 4 && info.rowCount == 900)
    val hist = store.getTableHistory("t").find(_.version == 4).get
    // the clustered base is re-referenced verbatim; only the tail was
    // rewritten into the new segment
    assert(hist.segments == Seq(2, 4))
    assert(java.nio.file.Files
      .list(java.nio.file.Paths.get(root, "t", "v=2")).toArray.length
      == baseFiles)
    val after = store.getVersion("t", 4)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    assert(store.getChanges("t", 3, 4).isEmpty)

    // nothing new since: a second incremental run is a no-op
    assert(store
      .optimizeTable("t", Seq("feature_b"), incremental = true).version == 4)

    // a spec change can't trust the base layout: full rewrite
    val full = withoutCoalesce(
      store.optimizeTable("t", Seq("value2"), incremental = true))
    assert(full.version == 5)
    assert(store.getTableHistory("t")
      .find(_.version == 5).get.segments == Seq(5))
  }

  test("mutations preserve the recorded clustering in their rewrites") {
    val store = new FeatureStore(spark, tmpRoot("graft_opt_mut"))
    store.register("t", interleaved)
    withoutCoalesce(store.optimizeTable("t", Seq("feature_b"))) // v2
    // a delete rewrites the (single, clustered) segment; the rewrite
    // must come out range-clustered again, not in arrival order
    val info = withoutCoalesce(
      store.deleteRows("t", col("value2") === 0L))
    assert(info.rowCount == 799)
    val ranges = fileRanges(store.getVersion("t", info.version), "feature_b")
    assert(ranges.size >= 2)
    assert(ranges.forall { case (lo, hi) => hi - lo <= 400 },
      s"post-delete file ranges: $ranges")
  }

  test("validation: unknown and non-numeric zorder columns are rejected") {
    val store = new FeatureStore(spark, tmpRoot("graft_opt_bad"))
    store.register("t", interleaved)
    intercept[FeatureValidationError] {
      store.optimizeTable("t", Seq.empty)
    }
    intercept[FeatureValidationError] {
      store.optimizeTable("t", Seq("nope"))
    }
    intercept[FeatureValidationError] {
      store.optimizeTable("t", Seq("entity_id", "feature_b"), zorder = true)
    }
    // lexicographic clustering accepts strings
    store.optimizeTable("t", Seq("entity_id", "feature_b"))
    assert(store.getTableInfo("t").rowCount == 800)
    // a failed optimize must not have wedged the lineage
    assert(store.getTableInfo("t").version == 2)
  }
}
