package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Pins the routing contract of [[Dedup.fanOutNarrowScan]] — the
  * two-sided narrow test (estimated splits < cores AND at most
  * `maxSplitsOfBytes` splits' worth of bytes), the file-backed-leaves
  * gate, and the caller byte-bound knob. A future refactor that
  * inverts the byte bound or drops the parallelism guard would
  * otherwise pass the whole suite while silently re-introducing the
  * mid-size shuffle (182 MB measured, AnnRpScaleDemo) or disabling the
  * small-corpus fan-out the bench plans rely on.
  */
class FanOutNarrowScanSpec extends AnyFunSuite with SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private lazy val tempRoot =
    java.nio.file.Files.createTempDirectory("graft_fanout_test")

  private lazy val smallParquet: String = {
    val dir = tempRoot.toString + "/t"
    spark.range(200).selectExpr("id", "CAST(id AS STRING) AS s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(tempRoot.toFile)
    super.afterAll()
  }

  private def par = spark.sparkContext.defaultParallelism

  private def partitions(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  private def withMaxPartitionBytes[A](v: String)(f: => A): A = {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, v)
    try f finally spark.conf.set(key, prev)
  }

  test("a small single-split file scan fans out to session parallelism") {
    val df = spark.read.parquet(smallParquet)
    val fanned = Dedup.fanOutNarrowScan(df)
    assert(!(fanned eq df), "expected a repartitioned frame")
    assert(partitions(fanned) == par)
    assert(fanned.count() == 200) // routing-only: rows unchanged
  }

  test("a scan estimated wider than the core count is left untouched") {
    // tiny maxPartitionBytes makes the same file estimate to far more
    // splits than cores. A huge caller byte bound SATISFIES the byte
    // test, so the parallelism guard alone must be the condition that
    // declines here — deleting `estSplits < par` from the helper fails
    // THIS assertion, not just the byte-bound test below
    withMaxPartitionBytes("64") {
      val df = spark.read.parquet(smallParquet)
      assert(Dedup.fanOutNarrowScan(df, maxSplitsOfBytes = 1 << 20) eq df)
      assert(Dedup.fanOutNarrowScan(df) eq df)
    }
  }

  test("the byte bound declines mid-size scans; a caller bound re-admits them") {
    // pick maxPartitionBytes so the file is 2-8 splits of bytes: fewer
    // splits than cores would need par > 8, so assume a small file and
    // derive the setting from its actual size
    val bytes = new java.io.File(smallParquet).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assume(bytes > 64, "parquet file unexpectedly tiny")
    val half = math.max(64L, bytes / 2 + 1) // file = 2 splits of bytes
    withMaxPartitionBytes(half.toString) {
      assume(par > 2, "needs parallelism > 2 for the split test to pass")
      val df = spark.read.parquet(smallParquet)
      // estSplits (~2-3) < cores, but size exceeds ONE split's bytes:
      // the default one-split bound declines...
      assert(Dedup.fanOutNarrowScan(df) eq df)
      // ...and a compute-heavy caller's wider bound re-admits it
      val fanned = Dedup.fanOutNarrowScan(df, maxSplitsOfBytes = 8)
      assert(!(fanned eq df))
      assert(partitions(fanned) == par)
    }
  }

  test("crossDupSpans one-pass (narrow) and two-pass (wide) strategies agree") {
    // the narrow gate picks a single-shuffle groupBy+collect_list plan
    // for file-backed small corpora and the count-prefilter two-pass
    // plan otherwise — both must produce the identical span list. The
    // corpus repeats one 20-token run across three docs (split across
    // doc boundaries differently) and includes a unique-text doc.
    val run = (1 to 20).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, s"$run alpha beta gamma"),
      (2L, s"prefix words here $run"),
      (3L, s"$run"),
      (4L, "entirely unique text with no repeats at all whatsoever"))
    val s = spark
    import s.implicits._
    val local = rows.toDF("doc_id", "text") // in-memory: wide branch
    val dir = tempRoot.toString + "/spans"
    local.coalesce(1).write.mode("overwrite").parquet(dir)
    val fromFile = spark.read.parquet(dir) // single split: narrow branch
    assume(Dedup.isNarrowScan(fromFile, 8), "fixture should gate narrow")
    def spans(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis
        .crossDupSpans(df, width = 8, minSpanTokens = 16, maxShingleOcc = 64)
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
        .collect()
        .toSeq
    val wide = spans(local)
    assert(wide.nonEmpty, "fixture must produce at least one span")
    assert(spans(fromFile) == wide)
  }

  test("non-file inputs (local/in-memory) are never repartitioned") {
    val s = spark
    import s.implicits._
    val local = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    assert(Dedup.fanOutNarrowScan(local) eq local)
    val cached = spark.read.parquet(smallParquet).cache()
    try assert(Dedup.fanOutNarrowScan(cached) eq cached)
    finally { cached.unpersist(); () }
  }
}
