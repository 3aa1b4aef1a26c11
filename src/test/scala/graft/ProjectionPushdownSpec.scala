package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.PointInTime

/** A `columns=` projection must reach the parquet scan: the kernels
  * prune the feature table before the argmax/union, so at scale the
  * scan reads only (entity, ts, tie-breaks, requested features) instead
  * of every column. These tests pin that plan property — a regression
  * here is invisible to value-level tests but catastrophic at 100 TB.
  */
class ProjectionPushdownSpec extends AnyFunSuite with SparkTestBase {

  private lazy val tableDir: String = {
    val dir = Files.createTempDirectory("graft_pushdown").toString
    sampleFeatures
      .withColumn("feature_c", lit("wide-column-that-should-not-be-read"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Column names the plan's parquet scans actually read; descends into
    * AQE-wrapped subplans (AdaptiveSparkPlanExec holds its inner plan as
    * a field, not a child, so plain collect stops at it).
    */
  private def scans(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collectWithSubqueries {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
    }.flatten

  private def scannedColumns(df: DataFrame): Set[String] = {
    val ss = scans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, "expected at least one parquet scan in the plan")
    ss.map(_.requiredSchema.fieldNames.toSet).reduce(_ ++ _)
  }

  test("pitSnapshot with columns= reads only the needed columns") {
    val table = spark.read.parquet(tableDir)
    val df = PointInTime.pitSnapshot(
      table, lit(ts("2024-01-20")), Some(Seq("user_1")),
      columns = Some(Seq("feature_a")))
    val cols = scannedColumns(df)
    assert(cols == Set("entity_id", "timestamp", "feature_a"))
    assert(df.collect().head.getAs[Double]("feature_a") == 2.0)
  }

  test("asOfJoin with columns= prunes the feature-table scan") {
    val table = spark.read.parquet(tableDir)
    val s = spark
    import s.implicits._
    val spine = Seq(("user_1", ts("2024-01-20"))).toDF("entity_id", "timestamp")
    val df = PointInTime.asOfJoin(
      spine, table, columns = Some(Seq("feature_b")))
    val cols = scannedColumns(df)
    assert(cols == Set("entity_id", "timestamp", "feature_b"))
    assert(df.collect().head.getAs[Long]("feature_b") == 200L)
  }

  test("without columns= the full row is preserved") {
    val table = spark.read.parquet(tableDir)
    val df = PointInTime.pitSnapshot(
      table, lit(ts("2024-01-20")), Some(Seq("user_1")))
    assert(df.columns.toSet ==
      Set("entity_id", "timestamp", "feature_a", "feature_b", "feature_c"))
  }
}
