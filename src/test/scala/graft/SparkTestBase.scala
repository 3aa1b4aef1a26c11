package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local SparkSession for the whole forked test JVM. */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session

  /** "2024-01-15" or "2024-01-15 10:30:00" → Timestamp (UTC convention). */
  def ts(s: String): Timestamp =
    graft.store.FeatureStore.normalizeTimestamp(s)

  /** The reference's canonical 5-row fixture
    * (reference tests/test_core.py:35-52; FIXTURES.md A.1).
    */
  def sampleFeatures: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("user_1", ts("2024-01-01"), 1.0, 100L),
      ("user_1", ts("2024-01-15"), 2.0, 200L),
      ("user_1", ts("2024-02-01"), 3.0, 300L),
      ("user_2", ts("2024-01-01"), 10.0, 1000L),
      ("user_2", ts("2024-01-20"), 20.0, 2000L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b")
  }

  /** Single-row table used by versioning/management tests
    * (reference test_core.py:15-26 `_make_feature_df`).
    */
  def singleRow(value: Double): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(("user_1", ts("2024-01-01"), value)).toDF("entity_id", "timestamp", "val")
  }
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
