package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Entity-bucketed registration — the co-location answer for feature
  * tables that are probed per entity far more often than they are
  * written (reference: src/ml_feature_store/store.py:129-157 `register`,
  * whose in-memory frame has no layout at all).
  *
  * `bucketBy(entity)` + `sortBy(entity, ts)` pays the entity shuffle
  * ONCE at write time; every subsequent per-entity aggregation (PIT
  * latest-row, latest-k) and entity-keyed join then reads already
  * co-partitioned, pre-sorted buckets and plans WITHOUT its exchange —
  * at 100 TB that is the difference between a full-table shuffle per
  * training-set build and none. The [[Storage]] date-partitioned layout
  * stays the default (it prunes the time axis); bucketing is the
  * complementary layout for entity-axis-heavy workloads, and Spark
  * requires a catalog table (`saveAsTable`) for the bucket metadata to
  * survive the round trip.
  */
object BucketedTables {

  /** Write `df` as an external bucketed parquet table at `path`,
    * registered under `tableName` in the session catalog.
    */
  def register(
      df: DataFrame,
      tableName: String,
      path: String,
      numBuckets: Int = 32,
      entityCol: String = "entity_id",
      tsCol: String = "timestamp"): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, entityCol)
      .sortBy(entityCol, tsCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** The registered bucketed table, bucket metadata intact. */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
