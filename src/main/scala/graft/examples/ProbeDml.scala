package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeDml {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_dml").toString
    val store = new graft.store.FeatureStore(spark, root)
    val df = spark.range(10).select(
      col("id").as("entity_id"),
      timestamp_seconds(lit(1704067200L) + col("id")).as("timestamp"),
      (col("id") * 1.5).as("v"))
    store.register("t", df)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gt USING graft OPTIONS (root '$root', `table` 't')")
    for (stmt <- Seq(
        "DELETE FROM gt WHERE entity_id < 3",
        "UPDATE gt SET v = v + 1 WHERE entity_id = 5",
        """MERGE INTO gt USING (SELECT 5L AS entity_id, TIMESTAMP'2024-01-01' AS timestamp, 9.9 AS v) s
          |ON gt.entity_id = s.entity_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)) {
      println(s"=== $stmt")
      try { spark.sql(stmt).show() }
      catch { case e: Throwable =>
        println(s"FAILED: ${e.getClass.getName}: ${e.getMessage.take(400)}")
        e.getStackTrace.take(8).foreach(f => println(s"  at $f"))
      }
    }
    spark.stop()
  }
}
