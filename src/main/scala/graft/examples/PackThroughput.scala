package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.RowCodecExpressions

/** Dev tool: per-row cost of the staged-blob codec expressions
  * ([[graft.sources.RowCodecExpressions]] pack -> unpack) over an
  * N-row six-column frame shaped like the soak table. Evidence for the
  * doGenCode upgrade (PLANS round-8): the interpreted CodegenFallback
  * versions measured ~1.9 us/row/side on the 20M-row snapshot batch.
  * Usage: runMain graft.examples.PackThroughput [rows] [reps]
  */
object PackThroughput {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same column shape as MutationScaleDemo's soak table
    val df = spark.range(rows).select(
      concat(lit("user_"), col("id") % 1000000).as("entity_id"),
      timestamp_seconds(lit(1704067200L) + col("id") % 31536000).as("timestamp"),
      (col("id") % 1000 / 10.0).as("feature_a"),
      (col("id") % 97).as("feature_b"),
      concat(lit("seg_"), col("id") % 10).as("segment"),
      (col("id") % 2 === 0).as("active"))
    val schema = df.schema

    df.count() // warm the input pipeline
    (1 to reps).foreach { i =>
      var t0 = System.nanoTime()
      val packedCount = df
        .select(RowCodecExpressions.packed(schema.fieldNames.toSeq).as("r"))
        .where(length(col("r")) > 0).count()
      val packS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val backCount = df
        .select(RowCodecExpressions.packed(schema.fieldNames.toSeq).as("r"))
        .select(RowCodecExpressions.unpacked(col("r"), schema).as("u"))
        .where(col("u.feature_b") >= 0).count()
      val bothS = (System.nanoTime() - t0) / 1e9
      println(f"[packthroughput] #$i rows=$packedCount pack=$packS%.2fs " +
        f"(${packS * 1e9 / rows}%.0f ns/row) pack+unpack=$bothS%.2fs " +
        f"(${bothS * 1e9 / rows}%.0f ns/row) check=$backCount")
    }
    spark.stop()
  }
}
