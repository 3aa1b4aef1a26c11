package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic-sampling soak: [[Sampling.systematicSample]]'s
  * bucket-decomposed prefix sum at 20M rows — the committed evidence
  * that the exact-k guarantee and the no-global-window plan shape hold
  * at scale.
  *
  * What the numbers must show (committed to PLANS.md):
  *   - exactly k picks (sum of multiplicities) at 20M weighted rows;
  *   - a planted whale holding ~25% of the weight mass carries ~k/4
  *     multiplicity — PPS honored, not just size;
  *   - the 256 hash-prefix buckets stay balanced (max/min bucket row
  *     count), so no bucket-local prefix scan becomes a straggler;
  *   - wall time stays scan-shaped (no single-task window funnel).
  *
  * Run: `sbt "runMain graft.examples.SampleScaleDemo [rows] [k]"`.
  */
object SampleScaleDemo {

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val k = args.lift(1).map(_.toLong).getOrElse(10000L)

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~uniform weights 1..9 (sum ≈ 5·nRows) + one whale carrying a
    // third of that again (≈ 25% of the final mass)
    val whaleW = 5L * nRows / 3L
    val df = spark.range(nRows)
      .select(col("id").as("doc_id"), (col("id") % 9 + 1).as("w"))
      .unionByName(spark.range(1)
        .select((col("id") + nRows).as("doc_id"), lit(whaleW).as("w")))

    println(s"[cfg] rows=${nRows + 1} k=$k whaleWeight=$whaleW")

    val t0 = System.nanoTime()
    val out = Sampling.systematicSample(df, k, "w").select("doc_id", "n_picks")
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val totPicks = out.map(_.getLong(1)).sum
    val whale = out.find(_.getLong(0) == nRows).map(_.getLong(1)).getOrElse(0L)
    println(f"[picks] total=$totPicks (k=$k) whale=$whale " +
      f"(expect ~${k / 4}) wall=${secs}%.1fs")
    require(totPicks == k, s"exact-k violated: $totPicks != $k")

    // bucket balance: the hash-prefix cut must not funnel
    val buckets = df
      .withColumn("_h", graft.functions.Hashing.md5Long60(
        col("doc_id").cast("string")))
      .withColumn("_bk", expr(s"_h div ${(1L << 60) / 256}L"))
      .groupBy("_bk").count()
      .agg(min("count").as("mn"), max("count").as("mx"), count(lit(1)).as("nb"))
      .head()
    println(s"[buckets] n=${buckets.getLong(2)} rows/bucket " +
      s"min=${buckets.getLong(0)} max=${buckets.getLong(1)}")

    spark.stop()
  }
}
