package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.PointInTime

/** Demonstrates WHY asOfJoinBucketed exists: a synthetic workload where
  * one hot entity owns half of all feature rows — the shape AQE
  * cannot fix, because a window partition is indivisible. The plain
  * union+window as-of funnels the hot entity into one task (one core
  * does 1/3 of the work); the bucketed two-pass prefix scan splits it
  * across (entity, time-bucket) tasks and uses the whole machine.
  *
  * Deterministic synthesis from `spark.range` — rerunning gives the
  * identical dataset and an equivalence check between both strategies.
  *
  * Usage: runMain graft.examples.SkewDemo [nRows] (default 5M)
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // entity 0 gets every SECOND row (50% of the table); the rest
    // spread over 100k entities. One timestamp per row (micros since
    // epoch), unique → deterministic. The hot share must comfortably
    // exceed rows/cores for the window's serialization to dominate the
    // parallel floor — at 1/cores share the single hot task merely ties
    // the other cores' combined work.
    def entity = when(col("id") % 2 === 0, 0L)
      .otherwise(pmod(col("id"), lit(100000L)) + 1L)
    val feat = spark.range(n).select(
      entity.as("entity_id"),
      timestamp_micros(col("id") * 1000000L).as("timestamp"),
      col("id").as("payload"))
    val spine = spark.range(n / 10).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(col("id") * 7L, lit(100000L)) + 1L).as("entity_id"),
      timestamp_micros((col("id") * 10L + 5L) * 1000000L).as("timestamp"))

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[skew] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$r")
      r
    }
    // content checksum, not just a row count: a strategy matching every
    // probe to the WRONG feature row would preserve the count
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("payload")).cast("long")).head().getLong(0)

    // warm both plans once at 1/50 scale so JIT/codegen is steady
    val wf = feat.limit((n / 50).toInt)
    PointInTime.asOfJoin(spine.limit((n / 500).toInt), wf).count()
    PointInTime.asOfJoinBucketed(spine.limit((n / 500).toInt), wf, 86400L).count()
    PointInTime.asOfJoinSkewHybrid(spine.limit((n / 500).toInt), wf, 86400L, 100000L).count()

    // decomposition: where does the hybrid's time go?
    time("  window on cold tail")(
      PointInTime.asOfJoin(
        spine.filter(col("entity_id") =!= 0L),
        feat.filter(col("entity_id") =!= 0L)).count())
    time("  window on hot entity")(
      PointInTime.asOfJoin(
        spine.filter(col("entity_id") === 0L),
        feat.filter(col("entity_id") === 0L)).count())
    time("  bucketed on hot entity")(
      PointInTime.asOfJoinBucketed(
        spine.filter(col("entity_id") === 0L),
        feat.filter(col("entity_id") === 0L), 86400L).count())

    val a = time("asOfJoin (window)")(
      PointInTime.asOfJoin(spine, feat).count())
    // bucket = 1 day of synthetic time = 86400 rows of the hot entity
    val b = time("asOfJoinBucketed (2-pass)")(
      PointInTime.asOfJoinBucketed(spine, feat, bucketSeconds = 86400L).count())
    // hybrid: only the hot entity (n/2 rows) buckets; the 100k-entity
    // long tail takes the window path
    val c = time("asOfJoinSkewHybrid")(
      PointInTime.asOfJoinSkewHybrid(
        spine, feat, bucketSeconds = 86400L, hotRowThreshold = 100000L).count())
    require(a == b && b == c, s"strategies disagree on count: $a / $b / $c")
    val ka = checksum(PointInTime.asOfJoin(spine, feat))
    val kb = checksum(PointInTime.asOfJoinBucketed(spine, feat, 86400L))
    val kc = checksum(PointInTime.asOfJoinSkewHybrid(spine, feat, 86400L, 100000L))
    require(ka == kb && kb == kc, s"strategies disagree on content: $ka / $kb / $kc")
    println(s"[skew] equivalence OK ($a rows, payload checksum $ka)")
    spark.stop()
  }
}
