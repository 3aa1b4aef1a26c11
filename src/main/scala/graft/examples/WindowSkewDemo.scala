package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.WindowFeatures
import graft.store.WindowFeatures.WindowAgg

/** [[SkewDemo]]'s sibling for the windowed-aggregate family: WHY
  * windowAggJoinBucketed exists. One hot entity owns half of all
  * feature rows; the plain RANGE-frame window plan funnels that
  * entity's probes into ONE task (a window partition is indivisible —
  * the skew AQE cannot split), while the bucketed prefix/suffix
  * decomposition spreads them across (entity, time-bucket) tasks. The
  * hybrid routes by entity heat, like the as-of hybrid.
  *
  * Deterministic synthesis from `spark.range`; all three strategies are
  * equality-checked on a content checksum, not just a count.
  *
  * Usage: runMain graft.examples.WindowSkewDemo [nRows] [windowSeconds]
  * (default 5M rows, 3600 s — pass 86400 for the wide-frame pathology)
  */
object WindowSkewDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val windowSeconds =
      if (args.length > 1) args(1).toLong else 3600L
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

    // same shape as SkewDemo: entity 0 gets every second feature row;
    // the long tail spreads over 100k entities; one second of synthetic
    // time per row → deterministic, unique timestamps
    def entity = when(col("id") % 2 === 0, 0L)
      .otherwise(pmod(col("id"), lit(100000L)) + 1L)
    val feat = spark.range(n).select(
      entity.as("entity_id"),
      timestamp_micros(col("id") * 1000000L).as("timestamp"),
      (col("id") % 1000L).as("cents"))
    val spine = spark.range(n / 10).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(col("id") * 7L, lit(100000L)) + 1L).as("entity_id"),
      timestamp_micros((col("id") * 10L + 5L) * 1000000L).as("timestamp"))

    // aggregates cover add-fold (rows/sum) and extreme-fold (max)
    // recombination. The window width is the demo's independent
    // variable: the plain plan's sliding RANGE frame costs O(frame) per
    // probe inside ONE indivisible hot-entity task (no invertible
    // remove for max), so a wide frame is where the bucketed
    // decomposition — two RUNNING scans, O(1) per row, spread across
    // (entity, bucket) tasks — takes over; at narrow frames the plain
    // single-window plan wins and the hybrid's heat routing exists to
    // pick per shape.
    val aggs = Seq(
      WindowAgg("n_ev", "rows"),
      WindowAgg("sum_cents", "sum", "cents"),
      WindowAgg("max_cents", "max", "cents"))
    val w = windowSeconds

    // content checksum over every aggregate column: it is ALSO the
    // timed action — a bare count() would let column pruning remove the
    // unreferenced window aggregates and time an empty plan (measured:
    // the "plain" leg read 0.5s at 20M that way), and a wrong frame
    // boundary preserves the row count but not these sums
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(
        sum(col("n_ev")).cast("long"),
        sum(col("sum_cents")).cast("long"),
        sum(col("max_cents")).cast("long")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val t0 = System.nanoTime()
      val r = checksum(f)
      println(f"[wskew] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs  sums=$r")
      r
    }

    // warm all plans at 1/50 scale (through the checksum, the timed shape)
    val wf = feat.limit((n / 50).toInt)
    val ws = spine.limit((n / 500).toInt)
    checksum(WindowFeatures.windowAggJoin(ws, wf, w, aggs))
    checksum(WindowFeatures.windowAggJoinBucketed(ws, wf, w, aggs))
    checksum(WindowFeatures.windowAggJoinHybrid(ws, wf, w, aggs, 100000L))

    // decomposition: the hot entity IS the plain plan's bottleneck
    time("  window on cold tail")(
      WindowFeatures.windowAggJoin(
        spine.filter(col("entity_id") =!= 0L),
        feat.filter(col("entity_id") =!= 0L), w, aggs))
    time("  window on hot entity")(
      WindowFeatures.windowAggJoin(
        spine.filter(col("entity_id") === 0L),
        feat.filter(col("entity_id") === 0L), w, aggs))
    time("  bucketed on hot entity")(
      WindowFeatures.windowAggJoinBucketed(
        spine.filter(col("entity_id") === 0L),
        feat.filter(col("entity_id") === 0L), w, aggs))

    val ka = time("windowAggJoin (window)")(
      WindowFeatures.windowAggJoin(spine, feat, w, aggs))
    val kb = time("windowAggJoinBucketed (2-pass)")(
      WindowFeatures.windowAggJoinBucketed(spine, feat, w, aggs))
    val kc = time("windowAggJoinHybrid")(
      WindowFeatures.windowAggJoinHybrid(spine, feat, w, aggs, 100000L))
    require(ka == kb && kb == kc, s"strategies disagree on content: $ka / $kb / $kc")
    val a = WindowFeatures.windowAggJoin(spine, feat, w, aggs).count()
    val b = WindowFeatures.windowAggJoinBucketed(spine, feat, w, aggs).count()
    require(a == b, s"strategies disagree on count: $a / $b")
    println(s"[wskew] equivalence OK ($a rows, checksums $ka)")
    spark.stop()
  }
}
