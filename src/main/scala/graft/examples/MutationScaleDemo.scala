package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.FeatureStore

/** Mutation-at-scale soak: a 20M-row, 10-segment table driven through
  * the whole mutation surface — selective row deletes, a broader
  * control delete, a keyed MERGE upsert, full then INCREMENTAL
  * OPTIMIZE, and a change-feed CDC replica — printing per-step wall
  * time, rows affected, and SEGMENTS REWRITTEN out of the total.
  *
  * What the numbers must show (the 100 TB claims, evidence-committed
  * to PLANS.md):
  *   - delete/upsert cost tracks AFFECTED segments, not table size:
  *     a one-month predicate classifies 1 of 10 month-disjoint
  *     segments (column-stats pruning) and rewrites only it; the
  *     two-month control costs ~2x the one-month step, not ~10x.
  *   - incremental OPTIMIZE rewrites the unclustered tail only, far
  *     below the full-table pass it follows.
  *   - the CDC follower's catch-up batch is O(changes): following the
  *     mutation series costs a fraction of the initial 20M-row
  *     snapshot batch, and a content-preserving optimize feeds the
  *     replica ZERO rows.
  */
object MutationScaleDemo {
  def main(args: Array[String]): Unit = {
    val rowsPerMonth = args.headOption.map(_.toLong).getOrElse(2000000L)
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
      println(f"[mscale] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // month-disjoint slices: entity ids shared across months (so
    // upserts hit), timestamps and values confined to the month — the
    // per-segment column stats make mutation classification provable
    def slice(month: Int, n: Long = rowsPerMonth): DataFrame =
      spark.range(n).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit(f"2024-$month%02d-01")),
          (col("id") % 27).cast("int")).cast("timestamp").as("timestamp"),
        (lit(month) * 1000000000L + col("id")).as("l_value"))

    val base = java.nio.file.Files.createTempDirectory("graft_mscale")
    val srcRoot = s"$base/src"
    val dstRoot = s"$base/replica"
    val ck = s"$base/ck"
    try {
      val store = new FeatureStore(spark, srcRoot, maxVersions = 50)
      def segsNow(s: FeatureStore = store, t: String = "t"): Seq[Int] =
        s.getTableHistory(t).find(_.isCurrent).get.segments
      def report(label: String, before: Seq[Int]): Unit = {
        val after = segsNow()
        println(s"[mscale]   $label: segments ${before.size} -> " +
          s"${after.size}, rewritten/new = ${after.diff(before).size} " +
          s"(${after.diff(before).mkString(",")})")
      }

      // ---- build: 1 register + 9 appends = 10 month-disjoint segments
      time(s"register month 1 ($rowsPerMonth rows)") {
        store.register("t", slice(1))
      }
      (2 to 10).foreach { m =>
        time(f"append month $m%2d ($rowsPerMonth rows)") {
          store.registerAppend("t", slice(m), maxSegments = 100)
        }
      }
      val total0 = store.getTableInfo("t").rowCount
      println(s"[mscale] table: $total0 rows, ${segsNow().size} segments")

      // ---- CDC replica: initial snapshot batch (the O(table) baseline)
      def follow(tag: String): Unit = {
        val q = spark.readStream.format("graft")
          .option("root", srcRoot).option("table", "t")
          .load()
          .writeStream.format("graft")
          .option("root", dstRoot).option("table", "t")
          .option("mode", "cdc")
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
          .start()
        try time(tag)(q.processAllAvailable()) finally q.stop()
      }
      follow(s"cdc follow: SNAPSHOT ($total0 rows)")

      // ---- selective delete: one month's early days → 1 segment hit
      var before = segsNow()
      val d1 = time("deleteRows month 5 days 1-9 (1 of 10 segs)") {
        store.deleteRows("t",
          col("timestamp") >= lit(java.sql.Timestamp.valueOf("2024-05-01 00:00:00")) &&
            col("timestamp") < lit(java.sql.Timestamp.valueOf("2024-05-10 00:00:00")))
      }
      report(s"delete ${total0 - d1.rowCount} rows", before)

      // ---- control: same shape over TWO months → 2 segments hit
      before = segsNow()
      val rows1 = store.getTableInfo("t").rowCount
      val d2 = time("deleteRows months 7-8 days 1-9 (2 of 10 segs)") {
        store.deleteRows("t",
          col("timestamp") >= lit(java.sql.Timestamp.valueOf("2024-07-01 00:00:00")) &&
            col("timestamp") < lit(java.sql.Timestamp.valueOf("2024-08-10 00:00:00")) &&
            dayofmonth(col("timestamp")) < 10)
      }
      report(s"delete ${rows1 - d2.rowCount} rows", before)

      // ---- keyed MERGE upsert confined to month 9 → 1 segment hit
      before = segsNow()
      val ups = spark.range(100000).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-09-01")),
          (col("id") % 27).cast("int")).cast("timestamp").as("timestamp"),
        (col("id") + 77L).as("l_value"))
      time("upsert 100k keys into month 9 (1 of 10 segs)") {
        store.registerUpsert("t", ups)
      }
      report("upsert", before)

      // ---- ATOMIC rewrite: rekey 50k of month 10's keys into month 12
      // in ONE commit (drop old keys + land rekeyed rows) — cost must
      // match the plain upsert's shape (affected segments + delta),
      // the atomicity is free
      before = segsNow()
      val rek = spark.range(50000).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-12-01")),
          (col("id") % 27).cast("int")).cast("timestamp").as("timestamp"),
        (col("id") + 991L).as("l_value"))
      val rekOldKeys = spark.range(50000).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-10-01")),
          (col("id") % 27).cast("int")).cast("timestamp").as("timestamp"))
      time("registerRewrite: rekey 50k keys month 10 -> 12 (ONE commit)") {
        store.registerRewrite("t", rek, rekOldKeys)
      }
      report("atomic rewrite", before)

      // ---- catch-up follow: O(changes), not O(table)
      follow("cdc follow: CATCH-UP (4 mutation commits)")

      // ---- OPTIMIZE: full pass, then append + INCREMENTAL pass
      time("OPTIMIZE full (range cluster by timestamp)") {
        store.optimizeTable("t", Seq("timestamp"))
      }
      // a content-preserving commit feeds the replica ZERO rows — this
      // batch exists (the offset advanced) but carries nothing
      follow("cdc follow: OPTIMIZE only (0 change rows)")
      time("append month 11 (unclustered tail)") {
        store.registerAppend("t", slice(11), maxSegments = 100)
      }
      before = segsNow()
      time("OPTIMIZE incremental (tail only)") {
        store.optimizeTable("t", Seq("timestamp"), incremental = true)
      }
      report("incremental optimize", before)

      // ---- follower over append + incremental optimize: the feed is
      // exactly the month-11 insert rows; the optimize again feeds none
      follow(s"cdc follow: month-11 append ($rowsPerMonth rows)")

      // ---- converge check
      val src = store.getVersion("t", store.getTableInfo("t").version)
      val dstS = new FeatureStore(spark, dstRoot)
      val dst = dstS.getVersion("t", dstS.getTableInfo("t").version)
      val diff = time("replica convergence check") {
        dst.exceptAll(src).count() + src.exceptAll(dst).count()
      }
      require(diff == 0, s"replica diverged: $diff rows differ")
      println(s"[mscale] replica CONVERGED at ${dst.count()} rows; " +
        s"final table ${store.getTableInfo("t").rowCount} rows, " +
        s"${segsNow().size} segments")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
      spark.stop()
    }
  }
}
