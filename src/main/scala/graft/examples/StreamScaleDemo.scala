package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.store.FeatureStore

/** Rows-stream-at-scale soak: a 20M-row table consumed through the SQL
  * catalog's `spark.readStream.table(...)` surface
  * ([[graft.sources.GraftTableRowsStream]]), printing per-microbatch
  * wall time for each phase of a follower's life.
  *
  * What the numbers must show (the 100 TB claims, evidence-committed
  * to PLANS.md):
  *   - the initial snapshot batch is the only O(table) step;
  *   - each append's delta batch is O(delta): a 100k-row append into a
  *     20M-row table streams at a small fraction of the snapshot wall,
  *     because the admitted commit renders through the store's
  *     RECORDED change set (`getChanges(v-1, v)`), never a table diff;
  *   - a skipped mutating commit (delete under
  *     `skipChangeCommits=true`) costs table-history time only — no
  *     change set is computed, no rows are staged;
  *   - a content-preserving OPTIMIZE commit is skipped silently at the
  *     same near-zero cost.
  */
object StreamScaleDemo {
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
      println(f"[sscale] $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    def slice(tag: Long, n: Long): DataFrame =
      spark.range(n).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-01-01")),
          (col("id") % 270).cast("int")).cast("timestamp").as("timestamp"),
        (lit(tag) * 1000000000L + col("id")).as("l_value"))

    val base = java.nio.file.Files.createTempDirectory("graft_sscale")
    try {
      val root = s"$base/root"
      val out = s"$base/out"
      val ck = s"$base/ck"
      val store = new FeatureStore(spark, root, maxVersions = 50)
      time(s"register ($totalRows rows)") {
        store.register("t", slice(1, totalRows))
      }

      spark.conf.set(
        "spark.sql.catalog.sscale", classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.sscale.root", root)

      def follow(tag: String): Unit = {
        val q = spark.readStream
          .option("skipChangeCommits", "true")
          .table("sscale.t")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.ProcessingTime(0))
          .start()
        try time(tag)(q.processAllAvailable()) finally q.stop()
      }

      // the one O(table) step of a follower's life
      follow(s"rows stream: SNAPSHOT batch ($totalRows rows)")

      // each append delta renders from the RECORDED change set
      (1 to 3).foreach { i =>
        store.registerAppend("t", slice(10 + i, deltaRows), maxSegments = 100)
        follow(s"rows stream: append delta #$i ($deltaRows rows)")
      }

      // a mutating commit under skipChangeCommits: skipped whole — the
      // batch stages zero rows and computes no change set
      store.deleteRows("t", col("l_value") % 1000L === 0L)
      follow("rows stream: SKIPPED delete commit (0 rows)")

      // a content-preserving compaction: always skipped silently
      store.optimizeTable("t", Seq("timestamp"))
      follow("rows stream: OPTIMIZE commit (0 rows)")

      val sunk = spark.read.parquet(out).count()
      println(s"[sscale] sink rows = $sunk " +
        s"(expected ${totalRows + 3 * deltaRows})")
    } finally {
      spark.stop()
    }
  }
}
