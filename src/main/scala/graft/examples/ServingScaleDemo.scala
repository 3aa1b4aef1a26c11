package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{FeatureStore, IncrementalRollup}

/** Serving-table-IVM soak: the online store (latest row per entity)
  * maintained over a 20M-row, 500k-entity table.
  *
  * What the numbers must show (the 100 TB claims):
  *   - an APPEND-ONLY feed folds closed-form — the maintenance cost
  *     tracks the batch, and no entity ever rescans;
  *   - a delete that strips CURRENT LATEST rows dirties exactly the
  *     hit entities; the rescan reads their rows, not the table;
  *   - the maintained serving table equals the from-scratch
  *     latest-per-entity of the final content, exactly.
  */
object ServingScaleDemo {
  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toLong).getOrElse(20000000L)
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
      println(f"[serving] $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // event_id is globally unique (the serving tie column); each
    // entity's latest is its highest event_id's day
    def slice(tag: Long, n: Long): DataFrame =
      spark.range(n).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-01-01")),
          ((lit(tag) * 37L + col("id") / 500000L) % 270L).cast("int"))
          .cast("timestamp").as("timestamp"),
        (lit(tag) * 1000000000L + col("id")).as("event_id"),
        (col("id") % 1000L).as("l_value"))

    val base = java.nio.file.Files.createTempDirectory("graft_servscale")
    try {
      val store = new FeatureStore(spark, s"$base/root", maxVersions = 50)
      time(s"register ($totalRows rows, 500k entities)") {
        store.register("t", slice(1, totalRows))
      }
      def maintained(tag: String): Unit =
        time(tag) {
          IncrementalRollup
            .maintainedServing(store, "t", tieCols = Seq("event_id"))
            .count()
          ()
        }
      maintained("serving fold: seed only (v1 snapshot)")

      // append-only commits: 100k rows each, all strictly newer for
      // their entities? Not necessarily newer — mixed old/new stamps
      // exercise BOTH advance and shadow, still zero rescans (no
      // deletes anywhere in the interval)
      store.registerAppend("t", slice(2, 100000L), maxSegments = 100)
      store.registerAppend("t", slice(3, 100000L), maxSegments = 100)
      maintained("serving fold: 2 append commits (zero rescans)")

      // delete the CURRENT LATEST of ~50k entities: their event_ids
      // are the top slice of the v1 register for entities with no
      // newer append rows — dirty entities rescan, the rest stay
      // closed-form
      // BOUNDED above — an open >= would also sweep every appended
      // row (event_ids 2e9/3e9), dirtying ~150k entities, not 50k
      time("delete: strip 50k entities' latest rows") {
        store.deleteRows("t",
          col("event_id") >= lit(1000000000L + totalRows - 50000L) &&
            col("event_id") < lit(1000000000L + totalRows))
      }
      maintained("serving fold: + latest-hitting delete (dirty rescan)")

      val fin = IncrementalRollup
        .maintainedServing(store, "t", tieCols = Seq("event_id"))
      val scratch = time("from-scratch latest-per-entity (counterfactual)") {
        val df = IncrementalRollup.initialStateServing(
          store.getVersion("t", store.getTableInfo("t").version),
          tieCols = Seq("event_id"))
        df.count()
        df
      }
      time("equality check (exceptAll both ways)") {
        val d = fin.exceptAll(scratch).count() +
          scratch.exceptAll(fin).count()
        println(s"[serving] diff rows = $d (expected 0)")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
      spark.stop()
    }
  }
}
