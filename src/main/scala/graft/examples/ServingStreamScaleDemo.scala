package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{FeatureStore, IncrementalRollup}
import graft.streaming.StreamingRollup

/** STREAMING serving-follower soak: [[StreamingRollup.startServing]]
  * — the live online store — over a 20M-row, 500k-entity table,
  * printing the WALL TIME OF EACH COMMIT'S FOLD (one micro-batch per
  * commit via maxVersionsPerBatch=1).
  *
  * What the numbers must show (the 100 TB claims — the batch form's
  * evidence lives in ServingScaleDemo; this is the follower's):
  *   - the snapshot batch is the only O(table) fold;
  *   - each APPEND commit folds O(changes): a 100k-row append into a
  *     20M-row table folds at a small fraction of the snapshot wall,
  *     and never rescans (no deletes in the interval);
  *   - a delete stripping current-latest rows folds O(changes +
  *     dirty-entity rows): only the hit entities rescan, from the
  *     batch's own pinned `_commit_version`;
  *   - an EMPTY commit (no-op upsert — change set cancels) folds at
  *     the dispatch floor: the prior state is carried forward;
  *   - the follower's final state equals the from-scratch
  *     latest-per-entity of the final content, exactly.
  */
object ServingStreamScaleDemo {
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
      println(f"[sserve] $name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // event_id is globally unique (the serving tie column)
    def slice(tag: Long, n: Long): DataFrame =
      spark.range(n).select(
        (col("id") % 500000L).as("entity_id"),
        date_add(to_date(lit("2024-01-01")),
          ((lit(tag) * 37L + col("id") / 500000L) % 270L).cast("int"))
          .cast("timestamp").as("timestamp"),
        (lit(tag) * 1000000000L + col("id")).as("event_id"),
        (col("id") % 1000L).as("l_value"))

    val base = java.nio.file.Files.createTempDirectory("graft_sservscale")
    try {
      val root = s"$base/root"
      val store = new FeatureStore(spark, root, maxVersions = 50)
      time(s"register ($totalRows rows, 500k entities)") {
        store.register("t", slice(1, totalRows))
      }

      // one long-lived follower; each catch-up call folds exactly the
      // commits made since the last (one micro-batch per commit)
      def catchUp(tag: String): Unit = time(tag) {
        val q = StreamingRollup.startServing(
          spark, root, "t", tieCols = Seq("event_id"),
          s"$base/state", s"$base/ck", maxVersionsPerBatch = Some(1))
        try q.processAllAvailable() finally q.stop()
      }

      catchUp("follower fold: snapshot batch (the only O(table) step)")

      store.registerAppend("t", slice(2, 100000L), maxSegments = 100)
      catchUp("follower fold: 100k-row append commit (zero rescans)")

      store.registerAppend("t", slice(3, 100000L), maxSegments = 100)
      catchUp("follower fold: second 100k-row append commit")

      // delete the CURRENT LATEST of ~50k entities (top event_ids of
      // the v1 register for entities no append touched): the follower
      // rescans exactly the dirty entities, pinned at this commit.
      // BOUNDED above — an open >= would also sweep every appended
      // row (event_ids 2e9/3e9) and turn both later legs into lies
      time("delete: strip 50k entities' latest rows") {
        store.deleteRows("t",
          col("event_id") >= lit(1000000000L + totalRows - 50000L) &&
            col("event_id") < lit(1000000000L + totalRows))
      }
      catchUp("follower fold: latest-hitting delete (dirty rescan)")

      // a no-op upsert: identical content at keys whose ONLY rows are
      // these (slice-3 day-offsets exist nowhere else) — the commit's
      // change set cancels to empty; the fold must carry prior state
      // forward
      time("no-op upsert (empty change set commit)") {
        store.registerUpsert("t", slice(3, 1000L))
      }
      catchUp("follower fold: EMPTY commit (dispatch floor)")

      val fin = StreamingRollup.currentState(spark, s"$base/state").get
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
        println(s"[sserve] diff rows = $d (expected 0)")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
      spark.stop()
    }
  }
}
