package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.FeatureStore

/** Column-stats data skipping + OPTIMIZE at bench scale: a year-sliced
  * sf0.1 lineitem table (~600k rows, one segment per shipdate year)
  * measures what the round-7 storage features buy:
  *
  *   - scanWhere with a predicate clustered in one year must PLAN only
  *     that year's segment (counted via inputFiles) — the selective-
  *     read shape that scales as O(matching segments);
  *   - deleteRows with the same predicate must CLASSIFY only the
  *     matching segment (stats prove the rest disjoint) — compare
  *     wall-clock vs a catalog stripped of the new stats records,
  *     where classification must scan everything;
  *   - upsert with time-clustered CDC keys must classify O(delta)
  *     segments the same way;
  *   - OPTIMIZE z-ordered by (suppkey, price), then a selective
  *     2-D predicate: per-file key ranges shrink in both dimensions
  *     (file-level min/max printed) — what parquet row-group skipping
  *     consumes at scan time.
  */
object SkippingDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val feat = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_suppkey").as("entity_id"),
      col("l_shipdate").as("timestamp"),
      col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[skip] $label%-52s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_skip_demo").toString
    val store = new FeatureStore(spark, root, maxVersions = 100)
    val years = (1995 to 2001).toSeq
    timed("build: register + 6 appends (one segment per year)") {
      store.register("t", feat.filter(year(col("timestamp")) === years.head))
      years.tail.foreach(y =>
        store.registerAppend("t", feat.filter(year(col("timestamp")) === y),
          maxSegments = 100))
    }
    val total = store.getTableInfo("t").rowCount
    println(s"[skip] table: $total rows, 7 segments")

    // 1) selective read: one year → one planned segment
    val pred = col("timestamp") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
      col("timestamp") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
      col("l_quantity") > 45
    val scan = timed("scanWhere (1997 + quantity bound)")(
      store.scanWhere("t", pred))
    val matched = timed("  count over the pruned plan")(scan.count())
    val plannedSegs = scan.inputFiles.toSeq
      .flatMap("/v=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1).toInt))
      .distinct.sorted
    println(s"[skip] rows matched: $matched; planned ${plannedSegs.size} of 7 " +
      s"segments (ids ${plannedSegs.mkString(",")})")

    // 2) deleteRows: stats-skipped classification vs stats-stripped
    val delPred = pred && (col("l_orderkey") % 10 === 0)
    timed("deleteRows (stats skip 6 of 7 classifications)") {
      store.deleteRows("t", delPred)
    }
    println(s"[skip] rows after delete: ${store.getTableInfo("t").rowCount}")

    // the same mutation over a catalog WITHOUT the stats records (the
    // pre-round-7 state): classification must scan every segment
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_skip_demo_nostats").toString
    val legacy = new FeatureStore(spark, root2, maxVersions = 100)
    timed("build second store (for the no-stats baseline)") {
      legacy.register("t", feat.filter(year(col("timestamp")) === years.head))
      years.tail.foreach(y =>
        legacy.registerAppend("t", feat.filter(year(col("timestamp")) === y),
          maxSegments = 100))
    }
    val catFile = graft.store.CatalogPersistence.tableFile(root2, "t")
    val stripped = java.nio.file.Files.readString(catFile).split("\n")
      .filterNot(l => l.startsWith("X\t") || l.startsWith("N\t"))
      .mkString("\n")
    java.nio.file.Files.writeString(catFile, stripped)
    val reopened = new FeatureStore(spark, root2, maxVersions = 100)
    timed("deleteRows, NO stats (classifies all 7)") {
      reopened.deleteRows("t", delPred)
    }

    // 3) CDC upsert with time-clustered keys: O(delta) classification
    val delta = feat
      .filter(year(col("timestamp")) === 2000 && col("l_orderkey") % 97 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1)
    println(s"[skip] upsert delta rows: ${delta.count()}")
    timed("registerUpsert (keys cluster in 2000; skip 6 of 7)") {
      store.registerUpsert("t", delta)
    }

    // 3b) distributed key-list purge (the GDPR shape): 1000 (entity,
    // ts) keys clustered in 1999 — no driver-side key materialization,
    // and the key bounds skip every other year's classification
    val purgeKeys = feat
      .filter(year(col("timestamp")) === 1999 && col("l_orderkey") % 601 === 0)
      .select("entity_id", "timestamp")
    println(s"[skip] purge key count: ${purgeKeys.count()}")
    timed("deleteRowsByKeys (keys cluster in 1999; skip 6 of 7)") {
      store.deleteRowsByKeys("t", purgeKeys)
    }

    // 4) OPTIMIZE z-order + per-file range evidence. The clustered
    // write range-partitions by (period, z): a period only splits into
    // z-subranges when it spans multiple tasks, which at 100 TB every
    // period does (tasks are sized by bytes). This 40 MB demo table
    // fits ~3 months per task, so emulate the at-scale bytes/task
    // ratio: enough partitions that each month splits ~4 ways, with
    // AQE's size-based coalescing (correct at real scale) off.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "336")
    timed("optimizeTable zorder(entity_id, l_extendedprice)") {
      store.optimizeTable("t", Seq("entity_id", "l_extendedprice"),
        zorder = true)
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val v = store.getTableInfo("t").version
    val cur = store.getVersion("t", v)
    val ranges = cur.groupBy(input_file_name())
      .agg(
        min("entity_id").as("elo"), max("entity_id").as("ehi"),
        min("l_extendedprice").as("plo"), max("l_extendedprice").as("phi"))
      .collect()
    val eSpan = ranges.map(r => r.getAs[Long]("ehi") - r.getAs[Long]("elo"))
    val pSpan = ranges.map(r =>
      r.getAs[Double]("phi") - r.getAs[Double]("plo"))
    println(f"[skip] optimize: ${ranges.length} files; mean entity span " +
      f"${eSpan.sum.toDouble / eSpan.length}%.0f (global ${eSpan.max}%d+), " +
      f"mean price span ${pSpan.sum / pSpan.length}%.0f")
    val sel = timed("selective 2-D scan over the z-ordered layout") {
      cur.filter(col("entity_id") < 500 && col("l_extendedprice") < 10000)
        .count()
    }
    println(s"[skip] selective scan rows: $sel")
    spark.stop()
  }
}
