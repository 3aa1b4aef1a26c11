package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.FeatureStore

/** Copy-on-write mutations at bench scale: a year-sliced sf0.1
  * lineitem table (~600k rows, one segment per shipdate year — the
  * daily-ingest append shape) takes a row DELETE whose predicate
  * clusters in one year, a MERGE upsert whose keys cluster in one
  * year, a zero-copy RESTORE, and change-feed reads over each —
  * measuring what the copy-on-write discipline buys against the naive
  * full rewrite:
  *
  *   - deleteRows must rewrite ONE segment's survivors, not the
  *     table; the full-rewrite baseline (filter + register) writes
  *     everything.
  *   - restoreVersion must be metadata-time (no data write at all).
  *   - the append-step change feed must read O(delta), and the
  *     delete-step feed must read the change set RECORDED at commit
  *     time (the Delta _change_data discipline) — O(changes), never a
  *     two-snapshot diff.
  */
object MutationDemo {
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
      println(f"[mut] $label%-46s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_mut_demo").toString
    val store = new FeatureStore(spark, root, maxVersions = 100)
    // time-sliced appends — the real-world daily-ingest shape: one
    // segment per shipdate year (1995..2001), so mutations whose
    // predicates/keys cluster in time touch few segments
    val years = (1995 to 2001).toSeq
    timed("build: register + 6 appends (one segment per year)") {
      store.register("t", feat.filter(year(col("timestamp")) === years.head))
      years.tail.foreach(y =>
        store.registerAppend("t", feat.filter(year(col("timestamp")) === y),
          maxSegments = 100))
    }
    val nSegs = store.getTableHistory("t").last.segments.size
    val before = store.getTableInfo("t")
    println(s"[mut] table: ${before.rowCount} rows, $nSegs segments")

    // DELETE clustered in one year — touches exactly one segment
    val cond = year(col("timestamp")) === 1997 && col("l_quantity") < 10
    val afterDelete = timed("deleteRows (predicate clustered in 1997)") {
      store.deleteRows("t", cond)
    }
    def reuseLine(op: String): Unit = {
      val h = store.getTableHistory("t")
      val cur = h.last
      val prev = h(h.size - 2).segments.toSet
      val reused = cur.segments.count(prev)
      println(s"[mut] $op manifest re-references $reused of ${prev.size} " +
        s"prior segments (+${cur.segments.size - reused} rewritten)")
    }
    println(s"[mut] deleted ${before.rowCount - afterDelete.rowCount} rows")
    reuseLine("delete:")

    // the naive alternative, reading the SAME store: filter the whole
    // current version and register it as a full snapshot — identical
    // read amplification, 8x the write
    timed("baseline: full filter + re-register of the store") {
      val naiveRoot = java.nio.file.Files
        .createTempDirectory("graft_mut_naive").toString
      val naive = new FeatureStore(spark, naiveRoot, maxVersions = 2)
      naive.register("t",
        store.getVersion("t", afterDelete.version - 1)
          .filter(not(coalesce(cond, lit(false)))))
    }

    // MERGE: a TIME-CLUSTERED delta (the CDC norm — corrections land
    // in recent data): 2001 keys can only match the 2001 segment
    val delta = feat.filter(year(col("timestamp")) === 2001 &&
        col("l_orderkey") % 97 === 0)
      .withColumn("l_extendedprice", col("l_extendedprice") + lit(1.0))
    val nDelta = delta.count()
    timed(s"registerUpsert ($nDelta-row delta, 2001 keys only)") {
      store.registerUpsert("t", delta)
    }
    reuseLine("upsert:")

    // change feeds: append fast path vs rewrite diff
    timed("getChanges over an append step (O(delta))") {
      store.getChanges("t", 3, 4).count()
    }
    timed("getChanges over the delete step (recorded set)") {
      store.getChanges("t", nSegs, nSegs + 1).count()
    }

    // RESTORE: zero-copy manifest re-reference
    timed("restoreVersion (zero-copy)") {
      store.restoreVersion("t", nSegs)
    }
    println(s"[mut] restored rowCount = ${store.getTableInfo("t").rowCount} " +
      s"(pre-delete was ${before.rowCount})")
    spark.stop()
  }
}
