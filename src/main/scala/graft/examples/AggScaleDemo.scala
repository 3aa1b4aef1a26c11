package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Metadata-aggregate evidence: COUNT/MIN/MAX answered from segment
  * stats vs forced through a real scan, at 20M rows / 10 segments.
  * The metadata path is O(#segments) driver work — its wall is flat
  * in table size, the scan's grows linearly.
  */
object AggScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_aggscale").toString
    val store = new graft.store.FeatureStore(spark, root)
    def slice(tag: Long) = spark.range(n / 10).select(
      (col("id") % 500000L).as("entity_id"),
      date_add(to_date(lit("2024-01-01")),
        (col("id") % 270).cast("int")).cast("timestamp").as("timestamp"),
      (lit(tag) * 1000000000L + col("id")).as("l_value"))
    store.register("t", slice(1))
    (2 to 10).foreach(i => store.registerAppend("t", slice(i.toLong), maxSegments = 100))
    spark.conf.set("spark.sql.catalog.ag", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ag.root", root)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[aggscale] $tag%-46s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
    }
    val agg = "SELECT count(*), count(l_value), min(l_value), max(l_value), min(`timestamp`), max(`timestamp`) FROM ag.t"
    time("metadata-only aggregate (cold)")(spark.sql(agg).collect())
    time("metadata-only aggregate (warm)")(spark.sql(agg).collect())
    // the same aggregates forced through a real scan (filter blocks pushdown)
    time("full-scan aggregate (WHERE l_value >= 0)")(
      spark.sql(agg.replace("FROM ag.t", "FROM ag.t WHERE l_value >= 0")).collect())
    println("[aggscale] rows = " + spark.sql("SELECT count(*) FROM ag.t").head().getLong(0))
    spark.stop()
  }
}
