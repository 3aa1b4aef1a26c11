package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev tool: time one or more SparkEntry queries N times in a warm
  * session (comma-separate names for a same-JVM A/B comparison).
  * Usage: runMain graft.examples.TimeOne <name>[,<name>...] [sfDir] [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("doc_stats_by_source")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // mirror Bench's session exactly, or timings are not comparable
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(
      _.split(';').iterator.map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_EXTRA_CONF segment '$kv' is not key=value")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else dir
    val names = name.split(',').toSeq
    names.foreach(n => graft.SparkEntry.queries(n)(spark, warmDir).count())
    // interleaved passes, like Bench: a noise burst lands on different
    // queries in different passes
    (1 to reps).foreach { i =>
      names.foreach { nm =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(nm)(spark, dir).count()
        println(f"[timeone] $nm #$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
