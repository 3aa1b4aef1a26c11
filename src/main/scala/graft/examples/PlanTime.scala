package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe: split each query's bench wall time into plan derivation
  * (analysis + optimization + physical planning, forced via
  * queryExecution.executedPlan) and execution (the count on the SAME
  * prepared DataFrame). Bench times both together; this says which side
  * a slow row's seconds live on.
  * Usage: runMain graft.examples.PlanTime <name>[,...] [sfDir] [reps]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("dedup_clusters").split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else dir
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, warmDir).count(); () }
      catch { case e: Throwable => println(s"[warm-fail] $n: ${e.getMessage}") }
    }
    names.foreach { nm =>
      var bestBuild = Double.MaxValue
      var bestPlan = Double.MaxValue
      var bestExec = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(nm)(spark, dir)
        // count()'s actual plan: the grouped count, like Bench times
        val counted = df.groupBy().count()
        val t1 = System.nanoTime()
        counted.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        counted.collect()
        val t3 = System.nanoTime()
        bestBuild = math.min(bestBuild, (t1 - t0) / 1e9)
        bestPlan = math.min(bestPlan, (t2 - t1) / 1e9)
        bestExec = math.min(bestExec, (t3 - t2) / 1e9)
      }
      println(f"[plan] $nm%-24s build=$bestBuild%.3f plan=$bestPlan%.3f exec=$bestExec%.3f")
    }
    spark.stop()
  }
}
