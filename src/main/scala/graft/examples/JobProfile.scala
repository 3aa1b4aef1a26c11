package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query (warm) and print per-job and
  * per-stage wall times — where a multi-stage operator's bench seconds
  * actually go. Usage: runMain graft.examples.JobProfile <name> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("asof_join_bucketed")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm twice: plans compiled, skew memos filled
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    graft.SparkEntry.queries(name)(spark, dir).count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobs.get(je.jobId)).getOrElse(je.time)
        println(f"[job] id=${je.jobId} ${(je.time - t0) / 1e3}%.3fs")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {
          a <- info.completionTime; b <- info.submissionTime
        } yield a - b).getOrElse(0L)
        println(f"[stage] id=${info.stageId} tasks=${info.numTasks} ${ms / 1e3}%.3fs ${info.name.takeWhile(_ != '\n')}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    println(f"[total] $name rows=$n ${total}%.2fs")
    spark.stop()
  }
}
