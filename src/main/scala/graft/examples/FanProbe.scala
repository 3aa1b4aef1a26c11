package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev probe: stage task-counts/times for lshCandidatePairs over a
  * hash-fanned docs input — is AQE coalescing the fan-out exchange?
  */
object FanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val par = spark.sparkContext.defaultParallelism
    val docs = graft.Tables.parquet(spark, s"$dir/documents.parquet")
    val fanned = docs.repartition(par, col("doc_id"))
    val q = Dedup.lshCandidatePairs(fanned, numPerms = 16, rowsPerBand = 4)
    q.count() // warm
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {
          a <- info.completionTime; b <- info.submissionTime
        } yield a - b).getOrElse(0L)
        println(f"[stage] id=${info.stageId} tasks=${info.numTasks} ${ms / 1e3}%.3fs")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    q.count()
    println(f"[wall] ${(System.nanoTime() - t0) / 1e9}%.3fs")
    Thread.sleep(500)
    q.explain("formatted")
    spark.stop()
  }
}
