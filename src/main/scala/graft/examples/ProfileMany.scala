package graft.examples

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query job/stage accounting for MANY queries in one warm
  * session — wall seconds, job count, summed job seconds (wall − jobs ≈
  * driver-side planning + dispatch), stage count. One sbt startup instead
  * of one per query. Usage:
  *   runMain graft.examples.ProfileMany <name>[,<name>...] [sfDir] [reps]
  * Timing methodology mirrors Bench (fresh DataFrame per rep, count
  * action, min over reps); per-job detail prints for the LAST rep only.
  */
object ProfileMany {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("dedup_cross_spans").split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, warmDir).count(); () }
      catch { case e: Throwable => println(s"[warm-fail] $n: ${e.getMessage}") }
    }

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new AtomicInteger(0)
    val jobMs = new AtomicLong(0L)
    val stages = new AtomicInteger(0)
    val stageMs = new AtomicLong(0L)
    @volatile var detail = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(je.jobId)).getOrElse(je.time)
        jobs.incrementAndGet()
        jobMs.addAndGet(je.time - t0)
        if (detail) println(f"[job] id=${je.jobId} ${(je.time - t0) / 1e3}%.3fs")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {
          a <- info.completionTime; b <- info.submissionTime
        } yield a - b).getOrElse(0L)
        stages.incrementAndGet()
        stageMs.addAndGet(ms)
        if (detail) println(
          f"[stage] id=${info.stageId} tasks=${info.numTasks} ${ms / 1e3}%.3fs " +
            info.name.takeWhile(_ != '\n'))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { nm =>
      var best = Double.MaxValue
      var bestJobs = 0
      var bestJobSec = 0.0
      var bestStages = 0
      var rows = -1L
      (1 to reps).foreach { i =>
        detail = i == reps
        jobs.set(0); jobMs.set(0L); stages.set(0); stageMs.set(0L)
        val t0 = System.nanoTime()
        try { rows = graft.SparkEntry.queries(nm)(spark, dir).count() }
        catch { case e: Throwable => println(s"[fail] $nm: ${e.getMessage}") }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // listener bus drain
        if (wall < best) {
          best = wall; bestJobs = jobs.get(); bestJobSec = jobMs.get() / 1e3
          bestStages = stages.get()
        }
        println(f"[rep] $nm #$i wall=$wall%.3fs jobs=${jobs.get()} " +
          f"jobSec=${jobMs.get() / 1e3}%.3f stages=${stages.get()} " +
          f"stageSec=${stageMs.get() / 1e3}%.3f")
      }
      println(f"[best] $nm wall=$best%.3fs jobs=$bestJobs jobSec=$bestJobSec%.3f " +
        f"stages=$bestStages driverGap=${best - bestJobSec}%.3fs rows=$rows")
    }
    spark.stop()
  }
}
