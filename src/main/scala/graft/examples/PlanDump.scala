package graft.examples

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or more SparkEntry
  * queries to files — the committed before/after evidence for
  * optimization rounds (plans/rNN/<query>_{before,after}.txt).
  * Usage:
  *   runMain graft.examples.PlanDump <name>[,<name>...] <outDir> [suffix] [sfDir]
  * writes <outDir>/<name>_<suffix>.txt (suffix default "after").
  * The session mirrors Bench (same shuffle/AQE settings), so the dumped
  * initial plan is the one the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("dedup_cross_spans").split(',').toSeq
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val suffix = if (args.length > 2) args(2) else "after"
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val path = Paths.get(outDir, s"${n}_$suffix.txt")
      Files.write(path, txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $path (${txt.length} chars)")
    }
    spark.stop()
  }
}
