package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Dev probe: stage-by-stage cost of the source_overlap pipeline at a
  * given sf dir — isolates tokenize/shingle explode, md5 hashing,
  * (id, shingle) dedup, and the pair aggregation so optimization
  * effort lands on the stage that actually dominates.
  * Usage: runMain graft.examples.ProbeOverlap [sfDir] [reps]
  */
object ProbeOverlap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.parquet(spark, s"$dir/documents.parquet")
    def time(what: String)(body: => Long): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[probe] $what%-28s #$i ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
      }

    val toks = split(col("text"), " ")
    val shingles = docs
      .select(col("source"), toks.as("_toks"))
      .filter(size(col("_toks")) >= 3)
      .select(
        col("source"),
        col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - 3)).as("_i"))
      .select(
        col("source"),
        concat_ws(" ",
          (1 to 3).map(j => element_at(col("_toks"), col("_i") + j)): _*).as("shingle"))

    time("shingle explode only")(shingles.groupBy().count().head().getLong(0))
    time("+ md5 hash")(
      shingles.select(col("source"), Hashing.md5Long60(col("shingle")).as("_sh"))
        .groupBy().count().head().getLong(0))
    time("+ (source,sh) distinct")(
      shingles.select(col("source"), Hashing.md5Long60(col("shingle")).as("_sh"))
        .distinct().groupBy().count().head().getLong(0))
    time("full source_overlap")(
      graft.ops.Dedup.ngramJaccardPairs(
        docs, n = 3, threshold = 0.0, idCol = "source", carrySizes = false)
        .groupBy().count().head().getLong(0))
    spark.stop()
  }
}
