package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.ops.Dedup

/** Ad-hoc stage profiler for the bench hotspots (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val mx = java.lang.management.ManagementFactory.getMemoryMXBean
      val heap = mx.getHeapMemoryUsage.getUsed / (1 << 20)
      val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      var gcMs = 0L
      gc.forEach(b => gcMs += b.getCollectionTime)
      val meta = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      var metaMb = 0L
      meta.forEach(p => if (p.getName.contains("Metaspace")) metaMb += p.getUsage.getUsed / (1 << 20))
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n  heap=${heap}MB meta=${metaMb}MB gcTotal=${gcMs}ms")
    }

    time("warm")(docs.count())

    // stage-by-stage breakdown of ngramJaccardPairs
    val nPart = spark.sparkContext.defaultParallelism
    def sh = Dedup.wordShingles(docs, 3)
      .select(col("doc_id"), Hashing.md5Long60(col("shingle")).as("_sh"))
    time("shingle-hash rows")(sh.count())
    def inter = sh.select(col("doc_id").as("id_a"), col("_sh"))
      .join(sh.select(col("doc_id").as("id_b"), col("_sh")), Seq("_sh"))
      .filter(col("id_a") < col("id_b"))
    time("inter join rows")(inter.count())
    time("inter grouped")(
      inter.groupBy("id_a", "id_b").agg(count(lit(1)).as("c")).count())
    (1 to 5).foreach { i =>
      time(s"jaccard full #$i")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
    }
    spark.stop()
  }
}
