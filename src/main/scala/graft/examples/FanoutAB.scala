package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Profiling, TextAnalysis}

/** Dev experiment: same-JVM interleaved A/B of the single-task heavy
  * kernels against a pre-fanned (repartition(defaultParallelism)) input —
  * quantifies what routing the narrow docs/lineitem scan to all cores is
  * worth per kernel, before touching the operators themselves.
  * Usage: runMain graft.examples.FanoutAB [sfDir] [reps]
  */
object FanoutAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
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

    def docs(d: String) = graft.Tables.parquet(spark, s"$d/documents.parquet")
    def line(d: String) = graft.Tables.parquet(spark, s"$d/lineitem.parquet")
      .select(
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        round(col("l_tax") * 100).cast("long").as("tax_pct"))

    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "lsh" -> (d => Dedup.lshCandidatePairs(d, numPerms = 16, rowsPerBand = 4)),
      "jacc_fine" -> (d => Dedup.ngramJaccardPairs(d, n = 3, threshold = 0.5)),
      "simhash" -> (d => Dedup.simhashPairs(d, maxHamming = 2)),
      "bpe" -> (d => TextAnalysis.bpeTopPairs(d, k = 50)),
      "dup_spans" -> (d => TextAnalysis.duplicateSpans(d, width = 8, stride = 4)),
      "coarse" -> (d => Dedup.ngramJaccardPairs(
        d, n = 3, threshold = 0.0, idCol = "source", carrySizes = false)),
      "tfidf" -> (d => TextAnalysis.tfIdfTopTerm(d)))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // hash-repartition fan-out: no round-robin local sort, and a
    // downstream groupBy on the same key reuses the exchange
    def fanDocs(d: String) = docs(d).repartition(par, col("doc_id"))
    def fanLine(d: String) = line(d).repartition(
      par, col("qty"), col("price_cents"), col("disc_pct"), col("tax_pct"))

    // warm
    shapes.foreach { case (_, f) =>
      f(docs(dir)).count(); f(docs(dir).repartition(par)).count()
      f(fanDocs(dir)).count()
    }
    val corrCols = Seq("qty", "price_cents", "disc_pct", "tax_pct")
    Profiling.correlationMatrix(line(dir), corrCols).count()
    Profiling.correlationMatrix(line(dir).repartition(par), corrCols).count()
    Profiling.correlationMatrix(fanLine(dir), corrCols).count()

    val acc = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    (1 to reps).foreach { _ =>
      shapes.foreach { case (nm, f) =>
        val a = time(f(docs(dir)).count())
        val b = time(f(docs(dir).repartition(par)).count())
        val c = time(f(fanDocs(dir)).count())
        acc(s"$nm.base") = math.min(acc(s"$nm.base"), a)
        acc(s"$nm.fan") = math.min(acc(s"$nm.fan"), b)
        acc(s"$nm.fan2") = math.min(acc(s"$nm.fan2"), c)
      }
      val a = time(Profiling.correlationMatrix(line(dir), corrCols).count())
      val b = time(Profiling.correlationMatrix(line(dir).repartition(par), corrCols).count())
      val c = time(Profiling.correlationMatrix(fanLine(dir), corrCols).count())
      acc("corr.base") = math.min(acc("corr.base"), a)
      acc("corr.fan") = math.min(acc("corr.fan"), b)
      acc("corr.fan2") = math.min(acc("corr.fan2"), c)
    }
    (shapes.map(_._1) :+ "corr").foreach { nm =>
      println(f"[ab] $nm%-10s base=${acc(s"$nm.base")}%.3fs fan=${acc(s"$nm.fan")}%.3fs " +
        f"fan2=${acc(s"$nm.fan2")}%.3fs r=${acc(s"$nm.fan") / acc(s"$nm.base")}%.2f " +
        f"r2=${acc(s"$nm.fan2") / acc(s"$nm.base")}%.2f")
    }
    spark.stop()
  }
}
