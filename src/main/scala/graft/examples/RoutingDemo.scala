package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Demonstrates WHY the embedding kernels are size-routed
  * (Similarity.cosineNearDupPairsAuto / knnLabelNoiseAuto): measures
  * the exact broadcast kernel against the routed candidate+rescore
  * paths on a realistic SPARSE-duplicate corpus of increasing size —
  * random 64-dim directions with a 2% exact-duplicate rate, the shape
  * of a web-scale embedding dedup. The exact kernel's cost is O(n²·d)
  * no matter how few duplicates exist; the routed paths pay one
  * signature/assignment pass plus a candidate join bounded by real
  * collisions, so their cost tracks the DUPLICATE density, not n².
  * Past the broadcast envelope the exact kernel cannot run at all
  * (driver OOM) — the time crossover measured here is on top of that
  * survival cliff.
  *
  * Deterministic synthesis from `spark.range` + murmur3 `hash()`:
  * rerunning gives identical data, and the near-dup agreement check
  * (exact pair count == routed pair count — exact duplicates collide
  * in every LSH band, false candidates are rescored away) must hold.
  *
  * Usage: runMain graft.examples.RoutingDemo [sizes,comma-separated]
  * (default 20000,60000,120000)
  */
object RoutingDemo {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(20000, 60000, 120000))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = 64

    def corpus(n: Int): DataFrame = {
      // every 50th id duplicates its predecessor (2% dup rate); all
      // other rows get independent murmur3-derived directions, whose
      // pairwise cosines concentrate near 0 in 64 dims — every true
      // pair sits at cosine 1.0, every false pair far below 0.9
      val grp = when(col("id") % 50 === 1, col("id") - 1).otherwise(col("id"))
      val vec = transform(sequence(lit(0), lit(dims - 1)), d =>
        ((hash(col("_grp"), d) % 1000) / lit(1000.0)).cast("float"))
      spark.range(n.toLong)
        .select(col("id").as("vec_id"), grp.as("_grp"))
        .select(col("vec_id"), vec.as("embedding"))
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    }

    def timed(what: String)(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[routing] $what%-36s $secs%8.2fs  rows=$rows")
      (secs, rows)
    }

    // past this size the exact O(n²) kernels stop being a feasible
    // baseline (that infeasibility IS the routing argument); the demo
    // then runs the routed paths alone and checks the near-dup count
    // against the ANALYTIC truth of the synthetic corpus (one planted
    // pair per id ≡ 1 mod 50; random 64-dim cross pairs cannot reach
    // cosine 0.9)
    val exactCutoff = 150000

    for (n <- sizes) {
      println(s"\n[routing] ===== corpus n=$n d=$dims (2% dups) =====")
      val df = corpus(n)
      df.count() // materialize the cache before timing either path
      val expectedPairs = (0 until n).count(_ % 50 == 1).toLong
      // derived band width: a FIXED 16-bit signature emits ~16·n²/2^16
      // false candidates (quadratic); planesFor holds the join linear
      val planes = Similarity.planesFor(n.toLong)
      if (n <= exactCutoff) {
        val (exactSecs, exactRows) = timed("exact broadcast near-dup")(
          Similarity.cosineNearDupPairs(df, threshold = 0.9).count())
        require(exactRows == expectedPairs,
          s"analytic count wrong at n=$n: exact=$exactRows expected=$expectedPairs")
        val (routedSecs, routedRows) = timed(s"routed LSH near-dup (16x$planes)")(
          Similarity.cosineNearDupPairsLsh(
            df, threshold = 0.9, planesPerBand = planes).count())
        require(exactRows == routedRows,
          s"agreement broken at n=$n: exact=$exactRows routed=$routedRows")
        println(f"[routing] near-dup exact/routed ratio: ${exactSecs / routedSecs}%.2fx")
      } else {
        val (_, routedRows) = timed(s"routed LSH near-dup (16x$planes)")(
          Similarity.cosineNearDupPairsLsh(
            df, threshold = 0.9, planesPerBand = planes).count())
        require(routedRows == expectedPairs,
          s"agreement broken at n=$n: routed=$routedRows expected=$expectedPairs")
      }
      val lists = math.max(64, math.min(4096, n / 64))
      if (n <= exactCutoff) {
        val (exactK, _) = timed("exact all-pairs top-3")(
          Similarity.bruteForceTopKFor(df, None, 3).count())
        val (routedK, _) = timed(s"routed IVF top-3 ($lists lists/4 probes)")(
          Similarity.allPairsTopKIvf(df, 3, numCentroids = lists, nProbe = 4).count())
        println(f"[routing] topk exact/routed ratio: ${exactK / routedK}%.2fx")
      } else {
        val (_, kRows) = timed(s"routed IVF top-3 ($lists lists/4 probes)")(
          Similarity.allPairsTopKIvf(df, 3, numCentroids = lists, nProbe = 4).count())
        require(kRows == 3L * n,
          s"routed top-k must fill all ranks at n=$n: got $kRows")
      }
      df.unpersist()
    }
    spark.stop()
  }
}
