package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Similarity

/** Measures recall@10 of every approximate ANN path against the exact
  * brute-force baseline on the sf0.01 embeddings — the numbers pinned
  * as regression floors in `OpsSpec` ("ANN recall floors") and
  * recorded in PLANS.md. Every path is DETERMINISTIC (hash-derived
  * planes, id-seeded centroids/codebooks, exact-integer k-means), so
  * a measured value is a stable constant of (method, params, corpus),
  * not a sample.
  *
  * Run: `sbt "runMain graft.examples.RecallFloors [sfDir]"`.
  */
object RecallFloors {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val ids = (0L until 50L).toSeq
    val k = 10

    def pairs(df: DataFrame): Set[(Long, Long)] = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    val exact = pairs(Similarity.bruteForceTopK(e, ids, k))
    def recallOf(df: DataFrame): Double =
      exact.intersect(pairs(df)).size.toDouble / exact.size

    println(s"corpus: $n vectors ($dir), ${ids.size} queries, recall@$k vs brute force")
    val lsh = recallOf(Similarity.lshTopK(e, ids, k, numPlanes = 4))
    println(f"lsh(planes=4)            recall@$k = $lsh%.4f")
    val ivfSeed = recallOf(Similarity.ivfTopK(e, ids, k, numCentroids = 16, nProbe = 4))
    println(f"ivf(seeded,16,probe=4)   recall@$k = $ivfSeed%.4f")
    val learned = Similarity.ivfCentroidsKMeans(e, numCentroids = 16, iters = 1)
    val ivfKm = recallOf(Similarity.ivfTopKWith(e, learned, ids, k, nProbe = 4))
    println(f"ivf(kmeans,16,probe=4)   recall@$k = $ivfKm%.4f")
    val pq = recallOf(Similarity.pqTopK(e, ids, k))
    println(f"pq(m=8,ks=16,cf=8)       recall@$k = $pq%.4f")

    spark.stop()
  }
}
