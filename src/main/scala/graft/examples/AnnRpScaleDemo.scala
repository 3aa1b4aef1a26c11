package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The compressed-prune ANN ([[Similarity.annTopKProjected]]) soaked at
  * 10M × 64-dim vectors — evidence for the round-12 plan restructure:
  * the sign projection is ONE codegen'd map-side kernel (no explode, no
  * projection shuffle), the prune pass ranks a SKINNY frame (id + 32
  * floats + norm — raw vectors never ride the candidate exchange), and
  * the exact rescore re-reads raw vectors via a broadcast of the
  * candidates·|queries| sliver (no corpus-wide shuffle join anywhere).
  *
  * Corpus (deterministic): vectors live on integer lattice points
  * derived from md5(id); every PLANT_EVERY-th id gets a NEAR-COPY of
  * query q's vector (one coordinate nudged by id, so cosines to q are
  * distinct and < 1). The true top-k for each query is therefore its
  * planted family — brute-force ground truth at this scale would cost
  * |corpus|·|queries| full-width dots, which is exactly what the prune
  * avoids; the construction makes the answer checkable without it.
  *
  * What the numbers must show (committed to PLANS.md):
  *   - total shuffle stays in low MBs at 10M vectors (the candidate
  *     exchange is WindowGroupLimit-capped; the projection and rescore
  *     exchange nothing corpus-sized);
  *   - planted recall: every top-k row is a member of the query's
  *     planted family (k=5 from ~10 plants per query);
  *   - wall time scales with the scan (one projected pass + one raw
  *     rescore pass), not with |corpus|·d·|queries| full-width work.
  *
  * Run: `sbt "runMain graft.examples.AnnRpScaleDemo [vectors]"`.
  */
object AnnRpScaleDemo {

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(10000000L)
    require(nVecs >= 100,
      s"AnnRpScaleDemo needs >= 100 vectors for k=5 planted families, got $nVecs")
    val dim = 64
    val plantEvery = nVecs / 10L // 9 plants per query (k=5 needs >= 5)
    val queryIds = Seq(1L, 2L, 3L)

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val meter = new ShuffleMeter(spark)
    def time[A](name: String)(f: => A): A = meter.step(name)(f)

    println(s"[cfg] vectors=$nVecs dim=$dim plantEvery=$plantEvery " +
      s"queries=${queryIds.mkString(",")}")

    // base lattice vector: coordinate j of id i is a small integer from
    // md5(i, j) (range 0..15); plants for query q (ids ≡ q mod
    // plantEvery, id > q) copy base(q) with coordinate 0 nudged +1..+9
    // by (id div plantEvery) — cosine to q strictly below 1, distinct
    // per plant, far above any random lattice vector's
    def coord(iExpr: String, j: Int): String =
      s"CAST(conv(substring(md5(concat($iExpr, '_', $j)), 1, 2), 16, 10) % 16 AS FLOAT)"
    def baseVec(iExpr: String): String =
      s"array(${(0 until dim).map(j => coord(iExpr, j)).mkString(", ")})"
    val corpusPath = java.nio.file.Files
      .createTempDirectory("graft_annrp_soak").toString + "/vecs"
    time("materialize corpus") {
      spark.range(nVecs).select(
        col("id").as("vec_id"),
        expr(
          s"""CASE WHEN id % ${plantEvery}L IN (${queryIds.mkString(", ")})
             |          AND id >= ${plantEvery}L
             |  THEN transform(${baseVec(s"id % ${plantEvery}L")},
             |         (x, j) -> IF(j = 0,
             |           x + CAST(1 + (id div ${plantEvery}L) % 9 AS FLOAT), x))
             |  ELSE ${baseVec("id")} END""".stripMargin).as("embedding"))
        .write.mode("overwrite").parquet(corpusPath)
    }
    val emb = spark.read.parquet(corpusPath)
    println(s"[corpus] ${emb.count()} vectors")

    val k = 5
    val out = time("annTopKProjected (k=5)") {
      Similarity
        .annTopKProjected(emb, queryIds, k = k, candidates = 64,
          outDims = 32, inDims = dim)
        .collect()
    }
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    var ok = byQuery.keySet == queryIds.toSet
    queryIds.foreach { q =>
      val rows = byQuery.getOrElse(q, Array.empty)
      val inFamily = rows.count { r =>
        val n = r.getAs[Long]("neighbor_id")
        n % plantEvery == q && n != q
      }
      println(s"[q$q] ${rows.length} rows, planted-family hits $inFamily/$k " +
        s"top=${rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).mkString(",")}")
      ok &&= rows.length == k && inFamily == k
    }
    println(s"[verdict] ${if (ok) "ALL CHECKS GREEN" else "CHECK FAILED"}")
    meter.total("projection is map-side; the candidate exchange is " +
      "WindowGroupLimit-capped; rescore broadcasts the sliver")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(corpusPath).getParentFile)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
