package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval composition operators — the steps between "ranked lists
  * exist" (BM25, ANN) and "a training/eval set is curated from them":
  * rank fusion across retrievers and diversity-aware reranking.
  *
  * Like the rest of the ops layer, everything downstream of the input
  * scores is EXACT integer arithmetic (reciprocal ranks as floor-divided
  * micro-units), so fused rankings are bit-reproducible across engines
  * and reruns — fusion is exactly where ulp drift would otherwise flip
  * neighbors, because it sums small reciprocal terms that frequently tie.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al.): each list contributes
    * `1_000_000 div (rrfK + rank)` micro-units per (query, doc); absent
    * docs contribute nothing. The standard zero-tuning way to combine a
    * lexical and a dense retriever — scores from different scales never
    * mix, only ranks do.
    *
    * Inputs both carry (query_id, doc_id-like, rank); pass `idColA/B` if
    * the doc column is named differently (e.g. BM25's `doc_id` vs ANN's
    * `neighbor_id`). Output: (query_id, doc_id, rrf_u, rank), top `k`
    * per query, ties broken on doc_id.
    *
    * Scale shape: one union + one map-side-combined aggregation + one
    * per-query window over rank-bounded lists — the inputs are already
    * top-k'd, so volume is |queries| × k, never corpus-sized. The union
    * form (contributions summed by groupBy) costs ONE exchange where a
    * full-outer join on (query, doc) costs two plus the join itself; a
    * doc absent from a list simply contributes no row, which is exactly
    * the join form's null → 0 coalesce.
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      k: Int,
      rrfK: Int = 60,
      idColA: String = "doc_id",
      idColB: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    // integral div keeps the reciprocal exact; summing exact longs is
    // order-free, so the fused score is independent of union order.
    // coalesce preserves the join form's null -> 0 contract for
    // degenerate rows (NULL rank from an upstream outer join, or
    // rank 0 with rrfK = 0 dividing to NULL): the row still fuses,
    // contributing 0 instead of poisoning the sum to NULL
    def contrib(df: DataFrame, idCol: String): DataFrame = df.select(
      col("query_id"), col(idCol).as("doc_id"),
      coalesce(
        expr(s"1000000 div (${rrfK}L + CAST(rank AS BIGINT))"),
        lit(0L)).as("_u"))
    val fused = contrib(a, idColA)
      .unionByName(contrib(b, idColB))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_u")).as("rrf_u"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_u").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_u"), col("rank"))
  }

  /** Maximal-marginal-relevance reranking (Carbonell & Goldstein): from
    * each query's exact top-`poolSize` cosine pool, greedily select `k`
    * docs maximizing `λ·rel − (1−λ)·max_sim_to_selected` — relevance
    * first, redundancy penalized. The diversity op for retrieval-set
    * curation: a near-duplicate of an already-selected doc is pushed
    * down even when its raw relevance ranks it next.
    *
    * Determinism/portability: relevance and pairwise similarity use the
    * SAME left-to-right widen-to-double fold as
    * [[Similarity.bruteForceTopK]] (and the DuckDB oracle's
    * `list_sum(list_transform(...))`), λ derives from an integer
    * per-mille, and every comparison tie-breaks on doc id — so the
    * greedy trajectory is bit-identical on any engine. The oracle is a
    * recursive CTE walking the same trajectory.
    *
    * Scale shape: the pool step is the ANN family's (broadcast queries,
    * or swap in an IVF top-k upstream); the greedy step is
    * per-query-bounded — poolSize vectors per group, O(poolSize·k)
    * similarity evaluations, no shuffle beyond the pool's own. This is
    * deliberately NOT a window/SQL plan: the marginal term makes each
    * pick depend on all previous picks, which no frame can express.
    */
  def mmrRerank(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      poolSize: Int,
      lambdaPermille: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(poolSize >= k, s"poolSize ($poolSize) must be >= k ($k)")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      s"lambdaPermille must be in [0,1000], got $lambdaPermille")
    val pool = Similarity
      .bruteForceTopK(emb, queryIds, poolSize, idCol, vecCol)
    mmrRerankPool(emb, pool, k, lambdaPermille, idCol, vecCol)
  }

  /** [[mmrRerank]] over a caller-supplied candidate pool — the 100 TB
    * form: at scale the pool comes from the approximate family
    * ([[Similarity.ivfTopK]]/[[Similarity.lshTopK]] emit the same
    * (query_id, neighbor_id, score) shape), so the exact all-pairs
    * scorer is never on the path; the greedy step only ever sees the
    * pool. The pool must carry one row per (query, candidate) with the
    * candidate's relevance in `score`.
    */
  def mmrRerankPool(
      emb: DataFrame,
      pool: DataFrame,
      k: Int,
      lambdaPermille: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      s"lambdaPermille must be in [0,1000], got $lambdaPermille")
    val lam = lambdaPermille / 1000.0
    val omLam = 1.0 - lam
    val poolN = pool
      .select(col("query_id").cast("long").as("_q"),
        col("neighbor_id").cast("long").as("_d"),
        col("score").cast("double").as("_rel"))
    // zero-norm (or null-vector / NaN-relevance) candidates have no
    // cosine: a caller-supplied pool may carry them (the brute pool
    // pre-filters, IVF/LSH pools might not), and a NaN similarity would
    // leave maxSim untouched, handing the garbage vector an infinite
    // marginal score — same guard every ANN kernel applies at its scan
    val withVec = poolN
      .filter(col("_rel").isNotNull && !isnan(col("_rel")))
      .join(
        emb.select(col(idCol).cast("long").as("_d"),
          col(vecCol).cast("array<float>").as("_v"))
          .filter(col("_v").isNotNull &&
            graft.functions.FloatVectorDot(col("_v"), col("_v")) > 0d),
        "_d")
    val spark = emb.sparkSession
    import spark.implicits._
    withVec
      .select(col("_q"), col("_d"), col("_rel"), col("_v"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        // rel desc, id asc — the same total order the pool was ranked by
        val cand = it.toArray.sortBy(c => (-c._3, c._2))
        val n = cand.length
        // the oracle's list_sum fold: left-to-right, floats widened
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var s = 0.0; var i = 0
          val m = math.min(a.length, b.length)
          while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
          s
        }
        val nrm = cand.map(c => math.sqrt(dot(c._4, c._4)))
        def sim(i: Int, j: Int): Double =
          dot(cand(i)._4, cand(j)._4) / (nrm(i) * nrm(j))
        // true max-sim-to-selected, which can be NEGATIVE for
        // anti-correlated vectors — never clamp at 0, or diversity
        // bonuses for opposite-direction docs are silently erased
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val selected = ArrayBuffer.empty[Int]
        val picked = Array.fill(n)(false)
        def select(ci: Int): Unit = {
          picked(ci) = true
          selected += ci
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val s = sim(j, ci)
              if (s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
        }
        if (n > 0) select(0) // seed by pure relevance, like the oracle
        var pickable = true
        while (pickable && selected.length < math.min(k, n)) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val m = lam * cand(i)._3 - omLam * maxSim(i)
              // strict > plus candidate order (rel desc, id asc) would
              // tie-break on POOL rank; the contract is doc-id asc, and
              // the scan meets candidates in that order only per equal
              // mmr — so compare (score, then id) explicitly
              if (m > bestScore ||
                (m == bestScore && best >= 0 && cand(i)._2 < cand(best)._2)) {
                best = i; bestScore = m
              }
            }
            i += 1
          }
          // defense in depth behind the scan-side NaN filters: if every
          // remaining marginal score is NaN, stop with the picks we have
          // rather than indexing -1
          if (best < 0) pickable = false else select(best)
        }
        selected.iterator.zipWithIndex.map { case (ci, r) =>
          (q, cand(ci)._2, (r + 1).toLong)
        }
      }
      .toDF("query_id", "doc_id", "rank")
  }
}
