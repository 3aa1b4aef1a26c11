package graft.ops

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
    * Scale shape: one keyed join + one per-query window over rank-bounded
    * lists — the inputs are already top-k'd, so volume is |queries| × k,
    * never corpus-sized.
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
    val an = a.select(
      col("query_id"), col(idColA).as("doc_id"),
      col("rank").cast("long").as("_ra"))
    val bn = b.select(
      col("query_id"), col(idColB).as("doc_id"),
      col("rank").cast("long").as("_rb"))
    val fused = an
      .join(bn, Seq("query_id", "doc_id"), "full_outer")
      // integral div keeps the reciprocal exact; a missing rank is a
      // null div → coalesce 0 (absent from that list = no contribution)
      .withColumn("rrf_u",
        coalesce(expr(s"1000000 div (${rrfK}L + _ra)"), lit(0L)) +
          coalesce(expr(s"1000000 div (${rrfK}L + _rb)"), lit(0L)))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_u").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_u"), col("rank"))
  }
}
