package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism contract: dot products fold left-to-right in double
  * precision after casting each float element to double — the exact
  * arithmetic DuckDB's `list_sum(list_transform(...))` performs — so
  * cosine scores are bit-identical between the engine and the oracle
  * and top-k cuts cannot flap.
  *
  * Scale notes: brute force is one broadcast-join + window — O(N·Q·d),
  * the right baseline when the query set is small. The LSH variant is
  * the scale path: random-hyperplane signatures bucket the corpus so a
  * query only scores its bucket (tunable recall); hyperplanes are
  * derived from the md5 hash family, so they are deterministic and
  * reproducible anywhere.
  */
object Similarity {

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for a (small, broadcastable) query
    * id set: score every (query, candidate) pair, rank per query by
    * (score desc, id asc).
    */
  def bruteForceTopK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = emb
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val scored = emb
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        cosine(col("_qv"), col(vecCol)).as("score"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** All near-duplicate vector pairs (a < b) with cosine >= threshold.
    * All-pairs scoring — an eval/verification tool; use [[lshTopK]]'s
    * bucketing for the scale path.
    */
  def cosineNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("_va"), col("_vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic random-hyperplane signature: `numPlanes` sign bits,
    * plane p's weight for dimension d derived from md5(p:d) mapped to
    * [-1, 1). Returns (id, bucket) where bucket packs the sign bits.
    */
  def lshBuckets(
      emb: DataFrame,
      numPlanes: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val dims = emb.select(size(col(vecCol)).as("d")).head().getInt(0)
    val planes = spark
      .range(numPlanes)
      .select(col("id").cast("int").as("_plane"))
      .crossJoin(spark.range(dims).select(col("id").cast("int").as("_dim")))
      .select(
        col("_plane"),
        col("_dim"),
        (Hashing
          .md5Long60(concat_ws(":", col("_plane"), col("_dim")))
          .cast("double") / lit(math.pow(2, 59)) - 1.0).as("_w"))
    val exploded = emb.select(col(idCol), posexplode(toDouble(col(vecCol))))
      .select(col(idCol), col("pos").as("_dim"), col("col").as("_x"))
    exploded
      .join(broadcast(planes), Seq("_dim"))
      .groupBy(col(idCol), col("_plane"))
      .agg(sum(col("_x") * col("_w")).as("_proj"))
      .groupBy(col(idCol))
      .agg(
        sum(
          when(col("_proj") > 0, pow(lit(2.0), col("_plane")).cast("long"))
            .otherwise(0L)).as("bucket"))
  }

  /** Approximate top-k: score only candidates sharing the query's LSH
    * bucket. Recall < 1 by construction (measured against
    * [[bruteForceTopK]] in the test suite); raise numPlanes ↓ bucket
    * size, lower it ↑ recall.
    */
  def lshTopK(
      emb: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      numPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val buckets = lshBuckets(emb, numPlanes, idCol, vecCol)
    val withBucket = emb.join(buckets, idCol)
    val q = withBucket
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"), col("bucket"))
    val scored = withBucket
      .join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        cosine(col("_qv"), col(vecCol)).as("score"))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
