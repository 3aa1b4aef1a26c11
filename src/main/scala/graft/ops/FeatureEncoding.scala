package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Feature-encoding operators: the standard transforms that turn raw
  * columns into model inputs (target encoding, quantile binning, the
  * hashing trick). All arithmetic is shaped for cross-engine bit
  * equality: aggregation happens on exact integers (cents), and any
  * floating-point step is a fixed expression tree over those integers,
  * so results cannot depend on aggregation order.
  */
object FeatureEncoding {

  /** Smoothed target encoding: each category's mean target value,
    * shrunk toward the global mean with pseudo-count `priorWeight` —
    * the standard leakage-resistant categorical encoder
    * (`(sum + w·global_mean) / (n + w)`).
    *
    * Determinism: per-category sums accumulate as exact cent integers
    * (`round(value·100)`), so they are aggregation-order-independent;
    * the smoothing formula is a fixed tree of divisions over those
    * integers. The global mean rides along as a broadcast one-row
    * cross join — the whole thing is one lazy plan, no eager actions.
    *
    * Scale shape: one partial-aggregated shuffle by category (the
    * shuffle carries one row per category per map partition), plus the
    * one-row broadcast. Output cardinality = |categories|.
    */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      valueCol: String,
      priorWeight: Double = 10.0): DataFrame = {
    require(priorWeight >= 0, s"priorWeight must be >= 0, got $priorWeight")
    val cents = round(col(valueCol) * 100).cast("long")
    val perCat = df
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
    val global = df.agg(
      count(lit(1)).as("_gn"),
      sum(cents).as("_gsum"))
    perCat
      .crossJoin(broadcast(global))
      .withColumn(
        "encoded",
        (col("sum_cents").cast("double") +
          lit(priorWeight) * (col("_gsum").cast("double") / col("_gn"))) /
          (col("n") + lit(priorWeight)) / 100.0)
      .drop("_gn", "_gsum")
  }

  /** Quantile binning + rank normalization per group: `ntile(nBins)`
    * bucket, `percent_rank` and `cume_dist` over a total (value,
    * tieBreak...) order — the monotone discretizations models consume
    * instead of raw heavy-tailed values.
    *
    * Determinism: all three are pure functions of a row's position in
    * a TOTAL order (the tie-break makes it total), so they are exact
    * integers-over-integers; percent_rank/cume_dist divide the same
    * integers in every engine.
    *
    * Scale shape: one shuffle by group; all three window functions
    * share the single sort. Groups discretize in parallel; a single
    * global ordering would serialize — pass a constant group column
    * only when the data is small enough to sort on one node.
    */
  def quantileBin(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      groupCol: String,
      tieBreakCols: Seq[String]): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(tieBreakCols.nonEmpty, "tieBreakCols must make the order total")
    val order = (col(valueCol) +: tieBreakCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df
      .withColumn("bin", ntile(nBins).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
  }

  /** Per-group standardization: z-score (sample std) and min-max
    * scaling of an integer-valued column, appended as `z_score` /
    * `min_max` to the input rows.
    *
    * Determinism: sufficient statistics (n, Σx, Σx²) accumulate as
    * exact 128-bit integers over the group window, so they are
    * aggregation-order-independent; each output value is then a fixed
    * double expression tree over those integers — 128-bit→double goes
    * through the decimal string (correctly rounded in both engines,
    * unlike Spark's direct decimal→double cast above 2^53). Groups
    * without variance emit null z_score (exact integer predicate);
    * min_max is null when max == min.
    *
    * Scale shape: the five statistics come from a partial-aggregated
    * groupBy (NOT a group window — a window partitioned by a
    * low-cardinality group column would collapse each group onto one
    * task, capping parallelism at |groups| regardless of cluster size)
    * and broadcast-join back onto the rows: the full-size side never
    * shuffles at all.
    */
  def standardize(
      df: DataFrame,
      valueCol: String,
      groupCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = col(valueCol).cast(dec)
    def toD(c: Column): Column = c.cast("string").cast("double")
    val stats = df
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(dec).as("_n"),
        sum(v).as("_s"),
        sum(v * v).as("_ss"),
        min(col(valueCol)).as("_mn"),
        max(col(valueCol)).as("_mx"))
    val withStats = df.join(broadcast(stats), Seq(groupCol))
    val d = col("_n") * col("_ss") - col("_s") * col("_s")
    val nn1 = col("_n") * (col("_n") - lit(1))
    val z = when(col("_n") > 1 && d > 0,
      toD(v * col("_n") - col("_s")) /
        (toD(col("_n")) * sqrt(toD(d) / toD(nn1))))
    val mm = when(col("_mx") > col("_mn"),
      (col(valueCol) - col("_mn")).cast("double") /
        (col("_mx") - col("_mn")).cast("double"))
    withStats
      .withColumn("z_score", z)
      .withColumn("min_max", mm)
      .drop("_n", "_s", "_ss", "_mn", "_mx")
  }

  /** The hashing trick: token counts folded into a fixed number of
    * hash buckets per document — the unbounded-vocabulary featurizer
    * (buckets collide by design; dimensionality is capped at
    * `nBuckets` regardless of corpus growth). Portable md5-derived
    * bucket ids, so any engine reproduces the exact assignment.
    *
    * Scale shape: token explode then ONE partial-aggregated shuffle of
    * (doc, bucket) pairs — at most `nBuckets` rows per doc per map
    * partition; no vocabulary table, no second pass.
    */
  def hashFeatures(
      docs: DataFrame,
      nBuckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("_tok"))
      .select(col(idCol),
        pmod(Hashing.md5Long60(col("_tok")), lit(nBuckets)).cast("int").as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
