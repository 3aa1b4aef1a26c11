package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Both operators key on the md5-derived portable hash of the row id, so
  * the assignment is (a) stable across runs, engines and cluster sizes —
  * re-running a 100 TB pipeline reassigns nothing, and a holdout row
  * never leaks into training on a rerun — and (b) reproducible by the
  * DuckDB oracle (unlike `rand(seed)`, whose sequence is engine- and
  * partitioning-dependent, or `TABLESAMPLE`, which is not row-stable).
  * Pure per-row projections: no shuffle, no state, fully codegen'd.
  */
object Sampling {

  /** Non-negative 60-bit hash of the id, the shared assignment key. */
  private def idHash(idCol: Column): Column =
    Hashing.md5Long60(idCol.cast("string"))

  /** Deterministic training-order shuffle: a reproducible global
    * permutation from the portable md5 family — rows ordered by
    * (md5(seed:id), id). The same order on any engine, at any
    * parallelism, on any rerun, which is what makes a training run
    * reproducible end to end; a different `seed` gives an independent
    * permutation per epoch. Physically one total-order sort —
    * range-partitioned by Spark's distributed sort, no single-task
    * funnel — and the tie-break on id makes the permutation total even
    * in the (2^-60) event of a hash collision.
    */
  def deterministicShuffle(
      df: DataFrame,
      seed: String = "",
      idCol: String = "doc_id"): DataFrame = {
    val key = Hashing.md5Long60(
      concat_ws(":", lit(seed), col(idCol).cast("string")))
    df.withColumn("shuffle_key", key).orderBy(col("shuffle_key"), col(idCol))
  }

  /** Keep ~`percent`% of rows, chosen by id hash (0 < percent < 100).
    * Deterministic: the same row is kept in every run and engine.
    */
  def deterministicSample(
      df: DataFrame,
      percent: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(percent > 0 && percent < 100, s"percent must be in (0,100), got $percent")
    df.filter(idHash(col(idCol)) % 100 < percent)
  }

  /** Assign each row to a named split by hash bucket. `weights` are
    * integer percentages summing to 100, e.g.
    * Seq("train" -> 80, "valid" -> 10, "test" -> 10).
    */
  def hashSplit(
      df: DataFrame,
      weights: Seq[(String, Int)],
      idCol: String = "doc_id",
      splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) && weights.map(_._2).sum == 100,
      s"weights must be positive and sum to 100, got $weights")
    val h = idHash(col(idCol)) % 100
    val cuts = weights.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    // a NULL id has no stable identity to hash: every when() branch is
    // null, so it would silently fall into the LAST otherwise() split —
    // inflating the eval holdout with exactly the malformed rows. Fail
    // loudly instead (deterministicSample DROPS null ids; a split must
    // not silently change the row set, so it refuses).
    val assigned0 = weights.init.zip(cuts) match {
      case Seq() => lit(weights.head._1) // single bucket: everything
      case (n0, hi0) +: rest =>
        rest
          .foldLeft(when(h < hi0, lit(n0._1))) {
            case (acc, (nm, hi)) => acc.when(h < hi, lit(nm._1))
          }
          .when(h.isNotNull, lit(weights.last._1))
          .otherwise(raise_error(concat(
            lit(s"hashSplit: null $idCol has no stable split identity; " +
              "filter null ids or repair them upstream"))))
    }
    df.withColumn(splitCol, assigned0)
  }

  /** Leakage-safe train/valid/test split: near-duplicate documents
    * must land in the SAME split, or eval scores inflate on training
    * near-copies (the dedup papers' contamination failure). The split
    * key is the near-dup CLUSTER id ([[Dedup.connectedComponents]]
    * over banded-LSH candidates; singletons key on their own id),
    * hashed through the same portable bucket arithmetic as
    * [[hashSplit]] — so the assignment is deterministic across
    * engines AND every member of a cluster shares it by construction.
    *
    * Scale shape: clusters come from the banded candidate path (never
    * all-pairs), the cluster map joins back doc-keyed, and the split
    * itself is a pure per-row map.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      weights: Seq[(String, Int)],
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text",
      splitCol: String = "split"): DataFrame = {
    // raw (per-band) candidate pairs: connectedComponents' symmetric
    // distinct dedups them — lshCandidatePairs' own distinct would be a
    // redundant exchange here
    val comp = Dedup.connectedComponents(
      Dedup.lshCandidatePairsRaw(
        docs.select(col(idCol), col(textCol)),
        numPerms, rowsPerBand, idCol = idCol, textCol = textCol))
      .withColumnRenamed("doc_id", idCol)
    hashSplit(
      docs
        .join(comp, Seq(idCol), "left")
        .withColumn("_split_key", coalesce(col("cluster_id"), col(idCol))),
      weights, idCol = "_split_key", splitCol = splitCol)
      .drop("_split_key", "cluster_id")
  }

  /** Dataset mixing: keep each stratum (source) at its own rate — the
    * pretraining-mix step ("3x down-weight crawl, keep books whole")
    * as a pure per-row filter. Rates are per-mille so the cut is exact
    * integer arithmetic; rows keep/drop by id hash, so the mix is
    * stable across runs, engines, and repartitioning, and a row kept at
    * rate r stays kept at any rate >= r (nested samples for ablations).
    */
  def mixtureSample(
      df: DataFrame,
      ratesPermille: Map[String, Int],
      defaultPermille: Int,
      stratumCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    (ratesPermille.values.toSeq :+ defaultPermille).foreach(r =>
      require(r >= 0 && r <= 1000, s"rate must be in [0,1000] permille, got $r"))
    val rate = ratesPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(r)).otherwise(acc)
      }
    df.filter(idHash(col(idCol)) % 1000 < rate)
  }

  /** Temperature-based mixture sampling — the XLM-R / multilingual-mix
    * rebalancing scheme: target share of stratum s ∝ n_s^(1/T), reached
    * by keeping each stratum at rate (n_s / n_min)^(1/T − 1). T = 1
    * keeps everything; larger T flattens the size distribution toward
    * uniform — the SMALLEST stratum is kept whole and bigger strata
    * down-sample progressively. Rates derive FROM THE DATA in the same
    * plan (stratum counts broadcast back — no collect), then the cut is
    * the same per-mille id-hash filter as [[mixtureSample]]:
    * deterministic, engine-portable, nested across temperatures.
    *
    * Cross-engine arithmetic: floor (never round) makes the per-mille
    * threshold insensitive to half-case conventions, and the T = 2 case
    * (`invTempPermille = 500`, the common halving temperature) routes
    * through `1000 / sqrt(n_s / n_min)` — IEEE-754 sqrt and division
    * are CORRECTLY ROUNDED everywhere, so that rate is bit-portable.
    * Other temperatures use exp/ln, where engines may differ by an ulp
    * (flapping the floor only when the rate lands within an ulp of an
    * integer) — fine for pipelines, noted for oracle pairings.
    *
    * Scale shape: one partial-aggregated count per stratum (cardinality
    * rows), broadcast-joined back; the filter stays a per-row map.
    *
    * NULL strata form their own stratum: the count join is null-safe
    * (`<=>`), so rows with a NULL `stratumCol` are counted, rated and
    * sampled exactly like any other group — at `invTempPermille = 1000`
    * they are all kept, honoring the "T = 1 keeps all" contract (a
    * plain equi-join would silently drop them).
    */
  def temperatureSample(
      df: DataFrame,
      invTempPermille: Int,
      stratumCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(invTempPermille >= 0 && invTempPermille <= 1000,
      s"invTempPermille must be in [0,1000] (1000 = T=1 keeps all), got $invTempPermille")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n_s"))
    val minN = counts.agg(min(col("_n_s")).as("_n_min"))
    val ratio = col("_n_s").cast("double") / col("_n_min").cast("double") // >= 1
    // rate = 1000 · ratio^(1/T − 1) ∈ (0, 1000]
    val rate =
      if (invTempPermille == 500) floor(lit(1000.0) / sqrt(ratio))
      else floor(lit(1000.0) *
        exp((lit(invTempPermille / 1000.0) - lit(1.0)) * log(ratio)))
    val cc = counts.select(col(stratumCol).as("_stratum_key"), col("_n_s"))
    df.join(broadcast(cc), df(stratumCol) <=> col("_stratum_key"))
      .crossJoin(broadcast(minN))
      .withColumn("_rate", rate)
      .filter(idHash(col(idCol)) % 1000 < col("_rate"))
      .drop("_stratum_key", "_n_s", "_n_min", "_rate")
  }

  /** The up-weighting half of dataset mixing: repeat each stratum by a
    * fractional epoch factor (per-mille — 2500 = 2.5 epochs: every row
    * twice, the hash-chosen half a third time). Emitted rows carry a
    * `copy_id` (1-based) so downstream shuffling/packing can
    * distinguish copies. Deterministic like [[mixtureSample]]; factors
    * under 1000 double as down-sampling, so one call expresses a whole
    * mix. Per-row explode of a tiny sequence — no shuffle, output
    * volume is exactly the mix's token budget.
    */
  def epochRepeat(
      df: DataFrame,
      factorsPermille: Map[String, Int],
      defaultPermille: Int = 1000,
      stratumCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    (factorsPermille.values.toSeq :+ defaultPermille).foreach(r =>
      require(r >= 0, s"factor must be >= 0 permille, got $r"))
    val factor = factorsPermille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(r)).otherwise(acc)
      }
    val copies = (factor / 1000).cast("int") +
      when(idHash(col(idCol)) % 1000 < factor % 1000, 1).otherwise(0)
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0) // Spark sequence() DESCENDS for start > stop
      .withColumn("copy_id", explode(sequence(lit(1), col("_copies"))))
      .drop("_copies")
  }

  /** Stratified sample: within each stratum (e.g. source), keep the
    * `percent`% of rows with the smallest id hashes — per-stratum
    * quotas survive however skewed the strata are, and the selection is
    * still id-stable across runs and engines. Quota is
    * ceil(n * percent / 100) (never empties a non-empty stratum).
    *
    * Scale shape: one shuffle by stratum; the rank window gets a
    * map-side WindowGroupLimit only when percent bounds a constant k,
    * so for very hot strata prefer [[deterministicSample]]'s quota-free
    * per-row filter. Hash ties cannot happen within a stratum (distinct
    * ids), so the order is total and the pick deterministic.
    */
  def stratifiedSample(
      df: DataFrame,
      percent: Int,
      stratumCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(percent > 0 && percent < 100, s"percent must be in (0,100), got $percent")
    import org.apache.spark.sql.expressions.Window
    val byStratum = Window.partitionBy(col(stratumCol))
    val rank = byStratum.orderBy(idHash(col(idCol)).asc, col(idCol).asc)
    df
      .withColumn("_rk", row_number().over(rank))
      .withColumn("_n", count(lit(1)).over(byStratum))
      // ceil(n*p/100) via integer arithmetic: (n*p + 99) div 100
      .filter(col("_rk") <= expr(s"(_n * $percent + 99) div 100"))
      .drop("_rk", "_n")
  }

  /** Probability-proportional-to-size (PPS) Bernoulli sampling: keep
    * each row with probability min(1, expectK · w / Σw) — expected
    * sample size `expectK`, heavy rows (w ≥ Σw / expectK) kept
    * deterministically. The quality-weighted corpus subset op: weight by
    * token count, a quality score, or any importance signal, and the
    * subset's weight mass concentrates where the signal says it should
    * while every row keeps a nonzero, id-stable chance.
    *
    * Exact integer arithmetic end to end: the inclusion rate is
    * `rate_pm = min(2^20, (2^20 · expectK · w) div Σw)` per-mega units
    * and the row is kept iff `hash60(id) div 2^40 < rate_pm` — no
    * floating point anywhere, so the assignment is bit-reproducible on
    * any engine and any rerun. (The classic Efraimidis–Spirakis
    * exponential-key reservoir needs pow(u, 1/w), whose ulp differences
    * are NOT portable across engines — and a reservoir is a sequential
    * structure anyway; Bernoulli PPS is the one-pass distributed form.)
    *
    * Scale shape: one 1-row total broadcast + one codegen'd filter pass,
    * no shuffle, no state. Non-positive weights never sample. The
    * integer envelope (expectK · maxW ≤ 2^43) is enforced IN the plan
    * with raise_error — a silent Long wrap would quietly invert rates.
    */
  def weightedSample(
      df: DataFrame,
      expectK: Long,
      weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(expectK >= 1, s"expectK must be >= 1, got $expectK")
    val wRaw = col(weightCol).cast("long")
    val w = when(wRaw > 0, wRaw).otherwise(lit(0L))
    // the double shadow sum cannot wrap — it detects Long sum()
    // overflow (non-ANSI sum wraps silently; a wrapped negative total
    // would empty the sample, a wrapped small-positive one would pass
    // the other guards with inverted rates)
    val tot = df.agg(
      coalesce(sum(w), lit(0L)).as("_tot_w"),
      coalesce(max(w), lit(0L)).as("_max_w"),
      coalesce(sum(w.cast("double")), lit(0.0)).as("_tot_d"))
    // 2^20 · expectK · maxW must fit in a signed 64-bit long; the bound
    // is computed driver-side so the plan-side check cannot itself wrap
    val maxWAllowed = Long.MaxValue / (1L << 20) / expectK
    df.crossJoin(broadcast(tot))
      .withColumn("_w_pps", w)
      .withColumn("_gr_ws_hash", idHash(col(idCol)))
      .withColumn(
        "rate_pm",
        when(col("_tot_d") > 9.0e18,
          raise_error(lit(
            "weightedSample overflow: the weight TOTAL exceeds the " +
              "64-bit envelope (sum would wrap) — rescale the weights")))
          .when(col("_max_w") > maxWAllowed,
          raise_error(concat(
            lit(s"weightedSample overflow: expectK=$expectK * max weight "),
            col("_max_w").cast("string"),
            lit(s" exceeds the 2^43 integer envelope — rescale the weights"))))
          .when(col("_tot_w") <= 0L, lit(0L))
          .otherwise(least(
            lit(1L << 20),
            expr(s"(${1L << 20} * ${expectK}L * _w_pps) div _tot_w"))))
      .filter(expr(s"_gr_ws_hash div ${1L << 40}") < col("rate_pm"))
      .drop("_w_pps", "_gr_ws_hash", "_tot_w", "_max_w", "_tot_d")
  }

  /** Systematic PPS sampling — the EXACT-size companion to
    * [[weightedSample]]: lay the rows on a line in a deterministic
    * hash order, each occupying an interval of its weight, and pick the
    * rows whose interval contains a multiple of Σw / k. Exactly `k`
    * picks (heavy rows with w > Σw/k are hit multiple times and carry
    * `n_picks` > 1 — the standard PPS-with-multiplicity contract), zero
    * variance in sample size, still probability-proportional-to-size.
    * Used where the budget is exact: eval sets, fixed-size calibration
    * subsets, per-shard quotas.
    *
    * Pick rule in exact integers: row i (cumulative weight interval
    * [c_{i−1}, c_i)) is selected with
    * `n_picks = (c_i · k) div Σw − (c_{i−1} · k) div Σw` — integer
    * multiples of Σw/k are found without ever forming the fraction, so
    * the sample is bit-reproducible on any engine. Overflow envelope
    * (Σw · k < 2^63) enforced in-plan with raise_error.
    *
    * Scale shape: the global running sum is NOT a global-order window
    * (one indivisible task — the scale-killer): the hash line is cut
    * into 256 contiguous buckets by hash prefix, per-bucket totals fold
    * into broadcast offsets (a 256-row window), and each bucket scans
    * its own prefix sum in parallel — offset + local cumsum IS the
    * global cumsum because the bucket key is monotone in the order key.
    */
  def systematicSample(
      df: DataFrame,
      k: Long,
      weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val wRaw = col(weightCol).cast("long")
    val w = when(wRaw > 0, wRaw).otherwise(lit(0L))
    // double shadow sum detects Long sum() wrap — see weightedSample
    val tot = df.agg(
      coalesce(sum(w), lit(0L)).as("_tot_w"),
      coalesce(sum(w.cast("double")), lit(0.0)).as("_tot_d"))
    val totAllowed = Long.MaxValue / k
    // 256 contiguous hash-line segments: 2^60-bit hash div 2^52
    val bucketWidth = (1L << 60) / 256
    val base = df
      .withColumn("_w_ss", w)
      .withColumn("_gr_ss_hash", idHash(col(idCol)))
      .withColumn("_bk_ss", expr(s"_gr_ss_hash div ${bucketWidth}L"))
    val offsets = base
      .groupBy(col("_bk_ss"))
      .agg(sum(col("_w_ss")).as("_bsum"))
      .withColumn("_boff",
        coalesce(
          sum(col("_bsum")).over(
            Window.orderBy(col("_bk_ss"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_bk_ss"), col("_boff"))
    base
      .join(broadcast(offsets), "_bk_ss")
      .crossJoin(broadcast(tot))
      // the weight joins the sort key so duplicate ids with DIFFERENT
      // weights still order totally; rows identical in (id, w) remain
      // interchangeable — their interval boundaries (and therefore the
      // output multiset) don't depend on which physical row goes first
      .withColumn("_cum",
        col("_boff") + sum(col("_w_ss")).over(
          Window.partitionBy(col("_bk_ss"))
            .orderBy(col("_gr_ss_hash").asc, col(idCol).asc, col("_w_ss").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(
        "n_picks",
        when(col("_tot_d") > 9.0e18,
          raise_error(lit(
            "systematicSample overflow: the weight TOTAL exceeds the " +
              "64-bit envelope (sum would wrap) — rescale the weights")))
          .when(col("_tot_w") > totAllowed,
          raise_error(concat(
            lit(s"systematicSample overflow: k=$k * total weight "),
            col("_tot_w").cast("string"),
            lit(" exceeds the 2^63 integer envelope — rescale the weights"))))
          .when(col("_tot_w") <= 0L, lit(0L))
          .otherwise(
            expr(s"(_cum * ${k}L) div _tot_w") -
              expr(s"((_cum - _w_ss) * ${k}L) div _tot_w")))
      .filter(col("n_picks") >= 1L)
      .drop("_w_ss", "_gr_ss_hash", "_bk_ss", "_boff", "_tot_w", "_tot_d", "_cum")
  }

  /** Budgeted selection: within each stratum, take rows in priority
    * order while the running cost stays within budget — the "best docs
    * until the token budget runs out" curation step. A row is kept iff
    * the total cost of ALL higher-priority rows plus its own fits the
    * budget (prefix cutoff, not first-fit: one oversized row ends the
    * stratum's intake, matching how sequential pipelines consume a
    * ranked list). Deterministic given a total priority order.
    *
    * Scale shape: one shuffle by stratum; the running total is a
    * ROWS-frame window, so each stratum fills in parallel in one pass.
    */
  def takeUntilBudget(
      df: DataFrame,
      budget: Long,
      costCol: String,
      priority: Seq[Column],
      stratumCol: String = "source"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol)).orderBy(priority: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .withColumn("cost_before", coalesce(sum(col(costCol)).over(w), lit(0L)))
      .filter(col("cost_before") + col(costCol) <= budget)
  }
}
