package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Probabilistic sketches for cardinality and frequency at corpus scale.
  *
  * The reference has no sketches (its whole store is in-memory pandas,
  * `/root/reference/src/ml_feature_store/store.py:112`); these are
  * north-star extensions for the 100 TB profile where exact
  * `count(DISTINCT)` / full frequency tables stop being feasible as
  * intermediate state. Both sketches here are *deterministic*: the hash
  * family is md5-derived ([[Hashing.md5Long60]]), so the DuckDB oracle
  * reproduces every register and cell bit-for-bit — the driver's hash
  * compare verifies the sketch pipeline itself, while the accuracy
  * guarantees (HLL ±~13% at m=64, CMS overcount-only) are asserted in
  * SketchesSpec against the exact answers.
  *
  * Scale shape: both sketches reduce to `groupBy(...).agg(max/count)`
  * with map-side partial aggregation, so the shuffle carries at most
  * (groups × m) register rows / (depth × width) cells per map partition —
  * bounded by sketch size, not data volume. That is the entire point:
  * the 100 TB input compresses to kilobytes before the exchange.
  */
object Sketches {

  /** Registers live on the low `60 - p` bits; rank is leading-zero count
    * within those bits plus one, so values fall in [1, remBits + 1].
    */
  private def remBits(p: Int): Int = 60 - p

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The estimate's constant numerator `alpha(m) * m^2 * 2^scale`,
    * computed once on the JVM and inlined verbatim into the oracle SQL
    * (double literals round-trip through toString), so both engines
    * perform the identical single division by the exact integer
    * register sum.
    */
  def alphaNumerator(p: Int): Double = {
    val m = 1 << p
    alpha(m) * m.toDouble * m.toDouble * math.pow(2.0, (remBits(p) + 1).toDouble)
  }

  /** Null-safe inner join of the exact and register sides on the group
    * columns: a NULL group key is a legal group (groupBy groups nulls),
    * and a null-unsafe USING join would silently drop it from the
    * output — the same defect class the store's key-addressed joins
    * guard against. The oracle SQL joins with IS NOT DISTINCT FROM to
    * match.
    */
  private def joinOnGroups(
      exact: DataFrame, summed: DataFrame, groupCols: Seq[String]): DataFrame = {
    val renamed = summed.select(
      groupCols.map(c => col(c).as(s"_g_$c")) ++
        summed.columns.filterNot(groupCols.contains).map(col): _*)
    exact
      .join(
        renamed,
        groupCols.map(c => exact(c) <=> col(s"_g_$c")).reduce(_ && _))
      .drop(groupCols.map(c => s"_g_$c"): _*)
  }

  /** Flajolet's small-range correction (linear counting), applied on the
    * driver/consumer side: the raw estimate is the oracle-facing value
    * (bit-exact across engines) because ln()'s last-ulp behavior is
    * libm-specific; callers that want the corrected number apply this to
    * the (hll_estimate, n_empty_buckets) pair the query already emits.
    */
  def correctedEstimate(rawEstimate: Double, nEmptyBuckets: Long, p: Int): Double = {
    val m = 1 << p
    if (rawEstimate <= 2.5 * m && nEmptyBuckets > 0)
      m * math.log(m.toDouble / nEmptyBuckets)
    else rawEstimate
  }

  /** Deterministic HyperLogLog distinct-count per group.
    *
    * Output: one row per group with
    *   - `exact_distinct`  — exact `count(DISTINCT value)` for comparison
    *   - `hll_sum_scaled`  — Σ_buckets 2^(scale − M_b) as an exact long
    *                         (empty buckets contribute 2^scale), the
    *                         engine-portable register summary
    *   - `n_empty_buckets` — buckets never touched by any value
    *   - `hll_estimate`    — alpha·m²·2^scale / hll_sum_scaled, the raw
    *                         HLL estimate (no small-range correction: the
    *                         correction needs ln(), whose last-ulp
    *                         behavior is libm-specific; accuracy at small
    *                         cardinalities is asserted in the spec, not
    *                         the oracle)
    *
    * Registers aggregate as `max(rank)` per (group, bucket) — partially
    * map-side, so the exchange carries ≤ m rows per group per partition
    * regardless of input size.
    *
    * NULL values are excluded from the registers, matching
    * `exact_distinct`'s `count(DISTINCT)` null-skipping (an unfiltered
    * null would hash to a phantom bucket that contributes nothing to
    * the sum yet occupies an empty-bucket slot — and the typed
    * [[hllDistinctAgg]] would register it differently, breaking the
    * two formulations' equality). A group with ONLY null values drops
    * from the output (its sketch is empty and its exact count is 0).
    */
  def hllDistinct(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val rem = remBits(p)
    val scale = rem + 1
    val remMod = 1L << rem

    val gcols = groupCols.map(col)
    val h = Hashing.md5Long60(col(valueCol))
    val bucket = shiftright(h, rem).as("bucket")
    val r = (h % lit(remMod)).as("rem")
    // bitlength(rem) = length(bin(rem)) for rem > 0 (no leading zeros in
    // either engine's bin); rank = scale - bitlength, rem=0 → scale
    val rank = when(col("rem") === 0, lit(scale))
      .otherwise(lit(scale) - length(bin(col("rem"))))
      .as("rank")

    val registers = df
      .filter(col(valueCol).isNotNull)
      .select(gcols :+ bucket :+ r: _*)
      .select(gcols :+ col("bucket") :+ rank: _*)
      .groupBy(gcols :+ col("bucket"): _*)
      .agg(max(col("rank")).as("maxr"))

    val summed = registers
      .groupBy(gcols: _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - maxr)"))
          .as("sum_present"),
        count(lit(1)).as("n_buckets"))
      .select(
        gcols :+
          (col("sum_present") +
            (lit(m.toLong) - col("n_buckets")) * lit(1L << scale))
            .as("hll_sum_scaled") :+
          (lit(m.toLong) - col("n_buckets")).as("n_empty_buckets"): _*)

    val exact = df
      .groupBy(gcols: _*)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))

    joinOnGroups(exact, summed, groupCols)
      .withColumn(
        "hll_estimate",
        lit(alphaNumerator(p)) / col("hll_sum_scaled"))
  }

  /** Token bucket for Count-Min row `i`: a disjoint 15-bit slice of ONE
    * md5 per token, reduced mod width — depth independent hash rows for
    * the price of a single digest (the md5 is the dominant cost of the
    * cells pass; distinct bit ranges of a cryptographic hash are
    * independent for counting purposes). Caps depth at 4 (60 bits / 15)
    * and width at 2^15. Width must be a power of two: `% width` on a
    * uniform 15-bit slice is only uniform when width divides 2^15 — any
    * other width biases low buckets (overcount-only still holds, but
    * accuracy quietly degrades), so non-power widths are rejected.
    */
  private def cmsBucket(h: Column, i: Int, width: Int): Column =
    shiftright(h, 15 * i).bitwiseAND(lit(32767L)) % width

  /** Rolling window distinct counts from MERGED daily HLL sketches —
    * the production shape for "distinct users in the trailing N days":
    * raw data is scanned once into per-day register tables (tiny:
    * days × m rows), and each target day's sketch is the register-wise
    * max over its window — sketches merge losslessly, so the rolled-up
    * registers equal the registers of the union, no rescan of raw data
    * per window. The exact `count(DISTINCT)` per window rides along for
    * the oracle/accuracy checks only (it's the expensive side a
    * production run drops).
    *
    * Output: one row per grid day WHOSE TRAILING WINDOW CONTAINS AT
    * LEAST ONE EVENT — a day with an empty window is omitted, not
    * emitted as an empty sketch (both the rolled and exact sides join
    * inner on the day spine, and the oracle matches that shape). Same
    * register summary contract as [[hllDistinct]] otherwise.
    */
  def hllRollingDistinct(
      df: DataFrame,
      valueCol: String,
      tsCol: String,
      startDay: String,
      endDay: String,
      windowDays: Int,
      p: Int = 6): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val m = 1 << p
    val rem = remBits(p)
    val scale = rem + 1
    val remMod = 1L << rem
    val spark = df.sparkSession

    val days = spark.range(1).select(explode(expr(
      s"sequence(date '$startDay', date '$endDay', interval 1 day)")).as("day"))

    val h = Hashing.md5Long60(col(valueCol).cast("string"))
    // null values are excluded from registers AND the ride-along exact
    // count (count(DISTINCT) skips them anyway) — see [[hllDistinct]]
    val hashed = df.filter(col(valueCol).isNotNull).select(
      to_date(col(tsCol)).as("d"),
      col(valueCol).cast("string").as("_v"),
      shiftright(h, rem).as("bucket"),
      (h % lit(remMod)).as("rm"))
    val ranked = hashed.select(
      col("d"), col("bucket"),
      when(col("rm") === 0, lit(scale))
        .otherwise(lit(scale) - length(bin(col("rm")))).as("rank"))
    val daily = ranked
      .groupBy(col("d"), col("bucket"))
      .agg(max(col("rank")).as("maxr"))

    // register-wise max over each day's window = the union's registers
    val rolled = days
      .join(daily,
        daily("d") >= date_sub(col("day"), windowDays - 1) &&
          daily("d") <= col("day"))
      .groupBy(col("day"), col("bucket"))
      .agg(max(col("maxr")).as("maxr"))
      .groupBy(col("day"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - maxr)"))
          .as("sum_present"),
        count(lit(1)).as("n_buckets"))
      .select(
        col("day"),
        (col("sum_present") +
          (lit(m.toLong) - col("n_buckets")) * lit(1L << scale))
          .as("hll_sum_scaled"),
        (lit(m.toLong) - col("n_buckets")).as("n_empty_buckets"))

    val exact = days
      .join(hashed,
        col("d") >= date_sub(col("day"), windowDays - 1) &&
          col("d") <= col("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("_v")).as("exact_distinct"))

    exact
      .join(rolled, Seq("day"))
      .withColumn("hll_estimate", lit(alphaNumerator(p)) / col("hll_sum_scaled"))
  }

  /** [[hllDistinct]] as a single aggregation pass via the typed
    * [[graft.functions.HllAggregator]]: the register array IS the
    * aggregation buffer, so the exchange carries one m-byte array per
    * group per partition and no second exchange is needed to sum
    * registers. Identical output (same hash, same register arithmetic,
    * same estimate tree) — both formulations face the same oracle.
    */
  def hllDistinctAgg(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      p: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val sketch = udaf(new graft.functions.HllAggregator(p))
    // null values are filtered BEFORE the aggregator: a null hash would
    // reach the typed buffer as the primitive encoder's 0L and register
    // bucket 0 at max rank — diverging from the column formulation's
    // (also wrong) phantom null bucket; both formulations instead skip
    // nulls, like the exact count they ride with (see [[hllDistinct]])
    val summed = df
      .filter(col(valueCol).isNotNull)
      .select(gcols :+ Hashing.md5Long60(col(valueCol)).as("_h"): _*)
      .groupBy(gcols: _*)
      .agg(sketch(col("_h")).as("_sk"))
      .select(gcols :+
        col("_sk.hll_sum_scaled").as("hll_sum_scaled") :+
        col("_sk.n_empty_buckets").as("n_empty_buckets"): _*)
    val exact = df
      .groupBy(gcols: _*)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    joinOnGroups(exact, summed, groupCols)
      .withColumn(
        "hll_estimate",
        lit(alphaNumerator(p)) / col("hll_sum_scaled"))
      .select(groupCols.map(col) :+ col("exact_distinct") :+
        col("hll_sum_scaled") :+ col("n_empty_buckets") :+
        col("hll_estimate"): _*)
  }

  /** Count-Min heavy hitters over whitespace tokens of `textCol`.
    *
    * Builds a depth×width Count-Min sketch of token frequencies (each of
    * the `depth` rows hashes with an independent md5-derived function),
    * then reports the true top-k tokens (exact count, deterministic
    * (count desc, token asc) tie-break) alongside their sketch estimate
    * `min_i cells[i][h_i(tok)]`. CMS never undercounts, so
    * `n_cms >= n_exact` always — asserted in the spec; the oracle
    * verifies the exact cell arithmetic.
    *
    * Scale shape: the cells table is the sketch (depth × width counters,
    * aggregated with map-side partial combine) and broadcasts to the
    * candidate probe — at 100 TB the only full-data pass is the one
    * token scan.
    */
  def cmsHeavyHitters(
      docs: DataFrame,
      textCol: String = "text",
      depth: Int = 4,
      width: Int = 64,
      k: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1,4], got $depth")
    require(
      width >= 2 && width <= 32768 && (width & (width - 1)) == 0,
      s"width must be a power of two in [2,32768], got $width (see cmsBucket)")
    val toks = docs.select(explode(split(col(textCol), " ")).as("tok"))

    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val cand = exact
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(k)

    // (row, bucket) rows for one token, all depth rows from one md5
    def rowBuckets(tok: Column) = {
      val h = Hashing.md5Long60(tok)
      (0 until depth).map { i =>
        struct(lit(i).as("r"), cmsBucket(h, i, width).as("bucket"))
      }
    }
    // Cells fold the EXACT counts, not raw occurrences: a cell's counter
    // is Σ n_exact over the tokens hashing into it — identical to
    // counting occurrences directly, but the corpus is scanned ONCE
    // (for `exact`) and the md5 family runs per distinct token
    // (vocabulary-sized) instead of per occurrence.
    val cells = exact
      .select(col("n_exact"),
        explode(array(rowBuckets(col("tok")): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum(col("n_exact")).as("cell_n"))

    val candBuckets = cand.select(
      col("tok"),
      col("n_exact"),
      explode(array(rowBuckets(col("tok")): _*)).as("rb"))

    candBuckets
      .join(
        broadcast(cells),
        col("rb.r") === cells("r") && col("rb.bucket") === cells("bucket"))
      .groupBy(col("tok").as("token"), col("n_exact"))
      .agg(min(col("cell_n")).as("n_cms"))
      .select(col("token"), col("n_exact"), col("n_cms"))
  }
}
