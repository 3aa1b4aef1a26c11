package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-windowed aggregation features — the "sum of events in the last
  * N days as of each training timestamp" family that production feature
  * pipelines layer on top of the reference's plain as-of join
  * (reference: src/ml_feature_store/store.py:261-308 gives only the
  * latest-row lookup; windowed aggregates are the standard extension).
  *
  * Scale design (100 TB): the naive plan — range join spine×table then
  * group by spine row — materializes every (probe, in-window row) pair:
  * a 7-day window over a busy entity multiplies the shuffle by the
  * window's row count. [[windowAggJoin]] instead unions probes into the
  * event stream and evaluates every aggregate with a RANGE-frame window
  * over epoch-micros: ONE shuffle + one sort of (events + probes), no
  * pairwise intermediate, all aggregates computed in the same window
  * pass. Skew note: a single hot entity still lands in one task — for
  * that shape, pre-split by time bucket as in
  * [[PointInTime.asOfJoinBucketed]] (sums/counts/min/max all decompose
  * over buckets).
  */
object WindowFeatures {

  import Validation.{EntityIdColumn, TimestampColumn}


  /** Ordering value + frame width for a window/session kernel, in
    * matching units: temporal columns at microsecond precision, numeric
    * ts columns in their own units. ONE dispatch site — three kernels
    * previously carried identical copies, exactly the block a new
    * ts-type support would have to be added to N times (intervalJoin's
    * missed DateType branch was this drift realized).
    */
  private def ordAndWidth(
      tsType: org.apache.spark.sql.types.DataType,
      seconds: Long,
      kernel: String): (Column => Column, Long) = tsType match {
    case _: TimestampType | _: TimestampNTZType | _: DateType =>
      ((c: Column) => unix_micros(c.cast(TimestampType)), seconds * 1000000L)
    case _: NumericType =>
      ((c: Column) => c.cast(LongType), seconds)
    case other =>
      throw new FeatureValidationError(
        s"$kernel needs a temporal or numeric timestamp column, got $other")
  }
  /** One requested aggregate: `fn` ∈ {rows, count, sum, min, max},
    * evaluated over the feature rows inside the probe's window.
    * `rows` counts feature rows (input ignored); the rest apply to
    * `input` with SQL null-skipping semantics.
    *
    * `windowSeconds` optionally overrides the join-level window length
    * for THIS aggregate — the "7d / 30d / 90d horizons of the same
    * signal" shape. All horizons share the one shuffle and sort: each
    * distinct length adds only a frame evaluation over the already-
    * sorted run, never another pass over the data.
    */
  final case class WindowAgg(
      out: String,
      fn: String,
      input: String = "",
      windowSeconds: Option[Long] = None)

  private val SupportedFns = Set("rows", "count", "sum", "min", "max", "distinct")

  /** For each spine row (e, t): aggregates over feature rows r with
    * `r.entity == e AND t - window < r.ts <= t` (inclusive upper bound —
    * same cutoff convention as the as-of join; lower bound exclusive so
    * consecutive windows of length `windowSeconds` tile without
    * overlap). Every spine row is emitted (left semantics): zero
    * in-window rows → `rows`/`count` = 0, `sum`/`min`/`max` = null.
    * Duplicate spine rows emit duplicate outputs.
    *
    * Determinism note (oracle-facing callers): `sum` over floating
    * point is order-dependent across engines — aggregate integer units
    * (e.g. cents as LONG) instead, as everywhere else in this engine.
    *
    * @param windowSeconds window length; for a temporal `tsCol` the
    *   unit is seconds (applied at microsecond precision); for a
    *   numeric `tsCol` it is the column's own units.
    */
  def windowAggJoin(
      spine: DataFrame,
      table: DataFrame,
      windowSeconds: Long,
      aggs: Seq[WindowAgg],
      entityCol: String = EntityIdColumn,
      tsCol: String = TimestampColumn): DataFrame = {
    if (windowSeconds < 1 || aggs.flatMap(_.windowSeconds).exists(_ < 1))
      throw new FeatureValidationError(
        s"windowSeconds must be >= 1 (join-level: $windowSeconds)")
    if (aggs.isEmpty)
      throw new FeatureValidationError("windowAggJoin needs at least one aggregate")
    aggs.find(a => !SupportedFns.contains(a.fn)).foreach(a =>
      throw new FeatureValidationError(
        s"unsupported window aggregate '${a.fn}' (supported: ${SupportedFns.toSeq.sorted.mkString(", ")})"))
    Validation.validateSpine(spine, entityCol, tsCol)
    val valueCols = aggs.collect { case a if a.fn != "rows" => a.input }.distinct
    val missing = valueCols.filterNot(table.columns.contains)
    if (missing.nonEmpty)
      throw new FeatureValidationError(
        s"windowAggJoin input columns not in table: ${missing.mkString(", ")}")
    val dupOut = aggs.groupBy(_.out).collect { case (o, as) if as.size > 1 => o }
    if (dupOut.nonEmpty)
      throw new FeatureValidationError(
        s"duplicate output names: ${dupOut.toSeq.sorted.mkString(", ")}")

    val entityType = table.schema(entityCol).dataType
    val tsType = table.schema(tsCol).dataType
    val (ordOf, width) = ordAndWidth(tsType, windowSeconds, "windowAggJoin")

    // null-ts feature rows can be inside NO window — but unfiltered they
    // would sort as null-ordering peers of null-ts probes and leak into
    // those probes' frames
    val featSide = table
      .filter(col(tsCol).isNotNull)
      .select(
        col(entityCol).as("_e") +:
          col(tsCol).as("_t") +:
          lit(0).as("_side") +:
          valueCols.map(c => col(c).as(s"_v_$c")): _*)
    val spineSide = spine.select(
      col(entityCol).cast(entityType).as("_e") +:
        col(tsCol).cast(tsType).as("_t") +:
        lit(1).as("_side") +:
        valueCols.map(c => lit(null).cast(table.schema(c).dataType).as(s"_v_$c")): _*)

    // RANGE frame (value-based): peers at the probe's exact ordering
    // value are all included regardless of union order — the inclusive
    // upper bound needs no side tag in the sort, unlike the as-of ROWS
    // frame. Aggregates sharing a window length share one WindowSpec;
    // distinct lengths become sibling Window operators over the SAME
    // partitioning and sort, so Catalyst plans one shuffle + one sort
    // total and each extra horizon costs only a frame scan.
    val sameUnits: Long => Long = tsType match {
      case _: NumericType => identity
      case _ => _ * 1000000L
    }
    def frameFor(seconds: Option[Long]): org.apache.spark.sql.expressions.WindowSpec =
      Window
        .partitionBy(col("_e"))
        .orderBy(col("_us"))
        .rangeBetween(-(seconds.map(sameUnits).getOrElse(width) - 1L), 0L)
    def featOnly(c: Column): Column = when(col("_side") === 0, c)
    val aggCols = aggs.map { a =>
      val w = frameFor(a.windowSeconds)
      a match {
        case WindowAgg(out, "rows", _, _) => count(featOnly(lit(1))).over(w).as(out)
        case WindowAgg(out, "count", in, _) => count(featOnly(col(s"_v_$in"))).over(w).as(out)
        case WindowAgg(out, "sum", in, _) => sum(featOnly(col(s"_v_$in"))).over(w).as(out)
        case WindowAgg(out, "min", in, _) => min(featOnly(col(s"_v_$in"))).over(w).as(out)
        case WindowAgg(out, "max", in, _) => max(featOnly(col(s"_v_$in"))).over(w).as(out)
        // distinct cardinality inside the frame: collect_set ignores the
        // null-tagged spine rows, size() reads the buffer — the window
        // form of count(DISTINCT) Spark doesn't accept directly. State
        // per frame is the distinct-value set; for very-high-cardinality
        // inputs prefer an HLL sketch column upstream.
        case WindowAgg(out, "distinct", in, _) =>
          size(collect_set(featOnly(col(s"_v_$in"))).over(w)).cast("long").as(out)
        case WindowAgg(_, fn, _, _) =>
          throw new FeatureValidationError(s"unsupported window aggregate '$fn'")
      }
    }

    featSide.unionByName(spineSide)
      .withColumn("_us", ordOf(col("_t")))
      .select(col("_e") +: col("_t") +: col("_side") +: aggCols: _*)
      .filter(col("_side") === 1)
      .select(col("_e").as(entityCol) +: col("_t").as(tsCol) +: aggs.map(a => col(a.out)): _*)
  }

  /** Skew-aware form of [[windowAggJoin]]: identical semantics, but the
    * per-entity RANGE window is decomposed over (entity, time-bucket)
    * tasks, with bucket width = the window length. A probe's window
    * (t − w, t] then spans at most TWO buckets:
    *
    *   - a PREFIX of the probe's own bucket k = ⌊t/w⌋ (rows ≤ t), read
    *     by a forward running aggregate with the probe placed at t;
    *   - a SUFFIX of bucket k−1 (rows > t − w), read by a BACKWARD
    *     running aggregate with a second probe copy placed at t − w
    *     (which lands in bucket k−1 by construction).
    *
    * Halves recombine per distinct probe (sums/counts add, min/max
    * fold, null iff both halves empty), then re-expand to duplicate
    * spine rows — all five aggregate fns decompose this way. A hot
    * entity's windows thus spread across its time range instead of
    * serializing into one window partition (the skew AQE cannot split,
    * same argument as [[PointInTime.asOfJoinBucketed]]). Costs two
    * extra small shuffles (probe-half combine + duplicate re-expand),
    * so the plain single-window form wins on long-tail data — route by
    * entity heat, as [[PointInTime.asOfJoinSkewHybrid]] does for as-of.
    *
    * Per-aggregate `windowSeconds` overrides are rejected: the bucket
    * grid is the window length, one horizon per pass.
    */
  def windowAggJoinBucketed(
      spine: DataFrame,
      table: DataFrame,
      windowSeconds: Long,
      aggs: Seq[WindowAgg],
      entityCol: String = EntityIdColumn,
      tsCol: String = TimestampColumn): DataFrame = {
    if (aggs.exists(_.windowSeconds.isDefined))
      throw new FeatureValidationError(
        "windowAggJoinBucketed buckets by the join-level window; per-aggregate horizons need one pass each")
    if (aggs.exists(_.fn == "distinct"))
      throw new FeatureValidationError(
        "windowAggJoinBucketed cannot compute 'distinct': |A ∪ B| does not " +
          "decompose over the prefix/suffix halves — use windowAggJoin, or an " +
          "HLL sketch column (register-max IS decomposable) for approximate counts")
    if (windowSeconds < 1)
      throw new FeatureValidationError(
        s"windowSeconds must be >= 1, got $windowSeconds")
    if (aggs.isEmpty)
      throw new FeatureValidationError("windowAggJoin needs at least one aggregate")
    aggs.find(a => !SupportedFns.contains(a.fn)).foreach(a =>
      throw new FeatureValidationError(
        s"unsupported window aggregate '${a.fn}' (supported: ${SupportedFns.toSeq.sorted.mkString(", ")})"))
    Validation.validateSpine(spine, entityCol, tsCol)
    val valueCols = aggs.collect { case a if a.fn != "rows" => a.input }.distinct
    val missing = valueCols.filterNot(table.columns.contains)
    if (missing.nonEmpty)
      throw new FeatureValidationError(
        s"windowAggJoin input columns not in table: ${missing.mkString(", ")}")
    val dupOut = aggs.groupBy(_.out).collect { case (o, as) if as.size > 1 => o }
    if (dupOut.nonEmpty)
      throw new FeatureValidationError(
        s"duplicate output names: ${dupOut.toSeq.sorted.mkString(", ")}")

    val entityType = table.schema(entityCol).dataType
    val tsType = table.schema(tsCol).dataType
    val (ordOf, width) = ordAndWidth(tsType, windowSeconds, "windowAggJoinBucketed")

    // distinct probes: halves recombine on (entity, t), so duplicates
    // must collapse first and re-expand at the end (asOfJoinViaJoin's
    // pattern) — pairing by a generated id would not survive task retry
    val probes = spine
      .select(col(entityCol).cast(entityType).as("_e"), col(tsCol).cast(tsType).as("_t"))
      .distinct()
      .withColumn("_us0", ordOf(col("_t")))
    val featSide = table
      .filter(col(tsCol).isNotNull)
      .select(
        col(entityCol).as("_e") +:
          ordOf(col(tsCol)).as("_us") +:
          lit(0).as("_side") +:
          lit(null).cast(LongType).as("_us0") +:
          valueCols.map(c => col(c).as(s"_v_$c")): _*)
    def probeSide(side: Int, at: Column) = probes.select(
      col("_e") +:
        at.as("_us") +:
        lit(side).as("_side") +:
        col("_us0") +:
        valueCols.map(c => lit(null).cast(table.schema(c).dataType).as(s"_v_$c")): _*)
    val unioned = featSide
      .unionByName(probeSide(1, col("_us0")))           // reads bucket-k prefix
      .unionByName(probeSide(2, col("_us0") - width))   // reads bucket-(k-1) suffix
      // bucket key = the exact floor MULTIPLE (x - pmod(x, w)),
      // negative-safe and pure Long arithmetic: dividing would round
      // through a double (Long/Long is DoubleType in Spark), losing
      // low bits past 2^53 — the multiple groups and orders identically
      .withColumn("_bk",
        when(col("_us").isNull, lit(null).cast(LongType))
          .otherwise(col("_us") - pmod(col("_us"), lit(width))))

    // forward: features sort BEFORE probes at equal ts (inclusive upper
    // bound); backward: the suffix probe sorts before equal-ts features
    // in descending order (strictly-greater lower bound)
    val wF = Window.partitionBy(col("_e"), col("_bk"))
      .orderBy(col("_us").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.partitionBy(col("_e"), col("_bk"))
      .orderBy(col("_us").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def featOnly(c: Column): Column = when(col("_side") === 0, c)
    def runningAggs(w: org.apache.spark.sql.expressions.WindowSpec) = aggs.map { a =>
      val c = a match {
        case WindowAgg(_, "rows", _, _) => count(featOnly(lit(1))).over(w)
        case WindowAgg(_, "count", in, _) => count(featOnly(col(s"_v_$in"))).over(w)
        case WindowAgg(_, "sum", in, _) => sum(featOnly(col(s"_v_$in"))).over(w)
        case WindowAgg(_, "min", in, _) => min(featOnly(col(s"_v_$in"))).over(w)
        case WindowAgg(_, "max", in, _) => max(featOnly(col(s"_v_$in"))).over(w)
        case WindowAgg(_, fn, _, _) =>
          throw new FeatureValidationError(s"unsupported window aggregate '$fn'")
      }
      c.as(s"_r_${a.out}")
    }
    // both scans in one select: Catalyst plans ONE exchange on
    // (_e, _bk) with an ascending and a descending sort over it
    val scannedBoth = unioned.select(
      (col("_e") +: col("_side") +: col("_us0") +:
        (aggs.zip(runningAggs(wF)).map { case (a, c) => c.as(s"_f_${a.out}") } ++
          aggs.zip(runningAggs(wB)).map { case (a, c) => c.as(s"_b_${a.out}") })): _*)
    // recombine the two probe copies per (entity, probe-ts) with an
    // aggregation, NOT a self-join — a join would evaluate the whole
    // scan subtree twice. Each probe is distinct, so the side-1 row is
    // the unique forward-half candidate and max() just picks it (and
    // preserves a legitimately-null empty-half value).
    val halfAggs =
      aggs.map(a => max(when(col("_side") === 1, col(s"_f_${a.out}")))
        .as(s"_p_${a.out}")) ++
        aggs.map(a => max(when(col("_side") === 2, col(s"_b_${a.out}")))
          .as(s"_s_${a.out}"))
    val halves = scannedBoth
      .filter(col("_side") =!= 0)
      .groupBy(col("_e").as("_pe"), col("_us0").as("_pt"))
      .agg(halfAggs.head, halfAggs.tail: _*)

    def combined(a: WindowAgg): Column = {
      val p = col(s"_p_${a.out}")
      val s = col(s"_s_${a.out}")
      a.fn match {
        case "rows" | "count" => (p + s).as(a.out)
        case "sum" =>
          // null iff BOTH halves saw no rows (plain windowAggJoin's
          // empty-window sum is null, a one-sided window's is not)
          when(p.isNull && s.isNull, lit(null))
            .otherwise(coalesce(p, lit(0)) + coalesce(s, lit(0)))
            .as(a.out)
        case "min" => least(p, s).as(a.out)
        case "max" => greatest(p, s).as(a.out)
      }
    }
    val perProbe = halves.select(
      col("_pe") +: col("_pt") +: aggs.map(combined): _*)

    // re-expand duplicate spine rows (null-safe equality, as elsewhere)
    spine
      .select(
        col(entityCol).cast(entityType).as("_oe"),
        col(tsCol).cast(tsType).as("_ot"))
      .join(perProbe,
        col("_oe") <=> col("_pe") && ordOf(col("_ot")) <=> col("_pt"))
      .select(col("_oe").as(entityCol) +: col("_ot").as(tsCol) +:
        aggs.map(a => col(a.out)): _*)
  }

  /** Heat-routed form of [[windowAggJoin]]: entities with at least
    * `hotRowThreshold` feature rows take the bucketed prefix/suffix
    * decomposition ([[windowAggJoinBucketed]]), the long tail takes the
    * plain single-window plan — same routing argument as
    * [[PointInTime.asOfJoinSkewHybrid]], including the cast-aware split
    * (the spine entity is classified AFTER casting to the table's
    * entity type, matching what the kernels compare) and the
    * driver-side hot set bounded by totalRows / hotRowThreshold for
    * the row rule and capped at [[SkewStats.maxWorkHotSet]] for the
    * work rule (worst offenders first; the remainder routes plain).
    *
    * Threshold note (examples/WindowSkewDemo, 20M rows): the plain
    * plan's hot-entity cost is probes × in-frame rows inside ONE
    * indivisible task (Spark's sliding RANGE frame re-aggregates on
    * frame change), measured 981s for a 10M-row entity with 1M probes
    * and ~1800-row frames, vs 7.6s bucketed. The default threshold is
    * row-count-based like the as-of hybrid's, but the window family
    * degrades faster than as-of's sort-bound plain path — so the
    * classification is additionally FRAME-AWARE: an entity whose
    * estimated plain-plan work (rows × estimated in-frame rows, see
    * [[SkewStats.hotEntitiesByWindowWork]]) reaches `hotWorkThreshold`
    * routes bucketed even far below the row threshold. The default
    * (1e8) is ~5 s of single-task frame re-aggregation at
    * WindowSkewDemo's measured ~1.8e7 frame-rows/s — about where the
    * plain plan's one indivisible hot task starts losing to the
    * bucketed decomposition's two extra shuffles. Dense-burst entities
    * (whole history inside one frame) hit it at √1e8 = 10k rows; an
    * entity with ~1800-row frames at 75k rows; a sparse entity whose
    * frames hold a handful of rows stays on the plain path at any
    * count below `hotRowThreshold`.
    */
  def windowAggJoinHybrid(
      spine: DataFrame,
      table: DataFrame,
      windowSeconds: Long,
      aggs: Seq[WindowAgg],
      hotRowThreshold: Long = 10000000L,
      entityCol: String = EntityIdColumn,
      tsCol: String = TimestampColumn,
      hotWorkThreshold: Long = 100000000L): DataFrame = {
    if (hotRowThreshold < 1)
      throw new FeatureValidationError(
        s"hotRowThreshold must be >= 1, got $hotRowThreshold")
    if (hotWorkThreshold < 1)
      throw new FeatureValidationError(
        s"hotWorkThreshold must be >= 1, got $hotWorkThreshold")
    // memoized per (table plan, entityCol, thresholds) — see [[SkewStats]].
    // ordAndWidth validates the ts type up front (same error the kernels
    // would raise), then the one classification pass reads count + ts
    // span per entity and applies BOTH the row and the work rule.
    val hot = {
      // exact match first, then case-insensitive — Spark resolves
      // columns case-insensitively by default, and a casing mismatch
      // must not silently disable the work rule (the dense-burst shape
      // it exists to catch would run the plain single-task path)
      val tsTypeCls = table.schema.find(_.name == tsCol)
        .orElse(table.schema.find(_.name.equalsIgnoreCase(tsCol)))
        .map(_.dataType)
      tsTypeCls match {
        case Some(t) =>
          val (ordOfCls, widthCls) =
            ordAndWidth(t, windowSeconds, "windowAggJoinHybrid")
          SkewStats.hotEntitiesByWindowWork(
            table, entityCol, tsCol, ordOfCls, widthCls,
            hotRowThreshold, hotWorkThreshold)
        case None =>
          // missing ts column: fall through to the plain kernel's
          // canonical validation error instead of raising our own shape
          SkewStats.hotEntities(table, entityCol, hotRowThreshold)
      }
    }
    // a STREAMING spine cannot be split-and-probed (the emptiness
    // probes are batch actions) — route it to the plain kernel, the
    // shape Validation.validateSpine carved out for streaming frames
    if (hot.isEmpty || spine.isStreaming)
      return windowAggJoin(spine, table, windowSeconds, aggs, entityCol, tsCol)
    val missing = Seq(entityCol, tsCol).filterNot(spine.columns.contains)
    if (missing.nonEmpty)
      throw new FeatureValidationError(
        s"entity_timestamps is missing required columns: ${missing.mkString(", ")}")
    // null-safe split — shared with the as-of hybrid
    val (hotPredOn, coldPredOn) = SkewStats.hotColdPredicates(hot)
    val spineEntity = col(entityCol).cast(table.schema(entityCol).dataType)
    // limit-1 emptiness probes, not a full-spine aggregate — see the
    // as-of hybrid ([[PointInTime.asOfJoinSkewHybrid]]) for the argument
    val nHot = if (spine.filter(hotPredOn(spineEntity)).isEmpty) 0 else 1
    val nCold = if (spine.filter(coldPredOn(spineEntity)).isEmpty) 0 else 1
    if (nHot + nCold == 0)
      throw new FeatureValidationError("entity_timestamps must not be empty")
    // unlike the as-of hybrid, spine rows for the table-less side must
    // KEEP their left-semantics zero rows — so the unprobed table side
    // is filtered but the spine is never dropped, and an empty split
    // simply runs the whole spine down one path
    if (nHot == 0)
      windowAggJoin(spine, table.filter(coldPredOn(col(entityCol))),
        windowSeconds, aggs, entityCol, tsCol)
    else if (nCold == 0)
      windowAggJoinBucketed(spine, table.filter(hotPredOn(col(entityCol))),
        windowSeconds, aggs, entityCol, tsCol)
    else {
      val hotPart = windowAggJoinBucketed(
        spine.filter(hotPredOn(spineEntity)),
        table.filter(hotPredOn(col(entityCol))),
        windowSeconds, aggs, entityCol, tsCol)
      val coldPart = windowAggJoin(
        spine.filter(coldPredOn(spineEntity)),
        table.filter(coldPredOn(col(entityCol))),
        windowSeconds, aggs, entityCol, tsCol)
      hotPart.unionByName(coldPart)
    }
  }

  /** Interval (range) join: every (left, right) pair of the same entity
    * with the right timestamp inside `[left.ts − maxGapSeconds,
    * left.ts]` — the attribution shape ("clicks in the hour before each
    * purchase"), sensor alignment, and the general bounded-lookback
    * pairing the as-of join's latest-only rule cannot express.
    *
    * Columns come back prefixed (`l_` / `r_`, entity once, unprefixed)
    * so both sides' payloads survive. Plan: equi-join on entity with the
    * range predicate evaluated inside the join — one shuffle per side,
    * output bounded by true match multiplicity, never an entity-wide
    * cross product. The same function runs STREAM-STREAM: apply
    * `withWatermark` to both inputs first and Spark uses the range
    * bounds in the condition to expire join state.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      maxGapSeconds: Long,
      entityCol: String = EntityIdColumn,
      tsCol: String = TimestampColumn): DataFrame = {
    if (maxGapSeconds < 0)
      throw new FeatureValidationError(
        s"maxGapSeconds must be >= 0, got $maxGapSeconds")
    Validation.validateSpine(left, entityCol, tsCol)
    Validation.validateSpine(right, entityCol, tsCol)
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))
    val l = prefixed(left, "l_")
    val r = prefixed(right, "r_")
    val lTs = col(s"l_$tsCol")
    val rTs = col(s"r_$tsCol")
    val bound: Column = left.schema(tsCol).dataType match {
      case _: TimestampType | _: TimestampNTZType =>
        rTs >= lTs - expr(s"INTERVAL $maxGapSeconds SECOND")
      // DateType: compare at timestamp precision (midnight, UTC-pinned
      // session) — the numeric fallback would subtract DAYS, pairing
      // events maxGapSeconds DAYS apart (or failing analysis)
      case _: DateType =>
        rTs.cast(TimestampType) >=
          lTs.cast(TimestampType) - expr(s"INTERVAL $maxGapSeconds SECOND")
      case _ => rTs >= lTs - lit(maxGapSeconds)
    }
    l.join(
        r,
        col(s"l_$entityCol") === col(s"r_$entityCol") &&
          rTs <= lTs && bound)
      .withColumn(entityCol, col(s"l_$entityCol"))
      .drop(s"l_$entityCol", s"r_$entityCol")
  }

  /** Batch sessionization: split each entity's event stream into
    * sessions separated by gaps strictly greater than `gapSeconds`,
    * returning one row per session with its bounds and event count —
    * the batch twin of a streaming session window, and the
    * deterministic base for session-length / events-per-session
    * features.
    *
    * Plan: per-entity `lag` marks session starts (gap > threshold or
    * first event), a running sum over the same sort turns marks into
    * session ordinals, then a hash aggregation by (entity, ordinal)
    * collapses sessions — map-side partial combine keeps the second
    * shuffle at one row per session per map partition.
    *
    * All outputs are timestamps and counts — deterministic across
    * engines by construction.
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long,
      entityCol: String = EntityIdColumn,
      tsCol: String = TimestampColumn,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    if (gapSeconds < 1)
      throw new FeatureValidationError(s"gapSeconds must be >= 1, got $gapSeconds")
    Validation.validateSpine(events, entityCol, tsCol)
    val tsType = events.schema(tsCol).dataType
    val (ordOf, gapWidth) = ordAndWidth(tsType, gapSeconds, "sessionize")
    val order = (col("_us") +: tieBreakCols.map(col)).map(_.asc)
    val we = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    val marked = events
      .withColumn("_us", ordOf(col(tsCol)))
      .withColumn("_new",
        when(col("_us") - lag(col("_us"), 1).over(we) > gapWidth, 1)
          .when(lag(col("_us"), 1).over(we).isNull, 1)
          .otherwise(0))
      .withColumn("_sess",
        sum(col("_new")).over(we.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy(col(entityCol), col("_sess").as("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(entityCol), col("session_seq"), col("session_start"),
        col("session_end"), col("n_events"))
  }

  /** Per-entity lag/delta features: each event row annotated with the
    * previous event's value and the difference — the standard
    * "change-since-last-observation" feature family (and, shifted to
    * timestamps, inter-arrival time in seconds).
    *
    * Plan: ONE entity-keyed shuffle serves every lag column (all lags
    * share the same window sort); the subtraction operates on the same
    * two doubles in both engines, so deltas are bit-deterministic.
    */
  def lagDelta(
      events: DataFrame,
      valueCol: String,
      entityCol: String = EntityIdColumn,
      tsCol: String = TimestampColumn,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    Validation.validateSpine(events, entityCol, tsCol)
    val order = (col(tsCol) +: tieBreakCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    events
      .withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("value_delta", col(valueCol) - col("prev_value"))
      .withColumn(
        "secs_since_prev",
        (unix_micros(col(tsCol).cast(TimestampType)) -
          unix_micros(lag(col(tsCol), 1).over(w).cast(TimestampType))) / 1000000L)
  }
}
