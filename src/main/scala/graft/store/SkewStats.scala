package graft.store

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Memoized heavy-hitter classification for the skew-routed kernels
  * ([[PointInTime.asOfJoinSkewHybrid]],
  * [[WindowFeatures.windowAggJoinHybrid]]).
  *
  * Hot-set membership is a property of the TABLE — (logical plan,
  * entity column, threshold) — not of the query probing it, so the
  * classification aggregate (a full `groupBy(entity).count()` pass over
  * the feature table) should run once per table version, not once per
  * join. The cache key is the analyzed plan's semantic hash: two reads
  * of the same table version hash equal, a new version (new path) or a
  * different projection hashes fresh.
  *
  * SAFETY: the hot set only picks the physical ROUTE; the hybrid
  * kernels produce the as-of/window answer for ANY hot/cold partition
  * of the entities (property-tested in PointInTimeProps — routing and
  * semantics are independent). A stale or even colliding cache entry
  * can therefore cost performance, never correctness — which is what
  * makes driver-side memoization admissible here at all.
  *
  * The row-rule hot set is bounded by totalRows / threshold (the
  * frame-aware rule is additionally capped — see
  * [[hotEntitiesByWindowWork]]) (the broadcast-join
  * cardinality contract), so entries are small; the cache is cleared
  * wholesale past a size bound rather than LRU-tracked.
  */
object SkewStats {

  private val MaxEntries = 256
  // third component: the classification's parameter signature — a bare
  // row threshold (Long) for [[hotEntities]], a descriptor tuple for
  // [[hotEntitiesByWindowWork]] — so the two classifications of the
  // same (plan, column) never collide
  private val cache = TrieMap.empty[(Int, String, Any), Array[Any]]

  /** Entities of `table` with at least `threshold` rows — memoized per
    * (table plan, entityCol, threshold).
    */
  def hotEntities(
      table: DataFrame,
      entityCol: String,
      threshold: Long): Array[Any] = {
    val key = (table.semanticHash(), entityCol, threshold: Any)
    cache.getOrElse(key, {
      val hot = table
        .groupBy(col(entityCol).as("_he"))
        .agg(count(lit(1)).as("_hc"))
        .filter(col("_hc") >= threshold)
        .select(col("_he"))
        .collect()
        .map(_.get(0))
      memoize(key, hot)
      hot
    })
  }

  /** Frame-aware classification for the WINDOW family: an entity is hot
    * if its row count reaches `rowThreshold` (the as-of rule) OR its
    * estimated plain-window work reaches `workThreshold`. The window
    * family's plain plan re-aggregates the frame on every frame change
    * inside ONE indivisible task, so its hot-entity cost is
    * probes × in-frame rows — quadratic-ish in density, not linear in
    * rows (examples/WindowSkewDemo: a 10M-row entity with ~1800-row
    * frames cost 981 s plain vs 7.6 s bucketed). Per-entity estimate
    * from one aggregate pass (count, min/max of the normalized ts):
    *
    *   frameRows ≈ n · min(1, width / span)   (uniform-density model)
    *   work      ≈ n · frameRows              (probe count proxied by n —
    *                                           the spine is not consulted)
    *
    * A dense burst entity (span < width ⇒ every row in every frame) is
    * classified hot at n ≥ √workThreshold rows, far below the row
    * threshold — the shape the row rule misses. Null-ts rows join no
    * frame and are excluded from the estimate. Memoized like
    * [[hotEntities]]; misclassification costs routing, never
    * correctness (the hybrids are answer-equivalent on any partition).
    *
    * Boundedness: unlike the row rule (≤ totalRows/rowThreshold hits by
    * construction), the work rule can admit totalRows/√workThreshold
    * entities — a corpus of uniform dense bursts would qualify them
    * ALL, and the hot set is collected to the driver and expanded into
    * isin literals. The driver-side set is therefore capped at
    * [[maxWorkHotSet]] entities, row-rule hits first, then the worst
    * work offenders — entities past the cap route down the plain path,
    * a performance (never correctness) concession.
    */
  def hotEntitiesByWindowWork(
      table: DataFrame,
      entityCol: String,
      tsCol: String,
      ordOf: Column => Column,
      width: Long,
      rowThreshold: Long,
      workThreshold: Long): Array[Any] = {
    val key = (table.semanticHash(), entityCol,
      ("windowWork", tsCol, width, rowThreshold, workThreshold): Any)
    cache.getOrElse(key, {
      val n = col("_hc")
      val span = (col("_hmax") - col("_hmin")).cast("double")
      val frameRows = least(
        n.cast("double"),
        n.cast("double") * lit(width.toDouble) / greatest(span, lit(1.0)))
      val hot = table
        .filter(col(tsCol).isNotNull)
        .groupBy(col(entityCol).as("_he"))
        .agg(
          count(lit(1)).as("_hc"),
          min(ordOf(col(tsCol))).as("_hmin"),
          max(ordOf(col(tsCol))).as("_hmax"))
        .withColumn("_work", n.cast("double") * frameRows)
        .filter(n >= rowThreshold ||
          col("_work") >= lit(workThreshold.toDouble))
        // final entity-asc key: entities tied on _work at the 4096
        // boundary would otherwise be admitted or dropped by
        // partitioning luck, making the memoized hot set (and thus the
        // routed plan shape) vary across runs — performance-only under
        // the answer-equivalence contract, but this repo promises
        // bit-reproducible trajectories everywhere else too
        .orderBy((n >= rowThreshold).desc, col("_work").desc, col("_he").asc)
        .limit(MaxWorkHotSet)
        .select(col("_he"))
        .collect()
        .map(_.get(0))
      memoize(key, hot)
      hot
    })
  }

  /** Cap on the frame-aware hot set (see [[hotEntitiesByWindowWork]]). */
  private val MaxWorkHotSet = 4096
  private[graft] def maxWorkHotSet: Int = MaxWorkHotSet

  /** Insert under the eviction policy: a full memo displaces a SINGLE
    * arbitrary entry, never the whole cache — clearing would dump
    * every classification (and force a re-count job each) just because
    * one new key arrived. Package-visible so tests can exercise the
    * policy without running 256 count jobs.
    */
  private[graft] def memoize(
      key: (Int, String, Any), value: Array[Any]): Unit =
    // one critical section for evict+put: unsynchronized check-then-act
    // lets two racing inserts at the cap both remove the same head and
    // ratchet the size permanently past MaxEntries
    cache.synchronized {
      if (cache.size >= MaxEntries)
        cache.headOption.foreach { case (k, _) => cache.remove(k) }
      cache.put(key, value)
      ()
    }

  private[graft] def maxEntries: Int = MaxEntries

  /** Null-safe hot/cold routing predicates over a hot-entity set —
    * shared by the skew hybrids ([[PointInTime.asOfJoinSkewHybrid]],
    * [[WindowFeatures.windowAggJoinHybrid]]), which previously carried
    * verbatim copies of this subtle logic. A null entity can be hot
    * (Window.partitionBy groups nulls); `isin` would drop it, so null
    * membership routes explicitly, and the cold side is the null-safe
    * complement.
    */
  private[graft] def hotColdPredicates(hot: Array[Any])
      : (org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{coalesce, lit}
    val nonNullHot = hot.filter(_ != null)
    def hotPredOn(e: Column): Column =
      if (hot.contains(null))
        e.isNull ||
          (if (nonNullHot.isEmpty) lit(false) else e.isin(nonNullHot: _*))
      else e.isin(nonNullHot: _*)
    def coldPredOn(e: Column): Column = !coalesce(hotPredOn(e), lit(false))
    (hotPredOn, coldPredOn)
  }

  /** Drop all memoized classifications — called by
    * [[graft.Tables.invalidate]], the in-place-rewrite escape hatch
    * where a re-read plan can hash equal to the pre-rewrite plan while
    * the data changed (routing would be stale, though still correct).
    */
  def invalidate(): Unit = cache.clear()

  /** Visible for tests: current memo population. */
  private[graft] def cachedEntries: Int = cache.size
}
