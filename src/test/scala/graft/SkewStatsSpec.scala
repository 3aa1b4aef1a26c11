package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SkewStats

/** The skew-classification memo: population, hit behavior, and the
  * invalidation hook [[Tables.invalidate]] calls on in-place rewrites
  * (the one case where a plan hash survives a data change).
  */
class SkewStatsSpec extends AnyFunSuite with SparkTestBase {

  test("hotEntities memoizes per (plan, column, threshold) and classifies correctly") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(50)("hot") ++ Seq("cold1", "cold2"))
      .toDF("entity_id")
    SkewStats.invalidate()
    val hot = SkewStats.hotEntities(df, "entity_id", 10L)
    assert(hot.toSeq == Seq("hot"))
    assert(SkewStats.cachedEntries == 1)
    // same plan + params: served from the memo, entry count unchanged
    SkewStats.hotEntities(df, "entity_id", 10L)
    assert(SkewStats.cachedEntries == 1)
    // different threshold is a different table property: fresh entry
    assert(SkewStats.hotEntities(df, "entity_id", 1L).length == 3)
    assert(SkewStats.cachedEntries == 2)
  }

  test("hotEntitiesByWindowWork: dense burst is hot below the row threshold, sparse is not") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    SkewStats.invalidate()
    // burst: 300 rows inside ONE 3600 s frame (span 300 s) → every row
    // in every frame, work ≈ 300² = 90 000; sparse: 300 rows over
    // ~35 days → ~0.36 rows per 3600 s frame, work ≈ 108
    val df = (
      (0 until 300).map(i => ("burst", i.toLong)) ++
        (0 until 300).map(i => ("sparse", i.toLong * 10000L))
    ).toDF("entity_id", "ts")
    val ordOf = (c: org.apache.spark.sql.Column) => c.cast("long")
    val hot = SkewStats.hotEntitiesByWindowWork(
      df, "entity_id", "ts", ordOf, width = 3600L,
      rowThreshold = 1000000L, workThreshold = 50000L)
    assert(hot.toSeq == Seq("burst"))
    assert(SkewStats.cachedEntries == 1)
    // row rule still applies independently of density
    val hotByRows = SkewStats.hotEntitiesByWindowWork(
      df, "entity_id", "ts", ordOf, width = 3600L,
      rowThreshold = 300L, workThreshold = Long.MaxValue)
    assert(hotByRows.toSeq.map(_.toString).sorted == Seq("burst", "sparse"))
    assert(SkewStats.cachedEntries == 2)
    // null-ts rows join no frame: an entity that is all-null never
    // classifies hot, and null rows don't inflate a live entity's count
    val withNulls = df.select(col("entity_id"),
      org.apache.spark.sql.functions
        .when(col("entity_id") === "sparse", null).otherwise(col("ts")).as("ts"))
    val hotNulls = SkewStats.hotEntitiesByWindowWork(
      withNulls, "entity_id", "ts", ordOf, width = 3600L,
      rowThreshold = 250L, workThreshold = Long.MaxValue)
    assert(hotNulls.toSeq == Seq("burst"))
    SkewStats.invalidate()
  }

  test("hotEntitiesByWindowWork caps the driver-side set at the worst offenders") {
    val s = spark
    import s.implicits._
    SkewStats.invalidate()
    // 5000 dense-burst entities all qualify under a tiny work threshold;
    // the driver-side set must stay capped, keeping the worst offender
    val rows = (0 until 5000).flatMap(e =>
      Seq((s"e$e", 1L), (s"e$e", 2L))) ++
      (0 until 10).map(i => ("whale", i.toLong))
    val df = rows.toDF("entity_id", "ts")
    val ordOf = (c: org.apache.spark.sql.Column) => c.cast("long")
    val hot = SkewStats.hotEntitiesByWindowWork(
      df, "entity_id", "ts", ordOf, width = 3600L,
      rowThreshold = Long.MaxValue, workThreshold = 1L)
    assert(hot.length == SkewStats.maxWorkHotSet,
      s"expected cap ${SkewStats.maxWorkHotSet}, got ${hot.length}")
    assert(hot.contains("whale"), "the highest-work entity must survive the cap")
    SkewStats.invalidate()
  }

  test("a full memo evicts ONE entry, not the whole cache") {
    SkewStats.invalidate()
    val cap = SkewStats.maxEntries
    // fill to cap through the policy seam (no count jobs needed)
    (1 to cap).foreach(i => SkewStats.memoize((i, "e", 1L), Array("x")))
    assert(SkewStats.cachedEntries == cap)
    // the cap+1-th key displaces exactly one victim — the remaining
    // cap-1 memoized classifications survive
    SkewStats.memoize((cap + 1, "e", 1L), Array("y"))
    assert(SkewStats.cachedEntries == cap)
    SkewStats.invalidate()
  }

  test("Tables.invalidate drops the skew memo (in-place rewrite hook)") {
    val s = spark
    import s.implicits._
    SkewStats.invalidate()
    SkewStats.hotEntities(Seq("a", "a", "b").toDF("entity_id"), "entity_id", 2L)
    assert(SkewStats.cachedEntries == 1)
    // rewriting any cached path must also drop skew classifications:
    // the re-read plan can hash equal while the data changed
    Tables.invalidate(s, "/no/such/path")
    assert(SkewStats.cachedEntries == 0)
  }
}
