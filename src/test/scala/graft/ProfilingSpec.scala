package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profiling
import graft.store.FeatureValidationError

/** Hand-computed fixtures for the data-quality/drift operators,
  * covering the cases the oracle queries deliberately avoid (string
  * columns with null min/max, zero/total drift identities, clamped
  * bins, null handling in counts).
  */
class ProfilingSpec extends AnyFunSuite with SparkTestBase {

  test("trendCorrelation: perfect linear trend gives r = 1, constants drop") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", new Timestamp(1000L), 0.01), // x=1s, y=1 cent
      ("a", new Timestamp(2000L), 0.02),
      ("a", new Timestamp(3000L), 0.03),
      ("b", new Timestamp(1000L), 5.0), // zero value variance → dropped
      ("b", new Timestamp(2000L), 5.0))
      .toDF("g", "timestamp", "value")
    val out = Profiling.trendCorrelation(df, "g").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "a")
    assert(out.head.getAs[Long]("n") == 3L)
    // num = 3*14-6*6 = 6 = d1 = d2; the engine's exact expression tree
    // is 6/(sqrt(6)*sqrt(6)) — one ulp off algebraic 1.0, and must be
    // exactly THAT double (the oracle computes the identical tree)
    assert(out.head.getAs[Double]("trend_r") ==
      6.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
  }

  test("correlationMatrix: exact ±1 for linear pairs, no-variance pairs drop") {
    val s = spark
    import s.implicits._
    // y = 2x (r=1), z = -x (r=-1), c constant (dropped from every pair)
    val df = Seq((1L, 2L, -1L, 7L), (2L, 4L, -2L, 7L), (3L, 6L, -3L, 7L))
      .toDF("x", "y", "z", "c")
    val out = Profiling.correlationMatrix(df, Seq("x", "y", "z", "c"))
      .collect()
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) ->
        r.getAs[Double]("corr_r"))
      .toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    // the engine's tree is num/(sqrt(d1)*sqrt(d2)) over exact ints:
    // (x,y): 3*28-6*12=12, d1=3*14-36=6, d2=3*56-144=24
    assert(out(("x", "y")) == 12.0 / (math.sqrt(6.0) * math.sqrt(24.0)))
    assert(out(("x", "z")) == -6.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
    assert(out(("y", "z")) < 0)
    assert(Profiling.correlationMatrix(df, Seq("x", "y")).head()
      .getAs[Long]("n") == 3L)
  }

  test("correlationMatrix: all three accumulation tiers agree with exact BigInt Pearson") {
    val s = spark
    import s.implicits._
    // one BigInt-exact reference for any pair of columns
    def refCorr(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = BigInt(xs.size)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxx = xs.map(v => BigInt(v) * v).sum
      val syy = ys.map(v => BigInt(v) * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      // the engine's exact tree: double(num) / (sqrt(d1) * sqrt(d2))
      num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))
    }
    def check(rows: Seq[(Long, Long)]): Unit = {
      val df = rows.toDF("x", "y")
      val got = Profiling.correlationMatrix(df, Seq("x", "y")).head()
      val want = refCorr(rows.map(_._1), rows.map(_._2))
      assert(got.getAs[Double]("corr_r") == want, s"rows=$rows")
    }
    // tier 1 (fits long): small values
    check(Seq((1L, 5L), (2L, 9L), (3L, 10L), (4L, 21L)))
    // tier 2 (split accumulators): |x| ~ 2e9 < 2^31 but x*y*n >= 2^62,
    // negatives included to exercise the arithmetic-shift decomposition
    check(Seq(
      (2000000000L, 1999999999L), (-1999999998L, 1500000007L),
      (1234567890L, -1987654321L), (-1111111111L, -2000000000L),
      (1765432109L, 1876543210L)))
    // tier 3 (decimal): factors past 32 bits
    check(Seq(
      (3000000000000L, 2999999999999L), (-2999999999998L, 1500000000007L),
      (1234567890123L, -1987654321098L), (-1111111111111L, -3000000000000L)))
    // tier 3 via ANSI overflow: x is large enough that the optimistic
    // split-long DIAGONAL product hi(x)*hi(x) overflows a long PER ROW —
    // under the default Spark 4 session (spark.sql.ansi.enabled=true)
    // the optimistic aggregate throws SparkArithmeticException mid-task,
    // and the driver-side catch must route to the exact decimal(38,0)
    // recompute instead of failing the query (the sums fit decimal(38)).
    check(Seq(
      (4000000000000000000L, 1L), (-3999999999999999999L, 2L),
      (1234567890123456789L, 3L), (-2876543210987654321L, 5L)))
  }

  test("correlationMatrix: all-null and pairwise-disjoint-null columns drop, not crash") {
    val s = spark
    import s.implicits._
    // z is entirely null; x,y correlate normally — the (x,y) pair must
    // survive and every z pair must drop (SQL sum-over-nothing is null)
    val df = Seq(
      (1L, 5L, None: Option[Long]),
      (2L, 9L, None),
      (3L, 10L, None))
      .toDF("x", "y", "z")
    val out = Profiling.correlationMatrix(df, Seq("x", "y", "z")).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("x", "y")))
    // pairwise-disjoint nulls: x and y never non-null on the same row —
    // their cross-product aggregate sees no rows; pair drops
    val disjoint = Seq(
      (Some(1L), None: Option[Long]),
      (Some(2L), None),
      (None: Option[Long], Some(5L)),
      (None, Some(7L)))
      .toDF("x", "y")
    assert(Profiling.correlationMatrix(disjoint, Seq("x", "y")).isEmpty)
  }

  test("correlationMatrix is PAIRWISE-complete: partial nulls never fabricate variance") {
    val s = spark
    import s.implicits._
    // x is CONSTANT on its non-null rows: with a shared global n (3)
    // and null-skipping sums (over 2 rows), n*Σx² - (Σx)² = 3*50-100 =
    // 50 > 0 would fabricate variance and emit a bogus r — the pairwise
    // n (2) must make d1 exactly 0 and drop the pair
    val constWithNull = Seq(
      (Some(5L), Some(1L)),
      (Some(5L), Some(2L)),
      (None: Option[Long], Some(3L)))
      .toDF("x", "y")
    assert(Profiling.correlationMatrix(constWithNull, Seq("x", "y")).isEmpty)
    // and the statistics of a mixed-null pair cover exactly the
    // complete rows: (1,1),(2,2),(3,3) perfectly correlate (r = 1)
    // regardless of the interleaved one-sided nulls
    val mixed = Seq(
      (Some(1L), Some(1L)),
      (None: Option[Long], Some(9L)),
      (Some(2L), Some(2L)),
      (Some(9L), None: Option[Long]),
      (Some(3L), Some(3L)))
      .toDF("x", "y")
    val r = Profiling.correlationMatrix(mixed, Seq("x", "y")).head()
    assert(r.getAs[Long]("n") == 3L)
    // sqrt(d)*sqrt(d) is an ulp off d — the documented float tail
    assert(math.abs(r.getAs[Double]("corr_r") - 1.0) < 1e-12)
  }

  test("correlationMatrix at Long.MinValue routes to the exact path, never drops the pair") {
    val s = spark
    import s.implicits._
    // abs(Long.MinValue) wraps negative under non-ANSI arithmetic: a
    // max(abs(x))-based range would understate the magnitude, the gate
    // would wrongly hold, the overflowed try_* sums would be null, and
    // the pair would silently vanish. The min/max-based BigInt range
    // fails the gate instead and the decimal recompute emits the pair.
    val df = Seq((Long.MinValue, 1L), (1000L, 2L)).toDF("x", "y")
    val out = Profiling.correlationMatrix(df, Seq("x", "y")).collect()
    assert(out.length == 1, s"pair dropped: ${out.toSeq}")
    assert(out.head.getAs[Long]("n") == 2L)
    // two points with increasing x and y correlate exactly +1 (modulo
    // the documented sqrt float tail)
    assert(math.abs(out.head.getAs[Double]("corr_r") - 1.0) < 1e-9)
  }

  test("correlationMatrix rejects more than 16 columns (null-pattern collect bound)") {
    val s = spark
    import s.implicits._
    val df = Seq(1L).toDF("c0")
    val wide = (1 until 17).foldLeft(df)((d, i) => d.withColumn(s"c$i", col("c0")))
    val e = intercept[graft.store.FeatureValidationError] {
      Profiling.correlationMatrix(wide, (0 until 17).map(i => s"c$i"))
    }
    assert(e.getMessage.contains("at most 16"))
  }

  test("standardize: z-scores from sample std, min-max in [0,1], constants null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 5L), ("b", 5L, 5L)) // constant group
      .toDF("g", "id", "cents")
    val out = graft.ops.FeatureEncoding
      .standardize(df, "cents", "g")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Double]("z_score")),
          Option(r.getAs[java.lang.Double]("min_max"))))
      .toMap
    // group a: mean 20, sample std 10 → z = -1, 0, 1 (exact: the tree
    // divides exact integers and sqrt(100))
    assert(out(1L)._1.exists(z => math.abs(z + 1.0) < 1e-12))
    assert(out(2L)._1.exists(z => math.abs(z) < 1e-12))
    assert(out(3L)._1.exists(z => math.abs(z - 1.0) < 1e-12))
    assert(out(1L)._2.contains(0.0) && out(3L)._2.contains(1.0))
    assert(out(2L)._2.contains(0.5))
    // constant group: no variance, no range → both null
    assert(out(4L) == ((None, None)) && out(5L) == ((None, None)))
  }

  test("mergeStats: merge of partials equals stats of the union") {
    val s = spark
    import s.implicits._
    val all = Seq(
      ("a", 1L), ("a", 5L), ("a", -2L),
      ("b", 10L), ("c", 7L))
      .toDF("g", "v")
    // split so group b lives only in the left slice and c only in the
    // right — the outer-join pass-through paths are exercised
    val left = all.filter(col("v") < 7)
    val right = all.filter(col("v") >= 7)
    val merged = Profiling
      .mergeStats(
        Profiling.partialStats(left, "g", "v"),
        Profiling.partialStats(right, "g", "v"),
        "g")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_v"),
          r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))))
      .toMap
    val direct = Profiling.partialStats(all, "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_v"),
          r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))))
      .toMap
    assert(merged == direct)
  }

  private def ev(rows: (String, String, java.lang.Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq
      .map { case (e, d, v) => (e, ts(d), Option(v).map(_.doubleValue)) }
      .toDF("entity_id", "timestamp", "value")
  }

  test("profile: counts, distincts, numeric min/max; string min/max null") {
    val df = ev(
      ("a", "2024-01-01", 1.0),
      ("a", "2024-01-02", 3.0),
      ("b", "2024-01-03", null))
    val out = Profiling.profile(df, Seq("entity_id", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(out("entity_id") == ((3L, 3L, 2L, None, None)))
    assert(out("value") == ((3L, 2L, 2L, Some(1.0), Some(3.0))))
  }

  test("profile with approximate distincts stays within HLL tolerance") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i % 97)).toDF("id", "mod")
    val out = Profiling.profile(df, Seq("id", "mod"), exactDistinct = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(out("id") - 1000L) <= 50)
    assert(math.abs(out("mod") - 97L) <= 5)
  }

  test("profile rejects unknown and empty column lists") {
    val df = ev(("a", "2024-01-01", 1.0))
    intercept[FeatureValidationError](Profiling.profile(df, Seq("nope")))
    intercept[FeatureValidationError](Profiling.profile(df, Nil))
  }

  test("driftHistogram clamps out-of-range values into edge bins") {
    val df = ev(
      ("a", "2024-01-01", -5.0),  // below 0 → bin 0
      ("a", "2024-01-01", 5.0),   // bin 0
      ("a", "2024-01-20", 15.0),  // bin 1
      ("a", "2024-01-20", 999.0)) // above top → bin 2 (clamped)
    val split = lit(Timestamp.valueOf("2024-01-10 00:00:00"))
    val out = Profiling.driftHistogram(df, "value", "timestamp", split, 10.0, 3)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((0L, 2L, 0L), (1L, 0L, 1L), (2L, 0L, 1L)))
  }

  test("totalVariation: identical distributions → 0, disjoint → 1") {
    val same = Seq((0L, 2L, 4L), (1L, 3L, 6L))
    val disjoint = Seq((0L, 5L, 0L), (1L, 0L, 7L))
    val s = spark
    import s.implicits._
    def tvd(rows: Seq[(Long, Long, Long)]): Double =
      Profiling.totalVariation(rows.toDF("bin", "cnt_a", "cnt_b"))
        .collect().head.getAs[Double]("tvd")
    assert(tvd(same) == 0.0)
    assert(tvd(disjoint) == 1.0)
  }

  test("percentiles: exact interpolation per group, validation") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("b", 5L))
      .toDF("g", "v")
    val out = Profiling.percentiles(df, "v", Seq("g"),
      Seq("p50" -> 0.5, "p75" -> 0.75))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    // a: ranks at 0.5*(4-1)=1.5 → 20+0.5*10 = 25; 0.75*3=2.25 → 30+0.25*10
    assert(out("a") == ((25.0, 32.5, 4L)))
    assert(out("b") == ((5.0, 5.0, 1L)))
    intercept[FeatureValidationError](Profiling.percentiles(df, "v", Seq("g"), Nil))
    intercept[FeatureValidationError](
      Profiling.percentiles(df, "v", Seq("g"), Seq("x" -> 1.5)))
    intercept[FeatureValidationError](
      Profiling.percentiles(df, "g", Seq("g"), Seq("x" -> 0.5)))
  }

  test("freshness: whole-day staleness histogram at inclusive cutoff") {
    val df = ev(
      ("a", "2024-01-01", 1.0),
      ("a", "2024-01-09", 1.0),  // a: latest Jan 9 → 1 day stale
      ("b", "2024-01-10", 1.0),  // b: exactly at cutoff → 0 days (inclusive)
      ("c", "2024-01-02", 1.0),  // c: 8 days
      ("d", "2024-01-11", 1.0))  // d: only after cutoff → excluded
    val out = Profiling
      .freshness(df, lit(Timestamp.valueOf("2024-01-10 00:00:00")))
      .orderBy("days_stale").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(out == List((0L, 1L), (1L, 1L), (8L, 1L)))
  }

  test("keySkew ranks heavy hitters with exact per-mille shares") {
    val s = spark
    import s.implicits._
    // 10 rows: key 'h' owns 6 (600 permille), 'm' 3, 't' 1
    val df = (Seq.fill(6)("h") ++ Seq.fill(3)("m") ++ Seq("t"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "key")
    val out = Profiling.keySkew(df, Seq("key"), k = 2).orderBy("rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(out == List(
      ("key", 1, "h", 6L, 600L),
      ("key", 2, "m", 3L, 300L)))
    // ties break on the STRING value ascending — "10" < "2"
    val tied = Seq((1L, 10L), (2L, 10L), (3L, 2L), (4L, 2L)).toDF("id", "key")
    val t = Profiling.keySkew(tied, Seq("key"), k = 2).orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getString(2))).toList
    assert(t == List((1, "10"), (2, "2")))
    intercept[graft.store.FeatureValidationError](Profiling.keySkew(df, Nil, 2))
    intercept[graft.store.FeatureValidationError](Profiling.keySkew(df, Seq("key"), 0))
    intercept[graft.store.FeatureValidationError](Profiling.keySkew(df, Seq("nope"), 2))
  }
}
