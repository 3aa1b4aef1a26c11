package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Accuracy contracts of the probabilistic sketches — the properties the
  * DuckDB oracle cannot express (it only bit-checks the deterministic
  * pipeline): HLL's relative-error envelope and CMS's one-sided error.
  */
class SketchesSpec extends AnyFunSuite with SparkTestBase {

  private val Sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$Sf/documents.parquet")

  private lazy val tokens = docs.select(
    col("source"),
    explode(split(col("text"), " ")).as("tok"))

  test("hllDistinct: estimate within the m=64 error envelope per source") {
    val rows = Sketches
      .hllDistinct(tokens, "tok", Seq("source"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = Sketches.correctedEstimate(
        r.getAs[Double]("hll_estimate"),
        r.getAs[Long]("n_empty_buckets"),
        p = 6)
      // 1.04/sqrt(64) = 13% standard error; allow ~3 sigma (linear
      // counting handles the small-cardinality regime)
      assert(est > 0.0, s"non-positive estimate for ${r.getAs[String]("source")}")
      assert(
        math.abs(est - exact) / exact < 0.5,
        s"source ${r.getAs[String]("source")}: est $est vs exact $exact")
    }
  }

  test("hllDistinct: register sum consistent with empty-bucket count") {
    val r = Sketches
      .hllDistinct(tokens.drop("source").withColumn("g", lit(1)), "tok", Seq("g"))
      .head()
    val sumScaled = r.getAs[Long]("hll_sum_scaled")
    val nEmpty = r.getAs[Long]("n_empty_buckets")
    // each empty bucket contributes exactly 2^55; occupied buckets less
    assert(sumScaled >= nEmpty * (1L << 55))
    assert(sumScaled < 64L * (1L << 55))
    assert(nEmpty >= 0 && nEmpty <= 64)
  }

  test("hllDistinct: insensitive to duplication (sketch of a set)") {
    val once = Sketches.hllDistinct(tokens, "tok", Seq("source"))
      .select("source", "hll_sum_scaled")
    val twice = Sketches.hllDistinct(tokens.union(tokens), "tok", Seq("source"))
      .select("source", "hll_sum_scaled")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("hllDistinctAgg (typed Aggregator) equals the column formulation") {
    val a = Sketches.hllDistinct(tokens, "tok", Seq("source"))
    val b = Sketches.hllDistinctAgg(tokens, "tok", Seq("source"))
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("HLL registers skip null values in BOTH formulations (match exact_distinct)") {
    val s = spark
    import s.implicits._
    // pre-fix, a null diverged three ways: the column path minted a
    // phantom null bucket (occupying an empty slot, contributing no
    // register), the typed path decoded the null hash as the primitive
    // encoder's 0L (bucket 0 at max rank), and exact_distinct skipped
    // it — now all three agree: nulls are not values
    val withNulls = Seq(Some("a"), Some("b"), None, None).toDF("v")
      .withColumn("g", lit(1))
    val noNulls = Seq(Some("a"), Some("b")).toDF("v").withColumn("g", lit(1))
    val ref = Sketches.hllDistinct(noNulls, "v", Seq("g")).head()
    for (r <- Seq(
        Sketches.hllDistinct(withNulls, "v", Seq("g")).head(),
        Sketches.hllDistinctAgg(withNulls, "v", Seq("g")).head())) {
      assert(r.getAs[Long]("exact_distinct") == 2L)
      assert(r.getAs[Long]("hll_sum_scaled") == ref.getAs[Long]("hll_sum_scaled"))
      assert(r.getAs[Long]("n_empty_buckets") == ref.getAs[Long]("n_empty_buckets"))
    }
    // a group with ONLY nulls has an empty sketch and drops
    val onlyNulls = Seq(Option.empty[String]).toDF("v").withColumn("g", lit(1))
    assert(Sketches.hllDistinct(onlyNulls, "v", Seq("g")).isEmpty)
    assert(Sketches.hllDistinctAgg(onlyNulls, "v", Seq("g")).isEmpty)
  }

  test("a NULL group KEY is a group, not a dropped row (null-safe final join)") {
    val s = spark
    import s.implicits._
    // group key null on two rows with two distinct values: a
    // null-unsafe USING join between the exact and register sides
    // silently lost the whole group
    val df = Seq(
      (Option.empty[String], "a"), (Option.empty[String], "b"),
      (Option("g1"), "a"))
      .toDF("g", "v")
    for (out <- Seq(
        Sketches.hllDistinct(df, "v", Seq("g")),
        Sketches.hllDistinctAgg(df, "v", Seq("g")))) {
      val rows = out.collect()
        .map(r => Option(r.getString(0)) -> r.getAs[Long]("exact_distinct"))
        .toMap
      assert(rows == Map(None -> 2L, Some("g1") -> 1L), s"got $rows")
    }
  }

  test("hllRollingDistinct: merged daily registers equal the union's registers") {
    val ev = SparkEntry.eventsForNorthStar(spark, Sf)
    val rolled = Sketches
      .hllRollingDistinct(ev, "user_id", "ts",
        startDay = "2024-01-15", endDay = "2024-01-15", windowDays = 7)
      .head()
    // the same window sliced directly and sketched in one shot
    val direct = Sketches
      .hllDistinct(
        ev.filter(to_date(col("ts")).between("2024-01-09", "2024-01-15"))
          .select(lit(1).as("g"), col("user_id").cast("string").as("v")),
        "v", Seq("g"))
      .head()
    assert(rolled.getAs[Long]("hll_sum_scaled") ==
      direct.getAs[Long]("hll_sum_scaled"))
    assert(rolled.getAs[Long]("n_empty_buckets") ==
      direct.getAs[Long]("n_empty_buckets"))
    assert(rolled.getAs[Long]("exact_distinct") ==
      direct.getAs[Long]("exact_distinct"))
  }

  test("cmsHeavyHitters: never undercounts, and is exact when unambiguous") {
    val rows = Sketches
      .cmsHeavyHitters(docs, depth = 4, width = 64, k = 20)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("n_cms")
      assert(est >= exact, s"token ${r.getAs[String]("token")} undercounted")
    }
    // heavy hitters dominate their cells: the top token's estimate should
    // not be wildly inflated by collisions at this corpus size
    val top = rows.maxBy(_.getAs[Long]("n_exact"))
    assert(top.getAs[Long]("n_cms") < top.getAs[Long]("n_exact") * 3)
  }

  test("cmsHeavyHitters: wider sketch never increases estimates") {
    val narrow = Sketches.cmsHeavyHitters(docs, depth = 4, width = 16, k = 10)
      .select(col("token"), col("n_cms").as("n_narrow"))
    val wide = Sketches.cmsHeavyHitters(docs, depth = 4, width = 256, k = 10)
      .select(col("token"), col("n_cms").as("n_wide"))
    val joined = narrow.join(wide, "token").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_wide") <= r.getAs[Long]("n_narrow"))
    }
  }
}
