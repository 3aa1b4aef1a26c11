package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** The native codegen dot product must be bit-identical to the
  * interpreted higher-order-function fold (which is itself verified
  * bit-identical to DuckDB's list_sum in the oracle gate) — same
  * left-to-right double accumulation, just compiled.
  */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private def vecs = {
    val s = spark
    import s.implicits._
    // adversarial floats: denormals-ish, negatives, catastrophic
    // cancellation candidates, plus a length mismatch
    Seq(
      (1L, Array(1.0f, 2.5f, -3.25f, 1e-7f), Array(4.0f, -0.5f, 2.0f, 1e7f)),
      (2L, Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)),
      (3L, Array(1e8f, 1.0f, -1e8f), Array(1.0f, 1.0f, 1.0f)),
      (4L, Array.empty[Float], Array(1.0f)),
      (5L, Array(2.0f, 3.0f), Array(5.0f))) // length mismatch: shorter wins
      .toDF("id", "a", "b")
  }

  test("every vector kernel: interpreted eval equals generated code bit-for-bit") {
    // the classic custom-Expression bug class is nullSafeEval and
    // doGenCode drifting apart — force both factory modes over random
    // adversarial vectors and compare collected results exactly
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 16
    def fvec() = Array.fill(dim)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(6) - 3).toFloat)
    val rows = (1L to 64L).map(i => (i, fvec(), fvec()))
    val matrix = Array.fill(4)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    val codebooks = Array.fill(4)(Array.fill(8)(Array.fill(dim / 4)(rnd.nextDouble() - 0.5)))
    val signs = Array.fill(8)(Array.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
    def results(): Seq[org.apache.spark.sql.Row] = {
      val df = rows.toDF("id", "a", "b").select(
        col("id"),
        graft.functions.FloatVectorDot(col("a"), col("b")).as("dot"),
        graft.functions.FloatVectorArgmaxDot(col("a"), matrix).as("am"),
        graft.functions.FloatVectorTopCentroids(col("a"), matrix, 2).as("tc"),
        graft.functions.FloatVectorHyperplaneSignature(col("a"), matrix).as("sig"),
        graft.functions.FloatVectorPqEncode(col("a"), codebooks).as("pq"),
        graft.functions.FloatVectorSignProject(col("a"), signs).as("sp"),
        graft.functions.Hashing.md5Long60(col("id").cast("string")).as("h"))
      df.orderBy("id").collect().toSeq
    }
    val genMode = results()
    val (ws0, fm0) = (s.conf.get("spark.sql.codegen.wholeStage"),
      s.conf.getOption("spark.sql.codegen.factoryMode").getOrElse("FALLBACK"))
    try {
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = results()
      assert(interp.map(_.toString) == genMode.map(_.toString))
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", ws0)
      s.conf.set("spark.sql.codegen.factoryMode", fm0)
    }
  }

  test("graft_dot equals the interpreted HOF fold bit-for-bit") {
    // equal-length rows only: zip_with null-pads a shorter array (→
    // NULL), graft_dot takes min length like the engine's former UDF.
    // Embeddings are fixed-width, so only the equal-length contract is
    // oracle-facing.
    val rows = vecs
      .filter(size(col("a")) === size(col("b")))
      .select(
        Similarity.dotFast(col("a"), col("b")).as("fast"),
        Similarity.dot(col("a"), col("b")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"fast=${r.getDouble(0)} ref=${r.getDouble(1)}")
    }
  }

  test("null array propagates null") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
    val out = df.select(Similarity.dotFast(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("graft_dot is callable from SQL after extension registration") {
    GraftExtensions.ensureRegistered(spark)
    vecs.createOrReplaceTempView("vecs_sql_test")
    val out = spark
      .sql("SELECT id, graft_dot(a, b) AS d FROM vecs_sql_test ORDER BY id")
      .collect()
    assert(out.length == 5)
    assert(out(1).getDouble(1) == (0.1f.toDouble * 0.3f.toDouble +
      0.2f.toDouble * 0.2f.toDouble + 0.3f.toDouble * 0.1f.toDouble))
    assert(out(3).getDouble(1) == 0.0) // empty side → empty zip → 0
  }

  test("sign projection: NaN poisons the scale like array_max; zero/empty/short vectors") {
    val s = spark
    import s.implicits._
    val signs = Array(Array(1L, -1L, 1L), Array(-1L, 1L, 1L))
    val df = Seq(
      (1L, Array(2.0f, -4.0f, 1.0f)),   // plain: scale 127/4
      (2L, Array(1.0f, Float.NaN, 1.0f)), // NaN → scale NaN → all-zero levels
      (3L, Array(0.0f, 0.0f, 0.0f)),    // zero vector → scale 0 → all zero
      (4L, Array.empty[Float]),         // empty → all-zero sums
      (5L, Array(3.0f)))                // shorter than inDims: missing read as absent
      .toDF("id", "v")
      .select(col("id"),
        graft.functions.FloatVectorSignProject(col("v"), signs).as("p"))
      .orderBy("id").collect()
    def p(i: Int) = df(i).getSeq[Float](1)
    // id 1: q = (64, -127, 32) → j0: 64+127+32 = 223; j1: -64-127+32 = -159
    assert(p(0) == Seq(223f, -159f))
    assert(p(1) == Seq(0f, 0f)) // NaN-poisoned, matches the old array_max plan
    assert(p(2) == Seq(0f, 0f))
    assert(p(3) == Seq(0f, 0f))
    // id 5: q = (127) → j0: 127; j1: -127
    assert(p(4) == Seq(127f, -127f))
  }

  test("non-array input is rejected at analysis") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "nope")).toDF("id", "a")
    intercept[Exception] {
      df.select(Similarity.dotFast(col("a"), col("a"))).collect()
    }
  }
}
