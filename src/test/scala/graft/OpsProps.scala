package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.{Dedup, Sampling}

/** Cross-operator invariants for the sampling and incremental-dedup
  * families.
  */
object OpsProps extends Properties("Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxSize(40)

  private lazy val spark = SparkTestBase.session

  private val genStrata: Gen[List[(Long, String)]] = for {
    nStrata <- Gen.choose(2, 4)
    sizes <- Gen.listOfN(nStrata, Gen.choose(1, 60))
  } yield {
    var id = 0L
    sizes.zipWithIndex.flatMap { case (n, s) =>
      (1 to n).map { _ => id += 1; (id, s"s$s") }
    }
  }

  private def toDF(rows: List[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source")
  }

  property("temperatureSample nests: hotter (smaller 1/T) samples are subsets") =
    forAll(genStrata, Gen.choose(0, 1000), Gen.choose(0, 1000)) { (rows, a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val df = toDF(rows)
      def ids(invT: Int) = Sampling.temperatureSample(df, invT)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val hotter = ids(lo) // lower 1/T = higher temperature = smaller rates
      val cooler = ids(hi)
      hotter.subsetOf(cooler) && ids(1000).size == rows.size
    }

  private val genCorpus: Gen[List[(Long, List[String])]] = for {
    n <- Gen.choose(2, 10)
    docs <- Gen.listOfN(
      n,
      Gen.choose(3, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "ee"))))
  } yield docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks) }

  property("incrementalNearDupPairs agrees with the all-pairs exact op on its output") =
    forAll(genCorpus) { docs =>
      val s = spark
      import s.implicits._
      val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val incoming = df.filter($"doc_id" % 2 === 0)
      val corpus = df.filter($"doc_id" % 2 =!= 0)
      val inc = Dedup.incrementalNearDupPairs(incoming, corpus, threshold = 0.3)
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1))) -> r.getDouble(2)).toMap
      // every reported pair must appear in the all-pairs exact op with
      // the IDENTICAL jaccard (incremental is a restriction, not an
      // approximation, of the verification arithmetic)
      val all = Dedup.ngramJaccardPairs(df, n = 3, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      inc.forall { case (pair, j) => all.get(pair).contains(j) }
    }
}
