package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.store.PointInTime

/** Model-based ScalaCheck properties for the temporal kernels
  * (SURVEY.md §5 items a-c, strengthened): for random feature tables and
  * spines, the distributed result must equal a straightforward Scala
  * reference model exactly — which subsumes "no future leakage",
  * "argmax among eligible", and "as-of row count <= spine count".
  */
object PointInTimeProps extends Properties("PointInTime") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxSize(40)

  private lazy val spark = SparkTestBase.session

  private case class R(e: String, day: Int, v: Long, seq: Long)

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private val genRows: Gen[List[R]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(
      n,
      for {
        e <- Gen.oneOf("a", "b", "c", "d")
        day <- Gen.choose(1, 25)
        v <- Gen.choose(0L, 99L)
      } yield R(e, day, v, 0L))
  } yield rows.zipWithIndex.map { case (r, i) => r.copy(seq = i.toLong) }

  private def toDF(rows: List[R]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map(r => (r.e, ts(r.day), r.v, r.seq))
      .toDF("entity_id", "timestamp", "v", "seq")
  }

  private def latestModel(rows: List[R]): Map[String, R] =
    rows.groupBy(_.e).map { case (e, rs) => e -> rs.maxBy(r => (r.day, r.seq)) }

  property("pitSnapshot equals reference model") = forAll(
    genRows,
    Gen.choose(1, 25),
    Gen.someOf("a", "b", "c", "d", "ghost")) { (rows, cutoff, idsRaw) =>
    val ids = idsRaw.toList
    val got = PointInTime
      .pitSnapshot(
        toDF(rows), lit(ts(cutoff)),
        entityIds = Some(ids), tieBreakCols = Seq("seq"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = latestModel(rows.filter(r => r.day <= cutoff && ids.contains(r.e)))
      .values
      .map(r => (r.e, ts(r.day), r.v, r.seq))
      .toSet
    got == want
  }

  property("pitSnapshotForEntities (semi-join path) equals model") = forAll(
    genRows,
    Gen.choose(1, 25),
    Gen.someOf("a", "b", "c", "d", "ghost")) { (rows, cutoff, idsRaw) =>
    val s = spark
    import s.implicits._
    val ids = idsRaw.toList
    val entityDf = (if (ids.isEmpty) List("none") else ids).toDF("entity_id")
    val got = PointInTime
      .pitSnapshotForEntities(
        toDF(rows), lit(ts(cutoff)), entityDf, tieBreakCols = Seq("seq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .toSet
    val eligible = ids.toSet ++ (if (ids.isEmpty) Set("none") else Set.empty)
    val want = latestModel(rows.filter(r => r.day <= cutoff && eligible.contains(r.e)))
      .values
      .map(r => (r.e, r.v, r.seq))
      .toSet
    got == want
  }

  private val genSpine: Gen[List[(String, Int)]] = Gen.listOf(
    for {
      e <- Gen.oneOf("a", "b", "c", "d", "ghost")
      day <- Gen.choose(1, 25)
    } yield (e, day))

  property("asOfJoin equals per-spine-row model (incl. duplicates)") = forAll(
    genRows, genSpine) { (rows, spine) =>
    val s = spark
    import s.implicits._
    val spineDf = (if (spine.isEmpty) List(("z", 1)) else spine)
      .map { case (e, d) => (e, ts(d)) }
      .toDF("entity_id", "timestamp")
    val got = PointInTime
      .asOfJoin(spineDf, toDF(rows), tieBreakCols = Seq("seq"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .toList
      .sorted
    val effSpine = if (spine.isEmpty) List(("z", 1)) else spine
    val want = effSpine
      .flatMap { case (e, d) =>
        val eligible = rows.filter(r => r.e == e && r.day <= d)
        if (eligible.isEmpty) None
        else {
          val m = eligible.maxBy(r => (r.day, r.seq))
          Some((m.e, m.v, m.seq))
        }
      }
      .sorted
    (got == want) && got.length <= effSpine.length
  }

  property("asOfJoinLeft equals null-extending per-spine-row model") = forAll(
    genRows, genSpine) { (rows, spine) =>
    val s = spark
    import s.implicits._
    val effSpine = if (spine.isEmpty) List(("z", 1)) else spine
    val spineDf = effSpine.map { case (e, d) => (e, ts(d)) }
      .toDF("entity_id", "timestamp")
    val got = PointInTime
      .asOfJoinLeft(spineDf, toDF(rows), "f_", tieBreakCols = Seq("seq"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.get(r.fieldIndex("f_v"))).map(_.asInstanceOf[Long]),
        Option(r.get(r.fieldIndex("f_seq"))).map(_.asInstanceOf[Long])))
      .toList
      .sorted
    val want = effSpine
      .map { case (e, d) =>
        val eligible = rows.filter(r => r.e == e && r.day <= d)
        val m = if (eligible.isEmpty) None
          else Some(eligible.maxBy(r => (r.day, r.seq)))
        (e, ts(d), m.map(_.v), m.map(_.seq))
      }
      .sorted
    got == want // every spine row present exactly once, matched or null
  }

  property("asOfJoinBucketed (skew-aware) equals asOfJoin") = forAll(
    genRows, genSpine, Gen.oneOf(3600L, 86400L, 86400L * 7)) { (rows, spine, bucketSec) =>
    val s = spark
    import s.implicits._
    val spineDf = (if (spine.isEmpty) List(("z", 1)) else spine)
      .map { case (e, d) => (e, ts(d)) }
      .toDF("entity_id", "timestamp")
    val df = toDF(rows)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2), r.getLong(3))
    val a = PointInTime.asOfJoin(spineDf, df, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    val b = PointInTime
      .asOfJoinBucketed(spineDf, df, bucketSec, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    a == b
  }

  property("asOfJoinSkewHybrid equals asOfJoin at any hot threshold") = forAll(
    genRows, genSpine, Gen.oneOf(1L, 2L, 3L, 1000L)) { (rows, spine, hotThRaw) =>
    // threshold 1 routes EVERY entity through the bucketed path,
    // 1000 routes none, 2-3 split the population — all must agree.
    // max(1) guards ScalaCheck shrinking, which explores values outside
    // the generator domain (0 trips the operator's validation).
    val hotTh = math.max(1L, hotThRaw)
    val s = spark
    import s.implicits._
    val spineDf = (if (spine.isEmpty) List(("z", 1)) else spine)
      .map { case (e, d) => (e, ts(d)) }
      .toDF("entity_id", "timestamp")
    val df = toDF(rows)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2), r.getLong(3))
    val a = PointInTime.asOfJoin(spineDf, df, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    val b = PointInTime
      .asOfJoinSkewHybrid(spineDf, df, 86400L, hotRowThreshold = hotTh,
        tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    a == b
  }

  property("asOfJoinNative (custom operator) equals asOfJoin") = forAll(
    genRows, genSpine) { (rows, spine) =>
    val s = spark
    import s.implicits._
    val spineDf = (if (spine.isEmpty) List(("z", 1)) else spine)
      .map { case (e, d) => (e, ts(d)) }
      .toDF("entity_id", "timestamp")
    val df = toDF(rows)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2), r.getLong(3))
    val a = PointInTime.asOfJoin(spineDf, df, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    val b = PointInTime.asOfJoinNative(spineDf, df, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    a == b
  }

  property("asOfJoin merge and join formulations agree") = forAll(
    genRows, genSpine) { (rows, spine) =>
    val s = spark
    import s.implicits._
    val spineDf = (if (spine.isEmpty) List(("z", 1)) else spine)
      .map { case (e, d) => (e, ts(d)) }
      .toDF("entity_id", "timestamp")
    val df = toDF(rows)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2), r.getLong(3))
    val a = PointInTime.asOfJoin(spineDf, df, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    val b = PointInTime.asOfJoinViaJoin(spineDf, df, tieBreakCols = Seq("seq"))
      .collect().map(key).toList.sorted
    a == b
  }
}
