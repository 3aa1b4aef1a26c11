package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{BucketedTables, PointInTime}

/** The point of bucketed registration is a PLAN property: per-entity
  * aggregation over a bucketed feature table must not shuffle — the
  * write-time bucket exchange already co-located each entity. A value
  * check pins that the layout change is semantically invisible.
  */
class BucketedTablesSpec extends AnyFunSuite with SparkTestBase {

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] =
    p.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case e: ShuffleExchangeLike => Seq(e)
    }.flatten

  test("latest-per-entity over a bucketed table plans without a shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    BucketedTables.register(
      sampleFeatures, "bucketed_feats", s"$dir/feats", numBuckets = 4)
    val t = BucketedTables.table(spark, "bucketed_feats")

    val latest = PointInTime.latestPerEntity(t)
    // inspect BEFORE executing (post-run AQE wraps leaves in query stages)
    assert(shuffles(latest.queryExecution.executedPlan).isEmpty,
      "bucketed scan must satisfy the aggregation's distribution")
    // the same aggregation over the raw frame DOES shuffle — the bucket
    // layout, not the data, is what removed the exchange
    assert(shuffles(
      PointInTime.latestPerEntity(sampleFeatures)
        .queryExecution.executedPlan).nonEmpty)

    // layout is semantically invisible
    val got = latest.collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("timestamp"),
        r.getAs[Double]("feature_a"))).toSet
    val want = PointInTime.latestPerEntity(sampleFeatures).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("timestamp"),
        r.getAs[Double]("feature_a"))).toSet
    assert(got == want)
  }

  test("latest-k over a bucketed table also skips its shuffle") {
    // register independently — tests must not rely on suite ordering
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed_k").toString
    BucketedTables.register(
      sampleFeatures, "bucketed_feats_k", s"$dir/feats", numBuckets = 4)
    val t = BucketedTables.table(spark, "bucketed_feats_k")
    val topk = PointInTime.latestKPerEntity(t, k = 2)
    assert(shuffles(topk.queryExecution.executedPlan).isEmpty)
    assert(topk.count() > 0)
  }
}
