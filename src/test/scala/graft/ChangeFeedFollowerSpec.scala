package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.FeatureStore
import graft.streaming.ChangeFeedFollower

/** Change-feed follower: in-order, exactly-once-per-version delivery
  * of each commit's change rows, with a loud failure when the follower
  * falls behind retention.
  */
class ChangeFeedFollowerSpec extends AnyFunSuite with SparkTestBase {

  private def await(deadlineMillis: Long = 15000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMillis
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(25)
    assert(cond, "condition not met within the deadline")
  }

  test("delivers each committed version's changes exactly once, in order") {
    val store = new FeatureStore(spark)
    val jan = sampleFeatures.filter(col("timestamp") < lit(ts("2024-02-01")))
    val feb = sampleFeatures.filter(col("timestamp") >= lit(ts("2024-02-01")))
    store.register("t", jan)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]
    val follower = ChangeFeedFollower.start(store, "t",
      fromVersion = 1, pollMillis = 50) { (df, v) =>
      seen.add(v -> df.count()); ()
    }
    try {
      store.registerAppend("t", feb)
      store.deleteRows("t", col("feature_a") === 2.0)
      await()(seen.size == 2)
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toList ==
        List(2 -> feb.count(), 3 -> 1L))
      assert(follower.position == 3)
    } finally follower.close()
  }

  test("fromVersion 0 replays the feed since creation") {
    val store = new FeatureStore(spark)
    store.register("t", sampleFeatures)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val follower = ChangeFeedFollower.start(store, "t",
      fromVersion = 0, pollMillis = 50) { (df, v) =>
      if (v == 1) assert(df.count() == 5) // creation inserts
      seen.add(v); ()
    }
    try {
      await()(seen.contains(1))
    } finally follower.close()
  }

  test("a follower beyond the retention window fails loudly, not silently") {
    val store = new FeatureStore(spark, maxVersions = 2)
    store.register("t", singleRow(1.0))
    store.register("t", singleRow(2.0))
    store.register("t", singleRow(3.0)) // version 1 pruned
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val follower = ChangeFeedFollower.start(store, "t",
      fromVersion = 0, pollMillis = 50, onError = err.set) { (_, _) => () }
    try {
      await()(err.get != null)
      assert(err.get.isInstanceOf[graft.store.FeatureTableNotFoundError])
    } finally follower.close()
  }
}
