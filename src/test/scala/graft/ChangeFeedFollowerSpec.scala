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

  test("V2 follower crash-recovery: admission control + checkpoint restart converge exactly-once") {
    // The composed property the two features promise separately:
    // a cdc follower N=4 commits behind with maxVersionsPerBatch=1 is
    // KILLED mid-catch-up (crash at a batch boundary — the
    // (streamId, batchId) watermark covers the mid-commit replay case,
    // GraftDataSourceSpec "append mode accumulates versions
    // exactly-once"), restarted from its checkpoint, and must
    // (a) converge to the source exactly (exceptAll both ways empty),
    // (b) take exactly 1 snapshot + ceil(N/max)=4 catch-up batches
    //     across ALL runs, never re-delivering a consumed offset.
    val srcRoot = java.nio.file.Files
      .createTempDirectory("graft_cfr_src").toString
    val repRoot = java.nio.file.Files
      .createTempDirectory("graft_cfr_rep").toString
    val ck = java.nio.file.Files
      .createTempDirectory("graft_cfr_ck").toString
    val src = new FeatureStore(spark, srcRoot)
    src.register("t", sampleFeatures)

    def start() = spark.readStream.format("graft")
      .option("root", srcRoot).option("table", "t")
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream.format("graft")
      .option("root", repRoot).option("table", "t")
      .option("mode", "cdc")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()

    // run 1: deliver the v1 snapshot, then the follower goes offline
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // 4 commits land while it is down: appends, a row delete, an append
    src.registerAppend("t", sampleFeatures.limit(1)
      .withColumn("entity_id", lit("user_7")))
    src.registerAppend("t", sampleFeatures
      .withColumn("entity_id", concat(col("entity_id"), lit("_b"))))
    src.deleteRows("t", col("entity_id") === "user_2_b")
    src.registerAppend("t", sampleFeatures.limit(1)
      .withColumn("entity_id", lit("user_9")))
    assert(src.getTableInfo("t").version == 5)

    // run 2: KILLED mid-catch-up — stopped as soon as the first
    // catch-up batch reports progress (wherever the kill lands, the
    // checkpoint-log assertions below stay exact)
    val q2 = start()
    try await(60000)(q2.recentProgress.exists(_.numInputRows > 0))
    finally q2.stop()

    // run 3: restart from the checkpoint, drain the rest
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()

    // the checkpoint's logs are the deterministic truth, immune to
    // where the kill landed (a replayed batch reuses its batch id):
    // exactly 1 snapshot + ceil(4/max)=4 catch-up batches committed,
    // and each admitted offset advanced by exactly ONE version
    val commits = new java.io.File(ck, "commits").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt).sorted
    assert(commits.toSeq == (0 to 4),
      s"expected batch ids 0..4 committed once each, got ${commits.toSeq}")
    val offsets = new java.io.File(ck, "offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      .map(f => scala.io.Source.fromFile(f).getLines().toSeq.last.trim.toInt)
    assert(offsets.toSeq == (1 to 5),
      s"admission control must advance one version per batch, got ${offsets.toSeq}")

    val rep = new FeatureStore(spark, repRoot)
    val want = src.getVersion("t", 5)
      .select("entity_id", "timestamp", "feature_a", "feature_b")
    val got = rep.getVersion("t", rep.getTableInfo("t").version)
      .select("entity_id", "timestamp", "feature_a", "feature_b")
    assert(want.exceptAll(got).isEmpty && got.exceptAll(want).isEmpty,
      "replica did not converge to the source")
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
