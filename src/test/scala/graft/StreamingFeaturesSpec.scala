package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingFeatures
import graft.streaming.StreamingFeatures.{FeatureEvent, LatestState}

/** Windowed aggregates + stateful latest-state streams over memory
  * sources, including out-of-order arrival.
  */
class StreamingFeaturesSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String): Timestamp = ts(s)

  test("streaming embedding dedup flags batch vectors against a static IVF index") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 4 clusters on disjoint coordinate blocks: within-cluster cosine is
    // exactly 1, cross-cluster exactly 0
    def vec(c: Int, scale: Float): Array[Float] =
      Array.tabulate(8)(d => if (d / 2 == c) (d % 2 + 1f) * scale else 0f)
    val corpus = (0L until 16L).map(i => (i, vec((i % 4).toInt, 1f + i / 4)))
      .toDF("vec_id", "embedding")
    val cents = graft.ops.Similarity.ivfCentroids(corpus, numCentroids = 4)
    val index = graft.ops.Similarity.buildIvfIndex(corpus, numCentroids = 4).cache()
    val source = MemoryStream[(Long, Array[Float])]
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val query = StreamingFeatures.embeddingDedupStream(
      source.toDF().toDF("vec_id", "embedding"), index, cents,
      threshold = 0.95, nProbe = 4) { (pairs, _) =>
      flagged.synchronized {
        flagged ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    }
    try {
      source.addData((100L, vec(1, 9f))) // dup of cluster 1 (ids 1,5,9,13)
      query.processAllAvailable()
      // 45-degree blend of clusters 2 and 3: cosine ~0.7 to each — novel
      val blend = Array.tabulate(8)(d => if (d >= 4) (d % 2 + 1f) else 0f)
      source.addData((101L, blend))
      query.processAllAvailable()
      val got = flagged.synchronized(flagged.toList)
      assert(got.map(p => (p._1, p._2)).toSet ==
        Set(1L, 5L, 9L, 13L).map(c => (100L, c)))
      // scaled-identical directions: cosine 1 up to sqrt rounding (1 ulp)
      assert(got.forall(_._3 > 0.999999))
    } finally {
      query.stop()
      index.unpersist()
    }
  }

  test("streaming incremental dedup flags batch docs against a static corpus index") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val corpus = Seq(
      (1L, "a b c d e f g h"),
      (2L, "z y x w v u t s")).toDF("doc_id", "text")
    val index = graft.ops.Dedup.buildNearDupIndex(corpus)
    index.signatures.cache(); index.shingleSets.cache()
    val source = MemoryStream[(Long, String)]
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val query = StreamingFeatures.incrementalDedupStream(
      source.toDF().toDF("doc_id", "text"), index, threshold = 0.5) { (pairs, _) =>
      flagged.synchronized {
        flagged ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    }
    try {
      source.addData((10L, "a b c d e f g h")) // dup of corpus doc 1
      query.processAllAvailable()
      source.addData((11L, "nothing like anything stored before now"))
      source.addData((12L, "z y x w v u t s")) // dup of corpus doc 2
      query.processAllAvailable()
      assert(flagged.synchronized(flagged.toSet) ==
        Set((10L, 1L, 1.0), (12L, 2L, 1.0)))
    } finally {
      query.stop()
      index.signatures.unpersist(); index.shingleSets.unpersist()
    }
  }

  test("windowed aggregates per entity with sliding windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[(String, Timestamp, Double)]
    val agg = StreamingFeatures.windowedAggregates(
      source.toDF().toDF("entity_id", "timestamp", "value"),
      windowDuration = "10 days",
      slideDuration = "5 days")
    val query = agg.writeStream
      .format("memory")
      .queryName("win_agg")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(
        ("u1", t("2024-01-02 00:00:00"), 1.0),
        ("u1", t("2024-01-04 00:00:00"), 2.0),
        ("u2", t("2024-01-03 00:00:00"), 5.0))
      query.processAllAvailable()
      // push the watermark far forward so earlier windows close and emit
      source.addData(("u3", t("2024-03-01 00:00:00"), 0.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT entity_id, n_events, sum_value FROM win_agg " +
          "WHERE entity_id = 'u1' ORDER BY window_start").collect()
      // Jan 2 + Jan 4 fall in two overlapping 10-day windows each
      assert(rows.nonEmpty)
      assert(rows.map(_.getAs[Long]("n_events")).max == 2)
      assert(rows.map(_.getAs[Double]("sum_value")).max == 3.0)
    } finally query.stop()
  }

  test("latestState keeps PIT semantics under out-of-order arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[FeatureEvent]
    val query = StreamingFeatures
      .latestState(source.toDS(), lateness = "365 days")
      .writeStream
      .format("memory")
      .queryName("latest_state")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(FeatureEvent("u1", t("2024-01-10"), 10.0))
      query.processAllAvailable()
      source.addData(
        FeatureEvent("u1", t("2024-01-05"), 5.0), // older — must not regress state
        FeatureEvent("u2", t("2024-01-07"), 7.0))
      query.processAllAvailable()
      source.addData(FeatureEvent("u1", t("2024-01-20"), 20.0)) // newer — updates
      query.processAllAvailable()

      val out = s.sql("SELECT * FROM latest_state").as[LatestState].collect()
      // last emitted row per entity is the live state
      val finalState = out.groupBy(_.entity_id).map { case (e, rows) =>
        e -> rows.maxBy(_.timestamp.getTime)
      }
      assert(finalState("u1").value == 20.0)
      assert(finalState("u1").timestamp == t("2024-01-20"))
      assert(finalState("u2").value == 7.0)
      // the out-of-order older u1 row never surfaced
      assert(!out.exists(r => r.entity_id == "u1" && r.value == 5.0))
    } finally query.stop()
  }

  test("latestState equal-timestamp tie-break is batching-independent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[FeatureEvent]
    val query = StreamingFeatures
      .latestState(source.toDS(), lateness = "365 days")
      .writeStream
      .format("memory")
      .queryName("latest_state_tie")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // within ONE batch, max-(timestamp, value) wins: 5.0 holds
      source.addData(
        FeatureEvent("u1", t("2024-01-10"), 5.0),
        FeatureEvent("u1", t("2024-01-10"), 3.0))
      query.processAllAvailable()
      // the SAME equal-timestamp lower value in a LATER batch must not
      // replace the held state — the served value would then depend on
      // micro-batch boundaries and regress on replay
      source.addData(FeatureEvent("u1", t("2024-01-10"), 3.0))
      query.processAllAvailable()
      val out = s.sql("SELECT * FROM latest_state_tie").as[LatestState].collect()
      assert(out.last.value == 5.0, out.mkString(","))
      // an equal-timestamp HIGHER value still advances
      source.addData(FeatureEvent("u1", t("2024-01-10"), 8.0))
      query.processAllAvailable()
      val out2 = s.sql("SELECT * FROM latest_state_tie").as[LatestState].collect()
      assert(out2.last.value == 8.0, out2.mkString(","))
    } finally query.stop()
  }

  test("intervalJoin runs stream-stream with watermarks (train/serve symmetry)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val purchases = MemoryStream[(String, Timestamp, Long)]
    val clicks = MemoryStream[(String, Timestamp, Long)]
    val joined = graft.store.WindowFeatures.intervalJoin(
      purchases.toDF().toDF("entity_id", "timestamp", "pid")
        .withWatermark("timestamp", "1 hour"),
      clicks.toDF().toDF("entity_id", "timestamp", "cid")
        .withWatermark("timestamp", "2 hours"),
      maxGapSeconds = 3600L)
    val query = joined.writeStream
      .format("memory")
      .queryName("interval_join")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      clicks.addData(
        ("u1", t("2024-01-10 11:30:00"), 1L),
        ("u1", t("2024-01-10 09:00:00"), 2L)) // too old for the purchase
      purchases.addData(("u1", t("2024-01-10 12:00:00"), 100L))
      query.processAllAvailable()
      val rows = s.sql("SELECT entity_id, l_pid, r_cid FROM interval_join")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      assert(rows == List(("u1", 100L, 1L)))
    } finally query.stop()
  }

  test("enrichWithLatest serves the newest feature row per entity, null-extended") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val snapshot = Seq(
      ("u1", t("2024-01-01"), 1.0),
      ("u1", t("2024-01-15"), 2.0), // latest for u1
      ("u2", t("2024-01-10"), 9.0))
      .toDF("entity_id", "timestamp", "score")
    val source = MemoryStream[(String, Timestamp, String)]
    val query = StreamingFeatures
      .enrichWithLatest(
        source.toDF().toDF("entity_id", "timestamp", "event_type"), snapshot)
      .writeStream
      .format("memory")
      .queryName("enriched")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(
        ("u1", t("2024-02-01"), "click"),
        ("u3", t("2024-02-01"), "view")) // no snapshot entry
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT entity_id, event_type, feature_timestamp, score " +
          "FROM enriched ORDER BY entity_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "u1")
      assert(rows(0).getAs[Timestamp]("feature_timestamp") == t("2024-01-15"))
      assert(rows(0).getAs[Double]("score") == 2.0)
      assert(rows(1).getString(0) == "u3")
      assert(rows(1).isNullAt(rows(1).fieldIndex("score"))) // null-extended
    } finally query.stop()
  }

  test("dedupStream keeps first arrival per fingerprint across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingFeatures
      .dedupStream(source.toDF().toDF("doc_id", "timestamp", "text"))
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(
        (1L, t("2024-01-01 10:00:00"), "alpha beta"),
        (2L, t("2024-01-01 10:01:00"), "gamma delta"),
        (3L, t("2024-01-01 10:02:00"), "  Alpha Beta ")) // normalized dup of 1
      query.processAllAvailable()
      source.addData(
        (4L, t("2024-01-01 11:00:00"), "alpha beta"), // cross-batch dup of 1
        (5L, t("2024-01-01 11:01:00"), "epsilon zeta"))
      query.processAllAvailable()
      val kept = s.sql("SELECT doc_id FROM dedup_stream ORDER BY doc_id")
        .collect().map(_.getLong(0)).toList
      assert(kept == List(1L, 2L, 5L))
    } finally query.stop()
  }

  test("dedupStream withinWatermark suppresses duplicates inside the delay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val query = StreamingFeatures
      .dedupStream(
        source.toDF().toDF("doc_id", "timestamp", "text"),
        withinWatermark = Some("1 hour"))
      .writeStream
      .format("memory")
      .queryName("dedup_stream_wm")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(
        (1L, t("2024-01-01 10:00:00"), "alpha beta"),
        (2L, t("2024-01-01 10:10:00"), "alpha beta")) // in-batch dup, within delay
      query.processAllAvailable()
      source.addData(
        (3L, t("2024-01-01 10:20:00"), "alpha beta")) // cross-batch, within delay
      query.processAllAvailable()
      val kept = s.sql("SELECT doc_id FROM dedup_stream_wm ORDER BY doc_id")
        .collect().map(_.getLong(0)).toList
      assert(kept == List(1L))
    } finally query.stop()
  }

  test("sessionWindows groups gap-separated bursts, streaming and batch alike") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = Seq(
      ("u1", t("2024-01-01 10:00:00"), 1.0),
      ("u1", t("2024-01-01 10:20:00"), 1.0), // within 30m gap → same session
      ("u1", t("2024-01-01 12:00:00"), 1.0), // 100m later → new session
      ("u2", t("2024-01-01 11:00:00"), 1.0))
    val source = MemoryStream[(String, Timestamp, Double)]
    val query = StreamingFeatures
      .sessionWindows(
        source.toDF().toDF("entity_id", "timestamp", "value"),
        gapDuration = "30 minutes")
      .writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData(events: _*)
      query.processAllAvailable()
      // far-future row pushes the watermark so all sessions close
      source.addData(("u9", t("2024-03-01 00:00:00"), 0.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT entity_id, session_start, n_events FROM sessions " +
          "WHERE entity_id LIKE 'u1%' OR entity_id = 'u2' " +
          "ORDER BY entity_id, session_start").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(2))).toList ==
        List(("u1", 2L), ("u1", 1L), ("u2", 1L)))

      // identical call over a batch frame: same sessions (train/serve symmetry)
      val batch = StreamingFeatures
        .sessionWindows(
          events.toDF("entity_id", "timestamp", "value"), "30 minutes")
        .orderBy("entity_id", "session_start")
        .collect()
      assert(batch.map(r => (r.getString(0), r.getAs[Long]("n_events"))).toList ==
        List(("u1", 2L), ("u1", 1L), ("u2", 1L)))
    } finally query.stop()
  }
}
