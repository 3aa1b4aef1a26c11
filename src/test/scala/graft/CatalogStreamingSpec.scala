package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.store.FeatureStore

/** Streaming through the SQL catalog: `spark.readStream.table` emits
  * appended rows in the table's own schema (Delta-shaped
  * skipChangeCommits policy for mutating commits), and
  * `writeStream.toTable` lands micro-batches through the same
  * exactly-once sink as `format("graft")`.
  */
class CatalogStreamingSpec extends AnyFunSuite with SparkTestBase {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_catstream_$tag").toString

  private def cat(root: String): String = {
    val name = "gcs_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    spark.conf.set(
      s"spark.sql.catalog.$name", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("readStream.table: snapshot, then each append, in the table's schema") {
    val root = freshRoot("read")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures) // 5 rows
    val c = cat(root)
    val ck = java.nio.file.Files.createTempDirectory("graft_catstream_ck").toString
    // a FILE sink: restartable from its checkpoint (memory sink is not)
    val out = java.nio.file.Files.createTempDirectory("graft_catstream_out").toString
    def sunk() = spark.read.parquet(out)
    val q = spark.readStream
      .table(s"$c.feat")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      // the table's OWN schema — no feed columns
      assert(sunk().schema == store.getTableSchema("feat"))
      assert(sunk().count() == 5)

      store.registerAppend("feat", sampleFeatures.limit(2))
      q.processAllAvailable()
      assert(sunk().count() == 7)

      // a mutating commit has no append-only representation: the
      // stream fails loudly and names the commit
      store.deleteRows("feat", col("feature_b") === 100L)
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m =>
        m.contains("skipChangeCommits") && m.contains("delete")),
        messages(e).mkString(" | "))
    } finally q.stop()

    // restart from the SAME checkpoint with skipChangeCommits: the
    // mutating commit is skipped whole, later appends stream on
    store.registerAppend("feat", sampleFeatures.limit(1))
    val q2 = spark.readStream
      .option("skipChangeCommits", "true")
      .table(s"$c.feat")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q2.processAllAvailable()
      // 7 pre-failure rows + the 1 post-delete append; the delete
      // commit contributed nothing (its removals are NOT replayed)
      assert(sunk().count() == 8)
    } finally q2.stop()
  }

  test("writeStream.toTable: micro-batches land via the exactly-once sink") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = freshRoot("write")
    val store = new FeatureStore(spark, root)
    store.register("sensor",
      Seq(("u0", ts("2024-01-01"), 0.0)).toDF("entity_id", "timestamp", "value"))
    val c = cat(root)
    val ck = java.nio.file.Files.createTempDirectory("graft_catstream_wck").toString
    val source = MemoryStream[(String, Timestamp, Double)]
    val q = source.toDF().toDF("entity_id", "timestamp", "value")
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(0))
      .toTable(s"$c.sensor")
    try {
      source.addData(("u1", ts("2024-01-02"), 1.0), ("u2", ts("2024-01-03"), 2.0))
      q.processAllAvailable()
      store.refresh()
      assert(store.getTableInfo("sensor").rowCount == 3)
      source.addData(("u1", ts("2024-01-10"), 9.0))
      q.processAllAvailable()
      store.refresh()
      assert(store.getTableInfo("sensor").rowCount == 4)
      // served through the same PIT path as any batch-built table
      val asOf = store.get("sensor", Seq("u1"), ts("2024-01-05")).collect()
      assert(asOf.head.getAs[Double]("value") == 1.0)
    } finally q.stop()
  }
  test("readStream.table pushes filters and pruned columns into each batch") {
    val root = freshRoot("push")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures) // 5 rows, 2 entities
    val c = cat(root)
    val ck = java.nio.file.Files.createTempDirectory("graft_catstream_pck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_catstream_pout").toString
    val q = spark.readStream
      .table(s"$c.feat")
      .where(col("entity_id") === "user_1")
      .select("entity_id", "feature_b")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      // first 4 rows = 3x user_1 + 1x user_2: the user_2 row must be
      // filtered out of the delta batch
      store.registerAppend("feat", sampleFeatures.limit(4))
      q.processAllAvailable()
      val sunk = spark.read.parquet(out)
      assert(sunk.schema.fieldNames.toSet == Set("entity_id", "feature_b"))
      assert(sunk.count() == 6) // 3 snapshot + 3 delta, user_1 only
      assert(sunk.collect().forall(_.getString(0) == "user_1"))
    } finally q.stop()
  }
}
