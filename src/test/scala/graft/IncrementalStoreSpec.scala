package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.store._

/** Incremental (manifest-chained) registration and multi-writer catalog
  * safety — engine extensions over the reference surface (SURVEY.md
  * §7.4 risk 5).
  */
class IncrementalStoreSpec extends AnyFunSuite with SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-inc-spec-").toString

  private def rows(ids: Range, day: Int): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (s"user_$i", ts(f"2024-01-$day%02d"), i.toDouble))
      .toDF("entity_id", "timestamp", "value")
  }

  private def collected(df: DataFrame): Set[(String, java.sql.Timestamp, Double)] =
    df.select("entity_id", "timestamp", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet

  test("registerAppend writes O(delta) storage yet reproduces exact snapshots") {
    val root = freshRoot()
    val store = new FeatureStore(spark, root)
    store.register("t", rows(1 to 100, day = 1))
    store.registerAppend("t", rows(101 to 105, day = 2))

    // the v2 segment directory holds ONLY the 5 delta rows
    val seg2 = spark.read.parquet(s"$root/t/v=2")
    assert(seg2.count() == 5)

    // both versions reproduce their exact logical snapshots
    assert(store.getVersion("t", 1).count() == 100)
    val v2 = store.getVersion("t", 2)
    assert(v2.count() == 105)
    assert(collected(v2) ==
      collected(rows(1 to 100, day = 1)) ++ collected(rows(101 to 105, day = 2)))
    assert(store.getTableInfo("t").rowCount == 105)
    assert(store.getTableInfo("t").version == 2)
  }

  test("PIT reads through a chained manifest equal a full-snapshot register") {
    val rootA = freshRoot(); val rootB = freshRoot()
    val inc = new FeatureStore(spark, rootA)
    inc.register("t", rows(1 to 50, day = 1))
    inc.registerAppend("t", rows(1 to 50, day = 15))
    val full = new FeatureStore(spark, rootB)
    full.register("t",
      rows(1 to 50, day = 1).unionByName(rows(1 to 50, day = 15)))

    val ids = (1 to 50).map(i => s"user_$i")
    val a = collected(inc.get("t", ids, "2024-01-10"))
    val b = collected(full.get("t", ids, "2024-01-10"))
    assert(a == b && a.nonEmpty)
    val a2 = collected(inc.get("t", ids, "2024-02-01"))
    val b2 = collected(full.get("t", ids, "2024-02-01"))
    assert(a2 == b2 && a2.size == 50)
  }

  test("prune keeps shared base segments alive until the last referencing version leaves") {
    val root = freshRoot()
    val store = new FeatureStore(spark, root, maxVersions = 2)
    store.register("t", rows(1 to 10, day = 1)) // v1 = [1]
    store.registerAppend("t", rows(11 to 12, day = 2)) // v2 = [1,2]
    store.registerAppend("t", rows(13 to 14, day = 3)) // v3 = [1,2,3]; v1 pruned

    intercept[FeatureTableNotFoundError](store.getVersion("t", 1))
    // v2 still reads through segment 1 even though version 1 is gone
    assert(store.getVersion("t", 2).count() == 12)
    assert(store.getVersion("t", 3).count() == 14)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "t", "v=1")))
  }

  test("manifest past maxSegments compacts to a full snapshot") {
    val root = freshRoot()
    val store = new FeatureStore(spark, root)
    store.register("t", rows(1 to 10, day = 1)) // v1 = [1]
    store.registerAppend("t", rows(11 to 12, day = 2), maxSegments = 2) // v2 = [1,2]
    store.registerAppend("t", rows(13 to 15, day = 3), maxSegments = 2) // compacts: v3 = [3]

    // v3's own directory holds the WHOLE table after compaction
    assert(spark.read.parquet(s"$root/t/v=3").count() == 15)
    assert(store.getVersion("t", 3).count() == 15)
    assert(collected(store.getVersion("t", 3)) ==
      collected(rows(1 to 10, day = 1)) ++ collected(rows(11 to 12, day = 2)) ++
        collected(rows(13 to 15, day = 3)))
  }

  test("compact materializes a chained manifest as one snapshot, values unchanged") {
    val root = freshRoot()
    val store = new FeatureStore(spark, root)
    store.register("t", rows(1 to 20, day = 1))
    store.registerAppend("t", rows(21 to 25, day = 2)) // v2 = [1,2]
    val before = collected(store.getVersion("t", 2))
    val info = store.compact("t") // v3 = [3]
    assert(info.version == 3)
    assert(spark.read.parquet(s"$root/t/v=3").count() == 25)
    assert(collected(store.getVersion("t", 3)) == before)
    assert(store.getTableInfo("t").rowCount == 25)
    // already-compacted table: no-op, no new version
    assert(store.compact("t").version == 3)
  }

  test("registerAppend rejects schema drift") {
    val s = spark
    import s.implicits._
    val store = new FeatureStore(spark, freshRoot())
    store.register("t", rows(1 to 3, day = 1))
    val drifted = Seq(("user_1", ts("2024-01-02"), 1.0, "extra"))
      .toDF("entity_id", "timestamp", "value", "note")
    intercept[FeatureValidationError](store.registerAppend("t", drifted))
  }

  test("two stores on one root keep each other's tables (merge-on-save)") {
    val root = freshRoot()
    val a = new FeatureStore(spark, root)
    val b = new FeatureStore(spark, root)
    a.register("alpha", rows(1 to 3, day = 1))
    b.register("beta", rows(1 to 4, day = 1))
    val c = new FeatureStore(spark, root)
    assert(c.tableNames == Seq("alpha", "beta"))
    assert(c.getTableInfo("alpha").rowCount == 3)
    assert(c.getTableInfo("beta").rowCount == 4)
    // delete tombstones beat the merge: beta stays deleted
    assert(c.delete("beta"))
    val d = new FeatureStore(spark, root)
    assert(d.tableNames == Seq("alpha"))
  }

  test("random register/append interleavings equal full-snapshot registers (model check)") {
    // deterministic pseudo-random schedule; the model is "version v =
    // concatenation of all batches registered up to v"
    val rnd = new scala.util.Random(42)
    val root = freshRoot()
    val store = new FeatureStore(spark, root, maxVersions = 20)
    var model = Vector.empty[Vector[(Int, Int)]] // batches of (idStart, day)
    var nextId = 1
    for (step <- 1 to 6) {
      val n = 3 + rnd.nextInt(5)
      val batch = rnd.nextInt(3) // 0 = full register of model+new, 1,2 = append
      val ids = nextId until (nextId + n); nextId += n
      val day = 1 + step
      val df = rows(ids, day)
      if (batch == 0 || model.isEmpty) {
        // full snapshot = everything so far plus this batch
        val allDf = model.map(b => rows(b.head._1 until (b.head._1 + b.size), b.head._2))
          .foldLeft(df)((acc, d) => acc.unionByName(d))
        store.register("t", allDf)
        model = model :+ ids.map(i => (i, day)).toVector
      } else {
        store.registerAppend("t", df, maxSegments = 3) // small cap → compactions fire
        model = model :+ ids.map(i => (i, day)).toVector
      }
      // the CURRENT version must always equal the model union
      val expected = model.map(b =>
        collected(rows(b.head._1 until (b.head._1 + b.size), b.head._2))).reduce(_ ++ _)
      val v = store.getTableInfo("t").version
      assert(collected(store.getVersion("t", v)) == expected,
        s"step $step (mode $batch, version $v) diverged from model")
    }
  }

  test("concurrent writers of the SAME table are detected, and reopening recovers") {
    val root = freshRoot()
    val a = new FeatureStore(spark, root)
    val b = new FeatureStore(spark, root) // opened before a's write
    a.register("t", rows(1 to 3, day = 1))
    intercept[FeatureConcurrencyError](b.register("t", rows(4 to 6, day = 2)))
    intercept[FeatureConcurrencyError](b.registerAppend("t", rows(4 to 6, day = 2)))
    // a fresh session sees version 1 and may continue the lineage
    val c = new FeatureStore(spark, root)
    c.registerAppend("t", rows(4 to 6, day = 2))
    assert(c.getTableInfo("t").version == 2)
    assert(c.getVersion("t", 2).count() == 6)
  }
}
