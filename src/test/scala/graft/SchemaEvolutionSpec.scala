package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{FeatureStore, FeatureValidationError, TxnLogStorage}

/** Merge-schema evolution on the append path (engine extension —
  * Delta Lake `mergeSchema` semantics): new columns append to the
  * table schema, prior segments read them as typed nulls, historical
  * versions keep their own column sets, and the column-type record
  * survives catalog reopen and multi-writer log reconciliation.
  */
class SchemaEvolutionSpec extends AnyFunSuite with SparkTestBase {

  private def baseRows: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", ts("2024-01-01"), 1.0),
      ("u2", ts("2024-01-02"), 2.0)
    ).toDF("entity_id", "timestamp", "feature_a")
  }

  private def evolvedRows: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", ts("2024-02-01"), 3.0, 30L),
      ("u3", ts("2024-02-02"), 4.0, 40L)
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b")
  }

  test("mergeSchema append adds a column; old rows read as typed nulls") {
    val store = new FeatureStore(spark)
    store.register("t", baseRows)
    val info = store.registerAppend("t", evolvedRows, mergeSchema = true)
    assert(info.version == 2)
    assert(info.columns == Seq("entity_id", "timestamp", "feature_a", "feature_b"))
    assert(info.rowCount == 4)
    val cur = store.get("t", Seq("u1", "u2", "u3"), ts("2024-03-01"))
    assert(cur.columns.toSeq == Seq("entity_id", "timestamp", "feature_a", "feature_b"))
    assert(cur.schema("feature_b").dataType ==
      org.apache.spark.sql.types.LongType) // typed pad, not a NullType column
    // PIT latest-per-entity over the evolved chain: u1's latest is the
    // evolved row (30), u2 predates the column (null), u3 is new (40)
    val got = cur.collect()
      .map(r => r.getAs[String]("entity_id") ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map("u1" -> 30L, "u2" -> -1L, "u3" -> 40L))
  }

  test("historical versions keep their own column sets") {
    val store = new FeatureStore(spark)
    store.register("t", baseRows)
    store.registerAppend("t", evolvedRows, mergeSchema = true)
    assert(store.getVersion("t", 1).columns.toSeq ==
      Seq("entity_id", "timestamp", "feature_a"))
    val v2 = store.getVersion("t", 2)
    assert(v2.columns.toSeq ==
      Seq("entity_id", "timestamp", "feature_a", "feature_b"))
    assert(v2.count() == 4)
    assert(v2.filter("feature_b IS NULL").count() == 2) // the padded old segment
  }

  test("plain append still rejects drift; mergeSchema rejects drops and type changes") {
    val s = spark
    import s.implicits._
    val store = new FeatureStore(spark)
    store.register("t", baseRows)
    // extra column without the flag: the shipped strict contract
    intercept[FeatureValidationError](store.registerAppend("t", evolvedRows))
    // dropping an existing column is never an append
    val dropped = Seq(("u9", ts("2024-03-01"), 9L))
      .toDF("entity_id", "timestamp", "feature_b")
    intercept[FeatureValidationError](
      store.registerAppend("t", dropped, mergeSchema = true))
    // changing an existing column's type is never an append
    val retyped = Seq(("u9", ts("2024-03-01"), "nine", 9L))
      .toDF("entity_id", "timestamp", "feature_a", "feature_b")
    intercept[FeatureValidationError](
      store.registerAppend("t", retyped, mergeSchema = true))
    // nothing was committed by the failures
    assert(store.getTableInfo("t").version == 1)
    // a SAME-SHAPE delta with a retyped column is rejected too (the
    // fast path must not skip the type check — a wrongly-typed segment
    // would break every later chained read)
    val sameShapeRetyped = Seq(("u9", ts("2024-03-01"), "nine"))
      .toDF("entity_id", "timestamp", "feature_a")
    intercept[FeatureValidationError](
      store.registerAppend("t", sameShapeRetyped))
    assert(store.getTableInfo("t").version == 1)
  }

  test("mergeSchema upsert: replaced keys carry the new column, the rest pad") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_evo_ups").toString
    val store = new FeatureStore(spark, root)
    store.register("t", baseRows)
    // evolved delta REPLACES u1's key and INSERTS u3 (CDC stream whose
    // producer added a column mid-stream)
    val delta = Seq(
      ("u1", ts("2024-01-01"), 1.5, 15L),
      ("u3", ts("2024-03-01"), 9.0, 90L))
      .toDF("entity_id", "timestamp", "feature_a", "feature_b")
    intercept[FeatureValidationError] { store.registerUpsert("t", delta) }
    val info = store.registerUpsert("t", delta, mergeSchema = true)
    assert(info.columns == Seq("entity_id", "timestamp", "feature_a", "feature_b"))
    assert(info.rowCount == 3)
    val cur = store.getVersion("t", info.version).orderBy("entity_id")
    val byE = cur.collect().map(r =>
      r.getString(0) -> (r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(byE("u1") == (1.5, Some(15L)))    // replaced, evolved value
    assert(byE("u2") == (2.0, None))         // untouched survivor pads
    assert(byE("u3") == (9.0, Some(90L)))    // inserted
    // the recorded change set reads back with the evolved schema
    val ch = store.getChanges("t", 1, 2)
    assert(ch.columns.contains("feature_b"))
    assert(ch.filter("_change_type = 'insert' AND feature_b = 90").count() == 1)
    // type change still rejected; dropping a column still rejected
    intercept[FeatureValidationError] {
      store.registerUpsert("t",
        delta.withColumn("feature_b", lit("nope")), mergeSchema = true)
    }
    intercept[FeatureValidationError] {
      store.registerUpsert("t", delta.drop("feature_a"), mergeSchema = true)
    }
    // historical version keeps its own (pre-evolution) columns
    assert(store.getVersion("t", 1).columns.toSeq ==
      Seq("entity_id", "timestamp", "feature_a"))
  }

  test("column-type record survives a store reopen") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evolve_reopen").toString
    val store = new FeatureStore(spark, root)
    store.register("t", baseRows)
    store.registerAppend("t", evolvedRows, mergeSchema = true)
    val reopened = new FeatureStore(spark, root)
    val cur = reopened.get("t", Seq("u1", "u2", "u3"), ts("2024-03-01"))
    assert(cur.schema("feature_b").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(cur.filter("feature_b IS NULL").count() == 1) // u2 only (u1 superseded)
    assert(reopened.getVersion("t", 2).count() == 4)
  }

  test("compaction across an evolution pads the materialized snapshot") {
    val store = new FeatureStore(spark)
    store.register("t", baseRows)
    // maxSegments = 1 forces every append to compact into one snapshot
    val info = store.registerAppend("t", evolvedRows, maxSegments = 1, mergeSchema = true)
    assert(info.rowCount == 4)
    assert(store.getTableHistory("t").last.segments == Seq(2)) // compacted
    val v2 = store.getVersion("t", 2)
    assert(v2.count() == 4)
    assert(v2.filter("feature_b IS NULL").count() == 2)
    // a further plain append now requires the evolved schema
    intercept[FeatureValidationError](store.registerAppend("t", baseRows))
  }

  test("evolution through the txn log: a second store reconciles types from markers") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evolve_txn").toString
    val a = new FeatureStore(spark, root,
      storageFactory = new TxnLogStorage(_, _, _))
    a.register("t", baseRows)
    a.registerAppend("t", evolvedRows, mergeSchema = true)
    // second writer on the same root: catalog file exists, but ALSO
    // delete it to force full log reconciliation of the type record
    java.nio.file.Files.delete(graft.store.CatalogPersistence.tableFile(root, "t"))
    val b = new FeatureStore(spark, root,
      storageFactory = new TxnLogStorage(_, _, _))
    val cur = b.get("t", Seq("u1", "u2", "u3"), ts("2024-03-01"))
    assert(cur.columns.toSeq ==
      Seq("entity_id", "timestamp", "feature_a", "feature_b"))
    assert(cur.schema("feature_b").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(b.getVersion("t", 2).filter("feature_b IS NULL").count() == 2)
  }
}
