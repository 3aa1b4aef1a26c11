package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{FeatureStore, FeatureValidationError}

/** SQL UPDATE / MERGE INTO on graft catalog tables (the
  * [[graft.plans.GraftDmlRule]] session-extension route; the shared
  * test session installs `spark.sql.extensions=graft.GraftExtensions`).
  */
class SqlDmlSpec extends AnyFunSuite with SparkTestBase {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dml_$tag").toString

  private def cat(root: String): String = {
    val name = "gd_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    spark.conf.set(
      s"spark.sql.catalog.$name", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("UPDATE SET with WHERE rewrites only matched rows, as a new version") {
    val root = freshRoot("upd")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(
      s"UPDATE $c.feat SET feature_a = feature_a + 100.0 WHERE entity_id = 'user_1'")
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(now.count() == 5)
    assert(now.filter(col("entity_id") === "user_1")
      .agg(sum("feature_a")).head().getDouble(0) == 306.0)
    assert(now.filter(col("entity_id") === "user_2")
      .agg(sum("feature_a")).head().getDouble(0) == 30.0)
    // versioned: the pre-update snapshot survives
    assert(store.getVersion("feat", 1)
      .agg(sum("feature_a")).head().getDouble(0) == 36.0)
  }

  test("UPDATE with no WHERE touches every row; empty match is a no-op") {
    val root = freshRoot("updall")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(s"UPDATE $c.feat SET feature_b = feature_b * 2")
    store.refresh()
    assert(store.getVersion("feat", store.getTableInfo("feat").version)
      .agg(sum("feature_b")).head().getLong(0) == 2 * 3600L)
    val vBefore = store.getTableInfo("feat").version
    spark.sql(s"UPDATE $c.feat SET feature_b = 0 WHERE entity_id = 'nobody'")
    store.refresh()
    assert(store.getTableInfo("feat").version == vBefore)
  }

  test("UPDATE that rekeys rows deletes the originals") {
    val root = freshRoot("rekey")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(
      s"UPDATE $c.feat SET entity_id = 'user_1x' WHERE entity_id = 'user_1'")
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(now.count() == 5)
    assert(now.filter(col("entity_id") === "user_1").count() == 0)
    assert(now.filter(col("entity_id") === "user_1x").count() == 3)
  }

  test("MERGE INTO: matched update + matched delete + not matched insert") {
    val root = freshRoot("merge")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(
      // updates user_1@2024-01-15 (+1000), deletes user_2@2024-01-20,
      // inserts user_3@2024-02-10
      ("user_1", ts("2024-01-15"), 1000.0, 0L, "update"),
      ("user_2", ts("2024-01-20"), 0.0, 0L, "delete"),
      ("user_3", ts("2024-02-10"), 77.0, 7L, "insert")
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b", "op")
      .createOrReplaceTempView("graft_merge_src")
    spark.sql(
      s"""MERGE INTO $c.feat t
         |USING graft_merge_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |WHEN MATCHED AND s.op = 'delete' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET feature_a = t.feature_a + s.feature_a
         |WHEN NOT MATCHED AND s.op = 'insert' THEN
         |  INSERT (entity_id, timestamp, feature_a, feature_b)
         |  VALUES (s.entity_id, s.timestamp, s.feature_a, s.feature_b)"""
        .stripMargin)
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(now.count() == 5) // 5 - 1 deleted + 1 inserted
    assert(now.filter(col("entity_id") === "user_1" &&
      col("timestamp") === lit(ts("2024-01-15")))
      .head().getAs[Double]("feature_a") == 1002.0)
    assert(now.filter(col("entity_id") === "user_2").count() == 1)
    assert(now.filter(col("entity_id") === "user_3")
      .head().getAs[Long]("feature_b") == 7L)
  }

  test("MERGE INTO WHEN NOT MATCHED BY SOURCE") {
    val root = freshRoot("nmbs")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_1", ts("2024-01-01")), ("user_1", ts("2024-01-15")),
      ("user_1", ts("2024-02-01")))
      .toDF("entity_id", "timestamp")
      .createOrReplaceTempView("graft_nmbs_src")
    // keep user_1's rows; everything the source does not name is purged
    spark.sql(
      s"""MERGE INTO $c.feat t
         |USING graft_nmbs_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |WHEN MATCHED THEN UPDATE SET feature_b = t.feature_b + 1
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(now.count() == 3)
    assert(now.select("entity_id").distinct().head().getString(0) == "user_1")
    assert(now.agg(sum("feature_b")).head().getLong(0) == 603L)
  }

  test("MERGE cardinality guard: several source rows onto one key fail loudly") {
    val root = freshRoot("card")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_1", ts("2024-01-15"), 1.0), ("user_1", ts("2024-01-15"), 2.0))
      .toDF("entity_id", "timestamp", "delta")
      .createOrReplaceTempView("graft_card_src")
    val e = intercept[FeatureValidationError] {
      spark.sql(
        s"""MERGE INTO $c.feat t USING graft_card_src s
           |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
           |WHEN MATCHED THEN UPDATE SET feature_a = s.delta""".stripMargin)
    }
    assert(e.getMessage.contains("more than"))
  }

  test("MERGE netting an EMPTY table is rejected; table left intact") {
    // found by DifferentialProps' first 100-case soak (seed
    // mIAb3fCMQPfevbk5oPycP_HHpljCdzy78vSkXP3P_0A=): a source matching
    // NOTHING + NOT MATCHED BY SOURCE DELETE purges every current row.
    // The store cannot represent an empty registered table, so the
    // statement must refuse — and refuse ATOMICALLY (no half-applied
    // version, no version bump).
    val root = freshRoot("mempty")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("nobody", ts("2030-01-01"), 0.0))
      .toDF("entity_id", "timestamp", "feature_a")
      .createOrReplaceTempView("graft_mempty_src")
    intercept[FeatureValidationError] {
      spark.sql(
        s"""MERGE INTO $c.feat t USING graft_mempty_src s
           |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
           |WHEN MATCHED THEN UPDATE SET feature_a = s.feature_a
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    store.refresh()
    assert(store.getTableInfo("feat").version == 1)
    assert(store.getVersion("feat", 1).count() == 5)
  }

  test("MERGE purging every current row but inserting new ones succeeds") {
    // the adjacent edge: the NET state is non-empty (inserts survive),
    // so the single-commit rewrite path must accept it
    val root = freshRoot("mpurge")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_9", ts("2030-01-01"), 9.0, 9L))
      .toDF("entity_id", "timestamp", "feature_a", "feature_b")
      .createOrReplaceTempView("graft_mpurge_src")
    spark.sql(
      s"""MERGE INTO $c.feat t USING graft_mpurge_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |WHEN NOT MATCHED THEN
         |  INSERT (entity_id, timestamp, feature_a, feature_b)
         |  VALUES (s.entity_id, s.timestamp, s.feature_a, s.feature_b)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(now.count() == 1)
    assert(now.head().getAs[String]("entity_id") == "user_9")
  }

  /** Duplicate-(entity_id, timestamp) observations are legal in the
    * store, but the mutation primitives address WHOLE keys — these
    * tests pin that SQL DML stays ROW-addressed: siblings a statement
    * did not touch must survive, and each statement is ONE commit.
    */
  private def dupKeyTable(root: String): FeatureStore = {
    val store = new FeatureStore(spark, root)
    val s = spark
    import s.implicits._
    store.register("feat", Seq(
      ("user_1", ts("2024-01-15"), "a", 1L),
      ("user_1", ts("2024-01-15"), "b", 2L), // duplicate-key sibling
      ("user_2", ts("2024-01-20"), "c", 3L)
    ).toDF("entity_id", "timestamp", "tag", "v"))
    store
  }

  test("UPDATE matching one duplicate-key sibling preserves the other, one commit") {
    val root = freshRoot("sib_upd")
    val store = dupKeyTable(root)
    val c = cat(root)
    spark.sql(s"UPDATE $c.feat SET v = 100 WHERE tag = 'a'")
    store.refresh()
    assert(store.getTableInfo("feat").version == 2) // exactly one commit
    val now = store.getVersion("feat", 2)
    assert(now.count() == 3)
    val byTag = now.collect().map(r =>
      r.getAs[String]("tag") -> r.getAs[Long]("v")).toMap
    assert(byTag == Map("a" -> 100L, "b" -> 2L, "c" -> 3L))
  }

  test("rekeying UPDATE preserves siblings at the old AND new key, one commit") {
    val root = freshRoot("sib_rekey")
    val store = dupKeyTable(root)
    val c = cat(root)
    // move 'a' onto user_2's existing key: the sibling left at the old
    // key ('b') and the pre-existing row at the target key ('c') both
    // survive
    spark.sql(
      s"""UPDATE $c.feat SET entity_id = 'user_2',
         |timestamp = TIMESTAMP '2024-01-20 00:00:00' WHERE tag = 'a'"""
        .stripMargin)
    store.refresh()
    assert(store.getTableInfo("feat").version == 2) // atomic: ONE commit
    val now = store.getVersion("feat", 2)
    assert(now.count() == 3)
    val rows = now.collect().map(r => (r.getAs[String]("entity_id"),
      r.getAs[String]("tag"), r.getAs[Long]("v"))).toSet
    assert(rows == Set(
      ("user_2", "a", 1L), ("user_1", "b", 2L), ("user_2", "c", 3L)))
  }

  test("MERGE matched on a subset of a key group preserves unmatched siblings") {
    val root = freshRoot("sib_merge")
    val store = dupKeyTable(root)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_1", ts("2024-01-15"), "a", 500L))
      .toDF("entity_id", "timestamp", "tag", "v")
      .createOrReplaceTempView("graft_sib_src")
    // ON adds a non-key predicate: only sibling 'a' of the duplicate
    // key matches; 'b' is untouched and must ride through the rewrite
    spark.sql(
      s"""MERGE INTO $c.feat t USING graft_sib_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |   AND t.tag = s.tag
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED BY SOURCE AND t.tag = 'nope' THEN DELETE"""
        .stripMargin)
    store.refresh()
    assert(store.getTableInfo("feat").version == 2)
    val byTag = store.getVersion("feat", 2).collect().map(r =>
      r.getAs[String]("tag") -> r.getAs[Long]("v")).toMap
    assert(byTag == Map("a" -> 500L, "b" -> 2L, "c" -> 3L))
  }

  test("MERGE DELETE of one sibling keeps the other, one commit") {
    val root = freshRoot("sib_del")
    val store = dupKeyTable(root)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_1", ts("2024-01-15"), "a"))
      .toDF("entity_id", "timestamp", "tag")
      .createOrReplaceTempView("graft_sibdel_src")
    spark.sql(
      s"""MERGE INTO $c.feat t USING graft_sibdel_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |   AND t.tag = s.tag
         |WHEN MATCHED THEN DELETE""".stripMargin)
    store.refresh()
    assert(store.getTableInfo("feat").version == 2)
    val byTag = store.getVersion("feat", 2).collect().map(r =>
      r.getAs[String]("tag") -> r.getAs[Long]("v")).toMap
    assert(byTag == Map("b" -> 2L, "c" -> 3L))
  }

  test("MERGE INSERT onto an existing key preserves the key's current rows") {
    val root = freshRoot("sib_ins")
    val store = dupKeyTable(root)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_2", ts("2024-01-20"), "d", 4L))
      .toDF("entity_id", "timestamp", "tag", "v")
      .createOrReplaceTempView("graft_sibins_src")
    // ON never matches (tag 'd' doesn't exist), so the row INSERTs —
    // at a key that already holds 'c', which must survive
    spark.sql(
      s"""MERGE INTO $c.feat t USING graft_sibins_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |   AND t.tag = s.tag
         |WHEN NOT MATCHED THEN INSERT (entity_id, timestamp, tag, v)
         |  VALUES (s.entity_id, s.timestamp, s.tag, s.v)""".stripMargin)
    store.refresh()
    assert(store.getTableInfo("feat").version == 2)
    val now = store.getVersion("feat", 2)
    assert(now.count() == 4)
    val byTag = now.collect().map(r =>
      r.getAs[String]("tag") -> r.getAs[Long]("v")).toMap
    assert(byTag == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("MERGE updating both duplicate-key siblings independently is legal") {
    val root = freshRoot("sib_both")
    val store = dupKeyTable(root)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(("user_1", ts("2024-01-15"), "a", 10L),
      ("user_1", ts("2024-01-15"), "b", 20L))
      .toDF("entity_id", "timestamp", "tag", "v")
      .createOrReplaceTempView("graft_sibboth_src")
    // two source rows, one per sibling ROW — each target row matched
    // exactly once, so the SQL cardinality rule holds even though the
    // (entity, ts) KEY is matched twice
    spark.sql(
      s"""MERGE INTO $c.feat t USING graft_sibboth_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |   AND t.tag = s.tag
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    store.refresh()
    val byTag = store.getVersion("feat", 2).collect().map(r =>
      r.getAs[String]("tag") -> r.getAs[Long]("v")).toMap
    assert(byTag == Map("a" -> 10L, "b" -> 20L, "c" -> 3L))
  }

  test("MERGE with only NOT MATCHED INSERT: a multi-matched target row is not duplicated") {
    // SQL-standard: multi-match is a cardinality violation only when a
    // MATCHED action could apply. With insert-only actions it is legal
    // — but the untouched multi-matched row (one joined pair per source
    // row) must ride the delta ONCE, even when an insert lands at its
    // own key and pulls it into the sibling set.
    val root = freshRoot("mins")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val s = spark
    import s.implicits._
    Seq(
      // two 'm' rows both match target user_1@2024-01-15 via the ON;
      // the 'i' row fails the ON (op filter) and inserts AT THE SAME KEY
      ("user_1", ts("2024-01-15"), 500.0, 50L, "m"),
      ("user_1", ts("2024-01-15"), 600.0, 60L, "m"),
      ("user_1", ts("2024-01-15"), 700.0, 70L, "i")
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b", "op")
      .createOrReplaceTempView("graft_merge_multi_src")
    spark.sql(
      s"""MERGE INTO $c.feat t
         |USING graft_merge_multi_src s
         |ON t.entity_id = s.entity_id AND t.timestamp = s.timestamp
         |   AND s.op = 'm'
         |WHEN NOT MATCHED THEN
         |  INSERT (entity_id, timestamp, feature_a, feature_b)
         |  VALUES (s.entity_id, s.timestamp, s.feature_a, s.feature_b)"""
        .stripMargin)
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(now.count() == 6, "5 original + 1 inserted, nothing duplicated")
    val atKey = now.filter(col("entity_id") === "user_1" &&
      col("timestamp") === lit(ts("2024-01-15")))
      .select("feature_a").as[Double].collect().sorted.toSeq
    assert(atKey == Seq(2.0, 700.0), s"got $atKey")
  }

  test("UPDATE / MERGE without the extension still fail cleanly elsewhere: non-graft table untouched") {
    // the rule must leave non-graft targets alone (they follow Spark's
    // own unsupported-table error path, not ours)
    sampleFeatures.createOrReplaceTempView("graft_dml_plain_view")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft_dml_plain_view SET feature_a = 0")
    }
    assert(!e.isInstanceOf[FeatureValidationError])
  }
  test("UPDATE rekeying a NULL-timestamp key carries its sibling (null-safe)") {
    val s = spark
    import s.implicits._
    val root = freshRoot("nullsib")
    val store = new FeatureStore(spark, root)
    // two observations share the key (u1, NULL-ts); one more is dated
    store.register("feat", Seq(
      ("u1", Option.empty[java.sql.Timestamp], 1.0),
      ("u1", Option.empty[java.sql.Timestamp], 2.0),
      ("u2", Option(ts("2024-01-02")), 3.0))
      .toDF("entity_id", "timestamp", "v"))
    val c = cat(root)
    // rekey ONLY the v=1 observation away from (u1, NULL): the v=2
    // sibling at the same null key must ride the rewrite delta — a
    // null-unsafe sibling semi-join silently dropped it from the table
    spark.sql(s"UPDATE $c.feat SET entity_id = 'u9' WHERE v = 1.0")
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"),
        r.getAs[Double]("v")))
      .toSet
    assert(now == Set(("u9", 1.0), ("u1", 2.0), ("u2", 3.0)), s"got $now")
  }

  test("MERGE touching a NULL-timestamp key carries its sibling (null-safe)") {
    val s = spark
    import s.implicits._
    val root = freshRoot("nullmrg")
    val store = new FeatureStore(spark, root)
    store.register("feat", Seq(
      ("u1", Option.empty[java.sql.Timestamp], 1.0),
      ("u1", Option.empty[java.sql.Timestamp], 2.0),
      ("u2", Option(ts("2024-01-02")), 3.0))
      .toDF("entity_id", "timestamp", "v"))
    val c = cat(root)
    Seq(("u1", Option.empty[java.sql.Timestamp], 10.0))
      .toDF("entity_id", "timestamp", "v")
      .createOrReplaceTempView("graft_dml_null_src")
    // ON matches the v=1 row only; the untouched v=2 row at the same
    // (u1, NULL) key is a sibling the delta must carry null-safely
    spark.sql(
      s"""MERGE INTO $c.feat t USING graft_dml_null_src s
         |ON t.entity_id = s.entity_id AND t.timestamp <=> s.timestamp
         |   AND t.v = 1.0
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    store.refresh()
    val now = store.getVersion("feat", store.getTableInfo("feat").version)
      .collect().map(r => r.getAs[Double]("v")).toSeq.sorted
    assert(now == Seq(2.0, 3.0, 10.0), s"got $now")
  }

  test("graft_changes TVF validates its arguments") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_changes('/tmp/x', 't')").collect()
    }
    assert(e1.getMessage.contains("takes (root, table, from_version, to_version)"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_changes('/tmp/x', 't', 1 + rand(), 3)")
        .collect()
    }
    assert(e2.getMessage.contains("must be an integer literal"), e2.getMessage)
  }
}
