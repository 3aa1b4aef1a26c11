package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.{FeatureStore, FeatureValidationError, TxnLogStorage}

/** CHECK constraints ([[FeatureStore.addConstraint]]) — Delta's table
  * constraint shape: add validates existing data, every data-adding
  * write enforces via its own job metrics, violations abort before the
  * commit, and the lineage is never wedged by a rejected write.
  */
class ConstraintsSpec extends AnyFunSuite with SparkTestBase {

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("add validates existing data; writes enforce; violation aborts cleanly") {
    val store = new FeatureStore(spark, tmpRoot("graft_checks"))
    store.register("t", sampleFeatures)

    // existing data violates → not added
    val e = intercept[FeatureValidationError] {
      store.addConstraint("t", "a_large", "feature_a > 5")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(store.getConstraints("t").isEmpty)

    // clean constraint lands
    store.addConstraint("t", "a_positive", "feature_a > 0")
    store.addConstraint("t", "b_range", "feature_b BETWEEN 0 AND 10000")
    assert(store.getConstraints("t").keySet == Set("a_positive", "b_range"))

    // duplicate name rejected with the existing definition in the message
    assert(intercept[FeatureValidationError] {
      store.addConstraint("t", "a_positive", "feature_a > 1")
    }.getMessage.contains("feature_a > 0"))

    // violating append aborts: no version minted, no stranded claim
    val before = store.getTableInfo("t").version
    val bad = intercept[FeatureValidationError] {
      store.registerAppend("t", sampleFeatures
        .withColumn("feature_a", lit(-1.0)))
    }
    assert(bad.getMessage.contains("a_positive") &&
      bad.getMessage.contains("5 rows"))
    assert(store.getTableInfo("t").version == before)

    // the lineage is not wedged: a valid append still lands
    store.registerAppend("t", sampleFeatures
      .withColumn("timestamp", col("timestamp") + expr("INTERVAL 60 DAYS")))
    assert(store.getTableInfo("t").rowCount == 10)
    assert(store.getTableInfo("t").version == before + 1)

    // full register replacing the table enforces too
    intercept[FeatureValidationError] {
      store.register("t", sampleFeatures.withColumn("feature_b", lit(-5L)))
    }

    // upsert delta enforces
    intercept[FeatureValidationError] {
      store.registerUpsert("t", sampleFeatures
        .withColumn("feature_a", lit(0.0)))
    }

    // NULL passes (standard SQL CHECK), FALSE fails
    val s = spark
    import s.implicits._
    val withNull = Seq(
      ("user_9", ts("2024-05-01"), Option.empty[Double], 1L))
      .toDF("entity_id", "timestamp", "feature_a", "feature_b")
    store.registerAppend("t", withNull)
    assert(store.getTableInfo("t").rowCount == 11)
  }

  test("delete/compact/restore never re-validate; drop stops enforcement") {
    val store = new FeatureStore(spark, tmpRoot("graft_checks_life"))
    store.register("t", sampleFeatures)
    store.addConstraint("t", "a_positive", "feature_a > 0")

    // content-preserving ops on valid data sail through
    store.deleteRows("t", col("feature_b") === 1000L)
    store.restoreVersion("t", 1)
    store.compact("t")

    assert(store.dropConstraint("t", "a_positive"))
    assert(!store.dropConstraint("t", "a_positive"))
    // enforcement gone: the formerly violating write lands
    store.registerAppend("t", sampleFeatures
      .withColumn("feature_a", lit(-1.0))
      .withColumn("timestamp", col("timestamp") + expr("INTERVAL 90 DAYS")))
    assert(store.getTableInfo("t").rowCount == 10)
  }

  test("schema drift breaking a referenced column fails with the remedy") {
    val store = new FeatureStore(spark, tmpRoot("graft_checks_drift"))
    store.register("t", sampleFeatures)
    store.addConstraint("t", "a_positive", "feature_a > 0")
    val e = intercept[FeatureValidationError] {
      store.register("t", sampleFeatures.drop("feature_a"))
    }
    assert(e.getMessage.contains("Drop the constraint first"))
    // table unchanged, still readable
    assert(store.getTableInfo("t").version == 1)
    store.dropConstraint("t", "a_positive")
    store.register("t", sampleFeatures.drop("feature_a"))
    assert(store.getTableInfo("t").version == 2)
  }

  test("a constraint added by one writer binds a concurrent writer") {
    val root = tmpRoot("graft_checks_mw")
    def open() = new FeatureStore(spark, root,
      storageFactory = new TxnLogStorage(_, _, _))
    val a = open()
    val b = open() // opened BEFORE the constraint exists
    a.register("t", sampleFeatures)
    b.registerAppend("t", sampleFeatures
      .withColumn("timestamp", col("timestamp") + expr("INTERVAL 60 DAYS")))
    a.addConstraint("t", "a_positive", "feature_a > 0")
    // B's next write must adopt the constraint through the shared
    // catalog merge and reject the violating rows
    intercept[FeatureValidationError] {
      b.registerAppend("t", sampleFeatures
        .withColumn("feature_a", lit(-3.0))
        .withColumn("timestamp", col("timestamp") + expr("INTERVAL 90 DAYS")))
    }
    assert(b.getConstraints("t") == Map("a_positive" -> "feature_a > 0"))
    // and B's own catalog save must not have wiped it for A
    assert(open().getConstraints("t") ==
      Map("a_positive" -> "feature_a > 0"))
  }

  test("constraints persist across reopen and marker-only reconciliation") {
    val root = tmpRoot("graft_checks_txn")
    def open() = new FeatureStore(spark, root,
      storageFactory = new TxnLogStorage(_, _, _))
    val a = open()
    a.register("t", sampleFeatures)
    a.addConstraint("t", "a_positive", "feature_a > 0")
    a.registerAppend("t", sampleFeatures
      .withColumn("timestamp", col("timestamp") + expr("INTERVAL 60 DAYS")))

    // plain reopen: catalog carries the constraint
    val b = open()
    assert(b.getConstraints("t") == Map("a_positive" -> "feature_a > 0"))
    intercept[FeatureValidationError] {
      b.registerAppend("t", sampleFeatures.withColumn("feature_a", lit(-2.0)))
    }

    // catalog destroyed: the constraint must come back from the commit
    // markers and keep enforcing
    java.nio.file.Files.delete(graft.store.CatalogPersistence.tableFile(root, "t"))
    val c = open()
    intercept[FeatureValidationError] {
      c.registerAppend("t", sampleFeatures.withColumn("feature_a", lit(-2.0)))
    }
    assert(c.getConstraints("t") == Map("a_positive" -> "feature_a > 0"))
  }

  // ------------------------------------------- expectations + quarantine

  test("registerWithExpectations splits clean vs quarantined rows with labels") {
    val store = new FeatureStore(spark, tmpRoot("graft_expect"))
    val s = spark
    import s.implicits._
    val load = Seq(
      ("u1", ts("2024-01-01"), 1.0, Some(10L)),  // clean
      ("u2", ts("2024-01-02"), -3.0, Some(20L)), // fails a_nonneg
      ("u3", ts("2024-01-03"), 2.0, Some(99999L)), // fails b_small
      ("u4", ts("2024-01-04"), -1.0, Some(99999L)), // fails BOTH
      ("u5", ts("2024-01-05"), 4.0, None) // NULL predicate = violation
    ).toDF("entity_id", "timestamp", "feature_a", "feature_b")
    val (t, q) = store.registerWithExpectations(
      "feat", load,
      Seq(
        "a_nonneg" -> (col("feature_a") >= 0),
        "b_small" -> (col("feature_b") < 1000L)),
      quarantine = "feat_bad")
    assert(t.get.rowCount == 1 && q.get.rowCount == 4)
    val bad = store.getVersion("feat_bad", 1).collect()
      .map(r => r.getAs[String]("entity_id") -> r.getAs[String]("violated"))
      .toMap
    assert(bad == Map(
      "u2" -> "a_nonneg", "u3" -> "b_small",
      "u4" -> "a_nonneg,b_small", "u5" -> "b_small"))
    assert(store.getVersion("feat", 1).select("entity_id")
      .head().getString(0) == "u1")

    // second load APPENDS to both sides
    val (t2, q2) = store.registerWithExpectations(
      "feat", Seq(
        ("u6", ts("2024-02-01"), 5.0, Some(1L)),
        ("u7", ts("2024-02-02"), -9.0, Some(1L)))
        .toDF("entity_id", "timestamp", "feature_a", "feature_b"),
      Seq("a_nonneg" -> (col("feature_a") >= 0)),
      quarantine = "feat_bad")
    assert(t2.get.rowCount == 2 && q2.get.rowCount == 5)
    assert(t2.get.version == 2 && q2.get.version == 2)

    // an all-clean load leaves the quarantine side untouched (None)
    val (t3, q3) = store.registerWithExpectations(
      "feat", Seq(("u8", ts("2024-03-01"), 6.0, Some(2L)))
        .toDF("entity_id", "timestamp", "feature_a", "feature_b"),
      Seq("a_nonneg" -> (col("feature_a") >= 0)),
      quarantine = "feat_bad")
    assert(t3.isDefined && q3.isEmpty)
  }

  test("registerWithExpectations validates its arguments") {
    val store = new FeatureStore(spark, tmpRoot("graft_expect_args"))
    intercept[FeatureValidationError] {
      store.registerWithExpectations(
        "t", sampleFeatures, Seq.empty, quarantine = "t_bad")
    }
    intercept[FeatureValidationError] {
      store.registerWithExpectations(
        "t", sampleFeatures,
        Seq("x" -> (col("feature_a") > 0)), quarantine = "t")
    }
  }
}
