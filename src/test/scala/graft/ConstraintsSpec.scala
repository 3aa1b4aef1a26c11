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
}
