package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.FeatureStore

/** The SQL catalog surface: graft tables as first-class V2 tables —
  * SELECT / INSERT / DELETE FROM (UPDATE / MERGE INTO live in
  * [[SqlDmlSpec]], they need the session extension).
  */
class GraftCatalogSpec extends AnyFunSuite with SparkTestBase {

  private def freshRoot(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_cat_$tag").toString
    dir
  }

  /** Register a uniquely-named catalog over `root` and return its name. */
  private def cat(root: String): String = {
    val name = "gc_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    spark.conf.set(
      s"spark.sql.catalog.$name", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("SELECT through the catalog equals the Scala-API read") {
    val root = freshRoot("sel")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val viaSql = spark.sql(s"SELECT * FROM $c.feat ORDER BY entity_id, timestamp")
    val viaApi = store
      .getVersion("feat", 1)
      .orderBy("entity_id", "timestamp")
    assert(viaSql.schema == viaApi.schema)
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
    // namespace-qualified addressing too
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.default.feat")
      .head().getLong(0) == 5L)
  }

  test("filter pushdown and column pruning reach the V2 scan") {
    val root = freshRoot("push")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val q = spark.sql(
      s"SELECT feature_a FROM $c.feat WHERE entity_id = 'user_1'")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("BatchScan"), formatted)
    // the scan's description carries the pushed filter + pruned columns
    val scanDesc = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("pushed:") && scanDesc.contains("EqualTo"),
      s"pushed filter missing from scan: $scanDesc")
    assert(q.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("INSERT INTO appends a version; INSERT OVERWRITE registers a snapshot") {
    val root = freshRoot("ins")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(
      s"INSERT INTO $c.feat VALUES ('user_9', TIMESTAMP'2024-03-01 00:00:00', 9.0, 900)")
    store.refresh()
    assert(store.getTableInfo("feat").version == 2)
    assert(store.getTableInfo("feat").rowCount == 6)
    spark.sql(
      s"INSERT OVERWRITE $c.feat VALUES ('solo', TIMESTAMP'2024-03-02 00:00:00', 1.0, 1)")
    store.refresh()
    assert(store.getTableInfo("feat").version == 3)
    assert(store.getTableInfo("feat").rowCount == 1)
    // prior versions stay time-travelable
    assert(store.getVersion("feat", 2).count() == 6)
  }

  test("DELETE FROM routes pushed predicates to the copy-on-write row delete") {
    val root = freshRoot("del")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(
      s"DELETE FROM $c.feat WHERE entity_id = 'user_1' AND feature_b < 300")
    store.refresh()
    val left = store.getVersion("feat", store.getTableInfo("feat").version)
    assert(left.count() == 3)
    assert(left.filter(col("entity_id") === "user_1").count() == 1)
    // the delete is a new version; the pre-delete snapshot survives
    assert(store.getVersion("feat", 1).count() == 5)
  }

  test("TRUNCATE TABLE and no-WHERE DELETE empty the table as a new version") {
    val root = freshRoot("trunc")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(s"TRUNCATE TABLE $c.feat")
    store.refresh()
    assert(store.getTableInfo("feat").rowCount == 0)
    assert(spark.sql(s"SELECT * FROM $c.feat").count() == 0)
    // same lineage: the pre-truncate snapshot stays time-travelable
    assert(store.getVersion("feat", 1).count() == 5)
    // and the emptied table accepts the next INSERT
    spark.sql(
      s"INSERT INTO $c.feat VALUES " +
        "('user_9', TIMESTAMP'2024-03-01 00:00:00', 9.0, 900)")
    store.refresh()
    assert(spark.sql(s"SELECT * FROM $c.feat").count() == 1)
    // DELETE FROM with no WHERE is the same explicit intent; a
    // PREDICATE that merely matches everything still trips the
    // every-row guard, by design
    spark.sql(s"DELETE FROM $c.feat")
    store.refresh()
    assert(store.getTableInfo("feat").rowCount == 0)
    spark.sql(
      s"INSERT INTO $c.feat VALUES " +
        "('user_9', TIMESTAMP'2024-03-01 00:00:00', 9.0, 900)")
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $c.feat WHERE feature_b >= 0")
    }
    assert(e.getMessage.contains("every row"), e.getMessage)
  }

  test("CREATE TABLE / CTAS / DROP TABLE / SHOW TABLES") {
    val root = freshRoot("ddl")
    val c = cat(root)
    spark.sql(
      s"""CREATE TABLE $c.empty_t
         |(entity_id STRING, timestamp TIMESTAMP, v DOUBLE) USING graft"""
        .stripMargin)
    val store = new FeatureStore(spark, root)
    assert(store.tableNames.contains("empty_t"))
    assert(store.getTableInfo("empty_t").rowCount == 0)
    sampleFeatures.createOrReplaceTempView("graft_cat_ddl_src")
    spark.sql(
      s"CREATE TABLE $c.ctas_t USING graft AS SELECT * FROM graft_cat_ddl_src")
    store.refresh()
    assert(spark.sql(s"SELECT count(*) FROM $c.ctas_t").head().getLong(0) == 5L)
    val shown = spark.sql(s"SHOW TABLES IN $c").collect().map(_.getString(1)).toSet
    assert(shown.contains("empty_t") && shown.contains("ctas_t"))
    spark.sql(s"DROP TABLE $c.empty_t")
    store.refresh()
    assert(!store.tableNames.contains("empty_t"))
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF through the catalog") {
    val root = freshRoot("tt")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    // v2 evolves the schema: adds `extra`, drops nothing
    store.registerAppend("feat",
      sampleFeatures.limit(1)
        .withColumn("entity_id", lit("user_9"))
        .withColumn("extra", lit(1L)),
      mergeSchema = true)
    val c = cat(root)

    assert(spark.sql(s"SELECT * FROM $c.feat").count() == 6)
    val v1 = spark.sql(s"SELECT * FROM $c.feat VERSION AS OF 1")
    assert(v1.count() == 5)
    // the as-of version's OWN schema: no `extra` column at v1
    assert(!v1.columns.contains("extra"))
    val ts = new java.sql.Timestamp(afterV1)
    val asOf = spark.sql(
      s"SELECT count(*) AS n FROM $c.feat FOR TIMESTAMP AS OF '$ts'")
    assert(asOf.head().getLong(0) == 5L)
    // pushdown still applies on the pinned snapshot
    assert(spark.sql(
      s"SELECT feature_a FROM $c.feat VERSION AS OF 1 WHERE entity_id = 'user_2'")
      .collect().map(_.getDouble(0)).sorted.toSeq == Seq(10.0, 20.0))
    // the past is read-only: Spark's grammar already refuses temporal
    // DML targets (parse error), and the pinned table itself refuses
    // writes should any path construct one
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $c.feat VERSION AS OF 1 WHERE feature_a = 1.0")
    }
    assert(e.getMessage.toUpperCase.contains("PARSE_SYNTAX_ERROR") ||
      e.getMessage.contains("read-only"), e.getMessage)
    val e2 = intercept[graft.store.FeatureValidationError] {
      new graft.sources.GraftCatalogTable("cat", root, "feat", Some(1))
        .truncateTable()
    }
    assert(e2.getMessage.contains("read-only"))
  }

  test("CALL procedures: optimize, history, restore, vacuum drive the lifecycle from SQL") {
    val root = freshRoot("proc")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    // DELETE makes v2; OPTIMIZE makes a content-identical clustered v3
    spark.sql(s"DELETE FROM $c.feat WHERE entity_id = 'user_2'")
    val opt = spark.sql(
      s"CALL $c.optimize(`table` => 'feat', cluster_by => 'timestamp', zorder => true)")
      .collect()
    assert(opt.head.getAs[Int]("version") == 3)
    assert(opt.head.getAs[Long]("row_count") == 3L)
    // history: one row per retained version, operations recorded
    val hist = spark.sql(s"CALL $c.history(`table` => 'feat')").collect()
    assert(hist.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    assert(hist.map(_.getAs[String]("operation")).toSeq ==
      Seq("register", "delete", "optimize"))
    assert(hist.count(_.getAs[Boolean]("is_current")) == 1)
    // restore to v1 (pre-delete) as a NEW version
    val res = spark.sql(
      s"CALL $c.restore(`table` => 'feat', version => 1)").collect()
    assert(res.head.getAs[Int]("new_version") == 4)
    store.refresh()
    assert(spark.sql(s"SELECT count(*) FROM $c.feat").head().getLong(0) == 5L)
    // vacuum with zero grace reclaims the retired pre-optimize layout
    val reclaimed = spark.sql(s"CALL $c.vacuum(grace_millis => 0)").collect()
    assert(reclaimed.forall(_.getAs[String]("reclaimed_path").nonEmpty))
    // the table still answers after reclamation
    assert(spark.sql(s"SELECT count(*) FROM $c.feat").head().getLong(0) == 5L)
  }

  test("CALL procedures reject NULL arguments instead of misreading them") {
    val root = freshRoot("procnull")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    // InternalRow's primitive getters read NULL as 0 — unguarded,
    // restore(version => NULL) would silently restore to v0 and
    // vacuum(grace_millis => NULL) would reclaim with ZERO grace
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $c.restore(`table` => 'feat', version => CAST(NULL AS INT))").collect()
    }
    assert(e1.getMessage.contains("must not be NULL"))
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $c.optimize(`table` => CAST(NULL AS STRING), cluster_by => 'timestamp')").collect()
    }
    assert(e2.getMessage.contains("must not be NULL"))
    // NULL grace takes the documented default (nothing young reclaimed),
    // never zero grace
    val reclaimed = spark
      .sql(s"CALL $c.vacuum(grace_millis => CAST(NULL AS BIGINT))").collect()
    assert(reclaimed.isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $c.feat").head().getLong(0) == 5L)
    // the uniform convention's other half: a DEFAULTED parameter maps
    // explicit NULL to its default (here zorder/incremental => false),
    // identically to omitting the argument — never a NULL error and
    // never a read-as-false-by-accident distinction from vacuum's
    val opt = spark.sql(
      s"CALL $c.optimize(`table` => 'feat', cluster_by => 'timestamp', " +
        "zorder => CAST(NULL AS BOOLEAN), incremental => CAST(NULL AS BOOLEAN))")
      .collect()
    assert(opt.head.getAs[Long]("row_count") == 5L)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT maps to the store's CHECK ledger") {
    val root = freshRoot("chk")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    spark.sql(
      s"ALTER TABLE $c.feat ADD CONSTRAINT positive_a CHECK (feature_a > 0)")
    store.refresh()
    assert(store.getConstraints("feat").contains("positive_a"))
    // violating writes are rejected — by Spark's own enforcement of
    // the advertised V2 constraint (SparkRuntimeException) or, through
    // surfaces Spark doesn't guard, by the store's write-time check
    val bad = intercept[Exception] {
      spark.sql(
        s"INSERT INTO $c.feat VALUES ('u', TIMESTAMP'2024-05-01 00:00:00', -1.0, 5)")
    }
    assert(bad.getMessage.contains("positive_a") ||
      bad.getMessage.toUpperCase.contains("CHECK"), bad.getMessage)
    // the store-side guard holds regardless of the SQL layer
    val badApi = intercept[graft.store.FeatureValidationError] {
      store.registerAppend("feat", sampleFeatures.limit(1)
        .withColumn("feature_a", lit(-5.0)))
    }
    assert(badApi.getMessage.contains("positive_a"))
    // adding a constraint existing data violates fails the ALTER
    val e = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE $c.feat ADD CONSTRAINT impossible CHECK (feature_b > 99999)")
    }
    assert(e.getMessage.contains("violate"))
    spark.sql(s"ALTER TABLE $c.feat DROP CONSTRAINT positive_a")
    store.refresh()
    assert(!store.getConstraints("feat").contains("positive_a"))
    spark.sql(
      s"INSERT INTO $c.feat VALUES ('u', TIMESTAMP'2024-05-01 00:00:00', -1.0, 5)")
    store.refresh()
    assert(store.getTableInfo("feat").rowCount == 6)
  }

  test("ALTER TABLE RENAME TO: one directory move, full history survives") {
    val root = freshRoot("ren")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    store.registerAppend("feat", sampleFeatures.limit(2)) // v2: history to carry
    val c = cat(root)
    spark.sql(s"ALTER TABLE $c.feat RENAME TO feat2")
    store.refresh()
    assert(!store.tableNames.contains("feat"))
    assert(store.tableNames.contains("feat2"))
    // lineage survives: both versions readable, time travel intact
    assert(store.getTableInfo("feat2").version == 2)
    assert(store.getVersion("feat2", 1).count() == 5)
    assert(store.getVersion("feat2", 2).count() == 7)
    assert(spark.sql(s"SELECT count(*) FROM $c.feat2").head().getLong(0) == 7L)
    // the old name is gone from SQL too
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $c.feat").collect())
    assert(e.getMessage.contains("feat"))
    // renaming onto an existing table refuses
    store.register("other", sampleFeatures)
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $c.feat2 RENAME TO other"))
    assert(dup.getMessage.contains("already exists"))
    // a fresh table can take the retired name, starting a new lineage
    store.register("feat", sampleFeatures.limit(1))
    assert(store.getTableInfo("feat").version == 1)
    assert(store.getTableInfo("feat").rowCount == 1)
  }

  test("DESCRIBE / SHOW TBLPROPERTIES / writeTo surface the store's metadata") {
    val root = freshRoot("meta")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    val c = cat(root)
    val desc = spark.sql(s"DESCRIBE EXTENDED $c.feat")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("entity_id") && desc.contains("feature_a"), desc)
    val props = spark.sql(s"SHOW TBLPROPERTIES $c.feat")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("version") == "1", props)
    assert(props("row_count") == "5", props)
    // the V2 DataFrame writer addresses the catalog table by name
    sampleFeatures.limit(2).writeTo(s"$c.feat").append()
    store.refresh()
    assert(store.getTableInfo("feat").version == 2)
    assert(store.getTableInfo("feat").rowCount == 7)
    // ...and overwrite/replace registers a snapshot
    sampleFeatures.limit(1).writeTo(s"$c.feat").createOrReplace()
    store.refresh()
    assert(store.getTableInfo("feat").rowCount == 1)
  }

  test("V2 scan refuses nothing the V1 format read serves: row-for-row equivalence") {
    val root = freshRoot("eqv")
    val store = new FeatureStore(spark, root)
    // two segments + schema evolution: the padded union is the
    // hardest snapshot plan the scan wraps
    store.register("feat", sampleFeatures.drop("feature_b")
      .filter(col("timestamp") < lit(ts("2024-01-18"))))
    store.registerAppend("feat",
      sampleFeatures.filter(col("timestamp") >= lit(ts("2024-01-18"))),
      mergeSchema = true)
    val c = cat(root)
    val predicates = Seq(
      "true",
      "entity_id = 'user_1'",
      "feature_a > 2.5",
      "feature_b IS NULL",
      "entity_id IN ('user_1','user_2') AND feature_a <= 10.0",
      "timestamp >= TIMESTAMP'2024-01-10 00:00:00'")
    for (p <- predicates) {
      val viaSql = spark.sql(
        s"SELECT * FROM $c.feat WHERE $p ORDER BY entity_id, timestamp")
      val viaV1 = spark.read.format("graft")
        .option("root", root).option("table", "feat").load()
        .where(p).orderBy("entity_id", "timestamp")
      assert(viaSql.collect().toSeq == viaV1.collect().toSeq, s"predicate: $p")
    }
  }
  test("COUNT/MIN/MAX push into a metadata-only scan; filters fall back") {
    val root = freshRoot("aggpd")
    val store = new FeatureStore(spark, root)
    store.register("feat", sampleFeatures)
    store.registerAppend("feat", sampleFeatures.limit(2)) // two segments
    val c = cat(root)
    val agg = spark.sql(
      s"""SELECT count(*) AS n, count(feature_b) AS nb,
         |       min(feature_b) AS mn, max(feature_b) AS mx,
         |       min(entity_id) AS me, max(`timestamp`) AS mt
         |FROM $c.feat""".stripMargin)
    val scans = agg.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.GraftAggScan]),
      agg.queryExecution.executedPlan.toString)
    assert(!agg.queryExecution.executedPlan.toString.contains("Scan parquet"))
    val r = agg.head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 7L)
    assert(r.getLong(2) == 100L && r.getLong(3) == 2000L)
    assert(r.getString(4) == "user_1")
    assert(r.getTimestamp(5) == ts("2024-02-01"))

    // nulls: COUNT(col) excludes them, MIN/MAX ignore them, an
    // all-null column aggregates to null
    val s = spark
    import s.implicits._
    store.register("nul", Seq(
      ("u1", ts("2024-01-01"), Some(5L), Option.empty[Long]),
      ("u2", ts("2024-01-02"), None, Option.empty[Long]),
      ("u3", ts("2024-01-03"), Some(9L), Option.empty[Long])
    ).toDF("entity_id", "timestamp", "x", "y"))
    val nr = spark.sql(
      s"SELECT count(x), min(x), max(x), min(y), count(y) FROM $c.nul")
    assert(nr.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.exists(_.isInstanceOf[graft.sources.GraftAggScan]))
    val nrow = nr.head()
    assert(nrow.getLong(0) == 2L && nrow.getLong(1) == 5L && nrow.getLong(2) == 9L)
    assert(nrow.isNullAt(3) && nrow.getLong(4) == 0L)

    // a WHERE clause refuses the pushdown and still answers exactly
    val filtered = spark.sql(
      s"SELECT count(*) FROM $c.feat WHERE feature_b >= 1000")
    assert(!filtered.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.exists(_.isInstanceOf[graft.sources.GraftAggScan]))
    assert(filtered.head().getLong(0) == 2L)

    // GROUP BY refuses too
    val grouped = spark.sql(
      s"SELECT entity_id, count(*) FROM $c.feat GROUP BY entity_id")
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("user_1" -> 5L, "user_2" -> 2L))
  }
  test("runtime V2 filtering: a broadcast join narrows the fact scan at runtime") {
    val root = freshRoot("dpp")
    val store = new FeatureStore(spark, root)
    val s = spark
    import s.implicits._
    def slice(p: String) = (1 to 50)
      .map(i => (s"${p}_$i", ts(f"2024-01-${i % 27 + 1}%02d"), i.toLong))
      .toDF("entity_id", "timestamp", "feature_b")
    store.register("fact", slice("a"))
    store.registerAppend("fact", slice("b")) // entity-disjoint segments
    val c = cat(root)
    // parquet-backed dim: a LocalRelation dim gets its selective filter
    // constant-folded away before PartitionPruning can see it
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("a_3", 1), ("a_7", 1), ("zz", 0)).toDF("id", "flag")
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dpp_dim")
    val q = spark.sql(
      s"""SELECT f.entity_id, f.feature_b
         |FROM $c.fact f JOIN dpp_dim d ON f.entity_id = d.id
         |WHERE d.flag = 1""".stripMargin)
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("a_3", "a_7"))
    assert(q.queryExecution.executedPlan.toString
      .contains("RuntimeFilters: [dynamicpruning"),
      q.queryExecution.executedPlan.toString)
    // walk through AQE wrappers and query stages to reach the scan
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case _ => Nil
      }
      p +: (p.children ++ inner).flatMap(allNodes)
    }
    val scans = allNodes(q.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.GraftBatchScan] =>
        b.scan.asInstanceOf[graft.sources.GraftBatchScan]
    }
    assert(scans.nonEmpty, q.queryExecution.executedPlan.toString)
    assert(scans.exists(_.runtimeFilterCount > 0),
      q.queryExecution.executedPlan.toString)
  }
  test("reported statistics make a small graft dim auto-broadcast") {
    val root = freshRoot("stats")
    val store = new FeatureStore(spark, root)
    store.register("dim", sampleFeatures) // 5 rows
    val c = cat(root)
    val s = spark
    import s.implicits._
    (1 to 5000).map(i => (s"user_${i % 3 + 1}", i.toLong))
      .toDF("entity_id", "n").createOrReplaceTempView("stats_fact")
    // no broadcast hint anywhere: the join must pick broadcast-hash
    // because the scan REPORTS its true (tiny) size — a V2 relation
    // without statistics defaults to Long.Max and plans a shuffle join
    val q = spark.sql(
      s"""SELECT f.n, d.feature_b FROM stats_fact f
         |JOIN $c.dim d ON f.entity_id = d.entity_id""".stripMargin)
    assert(q.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      q.queryExecution.sparkPlan.toString)
    // user_1 has 3 dim rows, user_2 has 2; fact has ~5000/3 rows per key
    val perKey = (1 to 5000).groupBy(i => s"user_${i % 3 + 1}").view.mapValues(_.size).toMap
    val expected = perKey.getOrElse("user_1", 0) * 3L + perKey.getOrElse("user_2", 0) * 2L
    assert(q.count() == expected)
  }
  test("metadata aggregates on an empty table: zero count, null extremes") {
    val root = freshRoot("aggempty")
    val c = cat(root)
    spark.sql(
      s"""CREATE TABLE $c.e
         |(entity_id STRING, timestamp TIMESTAMP, v BIGINT) USING graft"""
        .stripMargin)
    val r = spark.sql(s"SELECT count(*), count(v), min(v), max(v) FROM $c.e")
    assert(r.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.exists(_.isInstanceOf[graft.sources.GraftAggScan]),
      r.queryExecution.executedPlan.toString)
    val row = r.head()
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
    assert(row.isNullAt(2) && row.isNullAt(3))
  }
}
