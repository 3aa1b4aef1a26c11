package graft.python

import java.util.{ArrayList => JArrayList, HashMap => JHashMap, List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.{FeatureStore, FeatureTableInfo}

/** Py4J-facing facade over [[graft.store.FeatureStore]] — the seam the
  * `python/graft_store` package calls through `spark._jvm`.
  *
  * Why a facade instead of calling the store directly from Python: the
  * store's API is idiomatic Scala (`Seq`, `Option`, default arguments),
  * none of which Py4J can construct from the Python side without
  * fragile collection-converter gymnastics. This class speaks only
  * Java types — `java.util.List`, boxed `java.lang.Long`, `null` for
  * "absent" — and converts at the boundary. Exceptions from the store
  * (the reference-parity error hierarchy, `store/errors.scala`) cross
  * Py4J with class name + message intact; the Python wrapper maps them
  * back to reference-named exception types.
  *
  * DataFrames cross as-is: PySpark's `df._jdf` IS the JVM `Dataset`,
  * and a returned JVM DataFrame wraps back into a Python `DataFrame`
  * with zero data movement — the plan stays lazy, distributed, and
  * Catalyst-optimized exactly as from Scala. No pandas boundary
  * anywhere (the reference's per-call `.copy()` has no analogue here;
  * laziness is the Spark-native contract).
  */
final class PyFeatureStore(val store: FeatureStore) {

  private def infoMap(i: FeatureTableInfo): JMap[String, Object] = {
    val m = new JHashMap[String, Object]()
    m.put("name", i.name)
    m.put("columns", new JArrayList[String](i.columns.asJava))
    m.put("version", Int.box(i.version))
    m.put("row_count", Long.box(i.rowCount))
    m.put("registered_at", Long.box(i.registeredAt))
    m.put("updated_at", Long.box(i.updatedAt))
    m
  }

  private def optCols(columns: JList[String]): Option[Seq[String]] =
    Option(columns).map(_.asScala.toSeq)

  def register(name: String, df: DataFrame, description: String): JMap[String, Object] =
    infoMap(store.register(name, df, Option(description).getOrElse("")))

  def get(
      name: String,
      entityIds: JList[Object],
      timestamp: Object,
      columns: JList[String]): DataFrame =
    store.get(name, entityIds.asScala.toSeq, timestamp, optCols(columns))

  def getTrainingSet(
      name: String,
      entityTimestamps: DataFrame,
      columns: JList[String],
      maxAgeSeconds: java.lang.Long): DataFrame =
    store.getTrainingSet(
      name, entityTimestamps, optCols(columns),
      Option(maxAgeSeconds).map(_.longValue()))

  def getVersion(name: String, version: Int): DataFrame =
    store.getVersion(name, version)

  def listTables(): JList[JMap[String, Object]] =
    new JArrayList(store.listTables().map(infoMap).asJava)

  def getTableInfo(name: String): JMap[String, Object] =
    infoMap(store.getTableInfo(name))

  def tableNames(): JList[String] =
    new JArrayList[String](store.tableNames.asJava)

  def maxVersions(): Int = store.maxVersions

  def delete(name: String): Boolean = store.delete(name)

  /** Re-read the on-disk catalog: picks up tables/versions committed
    * by OTHER sessions or surfaces (e.g. a SQL `INSERT` through the V2
    * catalog, which writes via its own store instance) since this
    * handle opened.
    */
  def refresh(): Unit = store.refresh()

  // ---- beyond-reference surfaces worth having from Python ----------

  def registerAppend(
      name: String, df: DataFrame, mergeSchema: Boolean): JMap[String, Object] =
    infoMap(store.registerAppend(name, df, mergeSchema = mergeSchema))

  /** Key-wise merge: replaces current rows whose (entity_id, timestamp)
    * appears in `df`, appends the rest — one O(delta) commit.
    */
  def registerUpsert(
      name: String, df: DataFrame, mergeSchema: Boolean): JMap[String, Object] =
    infoMap(store.registerUpsert(name, df, mergeSchema = mergeSchema))

  /** Copy-on-write row delete; the condition is a SQL boolean
    * expression over the table columns (same convention as
    * [[scanWhere]]).
    */
  def deleteRows(name: String, conditionSql: String): JMap[String, Object] =
    infoMap(store.deleteRows(
      name, org.apache.spark.sql.functions.expr(conditionSql)))

  /** Expectation-gated ingestion: each expectation is a
    * [label, predicateSql] pair; passing rows land in `name`, violating
    * rows land in `quarantine` with a `violated` label column. Returns
    * {"table": info|null, "quarantine": info|null} — null when no rows
    * landed on that side (the store mints no empty versions).
    */
  def registerWithExpectations(
      name: String,
      df: DataFrame,
      expectations: JList[JList[String]],
      quarantine: String): JMap[String, Object] = {
    val exps = Option(expectations).map(_.asScala.toSeq).getOrElse(Nil).map { e =>
      require(e.size() == 2,
        s"each expectation needs [label, predicate_sql], got ${e.size()} fields")
      (String.valueOf(e.get(0)),
        org.apache.spark.sql.functions.expr(String.valueOf(e.get(1))))
    }
    val (t, q) = store.registerWithExpectations(name, df, exps, quarantine)
    val m = new JHashMap[String, Object]()
    m.put("table", t.map(infoMap).orNull)
    m.put("quarantine", q.map(infoMap).orNull)
    m
  }

  /** Filtered current-version read with segment-stats data skipping;
    * the condition is a SQL boolean expression over the table columns.
    */
  def scanWhere(name: String, conditionSql: String): DataFrame =
    store.scanWhere(name, org.apache.spark.sql.functions.expr(conditionSql))

  def getVersionAsOf(name: String, timestamp: Object): DataFrame =
    store.getVersionAsOf(name, timestamp)

  /** CDC read: the change rows (`_change_type` insert/delete,
    * `_commit_version`) committed after `fromVersion` up to and
    * including `toVersion`; `fromVersion = 0` means since creation.
    */
  def getChanges(name: String, fromVersion: Int, toVersion: Int): DataFrame =
    store.getChanges(name, fromVersion, toVersion)

  /** [[getChanges]] addressed by wall-clock commit time (both
    * endpoints resolved like TIMESTAMP AS OF).
    */
  def getChangesBetween(
      name: String, fromTimestamp: Object, toTimestamp: Object): DataFrame =
    store.getChangesBetween(name, fromTimestamp, toTimestamp)

  /** RESTORE TO VERSION: mint a new version whose content is exactly
    * the retained historical version — metadata-only, no data copied.
    */
  def restoreVersion(name: String, version: Int): JMap[String, Object] =
    infoMap(store.restoreVersion(name, version))

  /** Multi-table left as-of view: feature columns prefixed `<table>_`. */
  def getFeatureView(spine: DataFrame, names: JList[String]): DataFrame =
    store.getFeatureView(spine, names.asScala.toSeq)

  /** The k latest rows per entity at/before the timestamp, each with a
    * 1-based `recency_rank`.
    */
  def getRecent(
      name: String,
      entityIds: JList[Object],
      timestamp: Object,
      k: Int): DataFrame =
    store.getRecent(name, entityIds.asScala.toSeq, timestamp, k)

  /** Windowed aggregation features over the stored table: each agg is
    * (outName, fn, inputCol, windowSecondsOverride-or-null); fn ∈
    * rows/count/sum/min/max/distinct, exactly the Scala surface's
    * [[graft.store.WindowFeatures.WindowAgg]].
    */
  def getWindowFeatures(
      name: String,
      entityTimestamps: DataFrame,
      windowSeconds: Long,
      aggs: JList[JList[Object]]): DataFrame = {
    val parsed = aggs.asScala.toSeq.map { a =>
      require(a.size() == 4,
        s"each agg needs [out, fn, input, window_seconds|null], got ${a.size()} fields")
      val fn = String.valueOf(a.get(1))
      // fail loudly HERE on a missing input column (Python None) for
      // the fns that aggregate one: letting "" through surfaces later
      // as a baffling `column "" not found` resolution error. 'count'
      // DOES take one (it counts non-null values of it); only 'rows'
      // is input-free.
      require(a.get(2) != null || fn == "rows",
        s"agg '${String.valueOf(a.get(0))}': fn '$fn' requires an input " +
          "column, got None (only 'rows' takes no input)")
      graft.store.WindowFeatures.WindowAgg(
        out = String.valueOf(a.get(0)),
        fn = fn,
        input = Option(a.get(2)).map(String.valueOf).getOrElse(""),
        windowSeconds =
          Option(a.get(3)).map(v => v.asInstanceOf[Number].longValue()))
    }
    store.getWindowFeatures(name, entityTimestamps, windowSeconds, parsed)
  }

  /** Gap-split sessions over the stored table. */
  def getSessions(name: String, gapSeconds: Long): DataFrame =
    store.getSessions(name, gapSeconds)

  // ------------------------------------------------------------------
  // Pipeline ops (the north-star dedup/ANN/text surface): stateless
  // DataFrame→DataFrame kernels, exposed here so a PySpark user can
  // reach them without writing Scala. Plans stay lazy and distributed;
  // only argument marshalling crosses Py4J.
  // ------------------------------------------------------------------

  /** Exact duplicate groups by content hash: one row per distinct
    * text, with the canonical survivor (`keep_id` = min id) and the
    * copy count.
    */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.Dedup.exactDuplicates(docs, idCol, textCol)

  /** MinHash+LSH near-duplicate clusters: banded-signature candidate
    * pairs → connected components; one (doc_id, cluster_id) row per
    * clustered document, cluster_id = the component's min doc id.
    */
  def dedupClusters(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numPerms: Int,
      rowsPerBand: Int,
      shingleWidth: Int): DataFrame =
    graft.ops.Dedup.connectedComponents(
      graft.ops.Dedup.lshCandidatePairs(
        docs, numPerms, rowsPerBand, shingleWidth, idCol, textCol))

  /** Exact cosine top-k neighbors: `queryIds` null scores EVERY vector
    * against every other (corpus-broadcast bounded-buffer plan);
    * otherwise the given ids' rows rank against the corpus.
    */
  def annCosineTopK(
      emb: DataFrame,
      queryIds: JList[Object],
      k: Int,
      idCol: String,
      vecCol: String): DataFrame =
    graft.ops.Similarity.bruteForceTopKFor(
      emb,
      Option(queryIds).map(
        _.asScala.toSeq.map(v => v.asInstanceOf[Number].longValue())),
      k, idCol, vecCol)

  /** Per-document token statistics (chars, whitespace + BPE-ish token
    * counts, distinct tokens, average token length).
    */
  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.TextAnalysis.textStats(docs, idCol, textCol)

  def getTableHistory(name: String): JList[JMap[String, Object]] =
    new JArrayList(store.getTableHistory(name).map { v =>
      val m = new JHashMap[String, Object]()
      m.put("version", Int.box(v.version))
      m.put("columns", new JArrayList[String](v.columns.asJava))
      m.put("is_current", Boolean.box(v.isCurrent))
      m.put("committed_at", v.committedAt.map(Long.box).orNull)
      m.put("operation", v.operation.orNull)
      m.put("rows", v.rows.map(Long.box).orNull)
      m
    }.asJava)
}

object PyFeatureStore {

  /** Entry point for the Python wrapper: `null` root resolves to the
    * storage default, exactly as the Scala constructor's default.
    */
  def open(
      spark: SparkSession,
      root: String,
      maxVersions: Int,
      partitionGranularity: String): PyFeatureStore =
    new PyFeatureStore(
      new FeatureStore(spark, root, maxVersions, partitionGranularity))
}
