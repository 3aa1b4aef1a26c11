package graft.store

import java.sql.Timestamp
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import scala.collection.immutable.SortedMap

/** Point-in-time correct feature store on Spark — the engine's public API,
  * mirroring the reference surface one-to-one
  * (reference: src/ml_feature_store/store.py:95-401):
  *
  *   register / get / getTrainingSet / getVersion / listTables /
  *   getTableInfo / delete / tableNames / maxVersions
  *
  * Differences by design (documented in SURVEY.md §7.4):
  *   - storage is versioned parquet directories (not in-memory pandas), so
  *     tables scale past one machine's RAM;
  *   - a deterministic tie-break column `_ingest_key` (xxhash64 of the
  *     full row) is added at registration: the reference's winner among
  *     duplicate (entity, ts) rows is unspecified, this engine's is total;
  *   - `description` is accepted and dropped, exactly like the reference
  *     (store.py:133 — dead parameter).
  */
final class FeatureStore(
    val spark: SparkSession,
    storageRoot: String = null,
    val maxVersions: Int = 10,
    partitionGranularity: String = "month") {

  if (maxVersions < 1)
    throw new IllegalArgumentException(
      s"max_versions must be >= 1, got $maxVersions")

  import Validation.{EntityIdColumn, TimestampColumn}

  private val root =
    Option(storageRoot).getOrElse(Storage.defaultRoot())
  private val storage = new Storage(spark, root, partitionGranularity)
  private val catalog = new Catalog
  // Reopen an existing store: the catalog file under the root (written
  // on every mutation) restores tables, versions and schemas.
  CatalogPersistence.load(root).foreach(catalog.put)

  /** Internal deterministic tie-break column; never surfaced in output. */
  private val IngestKeyCol = "_ingest_key"

  def tableNames: Seq[String] = catalog.names

  /** Register (create or new-version) a feature table
    * (reference: store.py:129-216). Validates required columns +
    * non-emptiness, casts `timestamp` to TimestampType, writes a sorted,
    * day-partitioned parquet snapshot, prunes history beyond
    * `maxVersions`.
    */
  def register(
      name: String,
      df: DataFrame,
      description: String = ""): FeatureTableInfo = this.synchronized {
    Validation.validateDataFrame(df, name)
    val prepared = prepare(df)
    val now = System.currentTimeMillis()
    val meta = catalog.get(name) match {
      case None =>
        val rows = storage.write(name, 1, prepared, EntityIdColumn, TimestampColumn)
        TableMeta(name, 1, rows, now, now, SortedMap(1 -> df.columns.toSeq))
      case Some(cur) =>
        val v = cur.version + 1
        val rows = storage.write(name, v, prepared, EntityIdColumn, TimestampColumn)
        val withNew = cur.copy(
          version = v,
          rowCount = rows,
          updatedAt = now,
          versions = cur.versions + (v -> df.columns.toSeq))
        prune(withNew)
    }
    catalog.put(meta)
    CatalogPersistence.save(root, catalog.all)
    meta.info
  }

  /** PIT snapshot read (reference: store.py:218-259): latest row per
    * requested entity at or before `timestamp`. Unknown entities yield no
    * rows (not an error); unknown table raises FeatureTableNotFoundError.
    */
  def get(
      name: String,
      entityIds: Seq[Any],
      timestamp: Any,
      columns: Option[Seq[String]] = None): DataFrame = {
    val meta = catalog.getOrThrow(name)
    val asOf = FeatureStore.normalizeTimestamp(timestamp)
    PointInTime.pitSnapshot(
      currentData(meta, Some(asOf)),
      lit(asOf),
      entityIds = Some(entityIds),
      columns = columns,
      tieBreakCols = Seq(IngestKeyCol),
      tableName = name)
  }

  /** Point-in-time training-set join (reference: store.py:261-308):
    * for each (entity, ts) spine row, the latest feature row at or before
    * ts; non-matches dropped, duplicate spine rows duplicated.
    */
  def getTrainingSet(
      name: String,
      entityTimestamps: DataFrame,
      columns: Option[Seq[String]] = None,
      maxAgeSeconds: Option[Long] = None): DataFrame = {
    val meta = catalog.getOrThrow(name)
    PointInTime.asOfJoin(
      entityTimestamps,
      currentData(meta),
      columns = columns,
      tieBreakCols = Seq(IngestKeyCol),
      tableName = name,
      maxAgeSeconds = maxAgeSeconds)
  }

  /** Multi-table training view: left as-of join each named table onto
    * the spine in order, feature columns prefixed `<table>_`. Every
    * spine row survives (entities with no history in some table get
    * nulls there — the trainer decides the imputation, not the store).
    * Cost is one entity-keyed shuffle per table.
    */
  def getFeatureView(spine: DataFrame, names: Seq[String]): DataFrame = {
    if (names.isEmpty)
      throw new FeatureValidationError("getFeatureView needs at least one table")
    names.foldLeft(spine) { (acc, name) =>
      val meta = catalog.getOrThrow(name)
      PointInTime.asOfJoinLeft(
        acc,
        currentData(meta),
        prefix = s"${name}_",
        tieBreakCols = Seq(IngestKeyCol))
    }
  }

  /** Windowed aggregation features over the stored table: for each
    * spine row (entity, t), aggregates of the table's rows inside
    * (t − window, t] — see [[WindowFeatures.windowAggJoin]]. The
    * training-set twin of [[getTrainingSet]] for "activity in the last
    * N days" features.
    */
  def getWindowFeatures(
      name: String,
      entityTimestamps: DataFrame,
      windowSeconds: Long,
      aggs: Seq[WindowFeatures.WindowAgg]): DataFrame = {
    val meta = catalog.getOrThrow(name)
    val inputs = aggs.filter(_.fn != "rows").map(_.input).distinct
    Validation.validateColumns(inputs, meta.columns, name)
    WindowFeatures.windowAggJoin(
      entityTimestamps, currentData(meta), windowSeconds, aggs)
  }

  /** The k most recent rows per requested entity at or before
    * `timestamp`, each tagged with its 1-based `recency_rank` — the
    * "last N interactions" read ([[PointInTime.latestKPerEntity]]
    * under the store's PIT cutoff and deterministic tie-break).
    */
  def getRecent(
      name: String,
      entityIds: Seq[Any],
      timestamp: Any,
      k: Int): DataFrame = {
    val meta = catalog.getOrThrow(name)
    val asOf = FeatureStore.normalizeTimestamp(timestamp)
    val eligible = currentData(meta, Some(asOf))
      .filter(col(TimestampColumn) <= lit(asOf))
      .filter(col(EntityIdColumn).isin(entityIds: _*))
    PointInTime
      .latestKPerEntity(eligible, k, tieBreakCols = Seq(IngestKeyCol))
      .select((meta.columns :+ "recency_rank").map(col): _*)
  }

  /** Gap-based sessions over the stored table — see
    * [[WindowFeatures.sessionize]]; the store supplies its internal
    * ingest key as the deterministic within-timestamp tie-break.
    */
  def getSessions(name: String, gapSeconds: Long): DataFrame = {
    val meta = catalog.getOrThrow(name)
    WindowFeatures.sessionize(
      currentData(meta), gapSeconds, tieBreakCols = Seq(IngestKeyCol))
  }

  /** Per-column data-quality profile of the stored table's current
    * version — see [[graft.ops.Profiling.profile]]. Defaults to every
    * registered column; `exactDistinct = false` switches distinct
    * counts to one-pass HLL sketches for very large tables.
    */
  def profileTable(
      name: String,
      columns: Option[Seq[String]] = None,
      exactDistinct: Boolean = true): DataFrame = {
    val meta = catalog.getOrThrow(name)
    // plain membership, not validateColumns: profiling entity_id /
    // timestamp (cardinality, time range) is legitimate here
    columns.foreach { cs =>
      val unknown = cs.filterNot(meta.columns.contains)
      if (unknown.nonEmpty)
        throw new FeatureValidationError(
          s"Columns not found in table '$name': ${unknown.mkString(", ")}")
    }
    val cols = columns.getOrElse(meta.columns)
    graft.ops.Profiling.profile(currentData(meta), cols, exactDistinct)
  }

  /** Retrieve the current or a historical snapshot
    * (reference: store.py:377-401).
    */
  def getVersion(name: String, version: Int): DataFrame = {
    val meta = catalog.getOrThrow(name)
    val cols = meta.versions.getOrElse(
      version,
      throw new FeatureTableNotFoundError(
        s"Version $version of table '$name' not found. " +
          s"Available versions: ${meta.versions.keys.mkString(", ")}"))
    storage.read(name, version, cols)
  }

  def listTables(): Seq[FeatureTableInfo] = catalog.all.map(_.info)

  def getTableInfo(name: String): FeatureTableInfo =
    catalog.getOrThrow(name).info

  /** Drop a table and all versions; returns false (never throws) when the
    * table does not exist (reference: store.py:362-375).
    */
  def delete(name: String): Boolean = this.synchronized {
    catalog.remove(name) match {
      case Some(_) =>
        storage.deleteTable(name)
        CatalogPersistence.save(root, catalog.all)
        true
      case None => false
    }
  }

  // ---------------------------------------------------------------- private

  /** Current-version DataFrame including the internal tie-break column;
    * a known as-of cutoff enables day-partition pruning at the scan.
    */
  private def currentData(
      meta: TableMeta,
      asOf: Option[Timestamp] = None): DataFrame =
    storage.read(meta.name, meta.version, meta.columns :+ IngestKeyCol, asOf)

  /** Cast timestamp + attach the deterministic ingest key
    * (reference: store.py:472-486 casts and sorts; the physical sort
    * happens at write time in [[Storage]]). Unparseable timestamp values
    * are rejected rather than silently nulled — the reference's
    * `pd.to_datetime` raises, and a silently-null row would vanish from
    * every PIT read while still counting toward rowCount.
    */
  private def prepare(df: DataFrame): DataFrame = {
    val tsIsTemporal = df.schema(TimestampColumn).dataType match {
      case _: org.apache.spark.sql.types.TimestampType    => true
      case _: org.apache.spark.sql.types.TimestampNTZType => true
      case _: org.apache.spark.sql.types.DateType         => true
      case _                                              => false
    }
    if (!tsIsTemporal) {
      val bad = df.filter(
        col(TimestampColumn).isNotNull &&
          col(TimestampColumn).cast(TimestampType).isNull)
      if (!bad.isEmpty)
        throw new FeatureValidationError(
          s"Column '$TimestampColumn' contains values that cannot be cast to timestamp")
    }
    df.withColumn(TimestampColumn, col(TimestampColumn).cast(TimestampType))
      .withColumn(IngestKeyCol, xxhash64(df.columns.map(col): _*))
  }

  /** Keep the newest `maxVersions` snapshots, current counting as one
    * (reference: store.py:585-599).
    */
  private def prune(meta: TableMeta): TableMeta = {
    val excess = meta.versions.keys.toSeq.sorted.dropRight(maxVersions)
    excess.foreach(v => storage.deleteVersion(meta.name, v))
    meta.copy(versions = meta.versions -- excess)
  }
}

object FeatureStore {

  /** Timestamp coercion at the API boundary
    * (reference: store.py:602-611 `pd.Timestamp(ts)`): accepts
    * java.sql.Timestamp, java.time.Instant/LocalDateTime/LocalDate and
    * ISO-ish strings ("2024-01-15" or "2024-01-15 10:30:00"), all
    * interpreted as UTC (naive-as-UTC convention, SURVEY.md §1.2).
    */
  def normalizeTimestamp(ts: Any): Timestamp = ts match {
    case t: Timestamp     => t
    case i: Instant       => Timestamp.from(i)
    case d: LocalDateTime => Timestamp.from(d.toInstant(ZoneOffset.UTC))
    case d: LocalDate     => Timestamp.from(d.atStartOfDay.toInstant(ZoneOffset.UTC))
    case d: java.util.Date => new Timestamp(d.getTime)
    case s: String =>
      val norm = if (s.length == 10) s"${s}T00:00:00" else s.replace(' ', 'T')
      Timestamp.from(LocalDateTime.parse(norm).toInstant(ZoneOffset.UTC))
    case other =>
      throw new FeatureValidationError(
        s"Cannot interpret timestamp value: $other (${other.getClass.getName})")
  }
}
