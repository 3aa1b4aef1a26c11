package graft.store

import java.net.URI
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STORAGE SEAM of the feature store: version-addressed table data
  * behind a deliberately narrow contract, so the physical format is a
  * deployment choice. The shipped implementation ([[Storage]]) is
  * zero-dependency versioned parquet with manifest-chained segments; a
  * transactional table format drops in behind the same seam
  * (SURVEY.md §1.3 names the scale mapping):
  *
  *   - Delta Lake: [[write]] → transactional append/overwrite + commit;
  *     version numbers → Delta versions (time travel), [[readSegments]]
  *     → `VERSION AS OF` reads, [[deleteTable]] → DROP + VACUUM, and
  *     [[FeatureStore.vacuum]] → Delta VACUUM.
  *   - Iceberg: versions → snapshots, the segment manifests → Iceberg's
  *     own manifest lists, vacuum → expire_snapshots /
  *     remove_orphan_files.
  *
  * What those formats ADD over the default — multi-table transactions
  * and snapshot-isolated readers during concurrent delete — comes from
  * their commit protocols; the default deliberately scopes to
  * single-writer-per-table (atomic catalog rename + foreign-writer
  * detection, [[CatalogPersistence]]) per the reference's
  * zero-infrastructure stance.
  */
/** Result of one segment write: the row count plus the segment's
  * timestamp range (epoch millis, None for an empty/all-null segment).
  * The range is observed by the write job itself — zero extra passes —
  * and becomes the catalog's per-segment data-skipping statistics
  * ([[TableMeta.segStats]]): a PIT read at cutoff T skips every segment
  * whose minimum timestamp is after T.
  */
final case class WriteResult(
    rows: Long, minTsMillis: Option[Long], maxTsMillis: Option[Long],
    // per-column null count + min/max for the segment's eligible columns
    // ([[ColumnStats]]) — observed by the same write job, zero extra
    // passes; feeds predicate-level data skipping ([[StatsPruning]])
    colStats: Map[String, ColStat] = Map.empty)

/** Everything a commit marker records about one committed version — the
  * transaction log's own copy of the catalog facts for that version,
  * which is what lets a store RECONCILE versions another writer
  * committed but whose catalog save it never saw
  * ([[TxnLogStorage]] multi-writer arbitration). `segmentRows` is the
  * version's own segment; `tableRows` the cumulative table size at this
  * version (they differ on append manifests).
  */
final case class CommitMeta(
    segmentRows: Long,
    tableRows: Long,
    columns: Seq[String],
    segments: Seq[Int],
    minTsMillis: Option[Long],
    maxTsMillis: Option[Long],
    committedAt: Long,
    // Spark DDL type per column — carried in the commit marker so a
    // catalog reconciled from another writer's log can pad evolved
    // chained reads ([[TableMeta.columnTypes]]); empty on legacy markers
    columnTypes: Map[String, String] = Map.empty,
    // what produced this version — "register" | "append" | "compact" |
    // "delete" | "upsert" — the DESCRIBE HISTORY operation column and
    // the fact that lets the change feed ([[FeatureStore.getChanges]])
    // skip content-preserving compactions without diffing them. Empty
    // on legacy markers/catalogs (operation unknown).
    operation: String = "",
    // rows in this commit's RECORDED change set (-1 = none recorded).
    // The change feed trusts a change-data file ONLY when the commit
    // that owns the version says it wrote one — a crashed mutation's
    // leftover file at a reused version number must never be
    // misattributed to the commit that eventually lands there.
    changeRows: Long = -1L,
    // column-level skipping stats of this version's OWN segment
    // ([[ColumnStats]]); empty for commits that wrote no segment
    // (manifest-only deletes, restores) and for legacy markers
    colStats: Map[String, ColStat] = Map.empty,
    // the table's CHECK constraints as of this commit (name → SQL) —
    // carried so a catalog reconciled purely from markers keeps
    // enforcing them
    constraints: Map[String, String] = Map.empty,
    // clustering spec as of this commit ([[TableMeta.clusterSpec]]) —
    // set by optimize commits so marker-only reconciliation keeps
    // incremental optimize working
    clusterSpec: Option[String] = None)

trait VersionStorage {
  /** Write one version snapshot/segment; returns the row count and the
    * segment's observed timestamp range.
    */
  def write(name: String, version: Int, df: DataFrame,
      entityCol: String, tsCol: String): WriteResult
  /** [[write]] with a CLUSTERED physical layout: rows range-partitioned
    * and sorted by `cluster` (arbitrary expressions — a z-value works)
    * within the storage's own partitioning, so parquet file/row-group
    * min-max stats become tight on the cluster keys and selective scans
    * skip most of the bytes. Layout-only: same rows, same schema, same
    * read paths. Default ignores the hint (a storage that can't cluster
    * is still correct).
    */
  def writeClustered(name: String, version: Int, df: DataFrame,
      entityCol: String, tsCol: String,
      cluster: Seq[org.apache.spark.sql.Column]): WriteResult =
    write(name, version, df, entityCol, tsCol)
  /** Read one version segment, original column order, optional as-of
    * pruning bound.
    */
  def read(name: String, version: Int, columns: Seq[String],
      asOf: Option[java.sql.Timestamp] = None): DataFrame
  /** Read the union of a version manifest's segments. `columnTypes`
    * (Spark DDL per column, the catalog's [[CommitMeta.columnTypes]]
    * record) lets a requested column a segment predates — merge-schema
    * evolution — be padded with a correctly-typed null; a missing
    * column with no recorded type still fails analysis, exactly as
    * before evolution existed.
    */
  def readSegments(name: String, segments: Seq[Int], columns: Seq[String],
      asOf: Option[java.sql.Timestamp] = None,
      columnTypes: Map[String, String] = Map.empty): DataFrame
  def deleteVersion(name: String, version: Int): Unit
  def deleteTable(name: String): Unit
  /** Move a table's entire physical lineage (segments, change data,
    * any arbitration log living under the table directory) to a new
    * name — ONE metadata-level directory rename, never a data copy
    * (O(1) on HDFS/posix; object stores without atomic rename should
    * bind a storage that overrides this). `to` must not exist.
    */
  def renameTable(from: String, to: String): Unit =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} does not support table rename")
  /** Persist a version's RECORDED CHANGE ROWS (user columns + a
    * `_change_type` tag) — the Delta `_change_data` discipline: a
    * mutation that rewrites segments writes its exact change set at
    * commit time (O(changes) extra write), so the change feed reads it
    * back O(changes) instead of diffing two snapshots. Returns the row
    * count written, or -1 when this storage does not support change
    * data (the feed then falls back to the exact diff).
    */
  def writeChangeData(name: String, version: Int, df: DataFrame): Long = -1L
  /** The recorded change rows of a version, if any were written. */
  def readChangeData(name: String, version: Int): Option[DataFrame] = None
  /** Version segments physically present (storage-side truth for vacuum). */
  def listVersionDirs(name: String): Seq[Int]
  /** Tables physically present under the root. */
  def listTableDirs(): Seq[String]

  // ------------------------------------------------- version authority
  // Optional multi-writer arbitration. The default implementations keep
  // the shipped single-writer-per-table contract: the CATALOG is the
  // sole version authority, reservation always succeeds, and commit
  // metadata lives nowhere but the catalog. A transactional adapter
  // ([[TxnLogStorage]]) overrides all of them to make its log the
  // authority, which is what lets two stores on one root interleave
  // registers safely.

  /** True when this storage arbitrates version numbers itself; the
    * store then retries lost races instead of failing fast on a
    * foreign writer.
    */
  def arbitrates: Boolean = false
  /** Atomically claim `version` of `name` for exclusive write; false
    * means another writer holds or committed it (caller re-reads and
    * retries with the next number).
    */
  def reserveVersion(name: String, version: Int): Boolean = true
  /** Highest version visibly claimed in the storage's own authority
    * (committed or reserved in flight); None when the catalog is the
    * only authority.
    */
  def maxClaimedVersion(name: String): Option[Int] = None
  /** Release a reservation THIS writer holds without committing (the
    * claim's write or validation failed) so the number doesn't stay
    * wedged until a vacuum sweep; foreign reservations are left alone.
    */
  def releaseVersion(name: String, version: Int): Unit = ()
  /** Publish the commit record for a written version (the storage-side
    * commit point). No-op for catalog-authoritative storage.
    */
  def commitVersion(name: String, version: Int, meta: CommitMeta): Unit = ()
  /** Commit records of committed versions, for catalog reconciliation
    * after racing writers; versions matching `skip` are not even parsed
    * (the retry loop passes the already-absorbed set, so contention
    * costs O(new markers), not O(history), per iteration). Empty for
    * catalog-authoritative storage.
    */
  def committedMeta(
      name: String, skip: Int => Boolean = _ => false): Map[Int, CommitMeta] =
    Map.empty
  /** Drop any version-authority state of a RETIRED lineage so a
    * delete + re-register can restart numbering at 1 (the explicit
    * re-register-only overwrite branch; called by the store only when
    * the table is absent from every catalog and ledgered as retired).
    */
  def resetVersionAuthority(name: String): Unit = ()
  /** Reclaim arbitration leftovers of crashed writers (reservations
    * never committed, orphaned temp markers) older than the given age.
    * Run by [[FeatureStore.vacuum]] under its grace window.
    */
  def sweepUncommitted(name: String, olderThanMillis: Long): Unit = ()
}

/** Versioned parquet storage: one directory per table version,
  * `<root>/<table>/v=<n>/` — the durable analog of the reference's
  * in-memory `history: Dict[int, DataFrame]` (store.py:51-69, 204).
  *
  * Write layout is chosen for the 100 TB read paths, implementing what the
  * reference's author lists as future work (reference README.md:167,
  * time-based partitioning):
  *   - partitioned by a derived `_ts_date` period column (month by
  *     default, day for high-density tables) → partition pruning for
  *     `timestamp <= T` scans;
  *   - the shuffle before the write is keyed by the PARTITION column,
  *     not the entity: every task then holds few periods, so the file
  *     count stays ≈ #periods. (Keying by entity looks natural but makes
  *     every task write a file into every period directory —
  *     tasks × periods tiny files.)
  *   - within each file, rows sorted by (entity, timestamp) → parquet
  *     row-group min/max stats make per-entity probes skip row groups.
  */
final class Storage(
    spark: SparkSession,
    root: String,
    granularity: String = "month") extends VersionStorage {

  private val DateCol = "_ts_date"

  private def period(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    granularity match {
      case "day"   => to_date(ts)
      case "month" => trunc(ts, "month")
      case other =>
        throw new FeatureValidationError(
          s"Unsupported partition granularity '$other' (day|month)")
    }


  def tablePath(name: String): String = s"$root/$name"
  def versionPath(name: String, version: Int): String =
    s"${tablePath(name)}/v=$version"
  /** Recorded change rows of a version (underscore dir: never listed as
    * a version; reclaimed with the version by [[deleteVersion]]).
    */
  def changeDataPath(name: String, version: Int): String =
    s"${tablePath(name)}/_cdf/v=$version"

  /** Write one version snapshot; returns the row count and timestamp
    * range, observed from the write job itself (an `Observation` rides
    * the write plan as a CollectMetrics node) — no second footer-read
    * job per register, and the range feeds segment-level data skipping
    * for free.
    */
  def write(
      name: String,
      version: Int,
      df: DataFrame,
      entityCol: String,
      tsCol: String): WriteResult =
    writeWith(name, version, df, entityCol, tsCol)(
      _.repartition(col(DateCol))
        .sortWithinPartitions(col(entityCol), col(tsCol)))

  /** Clustered layout ([[VersionStorage.writeClustered]]): range-
    * partition and sort by (period, cluster...) so each task holds a
    * contiguous key range of few periods — file count stays bounded,
    * and within a period directory every file covers a tight cluster-
    * key interval (parquet min/max skipping does the rest at scan).
    */
  override def writeClustered(
      name: String,
      version: Int,
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      cluster: Seq[org.apache.spark.sql.Column]): WriteResult =
    writeWith(name, version, df, entityCol, tsCol) { d =>
      val keys = col(DateCol) +: cluster
      d.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    }

  private def writeWith(
      name: String,
      version: Int,
      df: DataFrame,
      entityCol: String,
      tsCol: String)(layout: DataFrame => DataFrame): WriteResult = {
    val path = versionPath(name, version)
    val obs = org.apache.spark.sql.Observation(s"graft_write_${name}_v$version")
    // per-column min/max/nulls ride the SAME CollectMetrics node as the
    // row count — column-level skipping stats at zero extra passes.
    // The node sits ABOVE the layout exchange: a range partitioner
    // SAMPLES its child to pick boundaries, and metrics below it would
    // be double-counted by the sampling pass. Entity/timestamp are
    // priority columns: wide schemas must not push the keys every read
    // prunes on past the stats cap.
    val statFields =
      ColumnStats.eligible(df.schema, priority = Seq(entityCol, tsCol))
    layout(df.withColumn(DateCol, period(col(tsCol))))
      .observe(
        obs,
        count(lit(1)).as("rows"),
        Seq(
          min(col(tsCol)).as("min_ts"),
          max(col(tsCol)).as("max_ts")) ++ ColumnStats.metrics(statFields): _*)
      .write
      .mode("overwrite")
      .partitionBy(DateCol)
      .parquet(path)
    // a ZERO-ROW segment (SQL CREATE TABLE's empty v1) writes no data
    // files under partitionBy, and a later read of the bare directory
    // cannot infer a schema — append one empty TYPED part file so the
    // segment reads back as the declared shape (DateCol rides as a
    // regular column there; per-segment reads filter/drop it the same
    // way)
    if (obs.get("rows").asInstanceOf[Long] == 0L)
      df.withColumn(DateCol, period(col(tsCol)))
        .limit(0)
        .write.mode("append").parquet(path)
    def millis(key: String): Option[Long] = obs.get(key) match {
      case t: java.sql.Timestamp    => Some(t.getTime)
      case i: java.time.Instant     => Some(i.toEpochMilli)
      case d: java.time.LocalDateTime => // TIMESTAMP_NTZ observation
        Some(d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      case _ => None // null: empty or all-null segment — no skipping stats
    }
    WriteResult(
      obs.get("rows").asInstanceOf[Long], millis("min_ts"), millis("max_ts"),
      ColumnStats.fromMetrics(statFields, obs.get))
  }

  /** Read one version snapshot with the original column order restored
    * (the partition column is internal and dropped). When an as-of
    * cutoff is known, the derived period predicate prunes partitions at
    * planning time — `timestamp <= T ⇒ _ts_date <= period(T)` — which is
    * the reference author's wish-list item (README.md:167, "partitioning
    * by month reduces scan size by 24x") implemented natively. The bound
    * is derived with the SAME `period` expression that produced the
    * partition values, so write and read agree under any session
    * timezone (a driver-side UTC conversion would silently prune valid
    * rows in non-UTC sessions).
    */
  def read(
      name: String,
      version: Int,
      columns: Seq[String],
      asOf: Option[java.sql.Timestamp]): DataFrame = {
    val base = Storage.readParquetMemo(spark, versionPath(name, version))
    val pruned =
      asOf.fold(base)(t => base.filter(col(DateCol) <= period(lit(t))))
    pruned.select(columns.map(col): _*)
  }

  /** Read the union of a version MANIFEST's segments (incremental
    * registration): each segment is one version directory; per-segment
    * as-of pruning applies before the union, so partition pruning works
    * exactly as in the single-snapshot read. Segments are append deltas
    * of one table version lineage, so their schemas match by
    * construction ([[FeatureStore.registerAppend]] enforces it).
    */
  def readSegments(
      name: String,
      segments: Seq[Int],
      columns: Seq[String],
      asOf: Option[java.sql.Timestamp],
      columnTypes: Map[String, String]): DataFrame =
    segments.map { s =>
      val base = Storage.readParquetMemo(spark, versionPath(name, s))
      val pruned = asOf.fold(base)(t => base.filter(col(DateCol) <= period(lit(t))))
      // pad columns this segment predates (merge-schema evolution) with
      // typed nulls from the catalog's type record; columns without a
      // recorded type fall through to the strict select below and fail
      // analysis exactly as they did before evolution existed
      val padded = columns
        .filterNot(pruned.columns.contains)
        .flatMap(c => columnTypes.get(c).map(c -> _))
        .foldLeft(pruned) { case (df, (c, t)) =>
          df.withColumn(c, lit(null).cast(t))
        }
      padded.select(columns.map(col): _*)
    }.reduce(_.unionByName(_))

  /** One plain (unpartitioned) parquet write — change sets are small
    * relative to their mutation; an Observation rides the write for
    * the row count, as in [[write]].
    */
  override def writeChangeData(name: String, version: Int, df: DataFrame): Long = {
    val obs = org.apache.spark.sql.Observation(
      s"graft_cdf_${name}_v$version")
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite")
      .parquet(changeDataPath(name, version))
    obs.get("rows").asInstanceOf[Long]
  }

  override def readChangeData(name: String, version: Int): Option[DataFrame] = {
    val p = new Path(changeDataPath(name, version))
    if (fs(p).exists(p))
      Some(Storage.readParquetMemo(spark, p.toString))
    else None
  }

  def deleteVersion(name: String, version: Int): Unit = {
    delete(versionPath(name, version))
    delete(changeDataPath(name, version))
    Storage.invalidateSchemas(versionPath(name, version))
    Storage.invalidateSchemas(changeDataPath(name, version))
  }

  def deleteTable(name: String): Unit = {
    delete(tablePath(name))
    Storage.invalidateSchemas(tablePath(name))
  }

  /** One atomic directory rename — the whole lineage (every `v=<n>`
    * segment, `_cdf`, a colocated `_txn` log) moves as a metadata
    * operation, zero bytes of data copied regardless of table size.
    */
  override def renameTable(from: String, to: String): Unit = {
    val src = new Path(tablePath(from))
    val dst = new Path(tablePath(to))
    val f = fs(src)
    if (!f.exists(src))
      throw new FeatureValidationError(
        s"cannot rename '$from': no data directory at $src")
    if (f.exists(dst))
      throw new FeatureValidationError(
        s"cannot rename '$from' to '$to': $dst already exists")
    if (!f.rename(src, dst))
      throw new FeatureStorageError(
        s"filesystem refused to rename $src to $dst")
    // the old path is free for a future re-register; the new path's
    // schemas re-infer on first read
    Storage.invalidateSchemas(tablePath(from))
  }

  /** `v=<n>` version directories physically present for `name` —
    * the storage-side truth [[FeatureStore.vacuum]] reconciles against
    * the catalog's retained manifests.
    */
  def listVersionDirs(name: String): Seq[Int] = {
    val p = new Path(tablePath(name))
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toIntOption }
      .flatten
      .sorted
  }

  /** Table directories under the storage root (plain files — the
    * catalog — are skipped).
    */
  def listTableDirs(): Seq[String] = {
    val p = new Path(root)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      // store-internal metadata dirs (e.g. _leases/) are never tables;
      // underscore names are reserved, matching _catalog.tsv/_retired.tsv
      .filterNot(_.startsWith("_"))
      .sorted
  }

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def delete(pathStr: String): Unit = {
    val path = new Path(pathStr)
    if (fs(path).exists(path)) { fs(path).delete(path, true); () }
  }
}

object Storage {

  /** Inferred-parquet-schema memo, keyed by directory path. A
    * COMMITTED version (or change-data) directory is IMMUTABLE —
    * versions are claimed monotonically, mutations always mint a new
    * directory — so its footer schema is a constant of the path: infer
    * once per JVM, then pass the known schema and every later read of
    * the same lineage skips the footer-inference job entirely. Each
    * `spark.read.parquet` call otherwise dispatches one such job
    * (~20-40 ms of pure driver latency); a maintained-IVM read that
    * touches the seed snapshot, two change sets and a three-segment
    * manifest was paying 5 of its 16 jobs there (JobProfile
    * store_ivm_minmax, round 11). A real metastore-backed deployment
    * pays this once at catalog registration — this memo is that, for
    * the path-addressed layout.
    *
    * Invalidated on deleteVersion / deleteTable / renameTable (a
    * deleted table can be re-registered at the same path with a new
    * schema) and by [[graft.Tables.invalidate]]. Cross-PROCESS
    * delete-then-recreate follows the store's existing long-lived
    * reader contract (call `refresh()` after external commits).
    */
  private val schemaMemo = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]

  private[store] def readParquetMemo(
      spark: SparkSession, path: String): DataFrame =
    schemaMemo.get(path) match {
      case Some(sch) => spark.read.schema(sch).parquet(path)
      case None =>
        val df = spark.read.parquet(path)
        schemaMemo.put(path, df.schema)
        df
    }

  /** Drop memoized schemas at `path` and below. Exact-or-child match:
    * "t/v=1" must not sweep "t/v=10".
    */
  private[graft] def invalidateSchemas(path: String): Unit =
    schemaMemo.keys
      .filter(k => k == path || k.startsWith(path + "/"))
      .foreach(schemaMemo.remove)

  private[graft] def invalidateAllSchemas(): Unit = schemaMemo.clear()

  /** A fresh session-local storage root under java.io.tmpdir — keeps the
    * reference's zero-infrastructure stance (README.md:122) while being
    * swappable for any Hadoop-compatible URI (s3a://, hdfs://) at scale.
    */
  def defaultRoot(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-feature-store-")
      .toUri
    new URI(dir.toString).getPath.stripSuffix("/")
  }
}
