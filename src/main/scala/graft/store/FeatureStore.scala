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
    partitionGranularity: String = "month",
    // the storage seam: swap the zero-dependency parquet layout for a
    // transactional table format by supplying a different
    // [[VersionStorage]] for the resolved (session, root, granularity)
    storageFactory: (SparkSession, String, String) => VersionStorage =
      new Storage(_, _, _),
    // the catalog persistence seam (see [[CatalogIO]]): every durable
    // catalog read/write goes through here — ONE save per mutation is
    // the crash-atomicity contract (a version and its streaming
    // high-water commit together or not at all)
    catalogIO: CatalogIO = CatalogPersistence) {

  if (maxVersions < 1)
    throw new IllegalArgumentException(
      s"max_versions must be >= 1, got $maxVersions")

  import Validation.{EntityIdColumn, TimestampColumn}

  private val root =
    Option(storageRoot).getOrElse(Storage.defaultRoot())
  private val storage: VersionStorage =
    storageFactory(spark, root, partitionGranularity)
  private val catalog = new Catalog
  // Reopen an existing store: the catalog file under the root (written
  // on every mutation) restores tables, versions and schemas.
  catalogIO.load(root).foreach(catalog.put)

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
      description: String = ""): FeatureTableInfo =
    registerWith(name, df, watermark = None)

  /** [[register]] with an optional streaming high-water to stamp into
    * the SAME catalog commit as the new version — crash-atomicity for
    * [[registerBatch]]: there is no window where a version exists
    * without its batch watermark (which would make a recovery replay
    * mint a duplicate).
    */
  private def registerWith(
      name: String,
      df: DataFrame,
      watermark: Option[(String, Long)]): FeatureTableInfo = this.synchronized {
    Validation.validateDataFrame(df, name)
    detectForeignWriter(name)
    val prepared = prepare(df)
    val now = System.currentTimeMillis()
    val meta = catalog.get(name) match {
      case None =>
        val rows = storage.write(name, 1, prepared, EntityIdColumn, TimestampColumn)
        TableMeta(name, 1, rows, now, now, SortedMap(1 -> df.columns.toSeq),
          SortedMap(1 -> Seq(1)))
      case Some(cur) =>
        val v = cur.version + 1
        val rows = storage.write(name, v, prepared, EntityIdColumn, TimestampColumn)
        val withNew = cur.copy(
          version = v,
          rowCount = rows,
          updatedAt = now,
          versions = cur.versions + (v -> df.columns.toSeq),
          segments = cur.segments + (v -> Seq(v)))
        prune(withNew)
    }
    val stamped = stampWatermark(meta, watermark)
    catalog.put(stamped)
    catalogIO.save(root, catalog.all)
    stamped.info
  }

  private def stampWatermark(
      m: TableMeta,
      wm: Option[(String, Long)]): TableMeta =
    wm.fold(m) { case (sid, b) =>
      m.copy(batchWatermarks = m.batchWatermarks + (sid -> b))
    }

  /** Incremental register (engine extension — SURVEY.md §7.4 risk 5):
    * creates a new version whose data is the previous version PLUS
    * `df`, but writes ONLY `df` to storage — O(delta) bytes and files
    * per version instead of a full O(table) snapshot, which is the
    * difference between a feasible and an infeasible daily register at
    * 100 TB. The new version's manifest chains the previous segments;
    * [[getVersion]] and every PIT read reproduce exact snapshots for
    * ALL versions. Falls back to a plain [[register]] for new tables.
    *
    * Append semantics (immutable-observations model): rows are added,
    * never replaced — the natural shape for event-sourced features.
    * The delta must carry exactly the current columns (schema drift
    * needs a full snapshot register, where drift is explicit).
    *
    * When a manifest would exceed `maxSegments`, the version is written
    * as a COMPACTED full snapshot instead (read amplification stays
    * bounded: every read unions at most `maxSegments` segment scans) —
    * the standard log-plus-compaction discipline.
    */
  def registerAppend(
      name: String,
      df: DataFrame,
      maxSegments: Int = 16,
      description: String = ""): FeatureTableInfo =
    registerAppendWith(name, df, maxSegments, watermark = None)

  private def registerAppendWith(
      name: String,
      df: DataFrame,
      maxSegments: Int,
      watermark: Option[(String, Long)]): FeatureTableInfo = this.synchronized {
    if (maxSegments < 1)
      throw new IllegalArgumentException(s"maxSegments must be >= 1, got $maxSegments")
    catalog.get(name) match {
      case None => registerWith(name, df, watermark)
      case Some(cur) =>
        Validation.validateDataFrame(df, name)
        detectForeignWriter(name)
        if (df.columns.toSeq != cur.columns)
          throw new FeatureValidationError(
            s"registerAppend('$name') requires the current schema " +
              s"${cur.columns.mkString("[", ", ", "]")}, got " +
              s"${df.columns.toSeq.mkString("[", ", ", "]")}; use register() for schema changes")
        val prepared = prepare(df)
        val now = System.currentTimeMillis()
        val v = cur.version + 1
        val chained = cur.segmentsOf(cur.version) :+ v
        val meta =
          if (chained.size > maxSegments) {
            // compact: materialize previous ∪ delta as one snapshot
            val full = currentData(cur).select(cur.columns.map(col): _*)
              .unionByName(df.select(cur.columns.map(col): _*))
            val rows = storage.write(name, v, prepare(full), EntityIdColumn, TimestampColumn)
            cur.copy(version = v, rowCount = rows, updatedAt = now,
              versions = cur.versions + (v -> cur.columns),
              segments = cur.segments + (v -> Seq(v)))
          } else {
            val deltaRows =
              storage.write(name, v, prepared, EntityIdColumn, TimestampColumn)
            cur.copy(version = v, rowCount = cur.rowCount + deltaRows, updatedAt = now,
              versions = cur.versions + (v -> cur.columns),
              segments = cur.segments + (v -> chained))
          }
        val pruned = stampWatermark(prune(meta), watermark)
        catalog.put(pruned)
        catalogIO.save(root, catalog.all)
        pruned.info
    }
  }

  /** Idempotent register for exactly-once STREAMING versioning, keyed
    * by STREAM IDENTITY: a version is minted only when `batchId` is
    * strictly newer than the highest batch id already recorded for
    * (table, stream). Structured Streaming's foreachBatch re-delivers
    * the last batch after a crash recovery with the SAME batch id
    * (batch ids are monotonic per checkpoint), so a replay is detected
    * and skipped — no duplicate version, no double-appended rows. The
    * high-water marks persist in the catalog file, making replay
    * detection survive a store reopen — which is exactly the
    * crash-recovery case that re-delivers.
    *
    * `streamId` should be the stream's checkpoint-stable identity —
    * `StreamingQuery.id` ([[graft.streaming.StreamingIngest]] wires
    * this automatically). Keying by stream is what makes a restart
    * with a FRESH checkpoint directory (batch ids back at 0 — the
    * common recovery after checkpoint corruption) safe: the new query
    * id opens a new high-water line and every batch registers, where a
    * per-table max would silently skip them all (data loss). Within
    * ONE stream a batch id can only repeat (crash replay of the last
    * batch → skipped) or advance; a REGRESSION means the caller reused
    * a streamId across checkpoint generations, and the store throws
    * [[FeatureConcurrencyError]] instead of silently dropping data.
    *
    * The watermark commits in the SAME catalog save as the version it
    * marks ([[registerWith]]) — a crash can lose both (replay
    * re-registers, correct) but never the watermark alone (which would
    * replay into a duplicate version).
    *
    * Returns `Some(info)` when a version was registered, `None` on a
    * skipped replay.
    */
  def registerBatch(
      name: String,
      df: DataFrame,
      batchId: Long,
      streamId: String = CatalogIO.LegacyStreamId): Option[FeatureTableInfo] =
    idempotent(name, streamId, batchId)(registerWith(name, df, _))

  /** The O(delta) twin of [[registerBatch]]: append-register `df` under
    * the same per-stream batch-id idempotence. This is the streaming
    * shape that actually survives 100 TB — each micro-batch writes only
    * its own rows ([[registerAppend]]'s manifest chaining), instead of
    * rewriting the accumulated table per batch, and a crash-recovery
    * replay appends nothing twice.
    */
  def registerAppendBatch(
      name: String,
      df: DataFrame,
      batchId: Long,
      maxSegments: Int = 16,
      streamId: String = CatalogIO.LegacyStreamId): Option[FeatureTableInfo] =
    idempotent(name, streamId, batchId)(
      registerAppendWith(name, df, maxSegments, _))

  private def idempotent(name: String, streamId: String, batchId: Long)(
      body: Option[(String, Long)] => FeatureTableInfo): Option[FeatureTableInfo] =
    this.synchronized {
      val seen = catalog.get(name).flatMap(_.batchWatermarks.get(streamId))
      if (seen.contains(batchId)) None // crash-recovery replay of the last batch
      else if (seen.exists(batchId < _))
        throw new FeatureConcurrencyError(
          s"Batch id $batchId for table '$name' regressed below the recorded " +
            s"high-water ${seen.get} of stream '$streamId'. A restarted stream " +
            "with a fresh checkpoint restarts batch ids at 0 — give it its own " +
            "stream identity (StreamingIngest passes StreamingQuery.id " +
            "automatically) rather than silently skipping its batches. If this " +
            "stream was deliberately restored from an older checkpoint BACKUP " +
            "(same query id, batch ids rewound), silently skipping is unsafe — " +
            "batches past the backup's last commit may recompose differently — " +
            "so after verifying the table's registered state, call " +
            "clearStreamWatermark(table, streamId) to let the replay register")
      else Some(body(Some(streamId -> batchId)))
    }

  /** OPERATOR TOOL for the one legitimate batch-id-regression case: a
    * stream deliberately restored from an older checkpoint BACKUP keeps
    * its query id but replays batch ids below the recorded high-water,
    * which [[registerBatch]] refuses (a replayed batch past the
    * backup's last commit may recompose with different contents, so
    * neither silent skip nor silent re-register is safe — the old
    * per-table skip was the silent-data-loss path this design
    * removed). After verifying what the restored stream will replay,
    * clear the stream's high-water so its batches register again;
    * replayed batches then mint new versions (duplicate CONTENT is
    * possible and visible, duplicate silent loss is not).
    *
    * Returns true when a watermark existed and was cleared.
    */
  def clearStreamWatermark(name: String, streamId: String): Boolean =
    this.synchronized {
      catalog.get(name) match {
        case Some(m) if m.batchWatermarks.contains(streamId) =>
          catalog.put(m.copy(batchWatermarks = m.batchWatermarks - streamId))
          catalogIO.save(root, catalog.all)
          true
        case _ => false
      }
    }

  /** Explicit compaction: materialize the CURRENT version's chained
    * manifest as a single-snapshot new version (data unchanged — only
    * the physical layout). The maintenance operation an append-heavy
    * table schedules off-peak: read amplification drops back to one
    * segment scan, and once older versions age out of the retention
    * window their delta segments become reclaimable. A no-op (returns
    * current info, writes nothing) when the current version is already
    * a single snapshot.
    */
  def compact(name: String): FeatureTableInfo = this.synchronized {
    val meta = catalog.getOrThrow(name)
    if (meta.segmentsOf(meta.version).size <= 1) meta.info
    else register(name, currentData(meta).select(meta.columns.map(col): _*))
  }

  /** Optimistic concurrency check: if the shared on-disk catalog knows a
    * newer version of `name` than this session does, another writer owns
    * the table now — fail fast instead of silently forking history.
    */
  private def detectForeignWriter(name: String): Unit = {
    val diskVersion = catalogIO.load(root)
      .find(_.name == name).map(_.version).getOrElse(0)
    val ours = catalog.get(name).map(_.version).getOrElse(0)
    if (diskVersion > ours)
      throw new FeatureConcurrencyError(
        s"Table '$name' was advanced to version $diskVersion by another writer " +
          s"(this session knows $ours); reopen the store to continue")
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
    storage.readSegments(name, meta.segmentsOf(version), cols)
  }

  /** Register the table as session TEMP VIEWS for SQL-first consumers:
    * `name` resolves to the current version and `name_v<k>` to every
    * retained version, all through the catalog's manifests (chained
    * segments and schema drift included). Views capture the version
    * that is current NOW — re-call after new registrations to refresh.
    * The table name must be a valid SQL identifier (it is used
    * verbatim as the view name).
    */
  def createOrReplaceViews(name: String): Unit = {
    val meta = catalog.getOrThrow(name)
    getVersion(name, meta.version).createOrReplaceTempView(name)
    meta.versions.keys.foreach { v =>
      getVersion(name, v).createOrReplaceTempView(s"${name}_v$v")
    }
  }

  /** Acquire a READ LEASE on `name`: until released (or expired past
    * vacuum's TTL), [[vacuum]] will not physically delete any retired
    * path of the table — the protection for readers that outlive the
    * grace window. Prefer the [[withReadLease]] bracket; use this pair
    * for multi-statement flows that span call sites. The table must
    * exist when leased (leasing is for readers, who need it to exist
    * anyway); the lease then protects across a concurrent delete.
    */
  def acquireReadLease(name: String): String = {
    catalog.getOrThrow(name)
    ReadLeases.acquire(root, name)
  }

  /** Release a read lease; unknown or already-expired ids are no-ops. */
  def releaseReadLease(leaseId: String): Unit =
    ReadLeases.release(root, leaseId)

  /** Heartbeat a held lease ([[ReadLeases.renew]]): resets its age so a
    * read longer than vacuum's lease TTL keeps its protection — renew
    * at least every TTL/2. Returns false when the lease is gone
    * (released or already purged as presumed-crashed): protection has
    * LAPSED and the caller should re-acquire or abort.
    */
  def renewReadLease(leaseId: String): Boolean =
    ReadLeases.renew(root, leaseId)

  /** Run `body` over the table's CURRENT-version DataFrame under a read
    * lease: however long the body runs — past the vacuum grace window,
    * across a concurrent `delete` of the table — its parquet files
    * survive until the bracket exits (then the next vacuum pass
    * reclaims them normally). The long-running-training-job read shape.
    *
    * `renewEveryMillis > 0` auto-renews the lease on a daemon heartbeat
    * (pass ~TTL/2 or less), so a body that outlives vacuum's lease TTL
    * keeps its protection without giving up crashed-reader reclamation
    * — a process that dies stops heartbeating and its lease ages out
    * normally. A failed renew (lease purged by an aggressive vacuum
    * schedule) stops the heartbeat; the body keeps running and fails
    * only if its files are actually reclaimed.
    */
  def withReadLease[A](name: String, renewEveryMillis: Long = 0L)(
      body: DataFrame => A): A = {
    val meta = catalog.getOrThrow(name)
    val lease = ReadLeases.acquire(root, name)
    val heartbeat = Option.when(renewEveryMillis > 0L) {
      val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
        (r: Runnable) => {
          val t = new Thread(r, s"graft-lease-renew-$lease")
          t.setDaemon(true)
          t
        })
      ex.scheduleAtFixedRate(
        () => if (!ReadLeases.renew(root, lease)) throw new RuntimeException(
          "lease gone — stop heartbeat"), // cancels this schedule only
        renewEveryMillis, renewEveryMillis,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      ex
    }
    try body(getVersion(name, meta.version))
    finally {
      heartbeat.foreach(_.shutdownNow())
      ReadLeases.release(root, lease)
    }
  }

  /** Storage hygiene with SNAPSHOT ISOLATION for readers: physical
    * deletion is TWO-PHASE. [[delete]] and version pruning only RETIRE
    * paths (logical removal is immediate; the parquet files stay), and
    * `vacuum` physically deletes a retired path once `graceMillis` has
    * passed since its retirement — so a long-running query holding a
    * DataFrame over a deleted table or pruned version is never robbed
    * of its files mid-scan (the reference gets this from pandas copies,
    * store.py:393-396; Delta/Iceberg from a VACUUM retention window).
    *
    * Stranded paths — version dirs no retained manifest references and
    * table dirs the catalog doesn't know, left by crashes between a
    * write and its catalog commit — are ENROLLED into the retire ledger
    * on the pass that discovers them and deleted on a later pass after
    * the same grace window, which also protects another process's
    * in-flight register (its directory exists before its catalog
    * commit).
    *
    * Liveness is judged against the UNION of this session's catalog and
    * the on-disk catalog reloaded at call time, so a store instance
    * opened before another writer registered new tables/versions never
    * classifies that writer's live data as stranded. A retired path
    * that became live again (delete + re-register reuses version
    * numbers from 1) is dropped from the ledger, never deleted.
    *
    * READ LEASES ([[acquireReadLease]]/[[withReadLease]]) harden the
    * grace window into a guarantee: a retired path whose table holds an
    * active lease is kept regardless of age. Leases older than
    * `leaseTtlMillis` are presumed crashed and purged (reclamation must
    * not be wedged forever by a dead reader) — a legitimately
    * longer-than-TTL read HEARTBEATS instead ([[renewReadLease]], or
    * `withReadLease(name, renewEveryMillis = ttl/2)`), which resets the
    * lease's age without weakening crash recovery; raising the TTL on
    * the vacuum schedule remains the blunt alternative. Lease checks
    * re-read the lease directory immediately before every physical
    * delete, so a lease acquired or renewed mid-pass still protects.
    *
    * Returns the root-relative paths physically deleted by THIS pass.
    * `graceMillis = 0` collapses to single-phase immediate reclamation
    * (retire and delete in one call) for tests and offline maintenance.
    */
  def vacuum(
      graceMillis: Long = FeatureStore.DefaultRetireGraceMillis,
      leaseTtlMillis: Long = FeatureStore.DefaultLeaseTtlMillis): Seq[String] =
    this.synchronized {
      val now = System.currentTimeMillis()
      val allLeases = ReadLeases.load(root)
      val (activeLeases, staleLeases) =
        allLeases.partition(l => now - l.acquiredAt < leaseTtlMillis)
      ReadLeases.purge(root, staleLeases.map(_.id))
      ReadLeases.sweepTmp(root, leaseTtlMillis) // crashed-acquire leftovers
      val leased: Set[String] = activeLeases.map(_.name).toSet
      val diskMetas = catalogIO.load(root)
      val names =
        (catalog.all.map(_.name) ++ diskMetas.map(_.name)).distinct
      val live: Map[String, Set[Int]] = names.map { n =>
        val metas = catalog.get(n).toSeq ++ diskMetas.filter(_.name == n)
        n -> metas
          .flatMap(m => m.versions.keys.toSeq.flatMap(m.segmentsOf))
          .toSet
      }.toMap
      val ledger = RetireLedger.load(root)
      val ledgered = ledger.map(e => (e.name, e.version)).toSet
      val stranded = scala.collection.mutable.ArrayBuffer.empty[RetiredPath]
      storage.listTableDirs().foreach { t =>
        live.get(t) match {
          case Some(liveSegs) =>
            storage.listVersionDirs(t)
              .filterNot(liveSegs)
              .filterNot(v => ledgered((t, Some(v))))
              .foreach(v => stranded += RetiredPath(t, Some(v), now))
          case None =>
            if (!ledgered((t, None))) stranded += RetiredPath(t, None, now)
        }
      }
      val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
      // TOCTOU guard: the pass-start lease snapshot above decides the
      // cheap keep path, but a lease acquired AFTER the snapshot (or a
      // renew racing this pass) must still protect — so every physical
      // delete re-reads the lease directory immediately before acting.
      // Deletes are rare and the directory is tiny, so the re-read is
      // O(leases) driver I/O per reclaimed path, not per pass. The
      // remaining window is acquire-vs-delete at filesystem granularity;
      // [[acquireReadLease]] closes it by requiring the table to exist
      // at acquire time (a retired path older than the grace window has
      // no live table to lease).
      def leasedNow(name: String): Boolean = {
        val t = System.currentTimeMillis()
        ReadLeases.load(root).exists(l =>
          l.name == name && t - l.acquiredAt < leaseTtlMillis)
      }
      val remaining = (ledger ++ stranded).filter { e =>
        val isLive = e.version match {
          case Some(v) => live.get(e.name).exists(_.contains(v))
          case None    => live.contains(e.name)
        }
        if (isLive) false // resurrected path: drop the entry, keep the data
        else if (leased(e.name)) true // active reader lease: keep path + entry
        else if (now - e.retiredAt >= graceMillis) {
          if (leasedNow(e.name)) true // lease landed after the pass snapshot
          else {
            e.version match {
              case Some(v) =>
                storage.deleteVersion(e.name, v); deleted += s"${e.name}/v=$v"
              case None =>
                storage.deleteTable(e.name); deleted += e.name
            }
            false
          }
        } else true
      }
      RetireLedger.save(root, remaining)
      deleted.toSeq
    }

  def listTables(): Seq[FeatureTableInfo] = catalog.all.map(_.info)

  /** Per-version history of a table, oldest first — the DESCRIBE
    * HISTORY surface: retained version numbers with their column lists
    * and segment manifests (a chained manifest means the version was
    * built by O(delta) appends; a single segment means a full
    * snapshot/compaction). Versions pruned past `maxVersions` are
    * absent — exactly the set [[getVersion]] accepts.
    */
  def getTableHistory(name: String): Seq[VersionInfo] = {
    val meta = catalog.getOrThrow(name)
    meta.versions.keys.toSeq.sorted.map { v =>
      VersionInfo(v, meta.versions(v), meta.segmentsOf(v),
        isCurrent = v == meta.version)
    }
  }

  def getTableInfo(name: String): FeatureTableInfo =
    catalog.getOrThrow(name).info

  /** Drop a table and all versions; returns false (never throws) when the
    * table does not exist (reference: store.py:362-375).
    *
    * Logical removal only: the table leaves the catalog immediately
    * (every subsequent lookup raises, matching the reference), but the
    * parquet files are RETIRED, not deleted — a reader that obtained a
    * DataFrame before the delete completes its scan correctly, exactly
    * as the reference's returned pandas copies survive deletion
    * (store.py:393-396). [[vacuum]] reclaims the files after the grace
    * window.
    */
  def delete(name: String): Boolean = this.synchronized {
    catalog.remove(name) match {
      case Some(_) =>
        RetireLedger.record(
          root, Seq(RetiredPath(name, None, System.currentTimeMillis())))
        // tombstone: merge-on-save would otherwise resurrect the table
        // from the shared on-disk catalog
        catalogIO.save(root, catalog.all, removed = Seq(name))
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
    storage.readSegments(
      meta.name, meta.segmentsOf(meta.version), meta.columns :+ IngestKeyCol, asOf)

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
    * (reference: store.py:585-599). Segment-aware: a dropped VERSION
    * only frees its storage directory when no RETAINED version's
    * manifest still references that segment — an append lineage shares
    * its base segments across versions, and deleting a shared segment
    * would corrupt every retained version built on it. Freed segments
    * are RETIRED (two-phase, see [[vacuum]]) so readers mid-query over
    * a just-pruned version keep their files until the grace window
    * passes.
    */
  private def prune(meta: TableMeta): TableMeta = {
    val all = meta.versions.keys.toSeq.sorted
    val excess = all.dropRight(maxVersions)
    val retained = all.takeRight(maxVersions)
    // a segment is freed exactly when its LAST referencing version
    // leaves the window: referenced-before minus referenced-after
    val before = all.flatMap(meta.segmentsOf).toSet
    val after = retained.flatMap(meta.segmentsOf).toSet
    val now = System.currentTimeMillis()
    RetireLedger.record(
      root,
      (before -- after).toSeq.sorted.map(v => RetiredPath(meta.name, Some(v), now)))
    meta.copy(versions = meta.versions -- excess, segments = meta.segments -- excess)
  }
}

object FeatureStore {

  /** Default grace between logical retirement and physical deletion
    * (30 minutes): long enough to outlive any interactive query over a
    * just-deleted table, short enough that [[FeatureStore.vacuum]]
    * passes scheduled hourly keep storage bounded. A deployment with
    * longer-running batch reads raises it per call.
    */
  val DefaultRetireGraceMillis: Long = 30L * 60 * 1000

  /** Default age past which [[FeatureStore.vacuum]] treats a read lease
    * as crashed and ignores it (24 h): long enough for any sane batch
    * read, short enough that a dead reader cannot wedge reclamation
    * indefinitely. Jobs that legitimately read longer pass a larger
    * TTL to their vacuum schedule.
    */
  val DefaultLeaseTtlMillis: Long = 24L * 60 * 60 * 1000

  /** Root-level hygiene for the fingerprint-keyed root pattern (a demo/
    * bench store whose root NAME encodes a dataset checksum — see
    * SparkEntry.demoStore): deletes LOCAL sibling directories of
    * `keepRoot` whose name starts with `prefix` but differ from
    * `keepRoot` itself — exactly the roots stranded when the source
    * data regenerated under a new fingerprint. Local-filesystem only
    * (java.nio) by design: fingerprint-keyed roots live in tmpdirs;
    * durable shared roots get [[FeatureStore.vacuum]] instead. Returns
    * deleted paths.
    *
    * `minAgeMillis` is the liveness guard for CONCURRENT processes: a
    * sibling root modified more recently than the threshold is left
    * alone — it may belong to a bench/test process still running
    * against source data with an older fingerprint. Stale roots from
    * genuinely dead fingerprints age past any threshold and are
    * reclaimed by a later pass.
    */
  def vacuumSiblingRoots(
      keepRoot: String,
      prefix: String,
      minAgeMillis: Long = 0L): Seq[String] = {
    require(prefix.nonEmpty, "prefix must be non-empty")
    val keep = java.nio.file.Paths.get(keepRoot).toAbsolutePath.normalize
    val parent = keep.getParent
    if (parent == null || !java.nio.file.Files.isDirectory(parent)) return Seq.empty
    val cutoff = System.currentTimeMillis() - minAgeMillis
    val stale = {
      val s = java.nio.file.Files.list(parent)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p))
          .filter(p => p.getFileName.toString.startsWith(prefix))
          .filterNot(_.toAbsolutePath.normalize == keep)
          .filter(p =>
            minAgeMillis <= 0L ||
              java.nio.file.Files.getLastModifiedTime(p).toMillis <= cutoff)
          .toList
      } finally s.close()
    }
    stale.foreach { dir =>
      java.nio.file.Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
    stale.map(_.toString)
  }

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
