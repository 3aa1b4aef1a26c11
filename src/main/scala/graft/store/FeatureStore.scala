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
    catalogIO: CatalogIO = CatalogPersistence,
    // how long a register waits out another writer's in-flight
    // reservation (arbitrating storage only) before failing with
    // FeatureConcurrencyError. Crashed reservations are swept by
    // vacuum, after which the lineage resumes.
    arbitrationWaitMillis: Long = 30000L) {

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
  // on every mutation) restores tables, versions and schemas. Over an
  // arbitrating storage the transaction log is the version authority —
  // fold in any version committed by a writer whose catalog save this
  // file never saw (crashed after commit, or raced by a later save).
  catalogIO.load(root).foreach(catalog.put)
  if (storage.arbitrates) catalog.names.foreach(reconcileFromLog)

  /** Internal deterministic tie-break column; never surfaced in output. */
  private val IngestKeyCol = "_ingest_key"

  def tableNames: Seq[String] = catalog.names

  /** The resolved storage root this store operates on — what a second
    * writer passes to open its own instance on the same tables
    * (multi-writer arbitration, [[TxnLogStorage]]), and where
    * maintenance tooling finds `_leases`/`_retired`/`_catalog.tsv`.
    */
  def rootPath: String = root

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
  /** SQL `CREATE TABLE` entry ([[graft.sources.GraftCatalog]]): an
    * EMPTY version 1 carrying just the declared schema — the one
    * register that skips the reference's non-emptiness rule (DDL
    * declares shape; the first INSERT brings rows). Everything else
    * (required columns, type record, catalog commit) is the normal
    * register path.
    */
  private[graft] def registerEmpty(name: String, df: DataFrame): FeatureTableInfo =
    registerWith(name, df, watermark = None, allowEmpty = true)

  /** SQL `TRUNCATE TABLE` (and no-predicate `DELETE FROM`): mint a new
    * EMPTY full-snapshot version in the SAME lineage — prior versions
    * stay time-travelable, the change feed sees a full-register step,
    * and the next INSERT appends onto the emptied table. This is the
    * one row-removal that may empty a table: the DDL statement states
    * that intent explicitly, where [[deleteRows]]' every-row guard
    * protects against a PREDICATE that happens to match everything.
    */
  def truncate(name: String): FeatureTableInfo = {
    val meta = catalog.getOrThrow(name)
    val empty = typedEmptyFrame(meta).getOrElse(
      throw new FeatureValidationError(
        s"cannot TRUNCATE '$name': no recorded column types " +
          "(legacy catalog) to rebuild its typed empty schema"))
    registerWith(name, empty, watermark = None, allowEmpty = true)
  }

  private def registerWith(
      name: String,
      df: DataFrame,
      watermark: Option[(String, Long)],
      allowEmpty: Boolean = false): FeatureTableInfo = this.synchronized {
    Validation.validateDataFrame(df, name, allowEmpty)
    val (cur, v) = claimVersion(name)
    val meta = completeClaim(name, v) {
      val prepared = prepare(df)
      val (guarded, checksOk) =
        constraintGuard(cur.fold(Map.empty[String, String])(_.constraints), prepared)
      val wr = storage.write(name, v, guarded, EntityIdColumn, TimestampColumn)
      verifyOrScrap(name, v)(checksOk)
      val now = System.currentTimeMillis()
      storage.commitVersion(name, v, CommitMeta(
        wr.rows, wr.rows, df.columns.toSeq, Seq(v),
        wr.minTsMillis, wr.maxTsMillis, now, typesOf(df),
        operation = "register", colStats = wr.colStats,
        constraints = cur.fold(Map.empty[String, String])(_.constraints.toMap)))
      cur match {
        case None =>
          TableMeta(name, v, wr.rows, now, now, SortedMap(v -> df.columns.toSeq),
            SortedMap(v -> Seq(v)), segStats = segStatsOf(v, wr),
            versionTimes = SortedMap(v -> now),
            columnTypes = typesOf(df),
            versionOps = SortedMap(v -> "register"),
            versionRows = SortedMap(v -> wr.rows),
            segRows = segRowsOf(v, wr),
            segColStats = segColStatsOf(v, wr))
        case Some(c) =>
          prune(c.copy(
            version = v,
            rowCount = wr.rows,
            updatedAt = now,
            versions = c.versions + (v -> df.columns.toSeq),
            segments = c.segments + (v -> Seq(v)),
            segStats = c.segStats ++ segStatsOf(v, wr),
            versionTimes = c.versionTimes + (v -> now),
            columnTypes = c.columnTypes ++ typesOf(df),
            versionOps = c.versionOps + (v -> "register"),
            versionRows = c.versionRows + (v -> wr.rows),
            segRows = c.segRows ++ segRowsOf(v, wr),
            segColStats = c.segColStats ++ segColStatsOf(v, wr)))
      }
    }
    val stamped = stampWatermark(meta, watermark)
    catalog.put(stamped)
    catalogIO.save(root, Seq(stamped))
    stamped.info
  }

  /** Per-segment stats entry from a write's observed timestamp range
    * (absent for empty/all-null segments — they're simply never
    * skipped).
    */
  private def segStatsOf(v: Int, wr: WriteResult): SortedMap[Int, (Long, Long)] =
    (for { lo <- wr.minTsMillis; hi <- wr.maxTsMillis }
      yield SortedMap(v -> (lo, hi))).getOrElse(SortedMap.empty)

  /** Per-segment row count from the write — what lets a stats-pruned
    * segment contribute exact totals to a mutation's classification
    * without being scanned.
    */
  private def segRowsOf(v: Int, wr: WriteResult): SortedMap[Int, Long] =
    SortedMap(v -> wr.rows)

  /** Per-segment column-level stats from the write ([[ColumnStats]]). */
  private def segColStatsOf(
      v: Int, wr: WriteResult): SortedMap[Int, Map[String, ColStat]] =
    if (wr.colStats.nonEmpty) SortedMap(v -> wr.colStats) else SortedMap.empty

  /** The skipping stats of segment `s` as [[StatsPruning]] consumes
    * them: the column-level record, with the timestamp column's entry
    * synthesized from the legacy per-segment ts range when no
    * column-level record exists (pre-stats segments keep skipping on
    * time, their only recorded dimension). Millis→micros widens the max
    * bound by 999 so millis truncation can never fake an upper bound
    * below a real row.
    */
  private def pruneStatsOf(meta: TableMeta, s: Int): Map[String, ColStat] = {
    val recorded = meta.segColStats.getOrElse(s, Map.empty)
    if (recorded.contains(TimestampColumn)) recorded
    else recorded ++ meta.segStats.get(s).map { case (lo, hi) =>
      // the legacy range never counted nulls, and null-ts rows DO
      // exist (prepare only rejects non-null uncastable values) —
      // claim "nulls may exist" so IS NULL never prunes on it
      TimestampColumn ->
        ColStat(Long.MaxValue,
          Some((lo * 1000L).toString), Some((hi * 1000L + 999L).toString))
    }
  }

  /** Segments of `segs` that `resolvedCond` provably cannot match —
    * droppable from a scan or classification. With `needRows` (the
    * classification paths), only segments with a recorded row count are
    * ever pruned, so skipped segments still contribute exact totals;
    * plain scans prune on stats alone. Anything [[StatsPruning]] can't
    * reason about is kept — always the sound direction.
    */
  private def pruneSegments(
      meta: TableMeta,
      segs: Seq[Int],
      resolvedCond: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      needRows: Boolean = true): (Seq[Int], Seq[Int]) =
    resolvedCond match {
      case None => (segs, Seq.empty)
      case Some(e) =>
        segs.partition { s =>
          (needRows && meta.segRows.get(s).isEmpty) ||
            StatsPruning.maySatisfy(e, pruneStatsOf(meta, s), meta.segRows.get(s))
        }
    }

  /** An empty frame with exactly the table's current schema, built
    * from the catalog's type record — no storage touched; None when
    * the record is incomplete (legacy catalogs).
    */
  private def typedEmptyFrame(meta: TableMeta): Option[DataFrame] =
    Option.when(meta.columns.forall(meta.columnTypes.contains))(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(meta.columns.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.DataType.fromDDL(
              meta.columnTypes(c)))))))

  /** Resolve `condition` against a probe with the table's schema (no
    * job runs, no storage touched) and return the analyzed predicate —
    * the expression [[StatsPruning]] needs, with qualified /
    * case-insensitive references resolved exactly as the real filter
    * will resolve them. An unknown-column predicate raises the normal
    * analysis error. The probe is an empty frame built from the
    * catalog's type record — reading a segment for its schema would
    * make condition ANALYSIS depend on that segment's files existing;
    * legacy catalogs without a full type record fall back to that read.
    */
  private def resolveCondition(
      name: String,
      meta: TableMeta,
      condition: Column): Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    val probe = typedEmptyFrame(meta).getOrElse(
      storage.readSegments(
        name, meta.segmentsOf(meta.version).take(1), meta.columns,
        None, meta.columnTypes))
    probe
      .filter(condition)
      .queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.headOption
  }

  /** Stored Spark DDL type per registered column: what [[prepare]]
    * writes — the timestamp column persists as TIMESTAMP regardless of
    * the input's castable type; everything else keeps the input type.
    * This is the type record that pads evolved chained reads
    * ([[TableMeta.columnTypes]]).
    */
  private def typesOf(df: DataFrame): SortedMap[String, String] =
    SortedMap(df.schema.fields.map { f =>
      f.name -> (if (f.name == TimestampColumn) "TIMESTAMP" else f.dataType.sql)
    }.toSeq: _*)

  /** Run a claimed version's write+commit, releasing the reservation on
    * failure so a failed write doesn't wedge the lineage until a vacuum
    * sweep (no-op release for non-arbitrating storage).
    */
  private def completeClaim[A](name: String, v: Int)(body: => A): A =
    try body
    catch {
      case e: Throwable =>
        try storage.releaseVersion(name, v) catch { case _: Exception => () }
        throw e
    }

  /** Produce (current meta, claimed next version) for a register.
    *
    * Non-arbitrating storage keeps the shipped single-writer contract:
    * fail fast when the shared catalog shows a foreign writer advanced
    * the table.
    *
    * Arbitrating storage ([[VersionStorage.arbitrates]]) runs the
    * optimistic-concurrency loop of the Delta commit protocol instead:
    * adopt the freshest on-disk catalog entry, fold in versions
    * committed in the transaction log that no catalog save recorded
    * ([[reconcileFromLog]]), then try to RESERVE the next number
    * atomically. Losing the race (another writer claimed it first)
    * re-reads and retries; an in-flight foreign reservation is awaited
    * up to `arbitrationWaitMillis`, after which the register fails with
    * the vacuum hint (a crashed writer's reservation is swept by
    * vacuum under the grace window).
    */
  private def claimVersion(name: String): (Option[TableMeta], Int) = {
    if (!storage.arbitrates) {
      detectForeignWriter(name)
      val cur = catalog.get(name)
      return (cur, cur.map(_.version + 1).getOrElse(1))
    }
    val deadline = System.currentTimeMillis() + arbitrationWaitMillis
    var backoff = 2L
    while (true) {
      adoptDiskMeta(name)
      reconcileFromLog(name)
      catalog.get(name) match {
        case None =>
          // reconcileFromLog already synthesized any creation whose
          // catalog save never landed, so still-unknown means: a truly
          // fresh table, a retired lineage awaiting re-register, or
          // markers that CANNOT be synthesized (legacy no-cols format)
          // from a concurrent creation whose save is pending
          val retiredAt = retiredTableAt(name)
          val committed = storage.committedMeta(name)
          val freshLineageMarkers = committed.exists { case (_, cm) =>
            retiredAt.forall(cm.committedAt > _)
          }
          if (!freshLineageMarkers) {
            // truly fresh, or every marker belongs to the retired
            // lineage: the explicit re-register-only branch — clear the
            // old log so it neither blocks numbering nor leaks into
            // reconcile. The gate on marker times means a racing
            // re-register's already-committed (newer) versions are
            // NEVER wiped — they synthesize above instead.
            if (committed.nonEmpty) storage.resetVersionAuthority(name)
            if (storage.reserveVersion(name, 1)) return (None, 1)
            // lost the creation race — loop; the winner's commit/save
            // will surface via reconcileFromLog/adoptDiskMeta
          }
          // else: wait for the concurrent creator's catalog save
        case Some(c) =>
          val next = c.version + 1
          val claimed = storage.maxClaimedVersion(name).getOrElse(0)
          // reserve only when every earlier version is committed AND
          // absorbed into our meta — an append's manifest must chain on
          // the true predecessor, so building past an unabsorbed claim
          // would silently drop the racing writer's rows
          if (claimed < next && storage.reserveVersion(name, next))
            return (Some(c), next)
      }
      if (System.currentTimeMillis() > deadline)
        throw new FeatureConcurrencyError(
          s"could not claim a version of '$name' within ${arbitrationWaitMillis}ms: " +
            "another writer holds an in-flight reservation (if it crashed, " +
            "vacuum sweeps stale reservations after the grace window) or " +
            "concurrent commits are outpacing this writer")
      Thread.sleep(backoff)
      backoff = math.min(backoff * 2, 250L)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Catalog lookup for READ paths. A hit keeps session-snapshot
    * semantics (this session's view is pinned until it writes or
    * reopens — the same contract as before multi-writer support). A
    * MISS over an arbitrating storage adopts the shared state first, so
    * a table another session registered is readable here without a
    * reopen; version-level misses get the same retry in
    * [[getVersion]].
    */
  private def resolveMeta(name: String): TableMeta =
    catalog.get(name).getOrElse {
      if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
      catalog.getOrThrow(name)
    }

  /** Adopt the freshest on-disk catalog entry for `name` (another
    * writer's save), merging rather than replacing so neither side's
    * versions, stats or stream watermarks are lost.
    */
  private def adoptDiskMeta(name: String): Unit =
    catalogIO.load(root).find(_.name == name).foreach { d =>
      catalog.get(name) match {
        case None    => catalog.put(d)
        case Some(o) => catalog.put(FeatureStore.mergeMetas(o, d))
      }
    }

  /** Re-read the durable catalog and adopt every table/version other
    * PROCESSES committed to this root — the REFRESH TABLE surface.
    * Writers on arbitrating storage do this implicitly per claim, and
    * the graft streaming source reopens per poll; an explicit refresh
    * is for a long-lived reader session that wants to see foreign
    * commits without writing. Local state merges (never regresses) and
    * tables this session knows that the disk doesn't are kept.
    */
  def refresh(): Unit = this.synchronized {
    val onDisk = catalogIO.load(root)
    onDisk.foreach(d =>
      catalog.put(catalog.get(d.name)
        .fold(d) { o =>
          // a different registeredAt is a DIFFERENT LINEAGE: the name
          // was dropped and re-registered (REPLACE TABLE, rename-away
          // + fresh register) while this handle held the old chain.
          // The two version chains share nothing — merging them would
          // fuse unrelated version maps and keep the retired chain's
          // scalars on a version-number tie — so the newer lineage is
          // adopted whole. (registeredAt is stable along a chain:
          // every commit preserves it, and same-lineage merges fold it
          // at min.)
          if (d.registeredAt != o.registeredAt) {
            // a foreign drop + re-register reuses the same version
            // PATHS (root/t/v=1...) with a possibly different schema —
            // the memoized footer schemas of the retired lineage must
            // go with it, or reads of the adopted lineage would apply
            // the stale schema silently
            Storage.invalidateSchemas(s"$root/${d.name}")
            if (d.registeredAt > o.registeredAt) d else o
          } else {
            // refresh is the user saying "adopt the disk state": the
            // merge's union-of-constraints bias (right for concurrent
            // ARBITRATION, where a drop may race an enforcing writer)
            // would resurrect another session's DROP CONSTRAINT here,
            // so the at-least-as-new disk copy's constraint set is
            // adopted verbatim
            val merged = FeatureStore.mergeMetas(o, d)
            if (d.updatedAt >= o.updatedAt) merged.copy(constraints = d.constraints)
            else merged
          }
        }))
    // adopt cross-session DROPs too: an in-memory entry whose catalog
    // file is gone AND whose retirement is in the ledger was deleted
    // by another session (ledger evidence keeps a mid-commit save —
    // file momentarily absent — from being mistaken for a drop)
    val diskNames = onDisk.map(_.name).toSet
    catalog.names
      .filterNot(diskNames.contains)
      .filter(n => retiredTableAt(n).isDefined)
      .foreach { n =>
        // a cross-session DROP frees the paths for re-registration —
        // retire their memoized schemas with the catalog entry
        Storage.invalidateSchemas(s"$root/$n")
        catalog.remove(n)
      }
    if (storage.arbitrates) catalog.names.foreach(reconcileFromLog)
  }

  /** Latest whole-table retirement time for `name`, if any (a `delete`
    * records one; re-register + re-delete can stack several — the
    * newest bounds which commit markers belong to the retired lineage).
    */
  private def retiredTableAt(name: String): Option[Long] =
    RetireLedger.load(root)
      .filter(e => e.name == name && e.version.isEmpty)
      .map(_.retiredAt)
      .maxOption

  /** Fold versions committed in the storage's transaction log into the
    * catalog entry — the reconciliation half of multi-writer
    * arbitration. A commit record is adopted when its version is above
    * the prune high-water (below it, absence means PRUNED, not racing)
    * and carries its column list (legacy markers don't; their writers'
    * catalogs know those versions by construction). The newest adopted
    * version advances the pointer and cumulative row count.
    *
    * With NO catalog entry at all, cols-bearing commit records
    * committed AFTER the table's latest retirement (if any) are a
    * CREATION whose catalog save never landed — the marker is the
    * commit point, so the entry is SYNTHESIZED from the records rather
    * than the versions being treated as stranded: readers see the
    * table, the next writer builds on it, and vacuum spares it. Records
    * at or before a retirement belong to the retired lineage and are
    * never resurrected.
    */
  private def reconcileFromLog(name: String): Unit =
    catalog.get(name) match {
      case Some(m) =>
        val addable = storage
          .committedMeta(
            name, skip = v => v <= m.prunedThrough || m.versions.contains(v))
          .filter { case (_, cm) => cm.columns.nonEmpty }
        if (addable.nonEmpty) {
          val top = addable.keys.max
          var merged = m.copy(
            versions = m.versions ++ addable.view.mapValues(_.columns).toSeq,
            segments = m.segments ++ addable.map { case (v, cm) =>
              v -> (if (cm.segments.nonEmpty) cm.segments else Seq(v))
            },
            segStats = m.segStats ++ addable.toSeq.flatMap { case (v, cm) =>
              for { lo <- cm.minTsMillis; hi <- cm.maxTsMillis } yield v -> (lo, hi)
            },
            versionTimes = m.versionTimes ++ addable.toSeq.collect {
              case (v, cm) if cm.committedAt > 0 => v -> cm.committedAt
            },
            // a reconciled version may have evolved the schema: adopt
            // the marker's type record so padded reads resolve (later
            // markers win, same as the marker-ordered version fold)
            columnTypes = m.columnTypes ++
              addable.toSeq.sortBy(_._1).flatMap(_._2.columnTypes),
            versionOps = m.versionOps ++ addable.toSeq.collect {
              case (v, cm) if cm.operation.nonEmpty => v -> cm.operation
            },
            versionRows = m.versionRows ++
              addable.view.mapValues(_.tableRows).toSeq,
            versionCdf = m.versionCdf ++ addable.toSeq.collect {
              case (v, cm) if cm.changeRows >= 0 => v -> cm.changeRows
            },
            // segment-level records apply only to versions that wrote
            // their OWN segment (manifest contains v) — a manifest-only
            // delete's marker carries rows=0 for no segment at all
            segRows = m.segRows ++ addable.toSeq.collect {
              case (v, cm) if ownSegment(v, cm) => v -> cm.segmentRows
            },
            segColStats = m.segColStats ++ addable.toSeq.collect {
              case (v, cm) if ownSegment(v, cm) && cm.colStats.nonEmpty =>
                v -> cm.colStats
            },
            // a foreign optimize's spec wins when present (spec is only
            // ever set by optimize commits, never cleared; a mismatch
            // at worst downgrades the next incremental run to a full
            // rewrite — the safe direction)
            clusterSpec = addable.toSeq.sortBy(_._1)
              .flatMap(_._2.clusterSpec).lastOption.orElse(m.clusterSpec),
            // adopt CHECK constraints a foreign commit carries (its
            // writer's addConstraint may have never reached a catalog
            // save) — union with local, biased toward enforcement
            constraints = m.constraints ++
              addable.toSeq.sortBy(_._1).flatMap(_._2.constraints))
          if (top > m.version)
            merged = merged.copy(
              version = top,
              rowCount = addable(top).tableRows,
              updatedAt = math.max(m.updatedAt, addable(top).committedAt))
          catalog.put(merged)
        }
      case None =>
        val retiredAt = retiredTableAt(name)
        val records = storage.committedMeta(name).filter { case (_, cm) =>
          cm.columns.nonEmpty && cm.committedAt > 0 &&
            retiredAt.forall(cm.committedAt > _)
        }
        if (records.nonEmpty) {
          val top = records.keys.max
          catalog.put(TableMeta(
            name,
            version = top,
            rowCount = records(top).tableRows,
            registeredAt = records.values.map(_.committedAt).min,
            updatedAt = records.values.map(_.committedAt).max,
            versions = SortedMap(records.view.mapValues(_.columns).toSeq: _*),
            segments = SortedMap(records.toSeq.map { case (v, cm) =>
              v -> (if (cm.segments.nonEmpty) cm.segments else Seq(v))
            }: _*),
            segStats = SortedMap(records.toSeq.flatMap { case (v, cm) =>
              for { lo <- cm.minTsMillis; hi <- cm.maxTsMillis } yield v -> (lo, hi)
            }: _*),
            versionTimes =
              SortedMap(records.view.mapValues(_.committedAt).toSeq: _*),
            columnTypes = SortedMap(
              records.toSeq.sortBy(_._1).flatMap(_._2.columnTypes): _*),
            versionOps = SortedMap(records.toSeq.collect {
              case (v, cm) if cm.operation.nonEmpty => v -> cm.operation
            }: _*),
            versionRows = SortedMap(
              records.view.mapValues(_.tableRows).toSeq: _*),
            versionCdf = SortedMap(records.toSeq.collect {
              case (v, cm) if cm.changeRows >= 0 => v -> cm.changeRows
            }: _*),
            segRows = SortedMap(records.toSeq.collect {
              case (v, cm) if ownSegment(v, cm) => v -> cm.segmentRows
            }: _*),
            segColStats = SortedMap(records.toSeq.collect {
              case (v, cm) if ownSegment(v, cm) && cm.colStats.nonEmpty =>
                v -> cm.colStats
            }: _*),
            // CHECK constraints / cluster spec as of the newest commit
            // — both survive a catalog rebuilt purely from markers
            constraints = SortedMap(records(top).constraints.toSeq: _*),
            clusterSpec = records(top).clusterSpec))
        }
    }

  /** Decorate a to-be-written DataFrame with a SECOND observation
    * counting CHECK-constraint violations — it rides the write job's
    * plan next to the stats observation, so enforcement costs zero
    * extra passes. Returns the guarded frame plus the post-write
    * verifier, which throws BEFORE anything is committed. NULL
    * conditions pass (standard SQL CHECK); only FALSE rows violate.
    * A constraint that no longer resolves against the written schema
    * (schema-drift register broke a referenced column) fails fast here
    * with the remedy in the message.
    *
    * Counting note: under a CLUSTERED layout the range partitioner's
    * sampling pass re-executes the plan below it, so violation counts
    * can over-count; the abort decision (any violation at all) is
    * unaffected, and zero stays exactly zero.
    */
  private def constraintGuard(
      checks: scala.collection.Map[String, String],
      df: DataFrame): (DataFrame, () => Unit) =
    if (checks.isEmpty) (df, () => ())
    else {
      // probe against a FRESH empty frame with exactly the written
      // schema: filtering `df` itself would falsely resolve columns the
      // write no longer carries (Spark's missing-reference fallback
      // reaches through the projection into dropped lineage columns)
      val probe = df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), df.schema)
      checks.foreach { case (cn, sql) =>
        try probe.filter(expr(sql)).queryExecution.assertAnalyzed()
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new FeatureValidationError(
              s"CHECK constraint '$cn' (`$sql`) cannot be evaluated against " +
                s"the written schema ${df.columns.mkString("[", ", ", "]")}: " +
                s"${e.getMessage}. Drop the constraint first if the schema " +
                "change is intended")
        }
      }
      val obs = org.apache.spark.sql.Observation(
        s"graft_checks_${java.util.UUID.randomUUID()}")
      val metrics = checks.toSeq.sortBy(_._1).zipWithIndex.map {
        case ((_, sql), i) =>
          count(when(not(coalesce(expr(sql), lit(true))), lit(1))).as(s"_c_$i")
      }
      val guarded = df.observe(obs, metrics.head, metrics.tail: _*)
      val verify = () => {
        val violated = checks.toSeq.sortBy(_._1).zipWithIndex.flatMap {
          case ((cn, sql), i) =>
            val n = obs.get(s"_c_$i").asInstanceOf[Long]
            if (n > 0) Some(s"'$cn' (`$sql`): $n rows") else None
        }
        if (violated.nonEmpty)
          throw new FeatureValidationError(
            "CHECK constraint violation — write aborted, no version " +
              "committed: " + violated.mkString("; "))
      }
      (guarded, verify)
    }

  /** Write a mutation's rewritten segment PRESERVING the table's
    * recorded clustering (the liquid-clustering discipline: once a
    * table opts into a layout, rewrites keep it — otherwise every
    * delete/upsert would slowly degrade the optimize work). Falls back
    * to the plain layout when no spec is recorded, its columns have
    * drifted away, or the clustered write fails.
    */
  private def writeKeepingLayout(
      cur: TableMeta,
      name: String,
      v: Int,
      df: DataFrame): WriteResult = {
    val clustered = cur.clusterSpec.flatMap { spec =>
      val cols = spec.drop(spec.indexOf(':') + 1)
        .split(",").toSeq.filter(_.nonEmpty)
      Option.when(cols.nonEmpty && cols.forall(df.columns.contains)) {
        () => {
          val cluster =
            if (spec.startsWith("zorder:") && cols.size > 1)
              Seq(zValue(cur, cols, df))
            else cols.map(col)
          storage.writeClustered(
            name, v, df, EntityIdColumn, TimestampColumn, cluster)
        }
      }
    }
    clustered match {
      case Some(w) =>
        try w()
        catch {
          case _: Exception =>
            storage.write(name, v, df, EntityIdColumn, TimestampColumn)
        }
      case None => storage.write(name, v, df, EntityIdColumn, TimestampColumn)
    }
  }

  /** Run the constraint verifier for a just-written version; on
    * violation the written data is scrapped eagerly (the claim itself
    * is released by [[completeClaim]]'s failure path).
    */
  private def verifyOrScrap(name: String, v: Int)(verify: () => Unit): Unit =
    try verify()
    catch {
      case e: Throwable =>
        try storage.deleteVersion(name, v) catch { case _: Exception => () }
        throw e
    }

  /** Did this commit write its own segment? (its manifest references
    * its version number; a legacy marker's empty manifest defaults to
    * the single-snapshot form, which is its own segment)
    */
  private def ownSegment(v: Int, cm: CommitMeta): Boolean =
    cm.segments.isEmpty || cm.segments.contains(v)

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
    * The delta must carry exactly the current columns; with
    * `mergeSchema = true` it may additionally carry NEW columns
    * (Delta Lake's `mergeSchema` semantics): the new columns append to
    * the table schema, prior segments read them as typed nulls (the
    * catalog records every column's type — [[TableMeta.columnTypes]]),
    * and historical [[getVersion]] reads keep each version's own column
    * set. Existing columns may never change type or be dropped on the
    * append path — that remains a full [[register]], where drift is
    * explicit.
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
      description: String = "",
      mergeSchema: Boolean = false): FeatureTableInfo =
    registerAppendWith(name, df, maxSegments, watermark = None,
      mergeSchema = mergeSchema)

  /** Expectation-gated ingestion with QUARANTINE routing — the
    * Delta-Live-Tables "expect or quarantine" discipline, vs the
    * store's CHECK constraints which FAIL the whole commit: each
    * expectation is a named predicate that must hold per row; rows
    * violating ANY expectation (false or NULL — an unevaluable row is
    * not a clean row) are diverted to `quarantine` with a `violated`
    * column naming the failed expectations (comma-joined, declaration
    * order), and only clean rows land in `name`. Both tables
    * create-or-append, so the call composes with incremental loads.
    *
    * Ordering: the quarantine commit lands FIRST — a crash between the
    * two commits re-runs the load with the bad rows already safe,
    * never silently dropped. One pass of predicate evaluation; the
    * split is two filters over the same cached frame.
    *
    * Returns (table info, quarantine info) — either side None when it
    * received no rows.
    */
  def registerWithExpectations(
      name: String,
      df: DataFrame,
      expectations: Seq[(String, Column)],
      quarantine: String): (Option[FeatureTableInfo], Option[FeatureTableInfo]) = {
    if (expectations.isEmpty)
      throw new FeatureValidationError(
        "registerWithExpectations needs at least one expectation; " +
          "use register for unconditional ingestion")
    if (quarantine == name)
      throw new FeatureValidationError(
        s"quarantine table must differ from the target table ('$name')")
    Validation.validateDataFrame(df, name)
    val marker = "_graft_violated"
    if (df.columns.contains(marker))
      throw new FeatureValidationError(
        s"registerWithExpectations reserves column '$marker'")
    val labeled = df.withColumn(marker,
      concat_ws(",", expectations.map { case (label, pred) =>
        when(!coalesce(pred, lit(false)), lit(label))
      }: _*)).persist()
    try {
      val bad = labeled.filter(col(marker) =!= "")
        .withColumnRenamed(marker, "violated")
      val good = labeled.filter(col(marker) === "").drop(marker)
      def land(table: String, rows: DataFrame): Option[FeatureTableInfo] =
        if (rows.isEmpty) None
        else Some(
          if (tableNames.contains(table)) registerAppend(table, rows)
          else register(table, rows))
      val q = land(quarantine, bad)
      val t = land(name, good)
      (t, q)
    } finally { labeled.unpersist(); () }
  }

  /** Evolved column list for an append/upsert delta: same-name columns
    * must keep their RECORDED types (checked even when the column sets
    * match — a same-shape delta with a retyped column would otherwise
    * write a segment later reads cannot union), and new columns append
    * only under `mergeSchema`.
    */
  private def evolveColumns(
      op: String,
      name: String,
      cur: TableMeta,
      df: DataFrame,
      mergeSchema: Boolean): Seq[String] = {
    val dfCols = df.columns.toSeq
    val dfTypes = typesOf(df)
    def checkTypes(): Unit = {
      val conflicts = cur.columns.filter { c =>
        cur.columnTypes.get(c).exists(t => dfTypes.get(c).exists(_ != t))
      }
      if (conflicts.nonEmpty)
        throw new FeatureValidationError(
          s"$op('$name') cannot change column types; " +
            conflicts.map(c =>
              s"'$c' is ${cur.columnTypes(c)}, delta has ${dfTypes(c)}")
              .mkString("; ") + ". Use register() for type changes")
    }
    if (dfCols == cur.columns) { checkTypes(); cur.columns }
    else if (mergeSchema && cur.columns.forall(dfCols.contains)) {
      checkTypes()
      cur.columns ++ dfCols.filterNot(cur.columns.contains)
    }
    else throw new FeatureValidationError(
      s"$op('$name') requires the current schema " +
        s"${cur.columns.mkString("[", ", ", "]")}, got " +
        s"${dfCols.mkString("[", ", ", "]")}; " +
        (if (mergeSchema)
          "mergeSchema=true only ADDS columns — every existing column must stay"
        else "pass mergeSchema=true to add columns, or use register() for other changes"))
  }

  private def registerAppendWith(
      name: String,
      df: DataFrame,
      maxSegments: Int,
      watermark: Option[(String, Long)],
      mergeSchema: Boolean = false): FeatureTableInfo = this.synchronized {
    if (maxSegments < 1)
      throw new IllegalArgumentException(s"maxSegments must be >= 1, got $maxSegments")
    if (catalog.get(name).isEmpty && !storage.arbitrates)
      return registerWith(name, df, watermark)
    Validation.validateDataFrame(df, name)
    val (curOpt, v) = claimVersion(name)
    val cur = curOpt.getOrElse {
      // arbitrated claim resolved to table creation after all: hand the
      // claim back and take the full-snapshot creation path
      storage.releaseVersion(name, v)
      return registerWith(name, df, watermark)
    }
    val meta = completeClaim(name, v) {
      // re-validate against the CLAIMED state: an arbitrating claim may
      // have absorbed another writer's schema-drift register
      val evolved = evolveColumns("registerAppend", name, cur, df, mergeSchema)
      val chained = cur.segmentsOf(cur.version) :+ v
      val now0 = System.currentTimeMillis()
      val newTypes = cur.columnTypes ++ typesOf(df)
      if (chained.size > maxSegments) {
        // compact: materialize previous ∪ delta as one snapshot (the
        // union pads pre-evolution rows with nulls when evolving)
        val full = currentData(cur).select(cur.columns.map(col): _*)
          .unionByName(df.select(evolved.map(col): _*), allowMissingColumns = true)
          .select(evolved.map(col): _*)
        val (guarded, checksOk) = constraintGuard(cur.constraints, prepare(full))
        val wr = storage.write(name, v, guarded, EntityIdColumn, TimestampColumn)
        verifyOrScrap(name, v)(checksOk)
        storage.commitVersion(name, v, CommitMeta(
          wr.rows, wr.rows, evolved, Seq(v),
          wr.minTsMillis, wr.maxTsMillis, now0, newTypes,
          operation = "append", colStats = wr.colStats,
          constraints = cur.constraints.toMap))
        cur.copy(version = v, rowCount = wr.rows, updatedAt = now0,
          versions = cur.versions + (v -> evolved),
          segments = cur.segments + (v -> Seq(v)),
          segStats = cur.segStats ++ segStatsOf(v, wr),
          versionTimes = cur.versionTimes + (v -> now0),
          columnTypes = newTypes,
          versionOps = cur.versionOps + (v -> "append"),
          versionRows = cur.versionRows + (v -> wr.rows),
          segRows = cur.segRows ++ segRowsOf(v, wr),
          segColStats = cur.segColStats ++ segColStatsOf(v, wr))
      } else {
        val (guarded, checksOk) = constraintGuard(
          cur.constraints, prepare(df.select(evolved.map(col): _*)))
        val wr = storage.write(name, v, guarded, EntityIdColumn, TimestampColumn)
        verifyOrScrap(name, v)(checksOk)
        storage.commitVersion(name, v, CommitMeta(
          wr.rows, cur.rowCount + wr.rows, evolved, chained,
          wr.minTsMillis, wr.maxTsMillis, now0, newTypes,
          operation = "append", colStats = wr.colStats,
          constraints = cur.constraints.toMap))
        cur.copy(version = v, rowCount = cur.rowCount + wr.rows, updatedAt = now0,
          versions = cur.versions + (v -> evolved),
          segments = cur.segments + (v -> chained),
          segStats = cur.segStats ++ segStatsOf(v, wr),
          versionTimes = cur.versionTimes + (v -> now0),
          columnTypes = newTypes,
          versionOps = cur.versionOps + (v -> "append"),
          versionRows = cur.versionRows + (v -> (cur.rowCount + wr.rows)),
          segRows = cur.segRows ++ segRowsOf(v, wr),
          segColStats = cur.segColStats ++ segColStatsOf(v, wr))
      }
    }
    val pruned = stampWatermark(prune(meta), watermark)
    catalog.put(pruned)
    catalogIO.save(root, Seq(pruned))
    pruned.info
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
      streamId: String = CatalogIO.LegacyStreamId,
      mergeSchema: Boolean = false): Option[FeatureTableInfo] =
    idempotent(name, streamId, batchId)(
      registerAppendWith(name, df, maxSegments, _, mergeSchema = mergeSchema))

  private def idempotent(name: String, streamId: String, batchId: Long)(
      body: Option[(String, Long)] => FeatureTableInfo): Option[FeatureTableInfo] =
    this.synchronized {
      val seen = catalog.get(name).flatMap(_.batchWatermarks.get(streamId))
      // ONE-TIME UPGRADE SHIM (pre-stream-identity catalogs): a stream
      // restarting across the upgrade keeps its checkpoint, so its
      // crash-recovery replay re-delivers the LAST batch — same id as
      // the legacy per-table high-water, but under a stream id the
      // catalog has never seen. Without this check that replay would
      // re-register once (a duplicate version). It applies only when
      // the new stream id has no line yet AND the ids match EXACTLY: a
      // genuinely fresh stream restarts at batch 0 < legacy high-water
      // and registers normally (the old silent-skip data-loss path
      // stays dead). The skipped id migrates to the new stream id so
      // the legacy line is consulted exactly once. Batch 0 is EXCLUDED
      // from the shim: a legacy high-water of 0 is indistinguishable
      // from a fresh stream's first batch, and when the two collide a
      // once-duplicated VISIBLE version (the straddling-replay cost)
      // is the right failure mode — silently losing a fresh stream's
      // batch 0 is not.
      val legacyReplay = streamId != CatalogIO.LegacyStreamId && batchId > 0 &&
        seen.isEmpty &&
        catalog.get(name)
          .flatMap(_.batchWatermarks.get(CatalogIO.LegacyStreamId))
          .contains(batchId)
      if (legacyReplay) {
        catalog.get(name).foreach { m =>
          val stampedM = m.copy(
            batchWatermarks = m.batchWatermarks + (streamId -> batchId))
          catalog.put(stampedM)
          catalogIO.save(root, Seq(stampedM))
        }
        None
      }
      else if (seen.contains(batchId)) None // crash-recovery replay of the last batch
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
          val cleared = m.copy(batchWatermarks = m.batchWatermarks - streamId)
          catalog.put(cleared)
          catalogIO.save(root, Seq(cleared))
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
    // compact is a WRITE: over an arbitrating storage it must act on
    // the freshest multi-writer state, and it materializes its snapshot
    // from the CLAIMED predecessor — materializing from a pre-claim
    // read could republish a stale version's content as the newest,
    // silently dropping a racing writer's register
    if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
    val meta0 = catalog.getOrThrow(name)
    if (meta0.segmentsOf(meta0.version).size <= 1) return meta0.info
    val (curOpt, v) = claimVersion(name)
    val cur = curOpt.getOrElse {
      storage.releaseVersion(name, v)
      throw new FeatureConcurrencyError(
        s"table '$name' was deleted by another writer during compact")
    }
    if (cur.segmentsOf(cur.version).size <= 1) {
      // another writer compacted between the check and the claim
      storage.releaseVersion(name, v)
      return cur.info
    }
    val meta = completeClaim(name, v) {
      val full = currentData(cur).select(cur.columns.map(col): _*)
      val wr = storage.write(name, v, prepare(full), EntityIdColumn, TimestampColumn)
      val now0 = System.currentTimeMillis()
      storage.commitVersion(name, v, CommitMeta(
        wr.rows, wr.rows, cur.columns, Seq(v),
        wr.minTsMillis, wr.maxTsMillis, now0,
        columnTypes = cur.columnTypes,
        operation = "compact", colStats = wr.colStats,
        constraints = cur.constraints.toMap))
      cur.copy(version = v, rowCount = wr.rows, updatedAt = now0,
        versions = cur.versions + (v -> cur.columns),
        segments = cur.segments + (v -> Seq(v)),
        segStats = cur.segStats ++ segStatsOf(v, wr),
        versionTimes = cur.versionTimes + (v -> now0),
        versionOps = cur.versionOps + (v -> "compact"),
        versionRows = cur.versionRows + (v -> wr.rows),
        segRows = cur.segRows ++ segRowsOf(v, wr),
        segColStats = cur.segColStats ++ segColStatsOf(v, wr))
    }
    val pruned = prune(meta)
    catalog.put(pruned)
    catalogIO.save(root, Seq(pruned))
    pruned.info
  }

  /** OPTIMIZE: rewrite the current content as one compacted segment
    * whose PHYSICAL LAYOUT is clustered by `clusterBy` — Delta's
    * `OPTIMIZE ... ZORDER BY` discipline on the versioned-parquet
    * layout. Rows are range-partitioned and sorted by the cluster keys
    * within each time partition, so parquet file and row-group min/max
    * become tight intervals on those keys and a selective scan skips
    * most of the bytes natively (the engine's segment-level stats keep
    * working above that). Content-identical to its predecessor: time
    * travel sees it, the change feed resolves it to "no changes"
    * without a diff, and the read paths are untouched.
    *
    * `zorder = true` interleaves the bits of up to four NUMERIC /
    * DATE / TIMESTAMP cluster columns into one z-value (each scaled to
    * its global min-max range — taken from the catalog's column stats
    * when every segment has them, else one agg job), so multi-
    * dimensional selective scans each skip well instead of only the
    * leading key. With one cluster column, plain range clustering and
    * z-order coincide.
    */
  def optimizeTable(
      name: String,
      clusterBy: Seq[String],
      zorder: Boolean = false,
      incremental: Boolean = false): FeatureTableInfo = this.synchronized {
    if (clusterBy.isEmpty)
      throw new FeatureValidationError(
        "optimizeTable needs at least one cluster column")
    if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
    catalog.getOrThrow(name)
    val (curOpt, v) = claimVersion(name)
    val cur = curOpt.getOrElse {
      storage.releaseVersion(name, v)
      throw new FeatureConcurrencyError(
        s"table '$name' was deleted by another writer during optimizeTable")
    }
    val missing = clusterBy.filterNot(cur.columns.contains)
    if (missing.nonEmpty) {
      storage.releaseVersion(name, v)
      throw new FeatureValidationError(
        s"optimizeTable('$name') cluster columns not in the table: " +
          missing.mkString(", ") + s"; columns are ${cur.columns.mkString(", ")}")
    }
    val spec =
      (if (zorder && clusterBy.size > 1) "zorder:" else "range:") +
        clusterBy.mkString(",")
    val manifest0 = cur.segmentsOf(cur.version)
    // INCREMENTAL (Delta's clustered-OPTIMIZE shape): when the recorded
    // cluster spec matches, already-optimized base segments are
    // re-referenced verbatim and only the tail appended since is
    // rewritten — O(new data) maintenance per run instead of O(table),
    // which is the only affordable cadence at 100 TB. A spec change, or
    // a manifest with no optimized base, falls back to the full rewrite.
    val baseSegs =
      if (incremental && cur.clusterSpec.contains(spec))
        manifest0.filter(s => cur.versionOps.get(s).contains("optimize"))
      else Seq.empty
    val tailSegs = manifest0.filterNot(baseSegs.contains)
    if (baseSegs.nonEmpty && tailSegs.isEmpty) {
      // fully clustered already — nothing to do, nothing minted
      storage.releaseVersion(name, v)
      return cur.info
    }
    val meta = completeClaim(name, v) {
      val source =
        if (baseSegs.isEmpty) currentData(cur).select(cur.columns.map(col): _*)
        else storage.readSegments(
          name, tailSegs, cur.columns, None, cur.columnTypes)
      val cluster: Seq[Column] =
        if (zorder && clusterBy.size > 1) Seq(zValue(cur, clusterBy, source))
        else clusterBy.map(col)
      val wr = storage.writeClustered(
        name, v, prepare(source), EntityIdColumn, TimestampColumn, cluster)
      // content-preservation cross-check: the rewrite must reproduce
      // exactly the rows it replaced (a stale catalog rowCount or a
      // non-idempotent read would otherwise corrupt silently)
      val expectTail = tailSegs.flatMap(cur.segRows.get)
      if (baseSegs.isEmpty && wr.rows != cur.rowCount)
        throw new FeatureValidationError(
          s"optimizeTable('$name') rewrite produced ${wr.rows} rows, table " +
            s"has ${cur.rowCount} — aborting (content must be preserved)")
      if (baseSegs.nonEmpty && expectTail.size == tailSegs.size &&
          wr.rows != expectTail.sum)
        throw new FeatureValidationError(
          s"optimizeTable('$name') incremental rewrite produced ${wr.rows} " +
            s"rows, tail segments hold ${expectTail.sum} — aborting")
      val manifest = if (baseSegs.isEmpty) Seq(v) else baseSegs :+ v
      val now0 = System.currentTimeMillis()
      storage.commitVersion(name, v, CommitMeta(
        wr.rows, cur.rowCount, cur.columns, manifest,
        wr.minTsMillis, wr.maxTsMillis, now0,
        columnTypes = cur.columnTypes,
        operation = "optimize", colStats = wr.colStats,
        constraints = cur.constraints.toMap,
        clusterSpec = Some(spec)))
      cur.copy(version = v, rowCount = cur.rowCount, updatedAt = now0,
        versions = cur.versions + (v -> cur.columns),
        segments = cur.segments + (v -> manifest),
        segStats = cur.segStats ++ segStatsOf(v, wr),
        versionTimes = cur.versionTimes + (v -> now0),
        versionOps = cur.versionOps + (v -> "optimize"),
        versionRows = cur.versionRows + (v -> cur.rowCount),
        segRows = cur.segRows ++ segRowsOf(v, wr),
        segColStats = cur.segColStats ++ segColStatsOf(v, wr),
        clusterSpec = Some(spec))
    }
    val pruned = prune(meta)
    catalog.put(pruned)
    catalogIO.save(root, Seq(pruned))
    pruned.info
  }

  /** The interleaved-bit z-value of `clusterBy` as ONE codegen'd column
    * expression: each column scales linearly into a k-bit code over its
    * GLOBAL min-max (catalog column stats when every current segment
    * recorded them — no job; else one agg over the table), and the
    * codes' bits interleave LSB-first. k = min(16, 63/n), so up to
    * four columns fit a signed long. NULLs code to 0 (cluster first).
    */
  private def zValue(
      cur: TableMeta,
      clusterBy: Seq[String],
      full: DataFrame): Column = {
    if (clusterBy.size > 4)
      throw new FeatureValidationError(
        s"zorder supports at most 4 cluster columns, got ${clusterBy.size}")
    val bad = clusterBy.filterNot { c =>
      full.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.DateType => true
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }
    }
    if (bad.nonEmpty)
      throw new FeatureValidationError(
        "zorder cluster columns must be numeric, date, or timestamp; " +
          s"not: ${bad.mkString(", ")} (use zorder = false for lexicographic " +
          "clustering of other types)")
    val segs = cur.segmentsOf(cur.version)
    // global per-column bounds, as doubles (z-scaling tolerates the
    // precision loss — it only affects bucket boundaries, not values)
    def statBounds(c: String): Option[(Double, Double)] = {
      val perSeg = segs.map(s =>
        cur.segColStats.getOrElse(s, Map.empty).get(c).flatMap { st =>
          val ddl = cur.columnTypes.getOrElse(c, "").toUpperCase
          def cvt(v: String): Option[Double] =
            if (ddl.startsWith("TIMESTAMP") || ddl == "DATE") v.toDoubleOption
            else scala.util.Try(
              new java.math.BigDecimal(v).doubleValue()).toOption
          for { lo <- st.min.flatMap(cvt); hi <- st.max.flatMap(cvt) }
            yield (lo, hi)
        })
      if (perSeg.forall(_.isDefined))
        Some((perSeg.flatten.map(_._1).min, perSeg.flatten.map(_._2).max))
      else None
    }
    // numeric z-code domain per column: cast to double. TIMESTAMP casts
    // to SECONDS while its stats are micros — align by scaling
    def asDouble(c: String): Column =
      full.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          col(c).cast("double") * lit(1e6)
        case org.apache.spark.sql.types.DateType =>
          datediff(col(c), lit("1970-01-01").cast("date")).cast("double")
        case _ => col(c).cast("double")
      }
    val bounds: Seq[(Double, Double)] = {
      val fromStats = clusterBy.map(statBounds)
      if (fromStats.forall(_.isDefined)) fromStats.flatten
      else {
        val aggs = clusterBy.flatMap(c =>
          Seq(min(asDouble(c)), max(asDouble(c))))
        val row = full.agg(aggs.head, aggs.tail: _*).head()
        clusterBy.indices.map { i =>
          (Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]),
            Option(row.get(2 * i + 1)).fold(1.0)(_.asInstanceOf[Double]))
        }
      }
    }
    val n = clusterBy.size
    val nbits = math.min(16, 63 / n)
    val maxCode = (1L << nbits) - 1
    val codes: Seq[Column] = clusterBy.zip(bounds).map { case (c, (lo, hi)) =>
      val range = if (hi > lo) hi - lo else 1.0
      val scaled = (asDouble(c) - lit(lo)) / lit(range) * lit(maxCode.toDouble)
      least(lit(maxCode), greatest(lit(0L), scaled.cast("long")))
    }
    (0 until nbits).foldLeft(lit(0L)) { (acc, i) =>
      codes.zipWithIndex.foldLeft(acc) { case (a, (code, j)) =>
        a.bitwiseOR(shiftleft(shiftright(code, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** One discovery scan over a manifest: per segment, (total rows,
    * hit rows) — the classification that bounds copy-on-write rewrites
    * to affected segments. `withHit` decorates the segment-tagged
    * union with a hit marker (counted when non-null); the driver
    * result is O(#segments), bounded by the manifest cap.
    */
  private def classifySegments(
      name: String,
      meta: TableMeta,
      segs: Seq[Int],
      readCols: Seq[String])(
      withHit: DataFrame => (DataFrame, Column)): Map[Int, (Long, Long)] = {
    val tagged = segs.map { s =>
      storage.readSegments(name, Seq(s), readCols, None, meta.columnTypes)
        .withColumn(FeatureStore.SegTagCol, lit(s))
    }.reduce(_.unionByName(_))
    val (decorated, hit) = withHit(tagged)
    decorated
      .groupBy(col(FeatureStore.SegTagCol))
      .agg(count(lit(1)).as("_graft_total"), count(hit).as("_graft_hits"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  /** Row-level DELETE with copy-on-write rewrite — Delta Lake's
    * `DELETE FROM` shape on the manifest-chained layout. Rows where
    * `condition` is TRUE leave the table as a NEW version; history is
    * untouched (prior versions still read the original rows, so time
    * travel across deletes works, and vacuum reclaims the replaced
    * segments only after they leave the retention window).
    * NULL-condition rows are KEPT, matching SQL DELETE semantics.
    * `condition` must be deterministic over the table's registered
    * columns (it is evaluated up to three times: classification,
    * survivor filter, change-set record — nondeterminism is detected
    * by count cross-checks on the latter two and rejected).
    *
    * Cost shape (the 100 TB story): ONE discovery scan classifies
    * segments (per-segment counts — a map-side-combined aggregate, no
    * row shuffle), then only segments that CONTAIN matches are
    * rewritten; untouched segments are re-referenced by the new
    * manifest verbatim, so write amplification is O(affected
    * segments), not O(table). A segment whose rows ALL match is simply
    * dropped from the manifest — zero bytes written. Surviving rows
    * keep their original ingest keys, so tie-break winners among
    * duplicate (entity, ts) observations never change under an
    * unrelated delete.
    *
    * Returns the new version's info. A delete matching NOTHING is a
    * no-op (no version minted — the claim is released). Deleting EVERY
    * row is rejected (registered tables are non-empty by contract) —
    * use [[delete]] to drop the table.
    */
  def deleteRows(name: String, condition: Column): FeatureTableInfo =
    this.synchronized {
      if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
      catalog.getOrThrow(name)
      val (curOpt, v) = claimVersion(name)
      val cur = curOpt.getOrElse {
        storage.releaseVersion(name, v)
        throw new FeatureConcurrencyError(
          s"table '$name' was deleted by another writer during deleteRows")
      }
      val segs = cur.segmentsOf(cur.version)
      // probe + classification run under the claim but before the
      // commit body: release the reservation on ANY failure here (an
      // unknown-column predicate, a transient scan error) so a failed
      // classification can't wedge the lineage until a vacuum sweep
      val perSeg = try {
        // the classification scan reads ONLY the columns the predicate
        // references — on a wide feature table this is the difference
        // between scanning 2 columns and 200. The references come from
        // ANALYZING a probe filter over the table schema (no job
        // runs), so qualified/case-insensitive references resolve
        // exactly as the real filter will; a predicate naming an
        // unknown column raises the normal analysis error here.
        val resolved = resolveCondition(name, cur, condition)
        val condRefs =
          resolved.toSeq.flatMap(_.references.map(_.name).toSeq).distinct
        val classifyCols =
          if (condRefs.nonEmpty && condRefs.forall(cur.columns.contains))
            condRefs
          else cur.columns
        // column-stats skipping: segments the predicate provably cannot
        // match skip the scan entirely and classify as (rows, 0 hits)
        // from the catalog's segment row record — at 100 TB a
        // time-clustered GDPR delete classifies one day, not the corpus
        val (scanSegs, skipped) = pruneSegments(cur, segs, resolved)
        val scanned =
          if (scanSegs.isEmpty) Map.empty[Int, (Long, Long)]
          else classifySegments(name, cur, scanSegs, classifyCols)(df =>
            (df, when(condition, lit(1))))
        scanned ++ skipped.map(s => s -> (cur.segRows(s), 0L))
      } catch {
        case e: Throwable =>
          try storage.releaseVersion(name, v) catch { case _: Exception => () }
          throw e
      }
      val total = perSeg.values.map(_._1).sum
      val hits = perSeg.values.map(_._2).sum
      if (hits == 0L) { storage.releaseVersion(name, v); return cur.info }
      if (hits == total) {
        storage.releaseVersion(name, v)
        throw new FeatureValidationError(
          s"deleteRows would remove every row of '$name'; registered tables " +
            "are non-empty — use delete(name) to drop the whole table")
      }
      val affected = segs.filter(s => perSeg.get(s).exists(_._2 > 0L))
      val untouched = segs.filterNot(affected.contains)
      val affectedTotal = affected.map(s => perSeg(s)._1).sum
      val meta = completeClaim(name, v) {
        val now0 = System.currentTimeMillis()
        if (affectedTotal == hits) {
          // every affected segment matches WHOLLY: the new manifest
          // just drops them — no data write at all
          storage.commitVersion(name, v, CommitMeta(
            0L, total - hits, cur.columns, untouched,
            None, None, now0, cur.columnTypes, operation = "delete",
            constraints = cur.constraints.toMap))
          cur.copy(version = v, rowCount = total - hits, updatedAt = now0,
            versions = cur.versions + (v -> cur.columns),
            segments = cur.segments + (v -> untouched),
            versionTimes = cur.versionTimes + (v -> now0),
            versionOps = cur.versionOps + (v -> "delete"),
            versionRows = cur.versionRows + (v -> (total - hits)))
        } else {
          // rewrite ONLY the affected segments' survivors as this
          // version's own segment; ingest keys pass through unchanged
          val survivors = storage
            .readSegments(name, affected, cur.columns :+ IngestKeyCol, None,
              cur.columnTypes)
            .filter(not(coalesce(condition, lit(false))))
          val wr = writeKeepingLayout(cur, name, v, survivors)
          if (wr.rows != affectedTotal - hits)
            throw new FeatureValidationError(
              s"deleteRows condition on '$name' is nondeterministic: the " +
                s"classification pass matched $hits rows but the rewrite kept " +
                s"${wr.rows} of $affectedTotal (expected ${affectedTotal - hits})")
          // record the exact change set at commit time (Delta's
          // _change_data discipline): O(deleted) extra write here buys
          // an O(changes) change-feed read instead of a two-snapshot
          // diff — the only shape that survives 100 TB. The commit
          // itself carries the recorded row count: a file is trusted
          // by the feed only when its version's commit vouches for it.
          val cdfRows = storage.writeChangeData(name, v,
            storage.readSegments(name, affected, cur.columns, None,
              cur.columnTypes)
              .filter(condition)
              .withColumn(FeatureStore.ChangeTypeCol, lit("delete")))
          if (cdfRows >= 0 && cdfRows != hits)
            throw new FeatureValidationError(
              s"deleteRows condition on '$name' is nondeterministic: " +
                s"$hits rows matched classification but the recorded change " +
                s"set holds $cdfRows")
          val manifest = untouched :+ v
          storage.commitVersion(name, v, CommitMeta(
            wr.rows, total - hits, cur.columns, manifest,
            wr.minTsMillis, wr.maxTsMillis, now0, cur.columnTypes,
            operation = "delete", changeRows = cdfRows,
            colStats = wr.colStats, constraints = cur.constraints.toMap))
          cur.copy(version = v, rowCount = total - hits, updatedAt = now0,
            versions = cur.versions + (v -> cur.columns),
            segments = cur.segments + (v -> manifest),
            segStats = cur.segStats ++ segStatsOf(v, wr),
            versionTimes = cur.versionTimes + (v -> now0),
            versionOps = cur.versionOps + (v -> "delete"),
            versionRows = cur.versionRows + (v -> (total - hits)),
            versionCdf =
              if (cdfRows >= 0) cur.versionCdf + (v -> cdfRows)
              else cur.versionCdf,
            segRows = cur.segRows ++ segRowsOf(v, wr),
            segColStats = cur.segColStats ++ segColStatsOf(v, wr))
        }
      }
      val pruned = prune(meta)
      catalog.put(pruned)
      catalogIO.save(root, Seq(pruned))
      pruned.info
    }

  /** Row-level DELETE by an explicit (entity, ts) KEY SET, fully
    * distributed — the form `deleteRows(condition)` cannot express
    * without materializing keys on the driver (CDC applies, GDPR
    * key-list purges). Copy-on-write like the condition form: the key
    * frame's (entity, ts) bounds prune stats-disjoint segments, a
    * column-pruned join classification finds affected ones, their
    * anti-join survivors rewrite (through the recorded cluster layout)
    * as the new version's segment, untouched segments re-reference
    * verbatim, and the change set records the deleted rows. Keys
    * absent from the table are ignored — re-applying a delete is a
    * natural no-op, which is what makes CDC replay idempotent.
    * Returns None when nothing matched (no version minted); deleting
    * every row is rejected.
    */
  def deleteRowsByKeys(
      name: String, keyDf: DataFrame): Option[FeatureTableInfo] =
    this.synchronized {
      if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
      catalog.getOrThrow(name)
      val missingCols = Seq(EntityIdColumn, TimestampColumn)
        .filterNot(keyDf.columns.contains)
      if (missingCols.nonEmpty)
        throw new FeatureValidationError(
          s"deleteRowsByKeys('$name') needs columns " +
            s"($EntityIdColumn, $TimestampColumn); missing: " +
            missingCols.mkString(", "))
      val (curOpt, v) = claimVersion(name)
      val cur = curOpt.getOrElse {
        storage.releaseVersion(name, v)
        throw new FeatureConcurrencyError(
          s"table '$name' was deleted by another writer during deleteRowsByKeys")
      }
      val meta = completeClaim(name, v) {
        val keys = keyDf
          .select(col(EntityIdColumn),
            col(TimestampColumn).cast(TimestampType).as(TimestampColumn))
          .distinct()
        val boundsRow = keys.agg(
          count(lit(1)),
          min(col(EntityIdColumn)), max(col(EntityIdColumn)),
          min(col(TimestampColumn)), max(col(TimestampColumn)),
          count(when(col(EntityIdColumn).isNull, 1)),
          count(when(col(TimestampColumn).isNull, 1))).head()
        if (boundsRow.getLong(0) == 0L) {
          storage.releaseVersion(name, v)
          return None
        }
        val segs = cur.segmentsOf(cur.version)
        val resolvedBounds = (for {
          loE <- Option(boundsRow.get(1)); hiE <- Option(boundsRow.get(2))
          loT <- Option(boundsRow.get(3)); hiT <- Option(boundsRow.get(4))
        } yield scala.util.Try(resolveCondition(name, cur,
          keyRangeCondition(loE, hiE, loT, hiT,
            boundsRow.getLong(5) > 0L, boundsRow.getLong(6) > 0L)))
          .toOption.flatten)
          .flatten
        val (scanSegs, skipped) = pruneSegments(cur, segs, resolvedBounds)
        val perSeg = (if (scanSegs.isEmpty) Map.empty[Int, (Long, Long)]
          else classifySegments(name, cur, scanSegs,
            Seq(EntityIdColumn, TimestampColumn))(df =>
            (joinKeysHit(df, keys), col("_graft_hit")))) ++
          skipped.map(s => s -> (cur.segRows(s), 0L))
        val total = perSeg.values.map(_._1).sum
        val hits = perSeg.values.map(_._2).sum
        if (hits == 0L) { storage.releaseVersion(name, v); return None }
        if (hits == total)
          throw new FeatureValidationError(
            s"deleteRowsByKeys would remove every row of '$name'; " +
              "registered tables are non-empty — use delete(name)")
        val affected = segs.filter(s => perSeg.get(s).exists(_._2 > 0L))
        val untouched = segs.filterNot(affected.contains)
        val affectedTotal = affected.map(s => perSeg(s)._1).sum
        val now0 = System.currentTimeMillis()
        if (affectedTotal == hits) {
          // affected segments match WHOLLY: drop them, write nothing
          storage.commitVersion(name, v, CommitMeta(
            0L, total - hits, cur.columns, untouched,
            None, None, now0, cur.columnTypes, operation = "delete",
            constraints = cur.constraints.toMap))
          cur.copy(version = v, rowCount = total - hits, updatedAt = now0,
            versions = cur.versions + (v -> cur.columns),
            segments = cur.segments + (v -> untouched),
            versionTimes = cur.versionTimes + (v -> now0),
            versionOps = cur.versionOps + (v -> "delete"),
            versionRows = cur.versionRows + (v -> (total - hits)))
        } else {
          val survivors = joinKeysNullSafe(
            storage.readSegments(name, affected, cur.columns :+ IngestKeyCol,
              None, cur.columnTypes),
            keys, "left_anti")
          val wr = writeKeepingLayout(cur, name, v, survivors)
          if (wr.rows != affectedTotal - hits)
            throw new FeatureValidationError(
              s"deleteRowsByKeys on '$name': classification matched $hits " +
                s"rows but the rewrite kept ${wr.rows} of $affectedTotal " +
                s"(expected ${affectedTotal - hits}) — key frame must be " +
                "deterministic")
          val cdfRows = storage.writeChangeData(name, v,
            joinKeysNullSafe(
              storage.readSegments(name, affected, cur.columns, None,
                cur.columnTypes),
              keys, "left_semi")
              .withColumn(FeatureStore.ChangeTypeCol, lit("delete")))
          if (cdfRows >= 0 && cdfRows != hits)
            throw new FeatureValidationError(
              s"deleteRowsByKeys on '$name': $hits rows matched but the " +
                s"recorded change set holds $cdfRows — key frame must be " +
                "deterministic")
          val manifest = untouched :+ v
          storage.commitVersion(name, v, CommitMeta(
            wr.rows, total - hits, cur.columns, manifest,
            wr.minTsMillis, wr.maxTsMillis, now0, cur.columnTypes,
            operation = "delete", changeRows = cdfRows,
            colStats = wr.colStats, constraints = cur.constraints.toMap))
          cur.copy(version = v, rowCount = total - hits, updatedAt = now0,
            versions = cur.versions + (v -> cur.columns),
            segments = cur.segments + (v -> manifest),
            segStats = cur.segStats ++ segStatsOf(v, wr),
            versionTimes = cur.versionTimes + (v -> now0),
            versionOps = cur.versionOps + (v -> "delete"),
            versionRows = cur.versionRows + (v -> (total - hits)),
            versionCdf =
              if (cdfRows >= 0) cur.versionCdf + (v -> cdfRows)
              else cur.versionCdf,
            segRows = cur.segRows ++ segRowsOf(v, wr),
            segColStats = cur.segColStats ++ segColStatsOf(v, wr))
        }
      }
      val pruned = prune(meta)
      catalog.put(pruned)
      catalogIO.save(root, Seq(pruned))
      Some(pruned.info)
    }

  /** MERGE-style upsert keyed by (entity_id, timestamp) — Delta's
    * `MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` for
    * the observation model: every current row whose key appears in
    * `df` is REPLACED by the delta's row(s) for that key; keys new to
    * the table INSERT. The delta must carry exactly the current
    * schema (use [[register]] for schema changes). Falls back to a
    * plain [[register]] when the table doesn't exist yet.
    *
    * Copy-on-write, O(affected segments + delta) writes: a discovery
    * scan over just the KEY COLUMNS (column-pruned) finds segments
    * holding matched keys; their surviving rows plus the whole delta
    * become the new version's single segment, and untouched segments
    * are re-referenced verbatim. Duplicate keys WITHIN the delta all
    * insert — the store allows duplicate (entity, ts) observations,
    * ordered by its deterministic ingest-key tie-break. Prior
    * versions are untouched (time travel across upserts works).
    *
    * Key matching is NULL-SAFE: a delta key with a NULL component
    * replaces exactly the current rows whose component IS NULL (null
    * keys are legal observations, and "every current row whose key
    * appears in df" must mean them too — a null-unsafe match would
    * silently accumulate duplicates for rows with unknown time).
    * [[deleteRowsByKeys]] and [[registerRewrite]] drop keys the same
    * way.
    */
  def registerUpsert(
      name: String,
      df: DataFrame,
      mergeSchema: Boolean = false): FeatureTableInfo =
    registerUpsertWith(name, df, watermark = None, mergeSchema = mergeSchema)

  /** The ATOMIC merge-rewrite: ONE commit that both REPLACES every
    * current row whose key appears in `df` (exactly [[registerUpsert]]'s
    * contract) and DROPS every current row whose key appears in
    * `dropKeys` but has no replacement in the delta. This is the
    * single-commit primitive behind SQL UPDATE/MERGE (rekeying updates
    * and DELETE actions): expressed as deleteRowsByKeys + registerUpsert
    * those statements would span TWO versions, leaving a crash window
    * with matched rows deleted but not yet re-inserted and a time-travel
    * history showing a state no statement produced — Delta's MERGE is
    * likewise one commit. Cost is identical to the upsert alone: the
    * drop keys ride the same discovery scan, copy-on-write rewrite and
    * recorded change set (dropped rows appear as `delete` images).
    * `df` must be non-empty — a pure key-set delete is
    * [[deleteRowsByKeys]].
    */
  def registerRewrite(
      name: String,
      df: DataFrame,
      dropKeys: DataFrame,
      mergeSchema: Boolean = false): FeatureTableInfo =
    registerUpsertWith(name, df, watermark = None, mergeSchema = mergeSchema,
      dropKeys = Some(dropKeys))

  private def registerUpsertWith(
      name: String,
      df: DataFrame,
      watermark: Option[(String, Long)],
      mergeSchema: Boolean = false,
      dropKeys: Option[DataFrame] = None): FeatureTableInfo =
    this.synchronized {
      Validation.validateDataFrame(df, name)
      dropKeys.foreach { dk =>
        val missing = Seq(EntityIdColumn, TimestampColumn)
          .filterNot(dk.columns.contains)
        if (missing.nonEmpty)
          throw new FeatureValidationError(
            s"registerRewrite('$name') dropKeys needs columns " +
              s"($EntityIdColumn, $TimestampColumn); missing: " +
              missing.mkString(", "))
      }
      // a rewrite (dropKeys present) addresses EXISTING rows — on a
      // table that doesn't exist it must fail like any other lookup,
      // not silently degrade to a plain register that ignores the drops
      def requireExistsForRewrite(): Unit =
        dropKeys.foreach(_ => catalog.getOrThrow(name))
      if (catalog.get(name).isEmpty && !storage.arbitrates) {
        requireExistsForRewrite()
        return registerWith(name, df, watermark)
      }
      val (curOpt, v) = claimVersion(name)
      val cur = curOpt.getOrElse {
        storage.releaseVersion(name, v)
        // the arbitrated log says the table is absent — the local
        // catalog may be stale, so don't consult it here
        dropKeys.foreach(_ => throw new FeatureTableNotFoundError(
          s"registerRewrite('$name'): table not found (a rewrite " +
            "addresses existing rows; register the table first)"))
        return registerWith(name, df, watermark)
      }
      val meta = completeClaim(name, v) {
        // merge-schema evolution, exactly registerAppend's contract:
        // existing columns must all stay (types unchanged — checked
        // even for same-shape deltas), new ones append; prior segments
        // read them as typed nulls
        val evolved = evolveColumns("registerUpsert", name, cur, df, mergeSchema)
        val newTypes = cur.columnTypes ++ typesOf(df)
        val prepared = prepare(df.select(evolved.map(col): _*))
        // ONE tiny agg job: delta size + its key-domain bounds (the
        // count the idempotence cross-check needs anyway, plus what
        // key-range skipping needs — no extra pass over the delta)
        val boundsRow = prepared.agg(
          count(lit(1)),
          min(col(EntityIdColumn)), max(col(EntityIdColumn)),
          min(col(TimestampColumn)), max(col(TimestampColumn)),
          count(when(col(EntityIdColumn).isNull, 1)),
          count(when(col(TimestampColumn).isNull, 1))).head()
        val deltaCount = boundsRow.getLong(0)
        val dropped = dropKeys.map { dk =>
          if (deltaCount == 0L)
            throw new FeatureValidationError(
              s"registerRewrite('$name') got an empty delta; a pure " +
                "key-set delete is deleteRowsByKeys")
          dk.select(col(EntityIdColumn),
            col(TimestampColumn).cast(TimestampType).as(TimestampColumn))
            .distinct()
        }
        val keys = dropped.fold(
          prepared.select(col(EntityIdColumn), col(TimestampColumn)).distinct())(
          d => prepared.select(col(EntityIdColumn), col(TimestampColumn))
            .unionByName(d).distinct())
        // with drop keys the skip bounds must span delta AND drops —
        // one extra tiny agg on the (small) key frame, only on that path
        val kb = dropped.fold(boundsRow)(_ => keys.agg(
          count(lit(1)),
          min(col(EntityIdColumn)), max(col(EntityIdColumn)),
          min(col(TimestampColumn)), max(col(TimestampColumn)),
          count(when(col(EntityIdColumn).isNull, 1)),
          count(when(col(TimestampColumn).isNull, 1))).head())
        val segs = cur.segmentsOf(cur.version)
        // key-range skipping: a segment disjoint from the delta's
        // (entity, ts) bounds on EITHER dimension holds no matched key
        // — with time-sliced appends a CDC delta of recent keys
        // classifies against recent segments only, O(delta) not O(table)
        val resolvedBounds = (for {
          loE <- Option(kb.get(1)); hiE <- Option(kb.get(2))
          loT <- Option(kb.get(3)); hiT <- Option(kb.get(4))
        } yield scala.util.Try(resolveCondition(name, cur,
          keyRangeCondition(loE, hiE, loT, hiT,
            kb.getLong(5) > 0L, kb.getLong(6) > 0L)))
          .toOption.flatten)
          .flatten
        val (scanSegs, skipped) = pruneSegments(cur, segs, resolvedBounds)
        val perSeg = (if (scanSegs.isEmpty) Map.empty[Int, (Long, Long)]
          else classifySegments(name, cur, scanSegs,
            Seq(EntityIdColumn, TimestampColumn))(df =>
            (joinKeysHit(df, keys), col("_graft_hit")))) ++
          skipped.map(s => s -> (cur.segRows(s), 0L))
        val affected = segs.filter(s => perSeg.get(s).exists(_._2 > 0L))
        val untouched = segs.filterNot(affected.contains)
        val untouchedRows = untouched.map(s => perSeg.get(s).fold(0L)(_._1)).sum
        val survivors = Option.when(affected.nonEmpty)(
          joinKeysNullSafe(
            storage.readSegments(name, affected, evolved :+ IngestKeyCol,
              None, newTypes),
            keys, "left_anti"))
        val newSeg = survivors.fold(prepared)(_.unionByName(prepared))
        val (guarded, checksOk) = constraintGuard(cur.constraints, newSeg)
        val wr = writeKeepingLayout(cur, name, v, guarded)
        verifyOrScrap(name, v)(checksOk)
        // determinism cross-check (the delta is evaluated by several
        // independent jobs — discovery, write, change set): the
        // written segment must hold exactly the affected survivors
        // plus the delta, or a nondeterministic delta just lost rows
        val replaced = perSeg.values.map(_._2).sum
        val affectedTotal = affected.map(s => perSeg.get(s).fold(0L)(_._1)).sum
        if (wr.rows != (affectedTotal - replaced) + deltaCount)
          throw new FeatureValidationError(
            s"registerUpsert delta for '$name' is nondeterministic: wrote " +
              s"${wr.rows} rows, expected ${(affectedTotal - replaced) + deltaCount} " +
              s"($affectedTotal affected - $replaced replaced + $deltaCount delta)")
        // record the change set (Delta _change_data): delete images =
        // replaced rows, insert images = the delta — with
        // identical-content pairs cancelled (an upsert re-writing the
        // same bytes is NOT a change), computed over touched rows only
        val deltaRows = prepared.drop(IngestKeyCol)
        val changeSet =
          if (affected.isEmpty)
            deltaRows.withColumn(FeatureStore.ChangeTypeCol, lit("insert"))
          else {
            val replacedRows = joinKeysNullSafe(
              storage.readSegments(name, affected, evolved, None, newTypes),
              keys, "left_semi")
            replacedRows.exceptAll(deltaRows)
              .withColumn(FeatureStore.ChangeTypeCol, lit("delete"))
              .unionByName(deltaRows.exceptAll(replacedRows)
                .withColumn(FeatureStore.ChangeTypeCol, lit("insert")))
          }
        val cdfRows = storage.writeChangeData(name, v, changeSet)
        val now0 = System.currentTimeMillis()
        val manifest = untouched :+ v
        storage.commitVersion(name, v, CommitMeta(
          wr.rows, untouchedRows + wr.rows, evolved, manifest,
          wr.minTsMillis, wr.maxTsMillis, now0, newTypes,
          operation = "upsert", changeRows = cdfRows,
          colStats = wr.colStats, constraints = cur.constraints.toMap))
        cur.copy(version = v, rowCount = untouchedRows + wr.rows,
          updatedAt = now0,
          columnTypes = newTypes,
          versions = cur.versions + (v -> evolved),
          segments = cur.segments + (v -> manifest),
          segStats = cur.segStats ++ segStatsOf(v, wr),
          versionTimes = cur.versionTimes + (v -> now0),
          versionOps = cur.versionOps + (v -> "upsert"),
          versionRows = cur.versionRows + (v -> (untouchedRows + wr.rows)),
          versionCdf =
            if (cdfRows >= 0) cur.versionCdf + (v -> cdfRows)
            else cur.versionCdf,
          segRows = cur.segRows ++ segRowsOf(v, wr),
          segColStats = cur.segColStats ++ segColStatsOf(v, wr))
      }
      val pruned = stampWatermark(prune(meta), watermark)
      catalog.put(pruned)
      catalogIO.save(root, Seq(pruned))
      pruned.info
    }

  /** The CDC-apply twin of [[registerAppendBatch]]: upsert-register
    * `df` under the same per-stream batch-id idempotence — the
    * streaming MERGE shape (each micro-batch of a change stream
    * replaces matched keys and inserts new ones, exactly once). A
    * crash-recovery replay of the last batch is detected and skipped,
    * and the batch watermark commits in the SAME catalog save as the
    * version it marks, so no crash window can replay a batch into a
    * duplicate upsert.
    */
  def registerUpsertBatch(
      name: String,
      df: DataFrame,
      batchId: Long,
      streamId: String = CatalogIO.LegacyStreamId,
      mergeSchema: Boolean = false): Option[FeatureTableInfo] =
    idempotent(name, streamId, batchId)(
      registerUpsertWith(name, df, _, mergeSchema = mergeSchema))

  /** [[registerRewrite]] under the same per-stream batch-id
    * idempotence — the streaming CDC-apply shape when one micro-batch
    * nets BOTH replacements and key deletes: ONE commit (no crash
    * window with keys deleted but their replacements unregistered),
    * replay-skipped exactly like the other *Batch entries.
    */
  def registerRewriteBatch(
      name: String,
      df: DataFrame,
      dropKeys: DataFrame,
      batchId: Long,
      streamId: String = CatalogIO.LegacyStreamId,
      mergeSchema: Boolean = false): Option[FeatureTableInfo] =
    idempotent(name, streamId, batchId)(
      registerUpsertWith(name, df, _, mergeSchema = mergeSchema,
        dropKeys = Some(dropKeys)))

  /** CHANGE DATA FEED: row-level changes between two retained versions
    * — Delta's `table_changes` surface. Output columns are the union
    * of the involved versions' columns (evolution-padded with typed
    * nulls) plus `_change_type` ("insert" | "delete") and
    * `_commit_version`, one block per version step.
    *
    * Per-step cost, cheapest applicable plan first:
    *   - a step whose recorded operation is `compact` is
    *     content-preserving BY CONSTRUCTION → contributes nothing,
    *     zero scan;
    *   - a mutation that RECORDED its change set at commit time
    *     (deleteRows rewrites, upserts — the Delta `_change_data`
    *     discipline) reads it back directly — O(changes);
    *   - a step that only ADDS segments (append lineage) reads just
    *     the added segments — O(step delta);
    *   - a step that only DROPS segments (whole-segment delete) reads
    *     just the dropped ones — O(rows deleted);
    *   - a RESTORE step is COMPOSED as the net inverse of the interval
    *     back to its source version, from those same cheap per-step
    *     changes — O(interval changes);
    *   - anything else (full re-registers, legacy catalogs, storages
    *     without change-data support, restores whose source left
    *     retention or whose interval contains an un-diffable step)
    *     falls back to an exact multiset diff of the two snapshots
    *     (`EXCEPT ALL` both ways).
    * Updates surface as delete + insert pairs (no
    * update_pre/postimage rows). A merge-schema append step reports
    * only its inserted rows — pre-existing rows reading a new column
    * as null are not "changes", matching Delta CDF.
    *
    * `fromVersion = 0` means "since creation". Every version in
    * [max(fromVersion, 1), toVersion] must still be retained —
    * changes are attributed per commit, and the first step needs
    * fromVersion's own manifest — so asking across pruned history
    * raises with the available range.
    */
  def getChanges(name: String, fromVersion: Int, toVersion: Int): DataFrame = {
    val meta = resolveMeta(name)
    if (fromVersion < 0 || toVersion < 1 || toVersion < fromVersion)
      throw new FeatureValidationError(
        s"getChanges needs 0 <= fromVersion <= toVersion (toVersion >= 1), " +
          s"got ($fromVersion, $toVersion)")
    val needed = (math.max(fromVersion, 1) to toVersion).toSeq
    val missing = needed.filterNot(meta.versions.contains)
    if (missing.nonEmpty)
      throw new FeatureTableNotFoundError(
        s"getChanges($fromVersion, $toVersion) on '$name' needs versions " +
          s"${needed.mkString(", ")} retained; missing: " +
          s"${missing.mkString(", ")}. Available versions: " +
          s"${meta.versions.keys.mkString(", ")}")
    val outCols = needed.foldLeft(Vector.empty[String]) { (acc, ver) =>
      acc ++ meta.versions(ver).filterNot(acc.contains)
    }
    def readSegs(ss: Seq[Int]): DataFrame =
      storage.readSegments(name, ss, outCols, None, meta.columnTypes)
    def stamped(df: DataFrame, tpe: String, ver: Int): DataFrame =
      df.withColumn(FeatureStore.ChangeTypeCol, lit(tpe))
        .withColumn(FeatureStore.CommitVersionCol, lit(ver))
    // change rows recorded at mutation time (delete/upsert rewrites)
    // read back O(changes); evolution pads resolve from the type
    // record. Gated on the catalog's per-commit authorization
    // ([[TableMeta.versionCdf]]): a crashed mutation's leftover file at
    // a reused version number is never misattributed to the commit
    // that eventually landed there.
    def recorded(ver: Int): Option[DataFrame] =
      (if (meta.versionCdf.contains(ver)) storage.readChangeData(name, ver)
       else None).map { cd =>
        val padded = outCols
          .filterNot(cd.columns.contains)
          .flatMap(c => meta.columnTypes.get(c).map(c -> _))
          .foldLeft(cd) { case (df, (c, t)) =>
            df.withColumn(c, lit(null).cast(t))
          }
        padded.select((outCols :+ FeatureStore.ChangeTypeCol).map(col): _*)
      }
    // a step's exact multiset change (insert frames, delete frames)
    // over outCols, CHEAP PATHS ONLY: compact = nothing, recorded
    // change sets, append-added segments, dropped segments. None =
    // only a snapshot diff can answer. Shared by the per-step feed and
    // the restore composition below.
    def stepRaw(ver: Int): Option[(Seq[DataFrame], Seq[DataFrame])] = {
      val prevSegs = if (ver == 1) Seq.empty[Int] else meta.segmentsOf(ver - 1)
      val curSegs = meta.segmentsOf(ver)
      lazy val rec = recorded(ver)
      if (meta.versionOps.get(ver).exists(FeatureStore.ContentPreservingOps))
        Some((Nil, Nil))
      else if (rec.isDefined) {
        val cd = rec.get
        def side(t: String) = cd
          .filter(col(FeatureStore.ChangeTypeCol) === t)
          .select(outCols.map(col): _*)
        // a delete commit's recorded set is all-deletes by
        // construction — one untyped read, no filter, and the
        // composition's cancellation short-circuits on the empty side
        if (meta.versionOps.get(ver).contains("delete"))
          Some((Nil, Seq(cd.select(outCols.map(col): _*))))
        else Some((Seq(side("insert")), Seq(side("delete"))))
      } else if (prevSegs.forall(curSegs.contains)) {
        val added = curSegs.filterNot(prevSegs.contains)
        Some((if (added.isEmpty) Nil else Seq(readSegs(added)), Nil))
      } else if (curSegs.forall(prevSegs.contains)) {
        val dropped = prevSegs.filterNot(curSegs.contains)
        Some((Nil, Seq(readSegs(dropped))))
      } else None
    }
    // a RESTORE step's feed is the NET INVERSE of the interval since
    // its source version (content(ver) == content(s), so the step diff
    // (ver-1 → ver) equals the diff (ver-1 → s) — undo the interval):
    // accumulate the interval's cheap per-step changes, swap roles,
    // and cancel multiset overlap. O(interval changes), never a
    // two-snapshot diff — the only shape that survives restoring a
    // 100 TB table while a follower is subscribed. Source version:
    // any retained version < ver with the SAME manifest (the manifest
    // determines content); nearest match minimizes the interval.
    // None = source pruned or some interval step needs a diff itself.
    def composeRestore(ver: Int): Option[Seq[DataFrame]] = {
      val curSet = meta.segmentsOf(ver).toSet
      meta.versions.keys
        .filter(s => s < ver && meta.segmentsOf(s).toSet == curSet)
        .maxOption
        .flatMap { s =>
          val interval = (s + 1 until ver).map(stepRaw)
          if (interval.exists(_.isEmpty)) None
          else {
            val stepsRaw = interval.flatten
            val insU = stepsRaw.flatMap(_._1).reduceOption(_.unionByName(_))
            val delU = stepsRaw.flatMap(_._2).reduceOption(_.unionByName(_))
            val restoreIns = (delU, insU) match {
              case (Some(d0), Some(i0)) => Some(d0.exceptAll(i0))
              case (d0, None)           => d0
              case (None, _)            => None
            }
            val restoreDel = (insU, delU) match {
              case (Some(i0), Some(d0)) => Some(i0.exceptAll(d0))
              case (i0, None)           => i0
              case (None, _)            => None
            }
            Some(Seq(
              restoreIns.map(stamped(_, "insert", ver)),
              restoreDel.map(stamped(_, "delete", ver))).flatten)
          }
        }
    }
    val steps: Seq[DataFrame] = (fromVersion + 1 to toVersion).flatMap { ver =>
      def diff(): DataFrame = {
        val prevSegs =
          if (ver == 1) Seq.empty[Int] else meta.segmentsOf(ver - 1)
        val prev = readSegs(prevSegs)
        val curD = readSegs(meta.segmentsOf(ver))
        stamped(curD.exceptAll(prev), "insert", ver).unionByName(
          stamped(prev.exceptAll(curD), "delete", ver))
      }
      lazy val rec = recorded(ver)
      if (!meta.versionOps.get(ver).exists(FeatureStore.ContentPreservingOps) &&
          rec.isDefined)
        // single-frame recorded read (one _cdf scan; types in the file)
        Some(rec.get.withColumn(FeatureStore.CommitVersionCol, lit(ver)))
      else stepRaw(ver) match {
        case Some((ins, del)) =>
          val parts = ins.map(stamped(_, "insert", ver)) ++
            del.map(stamped(_, "delete", ver))
          parts.reduceOption(_.unionByName(_))
        case None if meta.versionOps.get(ver).contains("restore") =>
          composeRestore(ver) match {
            case Some(parts) => parts.reduceOption(_.unionByName(_))
            case None        => Some(diff())
          }
        case None => Some(diff())
      }
    }
    // the schema-bearing empty seed (one segment read at plan time) is
    // built ONLY when no step contributed — with steps present it
    // would just add plan-time file listings to every feed
    if (steps.isEmpty)
      stamped(
        readSegs(meta.segmentsOf(toVersion).take(1)).limit(0),
        "insert", toVersion)
    else steps.reduce(_.unionByName(_))
  }

  /** [[getChanges]] addressed by WALL-CLOCK commit time — Delta's
    * timestamp-bounded `table_changes`: the changes committed AFTER the
    * version that was current at `fromTimestamp`, up to and including
    * the version current at `toTimestamp` (both endpoints resolved
    * exactly like [[getVersionAsOf]]). A `fromTimestamp` earlier than
    * every retained commit means "since creation"; endpoints resolving
    * to the same version yield an empty (correctly-shaped) feed.
    */
  def getChangesBetween(
      name: String,
      fromTimestamp: Any,
      toTimestamp: Any): DataFrame = {
    val meta = resolveMeta(name)
    val fromMs = FeatureStore.normalizeTimestamp(fromTimestamp).getTime
    val toMs = FeatureStore.normalizeTimestamp(toTimestamp).getTime
    if (fromMs > toMs)
      throw new FeatureValidationError(
        s"getChangesBetween needs fromTimestamp <= toTimestamp, " +
          s"got ($fromTimestamp, $toTimestamp)")
    def resolve(cutoff: Long): Option[Int] = meta.versionTimes
      .filter { case (ver, at) => meta.versions.contains(ver) && at <= cutoff }
      .keys.maxOption
    val to = resolve(toMs).getOrElse(throw new FeatureTableNotFoundError(
      s"Table '$name' has no version committed at or before $toTimestamp"))
    val from = resolve(fromMs).getOrElse(0)
    getChanges(name, from, to)
  }

  /** RESTORE TO VERSION — Delta's `RESTORE TABLE ... TO VERSION AS OF`:
    * mint a NEW version whose content is exactly a retained historical
    * version, by RE-REFERENCING that version's segment manifest — ZERO
    * data written, O(1) metadata, at any table size. The rolled-over
    * versions stay in history (auditable, re-restorable) until they
    * age out of retention; restoring across a schema evolution reverts
    * the column set, exactly like Delta. Restoring the CURRENT version
    * is a no-op (current info returned, nothing minted).
    *
    * The restored rowCount comes from the per-version row record
    * ([[TableMeta.versionRows]]); a catalog predating that record
    * falls back to one count scan.
    */
  def restoreVersion(name: String, version: Int): FeatureTableInfo =
    this.synchronized {
      if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
      val meta0 = catalog.getOrThrow(name)
      if (!meta0.versions.contains(version))
        throw new FeatureTableNotFoundError(
          s"Version $version of table '$name' not found. " +
            s"Available versions: ${meta0.versions.keys.mkString(", ")}")
      if (version == meta0.version) return meta0.info
      val (curOpt, v) = claimVersion(name)
      val cur = curOpt.getOrElse {
        storage.releaseVersion(name, v)
        throw new FeatureConcurrencyError(
          s"table '$name' was deleted by another writer during restore")
      }
      val meta = completeClaim(name, v) {
        // re-check against the CLAIMED state: an arbitrated claim may
        // have absorbed other writers' versions, including a prune of
        // the restore source
        val cols = cur.versions.getOrElse(version,
          throw new FeatureTableNotFoundError(
            s"Version $version of table '$name' left retention during " +
              s"restore. Available versions: ${cur.versions.keys.mkString(", ")}"))
        val srcSegs = cur.segmentsOf(version)
        val rows = cur.versionRows.getOrElse(version,
          storage.readSegments(name, srcSegs, Seq(EntityIdColumn), None,
            cur.columnTypes).count())
        val now0 = System.currentTimeMillis()
        storage.commitVersion(name, v, CommitMeta(
          0L, rows, cols, srcSegs, None, None, now0, cur.columnTypes,
          operation = "restore", constraints = cur.constraints.toMap))
        cur.copy(version = v, rowCount = rows, updatedAt = now0,
          versions = cur.versions + (v -> cols),
          segments = cur.segments + (v -> srcSegs),
          versionTimes = cur.versionTimes + (v -> now0),
          versionOps = cur.versionOps + (v -> "restore"),
          versionRows = cur.versionRows + (v -> rows))
      }
      val pruned = prune(meta)
      catalog.put(pruned)
      catalogIO.save(root, Seq(pruned))
      pruned.info
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
    val meta = resolveMeta(name)
    val asOf = FeatureStore.normalizeTimestamp(timestamp)
    PointInTime.pitSnapshot(
      currentData(meta, Some(asOf)),
      lit(asOf),
      entityIds = Some(entityIds),
      columns = columns,
      tieBreakCols = Seq(IngestKeyCol),
      tableName = name)
  }

  /** Filtered read of the current version with COLUMN-STATS DATA
    * SKIPPING: segments whose recorded per-column min/max
    * ([[TableMeta.segColStats]]) prove the predicate unsatisfiable are
    * dropped before the scan is even planned — the stats-filter read
    * path of the transactional table formats, over the manifest's
    * segment dimension. On a manifest-chained table whose appends are
    * clustered in the filter column (time-sliced ingest filtered by
    * time, entity-bucketed ingest filtered by entity), a selective scan
    * touches O(matching segments) of the manifest instead of all of it;
    * parquet row-group stats then skip WITHIN the surviving segments.
    * The filter is re-applied to the surviving scan, so the result is
    * always exact regardless of how much the stats could prune.
    */
  def scanWhere(name: String, condition: Column): DataFrame = {
    val meta = resolveMeta(name)
    val segs = meta.segmentsOf(meta.version)
    val resolved = resolveCondition(name, meta, condition)
    val (kept, _) = pruneSegments(meta, segs, resolved, needRows = false)
    if (kept.isEmpty)
      // every segment pruned: an empty result with the exact schema
      // (and the exact analysis errors) of the unpruned read — from
      // the type record when complete, else a zero-row segment read
      typedEmptyFrame(meta)
        .map(_.filter(condition))
        .getOrElse(storage
          .readSegments(name, segs.take(1), meta.columns, None,
            meta.columnTypes)
          .filter(condition).limit(0))
    else
      storage
        .readSegments(name, kept, meta.columns, None, meta.columnTypes)
        .filter(condition)
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
    val meta = resolveMeta(name)
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
      val meta = resolveMeta(name)
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
    val meta = resolveMeta(name)
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
    val meta = resolveMeta(name)
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
    val meta = resolveMeta(name)
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
    val meta = resolveMeta(name)
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
    val meta0 = resolveMeta(name)
    // version-level adopt-on-miss: another session may have committed
    // this version after ours pinned its snapshot — same retry as the
    // table-level miss, only on the would-fail path
    val meta =
      if (meta0.versions.contains(version) || !storage.arbitrates) meta0
      else {
        adoptDiskMeta(name); reconcileFromLog(name)
        catalog.getOrThrow(name)
      }
    val cols = meta.versions.getOrElse(
      version,
      throw new FeatureTableNotFoundError(
        s"Version $version of table '$name' not found. " +
          s"Available versions: ${meta.versions.keys.mkString(", ")}"))
    storage.readSegments(name, meta.segmentsOf(version), cols,
      columnTypes = meta.columnTypes)
  }

  /** TIMESTAMP AS OF time travel: the snapshot that was CURRENT at the
    * given wall-clock instant — the newest retained version whose
    * commit time is at or before `timestamp` (Delta's `TIMESTAMP AS
    * OF`, the companion of the version-addressed [[getVersion]]).
    * Distinct from [[get]]'s DATA-time cutoff: this axis is when
    * versions were registered, not what the rows' timestamps say.
    *
    * Raises [[FeatureTableNotFoundError]] when the instant predates
    * every retained version's commit (including versions pruned past
    * `maxVersions` — same availability as [[getVersion]]). Versions
    * from catalogs that predate commit-time tracking carry no time and
    * cannot be addressed on this axis; the error says so.
    */
  def getVersionAsOf(name: String, timestamp: Any): DataFrame =
    getVersion(name, resolveVersionAsOf(name, timestamp))

  /** The newest retained version committed at or before `timestamp` —
    * the TIMESTAMP-AS-OF resolution by itself (used by time-travel
    * reads and the streaming source's `startingTimestamp`).
    */
  def resolveVersionAsOf(name: String, timestamp: Any): Int = {
    val meta = resolveMeta(name)
    val cutoff = FeatureStore.normalizeTimestamp(timestamp).getTime
    val timed = meta.versionTimes.filter { case (v, _) => meta.versions.contains(v) }
    val hit = timed.filter { case (_, t) => t <= cutoff }.keys.maxOption
    hit.getOrElse {
      val range =
        if (timed.isEmpty)
          "no retained version has a recorded commit time " +
            "(catalog predates commit-time tracking)"
        else
          s"earliest retained commit is at epoch-millis ${timed.values.min}"
      throw new FeatureTableNotFoundError(
        s"Table '$name' has no version committed at or before " +
          s"$timestamp: $range")
    }
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
    val meta = resolveMeta(name)
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
    resolveMeta(name)
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
    val meta = resolveMeta(name)
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
      val metasByName: Map[String, Seq[TableMeta]] = names.map { n =>
        n -> (catalog.get(n).toSeq ++ diskMetas.filter(_.name == n))
      }.toMap
      val live: Map[String, Set[Int]] = metasByName.map { case (n, metas) =>
        n -> metas
          .flatMap(m => m.versions.keys.toSeq.flatMap(m.segmentsOf))
          .toSet
      }
      val ledger = RetireLedger.load(root)
      val ledgered = ledger.map(e => (e.name, e.version)).toSet
      val stranded = scala.collection.mutable.ArrayBuffer.empty[RetiredPath]
      val tableDirs = storage.listTableDirs()
      tableDirs.foreach { t =>
        live.get(t) match {
          case Some(liveSegs) =>
            // over an arbitrating storage, a version COMMITTED in the
            // transaction log above the prune high-water is durable even
            // if no catalog save recorded it yet (its writer crashed
            // after the commit point) — protect it and its manifest,
            // exactly as an unread Delta commit survives VACUUM
            val committedLive: Set[Int] =
              if (!storage.arbitrates) Set.empty
              else {
                val pt = metasByName(t).map(_.prunedThrough)
                  .maxOption.getOrElse(0)
                storage.committedMeta(t).collect {
                  case (v, cm) if v > pt && !liveSegs.contains(v) =>
                    cm.segments.toSet + v
                }.flatten.toSet
              }
            storage.listVersionDirs(t)
              .filterNot(liveSegs ++ committedLive)
              .filterNot(v => ledgered((t, Some(v))))
              .foreach(v => stranded += RetiredPath(t, Some(v), now))
          case None =>
            // creation-crash durability: cols-bearing commits newer
            // than any whole-table retirement are durable even though
            // no catalog knows the table yet (the marker is the commit
            // point; reconciliation will surface it) — never strand them
            val durable = storage.arbitrates && {
              val retiredAt = ledger
                .filter(e => e.name == t && e.version.isEmpty)
                .map(_.retiredAt).maxOption
              storage.committedMeta(t).exists { case (_, cm) =>
                cm.columns.nonEmpty && cm.committedAt > 0 &&
                  retiredAt.forall(cm.committedAt > _)
              }
            }
            if (!durable && !ledgered((t, None)))
              stranded += RetiredPath(t, None, now)
        }
        // crashed-writer arbitration leftovers (reservations that never
        // committed, orphaned marker tmps) age out under the same grace
        storage.sweepUncommitted(t, graceMillis)
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
    val meta = resolveMeta(name)
    meta.versions.keys.toSeq.sorted.map { v =>
      VersionInfo(v, meta.versions(v), meta.segmentsOf(v),
        isCurrent = v == meta.version,
        committedAt = meta.versionTimes.get(v),
        operation = meta.versionOps.get(v),
        rows = meta.versionRows.get(v))
    }
  }

  /** Add a CHECK constraint (Delta's `ALTER TABLE ADD CONSTRAINT ...
    * CHECK` shape): after this, every data-adding write — register,
    * append, upsert, their streaming batch forms — must leave no row
    * where `conditionSql` evaluates FALSE (NULL passes, standard SQL),
    * or it aborts with [[FeatureValidationError]] before committing.
    * Enforcement rides the write job's own metrics: zero extra passes
    * per write. Adding validates the EXISTING current data in one scan
    * and fails if any row violates, so a present constraint always
    * means "all data satisfies it". Constraint changes are catalog
    * metadata (no version minted); they travel in subsequent commit
    * markers so marker-only catalog reconciliation keeps enforcing.
    */
  def addConstraint(
      name: String,
      constraintName: String,
      conditionSql: String): FeatureTableInfo = this.synchronized {
    if (storage.arbitrates) { adoptDiskMeta(name); reconcileFromLog(name) }
    val meta = catalog.getOrThrow(name)
    if (constraintName.trim.isEmpty)
      throw new FeatureValidationError("Constraint name must be non-empty")
    if (meta.constraints.contains(constraintName))
      throw new FeatureValidationError(
        s"Table '$name' already has a constraint '$constraintName' " +
          s"(`${meta.constraints(constraintName)}`); drop it first")
    val current = currentData(meta).select(meta.columns.map(col): _*)
    // filter() analysis enforces that the condition resolves AND is
    // boolean; unknown columns/types fail here with the standard error
    val violations =
      try current.filter(not(coalesce(expr(conditionSql), lit(true)))).count()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new FeatureValidationError(
            s"CHECK constraint '$constraintName' (`$conditionSql`) is not a " +
              s"valid boolean condition over ${meta.columns.mkString("[", ", ", "]")}: " +
              e.getMessage)
      }
    if (violations > 0)
      throw new FeatureValidationError(
        s"Cannot add CHECK constraint '$constraintName' (`$conditionSql`) to " +
          s"'$name': $violations existing rows violate it")
    val updated =
      meta.copy(constraints = meta.constraints + (constraintName -> conditionSql))
    catalog.put(updated)
    catalogIO.save(root, Seq(updated))
    updated.info
  }

  /** Drop a CHECK constraint; false when it doesn't exist. */
  def dropConstraint(name: String, constraintName: String): Boolean =
    this.synchronized {
      val meta = catalog.getOrThrow(name)
      if (!meta.constraints.contains(constraintName)) false
      else {
        val dropped = meta.copy(constraints = meta.constraints - constraintName)
        catalog.put(dropped)
        catalogIO.save(root, Seq(dropped))
        true
      }
    }

  /** The table's CHECK constraints, name → SQL condition. */
  def getConstraints(name: String): Map[String, String] =
    catalog.getOrThrow(name).constraints.toMap

  /** The current schema as a StructType, from the catalog's type
    * record — no data files touched (the schema of a table whose data
    * lives on slow/remote storage costs one catalog lookup). Falls
    * back to the data read only for legacy catalogs without a full
    * type record.
    */
  def getTableSchema(name: String): org.apache.spark.sql.types.StructType = {
    val meta = resolveMeta(name)
    typedEmptyFrame(meta)
      .map(_.schema)
      .getOrElse(currentData(meta).select(meta.columns.map(col): _*).schema)
  }

  def getTableInfo(name: String): FeatureTableInfo =
    resolveMeta(name).info

  /** Per-segment (row count, column stats) of the CURRENT version,
    * when every current segment recorded its row count — the metadata
    * the V2 aggregate pushdown answers COUNT / MIN / MAX from in
    * O(#segments) driver work, zero data reads
    * ([[graft.sources.GraftScanBuilder]]). None when any segment
    * predates row-count stats (the caller falls back to a real scan).
    * Stats may legitimately lack a column entry or a bound (NaN,
    * over-long string, past the column cap) — the CALLER must refuse
    * per-aggregate on those, this surface only guarantees the row
    * counts.
    */
  def currentSegmentStats(
      name: String): Option[Seq[(Long, Map[String, ColStat])]] =
    this.synchronized {
      val meta = resolveMeta(name)
      val segs = meta.segments.getOrElse(meta.version, Seq.empty)
      val entries = segs.map(sg =>
        meta.segRows.get(sg).map(r =>
          (r, meta.segColStats.getOrElse(sg, Map.empty[String, ColStat]))))
      if (entries.forall(_.isDefined)) Some(entries.flatten) else None
    }

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
    *
    * Multi-writer caveat (arbitrating storage): deletion is NOT a
    * logged commit, so a concurrent register racing the delete from
    * another session can land one more version and resurrect the table
    * — the one unarbitrated cross-writer operation (see the stance doc
    * on [[CatalogPersistence]]). Coordinate deletes out of band, or
    * re-check `tableNames` after quiescing writers.
    */
  def delete(name: String): Boolean = this.synchronized {
    // over an arbitrating storage another writer may have created the
    // table after this session opened — adopt before deciding existence
    if (storage.arbitrates) adoptDiskMeta(name)
    catalog.remove(name) match {
      case Some(_) =>
        RetireLedger.record(
          root, Seq(RetiredPath(name, None, System.currentTimeMillis())))
        // tombstone: merge-on-save would otherwise resurrect the table
        // from the shared on-disk catalog
        catalogIO.save(root, Seq.empty, removed = Seq(name))
        true
      case None => false
    }
  }

  /** Rename a table — catalog move plus ONE physical directory rename
    * ([[VersionStorage.renameTable]]): the full version lineage,
    * change feed and any colocated txn log move as a metadata
    * operation, zero bytes copied at any table size. All history
    * (versions, time travel, CDF, constraints) survives under the new
    * name. The old name's catalog entry is tombstoned so other
    * sessions' [[refresh]] adopts the rename; a table registered later
    * at the old name starts a fresh lineage, exactly as after
    * [[delete]]. Rename is a whole-table exclusive operation: run it
    * with no concurrent writers on this table (concurrent writers on
    * OTHER tables of the root are unaffected).
    */
  def renameTable(from: String, to: String): Unit = this.synchronized {
    if (to.isEmpty || to.startsWith("_") || to.contains("/"))
      throw new FeatureValidationError(
        s"invalid table name '$to' (must be non-empty, not start with " +
          "'_', and contain no '/')")
    if (storage.arbitrates) { adoptDiskMeta(from); adoptDiskMeta(to) }
    val meta = catalog.getOrThrow(from)
    if (catalog.get(to).isDefined)
      throw new FeatureValidationError(
        s"cannot rename '$from' to '$to': table '$to' already exists")
    storage.renameTable(from, to)
    catalog.remove(from)
    val renamed = meta.copy(name = to, updatedAt = System.currentTimeMillis())
    catalog.put(renamed)
    // same two-phase bookkeeping as delete: ledger evidence + tombstone
    // let other sessions distinguish the adopted rename from a
    // mid-commit save of the old name
    RetireLedger.record(
      root, Seq(RetiredPath(from, None, System.currentTimeMillis())))
    catalogIO.save(root, Seq(renamed), removed = Seq(from))
  }

  // ---------------------------------------------------------------- private

  /** Current-version DataFrame including the internal tie-break column.
    * A known as-of cutoff enables TWO pruning levels before any task
    * runs: whole SEGMENTS whose recorded minimum timestamp is after the
    * cutoff are dropped from the manifest here (catalog-side data
    * skipping over [[TableMeta.segStats]] — the version-dimension
    * analog of the reference author's partition-pruning wish,
    * reference README.md:167), and the surviving segments' scans
    * partition-prune on the derived period column ([[Storage.read]]).
    * Rows a skipped segment could contribute all have ts > cutoff,
    * which every caller filters out downstream — skipping is purely an
    * IO saving, never a semantic change. Segments without stats
    * (pre-stats catalogs, all-null ranges) are never skipped; when
    * every segment skips, one is kept so the (empty) result still
    * carries the schema.
    */
  private def currentData(
      meta: TableMeta,
      asOf: Option[Timestamp] = None): DataFrame = {
    val segs = meta.segmentsOf(meta.version)
    val kept = asOf.fold(segs) { t =>
      val k = segs.filter(s => meta.segStats.get(s).forall(_._1 <= t.getTime))
      if (k.isEmpty) segs.take(1) else k
    }
    storage.readSegments(meta.name, kept, meta.columns :+ IngestKeyCol, asOf,
      meta.columnTypes)
  }

  /** Null-safe key-addressed join on (entity_id, timestamp) — the
    * documented key-addressed contract ("every current row whose key
    * appears in df" includes rows with NULL key components). ONE shared
    * definition with the DML sibling carry: [[KeyJoins]].
    */
  private def joinKeysNullSafe(
      rows: DataFrame, keys: DataFrame, joinType: String): DataFrame =
    KeyJoins.onKeys(rows, keys, Seq(EntityIdColumn, TimestampColumn), joinType)

  /** [[joinKeysNullSafe]] shaped for the segment-classification pass:
    * left join with a `_graft_hit` marker column (1 on matched rows).
    */
  private def joinKeysHit(rows: DataFrame, keys: DataFrame): DataFrame =
    KeyJoins.onKeysHit(rows, keys, Seq(EntityIdColumn, TimestampColumn))

  /** Key-range segment-skip condition for a key frame with bounds
    * `(loE, hiE, loT, hiT)` (nulls skipped by min/max): each dimension
    * must ALSO admit IS NULL when the key frame contains a null on it —
    * under null-safe key addressing a segment whose non-null values sit
    * outside the bounds can still hold addressed null-key rows, and the
    * column stats know per-segment null counts, so segments without
    * nulls stay skippable.
    */
  private def keyRangeCondition(
      loE: Any, hiE: Any, loT: Any, hiT: Any,
      nullE: Boolean, nullT: Boolean): Column = {
    def dim(c: Column, lo: Any, hi: Any, withNull: Boolean): Column = {
      val base = c.between(lit(lo), lit(hi))
      if (withNull) base || c.isNull else base
    }
    dim(col(EntityIdColumn), loE, hiE, nullE) &&
      dim(col(TimestampColumn), loT, hiT, nullT)
  }

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
    val freed = before -- after
    val now = System.currentTimeMillis()
    RetireLedger.record(
      root,
      freed.toSeq.sorted.map(v => RetiredPath(meta.name, Some(v), now)))
    meta.copy(
      versions = meta.versions -- excess,
      segments = meta.segments -- excess,
      segStats = meta.segStats -- freed,
      segRows = meta.segRows -- freed,
      segColStats = meta.segColStats -- freed,
      versionTimes = meta.versionTimes -- excess,
      versionOps = meta.versionOps -- excess,
      versionRows = meta.versionRows -- excess,
      versionCdf = meta.versionCdf -- excess,
      // the prune high-water is what reconciliation uses to tell
      // "pruned" from "committed by a racing writer" — monotone
      prunedThrough = excess.foldLeft(meta.prunedThrough)(math.max))
  }
}

object FeatureStore {

  /** Change-feed metadata columns ([[FeatureStore.getChanges]]). */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Operations whose version has the SAME content as its predecessor
    * — the change feed resolves them to "no changes" without a diff.
    */
  private[store] val ContentPreservingOps: Set[String] =
    Set("compact", "optimize")

  /** Internal segment tag for copy-on-write discovery scans. */
  private[store] val SegTagCol = "_graft_seg"

  /** Merge two catalog views of ONE table produced by racing writers
    * (multi-writer arbitration over a transaction-log storage). Version
    * numbers are allocated exactly-once by the log, so per-version
    * entries never conflict — the merge is a union with the higher
    * pointer winning the scalar fields, the prune high-water taken at
    * its max (pruning is monotone), entries at or below it dropped
    * (pruned on either side means pruned), and stream watermarks joined
    * per-stream at their max.
    */
  private[store] def mergeMetas(a: TableMeta, b: TableMeta): TableMeta = {
    val hi = if (a.version >= b.version) a else b
    val pruned = math.max(a.prunedThrough, b.prunedThrough)
    val wmKeys = a.batchWatermarks.keySet ++ b.batchWatermarks.keySet
    hi.copy(
      registeredAt = math.min(a.registeredAt, b.registeredAt),
      updatedAt = math.max(a.updatedAt, b.updatedAt),
      versions = (a.versions ++ b.versions ++ hi.versions)
        .filter { case (v, _) => v > pruned },
      segments = (a.segments ++ b.segments ++ hi.segments)
        .filter { case (v, _) => v > pruned },
      segStats = a.segStats ++ b.segStats,
      segRows = a.segRows ++ b.segRows,
      segColStats = a.segColStats ++ b.segColStats,
      // union, biased toward ENFORCEMENT: a constraint added by either
      // writer survives the merge (a concurrent drop may resurrect —
      // the safe direction; drop again to settle it)
      constraints = a.constraints ++ b.constraints ++ hi.constraints,
      clusterSpec = hi.clusterSpec
        .orElse(a.clusterSpec).orElse(b.clusterSpec),
      versionTimes = (a.versionTimes ++ b.versionTimes)
        .filter { case (v, _) => v > pruned },
      batchWatermarks = scala.collection.immutable.SortedMap(
        wmKeys.toSeq.map { k =>
          k -> math.max(
            a.batchWatermarks.getOrElse(k, Long.MinValue),
            b.batchWatermarks.getOrElse(k, Long.MinValue))
        }: _*),
      prunedThrough = pruned,
      columnTypes = a.columnTypes ++ b.columnTypes ++ hi.columnTypes,
      versionOps = (a.versionOps ++ b.versionOps ++ hi.versionOps)
        .filter { case (v, _) => v > pruned },
      versionRows = (a.versionRows ++ b.versionRows ++ hi.versionRows)
        .filter { case (v, _) => v > pruned },
      versionCdf = (a.versionCdf ++ b.versionCdf ++ hi.versionCdf)
        .filter { case (v, _) => v > pruned })
  }

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
