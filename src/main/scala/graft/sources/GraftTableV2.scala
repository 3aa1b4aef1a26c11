package graft.sources

import java.util

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.{FeatureStore, FeatureValidationError}

/** The DataSource V2 half of `format("graft")`: the STREAMING surfaces,
  * built entirely on the public connector API
  * (`org.apache.spark.sql.connector.*`) — no Spark-internal classes.
  *
  *   - SOURCE ([[GraftMicroBatchStream]]): the change data feed.
  *     Offsets are commit versions; the first batch is the current
  *     snapshot as inserts (or, with `startingVersion` /
  *     `startingTimestamp`, the changes since that point), every later
  *     batch is `getChanges` over newly committed versions — O(changes)
  *     per microbatch via the store's recorded change sets.
  *     `maxVersionsPerBatch` bounds catch-up: a follower N commits
  *     behind drains in ceil(N/max) microbatches instead of one giant
  *     batch (Delta's maxFilesPerTrigger shape), via
  *     [[SupportsAdmissionControl]].
  *   - SINK ([[GraftStreamingWrite]]): `mode` = append / upsert / cdc,
  *     exactly-once per (streamId, batchId) through the store's batch
  *     watermark, stream identity derived from `checkpointLocation`
  *     (or pinned with `streamId`).
  *
  * How rows cross the executor boundary: a V2 `PartitionReader` /
  * `DataWriter` runs on executors with no SparkSession, while the
  * store's read/write paths are driver-planned DataFrames. The
  * connector bridges with STAGED BLOBS: the driver renders a
  * microbatch to [[RowCodec]]-packed single-binary-column parquet
  * (a distributed Spark job — data never collects to the driver), and
  * executors stream those blobs through parquet-mr's public API
  * ([[BlobStagingIO]]). Staging is O(one microbatch of changes), never
  * O(table) past the first snapshot batch, and staged files are
  * deleted as soon as their offset commits — at 100 TB the batch read
  * path stays the zero-copy [[GraftRelation]] plan; only streaming
  * microbatches (already change-sized) pay the staging hop.
  */
final class GraftTable(feedSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {

  private val root = GraftDataSource.required(options, "root")
  private val table = GraftDataSource.required(options, "table")

  override def name(): String = s"graft.`$root`.`$table`"

  override def schema(): StructType = feedSchema

  /** No BATCH_READ / BATCH_WRITE on purpose, and the reason is now a
    * SCHEMA fact, not a routing preference: this table's one schema is
    * the CHANGE FEED's (table columns + `_change_type` +
    * `_commit_version`) because `readStream.format("graft")` is the
    * change-data feed — advertising BATCH_READ here would make
    * `spark.read.format("graft")` serve feed columns in a batch
    * snapshot. One `Table` advertises one schema, so the format keeps
    * its halves split: batch through the stable V1 relation
    * ([[GraftRelation]] — zero-copy plans, ErrorIfExists / Ignore
    * semantics preserved), streaming through this V2 table. The FULLY
    * V2 batch surface is the SQL catalog ([[GraftCatalog]] →
    * [[GraftCatalogTable]]: BATCH_READ with pushdown/pruning,
    * SupportsDeleteV2, V1 write bridge), whose scan wraps the SAME
    * store plan the V1 relation wraps — one read implementation,
    * equivalence property-tested (GraftCatalogSpec "row-for-row").
    * ACCEPT_ANY_SCHEMA because the sink accepts whatever the query
    * produces (the store validates and, with `mergeSchema`, evolves).
    */
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftScan(feedSchema, root, table, options)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = {
          val mode = Option(options.get("mode")).getOrElse("append")
          if (!Set("append", "upsert", "cdc").contains(mode))
            throw new FeatureValidationError(
              s"format(\"graft\") sink mode must be append|upsert|cdc, got '$mode'")
          RowCodec.validate(info.schema())
          new GraftStreamingWrite(
            root, table, mode,
            GraftDataSource.sinkStreamId(options), // checkpoint-stable identity
            Option(options.get("mergeSchema")).exists(_.toBoolean),
            info.schema())
        }
      }
    }
}

object GraftTable {
  /** The change-feed schema (table columns + `_change_type` +
    * `_commit_version`), or None when the table does not exist yet —
    * the provider must still answer `inferSchema` for a sink whose
    * destination table the FIRST COMMIT will create. Resolved from the
    * CATALOG only: schema resolution must not touch (or require the
    * existence of) any data file — `spark.read.format("graft")` builds
    * this table before falling back to the V1 batch relation, and a
    * stats-pruned read must stay answerable with pruned segments gone.
    */
  def feedSchemaIfExists(
      spark: SparkSession, root: String, table: String): Option[StructType] = {
    val s = new FeatureStore(spark, root)
    if (!s.tableNames.contains(table)) None
    else Some(
      s.getTableSchema(table)
        .add(FeatureStore.ChangeTypeCol, org.apache.spark.sql.types.StringType)
        .add(FeatureStore.CommitVersionCol, org.apache.spark.sql.types.IntegerType))
  }
}

/** The streaming scan. Batch (`toBatch`) is intentionally absent —
  * batch reads resolve through [[GraftRelation]]'s V1 path.
  */
final class GraftScan(
    feedSchema: StructType,
    root: String,
    table: String,
    options: CaseInsensitiveStringMap) extends Scan {

  override def readSchema(): StructType = feedSchema

  override def description(): String = s"graft change feed `$root`.`$table`"

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val spark = SparkSession.active
    val store = new FeatureStore(spark, root)
    store.getTableInfo(table) // canonical not-found error, at stream start
    if (feedSchema.isEmpty)
      throw new FeatureValidationError(
        s"table '$table' was created after this stream was defined; " +
          "re-create the readStream so its schema resolves")
    val starting = Option(options.get("startingVersion"))
      .map(GraftDataSource.parseInt("startingVersion", _))
      .orElse(Option(options.get("startingTimestamp"))
        .map(t => store.resolveVersionAsOf(table, t)))
    val maxPerBatch = Option(options.get("maxVersionsPerBatch"))
      .map(GraftDataSource.parseInt("maxVersionsPerBatch", _))
    maxPerBatch.foreach(m => if (m < 1)
      throw new FeatureValidationError(
        s"maxVersionsPerBatch must be >= 1, got $m"))
    new GraftMicroBatchStream(
      root, table, feedSchema, starting, maxPerBatch, checkpointLocation)
  }
}

/** A commit-version offset. */
case class GraftOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

object GraftOffset {
  def version(o: Offset): Int = o match {
    case GraftOffset(v) => v
    case other => other.json().trim.toInt
  }
}

/** Shared mechanics of every graft micro-batch SOURCE: commit-version
  * offsets, `maxVersionsPerBatch` admission control, and the staged-
  * blob rendering/cleanup protocol ([[GraftTable]] docs the design).
  * Concrete streams differ only in WHAT rows batch (s, e] contains —
  * the change feed ([[GraftMicroBatchStream]]) or the appended table
  * rows ([[GraftTableRowsStream]]).
  *
  * A fresh store per poll re-reads the catalog, so commits by OTHER
  * processes on the same root are seen without any notification
  * channel. Offset -1 is the "snapshot not yet delivered" sentinel
  * (no `startingVersion`): the first batch (-1, v] is the version-v
  * content.
  */
abstract class GraftStagedStream(
    root: String,
    table: String,
    outSchema: StructType,
    startingVersion: Option[Int],
    maxVersionsPerBatch: Option[Int],
    checkpointLocation: String)
    extends MicroBatchStream with SupportsAdmissionControl {

  protected def spark = SparkSession.active
  protected def store = new FeatureStore(spark, root)
  private def stagingBase = new Path(checkpointLocation, "graft_staged")

  /** The rows of batch (s, e], already in `outSchema`'s columns. */
  protected def batchFrame(
      st: FeatureStore, s: Int, e: Int): org.apache.spark.sql.DataFrame

  override def initialOffset(): Offset =
    GraftOffset(startingVersion.getOrElse(-1))

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toInt)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** The admission-control point: never admit more than
    * `maxVersionsPerBatch` commit versions past the consumed offset.
    * The initial snapshot (start = -1) is one version's content and is
    * never split.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val current = store.getTableInfo(table).version
    val s = GraftOffset.version(start)
    val admitted = maxVersionsPerBatch match {
      case Some(m) if s >= 0 => math.min(current, s + m)
      case _ => current
    }
    GraftOffset(math.max(admitted, s))
  }

  override def reportLatestOffset(): Offset =
    GraftOffset(store.getTableInfo(table).version)

  /** Renders the batch (s, e] to staged blobs with a distributed job,
    * then hands each staged file to one executor-side reader.
    * Idempotent on re-planning after a restart: a staged dir whose
    * completion marker exists is reused as-is. The marker is the
    * connector's own `_GRAFT_STAGED`, written AFTER the parquet job
    * returns — Spark's `_SUCCESS` only appears when
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs` is on (often
    * disabled on object stores), and relying on it would silently
    * re-render the whole batch on every restart re-plan.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = GraftOffset.version(start)
    val e = GraftOffset.version(end)
    if (e <= s) return Array.empty
    val dir = new Path(stagingBase, s"${s}_$e")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(dir, "_GRAFT_STAGED")
    if (!fs.exists(marker)) {
      batchFrame(store, s, e)
        .select(outSchema.fieldNames.toSeq.map(col): _*)
        .select(RowCodecExpressions.packed(outSchema.fieldNames.toSeq)
          .as(BlobStagingIO.BlobColumn))
        .write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
    }
    fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .map(f => GraftBlobPartition(f.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBlobReaderFactory(
      outSchema,
      new BlobStagingIO.SerializableHadoopConf(spark.sessionState.newHadoopConf()))

  /** Offsets at or before `end` are consumed — their staged files are
    * dead weight; reclaim them.
    */
  override def commit(end: Offset): Unit = {
    val endV = GraftOffset.version(end)
    val fs = stagingBase.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(stagingBase)) {
      fs.listStatus(stagingBase).foreach { st =>
        val keep = st.getPath.getName.split('_') match {
          case Array(_, e) => Try(e.toInt).toOption.forall(_ > endV)
          case _ => true
        }
        if (!keep) { fs.delete(st.getPath, true); () }
      }
    }
  }

  override def stop(): Unit = ()
}

/** The change-data feed stream of `format("graft")`: the first batch
  * is the current snapshot as inserts (offset -1 sentinel), every
  * later batch is `getChanges` over newly committed versions —
  * O(changes) per microbatch via the store's recorded change sets.
  */
final class GraftMicroBatchStream(
    root: String,
    table: String,
    feedSchema: StructType,
    startingVersion: Option[Int],
    maxVersionsPerBatch: Option[Int],
    checkpointLocation: String)
    extends GraftStagedStream(
      root, table, feedSchema, startingVersion, maxVersionsPerBatch,
      checkpointLocation) {

  override protected def batchFrame(
      st: FeatureStore, s: Int, e: Int): org.apache.spark.sql.DataFrame =
    if (s < 0)
      st.getVersion(table, e)
        .withColumn(FeatureStore.ChangeTypeCol, lit("insert"))
        .withColumn(FeatureStore.CommitVersionCol, lit(e))
    else st.getChanges(table, s, e)
}

/** The TABLE-ROWS stream behind `spark.readStream.table(...)` on a
  * graft catalog table: rows in the table's OWN schema — the initial
  * snapshot, then each append commit's delta (the O(delta) fast path;
  * the skipped-commit case never computes a change set). Delta-shaped
  * change-commit policy: a commit that rewrites existing rows
  * (delete / upsert / overwrite-register / restore) has no
  * append-only representation, so the stream FAILS on it unless
  * `skipChangeCommits=true` (then the commit is skipped whole);
  * content-preserving compactions are always skipped silently. To
  * OBSERVE updates/deletes, stream the change feed
  * (`readStream.format("graft")`) instead.
  *
  * Pushed filters and pruned columns reach the staging job: each
  * microbatch stages only the filtered projection.
  */
final class GraftTableRowsStream(
    root: String,
    table: String,
    outSchema: StructType,
    pushed: Seq[org.apache.spark.sql.sources.Filter],
    startingVersion: Option[Int],
    maxVersionsPerBatch: Option[Int],
    skipChangeCommits: Boolean,
    checkpointLocation: String)
    extends GraftStagedStream(
      root, table, outSchema, startingVersion, maxVersionsPerBatch,
      checkpointLocation) {

  override protected def batchFrame(
      st: FeatureStore, s: Int, e: Int): org.apache.spark.sql.DataFrame = {
    val cond = pushed.flatMap(GraftRelation.translate).reduceOption(_ && _)
    val base =
      if (s < 0) st.getVersion(table, e)
      else {
        val hist = st.getTableHistory(table)
          .filter(v => v.version > s && v.version <= e)
        // the initial register is append-like (table creation); a
        // LATER register is a full overwrite — a change commit
        def appendLike(v: graft.store.VersionInfo): Boolean =
          v.operation.contains("append") ||
            (v.operation.contains("register") && v.version == 1)
        def preserving(v: graft.store.VersionInfo): Boolean =
          v.operation.contains("compact")
        val changeCommits = hist.filterNot(v => appendLike(v) || preserving(v))
        if (changeCommits.nonEmpty && !skipChangeCommits)
          throw new FeatureValidationError(
            s"streaming read of table '$table' reached non-append " +
              s"commit(s) ${changeCommits.map(v =>
                s"v${v.version} (${v.operation.getOrElse("unknown op")})")
                .mkString(", ")}: a table stream emits appended rows " +
              "only. Set option skipChangeCommits=true to skip such " +
              "commits, or stream the change feed " +
              "(readStream.format(\"graft\")) to observe updates/deletes")
        val admitted = hist.filter(appendLike).map(_.version)
        admitted
          .map(v => st.getChanges(table, v - 1, v)
            .filter(col(FeatureStore.ChangeTypeCol) === "insert")
            .drop(FeatureStore.ChangeTypeCol, FeatureStore.CommitVersionCol))
          .reduceOption(_ unionByName _)
          .getOrElse(st.getVersion(table, e).limit(0))
      }
    cond.fold(base)(base.filter)
      .select(outSchema.fieldNames.toSeq.map(col): _*)
  }
}

/** One staged blob file = one input partition. */
case class GraftBlobPartition(path: String) extends InputPartition

final class GraftBlobReaderFactory(
    schema: StructType,
    conf: BlobStagingIO.SerializableHadoopConf) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val blobs = new BlobStagingIO.BlobFileIterator(
      p.asInstanceOf[GraftBlobPartition].path, conf.value)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (blobs.hasNext) { current = RowCodec.unpack(blobs.next(), schema); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = blobs.close()
    }
  }
}

/** Streaming sink write: executors stage [[RowCodec]] blobs, the
  * driver-side `commit(epoch)` reads them back as one batch frame and
  * applies it through the store (append / upsert / cdc). Exactly-once:
  * the store's (streamId, batchId) watermark makes a replayed epoch's
  * apply a no-op, and re-deleting absent keys is naturally idempotent,
  * so a crash between commit and checkpoint cannot double-apply.
  */
final class GraftStreamingWrite(
    root: String,
    table: String,
    mode: String,
    streamId: String,
    mergeSchema: Boolean,
    schema: StructType) extends StreamingWrite {

  private def epochDir(epochId: Long): Path =
    new Path(new Path(root), s"_stream_staging/$table/$streamId/epoch=$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftBlobWriterFactory(
      epochBase = new Path(new Path(root), s"_stream_staging/$table/$streamId").toString,
      schema = schema,
      conf = new BlobStagingIO.SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val files = messages.collect { case GraftBlobsStaged(p, n) if n > 0 => p }
    // an EMPTY epoch (a content-preserving upstream commit, a filter
    // that drops every row) applies nothing: the store's register
    // paths reject empty frames, so feeding one would wedge the query
    // in a crash-replay loop. Skipping is idempotent — a replayed
    // empty epoch skips again.
    if (files.isEmpty) { deleteEpoch(epochId); return }
    val batch =
      spark.read.schema(BlobStagingIO.sparkBlobSchema).parquet(files.toSeq: _*)
          .select(RowCodecExpressions
            .unpacked(col(BlobStagingIO.BlobColumn), schema).as("_r"))
          .select("_r.*")
    // pin: the store consumes the batch with several jobs (validation,
    // classification, write, change-set record)
    val pinned = batch.persist()
    try {
      val s = new FeatureStore(spark, root)
      mode match {
        case "append" =>
          s.registerAppendBatch(table, pinned, epochId, streamId = streamId,
            mergeSchema = mergeSchema)
        case "upsert" =>
          s.registerUpsertBatch(table, pinned, epochId, streamId = streamId,
            mergeSchema = mergeSchema)
        case "cdc" =>
          applyCdc(s, epochId, pinned)
      }
      ()
    } finally { pinned.unpersist(); () }
    deleteEpoch(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    deleteEpoch(epochId)

  private def deleteEpoch(epochId: Long): Unit = {
    val dir = epochDir(epochId)
    val fs = dir.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    if (fs.exists(dir)) { fs.delete(dir, true); () }
  }

  /** Apply one micro-batch of CHANGE ROWS (`_change_type` tagged, as
    * the graft streaming source emits). One batch can span SEVERAL
    * source commits, so per key only the LATEST change decides —
    * ordered by `_commit_version` with inserts outranking deletes
    * within a version (a same-version delete+insert pair is an update
    * whose final state is the insert). Keys whose final change is a
    * delete are removed via the distributed key-set delete (no driver
    * materialization — a million-key purge stays a join); final
    * inserts MERGE.
    */
  private def applyCdc(
      s: FeatureStore, batchId: Long,
      batch: org.apache.spark.sql.DataFrame): Unit = {
    if (!batch.columns.contains(FeatureStore.ChangeTypeCol))
      throw new FeatureValidationError(
        s"cdc sink needs a '${FeatureStore.ChangeTypeCol}' column " +
          "(write the graft streaming source's feed, or tag rows yourself)")
    val e = graft.store.Validation.EntityIdColumn
    val t = graft.store.Validation.TimestampColumn
    val verCol =
      if (batch.columns.contains(FeatureStore.CommitVersionCol))
        col(FeatureStore.CommitVersionCol)
      else lit(0)
    val ranked = batch.withColumn("_graft_rn",
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(e), col(t))
          .orderBy(verCol.desc,
            (col(FeatureStore.ChangeTypeCol) === "insert").desc)))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
    val metaCols = Seq(FeatureStore.ChangeTypeCol, FeatureStore.CommitVersionCol)
      .filter(batch.columns.contains)
    val ins = ranked.filter(col(FeatureStore.ChangeTypeCol) === "insert")
      .drop(metaCols: _*)
    val delKeys = ranked.filter(col(FeatureStore.ChangeTypeCol) === "delete")
      .select(col(e), col(t))
    val hasTable = s.tableNames.contains(table)
    val insEmpty = ins.isEmpty
    val delEmpty = delKeys.isEmpty
    if (hasTable && !insEmpty && !delEmpty) {
      // the mixed batch is ONE atomic rewrite commit: replacements and
      // key drops land together (no crash window with keys deleted but
      // replacements unregistered), and — critically — an upstream
      // full-snapshot overwrite whose change set is delete-all-old +
      // insert-all-new applies cleanly, where delete-then-upsert would
      // trip the store's "would remove every row" guard mid-way
      s.registerRewriteBatch(table, ins, delKeys, batchId,
        streamId = streamId, mergeSchema = mergeSchema)
      ()
    } else {
      if (hasTable && !delEmpty) {
        s.deleteRowsByKeys(table, delKeys)
        ()
      }
      if (!insEmpty) {
        s.registerUpsertBatch(table, ins, batchId, streamId = streamId,
          mergeSchema = mergeSchema)
        ()
      }
    }
  }
}

final class GraftBlobWriterFactory(
    epochBase: String,
    schema: StructType,
    conf: BlobStagingIO.SerializableHadoopConf) extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftBlobDataWriter(
      s"$epochBase/epoch=$epochId/part-$partitionId-$taskId.parquet", schema, conf)
}

/** Packs each row and appends it to one staged blob file; the file is
  * created lazily so empty partitions stage nothing. The task-attempt
  * id is in the file name, so a speculative or retried attempt writes
  * its own file and only the COMMITTED attempt's file reaches the
  * driver's commit message.
  */
final class GraftBlobDataWriter(
    path: String,
    schema: StructType,
    conf: BlobStagingIO.SerializableHadoopConf) extends DataWriter[InternalRow] {

  private var writer: BlobStagingIO.BlobFileWriter = null

  override def write(row: InternalRow): Unit = {
    if (writer == null) writer = new BlobStagingIO.BlobFileWriter(path, conf.value)
    writer.write(RowCodec.pack(row, schema))
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) GraftBlobsStaged(path, 0L)
    else { writer.close(); GraftBlobsStaged(path, writer.rows) }

  override def abort(): Unit =
    if (writer != null) {
      writer.close()
      val p = new Path(path)
      val fs = p.getFileSystem(conf.value)
      if (fs.exists(p)) { fs.delete(p, false); () }
    }

  override def close(): Unit = ()
}

/** One committed staged file: its path and how many rows it holds. */
case class GraftBlobsStaged(path: String, rows: Long) extends WriterCommitMessage
