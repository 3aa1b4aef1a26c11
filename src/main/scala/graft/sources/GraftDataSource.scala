package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftStreamingBridge
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.store.{FeatureStore, FeatureValidationError}

/** The `graft` Spark data-source: the feature store as a first-class
  * `format("graft")` — all three surfaces over the public source APIs:
  *
  *   - BATCH READ: `spark.read.format("graft").option("root", r)
  *     .option("table", t)` — current version, or time travel via
  *     `versionAsOf` / `timestampAsOf`. Column pruning reaches the
  *     store, and pushed filters route through [[FeatureStore.scanWhere]],
  *     so the engine's column-stats segment skipping fires before the
  *     scan is planned (Spark re-applies every filter above — the
  *     relation never weakens correctness).
  *   - STREAMING READ: `spark.readStream.format("graft")...` — the
  *     CHANGE DATA FEED as a source. Offsets are commit versions; the
  *     first batch is the current snapshot as inserts (or, with
  *     `startingVersion`, the changes since that version), every later
  *     batch is `getChanges` over the newly committed versions —
  *     O(changes) per microbatch via the recorded change sets. A
  *     follower lagging past retention fails loudly, same as
  *     [[graft.streaming.ChangeFeedFollower]].
  *   - STREAMING WRITE: `df.writeStream.format("graft")...` with
  *     `mode` = `append` (versioned appends), `upsert` (MERGE by
  *     (entity, ts) key), or `cdc` (apply a change feed: delete rows
  *     whose key doesn't re-insert are deleted, the rest upsert).
  *     Exactly-once via the store's (streamId, batchId) watermark; the
  *     stream identity defaults to a hash of `checkpointLocation` —
  *     checkpoint-stable, like `StreamingIngest` — and can be pinned
  *     with `streamId`.
  *
  * Together the read and write halves replicate a table — including
  * row-level deletes — through the change feed (tested end to end).
  */
final class GraftDataSource
    extends RelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider
    with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def required(
      parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new FeatureValidationError(
        s"format(\"graft\") requires option '$key'"))

  // ------------------------------------------------------- batch read
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new GraftRelation(
      sqlContext,
      required(parameters, "root"),
      required(parameters, "table"),
      parameters.get("versionAsOf").map(_.toInt),
      parameters.get("timestampAsOf"))

  // ------------------------------------------------------ batch write
  /** `df.write.format("graft").mode(m)`: Overwrite = register a new
    * version (full snapshot — prior versions stay time-travelable);
    * Append = O(delta) registerAppend (upsert instead with
    * `option("mode", "upsert")`); ErrorIfExists/Ignore follow their
    * SaveMode contracts against table existence.
    */
  override def createRelation(
      sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val root = required(parameters, "root")
    val table = required(parameters, "table")
    val s = new FeatureStore(sqlContext.sparkSession, root)
    val exists = s.tableNames.contains(table)
    import org.apache.spark.sql.SaveMode._
    mode match {
      case Overwrite => s.register(table, data)
      case Append =>
        if (parameters.get("mode").contains("upsert"))
          s.registerUpsert(table, data)
        else s.registerAppend(table, data)
      case ErrorIfExists =>
        if (exists)
          throw new FeatureValidationError(
            s"table '$table' already exists at '$root' (SaveMode.ErrorIfExists)")
        else s.register(table, data)
      case Ignore => if (!exists) { s.register(table, data); () }
    }
    createRelation(sqlContext, parameters)
  }

  // --------------------------------------------------- streaming read
  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftChangeFeedSource.feedSchema(
      sqlContext, required(parameters, "root"), required(parameters, "table")))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val root = required(parameters, "root")
    val table = required(parameters, "table")
    // startingTimestamp resolves to the TIMESTAMP-AS-OF version once,
    // at source creation (Delta's CDF option shape)
    val starting = parameters.get("startingVersion").map(_.toInt)
      .orElse(parameters.get("startingTimestamp").map(t =>
        new FeatureStore(sqlContext.sparkSession, root)
          .resolveVersionAsOf(table, t)))
    new GraftChangeFeedSource(sqlContext, root, table, starting)
  }

  // -------------------------------------------------- streaming write
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink =
    new GraftSink(
      sqlContext,
      required(parameters, "root"),
      required(parameters, "table"),
      parameters.getOrElse("mode", "append"),
      parameters.getOrElse("streamId", {
        // the exactly-once watermark needs a CHECKPOINT-STABLE stream
        // identity; a root/table fallback would silently collide two
        // distinct queries into one watermark line (dropped batches),
        // so demand one of the two options that pin it
        val basis = parameters.getOrElse("checkpointLocation",
          throw new FeatureValidationError(
            "format(\"graft\") sink needs .option(\"checkpointLocation\", ...) " +
              "(its hash becomes the exactly-once stream identity) or an " +
              "explicit .option(\"streamId\", ...)"))
        "graft-sink-" + java.security.MessageDigest.getInstance("MD5")
          .digest(basis.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }),
      parameters.get("mergeSchema").exists(_.toBoolean))
}

/** Batch relation: current version or time travel, with best-effort
  * pushdown of Spark's source filters into the store's stats-skipping
  * read. `unhandledFilters` keeps the default (all filters re-applied
  * by Spark above the scan), so translation can only speed things up.
  */
final class GraftRelation(
    override val sqlContext: SQLContext,
    root: String,
    table: String,
    versionAsOf: Option[Int],
    timestampAsOf: Option[String]) extends BaseRelation with PrunedFilteredScan {

  private def store = new FeatureStore(sqlContext.sparkSession, root)

  private def snapshot(s: FeatureStore): DataFrame = (versionAsOf, timestampAsOf) match {
    case (Some(v), _) => s.getVersion(table, v)
    case (_, Some(t)) => s.getVersionAsOf(table, t)
    case _ => s.getVersion(table, s.getTableInfo(table).version)
  }

  // current-version reads resolve the schema from the catalog (no data
  // file touched or required); time travel must advertise the AS-OF
  // version's own columns — a later evolution's columns don't exist
  // there, and advertising them would make Spark request unresolvable
  // attributes
  override val schema: StructType =
    if (versionAsOf.isEmpty && timestampAsOf.isEmpty)
      store.getTableSchema(table)
    else snapshot(store).schema

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val s = store
    val cond = filters.flatMap(GraftRelation.translate).reduceOption(_ && _)
    val base = (versionAsOf, timestampAsOf, cond) match {
      // stats-skipping path: current-version read with the pushed
      // predicate deciding which segments are even planned
      case (None, None, Some(c)) => s.scanWhere(table, c)
      case (_, _, c) => c.fold(snapshot(s))(snapshot(s).filter)
    }
    base.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}

object GraftRelation {
  /** Source-filter → Column, best effort: None = not translated (Spark
    * still applies it above the scan).
    */
  private[sources] def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq.map(lit(_)): _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) =>
      for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(!_)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case StringContains(a, p) => Some(col(a).contains(p))
    case _ => None
  }
}

/** Change-feed streaming source: offsets are commit versions. */
final class GraftChangeFeedSource(
    sqlContext: SQLContext,
    root: String,
    table: String,
    startingVersion: Option[Int]) extends Source {

  private def store = new FeatureStore(sqlContext.sparkSession, root)

  override val schema: StructType =
    GraftChangeFeedSource.feedSchema(sqlContext, root, table)

  /** A fresh store per poll re-reads the catalog file, so commits by
    * OTHER processes on the same root are seen — the source needs no
    * notification channel beyond the catalog itself.
    */
  override def getOffset: Option[Offset] =
    Some(LongOffset(store.getTableInfo(table).version.toLong))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = store
    val endV = GraftChangeFeedSource.version(end)
    val batch = start.map(GraftChangeFeedSource.version).orElse(startingVersion) match {
      case Some(from) => s.getChanges(table, from, endV)
      case None =>
        // initial snapshot: the current content, stamped as inserts of
        // the offset version (Delta's startingVersion-absent semantics)
        s.getVersion(table, endV)
          .withColumn(FeatureStore.ChangeTypeCol, lit("insert"))
          .withColumn(FeatureStore.CommitVersionCol, lit(endV))
    }
    GraftStreamingBridge.asStreaming(
      batch.select(schema.fieldNames.toSeq.map(col): _*))
  }

  override def stop(): Unit = ()
}

object GraftChangeFeedSource {
  private[sources] def feedSchema(
      sqlContext: SQLContext, root: String, table: String): StructType = {
    val s = new FeatureStore(sqlContext.sparkSession, root)
    val v = s.getTableInfo(table).version
    s.getChanges(table, v, v).schema
  }

  private[sources] def version(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => other.json.trim.toInt
  }
}

/** Streaming sink: append / upsert / cdc-apply, exactly-once per
  * (streamId, batchId) through the store's batch watermark.
  */
final class GraftSink(
    sqlContext: SQLContext,
    root: String,
    table: String,
    mode: String,
    streamId: String,
    mergeSchema: Boolean) extends Sink {

  if (!Set("append", "upsert", "cdc").contains(mode))
    throw new FeatureValidationError(
      s"format(\"graft\") sink mode must be append|upsert|cdc, got '$mode'")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // re-root the micro-batch rows as a plain batch frame (its own
    // plan has streaming leaves no new action may touch), then pin it:
    // the store consumes it with several jobs (validation,
    // classification, write, change-set record)
    val batch = GraftStreamingBridge.asBatch(data).persist()
    try {
      val s = new FeatureStore(sqlContext.sparkSession, root)
      mode match {
        case "append" =>
          s.registerAppendBatch(table, batch, batchId, streamId = streamId,
            mergeSchema = mergeSchema)
        case "upsert" =>
          s.registerUpsertBatch(table, batch, batchId, streamId = streamId,
            mergeSchema = mergeSchema)
        case "cdc" =>
          applyCdc(s, batchId, batch)
      }
      ()
    } finally { batch.unpersist(); () }
  }

  /** Apply one micro-batch of CHANGE ROWS (`_change_type` tagged, as
    * the graft source emits). One batch can span SEVERAL source
    * commits, so per key only the LATEST change decides — ordered by
    * `_commit_version` with inserts outranking deletes within a
    * version (a same-version delete+insert pair is an update whose
    * final state is the insert). Keys whose final change is a delete
    * are removed via the distributed key-set delete (no driver
    * materialization — a million-key purge stays a join); final
    * inserts MERGE. Replay-safe: the upsert half rides the batch
    * watermark, and re-deleting absent keys is a natural no-op.
    */
  private def applyCdc(s: FeatureStore, batchId: Long, batch: DataFrame): Unit = {
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
    // latest change per key: version desc, inserts over deletes
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
    if (s.tableNames.contains(table)) {
      s.deleteRowsByKeys(table, delKeys)
      ()
    }
    if (!ins.isEmpty) {
      s.registerUpsertBatch(table, ins, batchId, streamId = streamId,
        mergeSchema = mergeSchema)
      ()
    }
  }
}
