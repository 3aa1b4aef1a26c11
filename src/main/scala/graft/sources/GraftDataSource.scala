package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.{FeatureStore, FeatureValidationError}

/** The `graft` Spark data-source: the feature store as a first-class
  * `format("graft")`, on PUBLIC Spark APIs only:
  *
  *   - BATCH READ: `spark.read.format("graft").option("root", r)
  *     .option("table", t)` — current version, or time travel via
  *     `versionAsOf` / `timestampAsOf`. Column pruning reaches the
  *     store, and pushed filters route through [[FeatureStore.scanWhere]],
  *     so the engine's column-stats segment skipping fires before the
  *     scan is planned (Spark re-applies every filter above — the
  *     relation never weakens correctness). Served by the stable V1
  *     relation API ([[GraftRelation]]) — a zero-copy plan over the
  *     store's own segment reads.
  *   - BATCH WRITE: all four SaveModes (Overwrite = new full-snapshot
  *     version, Append = O(delta) chained append or MERGE upsert via
  *     `option("mode","upsert")`, ErrorIfExists / Ignore per their
  *     contracts), plus SQL `INSERT INTO` / `INSERT OVERWRITE` on
  *     `USING graft` views through [[InsertableRelation]].
  *   - STREAMING READ / WRITE: DataSource V2 (`TableProvider` →
  *     [[GraftTable]] → `MicroBatchStream` / `StreamingWrite`) — the
  *     change data feed as a source (with `startingVersion` /
  *     `startingTimestamp` / `maxVersionsPerBatch`), and
  *     append / upsert / cdc sinks, exactly-once per (streamId,
  *     batchId). See [[GraftTable]] for the executor-boundary design.
  *
  * Mode routing is deliberate: the table advertises MICRO_BATCH_READ
  * and STREAMING_WRITE but NOT batch capabilities, so Spark resolves
  * `spark.read` / `df.write` through the V1 relation surface (keeping
  * zero-copy batch plans and full SaveMode semantics) and
  * `readStream` / `writeStream` through V2 — together the two halves
  * replicate a table, row deletes included, through the change feed
  * (tested end to end).
  */
final class GraftDataSource
    extends RelationProvider
    with CreatableRelationProvider
    with TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  // ------------------------------------------------------- batch read
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new GraftRelation(
      sqlContext,
      GraftDataSource.required(parameters, "root"),
      GraftDataSource.required(parameters, "table"),
      parameters.get("versionAsOf")
        .map(GraftDataSource.parseInt("versionAsOf", _)),
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
    val root = GraftDataSource.required(parameters, "root")
    val table = GraftDataSource.required(parameters, "table")
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

  // ------------------------------------------- streaming (DataSource V2)
  /** The feed schema when the table exists; empty otherwise — a SINK
    * destination is often created by its own first commit, and Spark
    * resolves the provider's schema before it knows the table is only
    * being written. A missing SOURCE table still fails loudly, at
    * stream start ([[GraftScan.toMicroBatchStream]]).
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.feedSchemaIfExists(
      SparkSession.active,
      GraftDataSource.required(options, "root"),
      GraftDataSource.required(options, "table"))
      .getOrElse(new StructType())

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftTable(schema, new CaseInsensitiveStringMap(properties))
}

object GraftDataSource {

  private[sources] def required(
      parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new FeatureValidationError(
        s"format(\"graft\") requires option '$key'"))

  private[sources] def required(
      options: CaseInsensitiveStringMap, key: String): String =
    Option(options.get(key)).getOrElse(
      throw new FeatureValidationError(
        s"format(\"graft\") requires option '$key'"))

  /** Integer option parse that names the offending option instead of
    * surfacing a bare NumberFormatException.
    */
  private[sources] def parseInt(name: String, value: String): Int =
    try value.trim.toInt
    catch {
      case _: NumberFormatException =>
        throw new FeatureValidationError(
          s"format(\"graft\") option '$name' must be an integer, got '$value'")
    }

  /** The exactly-once watermark needs a CHECKPOINT-STABLE stream
    * identity; a root/table fallback would silently collide two
    * distinct queries into one watermark line (dropped batches), so
    * demand one of the two options that pin it.
    */
  private[sources] def sinkStreamId(options: CaseInsensitiveStringMap): String =
    sinkStreamId(options, queryIdFallback = None)

  /** THE stream-identity derivation — one site, shared by the
    * `format("graft")` sink and the catalog's `writeStream.toTable`
    * route: two copies would have to stay byte-identical forever or
    * the same query would mint different identities (splitting its
    * exactly-once watermark line) depending on which surface started
    * it. The catalog route may fall back to Spark's checkpoint-stable
    * query id; the format route deliberately has no such fallback.
    */
  private[sources] def sinkStreamId(
      options: CaseInsensitiveStringMap,
      queryIdFallback: Option[String]): String =
    Option(options.get("streamId")).getOrElse {
      Option(options.get("checkpointLocation")) match {
        case Some(basis) =>
          "graft-sink-" + java.security.MessageDigest.getInstance("MD5")
            .digest(basis.getBytes("UTF-8")).map("%02x".format(_)).mkString
        case None => queryIdFallback.map("graft-query-" + _).getOrElse(
          throw new FeatureValidationError(
            "format(\"graft\") sink needs .option(\"checkpointLocation\", ...) " +
              "(its hash becomes the exactly-once stream identity) or an " +
              "explicit .option(\"streamId\", ...)"))
      }
    }
}

/** Batch relation: current version or time travel, with best-effort
  * pushdown of Spark's source filters into the store's stats-skipping
  * read. `unhandledFilters` keeps the default (all filters re-applied
  * by Spark above the scan), so translation can only speed things up.
  * [[InsertableRelation]] makes `USING graft` views SQL-writable:
  * `INSERT INTO` appends a version, `INSERT OVERWRITE` registers a
  * full-snapshot one.
  */
final class GraftRelation(
    override val sqlContext: SQLContext,
    root: String,
    table: String,
    versionAsOf: Option[Int],
    timestampAsOf: Option[String])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

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
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] =
    GraftRelation.storeFrame(
      store, table, versionAsOf, timestampAsOf,
      filters.toSeq, requiredColumns.toSeq).rdd

  /** SQL DML entry (`InsertIntoDataSourceCommand`): the planner has
    * already reordered and cast the query's output to this relation's
    * schema. A time-travel view is read-only — inserting "into the
    * past" has no coherent versioned meaning.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    if (versionAsOf.isDefined || timestampAsOf.isDefined)
      throw new FeatureValidationError(
        s"cannot INSERT into a time-travel view of '$table' " +
          "(versionAsOf/timestampAsOf reads are read-only)")
    val s = store
    if (overwrite) s.register(table, data) else s.registerAppend(table, data)
    ()
  }
}

object GraftRelation {

  /** THE batch read plan — the single translation + routing site every
    * batch path shares: the V1 relation ([[GraftRelation.buildScan]])
    * and the V2 catalog scan ([[GraftBatchScan.storeFrame]]) both
    * delegate here, so their semantics cannot drift (the reference has
    * exactly one read path, `get()`: ml_feature_store/store.py:218-259;
    * ReadPathEquivalenceProps holds the two surfaces row-equal).
    *
    * Routing: a CURRENT-version read with a translatable predicate
    * goes through [[FeatureStore.scanWhere]] (column-stats segment
    * skipping decides which segments are even planned; surviving rows
    * are FILTERED, not just skipped, so nothing above needs
    * re-evaluation); a time-travel snapshot filters above its own
    * segment read. Untranslated filters are the caller's to re-apply
    * (V1 keeps the default unhandledFilters = all; V2 only pushes what
    * translates).
    */
  private[sources] def storeFrame(
      s: FeatureStore,
      table: String,
      versionAsOf: Option[Int],
      timestampAsOf: Option[String],
      filters: Seq[Filter],
      requiredColumns: Seq[String]): DataFrame = {
    val cond = filters.flatMap(translate).reduceOption(_ && _)
    def snapshot: DataFrame = (versionAsOf, timestampAsOf) match {
      case (Some(v), _) => s.getVersion(table, v)
      case (_, Some(t)) => s.getVersionAsOf(table, t)
      case _ => s.getVersion(table, s.getTableInfo(table).version)
    }
    val base = (versionAsOf, timestampAsOf, cond) match {
      case (None, None, Some(c)) => s.scanWhere(table, c)
      case (_, _, c) => c.fold(snapshot)(snapshot.filter)
    }
    base.select(requiredColumns.map(col): _*)
  }

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
    // constant predicates arrive from V2 surfaces (a no-WHERE DELETE
    // hands AlwaysTrue); translating them keeps canDeleteWhere honest
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
