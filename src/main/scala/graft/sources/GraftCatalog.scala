package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDeleteV2, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCatalog, TableCapability, TableChange}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.{FeatureStore, FeatureValidationError}

/** The graft TableCatalog: one feature-store ROOT exposed as a Spark
  * SQL catalog, making every stored table a first-class V2 table —
  * `SELECT` / `INSERT INTO` / `INSERT OVERWRITE` / `DELETE FROM` (and,
  * with [[graft.GraftExtensions]] installed, `UPDATE` / `MERGE INTO`)
  * address it by name, no temp views required:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.fs", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.fs.root", "/data/features")
  *   spark.sql("SELECT * FROM fs.events WHERE entity_id = 7")
  *   spark.sql("DELETE FROM fs.events WHERE event_type = 'bot'")
  * }}}
  *
  * Catalog ops map to the store's own operators (SURVEY.md §2): CREATE
  * TABLE = register (an empty v1 for plain CREATE; CTAS appends its
  * query as v2), DROP TABLE = the two-phase retire delete, `DELETE
  * FROM` = the copy-on-write row delete with pushed predicates.
  * Namespaces are flat: the root IS the namespace (`default`).
  *
  * This is the fully-V2 batch surface; `format("graft")` keeps its V1
  * batch routing because that format's STREAMING read is the change
  * feed, whose schema (feed columns) differs from the table's — one
  * `Table` advertises one schema, so the format's table stays the
  * streaming half ([[GraftTable]]) and this catalog's table
  * ([[GraftCatalogTable]]) is the batch half. Both read paths execute
  * the SAME plan: the store's own segment reads (see
  * [[GraftBatchScan]]).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var rootOption: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootOption = Option(options.get("root"))
  }

  override def name(): String = catalogName

  private def root: String = rootOption.getOrElse(
    throw new FeatureValidationError(
      s"graft catalog '$catalogName' needs spark.sql.catalog.$catalogName.root"))

  private def spark = SparkSession.active
  private def store = new FeatureStore(spark, root)

  /** Flat namespace: `<cat>.t` and `<cat>.default.t` both address the
    * root's table `t`.
    */
  private def checkNamespace(ns: Array[String]): Unit =
    if (!(ns.isEmpty || ns.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(ns)

  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    checkNamespace(ns)
    if (ns.isEmpty) listNamespaces() else Array.empty
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default"))

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    checkNamespace(ns)
    util.Collections.singletonMap("location", root)
  }

  override def createNamespace(
      ns: Array[String], meta: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft catalogs have one flat namespace per root")

  override def alterNamespace(ns: Array[String], changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalogs have one flat namespace per root")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft catalogs have one flat namespace per root")

  override def listTables(ns: Array[String]): Array[Identifier] = {
    checkNamespace(ns)
    store.tableNames.map(Identifier.of(ns, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      store.tableNames.contains(ident.name)

  override def loadTable(ident: Identifier): Table = {
    checkNamespace(ident.namespace)
    if (!store.tableNames.contains(ident.name))
      throw new NoSuchTableException(ident)
    new GraftCatalogTable(catalogName, root, ident.name)
  }

  /** SQL `VERSION AS OF <v>` — a read-only table pinned to one stored
    * version (the catalog twin of the Scala `getVersion` and the
    * format option `versionAsOf`).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    checkNamespace(ident.namespace)
    if (!store.tableNames.contains(ident.name))
      throw new NoSuchTableException(ident)
    val v = version.trim.toIntOption.getOrElse(
      throw new FeatureValidationError(
        s"graft VERSION AS OF takes an integer version, got '$version'"))
    new GraftCatalogTable(catalogName, root, ident.name, pinnedVersion = Some(v))
  }

  /** SQL `TIMESTAMP AS OF <t>` (micros since epoch from Spark) — the
    * newest version committed at or before the instant, exactly
    * [[FeatureStore.getVersionAsOf]]'s commit-time axis.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    checkNamespace(ident.namespace)
    val s = store
    if (!s.tableNames.contains(ident.name))
      throw new NoSuchTableException(ident)
    val v = s.resolveVersionAsOf(
      ident.name, new java.sql.Timestamp(Math.floorDiv(timestampMicros, 1000L)))
    new GraftCatalogTable(catalogName, root, ident.name, pinnedVersion = Some(v))
  }

  /** Maintenance procedures (`CALL <cat>.optimize(...)` etc.) — see
    * [[GraftProcedures]].
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    checkNamespace(ident.namespace)
    GraftProcedures.load(root, ident.name)
  }

  override def listProcedures(ns: Array[String]): Array[Identifier] = {
    checkNamespace(ns)
    GraftProcedures.names.map(Identifier.of(ns, _)).toArray
  }

  /** CREATE TABLE = register an EMPTY version 1 with the declared
    * schema (the store validates the entity/timestamp contract exactly
    * as it does for data); CTAS then lands its query as an appended
    * version through the write builder.
    */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    checkNamespace(ident.namespace)
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft tables manage their own layout (time-partitioned, " +
          "entity-sorted); PARTITIONED BY is not supported")
    if (store.tableNames.contains(ident.name))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalogName, ident.name))
    val empty = spark.createDataFrame(
      new util.ArrayList[org.apache.spark.sql.Row](), schema)
    store.registerEmpty(ident.name, empty)
    new GraftCatalogTable(catalogName, root, ident.name)
  }

  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_TABLE_CONSTRAINT)

  /** ALTER TABLE: CHECK constraints only (`ADD CONSTRAINT n CHECK
    * (cond)` / `DROP CONSTRAINT`), mapped onto the store's own
    * constraint ledger — adding validates existing data in one scan
    * and every later write enforces at zero extra passes
    * ([[FeatureStore.addConstraint]]). Schema changes stay rejected:
    * graft schemas evolve through mergeSchema appends/upserts.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    checkNamespace(ident.namespace)
    val s = store
    changes.foreach {
      case add: TableChange.AddConstraint =>
        add.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            s.addConstraint(ident.name, c.name(), c.predicateSql())
            ()
          case other =>
            throw new UnsupportedOperationException(
              s"graft tables support CHECK constraints only, got ${other.toDDL}")
        }
      case drop: TableChange.DropConstraint =>
        val existed = s.dropConstraint(ident.name, drop.name())
        if (!existed && !drop.ifExists())
          throw new FeatureValidationError(
            s"table '${ident.name}' has no constraint '${drop.name()}'")
        ()
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE ${other.getClass.getSimpleName} is not supported on " +
            "graft tables; schema evolves through mergeSchema appends/upserts")
    }
    new GraftCatalogTable(catalogName, root, ident.name)
  }

  override def dropTable(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      store.delete(ident.name)

  /** `ALTER TABLE ... RENAME TO`: catalog move + ONE physical
    * directory rename — zero data copied at any size; the full version
    * lineage (time travel, CDF, constraints, txn log) survives under
    * the new name ([[FeatureStore.renameTable]]).
    */
  override def renameTable(from: Identifier, to: Identifier): Unit = {
    checkNamespace(from.namespace)
    checkNamespace(to.namespace)
    val s = store
    try s.renameTable(from.name, to.name)
    catch {
      case _: graft.store.FeatureTableNotFoundError =>
        throw new NoSuchTableException(from)
    }
  }
}

/** One stored table as a V2 batch table: BATCH_READ through
  * [[GraftBatchScan]] (pushdown + pruning reaching the store's
  * stats-skipping segment reads), INSERT INTO / INSERT OVERWRITE
  * through a V1 write bridging to the store's O(delta) append / full
  * register, and DELETE FROM through [[SupportsDeleteV2]] routed to
  * the copy-on-write [[FeatureStore.deleteRows]].
  */
final class GraftCatalogTable(
    catalogName: String,
    val root: String,
    val table: String,
    // SQL time travel: Some(v) pins reads to that version and makes
    // the table read-only (mutating "the past" has no versioned
    // meaning — same contract as the V1 relation's versionAsOf)
    val pinnedVersion: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2 {

  private def spark = SparkSession.active
  private[sources] def store = new FeatureStore(spark, root)

  private[graft] def readOnly(op: String): Nothing =
    throw new FeatureValidationError(
      s"cannot $op a time-travel view of '$table' " +
        "(VERSION AS OF / TIMESTAMP AS OF reads are read-only)")

  override def name(): String =
    s"$catalogName.$table" + pinnedVersion.fold("")(v => s"@v$v")

  override def schema(): StructType = pinnedVersion match {
    // the AS-OF version's own columns: a later evolution's columns
    // don't exist there and must not resolve
    case Some(v) => store.getVersion(table, v).schema
    case None => store.getTableSchema(table)
  }

  /** Batch AND streaming, both in the TABLE's own schema: `SELECT`
    * through [[GraftBatchScan]], `spark.readStream.table(...)` through
    * [[GraftTableRowsStream]] (appended rows; Delta-shaped
    * `skipChangeCommits` policy), `writeStream.toTable(...)` through
    * the same exactly-once sink the format exposes. The CHANGE-FEED
    * stream (feed columns) stays on `format("graft")` — one table,
    * one schema.
    */
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  /** The store's CHECK constraints, surfaced as V2 constraints
    * (DESCRIBE EXTENDED shows them; enforcement is the store's —
    * every data-adding write validates at zero extra passes).
    */
  override def constraints(): Array[
      org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    store.getConstraints(table).toSeq.sortBy(_._1).map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(sql).enforced(true)
        .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** Table metadata for DESCRIBE EXTENDED / SHOW TBLPROPERTIES. */
  override def properties(): util.Map[String, String] = {
    val info = store.getTableInfo(table)
    val m = new util.HashMap[String, String]()
    m.put("version", info.version.toString)
    m.put("row_count", info.rowCount.toString)
    m.put("registered_at", info.registeredAt.toString)
    m.put("updated_at", info.updatedAt.toString)
    pinnedVersion.foreach(v => m.put("pinned_version", v.toString))
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (pinnedVersion.isDefined) readOnly("write to")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = {
        val ovw = overwrite
        val (r, t) = (root, table)
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, overwriteParam: Boolean): Unit = {
                val s = new FeatureStore(data.sparkSession, r)
                if (ovw || overwriteParam) s.register(t, data)
                else s.registerAppend(t, data)
                ()
              }
            }

          /** `writeStream.toTable(...)`: the same exactly-once sink the
            * format exposes ([[GraftStreamingWrite]] — append / upsert /
            * cdc via `.option("mode", ...)`). Stream identity: explicit
            * `streamId` option, else the checkpoint hash, else Spark's
            * own query id (stable across restarts from one checkpoint).
            */
          override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
            val opts = info.options()
            val mode = Option(opts.get("mode")).getOrElse("append")
            if (!Set("append", "upsert", "cdc").contains(mode))
              throw new FeatureValidationError(
                s"streaming write mode must be append|upsert|cdc, got '$mode'")
            RowCodec.validate(info.schema())
            val streamId = GraftDataSource.sinkStreamId(
              opts, queryIdFallback = Some(info.queryId()))
            new GraftStreamingWrite(
              r, t, mode, streamId,
              Option(opts.get("mergeSchema")).exists(_.toBoolean),
              info.schema())
          }
        }
      }
    }
  }

  /** Pushed-predicate DELETE: every predicate Spark hands over must
    * translate (guaranteed by [[canDeleteWhere]] — Spark only calls
    * deleteWhere after it returns true), AND them into the store's
    * copy-on-write row delete. An EMPTY conjunction is the explicit
    * delete-everything statement (`DELETE FROM t` with no WHERE) and
    * routes to [[FeatureStore.truncate]] — a predicate that merely
    * HAPPENS to match every row still trips deleteRows' every-row
    * guard, by design.
    */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p =>
      bridge.predicateToV1(p).exists(f => GraftRelation.translate(f).isDefined))

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    if (pinnedVersion.isDefined) readOnly("DELETE FROM")
    val cond = predicates.toSeq
      .map(p => bridge.predicateToV1(p).getOrElse(
        throw new FeatureValidationError(
          s"DELETE predicate not translatable: $p")))
      // a no-WHERE DELETE arrives as AlwaysTrue: drop it from the
      // conjunction so the statement routes to truncate below
      .filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
      .map(f => GraftRelation.translate(f).getOrElse(
        throw new FeatureValidationError(
          s"DELETE predicate not translatable: $f")))
      .reduceOption(_ && _)
    cond match {
      case Some(c) => store.deleteRows(table, c); ()
      case None => store.truncate(table); ()
    }
  }

  /** SQL `TRUNCATE TABLE`: an empty full-snapshot version in the same
    * lineage — succeeds on any table (the advertised TRUNCATE
    * capability must actually work), prior versions stay
    * time-travelable.
    */
  override def truncateTable(): Boolean = {
    if (pinnedVersion.isDefined) readOnly("TRUNCATE")
    store.truncate(table)
    true
  }
}

/** Scan builder: column pruning and filter pushdown both reach the
  * store — pushed filters route through [[FeatureStore.scanWhere]]
  * (plan-time column-stats segment skipping, then Catalyst pushes the
  * same predicates into the parquet scans), pruned columns shrink the
  * read schema.
  */
final class GraftScanBuilder(
    t: GraftCatalogTable,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private val fullSchema = t.schema()
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var aggAnswer: Option[(StructType, Array[Any])] = None
  // Spark calls supportCompletePushDown THEN pushAggregation with the
  // same Aggregation — memoize so the O(#segments) stats fold and the
  // catalog read run once per plan, not twice
  private var aggMemo: Option[(Aggregation, Option[(StructType, Array[Any])])] =
    None

  private def answeredFromStats(
      agg: Aggregation): Option[(StructType, Array[Any])] = aggMemo match {
    case Some((a, r)) if a eq agg => r
    case _ =>
      val r = answerFromStats(agg)
      aggMemo = Some((agg, r))
      r
  }

  /** COUNT(*) / COUNT(col) / MIN(col) / MAX(col) answered ENTIRELY
    * from per-segment metadata ([[FeatureStore.currentSegmentStats]]):
    * O(#segments) driver work, zero files opened — the Delta/Iceberg
    * metadata-only aggregate. Only COMPLETE pushdown is offered, and
    * only when it is provably exact:
    *   - current version, no pushed filters, no GROUP BY;
    *   - every current segment recorded its row count;
    *   - for COUNT(col): every segment has the column's null count;
    *   - for MIN/MAX(col): every segment is all-null for the column or
    *     carries the bound — an absent bound with non-null rows means
    *     the true extreme was unrepresentable (NaN max, over-long
    *     string) and the whole pushdown is refused, falling back to a
    *     real scan.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answeredFromStats(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggAnswer = answeredFromStats(agg)
    aggAnswer.isDefined
  }

  private def answerFromStats(
      agg: Aggregation): Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.types.{LongType, StructField}
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty ||
        t.pinnedVersion.isDefined) return None
    t.store.currentSegmentStats(t.table).flatMap { segs =>
      def field(e: org.apache.spark.sql.connector.expressions.Expression)
          : Option[org.apache.spark.sql.types.StructField] = e match {
        case r: NamedReference if r.fieldNames.length == 1 =>
          fullSchema.fields.find(_.name == r.fieldNames.head)
            .orElse(fullSchema.fields
              .find(_.name.equalsIgnoreCase(r.fieldNames.head)))
        case _ => None
      }
      // Some(Some(v)) = exact extreme, Some(None) = all rows null,
      // None = unanswerable from the recorded stats
      def extreme(
          f: org.apache.spark.sql.types.StructField,
          wantMax: Boolean): Option[Option[Any]] = {
        val perSeg = segs.map { case (rows, stats) =>
          stats.get(f.name) match {
            case Some(st) if st.nulls == rows => Some(None)
            case Some(st) =>
              (if (wantMax) st.max else st.min)
                .map(v => Some(GraftAggScan.internal(v, f.dataType)))
            case None => if (rows == 0L) Some(None) else None
          }
        }
        if (perSeg.exists(_.isEmpty)) None
        else {
          val vs = perSeg.flatten.flatten
          if (vs.isEmpty) Some(None)
          else Some(Some(vs.reduce { (x, y) =>
            val c = x.asInstanceOf[Comparable[Any]].compareTo(y)
            if ((c >= 0) == wantMax) x else y
          }))
        }
      }
      val answered = agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          Some(StructField("count_star", LongType, nullable = false) ->
            (segs.map(_._1).sum: Any))
        case c: Count if !c.isDistinct =>
          field(c.column).flatMap { f =>
            val per = segs.map { case (rows, stats) =>
              if (rows == 0L) Some(0L)
              else stats.get(f.name).map(st => rows - st.nulls)
            }
            if (per.exists(_.isEmpty)) None
            else Some(
              StructField(s"count_${f.name}", LongType, nullable = false) ->
                (per.flatten.sum: Any))
          }
        case m: Min =>
          field(m.column).flatMap(f => extreme(f, wantMax = false).map(v =>
            StructField(s"min_${f.name}", f.dataType) -> v.orNull))
        case m: Max =>
          field(m.column).flatMap(f => extreme(f, wantMax = true).map(v =>
            StructField(s"max_${f.name}", f.dataType) -> v.orNull))
        case _ => None
      }
      if (answered.exists(_.isEmpty)) None
      else Some((
        StructType(answered.flatten.map(_._1)),
        answered.flatten.map(_._2).toArray))
    }
  }

  /** Keep the translatable filters (fully applied by the store's read
    * — `scanWhere` FILTERS, not just skips, so nothing needs
    * re-evaluation above) and return the rest for Spark to apply.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) =
      filters.partition(f => GraftRelation.translate(f).isDefined)
    pushed = supported
    unsupported
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggAnswer match {
    case Some((schema, row)) => new GraftAggScan(t, schema, row)
    case None => new GraftBatchScan(t, pushed.toSeq, required, options)
  }
}

/** The metadata-only aggregate scan: the answer was computed on the
  * driver from segment stats at PUSHDOWN time; the "scan" is one
  * partition yielding one pre-built row. Internal-value conversion of
  * the stats' canonical strings lives here ([[GraftAggScan.internal]]).
  */
final class GraftAggScan(
    t: GraftCatalogTable,
    schema: StructType,
    row: Array[Any]) extends Scan with Batch {

  override def readSchema(): StructType = schema

  override def description(): String =
    s"graft metadata-only aggregate ${t.name()} " +
      s"[${schema.fieldNames.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(row))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

object GraftAggScan {
  import org.apache.spark.sql.types._

  /** Catalyst-internal value for a stat's canonical rendered string
    * ([[graft.store.ColumnStats.render]] wrote it): boxed primitives,
    * UTF8String, epoch-day Int, micros Long, Decimal — each also
    * Comparable, which the extreme fold relies on.
    */
  private[sources] def internal(v: String, dt: DataType): Any = dt match {
    case ByteType => java.lang.Byte.valueOf(v.toByte)
    case ShortType => java.lang.Short.valueOf(v.toShort)
    case IntegerType | DateType => java.lang.Integer.valueOf(v.toInt)
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.valueOf(v.toLong)
    case FloatType => java.lang.Float.valueOf(v.toFloat)
    case DoubleType => java.lang.Double.valueOf(v.toDouble)
    case BooleanType => java.lang.Boolean.valueOf(v.toBoolean)
    case StringType =>
      org.apache.spark.unsafe.types.UTF8String.fromString(v)
    case d: DecimalType =>
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(v).setScale(d.scale), d.precision, d.scale)
    case other =>
      throw new IllegalStateException(
        s"no stats-internal conversion for $other") // unreachable: stats
      // are only collected for orderable atomic types
  }
}

/** The one pre-computed aggregate row, riding the partition. */
case class GraftAggPartition(values: Array[Any]) extends InputPartition

final class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val values = p.asInstanceOf[GraftAggPartition].values
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      override def close(): Unit = ()
    }
  }
}

/** The batch scan: WRAPS THE STORE'S OWN CATALYST PLAN. At planning
  * time the driver builds the exact DataFrame the Scala API would
  * (`scanWhere` + projection — one read implementation, no V1/V2
  * semantic fork), takes its physical `RDD[InternalRow]`, and exposes
  * one `InputPartition` per RDD partition; executors evaluate that
  * partition in place (`rdd.iterator`) — parquet's vectorized reader,
  * whole-stage codegen, and the store's typed-null evolution padding
  * all run inside the foreign task, and rows never leave Tungsten
  * format (zero re-encode, zero staging I/O — at 100 TB the V2 read
  * costs exactly what the Scala-API read costs).
  *
  * Soundness: wrapping is only valid for EXCHANGE-FREE plans (a
  * shuffle read would need map outputs no stage ever wrote). Snapshot
  * reads are scans + unions + projections by construction; the
  * constructor ASSERTS no exchange and fails loudly if a future store
  * change ever breaks that invariant.
  */
final class GraftBatchScan(
    t: GraftCatalogTable,
    pushed: Seq[Filter],
    required: StructType,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Exact row count from the catalog (the addressed version's own
    * rowCount) and a byte size from the PRUNED read schema's default
    * widths — without this a V2 relation defaults to
    * spark.sql.defaultSizeInBytes = Long.Max and a 5-row graft dim
    * never auto-broadcasts in a join. Pushed filters keep the
    * unfiltered estimate (a sound overestimate: Spark's own filter
    * selectivity applies above).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val s = t.store
    val rows = t.pinnedVersion match {
      case Some(v) => s.getTableHistory(t.table)
        .find(_.version == v).flatMap(_.rows)
        .getOrElse(s.getTableInfo(t.table).rowCount)
      case None => s.getTableInfo(t.table).rowCount
    }
    val width = math.max(1, required.fields.map(_.dataType.defaultSize).sum)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(
          math.max(1L, rows * width.toLong))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  override def description(): String =
    s"graft table ${t.name()} " +
      s"[pushed: ${pushed.mkString(", ")}] [columns: ${required.fieldNames.mkString(", ")}]"

  // ------------------------------------------------- runtime filtering
  //
  // Dynamic partition pruning for joins: Spark evaluates the build side
  // of a broadcast join, converts the observed join keys into IN
  // predicates, and hands them here AT RUNTIME. They fold into the
  // same `scanWhere` path planning-time filters use — per-segment
  // column-stats skipping drops whole segments whose key range misses
  // the probe set before any file opens, and the surviving rows are
  // FILTERED (not just skipped), which is exact (the join re-checks
  // nothing it did not already). At 100 TB a selective dim join reads
  // the matching slice of the fact table, not all of it.

  @volatile private var runtimePushed: Seq[Filter] = Seq.empty

  /** Test hook: how many runtime predicates reached this scan. */
  private[graft] def runtimeFilterCount: Int = runtimePushed.size

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(predicates: Array[Predicate]): Unit = synchronized {
    val translated = predicates.toSeq
      .flatMap(p => bridge.predicateToV1(p))
      .filter(f => GraftRelation.translate(f).isDefined)
    if (translated.nonEmpty) {
      runtimePushed = runtimePushed ++ translated
      cachedRdd = null // re-plan with the narrowed predicate set
    }
  }

  override def toBatch: Batch = this

  /** `spark.readStream.table(...)`: the appended-rows stream
    * ([[GraftTableRowsStream]]) in the table's own schema — pushed
    * filters and pruned columns reach each microbatch's staging job.
    */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (t.pinnedVersion.isDefined) t.readOnly("stream")
    val s = t.store
    s.getTableInfo(t.table) // canonical not-found error, at stream start
    val starting = Option(options.get("startingVersion"))
      .map(GraftDataSource.parseInt("startingVersion", _))
      .orElse(Option(options.get("startingTimestamp"))
        .map(ts => s.resolveVersionAsOf(t.table, ts)))
    val maxPerBatch = Option(options.get("maxVersionsPerBatch"))
      .map(GraftDataSource.parseInt("maxVersionsPerBatch", _))
    maxPerBatch.foreach(m => if (m < 1)
      throw new FeatureValidationError(
        s"maxVersionsPerBatch must be >= 1, got $m"))
    val skip = Option(options.get("skipChangeCommits")).exists(_.toBoolean)
    new GraftTableRowsStream(
      t.root, t.table, required, pushed.toSeq, starting, maxPerBatch,
      skip, checkpointLocation)
  }

  /** The store-planned frame this scan executes — DELEGATED to the one
    * shared batch read plan ([[GraftRelation.storeFrame]]), the same
    * translation + routing site the V1 relation uses, so the two
    * surfaces cannot drift (ReadPathEquivalenceProps holds them
    * row-equal over fuzzed predicates and projections).
    */
  private[sources] def storeFrame: DataFrame =
    GraftRelation.storeFrame(
      t.store, t.table, t.pinnedVersion, timestampAsOf = None,
      pushed ++ runtimePushed, required.fieldNames.toSeq)

  @volatile private var cachedRdd: RDD[InternalRow] = null

  private def rdd: RDD[InternalRow] = synchronized {
    if (cachedRdd == null) {
      val df = storeFrame
      val plan = bridge.executedPlan(df)
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      if (exchanges.nonEmpty)
        throw new IllegalStateException(
          s"graft batch scan requires an exchange-free snapshot plan; got: $plan")
      val r = bridge.toRdd(df)
      GraftBatchScan.forceDag(r)
      cachedRdd = r
    }
    cachedRdd
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val r = rdd
    r.partitions.map { p =>
      GraftPlanPartition(r, p, r.preferredLocations(p).toArray)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftPlanReaderFactory
}

object GraftBatchScan {
  /** Force-populate every RDD's cached `dependencies_` on the DRIVER.
    * The constructor-supplied dependency list is `@transient` (an
    * executor normally receives its partition inside the `Task` and
    * never re-derives the DAG), but operators like `UnionRDD.compute`
    * reach through `dependencies` at evaluation time — the cached
    * field is non-transient, so forcing it here makes the wrapped DAG
    * self-contained after serialization.
    */
  private[sources] def forceDag(r: RDD[_]): Unit = {
    r.partitions
    r.dependencies.foreach(d => forceDag(d.rdd))
  }
}

/** One partition of the wrapped plan. The `Partition` OBJECT rides
  * along (exactly as a normal Spark `Task` carries its partition) —
  * it cannot be re-derived on the executor, where partition-index
  * state like `FileScanRDD.filePartitions` is `@transient`-null.
  * Locations were resolved on the driver (executors cannot ask the
  * scheduler).
  */
case class GraftPlanPartition(
    rdd: RDD[InternalRow],
    split: org.apache.spark.Partition,
    locs: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = locs
}

/** Evaluates the requested partition inside the V2 task. The RDD rides
  * in the PARTITION, not here: runtime filtering (`filter()`) can
  * re-plan the wrapped RDD after Spark has already created this
  * factory (BatchScanExec builds it at planning, e.g. for the columnar
  * check), so the partition must stay self-consistent with whatever
  * RDD generation produced it — pairing a pre-filter factory with
  * post-filter partitions is then still correct.
  */
final class GraftPlanReaderFactory extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftPlanPartition]
    val it = gp.rdd.iterator(gp.split, TaskContext.get())
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
