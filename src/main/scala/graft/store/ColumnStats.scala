package graft.store

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, count, lit, max, min, when}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Per-segment, per-column data-skipping statistics — the column-level
  * stats record the transaction-log formats carry beyond the timestamp
  * range (the gap [[TxnLogStorage]]'s own doc names). One [[ColStat]]
  * per eligible column per segment: null count plus min/max rendered as
  * canonical strings in the column's own domain (micros for timestamps,
  * epoch days for dates, plain decimal for numbers). Absent bounds mean
  * UNKNOWN (all-null segment, over-long string, NaN) and are never used
  * to prune — the safe direction.
  */
final case class ColStat(nulls: Long, min: Option[String], max: Option[String])

object ColumnStats {

  /** Stats are collected for the first `MaxStatsColumns` orderable
    * atomic columns in schema order (Delta's `dataSkippingNumIndexedCols`
    * discipline — wide feature tables don't pay stats collection for
    * hundreds of tail columns).
    */
  val MaxStatsColumns = 32

  /** String bounds longer than this are dropped rather than truncated:
    * a truncated max would need a successor-string correction to stay
    * sound, and long strings (document text) are poor skipping keys
    * anyway.
    */
  val MaxStringStatLength = 96

  private[store] def orderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | StringType | BooleanType | DateType | TimestampType |
        TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** `priority` columns (the storage's entity/timestamp keys) are
    * always included when orderable — a very wide schema must not push
    * the keys every read path prunes on past the column cap.
    */
  def eligible(
      schema: StructType,
      priority: Seq[String] = Seq.empty): Seq[StructField] = {
    val all = schema.fields.toSeq.filter(f => orderable(f.dataType))
    val (pri, rest) = all.partition(f => priority.contains(f.name))
    (pri ++ rest).take(MaxStatsColumns)
  }

  /** Observation metric columns for `fields` — ride the write job's
    * existing CollectMetrics node, so stats cost zero extra passes.
    * Metric names are index-based (column names can hold any character).
    */
  def metrics(fields: Seq[StructField]): Seq[Column] =
    fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(
        min(col(f.name)).as(s"_g_min_$i"),
        max(col(f.name)).as(s"_g_max_$i"),
        count(when(col(f.name).isNull, lit(1))).as(s"_g_nul_$i"))
    }

  /** Assemble per-column stats from an observation's metric map. */
  def fromMetrics(
      fields: Seq[StructField],
      get: String => Any): Map[String, ColStat] =
    fields.zipWithIndex.map { case (f, i) =>
      f.name -> ColStat(
        nulls = get(s"_g_nul_$i").asInstanceOf[Long],
        min = render(get(s"_g_min_$i"), f.dataType),
        max = render(get(s"_g_max_$i"), f.dataType))
    }.toMap

  /** Canonical string for an EXTERNAL (driver-side) value of `dt`;
    * None = no usable bound (null, NaN, over-long string).
    */
  private[store] def render(value: Any, dt: DataType): Option[String] =
    Option(value).flatMap { v =>
      dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(v.toString)
        case FloatType | DoubleType =>
          val d = v.asInstanceOf[Number].doubleValue()
          // normalize -0.0 → 0.0 (Delta does the same): Spark compares
          // them EQUAL, so a "-0.0" bound must not order below a 0.0
          // literal at prune time
          if (d.isNaN) None
          else Some((if (d == 0.0) 0.0 else d).toString)
        case _: DecimalType =>
          v match {
            case b: java.math.BigDecimal => Some(b.toPlainString)
            case b: scala.math.BigDecimal => Some(b.bigDecimal.toPlainString)
            case _ => None
          }
        case StringType =>
          val s = v.toString
          if (s.length <= MaxStringStatLength) Some(s) else None
        case BooleanType => Some(v.toString)
        case DateType =>
          v match {
            case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
            case d: java.time.LocalDate => Some(d.toEpochDay.toString)
            case _ => None
          }
        case TimestampType | TimestampNTZType =>
          v match {
            case t: java.sql.Timestamp =>
              val millisOfNanos = t.getNanos / 1000000L
              val micros =
                (t.getTime - millisOfNanos) * 1000L + t.getNanos / 1000L
              Some(micros.toString)
            case t: java.time.Instant =>
              Some((Math.multiplyExact(t.getEpochSecond, 1000000L) +
                t.getNano / 1000L).toString)
            case t: java.time.LocalDateTime =>
              val i = t.toInstant(java.time.ZoneOffset.UTC)
              Some((Math.multiplyExact(i.getEpochSecond, 1000000L) +
                i.getNano / 1000L).toString)
            case _ => None
          }
        case _ => None
      }
    }

  // ----------------------------------------------------- marker codec

  /** `colStats=` marker value: comma-separated
    * `enc(col):nulls:<vmin>:<vmax>` where a bound is `v` + URL-encoding
    * when present, empty when absent (URL-encoding never emits ':' or
    * ',', and the `v` prefix keeps the empty string distinguishable
    * from "no bound").
    */
  def renderMap(stats: Map[String, ColStat]): String = {
    def bound(b: Option[String]): String =
      b.fold("")(s => "v" + java.net.URLEncoder.encode(s, "UTF-8"))
    stats.toSeq.sortBy(_._1).map { case (c, st) =>
      s"${java.net.URLEncoder.encode(c, "UTF-8")}:${st.nulls}:" +
        s"${bound(st.min)}:${bound(st.max)}"
    }.mkString(",")
  }

  def parseMap(s: String): Map[String, ColStat] = {
    def bound(f: String): Option[String] =
      if (f.startsWith("v"))
        Some(java.net.URLDecoder.decode(f.drop(1), "UTF-8"))
      else None
    s.split(",").toSeq.filter(_.nonEmpty).flatMap { entry =>
      entry.split(":", -1) match {
        case Array(c, n, mn, mx) =>
          n.toLongOption.map(nulls =>
            java.net.URLDecoder.decode(c, "UTF-8") ->
              ColStat(nulls, bound(mn), bound(mx)))
        case _ => None
      }
    }.toMap
  }
}

/** Segment-level predicate satisfiability over [[ColStat]] bounds — the
  * data-skipping decision: `maySatisfy` returns false only when NO row
  * of the segment can make the (resolved, deterministic) predicate
  * TRUE, so dropping the segment from a scan/classification is exact.
  * Anything it can't reason about (casts over the column, UDF-shaped
  * expressions, non-ASCII string ordering, missing stats) returns true
  * — always the sound direction. Mirrors the stats filters the
  * transactional table formats derive from their per-file min/max.
  */
object StatsPruning {

  /** Can any row of a segment with `stats` (and `segRows` total rows,
    * when known) satisfy `expr`? `expr` must be a RESOLVED expression
    * over the segment's columns (take it from an analyzed Filter).
    */
  def maySatisfy(
      expr: Expression,
      stats: Map[String, ColStat],
      segRows: Option[Long]): Boolean = expr match {
    case And(l, r) =>
      maySatisfy(l, stats, segRows) && maySatisfy(r, stats, segRows)
    case Or(l, r) =>
      maySatisfy(l, stats, segRows) || maySatisfy(r, stats, segRows)
    case Not(IsNull(a: AttributeReference)) =>
      maySatisfy(IsNotNull(a), stats, segRows)
    case Not(IsNotNull(a: AttributeReference)) =>
      maySatisfy(IsNull(a), stats, segRows)
    case IsNull(a: AttributeReference) =>
      stats.get(a.name).forall(_.nulls > 0)
    case IsNotNull(a: AttributeReference) =>
      stats.get(a.name).forall(st => hasNonNull(st, segRows))
    case EqualNullSafe(a: AttributeReference, l) if l.foldable =>
      Option(l.eval(null)) match {
        case None => stats.get(a.name).forall(_.nulls > 0)
        case Some(_) => litSat(a, "=", l, stats, segRows)
      }
    case EqualNullSafe(l, a: AttributeReference) if l.foldable =>
      maySatisfy(EqualNullSafe(a, l), stats, segRows)
    case EqualTo(a: AttributeReference, l) if l.foldable =>
      litSat(a, "=", l, stats, segRows)
    case EqualTo(l, a: AttributeReference) if l.foldable =>
      litSat(a, "=", l, stats, segRows)
    case LessThan(a: AttributeReference, l) if l.foldable =>
      litSat(a, "<", l, stats, segRows)
    case LessThan(l, a: AttributeReference) if l.foldable =>
      litSat(a, ">", l, stats, segRows)
    case LessThanOrEqual(a: AttributeReference, l) if l.foldable =>
      litSat(a, "<=", l, stats, segRows)
    case LessThanOrEqual(l, a: AttributeReference) if l.foldable =>
      litSat(a, ">=", l, stats, segRows)
    case GreaterThan(a: AttributeReference, l) if l.foldable =>
      litSat(a, ">", l, stats, segRows)
    case GreaterThan(l, a: AttributeReference) if l.foldable =>
      litSat(a, "<", l, stats, segRows)
    case GreaterThanOrEqual(a: AttributeReference, l) if l.foldable =>
      litSat(a, ">=", l, stats, segRows)
    case GreaterThanOrEqual(l, a: AttributeReference) if l.foldable =>
      litSat(a, "<=", l, stats, segRows)
    case In(a: AttributeReference, list) if list.forall(_.foldable) =>
      list.exists(l => litSat(a, "=", l, stats, segRows))
    case InSet(a: AttributeReference, values) =>
      values.exists(v =>
        v != null && cmpSat(a, "=", v, stats, segRows))
    case StartsWith(a: AttributeReference, l)
        if l.foldable && a.dataType == StringType =>
      Option(l.eval(null)) match {
        case None => false // LIKE null% is never true
        case Some(p) => prefixSat(a, p.toString, stats, segRows)
      }
    case Literal(null, _) => false
    case Literal(v: Boolean, BooleanType) => v
    case _ => true // unknown shape: cannot prove unsatisfiable
  }

  private def hasNonNull(st: ColStat, segRows: Option[Long]): Boolean =
    st.min.isDefined || st.max.isDefined ||
      segRows.forall(r => r - st.nulls > 0)

  /** Comparison vs a foldable expression: evaluate it (the analyzer has
    * already cast it to the column's type) and test the interval. A
    * null comparand is never TRUE under three-valued logic.
    */
  private def litSat(
      a: AttributeReference,
      op: String,
      l: Expression,
      stats: Map[String, ColStat],
      segRows: Option[Long]): Boolean =
    if (l.dataType != a.dataType) true // analyzer normally equalizes; be safe
    else Option(l.eval(null)) match {
      case None => false
      case Some(v) => cmpSat(a, op, v, stats, segRows)
    }

  /** Interval test for `column <op> value` over the segment's bounds.
    * Missing bound on the deciding side → cannot prune. A column known
    * all-null (nulls == segRows) satisfies no comparison.
    */
  private def cmpSat(
      a: AttributeReference,
      op: String,
      value: Any,
      stats: Map[String, ColStat],
      segRows: Option[Long]): Boolean =
    stats.get(a.name) match {
      case None => true
      case Some(st) =>
        if (!hasNonNull(st, segRows)) false
        else {
          def lo = st.min.flatMap(cmp(_, value, a.dataType))
          def hi = st.max.flatMap(cmp(_, value, a.dataType))
          op match {
            case "=" => lo.forall(_ <= 0) && hi.forall(_ >= 0)
            case "<" => lo.forall(_ < 0) // exists x < v  iff  min < v
            case "<=" => lo.forall(_ <= 0)
            case ">" => hi.forall(_ > 0) // exists x > v  iff  max > v
            case ">=" => hi.forall(_ >= 0)
            case _ => true
          }
        }
    }

  /** `startswith(column, p)`: satisfiable iff [min, max] intersects
    * [p, successor(p)) — ASCII-only, like the string comparator.
    */
  private def prefixSat(
      a: AttributeReference,
      prefix: String,
      stats: Map[String, ColStat],
      segRows: Option[Long]): Boolean =
    stats.get(a.name) match {
      case None => true
      case Some(st) =>
        if (!hasNonNull(st, segRows)) false
        else if (!isAscii(prefix)) true
        else {
          // max >= p  AND  min < successor(p) (prefix with last char
          // bumped; all-0x7F prefix has no ASCII successor → no upper test)
          val maxOk = st.max.forall(mx =>
            !isAscii(mx) || mx.compareTo(prefix) >= 0)
          val succ = successor(prefix)
          val minOk = st.min.forall(mn =>
            !isAscii(mn) || succ.forall(s => mn.compareTo(s) < 0))
          maxOk && minOk
        }
    }

  private def successor(p: String): Option[String] = {
    val chars = p.toCharArray
    var i = chars.length - 1
    while (i >= 0 && chars(i) >= 0x7f.toChar) i -= 1
    if (i < 0) None
    else Some(new String(chars.take(i)) + (chars(i) + 1).toChar)
  }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** Compare a rendered stat bound with an INTERNAL (Catalyst) value of
    * the column's type; None = not comparable (never prune on it).
    */
  private[store] def cmp(
      statStr: String,
      value: Any,
      dt: DataType): Option[Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType | _: DecimalType =>
      try {
        val a = new java.math.BigDecimal(statStr)
        val b = value match {
          case d: Decimal => d.toJavaBigDecimal
          case n: java.lang.Number => new java.math.BigDecimal(n.toString)
          case _ => return None
        }
        Some(a.compareTo(b))
      } catch { case _: NumberFormatException => None }
    case FloatType | DoubleType =>
      for {
        a0 <- statStr.toDoubleOption
        b0 <- value match {
          case n: java.lang.Number => Some(n.doubleValue())
          case _ => None
        }
        if !a0.isNaN && !b0.isNaN
        // Spark's comparisons treat -0.0 == 0.0; Double.compare does
        // not — normalize both sides so pruning agrees with the engine
        a = if (a0 == 0.0) 0.0 else a0
        b = if (b0 == 0.0) 0.0 else b0
      } yield java.lang.Double.compare(a, b)
    case StringType =>
      val b = value match {
        case u: UTF8String => u.toString
        case s: String => s
        case _ => return None
      }
      // ASCII-only: UTF-8 binary order (Spark) and UTF-16 order (Java)
      // agree there; beyond it they can disagree, so never prune
      if (isAscii(statStr) && isAscii(b)) Some(statStr.compareTo(b))
      else None
    case BooleanType =>
      (statStr.toBooleanOption, value) match {
        case (Some(a), b: java.lang.Boolean) =>
          Some(java.lang.Boolean.compare(a, b))
        case _ => None
      }
    case DateType =>
      (statStr.toLongOption, value) match {
        case (Some(a), b: java.lang.Integer) =>
          Some(java.lang.Long.compare(a, b.longValue()))
        case _ => None
      }
    case TimestampType | TimestampNTZType =>
      (statStr.toLongOption, value) match {
        case (Some(a), b: java.lang.Long) => Some(java.lang.Long.compare(a, b))
        case _ => None
      }
    case _ => None
  }
}
