package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Catalyst expressions over [[RowCodec]]: pack a struct of columns into
  * one binary blob, and unpack a blob back into its struct. These run
  * only on the connector's STAGING paths (a blob write or the sink's
  * commit-side decode) — never in user query plans — so interpreted
  * eval (`CodegenFallback`) is the right cost/complexity point: the
  * staging jobs are I/O-bound, and the hot read path decodes in the
  * `PartitionReader` itself, outside any Spark plan.
  */
case class PackRow(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType =>
      try { RowCodec.validate(st); TypeCheckResult.TypeCheckSuccess }
      catch {
        case e: graft.store.FeatureValidationError =>
          TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_pack_row expects a struct, got ${other.simpleString}")
  }

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pack_row"

  override def nullSafeEval(v: Any): Any =
    RowCodec.pack(v.asInstanceOf[InternalRow], structType)

  override protected def withNewChildInternal(newChild: Expression): PackRow =
    copy(child = newChild)
}

case class UnpackRow(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_unpack_row expects binary, got ${other.simpleString}")
  }

  override def dataType: DataType = schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_unpack_row"

  override def nullSafeEval(v: Any): Any =
    RowCodec.unpack(v.asInstanceOf[Array[Byte]], schema)

  override protected def withNewChildInternal(newChild: Expression): UnpackRow =
    copy(child = newChild)
}

object RowCodecExpressions {
  /** All of `columns` packed into one binary column. */
  def packed(columns: Seq[String]): Column =
    bridge.column(PackRow(bridge.expression(struct(columns.map(col): _*))))

  /** A binary column unpacked to a struct of `schema`. */
  def unpacked(c: Column, schema: StructType): Column =
    bridge.column(UnpackRow(bridge.expression(c), schema))
}
