package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Catalyst expressions over [[RowCodec]]: pack a struct of columns into
  * one binary blob, and unpack a blob back into its struct. They run on
  * the connector's STAGING paths (a blob write, the sink's commit-side
  * decode) — never in user query plans — but the snapshot microbatch
  * packs a whole table, so both generate real code (`doGenCode` calls
  * the codec with the schema as a reference object): the child struct
  * assembly and the codec call stay inside whole-stage codegen instead
  * of dropping the entire stage to interpreted eval, which measured
  * ~1.9 µs/row on the 20M-row soak's snapshot batch.
  */
case class PackRow(child: Expression)
    extends UnaryExpression {

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("packSchema", structType,
      classOf[StructType].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sources.RowCodec$$.MODULE$$.pack(" +
        s"(org.apache.spark.sql.catalyst.InternalRow) $c, $schemaRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PackRow =
    copy(child = newChild)
}

case class UnpackRow(child: Expression, schema: StructType)
    extends UnaryExpression {

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef = ctx.addReferenceObj("unpackSchema", schema,
      classOf[StructType].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.sources.RowCodec$$.MODULE$$.unpack($c, $schemaRef);")
  }

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
