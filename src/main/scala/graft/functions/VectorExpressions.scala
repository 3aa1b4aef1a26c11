package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the engine's hottest scalar kernel: the
  * float-vector dot product behind every cosine score (dedup_embedding,
  * ann_*_topk).
  *
  * Why an `Expression` and not a UDF (SURVEY.md §7.4 preference order):
  * a Scala UDF forces each ArrayData into a boxed `Seq[Float]` per call;
  * the higher-order-function form (`aggregate(zip_with(...))`) runs
  * interpreted with fresh expr-ids per invocation. This expression reads
  * the unsafe array buffers directly and participates in whole-stage
  * codegen, so the pair-scoring loops stay inside one generated function.
  *
  * Determinism contract (oracle-facing): elements are widened
  * float→double and products accumulated strictly left-to-right — the
  * exact rounding sequence of DuckDB's
  * `list_sum(list_transform(list_zip(a,b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))`
  * and of the interpreted [[graft.ops.Similarity.dot]] fold, so scores
  * are bit-identical across all three forms.
  *
  * Null semantics: null array on either side → null (nullIntolerant);
  * lengths may differ (zip semantics: the shorter length wins). Array
  * *elements* are assumed non-null, as embeddings are dense vectors.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4): both children must be array<float>,
  // element nullability immaterial
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {

  /** Column-API form: `graftDot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    bridge.column(FloatVectorDot(bridge.expression(a), bridge.expression(b)))

  /** Registration triple for `SparkSessionExtensions.injectFunction` /
    * `FunctionRegistry`, exposing the kernel to SQL as `graft_dot(a, b)`.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"graft_dot expects 2 arguments, got ${children.length}")
      FloatVectorDot(children.head, children(1))
    })
}
