package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable hash family's hot path:
  * the first `hexChars` hex digits of md5(input) as a non-negative
  * long, computed straight from the digest bytes.
  *
  * Semantically identical to
  * `conv(substring(md5(c), 1, hexChars), 16, 10).cast(long)` — the
  * form the DuckDB oracle mirrors — but that composition materializes a
  * 32-char hex string, a substring copy, a base-conversion DECIMAL
  * string and a final parse PER ROW. This expression runs the digest
  * and assembles the value with shifts (first 8 digest bytes big-endian,
  * dropped down to `hexChars` nibbles), allocating nothing but the
  * digest array, and stays inside whole-stage codegen. The md5 family
  * is on the hot path of every dedup/sketch operator (one digest per
  * shingle or token occurrence — hundreds of millions per TB), so the
  * per-row constant matters.
  *
  * Digest instances are thread-local ([[Md5PrefixLong.compute]]):
  * MessageDigest is stateful and not shareable across tasks.
  */
case class Md5PrefixLong(child: Expression, hexChars: Int)
    extends UnaryExpression {

  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be in [1,15] to stay non-negative in a long, got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_long expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_md5_long"

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLong.compute(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5PrefixLong.compute($c, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First `hexChars` hex digits of md5 as a long: the first 8 digest
    * bytes big-endian, logically right-shifted down to `hexChars`
    * nibbles (15 hex chars = first 8 bytes >>> 4 — exactly what parsing
    * the 15-char hex prefix yields).
    */
  def compute(s: UTF8String, hexChars: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> (4 * (16 - hexChars))
  }

  /** Column-API form. */
  def apply(c: Column, hexChars: Int): Column =
    bridge.column(Md5PrefixLong(bridge.expression(c), hexChars))

  /** Registration triple for SQL exposure: `graft_md5_long(s, n)`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_md5_long"),
    new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"graft_md5_long expects 2 arguments, got ${children.length}")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"graft_md5_long's second argument must be an int literal, got $other")
      }
      Md5PrefixLong(children.head, n)
    })
}
