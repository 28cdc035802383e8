package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftexpr
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper for FastMd5 — separate object (not the expression's
  * companion) so scalac emits static forwarders the generated Java can
  * call directly. */
object Md5Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes

  def md5Hex(bytes: Array[Byte]): UTF8String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Drop-in replacement for the built-in md5() over string input with
  * identical output, minus its per-row costs: the built-in routes
  * through commons-codec DigestUtils, which instantiates a fresh
  * MessageDigest per row and builds the hex via a char[]→String→
  * UTF8String round-trip. This one reuses a thread-local digest and
  * writes hex bytes straight into a UTF8String — the md5-bound dedup/
  * fingerprint operators are pure hash throughput, so this is where
  * a native expression beats the built-in (SURVEY §4 graft.functions).
  */
case class FastMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "fast_md5"

  override protected def nullSafeEval(v: Any): Any =
    Md5Util.md5Hex(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Util.md5Hex($c.getBytes())")

  override protected def withNewChildInternal(
      newChild: Expression): FastMd5 = copy(child = newChild)
}

object hashes {
  /** md5 hex digest of a string column (same output as
    * functions.md5(c.cast(binary)), faster per row). */
  def md5(c: Column): Column =
    graftexpr.column(FastMd5(graftexpr.expression(c)))
}
