package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftexpr
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helpers for the text-quality kernels. */
object TextKernelUtil {

  /** Count space-separated tokens exactly equal to one of `tokens` —
    * the size(filter(split(text, ' '), x -> x IN (...))) count without
    * the higher-order-function lambda (HOF lambdas run interpreted and
    * knock the enclosing projection out of whole-stage codegen). */
  def tokenInListCount(s: UTF8String, tokens: Array[String]): Long = {
    val words = s.toString.split(" ", -1)
    var n = 0L
    var i = 0
    while (i < words.length) {
      var j = 0
      var hit = false
      while (!hit && j < tokens.length) {
        if (words(i) == tokens(j)) hit = true
        j += 1
      }
      if (hit) n += 1
      i += 1
    }
    n
  }

  /** Count ASCII digits — length(regexp_replace(text, '[^0-9]', ''))
    * without the per-row regex engine. */
  def digitCount(s: UTF8String): Long = {
    val str = s.toString
    var n = 0L
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') n += 1
      i += 1
    }
    n
  }
}

/** See TextKernelUtil.tokenInListCount. `tokens` is a literal list fixed
  * at plan time (stopword dictionaries). */
case class TokenInListCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "token_in_list_count"

  private lazy val tokenArray = tokens.toArray

  override protected def nullSafeEval(v: Any): Any =
    TextKernelUtil.tokenInListCount(v.asInstanceOf[UTF8String], tokenArray)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokens", tokenArray, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelUtil.tokenInListCount($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenInListCount = copy(child = newChild)
}

/** See TextKernelUtil.digitCount. */
case class DigitCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "digit_count"

  override protected def nullSafeEval(v: Any): Any =
    TextKernelUtil.digitCount(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelUtil.digitCount($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DigitCount = copy(child = newChild)
}

object text {
  def tokenInListCount(c: Column, tokens: Seq[String]): Column =
    graftexpr.column(TokenInListCount(graftexpr.expression(c), tokens))

  def digitCount(c: Column): Column =
    graftexpr.column(DigitCount(graftexpr.expression(c)))
}
