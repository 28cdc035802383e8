package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftexpr
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
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

  /** Word-trigram census: (n_tri, n_uniq) in one pass — the
    * size(array_distinct(transform(sequence(...), trigram))) pair
    * without building the trigram Column array per row (an interpreted
    * HOF lambda plus one concat_ws allocation per trigram plus an
    * O(n²)-ish array_distinct). Trigram identity is the exact
    * space-joined string, so the distinct count matches the
    * declarative/oracle formulation bit-for-bit. */
  def trigramStats(s: UTF8String): InternalRow = {
    val words = s.toString.split(" ", -1)
    val n = words.length
    if (n < 3) return new GenericInternalRow(Array[Any](0L, 0L))
    val nTri = n - 2
    val set = new java.util.HashSet[String](nTri * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 3 <= n) {
      sb.setLength(0)
      sb.append(words(i)).append(' ').append(words(i + 1)).append(' ')
        .append(words(i + 2))
      set.add(sb.toString)
      i += 1
    }
    new GenericInternalRow(Array[Any](nTri.toLong, set.size.toLong))
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hashed-bag-of-words weight fold: per space-separated token, bucket
    * = hex chars 3-4 of md5(token) (= the two nibbles of digest byte 1,
    * exactly `conv(substring(md5(tok), 3, 2), 16, 10)`), accumulate
    * weights(bucket) in token order — the same summation order as the
    * `aggregate(transform(w, tok -> element_at(...)))` fold it
    * replaces, with one THREAD-LOCAL digest instead of a fresh
    * MessageDigest per token and no interpreted lambda. */
  def bucketWeightSum(s: UTF8String, weights: Array[Double]): Double = {
    val words = s.toString.split(" ", -1)
    val md = digest.get()
    var acc = 0.0
    var i = 0
    while (i < words.length) {
      md.reset()
      val d = md.digest(
        words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val b = ((d(1) >> 4) & 0xf) * 16 + (d(1) & 0xf)
      acc += weights(b)
      i += 1
    }
    acc
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

/** See TextKernelUtil.bucketWeightSum. `weights` is the 2^k-entry
  * model table fixed at plan time (rides as a reference object). */
case class BucketWeightSum(child: Expression, weights: Array[Double])
    extends UnaryExpression {
  require(weights.length == 256,
    "BucketWeightSum buckets by one md5 byte: need exactly 256 weights")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bucket_weight_sum"

  override protected def nullSafeEval(v: Any): Any =
    TextKernelUtil.bucketWeightSum(v.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weights, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelUtil.bucketWeightSum($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BucketWeightSum = copy(child = newChild)
}

/** See TextKernelUtil.trigramStats: struct(n_tri, n_uniq) per row. */
case class TrigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "trigram_stats"

  override protected def nullSafeEval(v: Any): Any =
    TextKernelUtil.trigramStats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernelUtil.trigramStats($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TrigramStats = copy(child = newChild)
}

object text {
  def tokenInListCount(c: Column, tokens: Seq[String]): Column =
    graftexpr.column(TokenInListCount(graftexpr.expression(c), tokens))

  def digitCount(c: Column): Column =
    graftexpr.column(DigitCount(graftexpr.expression(c)))

  def trigramStats(c: Column): Column =
    graftexpr.column(TrigramStats(graftexpr.expression(c)))

  def bucketWeightSum(c: Column, weights: Array[Double]): Column =
    graftexpr.column(BucketWeightSum(graftexpr.expression(c), weights))
}
