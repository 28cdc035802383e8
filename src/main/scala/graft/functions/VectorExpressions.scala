package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftexpr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native (codegen'd) cosine similarity over two Array[Double] columns —
  * SURVEY §4's graft.functions: a custom Catalyst Expression where the
  * built-ins fall short. The `aggregate(zip_with(...))` formulation
  * allocates an intermediate array per row and evaluates a lambda per
  * element; this expression is ONE fused loop with three scalar
  * accumulators, participates in whole-stage codegen, and matches the
  * built-in formulation bit-for-bit (same index-order summation,
  * null on zero norm mirroring Divide's null-on-zero).
  *
  * Requires equal-length arrays with non-null elements (embedding
  * columns).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var qa = 0.0
    var qb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      qa += x * x
      qb += y * y
      i += 1
    }
    if (qa == 0.0 || qb == 0.0) null
    else dot / (math.sqrt(qa) * math.sqrt(qb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $qa = 0.0;
         |double $qb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y;
         |  $qa += $x * $x;
         |  $qb += $y * $y;
         |}
         |if ($qa == 0.0 || $qb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($qa) * java.lang.Math.sqrt($qb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the custom expressions. */
object vec {
  def cosine(a: Column, b: Column): Column =
    graftexpr.column(
      CosineSimilarity(graftexpr.expression(a), graftexpr.expression(b)))
}
