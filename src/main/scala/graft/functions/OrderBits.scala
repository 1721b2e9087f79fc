package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving 64-bit image of a double: `doubleToLongBits`, then the
  * standard total-order transform (negatives bit-complemented, positives
  * sign-flipped), so UNSIGNED order of the image == Spark SQL's double sort
  * order — including NaN (canonical bits, positive sign) landing ABOVE
  * every finite value, exactly Spark's NaN-largest semantics, and -0.0
  * CANONICALIZED to +0.0 first: Spark's sort comparator
  * (nanSafeCompareDoubles) ranks the two zeros EQUAL, so without the
  * canonicalization they would image into different buckets and "equal
  * doubles share a bucket" — the exactness invariant — would silently
  * break on data containing negative zeros. Taking the
  * image's top bits therefore yields a MONOTONE value bucketing with equal
  * doubles always sharing a bucket — the property two-phase rank selection
  * needs for bit-exact per-series medians without a per-series global sort
  * ([[graft.operators.Series.madOutliersSharded]]).
  *
  * Exists as a codegen Expression because no SQL builtin exposes the
  * double's bit pattern and any floating alternative (log-based exponent
  * extraction) is not exactly monotone at representation boundaries —
  * which would silently corrupt rank selection. The transform is two ALU
  * ops; [[DotProduct]] is the pattern precedent. The IMAGE is engine-
  * internal (steers bucket membership only, never a returned value), so
  * no oracle ever needs to restate it. */
case class DoubleOrderBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"double_order_bits needs a double, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    DoubleOrderBits.image(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($c == 0.0d ? 0.0d : $c);
         |${ev.value} = ($b < 0L) ? ~$b : ($b ^ Long.MIN_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleOrderBits {
  /** The eval-path twin of the generated code (`v == 0.0` is true for
    * BOTH zeros — the canonicalization branch). */
  def image(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (v == 0.0d) 0.0d else v)
    if (b < 0L) ~b else b ^ Long.MinValue
  }
}
