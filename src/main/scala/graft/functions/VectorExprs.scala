package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two ARRAY<FLOAT> / ARRAY<DOUBLE> columns.
  *
  * Exists because the composable form —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — runs interpreted
  * (higher-order functions are CodegenFallback) and allocates per lambda
  * call; over an O(n²) similarity join that interpreter cost dominates the
  * whole query. This expression generates a tight fused loop instead.
  * Accumulation is strictly left-to-right in double precision with each
  * element cast to double first — bit-identical to the HOF form and to the
  * DuckDB oracle's `list_reduce` fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two float/double arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Semantics deliberately match the composable form this replaces
  // (aggregate(zip_with(a,b,_*_),0d,_+_), which RewriteDotProduct targets):
  // unequal lengths ⇒ zip_with null-pads and the sum is NULL; a NULL
  // element ⇒ NULL. Returning a number where the idiom returned NULL would
  // silently change user results.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (af, bf) = (isFloat(left), isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$getA($i) * (double) $b.$getB($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All sign-LSH band keys of a vector in ONE fused pass.
  *
  * The composable form — one `DotProduct(v, lit(plane))` per hyperplane,
  * packed with when/otherwise arithmetic — builds an expression tree with
  * nBits literal arrays of dim doubles. At q_sim_lsh's 24 bits that is
  * tolerable; at the tight-threshold banded near-dup plans
  * ([[graft.operators.Similarity.bandPlanFor]] derives ~500 bits at
  * cosine 0.85) the tree bloats the generated class past what janino JITs,
  * and evaluation decays to interpreted per-plane dispatch. Here the plane
  * matrix is ONE flat reference object and the loop is nBits×dim fused
  * multiply-adds — scalar Java a JIT vectorizes.
  *
  * Semantics are bit-identical to the composable form it replaces: each
  * dot accumulates left-to-right in double precision (elements cast to
  * double), bit i of band b is hyperplane b·bandBits+i, and a degenerate
  * vector (length ≠ plane dim, or any null element — every dot NULL, so
  * every `when(dot >= 0, 1)` takes the otherwise-0 arm) yields all-zero
  * keys, NaN dots likewise sign to 0. When the plane count is not a
  * multiple of bandBits the leftover hyperplanes are ignored (the composed
  * form never packed them into any band either). */
case class HyperplaneBands(child: Expression, planes: Array[Double],
    dim: Int, bandBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def nBits: Int = planes.length / dim
  private def nBands: Int = nBits / bandBits
  // bits actually packed; looping to nBits would index keys(nBands) when
  // bandBits does not divide nBits
  private def usedBits: Int = nBands * bandBits

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands needs a float/double array, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val keys = new Array[Long](nBands)
    val n = v.numElements()
    var degenerate = n != dim
    var i = 0
    while (!degenerate && i < n) {
      if (v.isNullAt(i)) degenerate = true
      i += 1
    }
    if (!degenerate) {
      val f = isFloat
      var b = 0
      while (b < usedBits) {
        var acc = 0.0
        val off = b * dim
        var j = 0
        while (j < dim) {
          val x = if (f) v.getFloat(j).toDouble else v.getDouble(j)
          acc += planes(off + j) * x
          j += 1
        }
        if (acc >= 0) keys(b / bandBits) |= 1L << (b % bandBits)
        b += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val keys = ctx.freshName("keys")
      val deg = ctx.freshName("degenerate")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $keys = new long[$nBands];
         |int $n = $v.numElements();
         |boolean $deg = $n != $dim;
         |for (int $i = 0; !$deg && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) $deg = true;
         |}
         |if (!$deg) {
         |  for (int $b = 0; $b < $usedBits; $b++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $planesRef[$b * $dim + $j] * (double) $v.$get($j);
         |    }
         |    if ($acc >= 0) $keys[$b / $bandBits] |= 1L << ($b % $bandBits);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
