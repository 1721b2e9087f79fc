package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[WordKGrams]] — a plain static method so generated
  * Java can call it directly (`graft.functions.TextExprUtil.kgrams(...)`).
  * Operates on `UTF8String`s in place: no UTF8→java.lang.String conversion
  * anywhere, which is the cost a Scala UDF would pay per row. */
object TextExprUtil {
  private val Space = UTF8String.fromString(" ")

  /** All consecutive k-grams of `arr` in element order, space-joined.
    * Fewer than k elements ⇒ empty array (complete k-grams only — the same
    * boundary rule as the window-lead relational form it replaces). */
  def kgrams(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Positional word-k-grams of an ARRAY<STRING> column, as one codegen'd
  * expression.
  *
  * Exists because both alternative shapes are structurally slower:
  *  - the higher-order-function form (`transform(sequence(...), i =>
  *    concat_ws(" ", slice(ws, i, k)))`) evaluates interpreted
  *    (CodegenFallback) and re-evaluates the `slice` subtree per index —
  *    quadratic re-computation per document;
  *  - the relational window form (`posexplode` words, then k−1 `lead`s over
  *    a per-doc window) pays a hash-partition shuffle + per-doc sort just
  *    to stitch adjacent rows back together, and that shuffle carries every
  *    word row of the corpus.
  * This expression builds the grams in one fused pass over the already-split
  * array, so `posexplode(word_kgrams(words, k))` yields the same
  * (pos, shingle) rows with ZERO shuffle — and downstream aggregations
  * (e.g. MinHash's 128 min-aggs) regain map-side partial aggregation that
  * the window form's pre-shuffled shape forfeited.
  */
case class WordKGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"word_kgrams needs ARRAY<STRING>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.kgrams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExprUtil.kgrams($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
