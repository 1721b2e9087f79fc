package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[BpeMergePair]] — static method invoked from
  * generated Java, UTF8String-native throughout (same discipline as
  * [[TextExprUtil]]). */
object BpeExprUtil {

  /** Greedy left-to-right replacement of every adjacent (a, b) symbol pair
    * with the fused symbol ab: the single-merge step of byte-pair encoding
    * (Sennrich et al., ACL 2016, Algorithm 1). Overlaps resolve leftward —
    * `a a a` under merge (a,a) becomes `aa a` — exactly the reference
    * algorithm's scan order. Null elements (reachable via the SQL
    * registration with arbitrary arrays) never match a merge side and pass
    * through unchanged — read via isNullAt, since UnsafeArrayData's
    * getUTF8String is undefined on null slots. */
  def mergePair(arr: ArrayData, a: UTF8String, b: UTF8String,
      ab: UTF8String): ArrayData = {
    val n = arr.numElements()
    val buf = new java.util.ArrayList[Any](n)
    def at(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    var i = 0
    while (i < n) {
      if (i < n - 1 && a.equals(at(i)) && b.equals(at(i + 1))) {
        buf.add(ab)
        i += 2
      } else {
        buf.add(at(i))
        i += 1
      }
    }
    new GenericArrayData(buf.toArray)
  }
}

/** One BPE merge applied to an ARRAY<STRING> symbol column, codegen'd.
  *
  * The merge pair is a per-round CONSTANT (chosen on the driver from the
  * global pair census), so it rides along as constructor params rather
  * than child expressions — the generated code holds the three
  * UTF8Strings as reference objects and performs one fused pass per row.
  * The alternatives lose: a Scala UDF pays UTF8↔String conversion per
  * symbol per row per round, and no composition of built-ins expresses
  * the sequential overlap rule (`a a a` → `aa a`) without a
  * higher-order-function fold that evaluates interpreted. */
case class BpeMergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  require(left.nonEmpty && right.nonEmpty, "merge pair symbols must be non-empty")

  @transient private lazy val leftU8 = UTF8String.fromString(left)
  @transient private lazy val rightU8 = UTF8String.fromString(right)
  @transient private lazy val fusedU8 = UTF8String.fromString(left + right)

  // propagate the child's containsNull: null elements pass through the
  // merge untouched, so promising a null-free result would let downstream
  // codegen skip isNullAt checks and dereference a null slot
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bpe_merge needs ARRAY<STRING>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BpeExprUtil.mergePair(input.asInstanceOf[ArrayData], leftU8, rightU8, fusedU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("bpeLeft", leftU8)
    val b = ctx.addReferenceObj("bpeRight", rightU8)
    val ab = ctx.addReferenceObj("bpeFused", fusedU8)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BpeExprUtil.mergePair($in, $a, $b, $ab);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
