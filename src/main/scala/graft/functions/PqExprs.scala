package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels (Jégou et al. 2011, "Product quantization
  * for nearest neighbor search") as fused codegen expressions — the same
  * reasoning as [[DotProduct]]/[[HyperplaneBands]]: the composable forms
  * (m×ksub literal-array dots packed with struct argmax / HOF sums) run
  * interpreted or bloat generated classes past janino, and these kernels
  * sit inside the corpus-wide scans where that cost dominates.
  *
  * Shared conventions: the codebook is ONE flat reference array
  * `double[m · ksub · dsub]` (codeword (j, c) at offset (j·ksub + c)·dsub);
  * a degenerate vector (length ≠ m·dsub, or any null element) yields NULL,
  * matching the null discipline of the composed forms they replace. */
object PqExprs {
  private[functions] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Encode a vector as its m per-subspace codeword indices — the 100 TB
  * compression pass (dim floats → m small ints, e.g. 64×4 B → 8 codes).
  * Assignment is MINIMUM-L2 (argmin ‖x_j − cw‖² restated as
  * argmax dot(x_j, cw) − ‖cw‖²/2; `offsets` carries the precomputed
  * ‖cw‖²/2 terms), ties to the LOWEST code so encoding is total and
  * deterministic. Output: non-null array<int> of length m. */
case class PqEncode(child: Expression, codebooks: Array[Double],
    offsets: Array[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs a float/double array, got $t")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != m * dsub) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val f = PqExprs.isFloatArray(child)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.NegativeInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (f) v.getFloat(j * dsub + d).toDouble
                  else v.getDouble(j * dsub + d)
          acc += codebooks(off + d) * x
          d += 1
        }
        val score = acc - offsets(j * ksub + c)
        if (score > best) { best = score; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    val offRef = ctx.addReferenceObj("offsets", offsets, "double[]")
    val get = if (PqExprs.isFloatArray(child)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val deg = ctx.freshName("degenerate")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val score = ctx.freshName("score")
      val off = ctx.freshName("off")
      s"""
         |int $n = $v.numElements();
         |boolean $deg = $n != ${m * dsub};
         |for (int $i = 0; !$deg && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) $deg = true;
         |}
         |if ($deg) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $best = Double.NEGATIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $off = ($j * $ksub + $c) * $dsub;
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $dsub; $d++) {
         |        $acc += $cbRef[$off + $d] * (double) $v.$get($j * $dsub + $d);
         |      }
         |      double $score = $acc - $offRef[$j * $ksub + $c];
         |      if ($score > $best) { $best = $score; $bestC = $c; }
         |    }
         |    $codes[$j] = $bestC;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[j·ksub + c] = dot(q_j, cw_{j,c}) — the
  * m·ksub inner products a query pays ONCE, after which every corpus
  * row's approximate dot is m table lookups ([[PqAdc]]), never a
  * dim-length loop. Output: non-null array<double> of length m·ksub. */
case class PqLut(child: Expression, codebooks: Array[Double],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs a float/double array, got $t")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != m * dsub) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val f = PqExprs.isFloatArray(child)
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (f) v.getFloat(j * dsub + d).toDouble
                  else v.getDouble(j * dsub + d)
          acc += codebooks(off + d) * x
          d += 1
        }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    val get = if (PqExprs.isFloatArray(child)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val lut = ctx.freshName("lut")
      val deg = ctx.freshName("degenerate")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      s"""
         |int $n = $v.numElements();
         |boolean $deg = $n != ${m * dsub};
         |for (int $i = 0; !$deg && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) $deg = true;
         |}
         |if ($deg) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $lut = new double[${m * ksub}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $off = ($j * $ksub + $c) * $dsub;
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $dsub; $d++) {
         |        $acc += $cbRef[$off + $d] * (double) $v.$get($j * $dsub + $d);
         |      }
         |      $lut[$j * $ksub + $c] = $acc;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance scan kernel: given a row's m codes and a query's
  * flattened lut, the approximate inner product Σ_j lut[j·ksub + codes[j]]
  * (ksub derived as lut.length / codes.length). NULL on null inputs or a
  * malformed pair (non-divisible lengths, code out of range) — never a
  * wrong number. This is the expression the compressed-corpus scan runs
  * per (row × query): m array reads, no dim-length arithmetic. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<int> codes, array<double> lut), got $l / $r")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val nLut = lut.numElements()
    if (m == 0 || nLut % m != 0) return null
    val ksub = nLut / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub || lut.isNullAt(j * ksub + c)) return null
      acc += lut.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val nLut = ctx.freshName("nLut")
      val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |int $m = $codes.numElements();
         |int $nLut = $lut.numElements();
         |if ($m == 0 || $nLut % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ksub = $nLut / $m;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $ksub || $lut.isNullAt($j * $ksub + $c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $lut.getDouble($j * $ksub + $c);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
