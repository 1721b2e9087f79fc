package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Runtime helper for [[EwmaScan]] — a plain static method so generated Java
  * calls it directly (the [[TextExprUtil]] pattern; the loop itself JIT
  * compiles, and eval ≡ codegen by construction). */
object SeriesExprUtil {

  /** Exponentially-weighted scan over a time-sorted series:
    *
    *   s_0 = x_0,               d_0 = 0
    *   s_t = α·x_t + β·s_{t−1}, d_t = α·|x_t − s_{t−1}| + β·d_{t−1}
    *
    * (β = 1 − α precomputed by the caller so both engines share the exact
    * double). Emits per element the POST-update state (s, d) and the
    * PRE-update state (sp, dp — null at t=0): the forecast a point is
    * judged against must not include the point itself.
    *
    * `arr` is ARRAY<STRUCT<...>>; the value sits at `valueIdx` of each
    * `nFields`-wide struct. A null element or null value yields a null
    * result (the [[VectorExprs.DotProduct]] contract — never invent a
    * number where the input was incomplete). */
  def ewmaScan(arr: ArrayData, alpha: Double, beta: Double, nFields: Int,
      valueIdx: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var s = 0.0
    var d = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val e = arr.getStruct(i, nFields)
      if (e.isNullAt(valueIdx)) return null
      val x = e.getDouble(valueIdx)
      if (i == 0) {
        s = x
        d = 0.0
        out(i) = new GenericInternalRow(Array[Any](s, d, null, null))
      } else {
        val sp = s
        val dp = d
        s = alpha * x + beta * sp
        d = alpha * math.abs(x - sp) + beta * dp
        out(i) = new GenericInternalRow(Array[Any](s, d, sp, dp))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Additive triple-exponential (Holt-Winters) scan over a time-sorted
    * series — the full-seasonality member of the family [[ewmaScan]]
    * reduces (Winters 1960; Graphite's holtWintersForecast/
    * holtWintersConfidenceBands/holtWintersAberration). State per series:
    * level l, trend b, and per-phase seasonal/deviation arrays of length
    * `season` (phase of element i = i mod season):
    *
    *   i = 0:  l = x₀, b = 0, s₀ = 0, d₀ = 0, forecast null
    *   i ≥ 1:  f  = l + b + s⁻            (s⁻/d⁻ = phase entries from one
    *           l' = α·(x − s⁻) + (1−α)·(l + b)        season ago; 0 until
    *           b' = β·(l' − l) + (1−β)·b             the first wrap — the
    *           s' = γ·(x − l') + (1−γ)·s⁻        zero-seasonal cold start)
    *           d' = γ·|x − f| + (1−γ)·d⁻
    *
    * Deviations are SEASONAL (d tracks |x − f| per phase), so the band a
    * point is judged against is "how noisy is this hour-of-day", Graphite's
    * confidence-band semantics. Derived complements (ia = 1−α …) are
    * computed ONCE by the caller and interpolated into the oracle, the
    * [[ewmaScan]] discipline. Emits per element the post-update
    * (l, b, s, d) plus the PRE-update forecast f and deviation d⁻ the
    * point was judged against (null at i = 0). Null element/value → null
    * result. */
  def hwScan(arr: ArrayData, alpha: Double, ia: Double, bt: Double,
      ib: Double, g: Double, ig: Double, season: Int, nFields: Int,
      valueIdx: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val seas = new Array[Double](season)
    val dev = new Array[Double](season)
    var l = 0.0
    var b = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val e = arr.getStruct(i, nFields)
      if (e.isNullAt(valueIdx)) return null
      val x = e.getDouble(valueIdx)
      val ph = i % season
      val spre = seas(ph)
      val dpre = dev(ph)
      if (i == 0) {
        l = x
        b = 0.0
        val sNew = g * (x - l) + ig * spre // == 0.0, kept for op parity
        seas(ph) = sNew
        dev(ph) = 0.0
        out(i) = new GenericInternalRow(
          Array[Any](l, b, sNew, 0.0, null, null))
      } else {
        val f = l + b + spre
        val lNew = alpha * (x - spre) + ia * (l + b)
        val bNew = bt * (lNew - l) + ib * b
        val sNew = g * (x - lNew) + ig * spre
        val dNew = g * math.abs(x - f) + ig * dpre
        l = lNew
        b = bNew
        seas(ph) = sNew
        dev(ph) = dNew
        out(i) = new GenericInternalRow(
          Array[Any](lNew, bNew, sNew, dNew, f, dpre))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Canonical LTTB (Steinarsson 2013 §4.2) over one series' time-sorted
    * points: endpoints always selected; the middle n−2 points split into
    * B−2 equal-count buckets; walking left to right, each bucket keeps
    * the point forming the largest triangle with the PREVIOUSLY SELECTED
    * point and the NEXT bucket's centroid (the final point for the last
    * bucket) — the sequential chain the relational centroid-anchored
    * variant ([[graft.operators.Series.downsampleTriangle]]) trades away.
    * Ties keep the earliest point. n ≤ B selects everything.
    *
    * Returns per element STRUCT<sel: BOOLEAN, bucket: INT> (bucket −1 for
    * unselected), positionally zip-able with the input. Null element or
    * null value → null result. */
  def lttbScan(arr: ArrayData, buckets: Int, nFields: Int, tsIdx: Int,
      valueIdx: Int): ArrayData = {
    val n = arr.numElements()
    val ts = new Array[Double](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val e = arr.getStruct(i, nFields)
      if (e.isNullAt(tsIdx) || e.isNullAt(valueIdx)) return null
      ts(i) = e.getLong(tsIdx).toDouble
      vs(i) = e.getDouble(valueIdx)
      i += 1
    }
    val sel = new Array[Int](n) // output bucket, -1 = dropped
    java.util.Arrays.fill(sel, -1)
    if (n <= buckets) {
      i = 0
      while (i < n) { sel(i) = i; i += 1 }
    } else {
      val m = buckets - 2 // middle buckets
      sel(0) = 0
      sel(n - 1) = buckets - 1
      def lo(k: Int): Int = 1 + (k.toLong * (n - 2) / m).toInt
      var a = 0 // previously selected index
      var k = 0
      while (k < m) {
        val start = lo(k)
        val end = lo(k + 1) // exclusive
        // next anchor: centroid of bucket k+1, or the final point
        var cx = ts(n - 1)
        var cy = vs(n - 1)
        if (k + 1 < m) {
          val ns = lo(k + 1)
          val ne = lo(k + 2)
          var sx = 0.0
          var sy = 0.0
          var j = ns
          while (j < ne) { sx += ts(j); sy += vs(j); j += 1 }
          cx = sx / (ne - ns)
          cy = sy / (ne - ns)
        }
        var best = start
        var bestArea = -1.0
        var j = start
        while (j < end) {
          val area = math.abs(
            (ts(a) - ts(j)) * (cy - vs(j)) - (cx - ts(j)) * (vs(a) - vs(j)))
          if (area > bestArea) { bestArea = area; best = j }
          j += 1
        }
        sel(best) = k + 1
        a = best
        k += 1
      }
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](sel(i) >= 0,
        if (sel(i) >= 0) sel(i) else -1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Trailing lower-median scan over one series' time-sorted points — the
    * kernel of [[graft.operators.Series.movingMedianRows]] (Graphite's
    * movingMedian): out(i) = the rank-((c+1) div 2) element of the
    * NON-NULL values among positions [max(0, i−n+1) .. i] (c = their
    * count; the madOutliers lower-median rule, so the answer is a HELD
    * value both engines can agree on), null when c = 0. A rank statistic
    * has no prefix/incremental window form (the r9 window cost model), so
    * the scan maintains a SORTED sliding buffer — binary search +
    * arraycopy per step, O(points·window) worst case, bounded by the
    * caller's render-sized contract. Ordering via java.lang.Double.compare
    * = Spark's double ordering (NaN largest, −0.0 < 0.0). Unlike
    * [[ewmaScan]], null VALUES are legal: graphite's safe median skips
    * None samples, which still occupy a window slot. */
  def movingMedianScan(arr: ArrayData, n: Int, nFields: Int,
      valueIdx: Int): ArrayData = {
    val p = arr.numElements()
    val out = new Array[Any](p)
    val win = new Array[Double](math.min(n, math.max(p, 1)))
    val ringV = new Array[Double](n)
    val ringNull = new Array[Boolean](n)
    var size = 0
    // first index in win[0..size) whose value compares >= v
    def insertionPoint(v: Double): Int = {
      var lo = 0
      var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (java.lang.Double.compare(win(mid), v) < 0) lo = mid + 1
        else hi = mid
      }
      lo
    }
    var i = 0
    while (i < p) {
      if (i >= n && !ringNull(i % n)) { // evict the slot sliding out
        val idx = insertionPoint(ringV(i % n))
        System.arraycopy(win, idx + 1, win, idx, size - idx - 1)
        size -= 1
      }
      val isNull = arr.isNullAt(i) ||
        arr.getStruct(i, nFields).isNullAt(valueIdx)
      ringNull(i % n) = isNull
      if (!isNull) {
        val v = arr.getStruct(i, nFields).getDouble(valueIdx)
        ringV(i % n) = v
        val idx = insertionPoint(v)
        System.arraycopy(win, idx, win, idx + 1, size - idx)
        win(idx) = v
        size += 1
      }
      out(i) = if (size == 0) null else Double.box(win((size - 1) >> 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[movingMedianScan]]'s TIME-window (RANGE-frame) form: frame of
    * element i = every element whose ts lies in [ts_i − w, ts_i], PEERS
    * INCLUDED (rows sharing ts_i are in each other's frames regardless
    * of sort position — SQL RANGE semantics, restated verbatim by the
    * oracle). Two pointers walk the time-sorted input; same sorted
    * buffer + lower-median rule. Null timestamps must be filtered by
    * the caller. */
  def movingMedianTimeScan(arr: ArrayData, windowMs: Long, nFields: Int,
      tsIdx: Int, valueIdx: Int): ArrayData = {
    val p = arr.numElements()
    val out = new Array[Any](p)
    val win = new Array[Double](math.max(p, 1))
    var size = 0
    def insertionPoint(v: Double): Int = {
      var lo = 0
      var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (java.lang.Double.compare(win(mid), v) < 0) lo = mid + 1
        else hi = mid
      }
      lo
    }
    def tsOf(i: Int): Long = arr.getStruct(i, nFields).getLong(tsIdx)
    def valOf(i: Int): java.lang.Double = {
      val e = arr.getStruct(i, nFields)
      if (arr.isNullAt(i) || e.isNullAt(valueIdx)) null
      else java.lang.Double.valueOf(e.getDouble(valueIdx))
    }
    var lo = 0 // first element still in frame
    var hi = 0 // first element not yet admitted
    var i = 0
    while (i < p) {
      val t = tsOf(i)
      // admit every element with ts == t (peers ahead of i included)
      while (hi < p && tsOf(hi) <= t) {
        val v = valOf(hi)
        if (v != null) {
          val idx = insertionPoint(v.doubleValue())
          System.arraycopy(win, idx, win, idx + 1, size - idx)
          win(idx) = v.doubleValue()
          size += 1
        }
        hi += 1
      }
      // evict everything older than the frame's lower bound
      while (tsOf(lo) < t - windowMs) {
        val v = valOf(lo)
        if (v != null) {
          val idx = insertionPoint(v.doubleValue())
          System.arraycopy(win, idx + 1, win, idx, size - idx - 1)
          size -= 1
        }
        lo += 1
      }
      out(i) = if (size == 0) null else Double.box(win((size - 1) >> 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Sequential EWMA state scan over one series' collected points, as a single
  * codegen'd expression — the kernel of [[graft.operators.Anomaly.ewmaBands]]
  * (Graphite's holtWintersForecast/holtWintersAberration family, single
  * exponential smoothing + EWMA absolute deviation).
  *
  * Exists because the recurrence s_t = α·x_t + β·s_{t−1} is inherently
  * sequential — no window frame or relational aggregate expresses it, and
  * the closed form (a sum of α·β^(t−i)·x_i terms) underflows/overflows β^t
  * past a few thousand points. The alternatives are a Scala UDF over the
  * collected array (per-row serialization of the whole series) or
  * `mapGroups` (leaves Tungsten rows entirely); this expression runs the
  * fold in place over the already-collected ArrayData.
  *
  * Input: ARRAY<STRUCT<..., value: DOUBLE, ...>> sorted by the caller
  * (sort_array on a (ts, value) struct). Output: equal-length
  * ARRAY<STRUCT<s, d, sp, dp>> — positionally zip-able with the input, so
  * one `posexplode(arrays_zip(...))` restores rows with ZERO extra shuffle.
  */
case class EwmaScan(child: Expression, alpha: Double)
    extends UnaryExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

  /** 1 − α computed ONCE here: the oracle SQL interpolates this exact
    * double, so both engines run the identical recurrence. */
  val beta: Double = 1.0 - alpha

  private lazy val (nFields: Int, valueIdx: Int) = child.dataType match {
    case ArrayType(st: StructType, _) =>
      (st.size, st.fieldIndex("value"))
    case _ => (0, 0)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("value") &&
          st(st.fieldIndex("value")).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ewma_scan needs ARRAY<STRUCT<..., value: DOUBLE>>, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("sp", DoubleType, nullable = true),
    StructField("dp", DoubleType, nullable = true))), containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SeriesExprUtil.ewmaScan(v.asInstanceOf[ArrayData], alpha, beta,
      nFields, valueIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.SeriesExprUtil.ewmaScan(
         |    $c, ${alpha}D, ${beta}D, $nFields, $valueIdx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): EwmaScan =
    copy(child = newChild)
}

/** Sequential additive Holt-Winters scan over one series' collected points
  * — [[EwmaScan]]'s triple-exponential sibling ([[SeriesExprUtil.hwScan]]
  * for the recurrence). Same existence argument: the level/trend/seasonal
  * recurrences are inherently sequential and per-phase state rules out any
  * window-frame restatement; running the fold in place over the collected
  * ArrayData keeps [[graft.operators.Anomaly.holtWintersBands]] one
  * aggregation + one posexplode. The derived complements (ia/ib/ig) are
  * vals so the oracle interpolates the IDENTICAL doubles.
  *
  * Input: ARRAY<STRUCT<..., value: DOUBLE>> sorted by the caller. Output:
  * equal-length ARRAY<STRUCT<l, b, s, d, f, dp>> (f/dp null at the first
  * element), positionally zip-able with the input. */
case class HwScan(child: Expression, alpha: Double, beta: Double,
    gamma: Double, season: Int) extends UnaryExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
  require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0, 1], got $gamma")
  require(season >= 1, s"season must be >= 1, got $season")

  val ia: Double = 1.0 - alpha
  val ib: Double = 1.0 - beta
  val ig: Double = 1.0 - gamma

  private lazy val (nFields: Int, valueIdx: Int) = child.dataType match {
    case ArrayType(st: StructType, _) =>
      (st.size, st.fieldIndex("value"))
    case _ => (0, 0)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("value") &&
          st(st.fieldIndex("value")).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hw_scan needs ARRAY<STRUCT<..., value: DOUBLE>>, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", DoubleType, nullable = false),
    StructField("b", DoubleType, nullable = false),
    StructField("s", DoubleType, nullable = false),
    StructField("d", DoubleType, nullable = false),
    StructField("f", DoubleType, nullable = true),
    StructField("dp", DoubleType, nullable = true))), containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SeriesExprUtil.hwScan(v.asInstanceOf[ArrayData], alpha, ia, beta, ib,
      gamma, ig, season, nFields, valueIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.SeriesExprUtil.hwScan(
         |    $c, ${alpha}D, ${ia}D, ${beta}D, ${ib}D, ${gamma}D, ${ig}D,
         |    $season, $nFields, $valueIdx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HwScan =
    copy(child = newChild)
}

/** Exact sequential LTTB selection over one series' collected points, as a
  * single codegen'd expression — the strict-chain companion of the
  * relational centroid-anchored [[graft.operators.Series.downsampleTriangle]].
  * Exists for the same reason as [[EwmaScan]]: "largest triangle with the
  * previously SELECTED point" is an inherently sequential recurrence over
  * buckets that no window frame expresses; running it in place over the
  * already-collected ArrayData keeps the operator one aggregation + one
  * posexplode, zero extra shuffle.
  *
  * Input: ARRAY<STRUCT<ts_ms: LONG, value: DOUBLE, ...>> sorted by the
  * caller. Output: equal-length ARRAY<STRUCT<sel, bucket>>. */
case class LttbScan(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 3, s"buckets must be >= 3, got $buckets")

  private lazy val (nFields: Int, tsIdx: Int, valueIdx: Int) =
    child.dataType match {
      case ArrayType(st: StructType, _) =>
        (st.size, st.fieldIndex("ts_ms"), st.fieldIndex("value"))
      case _ => (0, 0, 0)
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("ts_ms") &&
          st(st.fieldIndex("ts_ms")).dataType == LongType &&
          st.fieldNames.contains("value") &&
          st(st.fieldIndex("value")).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lttb_scan needs ARRAY<STRUCT<..., ts_ms: LONG, value: DOUBLE>>, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sel", BooleanType, nullable = false),
    StructField("bucket", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SeriesExprUtil.lttbScan(v.asInstanceOf[ArrayData], buckets, nFields,
      tsIdx, valueIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.SeriesExprUtil.lttbScan(
         |    $c, $buckets, $nFields, $tsIdx, $valueIdx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LttbScan =
    copy(child = newChild)
}

/** Trailing lower-median scan ([[SeriesExprUtil.movingMedianScan]]) —
  * [[EwmaScan]]'s rank-statistic sibling, the kernel of
  * [[graft.operators.Series.movingMedianRows]] (Graphite's movingMedian).
  * Exists because a rank statistic has no prefix/incremental window form:
  * Spark re-aggregates a trailing ROWS frame per row (the r9 window cost
  * model), and a sorted-buffer scan over the already-collected ArrayData
  * is both cheaper (O(points·window) with tiny constants) and exactly the
  * selection rule the oracle restates.
  *
  * Input: ARRAY<STRUCT<..., value: DOUBLE>> sorted by the caller
  * (sort_array on a (ts, value) struct — null values sort first within a
  * tie, matching the oracle's `value NULLS FIRST`). Null VALUES are legal
  * (a window slot with no population contribution). Output: equal-length
  * ARRAY<DOUBLE>, element null where the trailing window holds no values
  * — positionally zip-able with the input. */
case class MovingMedianScan(child: Expression, nPoints: Int)
    extends UnaryExpression {
  require(nPoints > 0, s"nPoints must be positive, got $nPoints")

  private lazy val (nFields: Int, valueIdx: Int) = child.dataType match {
    case ArrayType(st: StructType, _) =>
      (st.size, st.fieldIndex("value"))
    case _ => (0, 0)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("value") &&
          st(st.fieldIndex("value")).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"moving_median_scan needs ARRAY<STRUCT<..., value: DOUBLE>>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SeriesExprUtil.movingMedianScan(v.asInstanceOf[ArrayData], nPoints,
      nFields, valueIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.SeriesExprUtil.movingMedianScan(
         |    $c, $nPoints, $nFields, $valueIdx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MovingMedianScan =
    copy(child = newChild)
}

/** Trailing TIME-window lower-median scan — [[MovingMedianScan]]'s
  * RANGE-frame sibling (Graphite's movingMedian(series, "5min") form).
  * Frame of element i = every element j with ts_j ∈ [ts_i − windowMs,
  * ts_i], PEERS INCLUDED: rows sharing ts_i belong to each other's
  * frames regardless of sort position — exactly SQL RANGE-frame
  * semantics, so the oracle restates the window verbatim. Two pointers
  * advance the frame over the time-sorted input; the sorted value
  * buffer is the [[SeriesExprUtil.movingMedianScan]] discipline. Null
  * values occupy no population; the caller filters null timestamps
  * (meaningless in a time frame).
  *
  * Input: ARRAY<STRUCT<..., ts_ms: LONG, value: DOUBLE>> sorted by the
  * caller. Output: equal-length ARRAY<DOUBLE>. */
case class MovingMedianTimeScan(child: Expression, windowMs: Long)
    extends UnaryExpression {
  require(windowMs > 0, s"windowMs must be positive, got $windowMs")

  private lazy val (nFields: Int, tsIdx: Int, valueIdx: Int) =
    child.dataType match {
      case ArrayType(st: StructType, _) =>
        (st.size, st.fieldIndex("ts_ms"), st.fieldIndex("value"))
      case _ => (0, 0, 0)
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("ts_ms") &&
          st(st.fieldIndex("ts_ms")).dataType == LongType &&
          st.fieldNames.contains("value") &&
          st(st.fieldIndex("value")).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "moving_median_time_scan needs ARRAY<STRUCT<..., ts_ms: LONG, " +
        s"value: DOUBLE>>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SeriesExprUtil.movingMedianTimeScan(v.asInstanceOf[ArrayData], windowMs,
      nFields, tsIdx, valueIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.SeriesExprUtil.movingMedianTimeScan(
         |    $c, ${windowMs}L, $nFields, $tsIdx, $valueIdx);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MovingMedianTimeScan =
    copy(child = newChild)
}
