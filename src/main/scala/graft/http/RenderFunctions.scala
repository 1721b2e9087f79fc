package graft.http

/** The render-function catalog served at `GET /functions` — graphite-web's
  * function-metadata endpoint (webapp/graphite/functions/views.py in the
  * graphite-web project), which Grafana's graphite datasource fetches to
  * populate its query-editor function picker. One entry per function the
  * [[MetricsHttpServer]] render evaluator actually implements, in the
  * graphite-web JSON shape: `{name: {name, function, description, group,
  * params: [{name, type, required}]}}`.
  *
  * The catalog is DERIVED BY HAND from the evaluator's match arms and must
  * move with them — MetricsHttpServerSpec cross-checks that every name
  * listed here is accepted by /render (no phantom entries) so the picker
  * can never advertise a function the evaluator rejects. */
private[http] object RenderFunctions {

  final case class P(name: String, ptype: String, required: Boolean)
  final case class F(name: String, group: String, desc: String, params: Seq[P])

  private def p(n: String, t: String) = P(n, t, required = true)
  private def opt(n: String, t: String) = P(n, t, required = false)
  private val series = p("seriesList", "seriesList")

  /** Every render function the evaluator serves, grouped the way
    * graphite-web groups its pickers. */
  val all: Seq[F] = Seq(
    // Combine
    F("sumSeries", "Combine", "per-instant sum across matched series", Seq(series)),
    F("averageSeries", "Combine", "per-instant mean across matched series", Seq(series)),
    F("maxSeries", "Combine", "per-instant max across matched series", Seq(series)),
    F("minSeries", "Combine", "per-instant min across matched series", Seq(series)),
    F("countSeries", "Combine", "per-instant sample count across matched series", Seq(series)),
    F("rangeOfSeries", "Combine", "per-instant max minus min across matched series", Seq(series)),
    F("stddevSeries", "Combine", "per-instant population stddev across matched series", Seq(series)),
    F("percentileOfSeries", "Combine", "per-instant percentile across matched series", Seq(series, p("n", "float"))),
    F("group", "Combine", "plain union of every argument's series (names/points untouched)", Seq(p("seriesLists", "seriesList"))),
    F("fallbackSeries", "Special", "serve the fallback list when the primary matches no series", Seq(series, p("fallback", "seriesList"))),
    F("groupByNode", "Combine", "aggregate series sharing name node n; entries named by the token", Seq(series, p("nodeNum", "node"), opt("callback", "string"))),
    F("groupByNodes", "Combine", "aggregate series sharing the dot-joined node selection", Seq(series, p("callback", "string"), p("nodes", "node"))),
    F("asPercent", "Combine", "per-instant share of the matched series' total, or of an explicit total expression", Seq(series, opt("total", "seriesList"))),
    F("divideSeries", "Combine", "each series divided by the divisor's per-instant sample", Seq(p("dividendSeriesList", "seriesList"), p("divisorSeries", "seriesList"))),
    F("diffSeries", "Combine", "ONE combined series: the first argument's per-instant sum minus the per-instant sum of the rest (unlike graphite-web's safeDiff, an all-null minuend instant stays null and never adopts a subtrahend)", Seq(series, p("seriesLists", "seriesList"))),
    F("multiplySeries", "Combine", "ONE combined series: per-instant product over every matched series; null when any series misses the instant", Seq(series, p("seriesLists", "seriesList"))),
    // Transform
    F("derivative", "Transform", "per-point delta against the previous sample", Seq(series)),
    F("nonNegativeDerivative", "Transform", "delta with counter resets nulled", Seq(series)),
    F("perSecond", "Transform", "delta per elapsed second", Seq(series)),
    F("integral", "Transform", "running total per series", Seq(series)),
    F("scale", "Transform", "multiply every value by a constant", Seq(series, p("factor", "float"))),
    F("offset", "Transform", "add a constant to every value", Seq(series, p("factor", "float"))),
    F("absolute", "Transform", "absolute value pointwise", Seq(series)),
    F("transformNull", "Transform", "replace null datapoints with a default", Seq(series, opt("default", "float"))),
    F("removeAboveValue", "Transform", "values above the threshold become null datapoints", Seq(series, p("n", "float"))),
    F("removeBelowValue", "Transform", "values below the threshold become null datapoints", Seq(series, p("n", "float"))),
    F("removeAbovePercentile", "Transform", "values above the series' nth percentile become null", Seq(series, p("n", "float"))),
    F("removeBelowPercentile", "Transform", "values below the series' nth percentile become null", Seq(series, p("n", "float"))),
    F("nPercentile", "Transform", "draw each series' nth-percentile line", Seq(series, p("n", "float"))),
    F("changed", "Transform", "1 where a sample differs from its predecessor, else 0", Seq(series)),
    F("offsetToZero", "Transform", "subtract each series' own minimum", Seq(series)),
    F("logarithm", "Transform", "log base b pointwise (default 10); non-positive values render null", Seq(series, opt("base", "float"))),
    F("invert", "Transform", "pointwise 1/x; zero renders null", Seq(series)),
    F("round", "Transform", "pointwise rounding to a precision (HALF_UP, vs graphite-web's half-even — divergence only on exact ties at the precision digit)", Seq(series, opt("precision", "integer"))),
    F("cumulative", "Special", "alias of consolidateBy(series, \"sum\")", Seq(series)),
    F("minMax", "Transform", "per-series min-max scaling onto [0,1]; zero-range series render null", Seq(series)),
    F("stdev", "Calculate", "trailing population stddev over the last N samples per series", Seq(series, p("points", "integer"))),
    F("divideSeriesLists", "Combine", "pair two equal-length series lists positionally (sorted by name) and divide; unequal lengths error; one-sided instants serve null (graphite-web None-parity)", Seq(p("dividendSeriesList", "seriesList"), p("divisorSeriesList", "seriesList"))),
    F("timeSlice", "Transform", "values outside [start, end] render null datapoints", Seq(series, p("startSliceAt", "string"), opt("endSliceAt", "string"))),
    F("linearRegression", "Transform", "per-series least-squares fit drawn at the input instants", Seq(series)),
    F("keepLastValue", "Transform", "forward-fill onto a uniform grid", Seq(series, p("interval", "string"))),
    F("resample", "Transform", "linear interpolation onto a uniform grid", Seq(series, p("interval", "string"))),
    F("timeShift", "Transform", "evaluate the subtree shifted back, drawn at the requested instants", Seq(series, p("timeShift", "string"))),
    F("summarize", "Transform", "re-bucket each series onto a display interval", Seq(series, p("intervalString", "string"), opt("func", "string"))),
    F("hitcount", "Transform", "per-second rates converted to absolute hits per bucket, intervals prorated exactly across bucket boundaries (gap-capped)", Seq(series, p("intervalString", "string"))),
    // Calculate (window smoothing)
    F("movingAverage", "Calculate", "trailing time-window mean", Seq(series, p("windowSize", "string"))),
    F("movingSum", "Calculate", "trailing time-window sum", Seq(series, p("windowSize", "string"))),
    F("movingMax", "Calculate", "trailing time-window max", Seq(series, p("windowSize", "string"))),
    F("movingMin", "Calculate", "trailing time-window min", Seq(series, p("windowSize", "string"))),
    F("movingMedian", "Calculate", "trailing exact median over the last N samples (int) or time interval (string) — lower-median rank selection; render-sized bounded", Seq(series, p("windowSize", "string"))),
    F("movingWindow", "Calculate", "trailing time-window statistic (average|sum|max|min|stddev)", Seq(series, p("windowSize", "string"), opt("func", "string"))),
    F("holtWintersForecast", "Calculate", "triple-exponential forecast", Seq(series, opt("season", "integer"))),
    F("holtWintersConfidenceBands", "Calculate", "forecast ± k·deviation bands (two entries per series)", Seq(series, opt("season", "integer"))),
    F("holtWintersAberration", "Calculate", "deviation outside the confidence bands", Seq(series, opt("season", "integer"))),
    F("lttb", "Calculate", "largest-triangle-three-buckets decimation", Seq(series, opt("buckets", "integer"))),
    F("m4", "Calculate", "M4 min/max/first/last decimation", Seq(series, opt("buckets", "integer"))),
    // Filter Series
    F("highestMin", "Filter Series", "keep the k series with the highest per-series min", Seq(series, p("n", "integer"))),
    F("lowestMin", "Filter Series", "keep the k series with the lowest per-series min", Seq(series, p("n", "integer"))),
    F("highestMax", "Filter Series", "keep the k series with the highest max", Seq(series, p("n", "integer"))),
    F("highestAverage", "Filter Series", "keep the k series with the highest mean", Seq(series, p("n", "integer"))),
    F("highestCurrent", "Filter Series", "keep the k series with the highest last sample", Seq(series, p("n", "integer"))),
    F("lowestAverage", "Filter Series", "keep the k series with the lowest mean", Seq(series, p("n", "integer"))),
    F("lowestMax", "Filter Series", "keep the k series with the lowest max", Seq(series, p("n", "integer"))),
    F("lowestCurrent", "Filter Series", "keep the k series with the lowest last sample", Seq(series, p("n", "integer"))),
    F("averageAbove", "Filter Series", "keep series whose mean exceeds the threshold", Seq(series, p("n", "float"))),
    F("averageBelow", "Filter Series", "keep series whose mean is below the threshold", Seq(series, p("n", "float"))),
    F("maximumAbove", "Filter Series", "keep series whose max exceeds the threshold", Seq(series, p("n", "float"))),
    F("maximumBelow", "Filter Series", "keep series whose max is below the threshold", Seq(series, p("n", "float"))),
    F("currentAbove", "Filter Series", "keep series whose last sample exceeds the threshold", Seq(series, p("n", "float"))),
    F("currentBelow", "Filter Series", "keep series whose last sample is below the threshold", Seq(series, p("n", "float"))),
    F("minimumAbove", "Filter Series", "keep series whose min exceeds the threshold", Seq(series, p("n", "float"))),
    F("minimumBelow", "Filter Series", "keep series whose min is below the threshold", Seq(series, p("n", "float"))),
    F("mostDeviant", "Filter Series", "keep the k series with the highest population stddev", Seq(series, p("n", "integer"))),
    F("averageOutsidePercentile", "Filter Series", "keep series whose mean lies outside the [100-n, n] percentile band of the matched means", Seq(series, p("n", "float"))),
    F("removeEmptySeries", "Filter Series", "drop series with zero non-null datapoints in range", Seq(series)),
    F("grep", "Filter Series", "keep series whose name matches the regex", Seq(series, p("pattern", "string"))),
    F("exclude", "Filter Series", "drop series whose name matches the regex", Seq(series, p("pattern", "string"))),
    // Alias
    F("alias", "Alias", "replace the display name", Seq(series, p("newName", "string"))),
    F("aliasByNode", "Alias", "display name from a dot-node of the series name", Seq(series, p("nodes", "node"))),
    F("aliasByMetric", "Alias", "display name from the last dot-node of the series name", Seq(series)),
    F("aliasSub", "Alias", "regex substitution on the display name ($1 backreferences)", Seq(series, p("search", "string"), p("replace", "string"))),
    F("weightedAverage", "Combine", "node-paired weighted average of two series lists: sum(avg*w)/sum(w) per instant", Seq(p("seriesListAvg", "seriesList"), p("seriesListWeight", "seriesList"), p("nodes", "node"))),
    // Sorting
    F("sortByName", "Sorting", "reset the entry list to name order (drops an earlier sortBy ordering)", Seq(series)),
    F("sortByMaxima", "Sorting", "order the entry list by each series' max, largest first", Seq(series)),
    F("sortByTotal", "Sorting", "order the entry list by each series' sum, largest first", Seq(series)),
    F("sortByMinima", "Sorting", "order ascending by each series' min; series with max <= 0 are dropped", Seq(series)),
    F("limit", "Filter Series", "keep the first n series of the (possibly sorted) list", Seq(series, p("n", "integer"))),
    // Combine (wildcard collapse)
    F("sumSeriesWithWildcards", "Combine", "sum series whose names match after dropping the wildcard node positions", Seq(series, p("position", "node"))),
    F("averageSeriesWithWildcards", "Combine", "average series whose names match after dropping the wildcard node positions", Seq(series, p("position", "node"))),
    // Transform (batch 3)
    F("smartSummarize", "Transform", "summarize with buckets aligned to the request's from instead of the epoch snap", Seq(series, p("intervalString", "string"), opt("func", "string"))),
    F("integralByInterval", "Transform", "running total reset at each interval boundary", Seq(series, p("intervalUnit", "string"))),
    F("timeStack", "Transform", "one entry per shift i in [start, end]: the subtree evaluated i shift-units back, drawn at the requested instants", Seq(series, p("timeShiftUnit", "string"), opt("timeShiftStart", "integer"), opt("timeShiftEnd", "integer"))),
    // Combine (structured)
    F("applyByNode", "Combine", "evaluate the template per distinct node prefix ('%' substitutes the prefix); results union", Seq(series, p("nodeNum", "node"), p("templateFunction", "string"), opt("newName", "string"))),
    F("mapSeries", "Combine", "graphite's grouped list; grouping materializes inside reduceSeries (standalone rendering passes through)", Seq(series, p("mapNodes", "node"))),
    F("reduceSeries", "Combine", "pair series agreeing on every node but reduceNode, apply asPercent|divideSeries|diffSeries to the two matched keys; instants present on only one side serve a null datapoint (graphite-web None-parity)", Seq(p("seriesLists", "seriesList"), p("reduceFunction", "string"), p("reduceNode", "node"), p("reduceMatchers", "string"))),
    // Graph (presentation passthroughs — rendering is the dashboard's job)
    F("stacked", "Graph", "presentation tag (stacked draw mode); data passes through", Seq(series, opt("stackName", "string"))),
    F("secondYAxis", "Graph", "presentation tag (right-hand axis); data passes through", Seq(series)),
    F("drawAsInfinite", "Graph", "presentation tag (vertical-line draw mode); data passes through", Seq(series)),
    F("lineWidth", "Graph", "presentation tag (line width); data passes through", Seq(series, p("width", "float"))),
    F("dashed", "Graph", "presentation tag (dashed line); data passes through", Seq(series, opt("dashLength", "integer"))),
    F("color", "Graph", "presentation tag (series color); data passes through", Seq(series, p("theColor", "string"))),
    // Batch 4
    F("aggregate", "Combine", "general per-instant combiner (sum|avg|max|min|count|range|stddev) — graphite 1.1's editor default", Seq(series, p("func", "string"))),
    F("exponentialMovingAverage", "Calculate", "EMA with smoothing 2/(n+1) over each series' points (integer form; interval form needs fixed-step — summarize first)", Seq(series, p("windowSize", "integer"))),
    F("aggregateLine", "Calculate", "per-series horizontal line at the series' own stat (avg|sum|max|min|last|stddev)", Seq(series, opt("func", "string"))),
    F("delay", "Transform", "shift each series' values by N points (negative = forward); vacated points render null", Seq(series, p("steps", "integer"))),
    F("isNonNull", "Transform", "1 where a datapoint exists, 0 where null", Seq(series)),
    F("pow", "Transform", "pointwise x^n; undefined real results render null", Seq(series, p("factor", "float"))),
    F("squareRoot", "Transform", "pointwise square root; negative values render null", Seq(series)),
    F("interpolate", "Transform", "fill null datapoints linearly between nearest non-null neighbors; edges stay null", Seq(series)),
    F("substr", "Alias", "display name sliced to the dot-node range [start, stop); python-style negative indexes", Seq(series, p("start", "node"), opt("stop", "node"))),
    F("threshold", "Special", "constantLine with a legend label (color is presentation)", Seq(p("value", "float"), opt("label", "string"), opt("color", "string"))),
    F("verticalLine", "Special", "a single marker instant (drawing the vertical is the dashboard's job)", Seq(p("ts", "string"), opt("label", "string"))),
    F("identity", "Special", "epoch seconds on a uniform grid (default 60 s step)", Seq(p("name", "string"), opt("step", "integer"))),
    F("timeFunction", "Special", "alias of identity", Seq(p("name", "string"), opt("step", "integer"))),
    // Special
    F("constantLine", "Special", "reference line: the value drawn at from, midpoint, and until", Seq(p("value", "float"))),
    F("consolidateBy", "Special", "pick the final maxDataPoints consolidation statistic (average|sum|min|max|first|last)", Seq(series, p("consolidationFunc", "string"))),
    F("events", "Special", "event markers from the events store (tags ANDed; bare form serves all)", Seq(opt("tags", "string"))))

  private def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  private def fObj(f: F): String = {
    val params = f.params.map(pp =>
      s"""{"name": ${jStr(pp.name)}, "type": ${jStr(pp.ptype)}, """ +
        s""""required": ${pp.required}}""").mkString("[", ", ", "]")
    val sig = f.name + f.params.map(_.name).mkString("(", ", ", ")")
    s"""{"name": ${jStr(f.name)}, """ +
      s""""function": ${jStr(sig)}, "description": ${jStr(f.desc)}, """ +
      s""""group": ${jStr(f.group)}, "module": "graft.render", """ +
      s""""params": $params}"""
  }

  /** The full catalog body (graphite-web serves an OBJECT keyed by name). */
  lazy val catalogJson: String =
    all.map(f => s"${jStr(f.name)}: ${fObj(f)}").mkString("{", ", ", "}")

  /** One function's body, for `GET /functions/<name>`. */
  def one(name: String): Option[String] =
    all.find(_.name == name).map(fObj)
}
