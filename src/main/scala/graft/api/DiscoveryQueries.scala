package graft.api

import graft.core.{DateTimeParser, GlobPattern, Granularity, OracleViews, Tables}
import graft.operators.Discovery
import org.apache.spark.sql.functions._

/** Discovery/search surface (reference: Elasticsearch-backed D1-D3 of
  * SURVEY §2.10) plus the plan-time scalar functions (glob, graphite
  * datetime grammar, resolution selection) exercised through queries. */
object DiscoveryQueries {

  /** D1 metric glob search. The regex below is produced by
    * [[GlobPattern.toAnchoredRegex]] at plan build time; the oracle embeds
    * the same translation. */
  private val globSearch = {
    val glob = "app.{click,view}.user_1?"
    val re = GlobPattern.toAnchoredRegex(glob) // ^app\.(click|view)\.user_1.$
    QDef(
      "q_glob_search",
      s"""WITH ${OracleViews.metricsCte}, ${OracleViews.catalogCte}
         |SELECT metric_name, unit FROM catalog
         |WHERE tenant_id = 'click' AND regexp_matches(metric_name, '$re')
         |ORDER BY metric_name""".stripMargin) { (s, dir) =>
      Discovery.globSearch(Tables.catalog(s, dir), "click", glob)
    }
  }

  /** D2/S9 token browse: the dotted-name hierarchy exploded to
    * (parent, token, is_leaf) rows. The oracle exploits the fixed 3-token
    * shape of the test namespace; the Spark side is fully general
    * (posexplode over split). */
  private val tokenBrowse = QDef(
    "q_token_browse",
    s"""WITH ${OracleViews.metricsCte},
       |names AS (SELECT DISTINCT metric_name FROM metrics),
       |lvls AS (
       |  SELECT '' AS parent, split_part(metric_name, '.', 1) AS token, FALSE AS is_leaf FROM names
       |  UNION ALL
       |  SELECT split_part(metric_name, '.', 1), split_part(metric_name, '.', 2), FALSE FROM names
       |  UNION ALL
       |  SELECT split_part(metric_name, '.', 1) || '.' || split_part(metric_name, '.', 2),
       |         split_part(metric_name, '.', 3), TRUE FROM names
       |)
       |SELECT DISTINCT parent, token, is_leaf FROM lvls
       |ORDER BY parent, token, is_leaf""".stripMargin) { (s, dir) =>
    Discovery.tokens(Tables.catalog(s, dir))
      .orderBy("parent", "token", "is_leaf")
  }

  /** D3 event search: time range + tag regex over the raw events table. */
  private val eventSearch = QDef(
    "q_event_search",
    """SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, props
      |FROM events
      |WHERE epoch_ms(ts) >= 1704844800000 AND epoch_ms(ts) < 1705708800000
      |  AND regexp_matches(props, '"k": 1[0-9]\}')
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    Discovery.eventSearch(
      ev.withColumn("ts_ms", Tables.tsMsCol(ev)), 1704844800000L, 1705708800000L, "\"k\": 1[0-9]\\}")
      .select("event_id", "ts_ms", "event_type", "props")
      .orderBy("event_id")
  }

  /** Gap-based sessionization over the raw event stream (24h gap):
    * per-user session summaries with exact-DECIMAL value sums. See
    * [[graft.operators.Sessionize]]. */
  private val sessionize = {
    val gapMs = 86400000L
    QDef(
      "q_sessionize",
      s"""WITH e AS (
         |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value FROM events
         |),
         |m AS (
         |  SELECT user_id, ts_ms, event_id, value,
         |         lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
         |  FROM e
         |),
         |s AS (
         |  SELECT user_id, ts_ms, value,
         |         SUM(CASE WHEN prev IS NULL OR ts_ms - prev > $gapMs THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
         |                 ROWS UNBOUNDED PRECEDING) AS session_no
         |  FROM m
         |)
         |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
         |       min(ts_ms) AS session_start, max(ts_ms) AS session_end,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       max(ts_ms) - min(ts_ms) AS duration_ms,
         |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
         |FROM s GROUP BY user_id, session_no
         |ORDER BY user_id, session_no""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      graft.operators.Sessionize.sessions(
          ev.select(col("user_id"), Tables.tsMsCol(ev).as("ts_ms"),
            col("event_id"), col("value")),
          gapMs)
        .orderBy("user_id", "session_no")
    }
  }

  /** [[sessionize]] served by Spark's NATIVE session_window aggregation
    * ([[graft.operators.Sessionize.sessionsNative]]) — SAME oracle: the
    * built-in's boundary-INCLUSIVE window merge equals the lag
    * formulation's `diff ≤ gap` rule exactly, and the driver hash-proves
    * it (the boundary cases are pinned in SessionizeSpec). */
  private val sessionizeNative = QDef(
    "q_sessionize_native",
    sessionize.oracle.get) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    graft.operators.Sessionize.sessionsNative(
        ev.select(col("user_id"), Tables.tsMsCol(ev).as("ts_ms"),
          col("event_id"), col("value")),
        gapMs = 86400000L)
      .orderBy("user_id", "session_no")
  }


  /** F1 graphite datetime grammar: the parsed `from`/`until` literals feed
    * the range filter — a daily count per tenant between
    * parse("00:00_20240110-5d") = Jan 5 and parse("00:00_20240110+10d") =
    * Jan 20 (both UTC). The oracle pins the equivalent epoch millis. */
  private val datetimeRange = {
    val from = DateTimeParser.parseMillis("00:00_20240110-5d")
    val to = DateTimeParser.parseMillis("00:00_20240110+10d")
    require(from == 1704412800000L, s"parser gave $from for Jan 5")
    require(to == 1705708800000L, s"parser gave $to for Jan 20")
    QDef(
      "q_datetime_range",
      s"""WITH ${OracleViews.metricsCte}
         |SELECT tenant_id, (ts_ms // 86400000) * 86400000 AS day_ms,
         |       COUNT(*) AS n
         |FROM metrics WHERE ts_ms >= $from AND ts_ms < $to
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.metricsRange(s, dir, Some((from, to)))
        .groupBy(col("tenant_id"),
          Tables.bucketMs(col("ts_ms"), Granularity.MIN_1440).as("day_ms"))
        .agg(count(lit(1)).as("n"))
        .orderBy("tenant_id", "day_ms")
    }
  }

  /** O3/§4.1 resolution selection: the three algorithms evaluated on pinned
    * cases; the oracle is a hand-computed VALUES table derived from the
    * reference's arithmetic (Granularity.java:248-339), so a selection bug
    * here mismatches. now = 2024-01-31 00:00 UTC for the retention skip. */
  private val resolutionSelect = {
    val now = 1706659200000L
    val jan3 = 1704240000000L; val jan23 = 1705968000000L
    val jan29 = now - 2L * 86400000L
    import Granularity._
    val cases: Seq[(Int, String, Long, Long, Int)] = Seq(
      (1, "GEOMETRIC", jan3, jan23, 200),
      (2, "GEOMETRIC", jan3, jan23, 5000),
      (3, "GEOMETRIC", jan3, jan23, 10),
      (4, "GEOMETRIC", jan29, now, 500),
      (5, "GEOMETRIC", jan29, now, 100),
      (6, "LINEAR", jan29, now, 500),
      (7, "LESSTHANEQUAL", jan29, now, 500),
      (8, "LESSTHANEQUAL", jan3, jan23, 115))
    val algoOf = Map[String, SelectionAlgorithm](
      "GEOMETRIC" -> Geometric, "LINEAR" -> Linear, "LESSTHANEQUAL" -> LessThanEqual)
    QDef(
      "q_resolution_select",
      """SELECT * FROM (VALUES
        |  (1, 'GEOMETRIC', 200, '240m'),
        |  (2, 'GEOMETRIC', 5000, '60m'),
        |  (3, 'GEOMETRIC', 10, '1440m'),
        |  (4, 'GEOMETRIC', 500, '5m'),
        |  (5, 'GEOMETRIC', 100, '20m'),
        |  (6, 'LINEAR', 500, '5m'),
        |  (7, 'LESSTHANEQUAL', 500, '20m'),
        |  (8, 'LESSTHANEQUAL', 115, '1440m')
        |) AS t(case_id, algo, points, granularity)
        |ORDER BY case_id""".stripMargin) { (s, _) =>
      import s.implicits._
      cases.map { case (id, algo, f, t, pts) =>
        (id, algo, pts,
          Granularity.granularityFromPointsInInterval(
            f, t, pts, algoOf(algo), nowMillis = now).name)
      }.toDF("case_id", "algo", "points", "granularity")
        .orderBy("case_id")
    }
  }

  val defs: Seq[QDef] = Seq(globSearch, tokenBrowse, eventSearch, sessionize,
    sessionizeNative,
    datetimeRange, resolutionSelect)
}
