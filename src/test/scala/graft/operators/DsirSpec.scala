package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextScoring.dsirWeights]] + [[Sampling.gumbelTopK]] — DSIR importance
  * resampling: weights must equal the local add-1-smoothed log-ratio model,
  * and the Gumbel draw must be a deterministic, weight-monotone-in-
  * expectation top-k that never depends on layout. */
class DsirSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, Boolean)]) =
    rows.toDF("doc_id", "text", "is_t")

  /** Local reference: same formula, raw double ln per term rounded to 9
    * decimals (the snap), exact sum via BigDecimal. */
  private def localWeights(rows: Seq[(Long, String, Boolean)]): Map[Long, Double] = {
    // split(norm, " ") on an empty normalized text yields [""] in Spark
    // AND DuckDB; the engine (and its oracle) filter that phantom token,
    // so the reference model excludes it too — an empty-normalizing doc
    // contributes nothing to vocab or totals and gets no weight row
    val toks = rows.map { case (id, t, it) =>
      (id, it, t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ", -1).toSeq.filter(_.nonEmpty))
    }
    val all = toks.flatMap(x => x._3)
    val cntR = all.groupBy(identity).map { case (w, xs) => w -> xs.size }
    val cntT = toks.filter(_._2).flatMap(_._3)
      .groupBy(identity).map { case (w, xs) => w -> xs.size }
    val (totR, totT, v) = (all.size.toDouble,
      toks.filter(_._2).flatMap(_._3).size.toDouble, cntR.size.toDouble)
    toks.filter(_._3.nonEmpty).map { case (id, _, ws) =>
      val sum = ws.map { w =>
        val term = math.log(
          ((cntT.getOrElse(w, 0) + 1) / (totT + v)) /
            ((cntR(w) + 1) / (totR + v)))
        BigDecimal(term).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> sum.toDouble
    }.toMap
  }

  test("weights ≡ local add-1 log-ratio model, term-snapped") {
    val rows = Seq(
      (1L, "alpha beta alpha gamma", true),
      (2L, "alpha beta beta", true),
      (3L, "delta epsilon delta zeta", false),
      (4L, "alpha delta", false),
      (5L, "", false))
    val got = TextScoring.dsirWeights(docsDf(rows), col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = localWeights(rows)
    assert(got.keySet === want.keySet)
    for ((id, w) <- want) assert(got(id) === w, s"doc $id")
  }

  test("target-like docs score above anti-target docs") {
    val rows = Seq(
      (1L, "wiki wiki science article", true),
      (2L, "wiki science review article", true),
      (3L, "wiki science article notes", false), // target-like pool doc
      (4L, "spam casino pills click", false))    // anti-target pool doc
    val got = TextScoring.dsirWeights(docsDf(rows), col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(3L) > got(4L))
    assert(got(3L) > 0.0) // more target-like than corpus average
    assert(got(4L) < 0.0)
  }

  test("gumbelTopK: k rows, valid ranks, layout-invariant") {
    val df = (1L to 200L).map(i => (i, (i % 17).toDouble / 7.0))
      .toDF("doc_id", "w")
    val a = Sampling.gumbelTopK(df, "doc_id", "w", 25)
    assert(a.count() === 25)
    val ranks = a.select("rk").as[Long].collect().sorted
    assert(ranks === (1L to 25L).toArray)
    val b = Sampling.gumbelTopK(df.repartition(13), "doc_id", "w", 25)
    assert(a.select("doc_id", "rk").collect().toSet ===
      b.select("doc_id", "rk").collect().toSet)
  }

  test("gumbelTopK: overwhelming weight is always drawn; k ≥ n keeps all") {
    val df = ((1L to 30L).map(i => (i, 0.0)) :+ (99L, 1e6)).toDF("doc_id", "w")
    val top = Sampling.gumbelTopK(df, "doc_id", "w", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(top.contains(99L))
    assert(Sampling.gumbelTopK(df, "doc_id", "w", 100).count() === 31)
    intercept[IllegalArgumentException](Sampling.gumbelTopK(df, "doc_id", "w", 0))
  }

  test("gumbelTopK: equal weights draw a hash-uniform (id-determined) subset") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("doc_id", "w")
    val s1 = Sampling.gumbelTopK(df, "doc_id", "w", 10)
      .select("doc_id").as[Long].collect().toSet
    // deterministic rerun
    val s2 = Sampling.gumbelTopK(df, "doc_id", "w", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    assert(s1.size === 10)
  }
}
