package graft.operators

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

class TextScoringSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("bigramNll: scrambled word order scores worse than the natural order") {
    // corpus dominated by one natural sentence; the probe docs use the SAME
    // words (identical unigram distribution — a unigram NLL cannot tell
    // them apart) in natural vs scrambled order
    val natural = "the cat sat on the mat and the dog sat on the rug"
    val scrambled = "mat the on dog sat rug the the and cat on sat the"
    val corpus = (0L until 20L).map(i => (i, natural)) ++
      Seq((100L, natural), (101L, scrambled))
    val rep = TextScoring.bigramNll(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("nll_per_token")).toMap
    assert(rep(100L) < rep(101L),
      s"natural ${rep(100L)} should beat scrambled ${rep(101L)}")
    // in-distribution repetition scores identically to the corpus bulk
    assert(rep(100L) === rep(0L))
  }

  test("bigramNll: docs with <2 tokens are absent; interpolation never yields infinite NLL") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "alpha beta"), (4L, "gamma gamma"))
      .toDF("doc_id", "text")
    val rep = TextScoring.bigramNll(df)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("nll_per_token")).toMap
    assert(rep.keySet === Set(3L, 4L), "only multi-token docs are scored")
    // every bigram here is unique (cnt_bg/cnt_ctx = 1) but the unigram
    // backoff keeps p < 1 and finite
    rep.values.foreach(v => assert(!v.isInfinite && v > 0))
  }
}
