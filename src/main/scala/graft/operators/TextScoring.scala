package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-language-model quality scoring for training-data pipelines.
  *
  * [[bigramNll]] is the Jelinek-Mercer interpolated bigram NLL — one rung
  * up the perplexity-proxy ladder from the unigram NLL
  * ([[graft.api.PipelineQueries2]] q_text_unigram_nll): each in-context
  * token scores −ln(λ·c(prev,w)/c(prev·) + (1−λ)·c(w)/N), backing off to
  * the unigram model for unseen continuations. Catches word-salad the
  * unigram score cannot: common words in impossible ORDER score high here.
  *
  * Scale shape: the token stream fans to three equi-joins (bigram count,
  * context count, unigram count), each co-partitioned on its own key —
  * the honest relational LM-scoring shape. Model tables are UNHINTED: a
  * 100 TB corpus's bigram table dwarfs its vocabulary, so whether any side
  * broadcasts is AQE's runtime call. Per-token NLL terms are snapped to
  * DECIMAL(18,9) before the per-doc sum (the tfidf/unigram oracle-parity
  * convention: snapped terms sum exactly in any partition order). */
object TextScoring {

  /** Per-document interpolated bigram NLL: (doc_id, n_bigrams_scored,
    * nll_sum, nll_per_token). Docs with fewer than two tokens have no
    * bigram and are absent (as zero-token docs are absent from the
    * unigram report). */
  def bigramNll(docs: DataFrame, lambda: Double = 0.75): DataFrame = {
    val sp = docs
      .select(col("doc_id"),
        explode(TF.wordKGrams(TF.words(col("text")), 2)).as("bg"))
      .withColumn("prev", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val cbg = sp.groupBy("bg").agg(count(lit(1)).as("cnt_bg"))
    val cctx = sp.groupBy("prev").agg(count(lit(1)).as("cnt_ctx"))
    val w = docs.select(explode(TF.words(col("text"))).as("word"))
    val freq = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val tot = broadcast(freq.agg(sum("cnt").cast("double").as("total")))
    sp.join(cbg, "bg").join(cctx, "prev")
      .join(freq, col("w2") === col("word")).crossJoin(tot)
      .withColumn("nll",
        (-log(lit(lambda) * (col("cnt_bg") / col("cnt_ctx")) +
          lit(1.0 - lambda) * (col("cnt") / col("total"))))
          .cast(DecimalType(18, 9)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams_scored"),
        sum(col("nll")).cast("double").as("nll_sum"))
      .withColumn("nll_per_token", col("nll_sum") / col("n_bigrams_scored"))
  }
}
