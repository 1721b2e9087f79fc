package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Multinomial Naive Bayes language classifier, trained AND applied
    * relationally — the classic lightweight quality/routing annotator of a
    * curation pipeline (the fastText-style supervised labeler's exact
    * precursor; McCallum & Nigam 1998). No model file, no UDF: the model IS
    * three aggregate tables and scoring is one equi-join.
    *
    * Train on `train` (columns doc_id, text, plus the `labelCol` class):
    * per-class token counts with add-1 smoothing over the train vocabulary,
    * class priors from document counts. Score `score` (doc_id, text): each
    * in-vocabulary token votes ln((c(w,k)+1)/(c(k)+V)) for every class k;
    * out-of-vocabulary tokens are ignored (they shift every class equally
    * under shared smoothing, so dropping them preserves the argmax and
    * keeps the score table dense). Per-token terms and the prior snap to
    * DECIMAL(18,9) before the exact decimal sum (the unigram-NLL
    * oracle-parity convention — partition-order invariant), so the argmax
    * is total: ties break toward the smallest class label.
    *
    * Output: (doc_id, pred_label, n_scored_tokens, score) — one row per
    * scored doc with ≥1 in-vocabulary token (zero-token docs are absent,
    * as in the NLL reports); `score` is the winning class's joint
    * log-likelihood as a scalar double.
    *
    * Scale shape: the model tables aggregate map-side off one token pass
    * over the train split; the dense (word × class) term table is V·K rows
    * — K is single digits, so it stays joinable-by-AQE-broadcast far past
    * 100 TB corpora (vocabulary grows ~log of corpus size). Scoring is one
    * unhinted equi-join on word + one per-doc aggregation: the score split
    * shuffles once. Never a per-class pass over the corpus. */
  def naiveBayes(train: DataFrame, score: DataFrame,
      labelCol: String = "lang"): DataFrame = {
    val dec = DecimalType(18, 9)
    // drop the phantom "" token an empty-normalizing doc yields (the
    // bm25/index convention) — it would enter V and the class totals and
    // give zero-token docs a prediction
    val tokens = train.select(col(labelCol).as("label"),
      explode(TF.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val wc = tokens.groupBy("label", "word").agg(count(lit(1)).as("cnt_wk"))
    // ONE token pass (r14 opt, guide §2.3 aggregate-before-shuffle): the
    // class totals and the vocabulary are derivable from the already-
    // aggregated (label, word) counts — Σ cnt_wk per label is exactly the
    // per-class token count, and wc's word set IS the train vocabulary
    // (every train token has cnt_wk ≥ 1 for its own class) — so neither
    // needs its own scan+explode over the raw token stream. A fully sparse
    // scoring restructure (present-pair join + closed-form missing-pair
    // mass) was ALSO built and measured this round: 1.58× SLOWER at bench
    // (interleaved A/B vs 1.05–1.11 control; jobs 18→23) — the extra
    // joins/aggregations cost more AQE stage rounds than the K-way scoring
    // fanout saves, so the dense V×K term table stays (it remains
    // AQE-broadcastable far past 100 TB corpora; vocabulary grows ~log of
    // corpus size and K is single digits).
    val classTotals = wc.groupBy("label").agg(sum("cnt_wk").as("cnt_k"))
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val nTrain = broadcast(priors.agg(sum("n_docs").as("n_train")))
    val vocab = wc.select("word").distinct()
    val vSize = broadcast(vocab.agg(count(lit(1)).as("v_size")))
    // dense V×K term table: absent (word, class) pairs still carry the
    // smoothed floor ln(1/(c(k)+V)) — scoring then needs only ONE join
    val terms = vocab.crossJoin(classTotals).crossJoin(vSize)
      .join(wc, Seq("label", "word"), "left")
      .select(col("word"), col("label"),
        log((coalesce(col("cnt_wk"), lit(0L)) + lit(1)) /
          (col("cnt_k") + col("v_size"))).cast(dec).as("term"))
    val priorTerm = priors.crossJoin(nTrain)
      .select(col("label"),
        log(col("n_docs") / col("n_train")).cast(dec).as("prior"))
    val scored = score
      .select(col("doc_id"), explode(TF.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(terms, "word")
      .groupBy(col("doc_id"), col("label"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term")).as("term_sum"))
      .join(broadcast(priorTerm), "label")
      .withColumn("total", col("term_sum") + col("prior"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("total").desc, col("label").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("n_terms").as("n_scored_tokens"),
        col("total").cast("double").as("score"))
  }

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
      .filter(col("word") =!= "") // no phantom "" in the backoff total N
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

  /** EXACT heavy hitters without a full-cardinality shuffle — the two-pass
    * sketch-then-verify census for key spaces too large to group (every
    * token/URL/ngram of a 100 TB corpus): pass 1 summarizes the keys
    * through the mergeable Misra–Gries aggregator
    * ([[graft.agg.MisraGriesAggregator]]) at `capacityCap`, measuring N
    * in the same pass; N/capacityCap < minCount is then verified — the
    * MG deviation bound under it guarantees every true heavy hitter
    * survives as a candidate; pass 2 exact-counts ONLY the bounded
    * candidate set via a broadcast semi-join and filters to `minCount`. The
    * output is therefore exact and layout-invariant even though the
    * sketch contents aren't: extra candidates are filtered by their exact
    * counts, missing ones are impossible. Only O(m) state ever crosses
    * the wire; the full key space never shuffles.
    *
    * `capacityCap` bounds driver/executor memory; a minCount too small
    * for the cap (m would need to exceed it) throws rather than silently
    * weakening the guarantee. Output: (key, cnt) with cnt ≥ minCount. */
  def heavyHitters(df: DataFrame, key: Column, minCount: Long,
      capacityCap: Int = 100000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val keyed = df.select(key.cast("string").as("key"))
      .filter(col("key").isNotNull)
    val spark = df.sparkSession
    import spark.implicits._
    // ONE sketch pass at full capacity returns (candidates, N) together —
    // sketching wider than the bound needs only tightens it, and the
    // guarantee is validated from the N the same pass measured. Two
    // corpus passes total (sketch, exact-verify); the upstream projection
    // recomputes per pass, the registry's accepted fan-out tradeoff.
    val (candidates, n) = keyed.as[String]
      .select(new graft.agg.MisraGriesAggregator(capacityCap).toColumn)
      .head()
    val mNeeded = n / minCount + 1
    require(mNeeded <= capacityCap,
      s"minCount=$minCount over $n rows needs MG capacity $mNeeded > " +
        s"cap $capacityCap — raise minCount or capacityCap")
    val candDf = candidates.toSeq.toDF("key")
    keyed.join(broadcast(candDf), Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its tokens are under the TARGET distribution
    * (the rows where `isTarget` holds — the Wikipedia-like slice you want
    * more of) than under the RAW corpus distribution. Both are add-1-
    * smoothed unigram bag-of-words models over the shared corpus
    * vocabulary, fit in ONE token pass (the raw count and the
    * target-conditional count are two aggregates of the same census);
    * per-token terms ln(p_target(w) / p_raw(w)) snap to DECIMAL(18,9)
    * before the exact per-doc sum (the unigram-NLL oracle-parity
    * convention). Every token seen anywhere in the corpus has a raw count
    * ≥ 1 and a smoothed target probability > 0, so no term is infinite.
    *
    * Output: (doc_id, n_tokens_scored, logw) for every doc with ≥ 1
    * token — logw > 0 reads "more target-like than the corpus average".
    * Compose with [[Sampling.gumbelTopK]] for the paper's Gumbel-top-k
    * resampling step. Scale shape: one token census with map-side
    * partials, one UNHINTED vocab equi-join (AQE decides broadcast, as
    * in the NLL scorers), one broadcast 1-row totals frame. */
  def dsirWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val base = docs.select(col("doc_id"), isTarget.as("__t"),
      explode(TF.words(col("text"))).as("word"))
      .filter(col("word") =!= "") // zero-token docs stay absent, per contract
    val counts = base.groupBy("word").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("cnt_t"))
    val tot = broadcast(counts.agg(
      sum("cnt_r").cast("double").as("tot_r"),
      sum("cnt_t").cast("double").as("tot_t"),
      count(lit(1)).cast("double").as("vocab")))
    base.join(counts, "word").crossJoin(tot)
      .withColumn("term",
        log(((col("cnt_t") + 1) / (col("tot_t") + col("vocab"))) /
          ((col("cnt_r") + 1) / (col("tot_r") + col("vocab"))))
          .cast(DecimalType(18, 9)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens_scored"),
        sum(col("term")).cast("double").as("logw"))
  }

  /** Okapi BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
    * relevance; the scoring function behind Lucene/Elasticsearch — the
    * engine the reference delegates its discovery tier to,
    * blueflood-elasticsearch `ElasticIO.java`): score every document
    * against a small bag-of-terms query and keep the top `k`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the Lucene variant
    * whose +1 keeps idf positive even for terms in most documents.
    *
    * Oracle parity: tf/df/dl/N/Σdl are exact integer aggregates; each
    * per-term score is one scalar IEEE double expression over them
    * (identical operand order on both sides), snapped to DECIMAL(18,9)
    * before the per-doc sum — the tfidf/NLL convention, so the sum is
    * partition-order invariant and the (score DESC, doc_id) top-k is
    * total. |score| ≤ terms·idfmax ≈ 10² keeps the snap far inside the
    * 2^53 decimal→double-exact window.
    *
    * Scale shape: the only corpus-wide passes are the token explode and
    * two map-side-combining aggregations (per-doc length, per-(doc,term)
    * tf restricted to the ≤ tens of query terms — the `isin` filter prunes
    * the exploded stream before anything shuffles). The df and corpus-stat
    * tables are ≤ |terms| and 1 row — broadcast; the dl join co-partitions
    * with tf on doc_id. The top-k is TakeOrderedAndProject: per-partition
    * heaps, never a global sort. Nothing here holds state proportional to
    * the vocabulary or the corpus on any single node. */
  /** Query terms normalized the way [[graft.functions.TextFunctions.words]]
    * normalizes the corpus (lowercase, punctuation → space), so "Dup" or
    * "stream," match the token stream instead of silently scoring zero —
    * the [[phraseSearch]] convention. */
  private def normTerms(terms: Seq[String]): Seq[String] =
    terms.flatMap(_.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ")).filter(_.nonEmpty).distinct

  def bm25TopK(docs: DataFrame, idCol: Column, textCol: Column,
      terms0: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = normTerms(terms0)
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val w = docs.select(idCol.as("doc_id"), explode(TF.words(textCol)).as("word"))
      .filter(col("word") =!= "")
    val dl = w.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val st = broadcast(dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum("dl").cast("double").as("sum_dl")))
    val qw = w.filter(col("word").isin(terms: _*))
    val tf = qw.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // df falls out of tf for free (one row per containing doc) — no third
    // corpus pass
    val dfr = broadcast(tf.groupBy("word").agg(count(lit(1)).as("df")))
    scoreBm25(tf.join(dfr, "word").join(dl, "doc_id").crossJoin(st), k1, b, k)
  }

  /** The shared BM25 scoring tail: `joined` carries (doc_id, tf, df, dl,
    * n_docs, sum_dl) with exact-integer counts and double corpus stats;
    * per-term scores snap to DECIMAL(18,9), the per-doc sum is exact, the
    * top-k is TakeOrderedAndProject. Single source of the score algebra so
    * the inline and index-serving paths CANNOT drift. */
  private def scoreBm25(joined: DataFrame, k1: Double, b: Double,
      k: Int): DataFrame = {
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val dfD = col("df").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val termScore = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / (col("sum_dl") / col("n_docs"))))
    joined
      .withColumn("ts", termScore.cast(DecimalType(18, 9)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"),
        sum(col("ts")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  private def wordBucket(word: Column, nBuckets: Int): Column =
    pmod(xxhash64(word), lit(nBuckets.toLong)).cast("int")

  /** Persisted inverted index — the artifact that makes BM25 a SERVING
    * operation instead of a corpus scan (the Lucene segment analog;
    * mirror of [[Similarity.writeIvfIndex]]'s build-once / prune-on-read
    * lifecycle). `path/postings` holds (word, doc_id, tf, dl) PARTITIONED
    * BY (batch_id, word-hash bucket), so a query's terms reduce the read
    * to their buckets at the parquet-pruning layer — ~|terms|/nBuckets of
    * the index, regardless of corpus size. Document length is
    * DENORMALIZED into the postings (the Lucene norms trick): serving
    * never joins a corpus-sized doclen table. `path/stats` carries
    * (n_docs, sum_dl, n_buckets) — ONE ROW PER APPENDED BATCH; the reader
    * sums them and takes nBuckets from them so writer and reader cannot
    * disagree on the bucket function.
    *
    * This is a FULL REBUILD: any existing index at `path` — including
    * batches appended by [[appendTextIndex]] — is removed first, so a
    * rebuild can never leave stale batch partitions summing into the
    * serve. */
  def writeTextIndex(docs: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    val conf = docs.sparkSession.sparkContext.hadoopConfiguration
    for (sub <- Seq("postings", "stats")) {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      p.getFileSystem(conf).delete(p, true)
    }
    appendTextIndex(docs, path, batchId = 0L, nBuckets = nBuckets)
  }

  /** Fold one document batch into the index — INCREMENTAL maintenance,
    * the [[graft.streaming.DocumentStream]] discipline applied to search:
    * the batch's postings and stats land under their own `batch_id=N`
    * partition with overwrite, so a foreachBatch at-least-once REPLAY
    * rewrites the same partition instead of double-counting, and no
    * existing batch is ever read or rewritten (per-batch cost is
    * O(|batch|), never O(|corpus|)). The serving read discovers
    * batch_id/wb as nested partitions, so term-bucket pruning spans every
    * batch; per-term df and the summed corpus stats stay exact because
    * postings and stats rows are disjoint across batches. Feed the stream
    * through [[graft.operators.Dedup.streamingDedupKeepFirst]] (or any
    * exact-once keying) first — a doc_id re-ingested in a LATER batch
    * would legitimately count twice, exactly as two copies in a corpus
    * would. `nBuckets` must match the index's existing batches; the
    * reader enforces it. */
  def appendTextIndex(docs: DataFrame, path: String, batchId: Long,
      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // guard against appending next to a flat pre-batch layout (a bare
    // wb=* child under postings/, or stats parquet files directly under
    // stats/ with no batch_id level): Spark partition discovery would see
    // conflicting partition columns and make the whole index unreadable
    // AFTER the append succeeded — fail the write instead
    val conf = docs.sparkSession.sparkContext.hadoopConfiguration
    for (sub <- Seq("postings", "stats")) {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        n.startsWith("wb=") || (st.isFile && n.endsWith(".parquet"))
      })
        throw new IllegalStateException(
          s"$path/$sub has a flat pre-batch layout (no batch_id level); " +
            "rebuild with writeTextIndex before appending")
    }
    val w = docs.select(col("doc_id"), explode(TF.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
    // one tokenization pass serves the postings join AND the stats write
    // (dl is one row per doc — tiny to materialize)
    val dl = w.groupBy("doc_id").agg(count(lit(1)).as("dl")).localCheckpoint()
    val tf = w.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // stats FIRST: if the process dies between the two writes, the index
    // under-serves (the batch's docs are counted in the corpus stats but
    // their postings are absent — scores dampen slightly) instead of
    // over-serving with df/tf rows whose mass is missing from n_docs /
    // sum_dl (inflated idf, skewed length norm). A replay of the same
    // batchId repairs either way (both writes are per-batch overwrites).
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"),
        lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$path/stats/batch_id=$batchId")
    tf.join(dl, "doc_id")
      .withColumn("wb", wordBucket(col("word"), nBuckets))
      .select("wb", "word", "doc_id", "tf", "dl")
      .write.mode("overwrite").partitionBy("wb")
      .parquet(s"$path/postings/batch_id=$batchId")
  }

  /** Serve BM25 top-k from a persisted [[writeTextIndex]] index: the
    * postings scan is statically pruned to the query terms' hash-bucket
    * partitions (plus a pushed `word IN` filter inside them), df falls
    * out of the pruned postings, and the score algebra is byte-identical
    * to [[bm25TopK]] (shared [[scoreBm25]]). Nothing here reads text or
    * scales with corpus size except the ≤|terms| pruned posting lists. */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      terms0: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = normTerms(terms0)
    require(terms.nonEmpty, "bm25TopKFromIndex needs at least one query term")
    // one row per appended batch: corpus stats are their exact sums
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"),
        min("n_buckets").as("nb_min"), max("n_buckets").as("nb_max"))
      .head()
    val nDocs = stats.getAs[Long]("n_docs")
    // an index whose every appended batch held zero tokens is a degenerate
    // artifact (sum_dl is NULL, postings are empty dirs): fail with intent
    // instead of NPE-ing in the unbox below
    if (nDocs == 0L || stats.isNullAt(stats.fieldIndex("sum_dl")))
      throw new IllegalStateException(
        s"text index at $path holds no indexed tokens (n_docs=$nDocs) — " +
          "rebuild with writeTextIndex over a non-empty corpus")
    val sumDl = stats.getAs[Long]("sum_dl")
    val nBuckets = stats.getAs[Int]("nb_max")
    require(stats.getAs[Int]("nb_min") == nBuckets,
      "index batches were written with different nBuckets — rebuild")
    // evaluate the bucket function through Spark itself so it is the
    // writer's function by construction
    import spark.implicits._
    val buckets = terms.toDF("word")
      .select(wordBucket(col("word"), nBuckets)).distinct()
      .collect().map(_.getInt(0))
    val post = spark.read.parquet(s"$path/postings")
      .filter(col("wb").isin(buckets.toSeq: _*) &&
        col("word").isin(terms: _*))
    val dfr = broadcast(post.groupBy("word").agg(count(lit(1)).as("df")))
    val joined = post.join(dfr, "word")
      .withColumn("n_docs", lit(nDocs).cast("double"))
      .withColumn("sum_dl", lit(sumDl).cast("double"))
    scoreBm25(joined, k1, b, k)
  }

  /** Gopher-family repetition quality signals (Rae et al. 2021, Table A1's
    * repetition filters) — the standard curation gate for
    * degenerate/boilerplate text that length/stopword facets miss: per
    * document,
    *
    *   top-n-gram char fraction  = occurrences(most frequent n-gram) ·
    *                               chars(n-gram) / chars(doc)
    *   dup-n-gram char mass      = Σ over n-grams occurring ≥ 2 of
    *                               occurrences · chars(n-gram) / chars(doc)
    *
    * over the engine's normalized text ([[graft.functions.TextFunctions
    * .normalized]]). The dup signal counts OCCURRENCE MASS (every repeat
    * occurrence's characters), not the paper's covered-character variant —
    * mass is monotone in it, needs no per-doc interval union, and keeps the
    * whole operator three relational aggregates (an exact covered-chars
    * variant would compose [[Dedup]]'s interval-union machinery). Ties for
    * the top gram break lexicographically, so every fraction is a single
    * deterministic division of exact integers — hash-oracle-able with no
    * snapping.
    *
    * Scale shape: one codegen k-gram pass + one map-side-combining
    * (doc, gram) count per requested n — all passes independent and linear;
    * the top-1 rank compiles to WindowGroupLimit (partitions keep local
    * top-1); the per-n one-row-per-doc results join back on doc_id.
    * Docs shorter than n words (no grams) score 0.0, as does a doc with no
    * repeated n-gram. */
  def repetitionSignals(docs: DataFrame, topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 10)): DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
    require((topNs ++ dupNs).forall(_ >= 2), "n-gram sizes must be >= 2")
    def gramCounts(n: Int) = docs.select(col("doc_id"),
        explode(TF.wordKGrams(TF.words(col("text")), n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val lens = docs.select(col("doc_id"),
      length(TF.normalized(col("text"))).cast("double").as("__len"))
    val tops = topNs.map { n =>
      val w = Window.partitionBy("doc_id").orderBy(col("c").desc, col("g"))
      gramCounts(n)
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("doc_id"),
          (col("c") * length(col("g"))).cast("double").as(s"__top$n"))
    }
    val dups = dupNs.map { n =>
      gramCounts(n).filter(col("c") >= 2)
        .groupBy("doc_id")
        .agg(sum(col("c") * length(col("g"))).cast("double").as(s"__dup$n"))
    }
    (tops ++ dups).foldLeft(lens)((acc, f) => acc.join(f, Seq("doc_id"), "left"))
      .select(col("doc_id") +: (
        topNs.map(n => coalesce(col(s"__top$n") / col("__len"), lit(0.0))
          .as(s"top${n}gram_frac")) ++
        dupNs.map(n => coalesce(col(s"__dup$n") / col("__len"), lit(0.0))
          .as(s"dup${n}gram_frac"))): _*)
  }

  /** PAPER-EXACT covered-character duplicated-n-gram fraction — the
    * Rae et al. covered variant that [[repetitionSignals]]'s dup columns
    * approximate by occurrence mass: the fraction of normalized characters
    * lying inside AT LEAST ONE occurrence of an n-gram that occurs ≥ 2
    * times in the document. Overlapping occurrences count their characters
    * once — the per-doc interval-union discipline of the span-removal
    * rewrite ([[Dedup]]'s merged-intervals shape), in character space:
    * each duplicated-gram occurrence spans [start(first word),
    * end(last word)); a running max-end window merges overlaps exactly
    * (all integer arithmetic, so the single closing division is the only
    * double — hash-oracle-able unsnapped).
    *
    * Scale shape: one offsets window + one gram count + two co-partitioned
    * joins back on (doc_id, position) + one union window — everything
    * keyed by doc_id, linear, no cross-doc shuffle beyond the counts. */
  def dupNgramCoverage(docs: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val toks = docs.select(col("doc_id"),
      posexplode(TF.words(col("text"))).as(Seq("pos", "w")))
    val wOff = Window.partitionBy("doc_id").orderBy("pos")
    val offs = toks
      .withColumn("start", coalesce(
        sum(length(col("w")) + 1).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)).cast("long"),
        lit(0L)))
      .withColumn("end", col("start") + length(col("w")))
    val grams = docs.select(col("doc_id"),
      posexplode(TF.wordKGrams(TF.words(col("text")), n))
        .as(Seq("gpos", "g")))
    val dupOcc = grams.join(
      grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("doc_id", "g"),
      Seq("doc_id", "g"))
    val iv = dupOcc
      .join(offs.select(col("doc_id"), col("pos").as("gpos"),
        col("start")), Seq("doc_id", "gpos"))
      .join(offs.select(col("doc_id"),
        (col("pos") - (n - 1)).as("gpos"), col("end")), Seq("doc_id", "gpos"))
    val wIv = Window.partitionBy("doc_id").orderBy(col("start"), col("end"))
    val covered = iv
      .withColumn("prev_max_end", coalesce(
        max(col("end")).over(wIv.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("covered", greatest(
        col("end") - greatest(col("start"), col("prev_max_end")), lit(0L)))
      .groupBy("doc_id").agg(sum(col("covered")).as("cov"))
    docs.select(col("doc_id"),
        length(TF.normalized(col("text"))).cast("double").as("__len"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cov").cast("double") / col("__len"), lit(0.0))
          .as(s"dup${n}gram_covered_frac"))
  }

  /** Fold a streamed index's accumulated `batch_id=` dirs into one
    * compacted batch per subtree — [[Retention.compactRaw]]'s maintenance
    * discipline applied to the search artifact: continuous
    * [[appendTextIndex]] maintenance otherwise grows postings dirs (and
    * one-row stats files) forever, and at 100 TB the per-batch dir count,
    * not data size, becomes the listing/planning cost of every serve.
    * Postings fold into `postings/batch_id=<newId>` re-partitioned by
    * `wb` (term-bucket pruning spans the compacted dir exactly as before);
    * stats re-sum into ONE exact row (same totals — counts are integers).
    * Serving output is hash-identical by construction: the postings ROWS
    * are unchanged and the reader sums stats rows.
    *
    * Crash safety (two subtree renames cannot be atomic): a
    * `_compact_manifest` at the index root records the new id and folded
    * dirs BEFORE anything destructive; the STATS rename is the commit
    * point (postings land first — an index with a new postings dir but no
    * new stats row is the recognizable in-flight state).
    * [[recoverTextIndexCompaction]] — also run at the start of every
    * compact — rolls the in-flight state back or completes a committed
    * one. Like compactRaw this is an offline maintenance pass: run it (or
    * at least recovery) before serving, since the post-commit pre-delete
    * window shows both copies. Prior compactions (id ≥
    * [[Retention.CompactIdBase]]) are never re-folded, and without
    * `assumeQuiesced` the newest small dir — the one a live streaming
    * commit may still be filling — is spared. Returns the new batch id,
    * or None when fewer than `minBatchDirs` foldable dirs exist. */
  def compactTextIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      minBatchDirs: Int = 2, assumeQuiesced: Boolean = false): Option[Long] = {
    require(minBatchDirs >= 2, s"minBatchDirs must be >= 2, got $minBatchDirs")
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path, "stats"))) return None
    recoverTextIndexCompaction(spark, path)
    def idsWithMtime(sub: String): Seq[(Long, Long)] =
      fs.globStatus(new Path(s"$path/$sub", "batch_id=*")).toSeq
        .flatMap(st => st.getPath.getName.stripPrefix("batch_id=")
          .toLongOption.map(_ -> st.getModificationTime))
    // per-id mtime = the newest of its postings/stats dirs
    val mtimes = (idsWithMtime("postings") ++ idsWithMtime("stats"))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val all = mtimes.keys.toSeq.sorted
    val small0 = all.filter(_ < Retention.CompactIdBase)
    // spare the most recently MODIFIED small id, not the max id — batch
    // ids need not be time-ordered (see Retention.compactRaw)
    val small =
      if (assumeQuiesced || small0.isEmpty) small0
      else {
        val spare = small0.filter(id => mtimes(id) == small0.map(mtimes).max).max
        small0.filterNot(_ == spare)
      }
    if (small.size < minBatchDirs) return None
    val newId = math.max(Retention.CompactIdBase, all.max + 1)
    val manifest = new Path(root, "_compact_manifest")
    val out = fs.create(manifest, true)
    out.write((newId +: small.map(id => s"batch_id=$id"))
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    // stats fold: exact integer re-sums, uniform bucket function enforced.
    // Every foldable id CAN lack a stats dir (postings-only batches from an
    // interrupted rollback): reading an empty path list would throw AFTER
    // the manifest landed, wedging the index in a compaction that can never
    // succeed — fold a zero-row frame instead (readers sum stats rows, so
    // an empty folded dir contributes nothing, and the stats rename still
    // serves as the commit point).
    val statsDirs = small.map(id => s"$path/stats/batch_id=$id")
      .filter(p => fs.exists(new Path(p)))
    import spark.implicits._
    val folded =
      if (statsDirs.isEmpty)
        Seq.empty[(Long, Option[Long], Int)].toDF("n_docs", "sum_dl", "n_buckets")
      else {
        val st = spark.read.option("basePath", s"$path/stats")
          .parquet(statsDirs: _*)
          .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"),
            min("n_buckets").as("nb_min"), max("n_buckets").as("nb_max"))
          .head()
        require(st.getAs[Int]("nb_min") == st.getAs[Int]("nb_max"),
          "index batches were written with different nBuckets — rebuild instead")
        Seq((st.getAs[Long]("n_docs"),
            Option(st.getAs[java.lang.Long]("sum_dl")).map(_.longValue()),
            st.getAs[Int]("nb_max")))
          .toDF("n_docs", "sum_dl", "n_buckets")
      }
    val pTmp = new Path(s"$path/postings", s".compact_tmp_$newId")
    val sTmp = new Path(s"$path/stats", s".compact_tmp_$newId")
    val postingsDirs = small.map(id => s"$path/postings/batch_id=$id")
      .filter(p => fs.exists(new Path(p)))
    val hasPostings = postingsDirs.exists(p =>
      fs.globStatus(new Path(p, "wb=*/*.parquet")).nonEmpty)
    if (hasPostings)
      spark.read.option("basePath", s"$path/postings")
        .parquet(postingsDirs: _*)
        .drop("batch_id")
        .repartition(col("wb"))
        .write.mode("overwrite").partitionBy("wb").parquet(pTmp.toString)
    folded.coalesce(1).write.mode("overwrite").parquet(sTmp.toString)
    if (hasPostings)
      require(fs.rename(pTmp, new Path(s"$path/postings", s"batch_id=$newId")),
        s"postings rename failed: $pTmp")
    // COMMIT POINT — a visible stats/batch_id=<newId> means the fold landed
    require(fs.rename(sTmp, new Path(s"$path/stats", s"batch_id=$newId")),
      s"stats rename failed: $sTmp")
    for (sub <- Seq("postings", "stats"); id <- small)
      fs.delete(new Path(s"$path/$sub/batch_id=$id"), true)
    fs.delete(manifest, false)
    Some(newId)
  }

  /** Finish or undo a crashed [[compactTextIndex]]: with a manifest
    * present, the STATS rename having landed means the fold committed
    * (→ delete the listed originals under both subtrees and any leftover
    * temps); otherwise roll back (→ drop the new postings dir if its
    * rename raced ahead, plus both temps — the originals are untouched).
    * Either way the manifest is consumed. No-op without a manifest. */
  def recoverTextIndexCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(root, "_compact_manifest")
    if (!fs.exists(manifest)) return
    val in = fs.open(manifest)
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    in.close()
    lines match {
      case idLine :: oldDirs if idLine.toLongOption.isDefined =>
        val newId = idLine.toLong
        val committed = fs.exists(new Path(s"$path/stats/batch_id=$newId"))
        if (committed)
          for (sub <- Seq("postings", "stats"); d <- oldDirs)
            fs.delete(new Path(s"$path/$sub/$d"), true)
        else
          fs.delete(new Path(s"$path/postings/batch_id=$newId"), true)
        for (sub <- Seq("postings", "stats"))
          fs.delete(new Path(s"$path/$sub/.compact_tmp_$newId"), true)
      case _ => // unreadable manifest: nothing destructive without a plan
    }
    fs.delete(manifest, false)
  }

  /** Exact phrase search with keyword-in-context (KWIC) output — the
    * concordance view every corpus-inspection UI needs: each occurrence of
    * `phrase` (as consecutive normalized words) with up to `ctx` words of
    * context on each side. ZERO shuffle end to end: the phrase is one
    * [[graft.functions.WordKGrams]] codegen pass (a p-word phrase is
    * exactly a p-gram equality — no positional self-join of posting
    * lists), the filter prunes to matches before anything else runs, and
    * context is two `slice`s of the already-in-hand word array. `pos` is
    * the 0-based word offset ([[Dedup.sharedSpans]] convention). */
  def phraseSearch(docs: DataFrame, phrase: String, ctx: Int = 5): DataFrame = {
    val toks = phrase.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").filter(_.nonEmpty)
    require(toks.nonEmpty, "phrase must contain at least one word")
    require(ctx >= 0, s"ctx must be >= 0, got $ctx")
    val p = toks.length
    val base = docs.select(col("doc_id"), TF.words(col("text")).as("ws"))
    val hits =
      if (p == 1) base.select(col("doc_id"), col("ws"),
        posexplode(col("ws")).as(Seq("pos", "sh")))
      else base.select(col("doc_id"), col("ws"),
        posexplode(TF.wordKGrams(col("ws"), p)).as(Seq("pos", "sh")))
    hits.filter(col("sh") === toks.mkString(" "))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("ws"),
          greatest(col("pos") - ctx, lit(0)) + 1,
          least(col("pos"), lit(ctx))), " ").as("before"),
        array_join(slice(col("ws"), col("pos") + p + 1, lit(ctx)), " ").as("after"))
  }

  /** Windowed pointwise mutual information — the collocation detector of
    * classic corpus linguistics (Church & Hanks 1990): for unordered word
    * pairs co-occurring within `maxDist` tokens,
    * pmi = ln( (c_uv/T_p) / ((c_u/T_w)·(c_v/T_w)) ), keeping pairs seen
    * ≥ `minCount` times, top `k` by (pmi DESC, u, v).
    *
    * Pair generation is shuffle-free: a pair at distance j is exactly the
    * (first, last) words of a (j+1)-gram, so `maxDist` codegen gram
    * passes replace the positional self-join (which would shuffle every
    * token row by doc). Only the (u,v) count aggregation shuffles, and it
    * map-side combines. All counts are exact integers; pmi is one scalar
    * double expression over them, snapped to DECIMAL(18,9) so the ranking
    * is engine- and partition-order-invariant; the top-k is
    * TakeOrderedAndProject. */
  def pmiPairs(docs: DataFrame, maxDist: Int = 3, minCount: Long = 5L,
      k: Int = 50): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val base = docs.select(TF.words(col("text")).as("ws"))
    val pairs = (1 to maxDist).map { j =>
      base.select(explode(TF.wordKGrams(col("ws"), j + 1)).as("g"))
        .select(substring_index(col("g"), " ", 1).as("w1"),
          substring_index(col("g"), " ", -1).as("w2"))
    }.reduce(_ unionByName _)
      .select(least(col("w1"), col("w2")).as("u"),
        greatest(col("w1"), col("w2")).as("v"))
      .filter(col("u") =!= "")
    // materialize the two aggregates once: pc feeds both the totals and
    // the scoring join (its lineage is the maxDist corpus-wide gram
    // passes), wc feeds the totals and BOTH endpoint joins
    val pc = pairs.groupBy("u", "v").agg(count(lit(1)).as("c_uv"))
      .localCheckpoint()
    val wc = base.select(explode(col("ws")).as("w")).filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c_w"))
      .localCheckpoint()
    val tot = broadcast(pc.agg(sum("c_uv").cast("double").as("t_p"))
      .crossJoin(wc.agg(sum("c_w").cast("double").as("t_w"))))
    val pmi = log((col("c_uv").cast("double") / col("t_p")) /
      ((col("c_u").cast("double") / col("t_w")) *
        (col("c_v").cast("double") / col("t_w"))))
    pc.filter(col("c_uv") >= minCount)
      .join(wc.withColumnRenamed("w", "u").withColumnRenamed("c_w", "c_u"), "u")
      .join(wc.withColumnRenamed("w", "v").withColumnRenamed("c_w", "c_v"), "v")
      .crossJoin(tot)
      .withColumn("pmi", pmi.cast(DecimalType(18, 9)).cast("double"))
      .select("u", "v", "c_uv", "pmi")
      .orderBy(col("pmi").desc, col("u"), col("v"))
      .limit(k)
  }

  /** Per-document unigram NLL under the corpus's own word distribution —
    * the cheap "perplexity filter" proxy every curation pipeline runs
    * (out-of-distribution gibberish scores high, stopword soup scores
    * low). Each token's −ln p snaps to DECIMAL(18,9) BEFORE the per-doc
    * sum (the tfidf convention: snapped terms sum exactly in any partition
    * order); the per-token mean is a scalar double division of identical
    * operands on both sides. Zero-token docs are absent. The 1-row total
    * broadcasts; the vocab join is UNHINTED — a 100 TB corpus's
    * vocabulary (typos, ids, URLs) is itself huge, so whether it
    * broadcasts is AQE's runtime call, not a hard-coded assumption.
    * Output: (doc_id, n_tokens_scored, nll_sum, nll_per_token). */
  def unigramNll(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), explode(TF.words(col("text"))).as("word"))
      .filter(col("word") =!= "") // no phantom "" token from empty docs
    val freq = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val tot = broadcast(freq.agg(sum("cnt").cast("double").as("total")))
    w.join(freq, "word").crossJoin(tot)
      .withColumn("nll", (-log(col("cnt") / col("total")))
        .cast(DecimalType(18, 9)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens_scored"),
        sum(col("nll")).cast("double").as("nll_sum"))
      .withColumn("nll_per_token", col("nll_sum") / col("n_tokens_scored"))
  }

  /** CCNet-style perplexity routing (Wenzek et al. 2020): split each
    * language's documents into equal-count NLL tiles — tile 1 ("head") is
    * the most in-distribution third, the classic keep/review/drop routing
    * of a crawl-curation pipeline. Per-LANGUAGE tiling is the point: a
    * global cut would route whole low-resource languages to "tail" just
    * for having a sparser (higher-NLL) vocabulary.
    *
    * The tile is ntile(`tiles`) over the TOTAL order (nll_per_token,
    * doc_id) — both engines define ntile identically over a total order,
    * and nll_per_token is already engine-portable ([[unigramNll]]), so the
    * assignment is hash-provable. Docs scoring no token (empty text) are
    * absent, as in every NLL report.
    *
    * Scale shape: [[unigramNll]]'s two shuffles plus one window
    * partitioned by language. The window sorts each language once —
    * the same per-stratum rank shape as [[Sampling.stratifiedQuota]],
    * parallel across languages. */
  def perplexityRoute(docs: DataFrame, tiles: Int = 3): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    val labeled = unigramNll(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    labeled
      .withColumn("tile", ntile(tiles).over(Window.partitionBy(col("lang"))
        .orderBy(col("nll_per_token"), col("doc_id"))))
      .withColumn("route",
        when(col("tile") === 1, lit("head"))
          .when(col("tile") === tiles, lit("tail"))
          .otherwise(lit("middle")))
      .select("doc_id", "lang", "n_tokens_scored", "nll_per_token",
        "tile", "route")
  }
}
