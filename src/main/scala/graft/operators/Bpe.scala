package graft.operators

import graft.functions.{BpeMergePair, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction over the corpus — tokenizer
  * TRAINING as a pipeline stage (Sennrich et al., ACL 2016: "Neural
  * Machine Translation of Rare Words with Subword Units", Algorithm 1).
  * The merge table this learns is the artifact a pretraining pipeline
  * ships to its tokenizer; learning it over the full corpus is exactly
  * the kind of job that must distribute.
  *
  * Distribution shape: BPE statistics live on the DISTINCT-WORD census,
  * not the corpus — the one corpus-sized pass is the word count. Each
  * merge round is then (1) a pair census over the symbol table — adjacent
  * pairs via two slices + arrays_zip, all codegen, weighted by word
  * count, one hash aggregation with map-side partials; (2) a driver-side
  * argmax of ONE row (count desc, then lexicographic pair — total order,
  * so training is deterministic and layout-invariant); (3) a
  * partition-local rewrite of the symbol table through the codegen
  * [[BpeMergePair]] expression — no shuffle. Driver state is the merge
  * table itself (nMerges rows). Rounds are inherently sequential (each
  * merge changes the next census); per-round lineage is truncated with
  * `localCheckpoint` exactly like [[Dedup.connectedComponents]]'s loop.
  *
  * Word boundary: each census word becomes its character symbols plus a
  * terminal end-of-word marker, so merges cannot cross word boundaries
  * and a learned token "t h e </w>" is distinct from the prefix "t h e". */
object Bpe {

  val Eow = "</w>"

  /** One BPE merge step as a Column (see [[BpeMergePair]]). */
  def bpeMerge(syms: Column, left: String, right: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeMergePair(org.apache.spark.sql.graft.ColumnBridge.expression(syms),
        left, right))

  /** Corpus word census: (word, cnt). The single corpus-sized pass. */
  def wordCensus(docs: DataFrame): DataFrame =
    docs.select(explode(TextFunctions.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Character symbols of a word plus the end-of-word marker —
    * `regexp_extract_all(., 0)` rather than `split(word, "")` because the
    * empty-pattern split's boundary empties differ across engines/JDKs,
    * and it stays codegen. */
  private def charSyms(word: Column): Column =
    concat(regexp_extract_all(word, lit("."), lit(0)), array(lit(Eow)))

  /** Initial symbol table: every census word as its character symbols plus
    * the end-of-word marker. */
  private def initialSymbols(census: DataFrame): DataFrame =
    census.select(charSyms(col("word")).as("syms"), col("cnt"))

  /** Learn `nMerges` merges; stops early when the best pair's weighted
    * count falls below `minCount` (merging hapax pairs memorizes noise).
    * Returns the ordered merge table
    * (merge_rank, lhs, rhs, merged, pair_count). */
  def learnMerges(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val census = wordCensus(docs)
    var syms = initialSymbols(census).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = pairCensus(syms)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) {
        done = true
      } else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, l + r, n))
        val next = syms
          .withColumn("syms", bpeMerge(col("syms"), l, r))
          .localCheckpoint()
        unpersistLocal(syms)
        syms = next
        rank += 1
      }
    }
    unpersistLocal(syms)
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Weighted adjacent-pair counts over the symbol table: (l, r, n). */
  private def pairCensus(syms: DataFrame): DataFrame =
    syms
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("la"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("ra"))
      .select(col("cnt"), explode(arrays_zip(col("la"), col("ra"))).as("p"))
      .groupBy(col("p.la").as("l"), col("p.ra").as("r"))
      .agg(sum(col("cnt")).as("n"))

  /** Tokenize a corpus with a learned merge table: each doc's words run
    * through the merges in rank order (the standard BPE encoder applied
    * relationally — one codegen [[BpeMergePair]] chain, partition-local,
    * zero shuffle). Returns (doc_id, tokens ARRAY<STRING>, n_tokens) where
    * tokens are per-word subword symbols (Eow markers retained). */
  def encode(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val perWord = docs.select(col("doc_id"),
      posexplode(TextFunctions.words(col("text"))).as(Seq("__pos", "word")))
      .filter(length(col("word")) > 0)
    val encoded = merges.foldLeft(
      perWord.withColumn("syms", charSyms(col("word")))) {
      case (df, (l, r)) => df.withColumn("syms", bpeMerge(col("syms"), l, r))
    }
    val grouped = encoded.groupBy("doc_id").agg(
      flatten(sort_array(collect_list(struct(col("__pos"), col("syms"))))
        .getField("syms")).as("tokens"))
    // keep EVERY input doc: a text with zero normalized words encodes to
    // an empty token array, not a missing row (same contract as the tile
    // rebuild path)
    docs.select(col("doc_id")).join(grouped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  private def unpersistLocal(df: DataFrame): Unit =
    Dedup.unpersistLocalCheckpoint(df)
}
