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

  /** A word's code-point symbols — one string per Unicode code point, so
    * supplementary characters stay whole (the twin of the distributed
    * arm's `regexp_extract_all(word, ".")`, which also matches per code
    * point). */
  private def codePointSyms(w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** UTF-8 binary "less than" — Spark's UTF8_BINARY collation order, which
    * the distributed arm's `orderBy(col("l"), col("r"))` uses. Equals Java
    * String order for BMP-only strings; diverges on supplementary chars. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

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
    * (merge_rank, lhs, rhs, merged, pair_count).
    *
    * Hybrid execution: the merge statistics live on the DISTINCT-WORD
    * census, whose size follows vocabulary growth (Heaps' law), not corpus
    * size — for most corpora it fits one machine even when the corpus is
    * 100 TB. When the census has ≤ `driverMaxWords` rows it collects once
    * (the corpus-sized pass is the census either way, persisted so neither
    * arm pays it twice) and the merge loop runs driver-side with
    * incremental pair accounting (Sennrich's fast variant: only words
    * containing the merged pair update) — the distributed loop's ~2 Spark
    * jobs per round were pure scheduling overhead at this size. Above the
    * threshold (massively multilingual / byte-level vocabularies) the
    * distributed per-round census loop below takes over. Both arms share
    * the code-point symbol split and the argmax order (count desc, then
    * lexicographic pair in UTF-8 BINARY order — [[utf8Lt]] on the driver,
    * Spark's UTF8_BINARY collation distributed) and
    * the greedy left-to-right merge ([[BpeExprUtil.mergePair]] semantics),
    * so results are bit-identical — BpeSpec proves arm equality and the
    * q_bpe_merges recursive-CTE oracle hashes the driver arm. */
  def learnMerges(docs: DataFrame, nMerges: Int,
      minCount: Long = 2L, driverMaxWords: Int = 1 << 20): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val census0 = wordCensus(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = census0.select(col("word"), col("cnt"))
        .limit(driverMaxWords + 1).collect()
      if (probe.length <= driverMaxWords) {
        val merges = learnMergesDriver(
          probe.map(r => (r.getString(0), r.getLong(1))), nMerges, minCount)
        merges.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      } else
        // still inside the persist scope: the distributed arm's initial
        // symbol table materializes (and lineage-truncates) off the cache,
        // so the corpus pass is not paid a second time
        learnMergesDistributed(census0, nMerges, minCount)
    } finally census0.unpersist()
  }

  /** Driver arm of [[learnMerges]]: exact incremental pair accounting.
    * `pairWords` uses lazy deletion — a word index may linger under pairs
    * its rewrite removed, so occurrence is re-checked before processing. */
  private[operators] def learnMergesDriver(words: Array[(String, Long)], nMerges: Int,
      minCount: Long): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    // CODE-POINT symbols, not UTF-16 code units: the distributed arm's
    // `regexp_extract_all(word, ".")` matches whole code points, so a
    // supplementary character (emoji, CJK-extension) must stay one symbol
    // here too, or the two arms learn different merge tables and results
    // depend on driverMaxWords.
    val syms: Array[Array[String]] =
      words.map { case (w, _) =>
        (codePointSyms(w) :+ Eow).toArray
      }
    val cnt = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def account(i: Int, sign: Long): Unit = {
      val s = syms(i); var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val nv = pairCount.getOrElse(p, 0L) + sign * cnt(i)
        if (nv == 0L) pairCount.remove(p) else pairCount(p) = nv
        if (sign > 0L) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
    }
    def containsPair(s: Array[String], l: String, r: String): Boolean = {
      var j = 0
      while (j < s.length - 1) {
        if (s(j) == l && s(j + 1) == r) return true
        j += 1
      }
      false
    }
    // greedy left-to-right, overlaps resolve leftward — BpeExprUtil.mergePair
    def mergeGreedy(s: Array[String], l: String, r: String,
        lr: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
          out += lr; j += 2
        } else { out += s(j); j += 1 }
      }
      out.toArray
    }
    syms.indices.foreach(account(_, 1L))
    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // argmax by (n desc, l asc, r asc) in UTF-8 BINARY order — the
      // distributed arm sorts with Spark's UTF8_BINARY collation, and Java
      // String order diverges from it on supplementary characters (lone
      // surrogates sort below U+E000.. in UTF-16 but above in UTF-8)
      var bl: String = null; var br: String = null; var bn = 0L
      for ((p, nv) <- pairCount)
        if (nv > bn || (nv == bn && bl != null &&
            (utf8Lt(p._1, bl) || (p._1 == bl && utf8Lt(p._2, br)))))
          { bl = p._1; br = p._2; bn = nv }
      if (bl == null || bn < minCount) done = true
      else {
        out += ((rank, bl, br, bl + br, bn))
        val lr = bl + br
        for (i <- pairWords.getOrElse((bl, br), mutable.HashSet.empty)
             if containsPair(syms(i), bl, br)) {
          account(i, -1L)
          syms(i) = mergeGreedy(syms(i), bl, br, lr)
          account(i, 1L)
        }
        pairWords.remove((bl, br))
        rank += 1
      }
    }
    out.toSeq
  }

  /** Distributed arm of [[learnMerges]] — per-round relational pair census
    * + codegen rewrite (see the object scaladoc's distribution shape). */
  private[operators] def learnMergesDistributed(census: DataFrame, nMerges: Int,
      minCount: Long): DataFrame = {
    val spark = census.sparkSession
    import spark.implicits._
    var syms = initialSymbols(census).localCheckpoint()
    // LAZY checkpoints between rounds: an eager localCheckpoint per merge
    // ran a second job per round just to materialize blocks — at 30-ish
    // rounds of a small symbol table, half the wall clock was job
    // scheduling, not data. A lazy checkpoint materializes as a side
    // effect of the NEXT round's census job (one job per round total).
    // The previous round's blocks must outlive that materialization —
    // truncated lineage reads them — so unpersist is deferred until after
    // the census has run (`prev`).
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = pairCensus(syms)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      // syms is materialized now; its parent's blocks are dead weight
      prev.foreach(unpersistLocal)
      prev = None
      if (top.isEmpty || top(0).getLong(2) < minCount) {
        done = true
      } else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, l + r, n))
        val next = syms
          .withColumn("syms", bpeMerge(col("syms"), l, r))
          .localCheckpoint(eager = false)
        prev = Some(syms)
        syms = next
        rank += 1
      }
    }
    prev.foreach(unpersistLocal)
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
