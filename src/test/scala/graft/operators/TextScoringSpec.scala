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

  test("empty-normalizing docs never contribute a phantom \"\" token: " +
    "naiveBayes excludes them from model and predictions, dsirWeights " +
    "emits no row, bigramNll's backoff total ignores them") {
    import spark.implicits._
    val train = Seq((1L, "hello world", "en"), (2L, "bonjour monde", "fr"),
      (3L, "!!!", "en")).toDF("doc_id", "text", "lang")
    val score = Seq((10L, "hello hello"), (11L, "???"))
      .toDF("doc_id", "text")
    val preds = TextScoring.naiveBayes(train, score)
      .collect().map(_.getLong(0)).toSet
    assert(preds === Set(10L),
      "a zero-token doc must not be scored off the phantom \"\" token")
    val dsir = TextScoring.dsirWeights(
        Seq((1L, "hello world", true), (2L, "!!!", false))
          .toDF("doc_id", "text", "t"),
        org.apache.spark.sql.functions.col("t"))
      .collect().map(_.getLong(0)).toSet
    assert(dsir === Set(1L), "zero-token docs stay absent, per contract")
    // bigram backoff N: with vs without a punctuation-only doc — identical
    val base = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val extra = base.unionByName(Seq((9L, "...")).toDF("doc_id", "text"))
    val a = TextScoring.bigramNll(base).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    val b = TextScoring.bigramNll(extra).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(a === b, "an empty-normalizing doc must not skew the unigram N")
  }

  test("bm25TopK: rare-term doc outranks common-term doc; tf saturates; dl normalizes") {
    import org.apache.spark.sql.functions.col
    // 20 background docs mention "common"; exactly one mentions "rare"
    val bg = (0L until 20L).map(i => (i, "common filler words here"))
    val docs = (bg ++ Seq(
      (100L, "rare filler words here"),          // one rare hit
      (101L, "common common filler words here"), // tf=2 of a common term
      (102L, "common filler words here and then many many more words to dilute length")
    )).toDF("doc_id", "text")
    val top = TextScoring.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("rare", "common"), k = 30).collect()
    val score = top.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    // idf dominance: the unique "rare" hit beats every common-only doc
    assert(top.head.getLong(0) === 100L, s"rare-term doc should rank first: ${top.toSeq}")
    // tf monotonicity with saturation: tf=2 > tf=1 at equal dl
    assert(score(101L) > score(0L))
    // length normalization: same tf in a longer doc scores lower
    assert(score(102L) < score(0L))
    // determinism: equal docs tie exactly and order by doc_id
    val bgRows = top.filter(r => r.getLong(0) < 20L)
    assert(bgRows.map(_.getAs[Double]("score")).distinct.length === 1)
    assert(bgRows.map(_.getLong(0)).toSeq === bgRows.map(_.getLong(0)).toSeq.sorted)
  }

  test("bm25TopK: k limits output; docs matching no term are absent") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val top = TextScoring.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("alpha"), k = 1).collect()
    assert(top.length === 1)
    val all = TextScoring.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("alpha"), k = 10).collect()
    assert(all.map(_.getLong(0)).toSet === Set(1L, 2L), "gamma-only doc absent")
  }

  test("phraseSearch: positions, edge-clamped context, multiple hits, normalization") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "Quick, brown fox! and later a quick brown fox again"),
      (3L, "no match here")).toDF("doc_id", "text")
    val hits = TextScoring.phraseSearch(docs, "Quick BROWN fox", ctx = 2)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(hits.toSeq === Seq(
      (1L, 1, "the", "jumps over"),          // left context clamps to 1 word
      (2L, 0, "", "and later"),              // phrase at doc start: empty before
      (2L, 6, "later a", "again")),          // trailing context clamps
      s"got ${hits.toSeq}")
  }

  test("phraseSearch: single-word phrase works; absent phrase yields empty") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val one = TextScoring.phraseSearch(docs, "beta", ctx = 1).collect()
    assert(one.map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq
      === Seq((1, "alpha", "gamma")))
    assert(TextScoring.phraseSearch(docs, "delta epsilon").collect().isEmpty)
  }

  test("text index: bm25TopKFromIndex == bm25TopK exactly, including scores") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_text_idx").toString
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val terms = Seq("dup", "join", "scan", "stream")
    TextScoring.writeTextIndex(docs, dir, nBuckets = 8)
    val inline = TextScoring.bm25TopK(docs, col("doc_id"), col("text"), terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val served = TextScoring.bm25TopKFromIndex(spark, dir, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(served.toSeq === inline.toSeq,
      "index serve must return the exact corpus-scan answer")
    // the pruned read touches only the query terms' bucket partitions
    val allBuckets = new java.io.File(s"$dir/postings/batch_id=0").listFiles()
      .count(_.getName.startsWith("wb="))
    assert(allBuckets > 4, "corpus vocabulary should spread over >4 buckets")
  }

  test("text index: incremental batches == one-shot index; replay is idempotent") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val terms = Seq("dup", "join", "scan", "stream")
    def serve(p: String) = TextScoring.bm25TopKFromIndex(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    // corpus folded in as three disjoint batches
    val inc = java.nio.file.Files.createTempDirectory("graft_idx_inc").toString
    for (b <- 0L until 3L)
      TextScoring.appendTextIndex(docs.filter(col("doc_id") % 3 === b), inc, b)
    val one = java.nio.file.Files.createTempDirectory("graft_idx_one").toString
    TextScoring.writeTextIndex(docs, one)
    assert(serve(inc) === serve(one),
      "batch-appended index must serve the one-shot answer exactly")
    // at-least-once replay: rewriting batch 1's partition changes nothing
    TextScoring.appendTextIndex(docs.filter(col("doc_id") % 3 === 1L), inc, 1L)
    assert(serve(inc) === serve(one), "replayed batch must not double-count")
    // rebuild TRUNCATES: writeTextIndex over the multi-batch index must
    // not leave stale batch partitions summing into the serve
    TextScoring.writeTextIndex(docs.filter(col("doc_id") < 100), inc)
    val fresh = java.nio.file.Files.createTempDirectory("graft_idx_fresh").toString
    TextScoring.writeTextIndex(docs.filter(col("doc_id") < 100), fresh)
    assert(serve(inc) === serve(fresh),
      "rebuild over an incremental index must equal a fresh build")
  }

  test("text index guards: degenerate (all-empty-text) index fails with " +
    "intent; flat stats layout blocks append like flat postings") {
    import org.apache.spark.sql.functions.col
    // an index whose only batch held zero tokens: serving must raise a
    // descriptive error, not NPE on the NULL sum_dl unbox
    val empty = java.nio.file.Files.createTempDirectory("graft_idx_empty").toString
    TextScoring.writeTextIndex(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), empty)
    val e = intercept[IllegalStateException] {
      TextScoring.bm25TopKFromIndex(spark, empty, Seq("anything"), k = 5)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // a legacy layout with stats parquet directly under stats/ (no
    // batch_id level) must fail the append — partition discovery over
    // mixed levels would make the index unreadable AFTER the write
    val legacy = java.nio.file.Files.createTempDirectory("graft_idx_flat").toString
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    TextScoring.writeTextIndex(docs, legacy)
    // simulate the flat stats layout: hoist batch 0's stats files up a level
    val statsDir = new java.io.File(s"$legacy/stats")
    val batchDir = new java.io.File(statsDir, "batch_id=0")
    batchDir.listFiles().foreach { f =>
      java.nio.file.Files.move(f.toPath,
        new java.io.File(statsDir, f.getName).toPath)
    }
    batchDir.delete()
    val e2 = intercept[IllegalStateException] {
      TextScoring.appendTextIndex(docs, legacy, batchId = 1L)
    }
    assert(e2.getMessage.contains("stats"), e2.getMessage)
  }

  test("repetitionSignals: degenerate loops score high, clean text low, " +
    "short/no-repeat docs zero; fractions match a local census") {
    import org.apache.spark.sql.functions.col
    val loop = (1 to 30).map(_ => "buy cheap pills now").mkString(" ")
    val clean = "the quick brown fox jumps over a lazy dog while nine " +
      "crows watch from seven tall pines near the old stone bridge"
    val docs = Seq(
      (1L, loop), (2L, clean), (3L, "one two"), (4L, "")
    ).toDF("doc_id", "text")
    val got = TextScoring.repetitionSignals(docs, topNs = Seq(2),
        dupNs = Seq(5)).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // local census for doc 1: "pills now buy cheap" etc — compute directly
    def census(text: String, n: Int): (Double, Double) = {
      val ws = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ")
        .filter(_.nonEmpty)
      val len = ws.mkString(" ").length.toDouble
      if (ws.length < n || len == 0) return (0.0, 0.0)
      val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      val (tg, tc) = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head
      val dup = counts.collect { case (g, c) if c >= 2 => c.toLong * g.length }
        .sum.toDouble
      (tc * tg.length / len, dup / len)
    }
    for (id <- Seq(1L, 2L, 3L)) {
      val text = Seq(loop, clean, "one two")(id.toInt - 1)
      val (t2, _) = census(text, 2)
      val (_, d5) = census(text, 5)
      assert(got(id)._1 === t2, s"top2 doc $id")
      assert(got(id)._2 === d5, s"dup5 doc $id")
    }
    // the degenerate loop maxes out; clean prose stays near zero
    assert(got(1L)._2 > 0.9, s"loop dup5=${got(1L)._2}")
    assert(got(2L)._1 < 0.2 && got(2L)._2 === 0.0, s"clean=${got(2L)}")
    // too short for 5-grams and the empty doc: zeros, present in output
    assert(got(3L)._2 === 0.0)
    assert(got(4L) === ((0.0, 0.0)))
  }

  test("dupNgramCoverage: covered chars counted ONCE under overlap; " +
    "matches a local interval-union census; bounded by occurrence mass") {
    import org.apache.spark.sql.functions.col
    // "x a b c d e x a b c d e ..." : overlapping duplicated 5-grams chain
    val loop = (1 to 8).map(_ => "alpha beta gamma delta").mkString(" ")
    val clean = "one lonely sentence with entirely unique words here okay"
    val docs = Seq((1L, loop), (2L, clean)).toDF("doc_id", "text")
    val got = TextScoring.dupNgramCoverage(docs, n = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // local reference: exact interval union over duplicated 5-grams
    def census(text: String): Double = {
      val ws = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty)
      val len = ws.mkString(" ").length.toDouble
      if (ws.length < 5) return 0.0
      val starts = ws.scanLeft(0)((a, w) => a + w.length + 1)
      val grams = ws.sliding(5).toSeq.zipWithIndex
        .map { case (g, i) => (g.mkString(" "), i) }
      val dup = grams.groupBy(_._1).filter(_._2.size >= 2).values.flatten
      val ivs = dup.map { case (_, i) =>
        (starts(i), starts(i + 4) + ws(i + 4).length)
      }.toSeq.sorted
      var cov = 0L
      var maxEnd = 0L
      for ((s, e) <- ivs) {
        cov += math.max(0L, e - math.max(s, maxEnd))
        maxEnd = math.max(maxEnd, e)
      }
      cov / len
    }
    assert(got(1L) === census(loop))
    assert(got(2L) === census(clean))
    // the fully periodic doc is (almost) fully covered; clean doc is 0
    assert(got(1L) > 0.95, s"loop coverage=${got(1L)}")
    assert(got(2L) === 0.0)
    // covered ≤ occurrence mass (the repetitionSignals dup column)
    val mass = TextScoring.repetitionSignals(docs, topNs = Seq(2),
      dupNs = Seq(5)).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) <= mass(1L) + 1e-12)
  }

  test("pmiPairs: planted collocation tops the ranking; window bound respected; gram pairs == positional join") {
    import org.apache.spark.sql.functions.col
    // "zig zag" always adjacent and seen only together; m0 is twice as
    // frequent (diluting every pair it joins); f/g fillers pair below
    // minCount and drop out
    val docs = (0L until 30L).map { i =>
      (i, s"m0 f$i zig zag g$i m0")
    }.toDF("doc_id", "text")
    val top = TextScoring.pmiPairs(docs, maxDist = 2, minCount = 5L, k = 5).collect()
    assert(top.head.getString(0) === "zag" && top.head.getString(1) === "zig",
      s"planted collocation should rank first: ${top.toSeq}")
    // pair beyond maxDist never counted: f$i (pos 1) .. m0 (pos 4) is dist 3
    val far = TextScoring.pmiPairs(docs, maxDist = 2, minCount = 1L, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!far.contains(("f0", "g0")) && !far.contains(("g0", "f0")),
      "distance-4 pair must be outside the window")
    // cross-validate the gram-based pair counts against a naive positional count
    val naive = docs.collect().flatMap { r =>
      val ws = r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ")
      for (i <- ws.indices; j <- (i + 1) to math.min(i + 2, ws.length - 1))
        yield if (ws(i) <= ws(j)) (ws(i), ws(j)) else (ws(j), ws(i))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val engine = TextScoring.pmiPairs(docs, maxDist = 2, minCount = 1L, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(engine === naive.filter(_._2 >= 1L),
      "gram-derived pair counts must equal the positional-join definition")
  }

  test("perplexityRoute: per-language terciles — a common-word doc routes " +
    "head, a rare-word doc tail, and languages tile independently") {
    // en corpus: 6 docs of common words, then one stuffed with hapaxes.
    // fr corpus is uniformly "rare" relative to en counts — per-language
    // tiling must still split it 1/2/3, not dump it all in tail.
    val docs = (
      (0L until 6L).map(i => (i, "the cat sat on the mat", "en")) ++
        Seq((6L, "zyx qwv bnm", "en")) ++
        Seq((10L, "bonjour le monde", "fr"), (11L, "bonjour le chat", "fr"),
          (12L, "zut alors vraiment", "fr"))
      ).toDF("doc_id", "text", "lang")
    val got = TextScoring.perplexityRoute(docs, tiles = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(4), r.getString(5)))).toMap
    assert(got(0L)._1 == "en" && got(0L)._3 == "head",
      "lowest-NLL common-word doc routes head")
    assert(got(6L) === (("en", 3, "tail")), "hapax-stuffed doc routes tail")
    // fr tiles over ITS OWN order: exactly one head, one middle, one tail
    val fr = Seq(10L, 11L, 12L).map(got(_)._2).sorted
    assert(fr === Seq(1, 2, 3), s"fr docs must tile 1/2/3, got $fr")
    assert(got(12L) === (("fr", 3, "tail")),
      "the doc of fr hapaxes is fr's own tail")
    // zero-token docs are absent entirely
    val withEmpty = docs.union(Seq((99L, "", "en")).toDF("doc_id", "text", "lang"))
    assert(!TextScoring.perplexityRoute(withEmpty, tiles = 3)
      .collect().map(_.getLong(0)).contains(99L))
  }
}
