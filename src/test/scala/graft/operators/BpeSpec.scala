package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkSuite {

  /** Reference BPE (Sennrich et al. 2016, Algorithm 1) on a local word
    * census — same tie-break (count desc, then lexicographic pair). */
  private def referenceBpe(census: Map[String, Long], nMerges: Int,
      minCount: Long): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      census.map { case (w, c) => (w.map(_.toString).toVector :+ Bpe.Eow) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.size < nMerges && continue) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.size - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.isEmpty) continue = false
      else {
        val ((l, r), n) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < minCount) continue = false
        else {
          out += ((l, r, n))
          vocab = vocab.groupMapReduce {
            case (syms, _) => mergeOnce(syms, l, r)
          }(_._2)(_ + _)
        }
      }
    }
    out.toSeq
  }

  private def mergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.size) {
      if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  test("learnMerges equals the reference algorithm, merge by merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new lower"),
      (3L, "wide wider widest new low")).toDF("doc_id", "text")
    val census = Seq("low" -> 4L, "lower" -> 2L, "lowest" -> 1L,
      "new" -> 3L, "newer" -> 1L, "newest" -> 1L,
      "wide" -> 1L, "wider" -> 1L, "widest" -> 1L).toMap
    // sanity: the distributed census agrees
    val gotCensus = Bpe.wordCensus(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCensus === census)
    val expect = referenceBpe(census, 12, minCount = 2L)
    val got = Bpe.learnMerges(docs, 12, minCount = 2L)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq === expect)
    // ranks are 1..n and merged = left+right
    val full = Bpe.learnMerges(docs, 12, minCount = 2L).orderBy("merge_rank").collect()
    assert(full.map(_.getInt(0)).toSeq === (1 to full.length))
    assert(full.forall(r => r.getString(3) === r.getString(1) + r.getString(2)))
  }

  test("early stop: no merge below minCount; high minCount stops immediately") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair has weight 1 -> minCount=2 learns nothing
    assert(Bpe.learnMerges(docs, 5, minCount = 2L).count() === 0L)
    // minCount=1 merges something deterministic
    val m = Bpe.learnMerges(docs, 3, minCount = 1L).orderBy("merge_rank").collect()
    assert(m.nonEmpty)
    assert(m.head.getString(1) === "a" && m.head.getString(2) === "b")
  }

  test("encode: round-trips text, token count shrinks with more merges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new lower")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 10, minCount = 2L)
      .orderBy("merge_rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[String](r.fieldIndex("tokens")), r.getLong(2))))
      .toMap
    // concatenating tokens and stripping Eow reconstructs the words
    val rebuilt = enc(1L)._1.mkString("").split(java.util.regex.Pattern.quote(Bpe.Eow))
      .filter(_.nonEmpty).mkString(" ")
    assert(rebuilt === "low lower lowest low low")
    // more merges -> fewer (or equal) tokens; zero merges = chars + eow
    val enc0 = Bpe.encode(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val txt = "low lower lowest low low"
    assert(enc0(1L) === txt.count(_ != ' ') + 5L)
    assert(enc(1L)._2 < enc0(1L))
    val encHalf = Bpe.encode(docs, merges.take(3)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(enc(1L)._2 <= encHalf(1L) && encHalf(1L) <= enc0(1L))
  }

  test("encode keeps docs whose text normalizes to zero words") {
    import spark.implicits._
    val docs = Seq((1L, "low low"), (2L, "!!!"), (3L, "")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === 0L && got(3L) === 0L)
  }

  test("driver and distributed arms learn bit-identical merge tables") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocabWords = Seq("low", "lower", "lowest", "new", "newer", "newest",
      "wide", "wider", "widest", "shard", "share", "sharp", "spark", "parse")
    val docs = (1L to 60L).map { i =>
      (i, Seq.fill(8)(vocabWords(rng.nextInt(vocabWords.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def table(driverMaxWords: Int) =
      Bpe.learnMerges(docs, 15, minCount = 2L, driverMaxWords = driverMaxWords)
        .orderBy("merge_rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    // driverMaxWords = 0 -> the probe always overflows -> distributed arm
    assert(table(1 << 20) === table(0),
      "the two execution arms must produce the same merge table, " +
        "rank for rank, count for count")
  }

  test("non-BMP census words: driver and distributed arms still agree") {
    import spark.implicits._
    // supplementary characters (outside the BMP): an emoji and a CJK-ext
    // ideograph. The driver arm must split them as ONE symbol each (not
    // two lone surrogates) and tie-break candidate pairs in UTF-8 binary
    // order, or the two arms learn different merge tables. wordCensus
    // normalizes these away, so feed the census directly through the
    // package-private arm seams.
    val emoji = new String(Character.toChars(0x1F600)) // 😀
    val cjk = new String(Character.toChars(0x20021))
    val census = Seq(
      (s"a${emoji}b", 4L), (s"${emoji}b", 3L), (s"a$emoji", 3L),
      (s"$cjk$emoji", 2L), (s"x$cjk", 2L), (s"ab", 5L),
      // a BMP char above the surrogate range (U+FFFD): Java String order
      // sorts it ABOVE supplementary chars, UTF-8 order BELOW — a direct
      // probe of the tie-break collation
      ("�" + emoji, 3L), (s"${emoji}�", 3L)
    ).toDF("word", "cnt")
    val driver = Bpe.learnMergesDriver(
      census.collect().map(r => (r.getString(0), r.getLong(1))),
      nMerges = 10, minCount = 2L)
    val dist = Bpe.learnMergesDistributed(census, nMerges = 10, minCount = 2L)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(driver === dist)
    // sanity: supplementary chars entered the merge table whole
    assert(driver.exists(m => m._2.contains(emoji) || m._3.contains(emoji)))
  }

  test("training is layout-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val vocabWords = Seq("spark", "sparse", "parse", "parquet", "partition",
      "sharp", "shard", "share", "spare", "park")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(6)(vocabWords(rng.nextInt(vocabWords.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, 8).orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val b = Bpe.learnMerges(docs.repartition(13), 8).orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(a === b)
  }
}
