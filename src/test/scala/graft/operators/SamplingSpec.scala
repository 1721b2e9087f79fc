package graft.operators

import graft.SparkSuite
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSuite {

  test("splitAssign: fractions track the hash bounds and survive repartitioning") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("doc_id")
    val split = Sampling.splitAssign(col("doc_id"),
      Seq("train" -> "cc", "val" -> "e6"), "test")
    val counts = ids.select(split.as("split")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // bounds quantize to 204/26/26 of 256; 10k uniform hashes land within ~2%
    assert(math.abs(counts("train") / 10000.0 - 204.0 / 256) < 0.02)
    assert(math.abs(counts("val") / 10000.0 - 26.0 / 256) < 0.02)
    assert(math.abs(counts("test") / 10000.0 - 26.0 / 256) < 0.02)
    // pure function of the key: identical assignment regardless of layout
    val a = ids.select(col("doc_id"), split.as("split")).collect().toSet
    val b = ids.repartition(13).select(col("doc_id"), split.as("split")).collect().toSet
    assert(a === b)
  }

  test("sampleByHash: monotone thresholds give nested samples at ~prefix rate") {
    import spark.implicits._
    val ids = (0L until 8000L).toDF("doc_id")
    val s28 = Sampling.sampleByHash(ids, col("doc_id"), "28")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s80 = Sampling.sampleByHash(ids, col("doc_id"), "80")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s28.subsetOf(s80), "growing the threshold must only add rows")
    assert(math.abs(s28.size / 8000.0 - 0x28 / 256.0) < 0.02)
    assert(math.abs(s80.size / 8000.0 - 0x80 / 256.0) < 0.02)
  }

  test("weightedMixture: per-stratum rates, nesting, degenerate bounds") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (s"src${i % 4}", i))
    val df = rows.toDF("source", "doc_id")
    def kept(rates: Map[String, Double], dflt: Double) =
      Sampling.weightedMixture(df, col("source"), col("doc_id"), rates, dflt)
        .select("source", "doc_id").collect()
        .map(r => r.getString(0) -> r.getLong(1))
    // rate 1.0 keeps EVERY row of its stratum (the "g" bound), 0.0 none
    val k = kept(Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5), 0.25)
    val bySrc = k.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("src0", 0) === 1000)
    assert(!bySrc.contains("src1"))
    assert(math.abs(bySrc("src2") / 1000.0 - 0.5) < 0.05)
    assert(math.abs(bySrc("src3") / 1000.0 - 0.25) < 0.05) // defaultRate
    // nesting: halving a stratum's rate only removes rows
    val hi = kept(Map("src2" -> 0.5), 1.0).toSet
    val lo = kept(Map("src2" -> 0.25), 1.0).toSet
    assert(lo.subsetOf(hi))
    // pure function of (stratum, key): layout-independent
    val again = Sampling.weightedMixture(df.repartition(11), col("source"),
      col("doc_id"), Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5), 0.25)
      .select("source", "doc_id").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(again.toSet === k.toSet)
    assert(Sampling.rateToHexUpper(0.5) === "80000000")
    intercept[IllegalArgumentException](Sampling.rateToHexUpper(-0.1))
  }

  test("selectByTokenBudget == global greedy prefix; boundary, ties, degenerate budgets") {
    import spark.implicits._
    // qualities engineered with exact ties and values outside [0,1] (the
    // clamped end-buckets), token counts irregular
    val rows = (0L until 400L).map { i =>
      val q = (i % 7).toDouble / 5.0 - 0.2 // ties galore, range [-0.2, 1.0]
      (i, q, 10L + i % 37)
    }
    val df = rows.toDF("doc_id", "q", "t")
    def reference(budget: Long): Set[Long] = {
      var acc = 0L
      rows.sortBy { case (id, q, _) => (-q, id) }
        .iterator.takeWhile { case (_, _, t) => val in = acc < budget; acc += t; in }
        .map(_._1).toSet
    }
    // deliberately low nBuckets so whole-bucket AND boundary paths engage
    for (budget <- Seq(0L, 1L, 500L, 2000L, 5000L, 100000L)) {
      val got = Sampling.selectByTokenBudget(df, col("q"), col("t"), budget,
          nBuckets = 8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === reference(budget), s"budget=$budget")
    }
    // layout-independent
    val a = Sampling.selectByTokenBudget(df.repartition(13), col("q"), col("t"),
      2000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === reference(2000L))
  }

  test("selectByTokenBudgetQuantile ≡ fixed-width ≡ global greedy under " +
    "pathological skew, where uniform buckets collapse") {
    import spark.implicits._
    // all qualities crammed into [0.99990, 0.99997]: every fixed-width
    // bucket but one is empty, the quantile edges still split the mass
    val rows = (0L until 300L).map { i =>
      (i, 0.9999 + (i % 8).toDouble * 1e-8, 10L + i % 13)
    }
    val df = rows.toDF("doc_id", "q", "t")
    def reference(budget: Long): Set[Long] = {
      var acc = 0L
      rows.sortBy { case (id, q, _) => (-q, id) }
        .iterator.takeWhile { case (_, _, t) => val in = acc < budget; acc += t; in }
        .map(_._1).toSet
    }
    for (budget <- Seq(0L, 700L, 2500L, 100000L)) {
      val fixed = Sampling.selectByTokenBudget(df, col("q"), col("t"), budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val quant = Sampling.selectByTokenBudgetQuantile(df, col("q"), col("t"),
          budget, nBuckets = 8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(fixed === reference(budget), s"fixed budget=$budget")
      assert(quant === reference(budget), s"quantile budget=$budget")
    }
    // null quality → worst, both arms; layout invariance of the quantile arm
    val withNull = rows.toDF("doc_id", "q", "t")
      .withColumn("q", when(col("doc_id") === 7L, lit(null)).otherwise(col("q")))
    val qn = Sampling.selectByTokenBudgetQuantile(withNull, col("q"), col("t"),
      700L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!qn.contains(7L))
    val re = Sampling.selectByTokenBudgetQuantile(df.repartition(11), col("q"),
      col("t"), 2500L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re === reference(2500L))
  }

  test("quantileBucket actually SPREADS the mass (the when-chain must check " +
    "the largest edge first, or everything collapses into bucket 1)") {
    import spark.implicits._
    val df = (0 until 800).map(i => i * 0.001 + 0.1).toDF("quality")
    val edges = (1 until 8).map(k => 0.1 + k * 0.1) // 7 ascending edges
    val counts = df.withColumn("b", Sampling.quantileBucket(edges))
      .groupBy("b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // uniform data over 8 equal ranges → every bucket holds ~100 docs
    assert(counts.keySet === (0 to 7).toSet, s"got $counts")
    assert(counts.values.max <= 110, s"collapsed distribution: $counts")
    // top quality lands in the TOP bucket
    val top = df.agg(max("quality")).head().getDouble(0)
    val topB = Seq(top).toDF("quality")
      .select(Sampling.quantileBucket(edges)).head().getInt(0)
    assert(topB === 7)
  }

  test("shardByTokens == global hash-order window; balanced; null-safe") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, 5L + i % 23))
    val df = rows.toDF("doc_id", "t")
    val perShard = 200L
    // naive reference: global (md5(doc_id), doc_id) order, running sum
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md5.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    var acc = 0L
    val expect = rows.sortBy { case (id, _) => (h(id), id) }.map { case (id, t) =>
      val off = acc; acc += t; (id, off / perShard, off, t)
    }.toSet
    for (prefixChars <- Seq(1, 2)) {
      val got = Sampling.shardByTokens(df, col("doc_id"), col("t"), perShard,
          prefixChars)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got === expect, s"prefixChars=$prefixChars")
    }
    // layout-independent
    val again = Sampling.shardByTokens(df.repartition(17), col("doc_id"),
        col("t"), perShard)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again === expect)
    // balance: every shard's tokens fit perShard + one doc's overhang
    val maxDoc = rows.map(_._2).max
    val byShard = expect.groupBy(_._2).view.mapValues(_.toSeq.map(_._4).sum)
    byShard.foreach { case (sid, tot) =>
      assert(tot <= perShard + maxDoc, s"shard $sid holds $tot tokens")
    }
    // null tokens count 0 and do not advance the offset
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(10L)))
      .toDF("doc_id", "t")
    val n = Sampling.shardByTokens(withNull, col("doc_id"), col("t"), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(n(2L) === 0L)
    assert(n.values.sum === 20L)
    // prefixChars out of the [1, 4] guard
    intercept[IllegalArgumentException] {
      Sampling.shardByTokens(df, col("doc_id"), col("t"), perShard, 5)
    }
  }

  test("shardByTokens wide-prefix arm: > MaxLiteralRuns runs take the " +
    "broadcast join, output still == global hash-order window") {
    import spark.implicits._
    // enough docs that 4-hex-char prefixes yield > 4096 distinct runs
    // (deterministic: md5 prefixes of 0..5999)
    val rows = (0L until 6000L).map(i => (i, 3L + i % 17))
    val df = rows.toDF("doc_id", "t")
    val perShard = 500L
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md5.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val nRuns = rows.map { case (id, _) => h(id).take(4) }.distinct.size
    assert(nRuns > Sampling.MaxLiteralRuns,
      s"fixture must exceed the literal-map ceiling, got $nRuns runs")
    var acc = 0L
    val expect = rows.sortBy { case (id, _) => (h(id), id) }.map { case (id, t) =>
      val off = acc; acc += t; (id, off / perShard, off, t)
    }.toSet
    val plan = Sampling.shardByTokens(df, col("doc_id"), col("t"), perShard,
      prefixChars = 4)
    assert(plan.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "wide-prefix arm must map run bases via a broadcast join, not a " +
        "multi-thousand-entry literal map")
    val got = plan.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
  }

  test("selectByTokenBudget: NaN quality sorts first under DESC and must " +
    "land in the TOP bucket, matching the global greedy prefix") {
    import spark.implicits._
    // budget covers only 2 docs; the NaN doc is first in Spark's DESC
    // order (NaN > every double), so the greedy prefix takes NaN + 0.9
    val docs = Seq(
      (1L, 0.9, 10L), (2L, Double.NaN, 10L), (3L, 0.5, 10L))
      .toDF("doc_id", "q", "t")
    val kept = Sampling.selectByTokenBudget(docs, col("q"), col("t"), 20L)
      .select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val globalOrder = docs.orderBy(col("q").desc, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).take(2).toSet
    assert(globalOrder === Set(2L, 1L),
      "precondition: Spark sorts NaN first under DESC")
    assert(kept === globalOrder,
      "bucketed selection must equal the global greedy prefix under NaN")
  }

  test("shardByTokens: a NULL key shards deterministically instead of " +
    "crashing the driver-side run census") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), 10L), (2L, None: Option[String], 10L))
      .toDF("doc_id", "k", "t")
    val got = Sampling.shardByTokens(df, col("k"), col("t"),
        tokensPerShard = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L), "every doc must be placed")
  }

  test("temperatureRates: alpha=1 natural, alpha=0 uniform-over-strata, monotone") {
    import spark.implicits._
    // shares: a=1000/1310, b=300/1310, c=10/1310; null strata are ignored
    val df = (Seq.fill(1000)(Some("a")) ++ Seq.fill(300)(Some("b")) ++
      Seq.fill(10)(Some("c")) ++ Seq.fill(7)(Option.empty[String]))
      .toDF("src")
    assert(Sampling.temperatureRates(df, col("src"), 0.5).keySet ===
      Set("a", "b", "c"))
    val r1 = Sampling.temperatureRates(df, col("src"), alpha = 1.0)
    assert(r1.values.forall(_ === 1.0), "alpha=1 keeps the natural mix")
    val r0 = Sampling.temperatureRates(df, col("src"), alpha = 0.0)
    // rates inverse to share, rarest pegged at maxRate: expected kept
    // counts n_s * r_s equal across strata
    assert(r0("c") === 1.0)
    assert(math.abs(1000 * r0("a") - 10 * r0("c")) < 1e-6)
    assert(math.abs(300 * r0("b") - 10 * r0("c")) < 1e-6)
    // intermediate alpha: rarer stratum never keeps at a lower rate
    val rh = Sampling.temperatureRates(df, col("src"), alpha = 0.5)
    assert(rh("c") >= rh("b") && rh("b") >= rh("a"))
    assert(rh("a") > r0("a"), "alpha=0.5 downweights the head less than alpha=0")
    // feeds weightedMixture: expected kept mass matches share^alpha mix
    val kept = Sampling.weightedMixture(
        df.withColumn("doc_id", monotonically_increasing_id()),
        col("src"), col("doc_id"), r0, defaultRate = 0.0)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each stratum should keep ≈ 10 rows (uniform-over-strata target)
    assert(kept("c") === 10L)
    assert(kept.getOrElse("a", 0L) >= 2L && kept("a") <= 30L)
  }

  test("stratifiedQuota: exact per-stratum quotas, dense 1-based ranks") {
    import spark.implicits._
    val rows = (0L until 5L).map(i => ("small", i)) ++
      (0L until 20L).map(i => ("big", 100L + i))
    val df = rows.toDF("lang", "doc_id")
    val got = Sampling.stratifiedQuota(df, col("lang"), col("doc_id"), 10)
    val counts = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("small" -> 5L, "big" -> 10L))
    val ranks = got.filter(col("lang") === "big")
      .select("rn").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq === (1 to 10))
    // deterministic: same selection from a different layout
    val again = Sampling.stratifiedQuota(df.repartition(7), col("lang"),
      col("doc_id"), 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("packGreedy: offsets are shard-local prefix sums, seq_id = offset div budget") {
    import spark.implicits._
    val docs = (0L until 97L).map(i => (i, (i % 13 + 1) * 7)).toDF("doc_id", "tok")
    val packed = Sampling.packGreedy(docs, shard = col("doc_id") % 4,
        order = col("doc_id"), tokens = col("tok"), budget = 100L)
      .select("shard", "doc_id", "n_tokens", "start_offset", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      var expectOffset = 0L
      ordered.foreach { case (_, _, tok, off, seq) =>
        assert(off === expectOffset, "start_offset must be the shard-local prefix sum")
        assert(seq === off / 100L)
        expectOffset += tok
      }
    }
    // layout-invariant
    val again = Sampling.packGreedy(docs.repartition(11), shard = col("doc_id") % 4,
        order = col("doc_id"), tokens = col("tok"), budget = 100L)
      .select("shard", "doc_id", "n_tokens", "start_offset", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSet === packed.toSet)
  }

  test("invalid arguments rejected: unsorted/malformed bounds, bad budget, regex denylist") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("doc_id"), Seq("a" -> "e6", "b" -> "cc"), "c")
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("doc_id"), Seq("a" -> "zz9"), "c")
    }
    intercept[IllegalArgumentException] {
      Sampling.packGreedy(df, col("doc_id"), col("doc_id"), lit(1), budget = 0L)
    }
    intercept[IllegalArgumentException] {
      TF.denylistPattern(Seq("a.b|c"))
    }
    // md5 hex is lowercase: "C0" would silently sample 62.5% instead of 75%
    intercept[IllegalArgumentException] {
      Sampling.sampleByHash(df, col("doc_id"), "C0")
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleByHash(df, col("doc_id"), "")
    }
  }

  test("scrubPii: structural patterns + denylist redact; counts match") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact a.b@example.com or http://ex.com/x?id=9 call 12345678 customer"),
      (2L, "nothing sensitive here"),
      (3L, "digits 123456 stay, 1234567 goes; visit https://a.b/c then supplier x"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TF.scrubPii(col("text"), Seq("customer", "supplier")).as("s"),
        TF.redactionCount(col("text"), Seq("customer", "supplier")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got(1L)._1 === "contact <EMAIL> or <URL> call <NUM> <TERM>")
    assert(got(1L)._2 === 4)
    assert(got(2L) === (("nothing sensitive here", 0)))
    // 6-digit run survives ({7,} floor), 7-digit goes; URL + denylist hit
    assert(got(3L)._1 === "digits 123456 stay, <NUM> goes; visit <URL> then <TERM> x")
    assert(got(3L)._2 === 3)
  }
}
