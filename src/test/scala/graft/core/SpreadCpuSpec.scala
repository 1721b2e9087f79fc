package graft.core

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.spreadCpu]] — the r13 scale-adaptive map-parallelism guard:
  * repartitions a below-parallelism input (a one-row-group parquet scan is
  * ONE task, serializing every expensive fused projection) and is the
  * IDENTITY when the input already has enough partitions (the production
  * case — no hard-coded local tuning may leak into cluster plans). */
class SpreadCpuSpec extends AnyFunSuite with SparkSuite {

  test("below-parallelism input is spread to defaultParallelism") {
    import spark.implicits._
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val spread = Tables.spreadCpu(narrow)
    assert(spread.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // row set is unchanged (round-robin only moves rows)
    assert(spread.agg(sum("x")).head.getLong(0) === 5050L)
    assert(spread.count() === 100L)
  }

  test("at-or-above-parallelism input is returned untouched (identity)") {
    import spark.implicits._
    val wide = (1 to 100).toDF("x")
      .repartition(spark.sparkContext.defaultParallelism + 2)
    val out = Tables.spreadCpu(wide)
    // same object — no exchange added to an already-parallel plan
    assert(out eq wide)
  }

  test("caller-distributed input (explicit shuffle repartition) is honored") {
    import spark.implicits._
    val dp = spark.sparkContext.defaultParallelism
    assert(dp > 2, "suite parallelism too low to exercise the short-circuit")
    // r14: a shuffling Repartition already in the plan means the caller (or
    // an inner spreadCpu in a composed pipeline) chose the distribution —
    // spreadCpu must not second-guess it, and must not probe it (the .rdd
    // probe on an AQE plan materializes the lineage as throwaway jobs)
    val rp = (1 to 100).toDF("x").repartition(2)
    assert(Tables.spreadCpu(rp) eq rp)
    // … while a non-shuffle coalesce still spreads: narrowing parallelism
    // is exactly the condition spreadCpu exists to undo
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assert(Tables.spreadCpu(narrow).rdd.getNumPartitions === dp)
  }

  test("operator results are invariant under the spread (minhash pairs)") {
    import spark.implicits._
    // near-dup fixture: 0/1 share a long overlap, 2 is unrelated
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val single = docs.coalesce(1)
    val pairs1 = graft.operators.Dedup
      .minhashNearDups(single, threshold = 0.5)
      .orderBy("doc_id_1", "doc_id_2").collect()
    val pairsN = graft.operators.Dedup
      .minhashNearDups(docs.repartition(8), threshold = 0.5)
      .orderBy("doc_id_1", "doc_id_2").collect()
    assert(pairs1.toSeq === pairsN.toSeq)
    assert(pairs1.nonEmpty)
  }
}
