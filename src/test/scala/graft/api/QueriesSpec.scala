package graft.api

import graft.SparkSuite
import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs and returns rows at sf0.001, and the
  * flagship entry is non-empty — mirrors the driver's smoke check. */
class QueriesSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("no duplicate query names; every oracle key has a query") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      // near-dup / similarity queries may legitimately return 0 rows at
      // this tiny scale; everything else must produce rows
      val n = df.count()
      if (!Set("q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash",
          "q_dedup_embed", "q_sim_range").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
