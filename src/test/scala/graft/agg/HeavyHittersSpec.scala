package graft.agg

import graft.SparkSuite
import graft.operators.TextScoring
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MisraGriesAggregator]] superset guarantee + the exact two-pass
  * [[TextScoring.heavyHitters]] built on it. */
class HeavyHittersSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Zipf-ish corpus: key k appears ~C/k times — real skew, so the MG
    * capacity is far below the distinct-key count and eviction runs hot. */
  private def zipf(nKeys: Int, c: Int): Seq[String] =
    (1 to nKeys).flatMap(k => Seq.fill(math.max(1, c / k))(s"k$k"))

  test("MG summary keeps every key with freq > N/m (superset guarantee), " +
    "under adversarial partitioning") {
    val data = zipf(2000, 3000) // ~2000 distinct, heavy head
    val n = data.size
    val m = 64
    for (parts <- Seq(1, 7, 32); seed <- Seq(1, 9)) {
      val shuffled = new scala.util.Random(seed).shuffle(data)
      val (candArr, total) = shuffled.toDF("key").repartition(parts).as[String]
        .select(new MisraGriesAggregator(m).toColumn).head()
      val cands = candArr.toSet
      assert(total === n.toLong, "N must be measured in the same pass")
      assert(cands.size <= m)
      val truth = data.groupBy(identity).map { case (k, v) => k -> v.size }
      val mustKeep = truth.filter(_._2 > n / m).keySet
      assert(mustKeep.subsetOf(cands),
        s"parts=$parts seed=$seed missing ${mustKeep -- cands}")
    }
  }

  test("heavyHitters ≡ naive census at every threshold, layout-invariant") {
    val data = zipf(500, 1000)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = new scala.util.Random(3).shuffle(data).toDF("key")
    for (minCount <- Seq(1000L, 300L, 40L)) {
      val got = TextScoring.heavyHitters(df.repartition(11), col("key"), minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = truth.filter(_._2 >= minCount)
      assert(got === want, s"minCount=$minCount")
    }
  }

  test("guard: a minCount too small for the capacity cap throws loudly") {
    val df = (1 to 1000).map(i => s"k$i").toDF("key")
    intercept[IllegalArgumentException](
      TextScoring.heavyHitters(df, col("key"), minCount = 1L, capacityCap = 100))
    // nulls are ignored, not counted
    val withNulls = (Seq.fill(50)(Some("a")) ++ Seq.fill(5)(Option.empty[String]))
      .toDF("key")
    val got = TextScoring.heavyHitters(withNulls, col("key"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 50L)))
  }
}
