package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.semanticNearDups]] / [[Similarity.semDedupDecisions]] —
  * cluster-then-compare semantic dedup (SemDeDup, Abbas et al. 2023).
  * Cell assignment is k-means-dependent so the gate query is rows-only;
  * these specs are the correctness contract instead. */
class SemDedupSpec extends AnyFunSuite with SparkSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
    .select("vec_id", "embedding")

  /** The planted-clone corpus of q_dedup_embed_banded: every 25th vector
    * gains a copy at vec_id+100000 with the first element negated —
    * near-identical pairs (cos ∈ [0.89, 1)) that a semantic dedup must
    * catch. */
  private lazy val planted = {
    val clones = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        concat(array(-element_at(col("embedding"), 1)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    emb.unionByName(clones)
  }

  test("semantic pairs ⊆ exact pairs, with identical snapped cosines") {
    val sem = Similarity.semanticNearDups(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.embeddingNearDupsBrute(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sem.nonEmpty, "no semantic pairs found at 0.45 on test embeddings")
    sem.foreach { case (ids, cos) =>
      assert(exact.contains(ids), s"pair $ids not in exact set")
      assert(exact(ids) == cos, s"cos mismatch for $ids")
    }
  }

  test("planted near-identical clones: recall 1 at tight threshold") {
    val expected = emb.filter(col("vec_id") % 25 === 0)
      .select("vec_id").collect().map(_.getLong(0))
      .map(id => (id, id + 100000L)).toSet
    val sem = Similarity.semanticNearDups(planted, 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a clone differs from its source by one negated coordinate — cosine
    // ≈ 1, so k-means must co-locate each pair (the SemDeDup recall
    // argument); every planted pair must surface
    assert(expected.subsetOf(sem),
      s"missed planted pairs: ${expected -- sem}")
  }

  test("decisions: exactly one keep per cluster, keeper is least prototypical") {
    val dec = Similarity.semDedupDecisions(planted, 0.85).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every corpus member decided exactly once
    assert(dec.map(_._1).distinct.length === dec.length)
    assert(dec.length === planted.count())
    // one keeper per cluster; singletons keep themselves
    dec.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._3) === 1, s"cluster $cid keeps != 1")
      if (members.length == 1) assert(members.head._3, s"singleton $cid dropped")
    }
    // at least the planted clusters are non-singleton
    assert(dec.groupBy(_._2).values.count(_.length > 1) >= 1)
  }

  test("deterministic and layout-invariant") {
    val a = Similarity.semDedupDecisions(emb, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val b = Similarity.semDedupDecisions(emb.repartition(7), 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
