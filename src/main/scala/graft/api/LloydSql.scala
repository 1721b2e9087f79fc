package graft.api

/** DuckDB restatement of [[graft.operators.Similarity]]'s Lloyd/k-means
  * training loop — the oracle twin that converts the k-means-derived query
  * family (diversity sampling, IVF ANN, SemDeDup cells, PQ codebooks) from
  * rows-only checks into full hash proofs.
  *
  * Restatable because the engine's training is bit-deterministic BY
  * CONSTRUCTION (Similarity.lloyd):
  *  - init = first k vectors by vec_id (plain ORDER BY/LIMIT);
  *  - assignment = argmax over per-cell scores computed as left-to-right
  *    double dot products (DuckDB `list_reduce` folds from the first
  *    element, which equals the engine's 0.0-seeded fold for finite
  *    doubles), ties to the HIGHEST cell id (Spark's `array_max` over
  *    (s, c) structs ≡ DuckDB `max` over the same struct shape);
  *  - mean update = exact integer accumulation of `floor(x · 1e10)` units
  *    (one IEEE double product + floor per element — bit-identical on both
  *    engines — then an orderless integer sum), divided back in the same
  *    scalar-double expression shape on both sides.
  *
  * The iteration count is a fixed small constant, so the loop UNROLLS into
  * a plain CTE chain — no recursive CTE, none of DuckDB's
  * aggregate-over-recursion limits apply. */
object LloydSql {

  /** Left-to-right double dot product of two SQL list expressions
    * (elements cast to DOUBLE; exact for FLOAT/DOUBLE inputs). */
  def dot(a: String, b: String): String =
    s"list_reduce([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) " +
      s"for i in range(1, len($a) + 1)], (acc, v) -> acc + v)"

  /** ‖v‖²/2 of a DOUBLE-list SQL expression — the engine's driver-side
    * `0.5 * c.map(x => x * x).sum` (left fold over squares, then scale). */
  private def halfSq(v: String): String =
    s"0.5 * list_reduce([y * y for y in $v], (acc, v) -> acc + v)"

  /** Per-cell assignment score: spherical = dot; l2 = dot − ‖c‖²/2 (argmin
    * L2 restated as argmax, the engine's cellStructsL2). */
  private def score(vec: String, cent: String, l2: Boolean): String =
    if (l2) s"${dot(vec, cent)} - ${halfSq(cent)}"
    else dot(vec, cent)

  /** CTE chain `{p}_c0 .. {p}_c{iterations}` training k centroids over
    * `src` (a table/CTE with BIGINT `vec_id` + FLOAT/DOUBLE-list
    * `embedding`). Returns CTE text WITHOUT the leading WITH, ending in a
    * trailing comma so callers append their own CTEs. The final centroid
    * relation is `{p}_c{iterations}` (cell INTEGER, cent DOUBLE[]). */
  def centroidCtes(p: String, src: String, k: Int, iterations: Int,
      l2: Boolean): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${p}_c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         |         [CAST(x AS DOUBLE) for x in embedding] AS cent
         |  FROM (SELECT vec_id, embedding FROM $src ORDER BY vec_id LIMIT $k)
         |),
         |""".stripMargin)
    for (i <- 1 to iterations) {
      sb.append(
        s"""${p}_a$i AS (
           |  SELECT e.vec_id, e.embedding,
           |         (max({'s': ${score("e.embedding", "c.cent", l2)}, 'c': c.cell})).c AS cell
           |  FROM $src e CROSS JOIN ${p}_c${i - 1} c
           |  GROUP BY e.vec_id, e.embedding
           |),
           |${p}_u$i AS (
           |  SELECT a.cell, t.u.dim AS dim,
           |         (CAST(sum(CAST(floor(CAST(t.u.x AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
           |            / count(*)) / 1e10 AS m
           |  FROM ${p}_a$i a,
           |       unnest([{'dim': i, 'x': a.embedding[i+1]} for i in range(0, len(a.embedding))]) AS t(u)
           |  GROUP BY a.cell, t.u.dim
           |),
           |${p}_c$i AS (
           |  SELECT prev.cell, coalesce(upd.cent, prev.cent) AS cent
           |  FROM ${p}_c${i - 1} prev
           |  LEFT JOIN (SELECT cell, list(m ORDER BY dim) AS cent
           |             FROM ${p}_u$i GROUP BY cell) upd USING (cell)
           |),
           |""".stripMargin)
    }
    sb.toString
  }

  /** Assignment CTE `{p}_asg` of every `src` row to its best cell under
    * the trained centroids `{p}_c{iterations}`: (vec_id, embedding, cell,
    * best_s) — `best_s` is the winning score (the raw argmax dot for
    * spherical; SemDeDup's centroid-cosine numerator). Trailing comma. */
  def assignCte(p: String, src: String, iterations: Int,
      l2: Boolean = false): String =
    s"""${p}_asg AS (
       |  SELECT vec_id, embedding, (best).c AS cell, (best).s AS best_s
       |  FROM (
       |    SELECT e.vec_id, e.embedding,
       |           max({'s': ${score("e.embedding", "c.cent", l2)}, 'c': c.cell}) AS best
       |    FROM $src e CROSS JOIN ${p}_c$iterations c
       |    GROUP BY e.vec_id, e.embedding
       |  )
       |),
       |""".stripMargin
}
