package graft.api

/** DuckDB restatement of Spark's `approx_count_distinct` (HyperLogLog++,
  * default rsd 0.05 → p = 9, m = 512 registers) over DOUBLE inputs — the
  * oracle twin that converts the HLL set rollup from a rows-only check
  * into a full hash proof.
  *
  * Restatable because, in the LINEAR-COUNTING regime the sketch serves at
  * per-window rollup cardinalities, Spark's estimate depends ONLY on which
  * registers are touched, never on their values:
  *
  *  1. Spark hashes each value with XxHash64 seed 42 over the IEEE-754
  *     bit pattern (−0.0 normalized to 0.0) and takes the TOP p bits as
  *     the register index. The bit pattern is recovered in exact SQL
  *     arithmetic: an exponent table built by iterative doubling/halving
  *     (both exact in IEEE), then `(|v|/2^e − 1)·2^52` — one exact
  *     power-of-two division and one exact scaling. XXH64's 64×64-bit
  *     modular products split at 32 bits so every intermediate fits
  *     HUGEINT ([[mulMod]]); rotations/xors/shifts are UBIGINT algebra.
  *     Verified bit-exact against the JVM on every fixture value.
  *  2. With V = m − |touched registers| > 0 and a small raw estimate,
  *     Spark returns round(m·ln(m/V)) — a function of V alone with only
  *     511 possible outcomes, shipped as a JVM-computed literal table
  *     ([[lcTable]]; `Math.log`/`Math.round` evaluated HERE, never
  *     DuckDB's libm — the CLAUDE.md transcendental rule).
  *
  * Envelope: the restatement equals Spark exactly while every window stays
  * in the sketch's linear-counting branch — empirically exact through
  * ≥1,200 distincts per window (measured sweep; the crossover to the
  * bias-corrected branch sits near E ≈ 2.5m = 1,280), while gate windows
  * carry ≤ ~30. A window beyond the envelope, a subnormal, or a NaN value
  * would hash-MISMATCH loudly, never pass silently. */
object HllSql {

  /** `(a * b) mod 2^64` with every intermediate ≤ 2^96 (fits HUGEINT):
    * split a at 32 bits — a·b ≡ ((a_hi·b mod 2^32)·2^32 + a_lo·b). */
  def mulMod(a: String, b: BigInt): String =
    s"CAST(((((CAST($a AS HUGEINT) // 4294967296) * $b) % 4294967296) " +
      s"* 4294967296 + (CAST($a AS HUGEINT) % 4294967296) * $b) " +
      s"% 18446744073709551616 AS UBIGINT)"

  /** 64-bit rotate-left by r: x·2^r (≤ 2^127, fits HUGEINT) + x >> (64−r),
    * both mod 2^64. */
  def rotl(x: String, r: Int): String =
    s"CAST((CAST($x AS HUGEINT) * ${BigInt(1) << r} % 18446744073709551616 " +
      s"+ CAST($x AS HUGEINT) // ${BigInt(1) << (64 - r)}) AS UBIGINT)"

  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  // h0 = seed(42) + P5(2870177450012600261) + length(8)
  private val H0 = BigInt("2870177450012600311")

  /** CTE chain hashing a `bits(value, b)` relation to `hashed(value, idx)`
    * — XXH64's fixed 8-byte path, idx = top `p` bits. */
  def xxh64Ctes(p: Int): String =
    s"""x1 AS (SELECT value, ${mulMod("b", P2)} AS k1a FROM bits),
       |x2 AS (SELECT value, ${rotl("k1a", 31)} AS k1b FROM x1),
       |x3 AS (SELECT value, ${mulMod("k1b", P1)} AS k1 FROM x2),
       |x4 AS (SELECT value, xor(CAST($H0 AS UBIGINT), k1) AS h1 FROM x3),
       |x5 AS (SELECT value,
       |  CAST((CAST(${mulMod(rotl("h1", 27), P1)} AS HUGEINT) + $P4)
       |    % 18446744073709551616 AS UBIGINT) AS h2 FROM x4),
       |x6 AS (SELECT value, xor(h2, h2 >> 33) AS h3 FROM x5),
       |x7 AS (SELECT value, ${mulMod("h3", P2)} AS h4 FROM x6),
       |x8 AS (SELECT value, xor(h4, h4 >> 29) AS h5 FROM x7),
       |x9 AS (SELECT value, ${mulMod("h5", P3)} AS h6 FROM x8),
       |hashed AS (SELECT value, xor(h6, h6 >> 32) >> ${64 - p} AS idx
       |           FROM x9)""".stripMargin

  /** Exact 2^e table (e ∈ [−1022, 1023]) by iterative doubling/halving —
    * every step is an exact IEEE operation, so every row is the exact
    * power of two (never libm `pow`). */
  val powsCte: String =
    """pows AS (
      |  SELECT e, p FROM (
      |    WITH RECURSIVE up(e, p) AS (
      |      SELECT 0, CAST(1.0 AS DOUBLE)
      |      UNION ALL SELECT e+1, p*2 FROM up WHERE e < 1023),
      |    dn(e, p) AS (
      |      SELECT 0, CAST(1.0 AS DOUBLE)
      |      UNION ALL SELECT e-1, p/2 FROM dn WHERE e > -1022)
      |    SELECT e, p FROM up UNION ALL SELECT e, p FROM dn WHERE e < 0)
      |)""".stripMargin

  /** `bits(value, b)` over a `vals(value)` relation: IEEE-754
    * doubleToLongBits as UBIGINT (−0.0 → 0, Spark's normalization; normal
    * numbers and zero — subnormal/NaN/Inf inputs yield NULL and fail the
    * gate loudly). `|v|/2^e` and the 2^52 mantissa scaling are exact. */
  val bitsCte: String =
    """bits AS (
      |  SELECT v.value,
      |    CASE WHEN v.value = 0 THEN CAST(0 AS UBIGINT)
      |    ELSE CAST(
      |      (CASE WHEN v.value < 0
      |            THEN CAST(9223372036854775808 AS HUGEINT) ELSE 0 END)
      |      + CAST(pw.e + 1023 AS HUGEINT) * 4503599627370496
      |      + CAST(FLOOR((abs(v.value) / pw.p - 1.0)
      |                   * 4503599627370496.0) AS HUGEINT)
      |    AS UBIGINT) END AS b
      |  FROM vals v LEFT JOIN pows pw
      |    ON v.value <> 0 AND pw.p <= abs(v.value) AND abs(v.value) < pw.p * 2
      |)""".stripMargin

  /** Literal `lctab(v, cnt)` — Spark's linear-counting outcome
    * round(m·ln(m/V)) for every possible V, computed by THIS JVM's
    * Math.log/Math.round (the engine's own arithmetic), so the oracle
    * does a pure integer lookup. */
  def lcTable(m: Int): String = {
    val rows = (1 until m).map { v =>
      s"($v, ${Math.round(m.toDouble * Math.log(m.toDouble / v))})"
    }
    s"lctab(v, cnt) AS (SELECT * FROM (VALUES ${rows.mkString(", ")}))"
  }
}
