package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's ONE definition of the 64-register integer-exact
  * HyperLogLog discipline (Flajolet et al. 2007), shared by the batch
  * sketch gate (q61) and the streaming sketch view (cdc49) so the two
  * cannot drift from each other or from their mirrored DuckDB oracles:
  *
  *   - 60-bit md5 hash; top 6 bits route to one of m = 64 registers,
  *     the low 54 bits carry the rank ρ = 55 − bitlength(rest)
  *     (rest == 0 ⇒ ρ = 55, the all-zero maximum);
  *   - the harmonic sum Σ 2^−ρ is held as 48-bit FIXED POINT
  *     (2^(48−ρ) per present register, 2^48 per absent one) so both
  *     engines fold integers, never floats;
  *   - estimate = α₆₄·m²·2^48 / sum48 with α₆₄ ≈ 0.709 as the exact
  *     rational 709/1000.
  *
  * Register max is a commutative idempotent monoid — the merge law q61
  * gates as data and cdc49 leans on for redelivery-safe streaming
  * maintenance. */
object Hll {

  /** 2^54 — the low-bit remainder space below the 6 register bits. */
  val RestMask: Long = 18014398509481984L

  /** 2^48 — the fixed-point unit of the harmonic sum. */
  val One48: Long = 281474976710656L

  /** Register count. */
  val M: Int = 64

  /** Add `reg` and `rho` for the 60-bit md5 of `key`. */
  def withRegRho(df: DataFrame, key: Column): DataFrame =
    df.withColumn("_hll_h", conv(substring(
        md5(key.cast("string")), 1, 15), 16, 10).cast("long"))
      .withColumn("reg", expr("shiftright(_hll_h, 54)"))
      .withColumn("rho", when(expr(s"_hll_h % ${RestMask}L") === 0, lit(55))
        .otherwise(lit(55) - length(expr(s"bin(_hll_h % ${RestMask}L)")))
        .cast("int"))
      .drop("_hll_h")

  /** Aggregate: the 48-bit fixed-point register sum over a grouped
    * register table whose max-ρ column is named `r` (present registers
    * contribute 2^(48−r), the `M − count` absent ones 2^48 each). */
  def sum48OverR: Column =
    sum(expr(s"shiftright(${One48}L, cast(r as int))")) +
      (lit(M) - count(lit(1))) * lit(One48)

  /** The α·m² harmonic estimate from a 48-bit register-sum column, as
    * SQL text (for embedding in larger integer-exact expressions). */
  def estSql(sum48Col: String): String =
    s"(((${One48}L * ${M * M}) div $sum48Col) * 709) div 1000"

  /** The α·m² harmonic estimate from a 48-bit register-sum column. */
  def estExpr(sum48Col: String): Column = expr(estSql(sum48Col))
}
