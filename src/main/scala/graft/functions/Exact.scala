package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine-deterministic arithmetic helpers.
 *
 * The driver's correctness gate hash-compares our parquet output against
 * DuckDB running the twin SQL. Floating-point SUMs are order-dependent, and
 * Spark's partial aggregation order differs run-to-run and engine-to-engine —
 * so every oracled aggregate over doubles goes through exact integer
 * fixed-point instead:
 *
 *   - per-row: `cents(x) = floor(x*100 + 0.5)` — both engines evaluate the
 *     identical IEEE-754 expression on the identical double, so the integer
 *     is identical (floor avoids engine-specific round-half behavior);
 *   - aggregate: SUM over BIGINT is exact and order-independent;
 *   - display: one final `cents/100.0` division — a single IEEE op on
 *     identical inputs ⇒ identical double bits.
 *
 * This also makes rank/top-k over aggregated revenue deterministic, which
 * plain double sums cannot guarantee.
 */
object Exact {

  /** Money value → exact integer cents (LongType). */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** Generic fixed-point: x → floor(x * scale + 0.5) as long. */
  def fixed(c: Column, scale: Double): Column = floor(c * lit(scale) + lit(0.5)).cast("long")

  /** Exact cents sum rendered back to a double money amount. */
  def centsSumAsMoney(c: Column): Column = (sum(cents(c)) / lit(100.0))

  /** DuckDB twin of [[cents]] for oracle SQL strings. */
  def centsSql(expr: String): String = s"CAST(floor(($expr)*100.0 + 0.5) AS BIGINT)"

  /** DuckDB twin of [[centsSumAsMoney]]. DuckDB parses `100.0` as DECIMAL,
    * so cast the sum to DOUBLE first to force IEEE division like Spark's. */
  def centsSumAsMoneySql(expr: String): String =
    s"(CAST(sum(${centsSql(expr)}) AS DOUBLE) / 100.0)"

  /** md5-derived 60-bit integer hash, identical in Spark and DuckDB:
    * first 15 hex chars of md5 → bigint. The shared deterministic hash
    * primitive for minhash/simhash/LSH (both engines ship md5; their native
    * `hash()` functions differ). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[md5Long]]. */
  def md5LongSql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"

  /** 48-bit variant (12 hex chars) — used where bits are enumerated
    * (simhash) to keep shift arithmetic comfortably inside a BIGINT. */
  def md5Long48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  def md5Long48Sql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 12) AS BIGINT)"

  /** 28-bit variant (7 hex chars) — the base hash for universal-hash
    * families: small enough that a·h+b stays well inside BIGINT. */
  def md5Long28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  def md5Long28Sql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 7) AS BIGINT)"
}
