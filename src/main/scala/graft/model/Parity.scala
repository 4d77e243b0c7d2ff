package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity idioms shared by every query in `graft.SparkEntry`.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL, so every result must be bit-deterministic across engines AND
  * across partition orders. Floating-point `sum`/`avg` are NOT
  * order-independent, so money-like measures are accumulated as integer
  * cents (exact, associative, commutative — safe under any shuffle order,
  * which is also exactly what a 1000-executor partial-aggregate needs) and
  * divided back once at the end. Order-dependent-but-tiny accumulations
  * (corr) are rounded instead.
  */
object Parity {

  /** Exact order-independent SUM of a money-like double: accumulate integer
    * cents, divide once. DuckDB mirror:
    * `CAST(SUM(CAST(ROUND(x*100,0) AS BIGINT)) AS DOUBLE)/100.0`.
    */
  def moneySum(c: Column): Column =
    sum(round(c * 100, 0).cast("long")).cast("double") / 100.0

  /** Exact order-independent AVG via cents-sum / count. DuckDB mirror:
    * `CAST(SUM(CAST(ROUND(x*100,0) AS BIGINT)) AS DOUBLE)/100.0/COUNT(x)`.
    */
  def moneyAvg(c: Column): Column =
    sum(round(c * 100, 0).cast("long")).cast("double") / 100.0 / count(c)

  /** Round a derived double for cross-engine compare (used for ratios,
    * correlations, cosine similarities — O(1) magnitudes where the
    * engine-to-engine delta is ~1e-12, far below the rounding unit). */
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)
}
