package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-exact aggregation helpers.
  *
  * Summing doubles is order-dependent, and Spark's parallel partial/final
  * aggregation does not add values in the same order as a single-threaded
  * engine — so `sum(double)` is not bit-reproducible against the DuckDB
  * oracle (or even across Spark runs with different partitioning). The fix is
  * to accumulate exactly: cast each input double to DECIMAL(38,10) (a
  * deterministic rounding of the double's decimal expansion, identical in
  * both engines), sum exactly in decimal (associative → partitioning-
  * invariant), and cast the exact result back to double (IEEE
  * nearest-rounding, identical in both engines).
  *
  * This is also the right call at 100 TB: decimal sums are spillable
  * built-ins, stay inside whole-stage codegen, and make results invariant
  * under repartitioning — a reproducibility property the fp sum lacks.
  */
object Exact {

  private val Dec = DecimalType(38, 10)

  /** Exact, partitioning-invariant sum of a double column, as double.
    * Oracle SQL equivalent: CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
    */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact average: exact decimal sum, double division (deterministic).
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) /
    *         CAST(COUNT(x) AS DOUBLE)
    */
  def davg(c: Column): Column =
    dsum(c) / count(c).cast(DoubleType)

  /** SQL fragment builders so the Spark-side and oracle-side text stay in
    * lockstep when queries are written as SQL strings.
    */
  /** The DuckDB text has two extra VARCHAR hops, because Spark's double↔
    * decimal casts are string-mediated while DuckDB's are binary:
    *  - input double→decimal: Spark quantizes the double's SHORTEST STRING
    *    (BigDecimal.valueOf); DuckDB quantizes the binary expansion. For
    *    magnitudes above ~1e6 the decimal(38,10) grid is finer than the
    *    double's ulp and the two quantizations differ — the string hop makes
    *    DuckDB quantize the same shortest string.
    *  - output decimal→double: DuckDB divides in double arithmetic (not
    *    correctly rounded); Spark uses BigDecimal.doubleValue. The string
    *    hop forces the correctly-rounded parse.
    */
  def sqlSum(expr: String): String =
    s"CAST(CAST(SUM(CAST(CAST(($expr) AS VARCHAR) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"

  /** [[sqlSum]] with DECIMAL(18,10) per-term quantization — value-identical
    * whenever every term is below 10^8 in magnitude (rounding to scale 10
    * is width-independent; the SUM accumulator widens to (38,10) in DuckDB
    * regardless), but ~6× faster: the (38,10) form parses every term into
    * decimal128, which dominated t20's 13-pass sf1 oracle (53 s vs 9 s per
    * corpus pass, measured r14). Use ONLY where the term bound is proven —
    * an overflowing cast fails loudly, never silently.
    */
  def sqlSumNarrow(expr: String): String =
    s"CAST(CAST(SUM(CAST(CAST(($expr) AS VARCHAR) AS DECIMAL(18,10))) AS VARCHAR) AS DOUBLE)"

  /** Spark-SQL-side text of the same exact sum (for spark.sql queries).
    * Spark's own double↔decimal casts are already string-mediated, so no
    * VARCHAR hops are needed on this side.
    */
  def sqlSparkSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,10))) AS DOUBLE)"

  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / CAST(COUNT($expr) AS DOUBLE))"
}
