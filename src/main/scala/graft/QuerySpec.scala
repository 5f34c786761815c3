package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query exposed through the driver contract.
  *
  * @param name    stable id — keys `SparkEntry.queries` / `oracleSql`
  * @param run     (session, sfDir) → result DataFrame. Must be deterministic:
  *                ordered output, cross-engine-exact numerics (see
  *                [[graft.engine.Exact]]).
  * @param oracle  equivalent DuckDB SQL over the same parquet tables, with
  *                matching output column names + ORDER BY. None → the op is
  *                not SQL-expressible; driver records a rows-only check and
  *                a ScalaTest spec carries correctness.
  * @param headline included in the Bench headline timing set.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
)
