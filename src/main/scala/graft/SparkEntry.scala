package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine.GraftSession

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real content lives in [[Registry]]; this object just adapts it.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 — the reference's scan→filter→group-agg pipeline at full width.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Registry.byName("q10_tpch_q1").run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.specs.map(s => s.name -> s.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.specs.flatMap(s => s.oracle.map(o => s.name -> o)).toMap
}
