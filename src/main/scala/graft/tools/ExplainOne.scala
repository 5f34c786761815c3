package graft.tools

import graft.Registry
import graft.engine.GraftSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dev utility: print the parquet scan nodes (table + required schema)
  * of one registered query's physical plan — the ScanAudit lens on a
  * single query, for plan iteration.
  * Usage: runMain graft.tools.ExplainOne <query> [sfDir] [formatted]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q10_tpch_q1")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("graft-explain", cores = 8,
      extraConf = Map("spark.sql.adaptive.enabled" -> "false"))
    spark.sparkContext.setLogLevel("ERROR")
    val df = Registry.byName(name).run(spark, dir)
    val plan = df.queryExecution.executedPlan
    plan.collectWithSubqueries {
      case f: FileSourceScanExec =>
        val t = f.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        println(s"[scan] $t: ${f.requiredSchema.fieldNames.mkString("+")}")
    }
    if (args.lift(2).contains("formatted")) println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
}
