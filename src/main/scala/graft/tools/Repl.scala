package graft.tools

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.engine.{GraftSession, Tables}

/** Interactive SQL shell — the equivalent of the reference's REPL entry
  * point (reference: src/main.rs:6-14 → src/cli.rs:10-38), with the same
  * meta-commands:
  *   \dt                      list tables        (reference: src/cli.rs:118-119)
  *   \load csv <name> <path>  register a CSV     (reference: src/cli.rs:111-129)
  *   \explain <sql>           plan tree          (reference pretty-prints its
  *                            plan via src/util/mod.rs:14-16 +
  *                            src/optimizer/plan_node/mod.rs:45-50; the Spark
  *                            equivalent is the extended explain — parsed /
  *                            analyzed / optimized logical + physical plan,
  *                            with the pushdown detail the reference lacks)
  *   \pretty <sql>            bordered table     (reference renders interactive
  *                            results through Arrow's prettyprint,
  *                            src/util/mod.rs:9-11 — +---+ borders, one cell
  *                            per value; same shape here, same NULL/(empty)
  *                            cell rules as the SLT renderer)
  *   <sql>                    run through spark.sql
  * Rendering matches the reference's SLT rules (src/util/mod.rs:27-54):
  * space-separated values, NULL for nulls, (empty) for empty strings.
  */
object Repl {

  /** Handle one input line; returns the rendered output. Pure enough to be
    * unit-tested without a terminal.
    */
  def handle(spark: SparkSession, line: String): String = {
    val trimmed = line.trim
    try {
      if (trimmed.isEmpty) ""
      else if (trimmed == "\\dt") {
        render(spark, "SHOW TABLES")
      } else if (trimmed.startsWith("\\load csv ")) {
        val parts = trimmed.split("\\s+")
        if (parts.length != 4) "usage: \\load csv <name> <path>"
        else {
          val df = Tables.loadCsv(spark, parts(2), parts(3))
          s"loaded ${parts(2)} (${df.schema.fields.length} columns)"
        }
      } else if (trimmed == "\\pretty" || trimmed.startsWith("\\pretty ")) {
        val sql = trimmed.stripPrefix("\\pretty").trim
        if (sql.isEmpty) "usage: \\pretty <sql>"
        else prettyRender(spark, sql)
      } else if (trimmed == "\\explain" || trimmed.startsWith("\\explain ")) {
        val sql = trimmed.stripPrefix("\\explain").trim
        if (sql.isEmpty) "usage: \\explain <sql>"
        else spark.sql(sql).queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)
      } else render(spark, trimmed)
    } catch {
      case NonFatal(e) => s"error: ${e.getMessage}"
    }
  }

  /** Arrow-prettyprint-shaped rendering: +---+ borders, left-aligned cells
    * padded to the column's widest value. Cell values follow the same
    * NULL/(empty) rules as [[render]]. Driver-side by nature (a REPL prints
    * what fits a terminal) — not a query-path operator.
    */
  private def prettyRender(spark: SparkSession, sql: String): String = {
    val df = spark.sql(sql)
    val header = df.schema.fieldNames.toSeq
    val rows = df.collect().toSeq.map(_.toSeq.map {
      case null => "NULL"
      case "" => "(empty)"
      case v => v.toString
    })
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def bar: String = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    (Seq(bar, line(header), bar) ++ rows.map(line) :+ bar).mkString("\n")
  }

  private def render(spark: SparkSession, sql: String): String = {
    val df = spark.sql(sql)
    val header = df.schema.fieldNames.mkString(" ")
    val rows = df.collect().map { row =>
      row.toSeq.map {
        case null => "NULL"
        case "" => "(empty)"
        case v => v.toString
      }.mkString(" ")
    }
    (header +: rows).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-repl")
    args.headOption.foreach(dir => Tables.registerAll(spark, dir))
    println("graft> enter SQL, \\dt, \\load csv <name> <path>, " +
      "\\explain <sql>, \\pretty <sql>, or \\q")
    Iterator.continually(scala.io.StdIn.readLine("graft> "))
      .takeWhile(l => l != null && l.trim != "\\q")
      .foreach(l => println(handle(spark, l)))
    spark.stop()
  }
}
