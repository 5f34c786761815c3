package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Skew, Tables}
import graft.tools.Repl

class ReplSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("\\load csv + \\dt + query reproduce the reference CLI session") {
    val path = getClass.getResource("/csv/employee.csv").getPath
    val loaded = Repl.handle(spark, s"\\load csv employee $path")
    assert(loaded == "loaded employee (7 columns)")
    assert(Repl.handle(spark, "\\dt").contains("employee"))
    val out = Repl.handle(spark,
      "select first_name from employee where id > 2 order by id")
    assert(out == "first_name\nJohn\nVon")
  }

  test("rendering rules: NULL and (empty)") {
    val path = getClass.getResource("/csv/employee.csv").getPath
    Repl.handle(spark, s"\\load csv employee $path")
    val out = Repl.handle(spark,
      "select state, salary from employee where id = 4")
    assert(out == "state salary\n(empty) NULL")
  }

  test("errors are reported, not thrown") {
    val out = Repl.handle(spark, "select * from no_such_table")
    assert(out.startsWith("error: "))
  }

  test("\\pretty renders a bordered table with NULL/(empty) cell rules") {
    val path = getClass.getResource("/csv/employee.csv").getPath
    Repl.handle(spark, s"\\load csv employee $path")
    val out = Repl.handle(spark,
      "\\pretty select first_name, state, salary from employee " +
        "where id in (3, 4) order by id")
    assert(out ==
      """+------------+---------+--------+
        || first_name | state   | salary |
        |+------------+---------+--------+
        || John       | CO      | 11500  |
        || Von        | (empty) | NULL   |
        |+------------+---------+--------+""".stripMargin, out)
    assert(Repl.handle(spark, "\\pretty") == "usage: \\pretty <sql>")
  }

  test("\\explain prints the optimized and physical plan") {
    val path = getClass.getResource("/csv/employee.csv").getPath
    Repl.handle(spark, s"\\load csv employee $path")
    val out = Repl.handle(spark,
      "\\explain select first_name from employee where id > 2")
    assert(out.contains("== Optimized Logical Plan =="), out)
    assert(out.contains("== Physical Plan =="), out)
    // the plan is the real one: the filter must appear as a pushed/planned
    // predicate, not vanish into a collect-then-filter
    assert(out.contains("id"), out)
    assert(Repl.handle(spark, "\\explain") == "usage: \\explain <sql>")
    assert(Repl.handle(spark, "\\explain select * from no_such_table")
      .startsWith("error: "))
  }

  test("salted join returns identical results to the plain join") {
    val ev = Tables(spark, sf, "events")
    val users = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val plain = ev.join(users, "user_id")
      .agg(sum(col("n_events")).as("s")).head().getLong(0)
    val salted = Skew.saltedJoin(
        ev, "user_id",
        users.withColumnRenamed("user_id", "u2"), "u2",
        nSalts = 8, saltSrc = col("event_id"))
      .agg(sum(col("n_events")).as("s")).head().getLong(0)
    assert(salted == plain)
  }
}
