package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's sqllogictest corpus
  * (reference: tests/slt/{select,filter,aggregation}.slt, runner at
  * tests/sqllogictest/src/lib.rs:23-44) — same queries, same fixtures, same
  * rendering rules (reference: src/util/mod.rs:27-54: space-separated, NULL
  * for nulls, "(empty)" for empty strings). The reference's group output
  * order is first-appearance (hash_agg.rs:94-95), Spark's is
  * nondeterministic, so both sides are sorted before comparing (SURVEY.md §5).
  *
  * Fixtures load through Tables.loadCsv, which restores Arrow's CSV
  * semantics (empty field = "" for strings, NULL for numerics).
  */
class SltSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def res(name: String): String =
    getClass.getResource(s"/csv/$name.csv").getPath

  private lazy val loaded: Unit = {
    Seq("employee", "department").foreach { t =>
      graft.engine.Tables.loadCsv(spark, t, res(t))
    }
  }

  /** Reference rendering: src/util/mod.rs:27-54. */
  private def render(df: DataFrame): Seq[String] =
    df.collect().toSeq.map { (row: Row) =>
      row.toSeq.map {
        case null => "NULL"
        case "" => "(empty)"
        case d: Double if d == d.floor && !d.isInfinite => d.toLong.toString
        case v => v.toString
      }.mkString(" ")
    }

  private def check(sql: String, expected: String): Unit = {
    loaded
    val got = render(spark.sql(sql)).sorted
    val exp = expected.stripMargin.trim.split("\n").toSeq.map(_.trim).sorted
    assert(got == exp, s"\nquery: $sql\ngot:\n${got.mkString("\n")}")
  }

  test("select.slt: projection with NULL and (empty) rendering") {
    check(
      "select first_name, state, id, salary from employee",
      """Bill CA 1 12000
        |Gregg CO 2 10000
        |John CO 3 11500
        |Von (empty) 4 NULL""")
  }

  test("filter.slt: where id > 2") {
    check(
      "select first_name from employee where id > 2",
      """John
        |Von""")
  }

  test("aggregation.slt: global sum") {
    check("select sum(salary) from employee", "33500")
  }

  test("aggregation.slt: sum/count over exprs with where") {
    check(
      "select sum(salary), sum(id+1), count(id), count(salary) from employee where id > 1",
      "21500 12 3 2")
  }

  test("aggregation.slt: max/min incl. string max") {
    check(
      "select max(salary), min(id), max(last_name) from employee",
      "12000 1 Travis")
  }

  test("aggregation.slt: group by numeric key with NULL group") {
    check(
      "select salary, count(id), sum(salary), max(salary), min(salary) from employee group by salary",
      """12000 1 12000 12000 12000
        |10000 1 10000 10000 10000
        |11500 1 11500 11500 11500
        |NULL 1 NULL NULL NULL""")
  }

  test("aggregation.slt: group by string key with empty-string group") {
    check(
      "select state, count(state), sum(salary), max(salary), min(salary) from employee group by state",
      """CA 1 12000 12000 12000
        |CO 2 21500 11500 10000
        |(empty) 1 NULL NULL NULL""")
  }

  test("aggregation.slt: multi-column group by") {
    check(
      "select state, id, count(state), sum(salary), max(salary), min(salary) from employee group by state, id",
      """CA 1 1 12000 12000 12000
        |CO 2 1 10000 10000 10000
        |CO 3 1 11500 11500 11500
        |(empty) 4 1 NULL NULL NULL""")
  }

  test("beyond-reference: the ops the reference binds but panics on execute") {
    // != / AND / OR / % / unary minus / alias / NOT
    // (reference: src/executor/array_compute.rs:62-65 todo!())
    check(
      "select -id as neg, id % 2 as m from employee where id != 1 and (id > 3 or id = 2)",
      """-2 0
        |-4 0""")
  }

  test("unresolvable columns and tables raise analysis errors (binder parity)") {
    loaded
    // reference: binder rejects unknown columns/tables (src/binder/mod.rs)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select no_such_col from employee").collect()
    }
    assert(e1.getMessage.contains("no_such_col"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select 1 from no_such_table").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("no_such_table"))
  }

  test("show tables lists the loaded fixtures") {
    loaded
    val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(Set("employee", "department").subsetOf(tables))
  }

  test("csv schema inference parity on the reference fixtures") {
    loaded
    // reference: Arrow infers from the first 10 records
    // (reference src/storage/csv.rs:103) → employee gets int64 for
    // id/salary/department_id, utf8 for the names. Spark's inference lands
    // on the same integer/string split (width differs: int vs int64 —
    // both engines then evaluate the SLT corpus identically, which the
    // render-based tests above pin).
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val sch = spark.table("employee").schema
    def dt(c: String) = sch(c).dataType
    assert(dt("id") == IntegerType && dt("salary") == IntegerType &&
      dt("department_id") == IntegerType)
    assert(Seq("first_name", "last_name", "state", "job_title")
      .forall(dt(_) == StringType))
  }

  test("csv inference on a type-ambiguous file: int-looking prefix, float past record 10") {
    // The ambiguous fixture is integer for its first 10 records and becomes
    // a float at record 11 (then empty at 12). A strict 10-record inference
    // (the reference's Arrow setup) commits to int64 and then fails the
    // read at '3.5'; Spark samples the whole file by default
    // (samplingRatio=1.0), infers double, and reads every row. The SAME
    // loadCsv path also restores the Arrow empty-vs-NULL semantics: the
    // empty `note` on the last row is "" (string), the empty `x` is NULL
    // (numeric).
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
    val df = graft.engine.Tables.loadCsv(spark, "ambiguous", res("ambiguous"))
    val sch = df.schema
    assert(sch("id").dataType == IntegerType)
    assert(sch("x").dataType == DoubleType, s"x inferred as ${sch("x").dataType}")
    assert(sch("note").dataType == StringType)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 12)
    assert(rows(10).getDouble(1) == 3.5)
    assert(rows(11).isNullAt(1) && rows(11).getString(2) == "")
  }

  test("beyond-reference: join employee to department (reference has no joins)") {
    check(
      """select e.first_name, d.name from employee e
        |join department d on e.department_id = d.id order by e.id""".stripMargin,
      """Bill IT
        |Gregg Marketing
        |John Engineering""")
  }
}
