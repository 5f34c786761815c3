package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Exact, Tables}
import graft.functions.ghash

/** Edge-case behavior: empty inputs, degenerate parameters, null paths. */
class EdgeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf
  import spark.implicits._

  test("global agg over zero rows: sums are NULL, counts are 0") {
    val empty = Tables(spark, sf, "lineitem").filter(col("l_quantity") < 0)
    val r = empty.agg(
      Exact.dsum(col("l_quantity")).as("s"),
      count(col("l_quantity")).as("n")).head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L)
  }

  test("group-by over zero rows produces zero groups") {
    val empty = Tables(spark, sf, "lineitem").filter(col("l_quantity") < 0)
    assert(empty.groupBy("l_returnflag").agg(count(lit(1))).count() == 0)
  }

  test("minhash/simhash of empty and single-token docs are well-defined") {
    val df = Seq("", "one", "one two three").toDF("text")
      .select(
        ghash.minhashSig(split(col("text"), " "), 4).as("sig"),
        ghash.simhash64(split(col("text"), " ")).as("sk"))
    val rows = df.collect()
    assert(rows.length == 3)
    // split("") yields [""], so even empty text has a defined signature
    assert(rows.forall(r => r.getSeq[Long](0).length == 4))
  }

  test("joins against an empty side behave correctly") {
    val empty = Tables(spark, sf, "orders").filter(col("o_orderkey") < 0)
    val c = Tables(spark, sf, "customer")
    assert(c.join(empty, col("c_custkey") === col("o_custkey")).count() == 0)
    assert(c.join(empty, col("c_custkey") === col("o_custkey"), "left_anti").count() == c.count())
    assert(c.join(empty, col("c_custkey") === col("o_custkey"), "left_outer").count() == c.count())
  }

  test("ANN with k larger than the corpus returns the whole corpus ranked") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, sf, "embeddings").limit(3)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === e.head().getLong(0))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val res = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", graft.queries.Similarity.cosine(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 100)
    assert(res.count() == 2)
  }

  test("anomaly scoring emits NOTHING for a zero-variance event type (no NaN flood)") {
    val ev = Seq((1L, "const", 5.0), (2L, "const", 5.0), (3L, "const", 5.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.queries.EventsOps.scoreAnomalies(
      ev, graft.queries.EventsOps.anomalyModel(ev))
    // sd = 0 -> z would be 0/0 = NaN, which both engines order above all
    // numbers; the guard must yield zero anomalies, not all three
    assert(got.count() == 0)
  }

  test("chunking a doc shorter than one window yields exactly one full-copy chunk") {
    import org.apache.spark.sql.functions.{split => fsplit}
    val one = Seq((1L, "just five words right here")).toDF("doc_id", "text")
    // reuse the t10 expression shape via the registry is sf-bound; build
    // the same window math inline on a 5-word doc
    val t = fsplit(col("text"), " ")
    val nChunks = greatest(
      ceil((size(t) - lit(16)).cast("double") / 48.0).cast("int"), lit(1))
    val chunks = one.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        i => slice(t, i * 48 + 1, lit(64)))).as(Seq("chunk_id", "c")))
    val rows = chunks.collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[String](2) == Seq("just", "five", "words", "right", "here"))
  }

  test("t11: planted docs carry exactly the planted anomaly; the rest are clean") {
    val out = Registry.byName("t11_encoding_anomalies").run(spark, sf).collect()
    val n = out.length
    out.foreach { r =>
      val (id, repl, c1, moji) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val clean = r.getBoolean(4)
      if (id % 8 != 0) {
        assert(clean && repl == 0 && c1 == 0 && moji == 0, s"doc $id")
      } else {
        assert(!clean, s"planted doc $id came back clean")
        // one planted signal, and only that signal: variant by id % 3
        // (0xA9 'copyright' sits in the continuation range, so the
        // mojibake plant is one pair and nothing else; the NEL plant is
        // one C1 char and nothing else)
        val expect = (id % 3) match {
          case 0 => (0L, 0L, 1L)
          case 1 => (2L, 0L, 0L)
          case _ => (0L, 1L, 0L)
        }
        assert((repl, c1, moji) == expect, s"doc $id: ($repl,$c1,$moji)")
      }
    }
    assert(out.count(_.getBoolean(4)) >= n * 8 / 10, "discrimination lost")
  }
}
