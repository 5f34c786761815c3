package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextOps

class LangIdSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("marker-based language ID classifies real sentences") {
    val samples = Seq(
      ("the cat sat on the mat and it is happy with the sun", "en"),
      ("der hund und die katze sind nicht mit dem ball zu haus", "de"),
      ("le chat est dans la maison et les enfants sont pour une fête", "fr"),
      ("el perro y los gatos son una familia en la casa por la tarde", "es"),
      ("我 的 朋友 是 在 北京 的 大学 学习 了 很多 年", "zh"),
    ).toDF("text", "expected")
    val got = samples
      .withColumn("pred", TextOps.langIdExpr(col("text")))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("pred") == r.getAs[String]("expected"),
        s"text='${r.getAs[String]("text")}'")
    }
  }

  test("t17 trigram classifier: planted corpus fully discriminated, 4 languages") {
    val out = Registry.byName("t17_lang_classifier").run(spark, SharedSpark.sf)
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)}: pred ${r.getString(2)} != label ${r.getString(1)}")
      // planted docs cycle their whole vocabulary: every within-word gram
      // hits the true profile; only boundary-spanning grams (c ' ' c) can
      // miss, and they're a bounded minority of a 20-word doc
      assert(r.getDouble(3) > 0.6, s"doc ${r.getLong(0)} confidence ${r.getDouble(3)}")
    }
    assert(out.map(_.getString(1)).distinct.length == 4)
  }

  test("t17 trigram classifier separates real sentences with unseen inflections") {
    // each sentence mixes the language's function words with inflected
    // forms the profile never saw (dem/einem, sont/fête, familia/casa) —
    // sub-word trigram morphology carries them; the word-level t03
    // heuristic gets no credit for unseen forms
    val samples = Seq(
      (1L, "the cat is in the house and it is with the dog for the day", "en"),
      (2L, "der hund und die katze sind nicht mit dem einem zu den", "de"),
      (3L, "le chat est dans la maison et les enfants sont pour une des", "fr"),
      (4L, "el perro es una familia en la casa por los gatos para con", "es"),
    ).toDF("doc_id", "text", "expected")
    val got = TextOps.LangClassifier.classify(
      samples.select(col("doc_id"), col("expected").as("lang_label"), col("text")))
      .collect()
    got.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)}: pred ${r.getString(2)}")
      assert(r.getDouble(3) > 0.3 && r.getDouble(3) <= 1.0)
    }
  }

  test("readability orders real prose: simple short-word text above dense jargon") {
    val samples = Seq(
      ("simple",
        "the cat sat on the mat. it is big. we like the cat a lot. " +
          "the sun is out. we go and play."),
      ("dense",
        "international considerations necessitate comprehensive " +
          "organizational restructuring initiatives. bureaucratic " +
          "administrative responsibilities demonstrate extraordinary " +
          "institutional complexity."),
    ).toDF("kind", "t")
    val toks = split(col("t"), " ")
    val got = samples.select(col("kind"),
        TextOps.freExpr(size(toks).cast("long"),
          TextOps.sentCount(col("t")), TextOps.syllCount(col("t"))).as("fre"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the standard FRE bands: conversational prose scores high, dense
    // polysyllabic jargon scores low (routinely negative)
    assert(got("simple") > 80.0, s"simple prose scored ${got("simple")}")
    assert(got("dense") < 10.0, s"dense jargon scored ${got("dense")}")
  }

  test("tie-break is deterministic (no markers → priority order → en)") {
    val df = Seq("zzz qqq xxx").toDF("text")
      .withColumn("pred", TextOps.langIdExpr(col("text")))
    assert(df.head().getAs[String]("pred") == "en")
  }
}
