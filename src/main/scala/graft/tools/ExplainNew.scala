package graft.tools

import graft.Registry
import graft.engine.GraftSession

/** Dev utility: print formatted plans for named queries. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = GraftSession.build("explain-new", cores = 8)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d09_contamination", "s05_label_centroid_score")
    names.foreach { n =>
      println(s"===== $n =====")
      Registry.byName(n).run(spark, dir)
        .asInstanceOf[org.apache.spark.sql.classic.DataFrame]
        .explain("formatted")
    }
    spark.stop()
  }
}
