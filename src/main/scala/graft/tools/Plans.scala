package graft.tools

import graft.Registry
import graft.engine.GraftSession

/** Dev utility: dump formatted physical plans for the named queries
  * (default: the headline set). Usage:
  *   sbt "runMain graft.tools.Plans q02_filter q11_join_broadcast"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-plans", cores = 4)
    val dir = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq else Registry.headline.map(_.name)
    names.foreach { n =>
      println(s"\n================= $n =================")
      println(Registry.byName(n).run(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
