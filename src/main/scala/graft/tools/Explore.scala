package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{GraftSession, Tables}

/** Dev utility: print schemas of all testdata tables (and smoke-read each).
  * Usage: sbt "runMain graft.tools.Explore /root/testdata/sf0.001"
  */
object Explore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark: SparkSession = GraftSession.build("graft-explore", cores = 4)
    Tables.all.foreach { n =>
      try {
        val df = Tables(spark, dir, n)
        println(s"== $n rows=${df.count()}")
        println(df.schema.treeString)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
