package graft.tools

import graft.Registry
import graft.engine.GraftSession

/** Dev utility: print ANN recall of s02 (LSH multi-probe) and s04 (IVF)
  * against s01 exact brute force.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("recall-check", cores = 8)
    def pairs(n: String) = Registry.byName(n).run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("s01_ann_brute")
    Seq("s02_ann_lsh", "s04_ann_ivf").foreach { n =>
      val got = pairs(n)
      println(s"== $n recall: ${exact.count(got.contains).toDouble / exact.size}")
    }
    spark.stop()
  }
}
