package graft.tools

import graft.engine.GraftSession

/** Dev utility: bench-identical timing of ONE registry query —
  * `BenchOne <name> <sfDir> [cores] [runs]`. Same noop-sink full
  * evaluation as graft.Bench, per-run times printed so warm-vs-cold and
  * cache effects are visible instead of being folded into a min.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val cores = args.lift(2).map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val runs = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = GraftSession.build("bench-one", cores = cores)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      graft.Registry.byName(name).run(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[benchone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
