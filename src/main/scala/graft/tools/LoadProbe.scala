package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Adverse-conditions probe (r11 verdict item): time a list of registry
  * queries under whatever memory/load conditions the caller sets up
  * (SPARK_DRIVER_MEM, a background CPU/page-cache thrasher) and print one
  * JSON line per query with raw runs + loadavg stamps. Used to attribute
  * the r10 driver-bench spikes (e15 196 s vs 2 s quiet) to machine
  * interference vs a real memory cliff.
  *
  * Usage: runMain graft.tools.LoadProbe <sfDir> <name1,name2,...> [runs]
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    names.foreach { n =>
      val spec = graft.Registry.byName(n)
      val secs = (1 to runs).map { _ =>
        val lb = loadAvg()
        val t0 = System.nanoTime()
        try spec.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[loadprobe] $n failed: ${e.getMessage}")
        }
        val s = (System.nanoTime() - t0) / 1e9
        (s, lb, loadAvg())
      }
      val runsJson = secs.map { case (s, lb, la) =>
        f"""{"sec":$s%.2f,"load_before":$lb,"load_after":$la}"""
      }.mkString("[", ",", "]")
      println(s"""{"probe":"load","query":"$n","heap_mb":$heapMb,""" +
        s""""sf":"$sfDir","runs":$runsJson}""")
    }
    spark.stop()
  }
}
