package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import graft.BenchGate
import graft.engine.GraftSession

/** Dev experiment for the bench's foreign-I/O quiet gate (r16 VERDICT
  * item 1): runs one registry query twice on a quiet machine, then twice
  * under a deliberate dd co-load on the bench disk (O_DIRECT, so the
  * traffic hits the device and bypasses the page cache — the same shape as
  * the foreign backup/ingest job that inflated the r16 driver artifact's
  * localCheckpoint family 4–36× with ZERO foreign CPU), then twice quiet
  * again. Emits one JSONL line per run with every BenchGate stamp and the
  * cpu/io/overall quiet verdicts.
  *
  * Done-criterion from the r16 verdict: the dd phase must stamp
  * ioQuiet=false (foreignMbps over the ceiling at a busy device) so the
  * bench's retry loop would have fired, and the quiet phases must stamp
  * quiet=true with the same numbers the r16 protocol produced.
  *
  *   IoLoadProbe <query> <sfDir> [outFile]
  */
object IoLoadProbe {
  def main(args: Array[String]): Unit = {
    val name = args.lift(0).getOrElse("c20_dsir_select")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(2).getOrElse("dev/ioloadprobe_r18.jsonl")
    val ddFile = "local/ioloadprobe_dd.bin"
    val spark = GraftSession.build("io-load-probe")
    val spec = graft.Registry.byName(name)
    val quietCeil = math.max(1.0,
      Runtime.getRuntime.availableProcessors().toDouble / 8)

    def emit(phase: String, r: BenchGate.RunStamp): Unit = {
      import BenchGate.fmt2
      val line = s"""{"query":"$name","phase":"$phase","sec":${fmt2(r.sec)},""" +
        s""""otherCores":${fmt2(r.otherCores)},"foreignMbps":${fmt2(r.foreignMbps)},""" +
        s""""devBusy":${fmt2(r.devBusy)},"prevForeignMbps":${fmt2(r.prevForeignMbps)},""" +
        s""""cpuQuiet":${BenchGate.cpuQuiet(r, quietCeil)},""" +
        s""""ioQuiet":${BenchGate.ioQuiet(r)},"quiet":${BenchGate.isQuiet(r, quietCeil)}}"""
      println(line)
      Files.writeString(Paths.get(out), line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
    def run(phase: String, n: Int): Unit = (1 to n).foreach { _ =>
      emit(phase, BenchGate.stampRun {
        try spec.run(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[ioprobe] $e") }
      })
    }

    // warm once so the timed runs don't straddle cold parquet reads
    run("warmup", 1)
    run("quiet_before", 2)
    // dd loop: rewrite the same 2 GiB with O_DIRECT until stopped — a
    // bounded-footprint stand-in for a co-located backup/ingest job
    @volatile var stop = false
    @volatile var ddFailed = false
    val dd = new Thread(() => {
      var first = true
      while (!stop) {
        val p = new ProcessBuilder("dd", "if=/dev/zero", s"of=$ddFile",
          "bs=1M", "count=2048", "oflag=direct", "conv=notrunc")
          .redirectErrorStream(true).start()
        val ddOut = new String(p.getInputStream.readAllBytes())
        p.waitFor()
        // O_DIRECT is unsupported on some filesystems (tmpfs, overlayfs):
        // dd then fails instantly, the loop would hot-spin respawning it,
        // and the dd_coload stamps would record NO actual disk load —
        // silently vacuous validation (r17 ADVICE). Abort loudly instead.
        if (first && p.exitValue() != 0) {
          System.err.println("[ioprobe] dd co-load FAILED (exit " +
            s"${p.exitValue()}): $ddOut")
          System.err.println("[ioprobe] aborting — dd_coload stamps would " +
            "be vacuous on this filesystem")
          ddFailed = true
          stop = true
        }
        first = false
      }
    })
    dd.setDaemon(true)
    dd.start()
    Thread.sleep(2000) // let the co-load reach steady state
    try { if (!ddFailed) run("dd_coload", 2) }
    finally {
      stop = true
      // dd iterations are bounded (2 GiB each) — wait one out, then clean up
      dd.join(120000)
      Files.deleteIfExists(Paths.get(ddFile))
    }
    run("quiet_after", 2)
    spark.stop()
  }
}
