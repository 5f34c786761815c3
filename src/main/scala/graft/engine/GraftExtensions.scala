package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Fnv1a64, MinHashSig, SimHash64}
import graft.plans.TopKStrategy

/** Config-time injection point for everything graft adds to Spark:
  *
  *   spark.sql.extensions=graft.engine.GraftExtensions
  *
  * registers the native hash expressions as SQL functions and the grouped
  * top-k planner strategy on every session built from that config — the
  * deployment path for a cluster where user code never touches the builder.
  * `ghash.register(spark)` / `TopK.install(spark)` remain the per-session
  * equivalents for already-running sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "fnv1a64(str) - FNV-1a 64-bit hash of a string"),
      (es: Seq[Expression]) => Fnv1a64(es.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) =>
        MinHashSig(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(arr) - 64-bit SimHash sketch"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
