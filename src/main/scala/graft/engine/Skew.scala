package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed shuffle joins.
  *
  * When one join key carries a disproportionate share of rows (a celebrity
  * user, an empty-string default), the shuffle sends them all to one task and
  * the stage runs at the speed of that straggler. Salting splits each hot key
  * into `nSalts` sub-keys: the big side gets a deterministic salt derived
  * from its other columns, the small side is replicated once per salt. The
  * join result is identical; the hot key's rows now spread over `nSalts`
  * tasks.
  *
  * AQE's skew-join handling (on by default in GraftSession) solves the same
  * problem reactively at runtime; explicit salting remains the tool when the
  * skew is known ahead of time or the join sits under further shuffles AQE
  * won't re-split.
  */
object Skew {

  /** Inner equi-join of `big` (skewed on `bigKey`) with `small`, salted.
    *
    * @param saltSrc column(s) of `big` that spread the hot key's rows —
    *                any deterministic value works (e.g. an id column)
    */
  def saltedJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      nSalts: Int,
      saltSrc: Column,
  ): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSrc), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
