package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BaseOrdering, Expression, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{GraftColumnBridge => Bridge}

/** Grouped top-k as a first-class operator: for each group key keep the k
  * smallest rows under `sortOrder`.
  *
  * The compositional way to write this is a `row_number()` window + filter —
  * but that plan shuffles EVERY row to its key's partition and fully sorts
  * each partition, even though all but k rows per key are discarded. At
  * 100 TB that is the difference between shuffling the whole fact table and
  * shuffling ≤ k·partitions rows per key. This operator runs in two phases,
  * mirroring partial/final aggregation:
  *
  *   partial TopKPerKeyExec   (map-side: bounded heap per key per partition)
  *        → Exchange(hash by key)   (moves ≤ k rows per key per map task)
  *        → Sort(key, order)        (external sort of the REDUCED data)
  *   final TopKPerKeyExec     (streaming group scan: first k rows per key)
  *
  * Memory honesty at scale:
  *  - the PARTIAL phase's heap map is O(keys-in-partition × k) rows — the
  *    hash-aggregate working-set shape, but without
  *    `UnsafeFixedWidthAggregationMap`'s spill fallback. It therefore caps
  *    the number of tracked keys (`spark.graft.topk.partialMaxKeys`,
  *    default 2^20): past the cap, rows of UNSEEN keys pass through
  *    unbuffered. Pass-through is always correct — partial is only a
  *    filter that may keep extra rows — it just sheds the map-side
  *    reduction for the overflow keys instead of OOMing.
  *  - the FINAL phase must be exact, so it cannot shed state; instead it
  *    requires child ordering (key, order) and streams — one group at a
  *    time, O(1) rows of state. The ordering is satisfied by an external
  *    (spillable) SortExec over the already-reduced ≤ k·mapTasks rows per
  *    key, NOT over the input — the input-side win of the operator (no
  *    full shuffle+sort of the fact table) is untouched.
  *
  * This is the (c)-tier extension path: a logical node + planner Strategy +
  * physical exec, registered either per-session (`TopK.install`) or via
  * `spark.sql.extensions=graft.engine.GraftExtensions`. The reference has no
  * custom-operator surface at all (its fixed executor set:
  * src/executor/mod.rs); Spark's is the documented Strategy injection point.
  */
case class TopKPerKeyNode(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
) extends UnaryNode {
  require(k > 0, "top-k requires k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // the final phase needs all rows of a key co-located AND sorted: the
  // Exchange comes from EnsureRequirements; the ordering is satisfied by a
  // spillable SortExec over the partial-phase-reduced data
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(groupExprs.map(SortOrder(_, Ascending)) ++ sortOrder)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupExprs.map(SortOrder(_, Ascending)) ++ sortOrder

  protected override def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = sortOrder
    val childOutput = child.output
    val kk = k
    val maxKeys = conf.getConfString("spark.graft.topk.partialMaxKeys",
      (1 << 20).toString).toInt
    if (partial) child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord: BaseOrdering = RowOrdering.create(orderE, childOutput)
      // max-heap under `ord`: head = worst retained row, evicted when a
      // better row arrives past capacity k
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val revOrd = new java.util.Comparator[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      // most children emit UnsafeRow; LocalTableScan-style children may not
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // absorb into bounded heaps (emitting nothing) until the key cap;
      // rows of keys beyond the cap stream through unbuffered — correct
      // (the final phase is exact), just un-reduced for the overflow keys
      val absorbed = iter.filter { r0 =>
        val row = r0 match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size() >= maxKeys) true
        else {
          if (heap == null) {
            heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, revOrd)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < kk) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
          false
        }
      }
      import scala.jdk.CollectionConverters._
      // ++ evaluates its operand lazily: the heap drain runs only after the
      // input (and thus every absorption) is exhausted
      absorbed ++ heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    } else child.execute().mapPartitions { iter =>
      // input is (key, order)-sorted: stream group boundaries, emit the
      // first k rows of each group — O(1) state regardless of key count
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      var cur: UnsafeRow = null
      var n = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (cur == null || !key.equals(cur)) {
          cur = key.copy()
          n = 0
        }
        n += 1
        n <= kk
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner rule: logical TopKPerKeyNode → partial + final physical phases. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val mapSide = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, mapSide) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {

  /** Register the strategy on an existing session (idempotent). The
    * config-time alternative is `spark.sql.extensions=graft.engine.
    * GraftExtensions`.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }

  /** Top k rows per `keys` group under `order` (use `.asc`/`.desc` columns;
    * bare columns sort ascending). Output order within/across groups is
    * unspecified, like any Spark operator — add `.orderBy` for display.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val keyExprs = keys.map(Bridge.catalystExpression)
    val sortExprs = order.map(Bridge.catalystExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    Bridge.ofRows(spark, TopKPerKeyNode(keyExprs, sortExprs, k, Bridge.plan(df)))
  }
}
