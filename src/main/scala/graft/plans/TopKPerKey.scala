package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** TOP-K PER KEY as a first-class Catalyst operator — the whole-operator
  * extension path (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`)
  * from SURVEY §7.4, for semantics the built-ins only approximate:
  *
  * The declarative form, `row_number().over(partitionBy(key).orderBy(o))
  * .filter(rn <= k)`, SHUFFLES EVERY INPUT ROW and then sorts each key's
  * whole group — at 100 TB that is the entire table through the wire for
  * a result of k rows per key. Spark's own `TakeOrderedAndProject` fixes
  * this for the global-top-k case with per-partition partial heaps; this
  * operator is its per-key generalization:
  *
  *  - `partial = true` exec (map side, no distribution requirement):
  *    bounded heap of k rows per key per input partition — at most
  *    `partitions × keys × k` rows ever reach the exchange;
  *  - `partial = false` exec (`ClusteredDistribution` on the key, so
  *    EnsureRequirements inserts the shuffle): merges the partial
  *    winners into the exact per-key top-k.
  *
  * Exactness requires the ordering to be TOTAL per key (pass tie-break
  * columns), same as deterministic row_number. Memory is O(keys·k) per
  * task — the reason a heap, not a sort, runs on the map side.
  */
case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(partitionExprs.nonEmpty, "TopKPerKey needs >=1 key column " +
    "(global top-k is Spark's built-in TakeOrderedAndProject)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val kLocal = k
    val partLocal = partitionExprs
    val orderLocal = orderExprs
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      val ord = RowOrdering.create(orderLocal, childOutput)
      // heap head = the WORST kept row under the requested sort order
      // (PriorityQueue dequeues the maximum of its Ordering)
      val heapOrd: Ordering[InternalRow] = ord
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, null) match {
          case null =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
            heaps.put(key.copy(), h)
            h
          case h => h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // emit each key's winners best-first (dequeueAll yields worst-first)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
        .map { r => numOutputRows += 1; r }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Planner rule: logical TopKPerKeyNode → partial + shuffle + final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, part, ord, child) =>
      TopKPerKeyExec(k, part, ord, partial = false,
        TopKPerKeyExec(k, part, ord, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Exact top-k rows per key. `orderBy` is (column, ascending) — make
    * it total per key (add tie-breaks) for deterministic output.
    * Registers the planner strategy on the session idempotently, so it
    * works on any session (the `GraftExtensions` config hook also
    * injects it for `spark.sql.extensions` users). */
  def topKPerKey(
      df: DataFrame, k: Int,
      keys: Seq[String], orderBy: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = Bridge.analyzed(df)
    def attr(n: String): Attribute =
      analyzed.output.find(a => spark.sessionState.conf.resolver(a.name, n))
        .getOrElse(throw new IllegalArgumentException(
          s"topKPerKey: no column '$n' in ${analyzed.output.map(_.name).mkString(", ")}"))
    val ord = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark, TopKPerKeyNode(k, keys.map(attr), ord, analyzed))
  }
}
