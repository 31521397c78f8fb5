package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Exact top-k rows per key as a first-class plan operator — the one
  * whole-operator semantic in this engine that Spark's built-ins can't
  * express with bounded memory. The window formulation
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`) must SORT
  * every partition in full: at 100 TB with hot keys that is a full
  * spill-sort of the largest key's data. This operator keeps only a
  * k-element bounded heap per key on both sides of the shuffle
  * (partial → exchange on key → final — the partial-aggregation shape),
  * so memory is O(keys × k) and the shuffle carries at most
  * partitions × keys × k rows.
  *
  * Full custom-operator stack (SURVEY.md §7.3 escalation path c):
  * [[TopKPerKeyNode]] (LogicalPlan) → [[TopKStrategy]] (SparkStrategy,
  * injected via GraftExtensions) → [[TopKPerKeyExec]] (SparkPlan);
  * EnsureRequirements inserts the key exchange from the final node's
  * required distribution.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Empty keys = GLOBAL top-k: partial heaps per partition, then all
  // survivors (≤ partitions×k rows) gather to one task for the final heap —
  // ClusteredDistribution(Nil) is illegal in Spark 4, and AllTuples is also
  // exactly the right semantics (a TakeOrdered without the sort).
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (keys.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(keys))

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // heap head = WORST kept row (reverse ordering) → O(log k) insert
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (rows.hasNext) {
        val row = rows.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](limit + 1, ordering.reverse)
          heaps.put(key.copy(), q)
        }
        if (q.size < limit) {
          q.add(row.copy()): Unit
        } else if (ordering.compare(row, q.peek()) < 0) {
          q.poll()
          q.add(row.copy()): Unit
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial-then-final bounded heaps. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {
  /** First k rows per key group under `order` (total order recommended —
    * include a tie-break key for determinism). Empty `keys` = global top-k
    * (partial heaps, then one final heap over ≤ partitions×k survivors). */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val sortOrders = order.map(c => GraftInterop.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    GraftInterop.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(GraftInterop.catalystExpression), sortOrders, k,
        GraftInterop.analyzed(df)))
  }
}
