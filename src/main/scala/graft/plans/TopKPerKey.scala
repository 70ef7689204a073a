package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator extension demo: grouped top-k as a first-class
  * operator (logical plan + strategy + physical exec), the (c) path
  * from SURVEY §2 for semantics Spark's built-ins can't execute
  * efficiently.
  *
  * The window-function form — row_number().over(partitionBy(key)
  * .orderBy(ord)) <= k — must shuffle and fully sort EVERY row before
  * discarding all but k per key. This operator keeps a bounded heap
  * per key inside each input partition (partial), shuffles only the
  * ≤ k·partitions surviving candidates per key, and merges heaps on
  * the reduce side (final) — the same partial/final split Spark uses
  * for aggregates, applied to top-k. At 100 TB the shuffle shrinks
  * from O(rows) to O(k · keys · partitions) and no partition-wide
  * sort ever runs.
  */
case class TopKPerKeyPlan(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      // ascending per `order`: the first k rows in sort order win.
      // Heap head = current worst of the kept set, evicted on a
      // better arrival; rows are copied out of the scanner's reused
      // buffer.
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with the projection's reused buffer (UnsafeRow equality
        // is value-based); copy the key only when it is actually
        // inserted — getOrElseUpdate(copy(), ...) would allocate a key
        // copy per INPUT ROW, not per distinct key
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kLocal) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      if (isPartial) heaps.valuesIterator.flatMap(_.iterator)
      else heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public Column-API entry for the operator. */
object TopKPerKey {
  import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
  import org.apache.spark.sql.catalyst.expressions.Ascending

  /** Top `k` rows per `keyCols` group under `orderBy` (pass
    * `col(...).desc`/`.asc` Columns; bare Columns sort ascending).
    * Requires the session to carry GraftExtensions (Tables.configure
    * does) so TopKStrategy can plan the node. */
  def topK(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    // k = 0 would dereference an empty heap inside every task (an
    // opaque executor NoSuchElementException); fail at plan time
    require(k > 0, s"topK requires k > 0, got $k")
    // route the ordering through the analyzer (a throwaway
    // sortWithinPartitions) so the SortOrder expressions arrive fully
    // resolved against the child's attributes
    val sortPlan = df.sortWithinPartitions(orderBy: _*)
      .queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val child = sortPlan.child
    val order = sortPlan.order
    // resolve keys with the session's resolver (case-insensitive by
    // default, like every other column lookup in Spark) and reject
    // ambiguity instead of silently binding the first match
    val resolver = df.sparkSession.sessionState.conf.resolver
    val keys: Seq[Expression] = keyCols.map { n =>
      child.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"no column $n in ${child.output}")
        case many => throw new IllegalArgumentException(
          s"ambiguous key $n: ${many.mkString(", ")}")
      }
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(k, keys, order, child))
  }
}

/** Plans TopKPerKeyPlan as partial→final execs; EnsureRequirements
  * inserts the (candidate-only) exchange between them from the final
  * exec's ClusteredDistribution requirement. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, partial = true, planLater(child))
      TopKPerKeyExec(k, keys, order, partial = false, partial) :: Nil
    case _ => Nil
  }
}
