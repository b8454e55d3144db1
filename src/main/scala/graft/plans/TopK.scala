package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet,
  AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.10(c) — a WHOLE-OPERATOR extension: top-k-per-group as a
  * first-class logical operator with its own physical strategy, planned
  * through `SparkSessionExtensions`/`experimental.extraStrategies`.
  *
  * Why an operator and not the window composition: the built-in
  * formulation (`row_number().over(partitionBy(g).orderBy(o)) <= k`)
  * SORTS every partition in full — O(n log n) compare work and full
  * buffering per partition — then throws away all but k rows. The native
  * operator keeps a bounded heap of k rows per group: O(n log k) with
  * O(groups · k) memory, in TWO phases — a map-side partial heap per
  * input partition (so at most k rows per (group, partition) ever reach
  * the shuffle) and a final heap after clustering. At 100 TB with
  * k=3-100 the shuffle shrinks by orders of magnitude and no executor
  * ever materializes a full partition sort.
  *
  * The rank column the operator appends is computed from the SAME total
  * ordering the caller supplies, so results are bit-identical to the
  * window formulation (proved by the shared DuckDB oracle of
  * `topk_native` and the equivalence spec in ExtensionsSpec).
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference, // constructor-fixed: exprId must survive copy()
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is CREATED here, not derived from the child — without this,
  // CheckAnalysis flags it as a missing input attribute
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

/** Shared bounded-heap pass: per input partition, keep the first-k rows
  * of every group under `ordering`; emit them (with 1-based rank when
  * `withRank`). Used map-side (partial, no rank) and reduce-side (final,
  * rank) — the classic partial/final aggregate split, for top-k.
  */
private[plans] object TopKHeap {
  def process(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      ordering: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute],
      output: Seq[Attribute],
      withRank: Boolean): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, input)
    val ord = GenerateOrdering.generate(ordering, input)
    // max-heap under `ordering`: peek = the worst row currently kept
    val heaps = new java.util.HashMap[InternalRow,
      java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, ord.reversed())
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    }
    // bind the output against (input ++ the real rank attribute) so the
    // projection resolves by the node's actual exprIds
    val outProj =
      if (withRank) UnsafeProjection.create(output, input :+ output.last)
      else null
    val joined = new JoinedRow
    val rankRow = new GenericInternalRow(1)
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap { heap =>
      val rows = new Array[InternalRow](heap.size())
      var i = rows.length - 1
      while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
      rows.iterator.zipWithIndex.map { case (r, idx) =>
        if (withRank) {
          rankRow.setLong(0, idx + 1L)
          outProj(joined(r, rankRow))
        } else r
      }
    }
  }
}

/** Map-side partial: bounded heaps per input partition, no distribution
  * requirement — at most k rows per (group, input partition) survive to
  * the shuffle the final node requires.
  */
case class TopKPartialExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  // Row-filtering per partition preserves the child's partitioning; the
  // SparkPlan DEFAULT is UnknownPartitioning, which made EnsureRequirements
  // insert a redundant exchange above the partial whenever the input was
  // ALREADY clustered on the group keys (doc_tfidf's repartition(doc_id),
  // the inherited agg partitionings in the kNN chains) — the final node's
  // ClusteredDistribution could never see the satisfied distribution.
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      TopKHeap.process(iter, groupExprs, ordering, k, child.output,
        child.output, withRank = false)
    }, preservesPartitioning = true)
  override protected def withNewChildInternal(c: SparkPlan): TopKPartialExec =
    copy(child = c)
}

/** Final: requires clustering on the group keys (the planner inserts the
  * shuffle), merges the partial heaps and emits ranked rows.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  // as with the partial: preserves the child's (possibly inherited)
  // partitioning for downstream consumers instead of Unknown
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      TopKHeap.process(iter, groupExprs, ordering, k, child.output,
        output, withRank = true)
    }, preservesPartitioning = true)
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, ord, k, rank, child) =>
      TopKPerGroupExec(g, ord, k, rank,
        TopKPartialExec(g, ord, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Idempotently register the strategy on the session (the library's
    * `GraftExtensions` does the same via spark.sql.extensions for
    * sessions built with the conf; this covers externally-built ones).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    // synchronized: the check-then-append below is not atomic, and two
    // concurrent callers would otherwise register the strategy twice
    // (benign duplicate planning work, but why allow it)
    TopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }

  /** DataFrame API: append `rn` = 1..k within each group under `order`
    * ((column, descending) pairs) and keep only those rows. `order` must
    * be a total order (unique tiebreaker) for deterministic results —
    * same contract as the window formulation. Columns are resolved by
    * name against the analyzed child here, so the custom node enters the
    * analyzer fully resolved (Spark 4's Column nodes are opaque to
    * generic resolution inside third-party operators).
    */
  def topKPerGroup(df: DataFrame, group: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    ensureRegistered(df.sparkSession)
    val child = Bridge.analyzedPlan(df)
    def attr(n: String): Attribute = child.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(",")}"))
    // float/double group keys are normalized (-0.0 -> 0.0, canonical NaN)
    // the way Catalyst's NormalizeFloatingNumbers rule does for
    // Aggregate/Window keys — that rule only rewrites known node types,
    // so a custom operator must normalize its own grouping to keep
    // byte-equality grouping (heap map + hash shuffle) consistent with
    // the window formulation's semantics
    def groupExpr(n: String): Expression = {
      val a = attr(n)
      a.dataType match {
        case org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(a)
        case _ => a
      }
    }
    val ord = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(group.map(groupExpr), ord, k,
        AttributeReference("rn", LongType, nullable = false)(),
        child))
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the library's
  * session-extension entry point: injects the top-k planner strategy and
  * the native expressions as SQL functions
  * (`dot_scaled`, `sorted_intersect_count`).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.{DotInt, DotScaled, SortedIntersectCount}

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction((FunctionIdentifier("dot_scaled"),
      new ExpressionInfo(classOf[DotScaled].getName, "dot_scaled"),
      (exprs: Seq[Expression]) => DotScaled(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("dot_int"),
      new ExpressionInfo(classOf[DotInt].getName, "dot_int"),
      (exprs: Seq[Expression]) => DotInt(exprs(0), exprs(1))))
  }
}
