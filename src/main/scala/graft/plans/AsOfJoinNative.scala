package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native AS-OF join as a first-class Catalyst operator — the custom
  * LogicalPlan + SparkStrategy + SparkPlan tier (SURVEY §4.3 reserved this
  * for operators Spark's built-ins cannot express efficiently).
  *
  * The DataFrame-level rewrite ([[graft.operators.Joins.asOfJoin]]) unions
  * both sides into one wide null-padded relation, shuffles and sorts the
  * union, and runs a carry-forward window. Correct, but at 100 TB the union
  * pays for (a) null-padding every left row to the right schema and vice
  * versa, (b) one WindowExec buffering the merged stream. This operator
  * instead co-partitions the two sides on the join keys (two exchanges, each
  * moving only its own columns), sorts each side independently, and does a
  * streaming two-pointer merge per partition with O(1) carried state — the
  * classic sort-merge as-of.
  *
  * Semantics (identical to the rewrite, pinned by AsOfNativeSpec): for every
  * left row, the right row of the same key with the greatest
  * (rightTime, tiebreak) such that rightTime <= leftTime; null-extended when
  * none exists. Time and tiebreak columns must be LongType (the engine's
  * epoch-us convention).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    carryExprs: Seq[Expression],
    carryAttrs: Seq[Attribute],
    tiebreak: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ carryAttrs
  override def producedAttributes: AttributeSet = AttributeSet(carryAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push deterministic filters through [[AsOfJoinPlan]].
  * Catalyst's PushDownPredicates does not know the custom node, so without
  * this rule every predicate written above an as-of join runs post-join —
  * the scans read everything. Two legality tiers:
  *
  *   - conjuncts over LEFT-side columns push to the left child (the join
  *     emits exactly one row per left row, so filtering left rows before or
  *     after the join is identical);
  *   - conjuncts over only the left JOIN KEYS additionally mirror to the
  *     right child with the key attributes rewritten positionally: a right
  *     row can only ever match left rows with EQUAL keys, so right rows
  *     failing the key predicate could only have matched already-filtered
  *     left rows.
  *
  * At 100 TB this is the difference between scanning a key's slice of both
  * sides and scanning both tables fully.
  */
object PushFiltersThroughAsOf
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftPush, keep) = conjuncts.partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (leftPush.isEmpty) f
      else {
        // only the KEY-MIRRORING tier needs attribute-shaped keys; the
        // plain left-child push is legal for any key shape (round-13 fix:
        // the attribute guard used to sit on the whole match arm, keeping
        // even non-key left filters above the join for computed keys —
        // both sides then scanned fully)
        val mirrored =
          if (!j.leftKeys.forall(_.isInstanceOf[Attribute])) Nil
          else {
            val keySet =
              AttributeSet(j.leftKeys.map(_.asInstanceOf[Attribute]))
            val keyMap = j.leftKeys.zip(j.rightKeys).collect {
              case (l: Attribute, r) => l.exprId -> r
            }.toMap
            leftPush
              .filter(_.references.subsetOf(keySet))
              .map(_.transform {
                case a: Attribute if keyMap.contains(a.exprId) =>
                  keyMap(a.exprId)
              })
          }
        val newLeft = Filter(leftPush.reduce(And), j.left)
        val newRight =
          if (mirrored.isEmpty) j.right else Filter(mirrored.reduce(And), j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Register via
  * `spark.experimental.extraStrategies` ([[AsOfJoinNative.ensureRegistered]])
  * or `SparkSessionExtensions.injectPlannerStrategy`.
  */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, carry, carryAttrs, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, carry, carryAttrs, tb,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    carryExprs: Seq[Expression],
    carryAttrs: Seq[Attribute],
    tiebreak: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carryAttrs
  override def producedAttributes: AttributeSet = AttributeSet(carryAttrs)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Co-partition both sides on the keys; EnsureRequirements inserts the two
    * (columns-of-that-side-only) exchanges.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Each side sorted by (keys, time[, tiebreak]) — the merge precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(tiebreak, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val carryB = carryExprs
    val outAttrs = output
    val carryAttrsB = carryAttrs
    val keyTypes = leftKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val carryProj = UnsafeProjection.create(carryB, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ carryAttrsB)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullCarry = new GenericInternalRow(carryB.size)

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var matchCarry: InternalRow = _
        private var matchKey: InternalRow = _
        advanceRight()

        // Right rows with a NULL key can never match (SQL equi-join
        // semantics: NULL != NULL) — skip them on arrival; they sort first
        // (NULLS FIRST), so this also keeps the merge pointer aligned.
        private def advanceRight(): Unit = {
          var skipping = true
          while (skipping) {
            if (rIter.hasNext) {
              rRow = rIter.next()
              rKey = rKeyProj(rRow).copy()
              skipping = rKey.anyNull
            } else { rRow = null; rKey = null; skipping = false }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l).copy()
          // NULL-keyed left rows null-extend without consulting the right
          // side — RowOrdering compares nulls as EQUAL, which would
          // otherwise match NULL keys against each other.
          if (lKey.anyNull) {
            matchKey = null; matchCarry = null
            return resultProj(joined(l, nullCarry))
          }
          // a NULL-timed left row has no as-of position: null-extend
          // without scanning (round-13 fix — getLong read the NULL as 0,
          // an epoch-0 position that could steal a match under ANSI
          // three-valued semantics where NULL <= t is never true)
          if (lTimeProj(l).isNullAt(0))
            return resultProj(joined(l, nullCarry))
          val lTime = lTimeProj(l).getLong(0)
          if (matchKey != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchKey = null; matchCarry = null
          }
          var scanning = rRow != null
          while (scanning) {
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) advanceRight()
            // a NULL-timed right row can never be a valid as-of match —
            // skip it (round-13 fix: getLong read it as epoch 0 and it
            // was carried for every left row with no true predecessor);
            // NULLS FIRST ordering puts these at each key group's head
            else if (cmp == 0 && rTimeProj(rRow).isNullAt(0)) advanceRight()
            else if (cmp == 0 && rTimeProj(rRow).getLong(0) <= lTime) {
              matchCarry = carryProj(rRow).copy()
              matchKey = rKey
              advanceRight()
            } else scanning = false
            if (rRow == null) scanning = false
          }
          val hit = matchKey != null && keyOrd.compare(matchKey, lKey) == 0
          resultProj(joined(l, if (hit) matchCarry else nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native AS-OF join. */
object AsOfJoinNative {

  /** Idempotently add the planner strategy + pushdown rule to a running
    * session.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    if (!spark.experimental.extraOptimizations.contains(PushFiltersThroughAsOf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFiltersThroughAsOf
  }

  /** As [[graft.operators.Joins.asOfJoin]] but planned natively: carried
    * right columns appear as `asof_<name>`, nullable. Time and tiebreak
    * columns must be LongType.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tiebreak: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so a self-join never shares expression ids
    // across the two children (the analyzer's relation dedup does this for
    // built-in joins; a custom node must arrive conflict-free).
    val rAliases = right.queryExecution.analyzed.output
      .map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    def attr(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side is missing column '$n'"))
    val rOut = rAliases.map(_.toAttribute)
    val lt = attr(lPlan.output, leftTime, "left")
    val rt = attr(rOut, rightTime, "right")
    val tb = attr(rOut, tiebreak, "right")
    require(lt.dataType == LongType && rt.dataType == LongType &&
      tb.dataType == LongType,
      "asOfJoinNative requires LongType time and tiebreak columns")
    val carryExprs = rightVals.map(v => attr(rOut, v, "right"))
    val carryAttrs = carryExprs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan.output, _, "left")),
      keys.map(attr(rOut, _, "right")),
      lt, rt, carryExprs, carryAttrs, tb)
    GraftColumnBridge.ofRows(spark, node)
  }
}
