package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The engine's one whole-operator custom plan: a native as-of join.
  *
  * `ops.AsOf.joinAsOf` composes the operator from built-ins
  * (union + running `last(ignoreNulls)` window); that plan materializes
  * the union and windows over it. This physical operator instead asks
  * the planner for co-partitioned inputs sorted by (key, time) — the
  * same requirement a sort-merge join states — and streams both sides
  * once per partition with O(1) state (the last right payload seen per
  * key). At 100 TB both plans shuffle the same bytes; this one skips
  * the union materialization and the window machinery.
  *
  * Wired through the standard triple:
  *  - [[AsOfJoinNode]] — logical node (columns resolved by name against
  *    analyzed children, so no Column↔Expression bridging),
  *  - [[AsOfJoinStrategy]] — planner strategy (inject via
  *    `spark.experimental.extraStrategies` or `GraftExtensions`),
  *  - [[AsOfJoinExec]] — the physical sort-merge pass.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    keyCols: Seq[String],
    timeCol: String,
    payloadCol: String,
    outAttr: AttributeReference) extends BinaryNode {

  // outAttr is a constructor field (not minted in `output`) so its
  // exprId stays stable when rules copy the node — upstream references
  // would dangle otherwise
  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  // key/time/payload are referenced by NAME (no stored expressions), so
  // declare them — otherwise ColumnPruning sees zero references and
  // projects the right child down to nothing
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output.filter(a =>
        keyCols.contains(a.name) || a.name == timeCol || a.name == payloadCol))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.keyCols, n.timeCol, n.payloadCol, n.output) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    keyCols: Seq[String],
    timeCol: String,
    payloadCol: String,
    override val output: Seq[Attribute]) extends BinaryExecNode {

  private def attrs(side: SparkPlan, names: Seq[String]): Seq[Attribute] =
    names.map(n => side.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${side.output.map(_.name)}")))

  private def lKeys = attrs(left, keyCols)
  private def rKeys = attrs(right, keyCols)
  private def lTime = attrs(left, Seq(timeCol)).head
  private def rTime = attrs(right, Seq(timeCol)).head
  private def rPayload = attrs(right, Seq(payloadCol)).head

  // co-partition both sides on the key — EnsureRequirements inserts the
  // exchanges exactly as it would for a sort-merge join
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(lKeys), ClusteredDistribution(rKeys))

  // and sort each partition by (key..., time); right side additionally
  // by payload so equal-instant rows resolve deterministically (max
  // payload wins — matches ops.AsOf.joinAsOf's third sort key)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (lKeys :+ lTime).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rKeys :+ rTime :+ rPayload).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (lKeys :+ lTime).map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = lKeys
    val rKeyExprs = rKeys
    val lTimeAttr = lTime
    val rTimeAttr = rTime
    val rPayloadAttr = rPayload
    val lOutput = left.output
    val rOutput = right.output
    val keyTypes = lKeyExprs.map(_.dataType)
    val finalOutput = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeAttr), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeAttr), rOutput)
      val rPayloadProj = UnsafeProjection.create(Seq(rPayloadAttr), rOutput)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      // identity projection (JoinedRow → UnsafeRow); the plan-level
      // schema comes from `output`, the projection only needs matching
      // field count/types
      val localAsof =
        AttributeReference("__asof", rPayloadAttr.dataType, nullable = true)()
      val projInput = lOutput :+ localAsof
      val resultProj = UnsafeProjection.create(projInput, projInput)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(1)

      new Iterator[InternalRow] {
        private val rBuf = rIt.buffered
        private var curKey: InternalRow = _      // key of the carried value
        private var carried: InternalRow = _     // copied 1-field payload row

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val lRow = lIt.next()
          val lTimeRow = lTimeProj(lRow)
          // NULL left time: nothing is "at or before" it → null payload
          // (same as ops.AsOf.joinAsOf, where null-time left rows sort
          // nulls-first and see no carried right value)
          if (lTimeRow.isNullAt(0)) return resultProj(joined(lRow, nullPayload))
          val lKey = lKeyProj(lRow)
          val lT = lTimeRow.getLong(0)
          // advance the right side through keys < lKey and rows with
          // time <= lT on the same key, carrying the last payload
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) { rBuf.next() }   // stale key: skip, no carry
            else if (cmp == 0 && rTimeProj(rRow).isNullAt(0)) {
              rBuf.next()                  // NULL right time: never carriable
            }
            else if (cmp == 0 && rTimeProj(rRow).getLong(0) <= lT) {
              // last NON-NULL payload wins — matches the composed
              // operator's last(ignoreNulls = true)
              val p = rPayloadProj(rRow)
              if (!p.isNullAt(0)) {
                curKey = rKey.copy()
                carried = p.copy()
              }
              rBuf.next()
            } else advancing = false
          }
          val payload =
            if (carried != null && curKey != null && keyOrd.compare(curKey, lKey) == 0)
              carried
            else nullPayload
          resultProj(joined(lRow, payload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Install the strategy on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Native as-of join — same contract as `ops.AsOf.joinAsOf`. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payload: String, outCol: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // the exec reads time via getLong: only long-backed types are safe
    // (an int would read without sign extension, silently corrupting)
    Seq(left, right).foreach { df =>
      val dt = df.schema(timeCol).dataType
      require(dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType ||
        dt == org.apache.spark.sql.types.LongType,
        s"as-of time column $timeCol must be timestamp or bigint, got ${dt.sql}")
    }
    val rightPlan = GraftBridge.logicalPlan(right)
    val payloadAttr = rightPlan.output.find(_.name == payload).getOrElse(
      throw new IllegalArgumentException(s"payload column $payload not on right side"))
    GraftBridge.ofRows(spark, AsOfJoinNode(
      GraftBridge.logicalPlan(left), rightPlan,
      keyCols, timeCol, payload,
      AttributeReference(outCol, payloadAttr.dataType, nullable = true)()))
  }
}
