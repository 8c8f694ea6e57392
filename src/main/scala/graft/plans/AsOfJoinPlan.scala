package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator AS-OF join as a first-class Catalyst plan (the §7
  * "custom LogicalPlan + Strategy + SparkPlan" ladder step):
  * for each left row, the right row with the greatest right-ts <= left-ts
  * within the same key; unmatched left rows get nulls (ASOF LEFT JOIN).
  *
  * Physical shape: both children hash-clustered on the key and sorted by
  * (key, ts) — the SAME distribution/ordering contract as a sort-merge
  * join, so EnsureRequirements plans exactly one exchange per side and a
  * per-partition merge with O(1) state (the last right row seen). Compared
  * to the union+window rewrite in [[graft.ops.AsOfJoin]], rows are never
  * widened with null payload columns and no window buffer is involved —
  * the streaming-merge cost profile at any scale.
  *
  * The default `asof` API keeps the window rewrite (it needs no session
  * registration and is the DuckDB-oracle-checked path); `AsOfJoinPlan.asof`
  * is the native-plan alternative, property-tested against it.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // the right side additionally orders by the payload columns so ties on
  // (key, ts) resolve deterministically (the LAST row held wins = max
  // payload), matching the window rewrite's tie-break
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    ((rightKeys :+ rightTs) ++ rightPayload).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val payload = rightPayload
    val nPayload = payload.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val payloadProj = UnsafeProjection.create(payload, rOut)
      // unmatched rows carry null payload: the projection must see the
      // payload attributes as NULLABLE or its generated code skips the
      // null-bit writes and emits stale/zero values instead of NULL
      val outAttrs = lOut ++ payload.map(_.withNullability(true))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = InternalRow.fromSeq(Seq.fill[Any](nPayload)(null))
      val joined = new JoinedRow

      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val rBuf = rIter.buffered
      var heldKey: InternalRow = null
      var heldTs: Long = Long.MinValue
      var heldPayload: InternalRow = null

      // NULL timestamps never match (left.ts >= right.ts is unknown):
      // null right rows are consumed without being held; null left rows
      // emit the null payload
      val NullTs = Long.MinValue
      def tsOf(proj: UnsafeProjection, row: InternalRow): Long = {
        val r = proj(row)
        if (r.isNullAt(0)) NullTs else r.getLong(0)
      }
      // NULL join keys never equal anything (equi-join semantics), but
      // RowOrdering.compare treats NULLs as equal — a NULL-key left row
      // would otherwise take the payload of a NULL-key right row
      val nKeys = lKeyExprs.length
      def anyNullKey(key: InternalRow): Boolean = {
        var i = 0
        while (i < nKeys) { if (key.isNullAt(i)) return true; i += 1 }
        false
      }

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow).copy()
        val lTime = tsOf(lTsProj, lRow)
        // advance the right side through rows with key < lKey and, within
        // lKey, ts <= lTime, remembering the last row of the current key
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rRow = rBuf.head
          val rKey = rKeyProj(rRow)
          val cmp = keyOrdering.compare(rKey, lKey)
          val rTime = tsOf(rTsProj, rRow)
          if (cmp < 0) { rBuf.next() } // earlier key: skip (its matches are done)
          else if (cmp == 0 && (rTime == NullTs || anyNullKey(rKey))) {
            rBuf.next() // null ts or null key: never matches anything
          }
          else if (cmp == 0 && lTime != NullTs && rTime <= lTime) {
            heldKey = rKey.copy()
            heldTs = rTime
            heldPayload = payloadProj(rRow).copy()
            rBuf.next()
          } else advancing = false
        }
        val matches = heldPayload != null && heldKey != null &&
          lTime != NullTs && !anyNullKey(lKey) &&
          keyOrdering.compare(heldKey, lKey) == 0 && heldTs <= lTime
        outProj(joined(lRow, if (matches) heldPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Native-plan as-of join (ASOF LEFT, `left.ts >= right.ts`): requires
    * timestamp columns (compared as epoch micros). Registers the strategy
    * on the session on first use. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Map[String, String]): DataFrame = {
    val spark: SparkSession = left.sparkSession
    GraftSqlBridge.injectStrategy(spark, AsOfJoinStrategy)
    // project/rename the right side to carried payload names first
    val rightSel0 = right.selectExpr(
      (keys :+ rightTs) ++ rightCols.map { case (src, dst) => s"$src AS $dst" }: _*)
    // left and right often derive from the same source (self-as-of): alias
    // every right column so its attributes get FRESH expression ids —
    // otherwise DeduplicateRelations rewrites the right child under this
    // node and the key/ts expressions keep stale ids that bind to the left
    import org.apache.spark.sql.functions.col
    val rightSel = rightSel0.select(
      rightSel0.columns.map(c => col(c).as(c)): _*)
    val lPlan = GraftSqlBridge.logicalPlan(left)
    val rPlan = GraftSqlBridge.logicalPlan(rightSel)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      org.apache.spark.sql.catalyst.expressions.UnixMicros(attr(lPlan, leftTs)),
      org.apache.spark.sql.catalyst.expressions.UnixMicros(attr(rPlan, rightTs)),
      rightCols.values.toSeq.map(attr(rPlan, _)))
    GraftSqlBridge.ofRows(spark, plan)
  }
}
