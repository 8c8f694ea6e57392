package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
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

/** Single-exchange as-of over the tagged union: the child is
  * `left´(tag=1) ∪ right´(tag=0)` projected to a common schema; this node
  * requires one hash-cluster on the key and a sort by
  * (key, ts, tag, tie-break payload), then emits each left row joined with
  * the payload of the most recent right row seen in its key group — a
  * one-pass carry-forward with O(1) state.
  *
  * Cost profile: ONE exchange + sort of |L|+|R| rows (identical to the
  * window rewrite in [[graft.ops.AsOfJoin]]) but no WindowExec frame
  * buffering and no `last(_, ignoreNulls)` aggregation machinery — the
  * cheapest possible per-row work after the sort. The two-sided merge
  * variant ([[AsOfJoinPlan]]) shuffles each input separately, which wins
  * when the inputs are already co-partitioned (bucketed by key: zero
  * exchanges); this one wins when both must shuffle anyway. */
final case class AsOfFillPlan(
    child: LogicalPlan,
    keys: Seq[Attribute],
    ts: Attribute,
    tag: Attribute,
    leftAttrs: Seq[Attribute],
    payload: Seq[Attribute])
  extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {

  override def output: Seq[Attribute] =
    leftAttrs ++ payload.map(_.withNullability(true))

  override protected def withNewChildInternal(newChild: LogicalPlan): AsOfFillPlan =
    copy(child = newChild)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec, AsOfFillPlan → AsOfFillExec. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload) :: Nil
    case AsOfFillPlan(c, keys, ts, tag, leftAttrs, payload) =>
      AsOfFillExec(planLater(c), keys, ts, tag, leftAttrs, payload) :: Nil
    case _ => Nil
  }
}

/** Shared per-partition setup for the two as-of exec nodes. */
private[plans] object AsOfExecUtil {
  import org.apache.spark.sql.types.{StructField, StructType}

  def schemaOf(attrs: Seq[Attribute]): StructType =
    StructType(attrs.map(a => StructField(a.name, a.dataType, a.nullable)))

  /** Generated bulk row joiner over (left, nullable payload) plus the
    * all-NULL payload row for unmatched left rows. */
  def joinerAndNullPayload(lAttrs: Seq[Attribute], payloadNullable: Seq[Attribute])
      : (org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowJoiner, UnsafeRow) = {
    val joiner = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeRowJoiner.create(schemaOf(lAttrs), schemaOf(payloadNullable))
    val nullPayload = UnsafeProjection.create(payloadNullable, payloadNullable)(
      InternalRow.fromSeq(Seq.fill[Any](payloadNullable.length)(null))).copy()
    (joiner, nullPayload)
  }

  /** Generated comparator over the (nullable) key schema. */
  def keyOrdering(keyAttrs: Seq[Attribute]): Ordering[InternalRow] =
    org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateOrdering.create(schemaOf(keyAttrs.map(_.withNullability(true))))
}

final case class AsOfFillExec(
    child: SparkPlan,
    keys: Seq[Attribute],
    ts: Attribute,
    tag: Attribute,
    leftAttrs: Seq[Attribute],
    payload: Seq[Attribute]) extends org.apache.spark.sql.execution.UnaryExecNode {

  override def output: Seq[Attribute] =
    leftAttrs ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // ts ASC NULLS FIRST puts null-ts left rows before every right row of
  // their key (they can never match); tag 0 < 1 makes the bound inclusive
  // (right rows at equal ts precede left rows); the name-sorted payload
  // ordering resolves (key, ts) ties deterministically (max payload wins),
  // matching the window rewrite
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    ((keys :+ ts :+ tag) ++ payload.sortBy(_.name))
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val keyAttrs = keys
    val tagAttr = tag
    val lAttrs = leftAttrs
    val pAttrs = payload
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyAttrs, childOut)
      val leftProj = UnsafeProjection.create(lAttrs, childOut)
      val payloadProj = UnsafeProjection.create(pAttrs, childOut)
      val tagIdx = childOut.indexWhere(_.exprId == tagAttr.exprId)
      val payloadNullable = pAttrs.map(_.withNullability(true))
      val (joiner, nullPayload) = AsOfExecUtil.joinerAndNullPayload(lAttrs, payloadNullable)
      val keyOrdering = AsOfExecUtil.keyOrdering(keyAttrs)

      new Iterator[InternalRow] {
        private var held: UnsafeRow = null      // payload of last right row in group
        private var prevKey: UnsafeRow = null   // current key group
        private var pending: InternalRow = null

        private def computeNext(): Unit = {
          while (pending == null && iter.hasNext) {
            val row = iter.next()
            val k = keyProj(row)
            if (prevKey == null || keyOrdering.compare(k, prevKey) != 0) {
              held = null
              prevKey = k.copy()
            }
            if (row.getInt(tagIdx) == 0) {
              held = payloadProj(row).copy() // later rows of the group overwrite
            } else {
              pending = joiner.join(leftProj(row),
                if (held != null) held else nullPayload)
            }
          }
        }
        override def hasNext: Boolean = { if (pending == null) computeNext(); pending != null }
        override def next(): InternalRow = {
          if (pending == null) computeNext()
          if (pending == null) throw new NoSuchElementException("empty iterator")
          val r = pending; pending = null; r
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): AsOfFillExec =
    copy(child = newChild)
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

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val payloadProj = UnsafeProjection.create(payload, rOut)
      // unmatched rows carry null payload: the projection must see the
      // payload attributes as NULLABLE or its generated code skips the
      // null-bit writes and emits stale/zero values instead of NULL
      val payloadNullable = payload.map(_.withNullability(true))
      val outAttrs = lOut ++ payloadNullable
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // fast output path: generated row joiner concatenates the two
      // UnsafeRows with bulk copies instead of a field-by-field projection
      // (the merge loop's dominant per-row cost — every left row pays it);
      // generated comparator — the interpreted natural ordering costs a
      // virtual dispatch per field per comparison
      val (joiner, nullPayloadUnsafe) =
        AsOfExecUtil.joinerAndNullPayload(lOut, payloadNullable)
      val keyOrdering = AsOfExecUtil.keyOrdering(
        lKeyExprs.zipWithIndex.map { case (e, i) =>
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            s"k$i", e.dataType, nullable = true)()
        })
      val rBuf = rIter.buffered
      var heldKey: InternalRow = null
      var heldTs: Long = Long.MinValue
      var heldPayload: UnsafeRow = null

      // NULL timestamps never match (left.ts >= right.ts is unknown):
      // null right rows are consumed without being held; null left rows
      // emit the null payload
      val NullTs = Long.MinValue
      def tsOf(proj: UnsafeProjection, row: InternalRow): Long = {
        val r = proj(row)
        if (r.isNullAt(0)) NullTs else r.getLong(0)
      }
      // NULL join keys never equal anything (equi-join semantics), but
      // ordering.compare treats NULLs as equal — a NULL-key left row
      // would otherwise take the payload of a NULL-key right row
      val nKeys = lKeyExprs.length
      def anyNullKey(key: InternalRow): Boolean = {
        var i = 0
        while (i < nKeys) { if (key.isNullAt(i)) return true; i += 1 }
        false
      }

      lIter.map { lRow =>
        // no defensive copy: lKeyProj's buffer stays valid until the next
        // left row, and rKeyProj (a distinct projection) can't clobber it
        val lKey = lKeyProj(lRow)
        val lTime = tsOf(lTsProj, lRow)
        // advance the right side through rows with key < lKey and, within
        // lKey, ts <= lTime, remembering the last row of the current key
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rRow = rBuf.head
          val rKey = rKeyProj(rRow)
          val cmp = keyOrdering.compare(rKey, lKey)
          if (cmp < 0) { rBuf.next() } // earlier key: skip (its matches are done)
          else if (cmp > 0) { advancing = false }
          else {
            val rTime = tsOf(rTsProj, rRow)
            if (rTime == NullTs || anyNullKey(rKey)) {
              rBuf.next() // null ts or null key: never matches anything
            } else if (lTime != NullTs && rTime <= lTime) {
              heldKey = rKey.copy()
              heldTs = rTime
              heldPayload = payloadProj(rRow).copy()
              rBuf.next()
            } else advancing = false
          }
        }
        val matches = heldPayload != null && heldKey != null &&
          lTime != NullTs && !anyNullKey(lKey) &&
          keyOrdering.compare(heldKey, lKey) == 0 && heldTs <= lTime
        val p = if (matches) heldPayload else nullPayloadUnsafe
        lRow match {
          case u: UnsafeRow => joiner.join(u, p)
          case _ => outProj(joined(lRow, p)) // non-unsafe input (rare): project
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Native-plan as-of join (ASOF LEFT, `left.ts >= right.ts`). Default is
    * the single-exchange carry-forward plan ([[AsOfFillExec]]); pass
    * `merge = true` for the two-sided merge plan ([[AsOfJoinExec]]), which
    * avoids the union and wins when both inputs are already partitioned by
    * the key (bucketed tables: zero exchanges). Registers the strategy on
    * the session on first use. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Map[String, String],
           merge: Boolean = false): DataFrame =
    if (merge) asofMerge(left, right, keys, leftTs, rightTs, rightCols)
    else asofFill(left, right, keys, leftTs, rightTs, rightCols)

  /** Single-exchange variant: tagged union + [[AsOfFillExec]] carry-forward. */
  def asofFill(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Map[String, String]): DataFrame = {
    val spark: SparkSession = left.sparkSession
    GraftSqlBridge.injectStrategy(spark, AsOfJoinStrategy)
    import org.apache.spark.sql.functions.{col, lit}
    val ts = "__asof_ts"
    val tag = "__asof_tag"
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(tag, lit(1))
      .select((keys ++ Seq(ts, tag)).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightCols.values.toSeq.map(c => lit(null).as(c)): _*)
    val r = right
      // NULL right ts / keys can never match (SQL unknown) — drop up front
      // so their payload is never carried
      .filter(keys.foldLeft(col(rightTs).isNotNull)((acc, k) => acc && col(k).isNotNull))
      .withColumn(ts, col(rightTs))
      .withColumn(tag, lit(0))
      .select((keys ++ Seq(ts, tag)).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
        rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
    val u = l.unionByName(r)
    val uPlan = GraftSqlBridge.logicalPlan(u)
    def attr(name: String): Attribute =
      uPlan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    GraftSqlBridge.ofRows(spark, AsOfFillPlan(
      uPlan,
      keys.map(attr),
      attr(ts),
      attr(tag),
      leftCols.map(attr),
      rightCols.values.toSeq.map(attr)))
  }

  /** Two-sided merge variant: one exchange + sort per side, O(1) merge. */
  def asofMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
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
