package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native as-of join — the engine's whole-operator extension point
  * (logical node + planner strategy + physical operator), the (c) tier of
  * SURVEY §2's custom-operator preference order.
  *
  * Semantics: for every left row, attach the LAST right row with the same
  * key whose time is <= the left row's time (inclusive), or nulls if none —
  * DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.t >= r.t`, the
  * point-in-time lookup every feature-store / trade-matching pipeline runs.
  *
  * Why a physical operator: the composable forms are either an equi+range
  * join (quadratic on hot keys — a range join explodes at 100 TB) or the
  * union+window trick (q27 — linear, but it shuffles BOTH tables into one
  * partitioned sort and carries every payload column through the window
  * state). This operator is the shape a native engine picks: co-partition
  * the two inputs on the key (one exchange each, the same distribution a
  * shuffle join needs), sort each partition by (key, time), and stream both
  * sides through a single forward-only merge — no pair space, no window
  * state, per-partition memory = ONE buffered right row. AQE still plans
  * the exchanges; Catalyst still pushes filters below it (the node's
  * children are ordinary plan inputs).
  *
  * Determinism: if several right rows share (key, time), the merge keeps
  * the last in the child sort order — callers must deduplicate or accept
  * sort-order ties, same as any sort-based engine. q27b feeds a (key, time)
  * -unique build side, so its gate is exact.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same distribution a shuffled equi join asks for: both sides clustered
    * on the key, so EnsureRequirements co-partitions them (and AQE plans /
    * coalesces those exchanges as usual). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** Each partition sorted by (key, time): the merge is then one forward
    * pass. EnsureRequirements inserts the sorts. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Key/time read out of the projected row as a total-ordered Long (the
    * internal representation of every supported type). */
  private def asLong(r: InternalRow, i: Int, dt: DataType): Long = dt match {
    case LongType | TimestampType | TimestampNTZType => r.getLong(i)
    case IntegerType | DateType                      => r.getInt(i).toLong
    case other =>
      throw new IllegalArgumentException(s"as-of key/time type $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind against NULLABLE right attributes: BindReferences takes null
      // checks from the INPUT side, and unmatched left rows project the
      // all-null row through right columns the child declared non-nullable
      // (SortMergeJoinExec does the same for its outer sides)
      val resultProj =
        UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the one buffered right row: the current best (greatest time so
        // far) match, plus the not-yet-consumed head of the right side
        private var rHead: InternalRow = _
        private var rHeadKey = 0L
        private var rHeadTime = 0L
        private var rHeadValid = false
        private var lastMatch: InternalRow = _
        private var lastMatchKey = 0L

        private def advanceRight(): Unit = {
          rHeadValid = false
          while (!rHeadValid && rIter.hasNext) {
            val row = rIter.next()
            val kt = rProj(row)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              rHead = row
              rHeadKey = asLong(kt, 0, rk.dataType)
              rHeadTime = asLong(kt, 1, rt.dataType)
              rHeadValid = true
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val kt = lProj(l)
          if (kt.isNullAt(0) || kt.isNullAt(1)) {
            resultProj(joined(l, nullRight))
          } else {
            val key = asLong(kt, 0, lk.dataType)
            val time = asLong(kt, 1, lt.dataType)
            // consume right rows at or before (key, time); remember the
            // last one on OUR key — it is the as-of match
            while (rHeadValid && (rHeadKey < key ||
                (rHeadKey == key && rHeadTime <= time))) {
              if (rHeadKey == key) {
                // InternalRow.copy, not an UnsafeRow cast: a child whose
                // ordering already satisfies ours may emit generic rows
                lastMatch = rHead.copy()
                lastMatchKey = key
              }
              advanceRight()
            }
            if (lastMatch != null && lastMatchKey == key)
              resultProj(joined(l, lastMatch))
            else resultProj(joined(l, nullRight))
          }
        }
      }
    }
  }
}

/** Query-facing constructor: co-partitioned sort-merge as-of left join.
  * Installs the planner strategy on the session idempotently (public
  * `spark.experimental.extraStrategies`, so it works in ANY session — the
  * driver's included — without GraftExtensions). */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val (lkA, rkA) = (attr(lp, leftKey), attr(rp, rightKey))
    val (ltA, rtA) = (attr(lp, leftTime), attr(rp, rightTime))
    // mixed representations fail SILENTLY otherwise: Date-vs-Timestamp
    // compares days against micros (every row "matches" the key's latest
    // build row), and Int-vs-Long keys hash to different partitions and
    // never meet. Same 8-byte class is fine (TIMESTAMP vs TIMESTAMP_NTZ
    // under one session zone — both micros, hashed as the same long).
    def rep(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => 8
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => 4
      case other =>
        throw new IllegalArgumentException(s"as-of key/time type $other")
    }
    require(rep(lkA.dataType) == rep(rkA.dataType),
      s"as-of key types differ: ${lkA.dataType} vs ${rkA.dataType}")
    require(rep(ltA.dataType) == rep(rtA.dataType),
      s"as-of time types differ: ${ltA.dataType} vs ${rtA.dataType}")
    org.apache.spark.sql.graft.ColumnBridge.dataset(spark,
      AsOfJoinPlan(lp, rp, lkA, rkA, ltA, rtA))
  }
}
