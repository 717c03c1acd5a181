package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native backward as-of join — the whole-operator tier of the custom-op
  * ladder (LogicalPlan + Strategy + SparkPlan via SparkSessionExtensions),
  * used where composing built-ins can't express the plan we want.
  *
  * Semantics: for every left row, attach the right row with the LARGEST
  * right-time satisfying `rightTime <= leftTime` within the same key
  * (null right side when no such row) — the classic trades-vs-quotes
  * backward as-of. The composed alternative (union + last_value window,
  * queries/Advanced.scala q_asof_join) answers the same question but pays
  * a union materialization and a window over the merged stream; a range
  * join would explode to O(pairs) before picking the max.
  *
  * Scale shape: each side shuffles ONCE on its key (ClusteredDistribution)
  * and sorts by (key, time) — exactly a sort-merge join's cost — then a
  * single forward merge pass per partition emits every left row with O(1)
  * state (one buffered candidate row). No row explosion, no per-key
  * buffering, skew-safe in the same way sort-merge is: a hot key streams
  * through one sorted partition instead of building a hash table.
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression)
  extends BinaryNode {

  // Fail at plan CONSTRUCTION, not inside a task: the merge compares
  // left-vs-right values with one Ordering per column pair, so the sides
  // must agree exactly (the supported types are all atomic, so plain
  // equality is nullability-free). This also rejects TIMESTAMP vs
  // TIMESTAMP_NTZ — comparable representations, different wall-clock
  // semantics.
  require(leftKey.dataType == rightKey.dataType,
    s"asof join: key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"asof join: time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  AsOfJoinExec.orderingFor(leftKey.dataType)
  AsOfJoinExec.orderingFor(leftTime.dataType)

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via GraftExtensions. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Expression, rightKey: Expression,
                              leftTime: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** One shuffle per side, co-partitioned on the key. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Sorted by (key, time) — EnsureRequirements inserts the sorts. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** Left rows pass through unchanged, so left's partitioning and
    * ordering survive — downstream ops on the key need no re-shuffle. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    import AsOfJoinExec.{orderingFor => atomicOrdering}
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey, lOut)
      val lt = BindReferences.bindReference(leftTime, lOut)
      val rk = BindReferences.bindReference(rightKey, rOut)
      val rt = BindReferences.bindReference(rightTime, rOut)
      val kOrd = atomicOrdering(leftKey.dataType)
      val tOrd = atomicOrdering(leftTime.dataType)
      val joiner = new JoinedRow
      val rightNulls = new GenericInternalRow(rOut.size)
      // bind against a NULLABILIZED right schema: bindReference takes each
      // field's nullability from the input side, and a non-nullable right
      // column would skip the null check and read garbage off rightNulls
      val project = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))

      // single forward pass: `cand` is the next unconsumed right row,
      // `m` the best (latest-time) match seen for its key so far
      var cand: InternalRow = null
      var candKey: Any = null
      var candTime: Any = null
      var m: InternalRow = null
      var mKey: Any = null

      lIter.map { l =>
        val lKeyV = lk.eval(l)
        val lTimeV = lt.eval(l)
        // null-TIME left rows must not advance either: comparing a right
        // time against null would unbox to 0 (or NPE for strings) and
        // consume right rows that a later real-time left row still needs
        if (lKeyV != null && lTimeV != null) {
          var advancing = true
          while (advancing) {
            if (cand == null && rIter.hasNext) {
              // copy before eval: the child iterator reuses its row, and
              // a UTF8String key would otherwise point at recycled bytes
              val r = rIter.next().copy()
              val k = rk.eval(r)
              if (k != null) { cand = r; candKey = k; candTime = rt.eval(r) }
            } else if (cand != null) {
              val c = kOrd.compare(candKey, lKeyV)
              if (c < 0) cand = null // key already passed by the sorted left side
              else if (c == 0 && (candTime == null || tOrd.compare(candTime, lTimeV) <= 0)) {
                if (candTime != null) { m = cand; mKey = candKey }
                cand = null // null-time right rows are skipped, never matched
              } else advancing = false
            } else advancing = false
          }
        }
        val rSide =
          if (lKeyV != null && lTimeV != null && m != null && kOrd.compare(mKey, lKeyV) == 0) m
          else rightNulls
        project(joiner(l, rSide))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExec {
  /** Interpreted total order for the supported key/time types (the eval()
    * results of atomic columns). Deliberately a closed list; [[AsOfJoin]]
    * evaluates it at plan construction so an unsupported type fails
    * there, never inside a task with a wrong answer. */
  private[plans] def orderingFor(dt: DataType): Ordering[Any] = (dt match {
    case LongType | TimestampType | TimestampNTZType => Ordering.Long
    case IntegerType | DateType => Ordering.Int
    case ShortType => Ordering.Short
    case DoubleType => Ordering.Double.TotalOrdering
    case FloatType => Ordering.Float.TotalOrdering
    case StringType => new Ordering[UTF8String] {
      def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
    }
    case other =>
      throw new IllegalArgumentException(s"asof join: unsupported key/time type $other")
  }).asInstanceOf[Ordering[Any]]
}

/** DataFrame-level API for the native as-of join. */
object AsOf {

  /** Backward as-of join `left` with `right`: for each left row, the
    * right row with the greatest `rightTime <= leftTime` sharing the key
    * (right columns null when none). The right side's attributes are
    * re-aliased with fresh expression ids so self-derived sides (e.g. a
    * filtered/aggregated view of the left table) can't collide. */
  def joinBackward(left: org.apache.spark.sql.DataFrame,
                   right: org.apache.spark.sql.DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark: SparkSession = left.sparkSession
    // self-register on sessions built without GraftExtensions (e.g. a
    // harness-owned session): extraStrategies is runtime-settable and a
    // duplicate registration is harmless but avoided anyway
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def find(out: Seq[Attribute], name: String): Attribute =
      out.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"asof join: no column '$name' in [${out.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"asof join: ambiguous column '$name' (${many.size} matches)")
      }
    val plan = AsOfJoin(lPlan, rPlan,
      find(lPlan.output, leftKey), find(rPlan.output.map(_.toAttribute), rightKey),
      find(lPlan.output, leftTime), find(rPlan.output.map(_.toAttribute), rightTime))
    org.apache.spark.sql.graft.Bridge.ofRows(spark, plan)
  }
}
