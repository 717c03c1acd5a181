package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * Spark already handles two skew classes without help: hash aggregates
  * do map-side partial aggregation (a hot group combines before the
  * shuffle), and AQE splits oversized sort-merge-join partitions at
  * runtime. What remains is (a) hash joins where one key dominates —
  * salting spreads that key's rows over `saltFactor` tasks by replicating
  * the other side — and (b) exact distinct aggregation, where the
  * classic two-phase shape spreads by value before counting by group.
  */
object Skew {

  private val SaltCol = "_graft_salt"

  /** Salted equi-join: `left` rows get a salt in [0, saltFactor); the
    * smaller `right` side is replicated saltFactor×, and the join key
    * becomes (keys, salt). Result set is identical to the unsalted join;
    * a hot key's probe rows now spread over saltFactor tasks. Replication
    * multiplies the right side — use only when right is much smaller. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit one row per unmatched salted COPY —
    // saltFactor duplicates of every unmatched right row
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")(joinType),
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched right rows")
    val l = left.withColumn(SaltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Exact distinct count per group, two-phase: first shuffle spreads by
    * (group, value) — a hot group's values land on many tasks — then a
    * small second aggregate counts per group. Equivalent to countDistinct
    * but skew-immune: NULL values survive the distinct but are skipped by
    * count(valueCol), so a group whose values are ALL NULL still appears
    * with n_distinct = 0, exactly like countDistinct. */
  def distinctCountTwoPhase(df: DataFrame, groupCol: String,
                            valueCol: String): DataFrame =
    df.select(col(groupCol), col(valueCol))
      .distinct()
      .groupBy(col(groupCol)).agg(count(col(valueCol)).as("n_distinct"))
}
