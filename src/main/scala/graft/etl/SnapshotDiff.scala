package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot CDC derivation — the inverse of [[Upsert]].
  *
  * The reference drives its incremental loads from a MySQL changelog table
  * (models/EtlLogger.js:6-17). When a source system offers only full
  * extracts, the changelog must be DERIVED: diff today's snapshot against
  * yesterday's keyed on the primary key and classify every key as
  * insert / update / delete. That derived change set then feeds the same
  * downstream path as a real changelog (Changelog.extract → Upsert.merge).
  *
  * Spark shape: ONE full-outer sort-merge join on the key — both sides
  * shuffle once on the same key, so at 100 TB the cost is two scans plus
  * one co-partitioned exchange each (and zero if both snapshots are
  * bucketed by the key on disk, which a daily-snapshot layout should be).
  * Unchanged rows are dropped POST-join with a null-safe column compare,
  * so the network never carries a "no-op" classification downstream —
  * typically >99% of a daily snapshot.
  */
object SnapshotDiff {

  /** Change set from `prev` → `curr`, keyed on `keys`; non-key columns of
    * `curr`'s schema are compared null-safely (`<=>`). Output: key columns,
    * `change` ∈ insert|update|delete, and `curr`'s non-key columns (NULL
    * for deletes — the downstream delete path only needs the key).
    */
  def changes(prev: DataFrame, curr: DataFrame, keys: Seq[String]): DataFrame = {
    val valCols = curr.columns.filterNot(keys.contains).toSeq
    val p = prev.select(curr.columns.map(c => col(c).as(s"_p_$c")).toSeq: _*)
    val joinCond = keys.map(k => col(k) <=> col(s"_p_$k")).reduce(_ && _)
    val inPrev = keys.map(k => col(s"_p_$k").isNotNull).reduce(_ && _)
    val inCurr = keys.map(k => col(k).isNotNull).reduce(_ && _)
    val changed = valCols.map(c => !(col(c) <=> col(s"_p_$c"))).reduce(_ || _)
    curr.join(p, joinCond, "full_outer")
      .withColumn("change",
        when(!inPrev, lit("insert"))
          .when(!inCurr, lit("delete"))
          .when(changed, lit("update")))
      .where(col("change").isNotNull)
      .select(
        keys.map(k => coalesce(col(k), col(s"_p_$k")).as(k)) ++
          (valCols.map(col) :+ col("change")): _*)
  }

  /** Collapse two consecutive [[changes]] sets (prev→mid, mid→curr) into
    * the single net change set prev→curr — CDC batch compaction, the
    * algebra a downstream consumer applies when it misses a batch and
    * replays two: net(c1, c2) MUST equal changes(prev, curr).
    *
    * The pair table (c1 state ends at mid, c2 starts there):
    *   insert→update = insert (c2 values) · insert→delete = ∅ ·
    *   update→update = update (c2) · update→delete = delete ·
    *   delete→insert = update — and then ANY net update whose final
    *   values null-safely equal prev's is dropped (delete + identical
    *   re-insert, or update chains that land back where they started,
    *   are no-ops against prev).
    *
    * Spark shape: one keyed full-outer between the two (small) change
    * sets, plus ONE left join back to `prev` that only the
    * delete→insert rows consult — at 100 TB the change sets are the
    * daily 0.1%, so the prev join is the only big-side shuffle and it
    * is the same cost class as deriving either change set. */
  def collapse(c1: DataFrame, c2: DataFrame, prev: DataFrame,
               keys: Seq[String], changeCol: String = "change"): DataFrame = {
    val valCols = c1.columns.filterNot(c => keys.contains(c) || c == changeCol).toSeq
    val a = c1.select(c1.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"_1_$c")).toSeq: _*)
    val b = c2.select(c2.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"_2_$c")).toSeq: _*)
    val p = prev.select(prev.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"_p_$c")).toSeq: _*)
    val ch1 = col(s"_1_$changeCol"); val ch2 = col(s"_2_$changeCol")
    val sameAsPrev = valCols.map(c => col(s"_2_$c") <=> col(s"_p_$c")).reduce(_ && _)
    val net0 = when(ch2.isNull, ch1)
      .when(ch1.isNull, ch2)
      .when(ch1 === "insert" && ch2 === "update", lit("insert"))
      .when(ch1 === "insert" && ch2 === "delete", lit(null))
      .when(ch1 === "update" && ch2 === "update", lit("update"))
      .when(ch1 === "update" && ch2 === "delete", lit("delete"))
      .when(ch1 === "delete" && ch2 === "insert", lit("update"))
    val net = when(net0 === "update" && ch2.isNotNull && sameAsPrev, lit(null))
      .otherwise(net0)
    a.join(b, keys, "full_outer")
      .join(p, keys, "left")
      .withColumn(changeCol, net)
      .where(col(changeCol).isNotNull)
      .select(keys.map(col) ++ valCols.map(c =>
        when(col(changeCol) === "delete", lit(null))
          .when(ch2.isNotNull, col(s"_2_$c"))
          .otherwise(col(s"_1_$c")).as(c)) :+
        col(changeCol): _*)
  }

  /** Apply a [[changes]]-shaped insert/update/delete set to `base` —
    * MERGE semantics including deletes, in ONE shuffle (the two-join
    * alternative, upsert + anti-join, shuffles the big base twice —
    * the difference that matters when `base` is the 100 TB side and
    * `changes` is the daily 0.1%).
    *
    * The WHEN MATCHED AND change='delete' THEN DELETE specialization of
    * the unified [[Merge.merge]]. */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   changeCol: String = "change"): DataFrame =
    Merge.merge(base, changes, keys,
      deleteCond = Some(col(changeCol) === "delete"))
}
