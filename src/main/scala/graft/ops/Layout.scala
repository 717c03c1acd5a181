package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout keys for data skipping.
  *
  * Sorting (or range-partitioning) a 100 TB table by a single column gives
  * parquet min/max pruning on that column only; interleaving the bits of
  * two filter columns into one Morton (Z-order) key clusters BOTH
  * dimensions, so each file's min/max rectangle is tight in both and a
  * predicate on either column prunes files. The key is pure codegen'd
  * bit arithmetic (shift/or/and — the classic magic-mask bit spread), so
  * it computes inside the scan stage; `repartitionByRange(zkey)` +
  * sortWithinPartitions(zkey) before the write is the layout step.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * lane (standard mask-doubling sequence). Input must be in [0, 2^16). */
  def spreadBits16(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving two 16-bit coordinates: x takes the
    * even bits, y the odd. */
  def mortonKey(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** The identical spread as a SQL fragment (oracle twin — same
    * masks, same shifts), built by textual substitution so the two
    * engines cannot drift. */
  def spreadBits16Sql(e: String): String = {
    val a = s"((($e) | (($e) << 8)) & 16711935)"
    val b = s"((($a) | (($a) << 4)) & 252645135)"
    val d = s"((($b) | (($b) << 2)) & 858993459)"
    s"((($d) | (($d) << 1)) & 1431655765)"
  }

  def mortonKeySql(x: String, y: String): String =
    s"(${spreadBits16Sql(x)} | (${spreadBits16Sql(y)} << 1))"

  /** Byte-balanced output sharding: assign id-ordered rows to shards of
    * ~`targetBytes` by the running byte total BEFORE each row (so a shard
    * never splits a row and fills to at least the target).
    *
    * The global prefix sum is computed in two phases so no window ever
    * sees the whole table in one partition: rows aggregate into
    * `blockSize`-id blocks (a narrow pre-aggregate), block offsets come
    * from a window over the SMALL block-sum table, and each row adds its
    * within-block running sum (window partitioned BY BLOCK). At 100 TB
    * only the block-sum table (rows / blockSize entries) is single-
    * partition — size blockSize so that stays in the millions.
    * Output: (id, bytes, before, shard). */
  def packShards(df: DataFrame, idCol: String, bytesCol: Column,
                 targetBytes: Long, blockSize: Long = 64L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).as("id"), bytesCol.cast("long").as("bytes"))
      .withColumn("blk", ((col("id") - col("id") % blockSize) / blockSize).cast("long"))
    val wBlk = Window.orderBy(col("blk")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("blk")).agg(sum(col("bytes")).as("bsum"))
      .withColumn("off", coalesce(sum(col("bsum")).over(wBlk), lit(0L)))
      .select(col("blk"), col("off"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(broadcast(offsets), "blk")
      .withColumn("before", col("off") + coalesce(sum(col("bytes")).over(wIn), lit(0L)))
      .withColumn("shard",
        ((col("before") - col("before") % targetBytes) / targetBytes).cast("long"))
      .select(col("id"), col("bytes"), col("before"), col("shard"))
  }
}
