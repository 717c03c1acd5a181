package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.{TextAnalysis => TA, Dedup}

/** Round-9 additions: weighted quantiles, Pareto frontier, Hamming-band
  * SimHash dedup, and token-budget shard packing — each in the
  * two-phase / pigeonhole shapes that survive a 100× scale-up (no global
  * unpartitioned windows over row-proportional sets, no distance scans).
  */
object Round9 {

  val queries: Map[String, Q] = Map(

    // Weighted median (P50 of price weighted by quantity) per return
    // flag — the weighted-quantile shape feature stores need. Built on
    // the TWO-PHASE cumulative weight (per-(group, value-block) partial
    // sums + broadcast prefix offsets, the q_percent_rank pattern), so
    // no window ever sorts a whole group's rows in one task. The median
    // is min value v with 2·W(≤v) ≥ W_total — picking min(v) over
    // qualifying ROWS is tiebreak-independent because a value's max-cum
    // row qualifies iff 2·W(≤v) ≥ tot.
    "q_weighted_percentile" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("rf"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
        .withColumn("blk", expr("cents div 100000"))
      val grp = li.groupBy(col("rf"), col("blk"))
        .agg(sum(col("w")).as("bw"))
        .localCheckpoint(true) // feeds offsets AND group totals
      val wB = Window.partitionBy(col("rf")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = grp.withColumn("off", coalesce(sum(col("bw")).over(wB), lit(0L)))
        .select(col("rf"), col("blk"), col("off"))
      val tot = grp.groupBy(col("rf")).agg(sum(col("bw")).as("tot"))
      val wIn = Window.partitionBy(col("rf"), col("blk"))
        .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.join(broadcast(offs), Seq("rf", "blk"))
        .withColumn("cum", col("off") + sum(col("w")).over(wIn))
        .join(broadcast(tot), Seq("rf"))
        .groupBy(col("rf"))
        .agg(count(lit(1)).as("n_items"), max(col("tot")).as("total_w"),
          min(when(col("cum") * 2 >= col("tot"), col("cents"))).as("median_cents"))
        .orderBy(col("rf"))
    }),

    // 2-D Pareto frontier (skyline): orders minimizing (price, date) —
    // the points no other order beats on both axes. Group to one row per
    // distinct price first (min date per cents), then a TWO-PHASE
    // strict-prefix min over the cents ordering (per-block min + bounded
    // window over blocks + within-block prefix): the frontier test
    // `mind < min(mind | cents' < cents)` without a global window over
    // all distinct prices. Dates are integer epoch-days
    // (engine-portable); ties on both axes are kept (neither dominates).
    "q_skyline" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
        .localCheckpoint(true) // scanned by the frontier AND the point-count join
      val g = o.groupBy(col("cents")).agg(min(col("d")).as("mind"))
        .withColumn("blk", expr("cents div 1000000"))
      val bmin = g.groupBy(col("blk")).agg(min(col("mind")).as("bm"))
      val wB = Window.orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1) // over blocks: bounded
      val boff = bmin.withColumn("pmB", min(col("bm")).over(wB))
        .select(col("blk"), col("pmB"))
      val wIn = Window.partitionBy(col("blk")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = g.join(broadcast(boff), Seq("blk"))
        .withColumn("pmIn", min(col("mind")).over(wIn))
        .withColumn("pmin", least(col("pmB"), col("pmIn"))) // least skips nulls
        .where(col("pmin").isNull || col("mind") < col("pmin"))
        .select(col("cents"), col("mind"))
      frontier.join(o, frontier("cents") === o("cents") && o("d") === frontier("mind"))
        .groupBy(frontier("cents"), col("mind").as("day_epoch"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("cents"))
    }),

    // SimHash near-dup PAIRS at Hamming distance ≤ 3 — what the
    // equality-bucket dedup_simhash can't see (one flipped bit = missed
    // pair). Band pigeonhole over the 64-bit fingerprint: 4 disjoint
    // 16-bit bands, ≤3 flips leave ≥1 band identical, so candidates come
    // from 4 capped equality self-joins and are verified with an exact
    // popcount. See graft.ops.Dedup.simhashHammingPairs.
    "dedup_simhash_hamming" -> ((s, dir) =>
      Dedup.simhashHammingPairs(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("a"), col("b"))),

    // Token-budget shard packing: docs in doc_id order packed greedily
    // into fixed 20k-token shards (shard = tokens-before-doc div budget)
    // — the "write the corpus as N-token training shards" step. The
    // global prefix sum is TWO-PHASE (per-block partials + broadcast
    // offsets + within-block running sum); output is one row per shard,
    // ∝ corpus tokens / budget, never per doc.
    "corpus_pack_budget" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("doc_id"), TA.tokenCount(col("text")).as("nt"))
        .withColumn("blk", expr("doc_id div 256"))
      val grp = d.groupBy(col("blk")).agg(sum(col("nt")).as("bn"))
      val wB = Window.orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1) // over blocks: bounded
      val offs = grp.withColumn("off", coalesce(sum(col("bn")).over(wB), lit(0L)))
        .select(col("blk"), col("off"))
      val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      d.join(broadcast(offs), Seq("blk"))
        .withColumn("prev",
          col("off") + coalesce(sum(col("nt")).over(wIn), lit(0L)))
        .withColumn("shard", expr("prev div 20000"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"))
    }),
  )

  val oracle: Map[String, String] = Map(

    "q_weighted_percentile" ->
      """WITH li AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(round(l_quantity) AS BIGINT) AS w, l_orderkey, l_linenumber
        |  FROM lineitem),
        |c AS (SELECT rf, cents, w,
        |  sum(w) OVER (PARTITION BY rf ORDER BY cents, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(w) OVER (PARTITION BY rf) AS tot
        |  FROM li)
        |SELECT rf, count(*) AS n_items, CAST(max(tot) AS BIGINT) AS total_w,
        |  CAST(min(CASE WHEN 2 * cum >= tot THEN cents END) AS BIGINT)
        |    AS median_cents
        |FROM c GROUP BY rf ORDER BY rf""".stripMargin,

    "q_skyline" ->
      """WITH o AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM orders),
        |g AS (SELECT cents, min(d) AS mind FROM o GROUP BY cents),
        |p AS (SELECT cents, mind, min(mind) OVER (ORDER BY cents
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin FROM g),
        |f AS (SELECT cents, mind FROM p WHERE pmin IS NULL OR mind < pmin)
        |SELECT f.cents, f.mind AS day_epoch, count(*) AS n_orders
        |FROM f JOIN o ON o.cents = f.cents AND o.d = f.mind
        |GROUP BY f.cents, f.mind ORDER BY f.cents""".stripMargin,

    // Same md5 nibble-vote SimHash as the dedup_simhash oracle, extended
    // to 64 bits (first 16 hex digits); bit 63 assembles through HUGEINT
    // with an explicit signed-64 wrap (1::BIGINT << 63 overflows).
    // Arithmetic >> on negative BIGINT matches Java's sign-extending
    // shift (verified), so band keys agree bit-for-bit.
    "dedup_simhash_hamming" ->
      s"""WITH tok AS (
         |  SELECT doc_id AS doc, md5(unnest($toksSql)) AS h FROM documents),
         |bits AS (
         |  SELECT doc, h, j.range AS j,
         |    strpos('0123456789abcdef', substring(h, 1 + CAST(j.range // 4 AS INTEGER), 1)) - 1 AS nib
         |  FROM tok CROSS JOIN range(64) j),
         |votes AS (
         |  SELECT doc, j, sum(CASE WHEN (nib >> CAST(j % 4 AS INTEGER)) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM bits GROUP BY doc, j),
         |raw AS (
         |  SELECT doc, sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(j AS INTEGER) ELSE 0 END) AS s
         |  FROM votes GROUP BY doc),
         |sh AS (
         |  SELECT doc, CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616
         |    ELSE s END AS BIGINT) AS fp FROM raw),
         |bands AS (
         |  SELECT doc, fp, b.range AS band,
         |    (fp >> CAST(16 * b.range AS INTEGER)) & 65535 AS key
         |  FROM sh CROSS JOIN range(4) b),
         |occ AS (SELECT band, key, count(*) AS m FROM bands GROUP BY band, key),
         |kept AS (
         |  SELECT b.doc, b.fp, b.band, b.key FROM bands b
         |  JOIN occ USING (band, key) WHERE occ.m <= 200),
         |cand AS (
         |  SELECT DISTINCT l.doc AS a, r.doc AS b, l.fp AS fa, r.fp AS fb
         |  FROM kept l JOIN kept r ON l.band = r.band AND l.key = r.key
         |  WHERE l.doc < r.doc)
         |SELECT a, b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(fa, fb)) <= 3 ORDER BY a, b""".stripMargin,

    "corpus_pack_budget" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS nt FROM documents),
         |c AS (SELECT doc_id, nt,
         |  COALESCE(sum(nt) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
         |  FROM d)
         |SELECT CAST(prev // 20000 AS BIGINT) AS shard, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
