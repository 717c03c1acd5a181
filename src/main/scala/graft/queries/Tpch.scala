package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H shape completion (round 9): Q4/Q6/Q15/Q17/Q19/Q21 — with
  * Q1/Q3/Q5/Q7/Q8/Q9/Q10/Q12/Q13/Q14/Q18/Q22 already registered this
  * covers 18 of the 22 TPC-H query shapes; Q2/Q11/Q16/Q20 need the
  * partsupp table the testdata doesn't carry. Every output is
  * integer-exact (cents / counts), and every correlated predicate is
  * rewritten into its distributed form (semi/anti join or group-having)
  * rather than a per-row subquery.
  *
  * Money convention as in [[Round9b]]: one rounding per source column
  * (cents = round(price·100), disc_bp = round(discount·10⁴)), integer
  * arithmetic after.
  */
object Tpch {

  private def discRev = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val discBp = round(col("l_discount") * 10000).cast("long")
    idiv(cents * (lit(10000L) - discBp), lit(10000L))
  }

  val queries: Map[String, Q] = Map(

    // Q4: order-priority checking — orders in a one-year window with at
    // least one line shipped > 60 days after the order date. EXISTS
    // becomes a left-semi join on the pre-filtered line set; output is
    // the 5-row priority rollup.
    "q4_priority_exists" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .where(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val late = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(late,
          ord("o_orderkey") === late("l_orderkey") &&
            late("l_shipdate") > date_add(ord("o_orderdate"), 60),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q6: forecasting revenue change — the pure predicate-pushdown
    // query: one selective scan, zero joins, one global sum. Revenue
    // here is price × discount (the revenue GIVEN UP by the discount),
    // per-row integer: cents·disc_bp div 10⁴.
    "q6_selective_sum" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val discBp = round(col("l_discount") * 10000).cast("long")
      Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 1997 &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
        .select(idiv(cents * discBp, lit(10000L)).as("d"))
        .agg(count(lit(1)).as("n_lines"), sum(col("d")).as("revenue_cents"))
    }),

    // Q15: top supplier — per-supplier revenue over a half-year window,
    // then the supplier(s) achieving the maximum (the scalar-subquery-
    // on-an-aggregate shape: a 1-row broadcast max against the bounded
    // per-supplier rollup, ties kept like the spec requires).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(year(col("l_shipdate")) === 1996 &&
          quarter(col("l_shipdate")).isin(1, 2))
        .select(col("l_suppkey"), discRev.as("r"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("r")).as("total_cents"))
        .localCheckpoint(true) // feeds the max AND the winner filter
      val mx = rev.agg(max(col("total_cents")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_cents") === col("mx"))
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy(col("s_suppkey"))
    }),

    // Q17: small-quantity-order revenue — lines of one brand whose
    // quantity is below 20% of that part's average. The correlated
    // avg becomes a per-part (n, Σqty) rollup broadcast back onto the
    // lines; the fractional test 5·qty·n < Σqty is exact integer
    // cross-multiplication (no division anywhere).
    "q17_small_qty" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_partkey"), round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val brand = Tables.part(s, dir)
        .where(col("p_brand") === "Brand#13").select(col("p_partkey"))
      val bl = li.join(brand, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("qty"), col("cents"))
        .localCheckpoint(true) // feeds the per-part stats AND the filter
      val stats = bl.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
      bl.join(broadcast(stats), col("l_partkey") === col("pk"))
        .where(col("qty") * 5 * col("n") < col("sq"))
        .agg(count(lit(1)).as("n_small"), sum(col("cents")).as("cents_small"))
    }),

    // Q19: discounted revenue under a DNF predicate — OR of three
    // (brand, size-band, qty-band) conjuncts over the part join. The
    // whole disjunction stays one codegen'd boolean on the joined row;
    // the part join shuffles on partkey like every fact–part query.
    "q19_dnf_pred" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_partkey"), round(col("l_quantity")).cast("long").as("qty"),
        discRev.as("r"))
      val part = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val pred =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 20) &&
          col("qty").between(1, 20)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
          col("qty").between(10, 30)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 40) &&
          col("qty").between(20, 40))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .where(pred)
        .agg(count(lit(1)).as("n_lines"), sum(col("r")).as("revenue_cents"))
    }),

    // Q21: suppliers who kept orders waiting — for multi-supplier 'F'
    // orders, the SOLE supplier whose line shipped > 30 days after the
    // order date. The EXISTS / NOT EXISTS pair collapses into one
    // per-order rollup (distinct suppliers, distinct LATE suppliers,
    // the late supplier when unique) — no correlated subqueries, one
    // shuffle by order then one by supplier.
    "q21_late_supplier" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val flagged = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          when(col("l_shipdate") > date_add(col("o_orderdate"), 30), 1L)
            .otherwise(0L))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
      val perOrder = flagged.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(col("late")).as("n_late"),
          max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
        .where(col("n_supp") > 1 && col("n_late") === 1)
      perOrder
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
          col("late_supp") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    }),
  )

  val oracle: Map[String, String] = Map(

    "q4_priority_exists" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXTRACT(year FROM o.o_orderdate) = 1996
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND CAST(l.l_shipdate AS DATE) >
        |          CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,

    "q6_selective_sum" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum((CAST(round(l_extendedprice * 100) AS BIGINT)
        |        * CAST(round(l_discount * 10000) AS BIGINT)) // 10000)
        |    AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE EXTRACT(year FROM l_shipdate) = 1997
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum((CAST(round(l_extendedprice * 100) AS BIGINT)
        |          * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) // 10000)
        |      AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE EXTRACT(year FROM l_shipdate) = 1996
        |    AND EXTRACT(quarter FROM l_shipdate) IN (1, 2)
        |  GROUP BY l_suppkey),
        |mx AS (SELECT max(total_cents) AS mx FROM rev)
        |SELECT s.s_suppkey, s.s_name, r.total_cents
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey, mx
        |WHERE r.total_cents = mx.mx
        |ORDER BY s.s_suppkey""".stripMargin,

    "q17_small_qty" ->
      """WITH bl AS (
        |  SELECT l.l_partkey, CAST(round(l.l_quantity) AS BIGINT) AS qty,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#13'),
        |st AS (SELECT l_partkey AS pk, count(*) AS n,
        |         CAST(sum(qty) AS BIGINT) AS sq
        |       FROM bl GROUP BY l_partkey)
        |SELECT count(*) AS n_small, CAST(sum(bl.cents) AS BIGINT) AS cents_small
        |FROM bl JOIN st ON bl.l_partkey = st.pk
        |WHERE bl.qty * 5 * st.n < st.sq""".stripMargin,

    "q19_dnf_pred" ->
      """WITH j AS (
        |  SELECT CAST(round(l.l_quantity) AS BIGINT) AS qty,
        |    (CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |     * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))) // 10000 AS r,
        |    p.p_brand, p.p_size
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT count(*) AS n_lines, CAST(sum(r) AS BIGINT) AS revenue_cents
        |FROM j
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20
        |       AND qty BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
        |       AND qty BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 40
        |       AND qty BETWEEN 20 AND 40)""".stripMargin,

    "q21_late_supplier" ->
      """WITH f AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    max(CASE WHEN CAST(l.l_shipdate AS DATE) >
        |          CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |  GROUP BY l.l_orderkey, l.l_suppkey),
        |po AS (
        |  SELECT l_orderkey, count(*) AS n_supp,
        |    CAST(sum(late) AS BIGINT) AS n_late,
        |    max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
        |  FROM f GROUP BY l_orderkey
        |  HAVING count(*) > 1 AND sum(late) = 1)
        |SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM po JOIN supplier s ON po.late_supp = s.s_suppkey
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY numwait DESC, s.s_suppkey LIMIT 20""".stripMargin,
  )
}
