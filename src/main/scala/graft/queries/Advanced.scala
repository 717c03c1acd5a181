package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.etl.Normalize
import graft.ops.{TextAnalysis => TA}

/** Advanced relational + pipeline operators (SURVEY §2.8): as-of join,
  * range join, cube, exact percentiles, SCD-2 history, funnel analytics,
  * corpus curation.
  *
  * Scale notes: the as-of join is the union+window shape (ONE shuffle by
  * key; never a point-in-time range join, which multiplies rows before
  * filtering). SCD-2 is a lead() window over the CDC stream. The range
  * join carries an equi key (orderkey) so the range predicate only prunes
  * within equi-matches — no interval explosion.
  */
object Advanced {

  val queries: Map[String, Q] = Map(
    // As-of join: for each 'error' event, the value of that user's most
    // recent earlier 'purchase'. Union+window: one shuffle by user_id.
    "q_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .where(col("event_type").isin("error", "purchase"))
        .withColumn("prev_purchase",
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
        .where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("prev_purchase"))
        .orderBy(col("event_id"))
    }),

    // Equi + range join: lineitems shipped within 90 days of their order.
    "q_range_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("rev"))
        .orderBy(col("mon"))
    }),

    // Full cube over two dimensions (all marginals).
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))),

    // Exact percentiles (linear interpolation — same formula both engines).
    "q_percentile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // SCD-2 history build from the CDC event stream: each record version
    // is valid [ts, next ts); the open version is flagged current.
    "etl_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"),
          Normalize.isoDateTimeOrNull(col("ts")).as("valid_from"),
          coalesce(Normalize.isoDateTimeOrNull(col("next_ts")), lit("9999-12-31 00:00:00")).as("valid_to"),
          when(col("next_ts").isNull, lit(1)).otherwise(lit(0)).as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // Conversion funnel: users who signed up, then purchased afterwards.
    "events_funnel" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"),
          count(lit(1)).as("n_events"))
        .agg(count(lit(1)).as("n_users"),
          count(col("first_signup")).as("n_signed"),
          count(when(col("first_signup").isNotNull &&
            col("last_purchase") > col("first_signup"), 1)).as("n_converted"),
          sum(col("n_events")).as("total_events"))),

    // Corpus curation: language filter + quality gates + exact-dup keeper
    // selection in one pass (the LLM-training-data admission pipeline).
    "corpus_curate" -> ((s, dir) => {
      val w = Window.partitionBy(md5(col("text")))
      Tables.documents(s, dir)
        .withColumn("keeper", min(col("doc_id")).over(w))
        .where(col("doc_id") === col("keeper") && col("lang") === "en")
        .withColumn("n_tok", TA.tokenCount(col("text")))
        .where(col("n_tok").between(5, 1000) && TA.stopwordRatio(col("text")) < 0.5)
        .select(col("doc_id"), col("n_tok"))
        .orderBy(col("doc_id"))
    })
  )

  private val toks = "string_split(trim(text), ' ')"

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT event_id, user_id, prev_purchase FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase
        |  FROM events WHERE event_type IN ('error', 'purchase')) t
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY mon ORDER BY mon""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "etl_scd2" ->
      """SELECT user_id, event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  coalesce(strftime(lead(CAST(ts AS TIMESTAMP)) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |    '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
        |  CASE WHEN lead(CAST(ts AS TIMESTAMP)) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
        |    THEN 1 ELSE 0 END AS is_current
        |FROM events ORDER BY user_id, valid_from, event_id""".stripMargin,

    "events_funnel" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
        |    max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS last_purchase,
        |    count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users, count(first_signup) AS n_signed,
        |  count(*) FILTER (WHERE first_signup IS NOT NULL
        |    AND last_purchase > first_signup) AS n_converted,
        |  sum(n_events) AS total_events
        |FROM pu""".stripMargin,

    "corpus_curate" ->
      s"""WITH k AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len($toks) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter($toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
         |      / len($toks) AS stop_ratio,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |  FROM documents)
         |SELECT doc_id, n_tok FROM k
         |WHERE doc_id = keeper AND lang = 'en'
         |  AND n_tok BETWEEN 5 AND 1000 AND stop_ratio < 0.5
         |ORDER BY doc_id""".stripMargin
  )
}
