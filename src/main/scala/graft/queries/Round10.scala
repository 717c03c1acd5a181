package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-10 additions: cross-source near-dup matrix (crawl-overlap
  * audit), tolerance-bounded as-of join (staleness-aware enrichment),
  * and the bipartite degree histogram (graph health readout). House
  * conventions as everywhere: integer-exact emitted columns, capped
  * pair machinery, oracle twins in DuckDB SQL.
  */
object Round10 {

  val queries: Map[String, Q] = Map(

    // Cross-source near-dup matrix: for each unordered source pair, the
    // number of t=0.5 trigram-Jaccard near-dup pairs crossing them (the
    // diagonal = within-source duplication) — the "which crawls overlap"
    // dashboard behind mixture planning. Reuses the SHARED checkpointed
    // pair index (one build serves the whole cluster family); this
    // query adds only two keyed joins against the tiny pair frame and a
    // bounded sources² rollup.
    "dedup_source_matrix" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      TextDedup.sharedPairs05(s, dir)
        .join(src.select(col("doc_id").as("a"), col("source").as("src_a")), Seq("a"))
        .join(src.select(col("doc_id").as("b"), col("source").as("src_b")), Seq("b"))
        .select(least(col("src_a"), col("src_b")).as("sa"),
          greatest(col("src_a"), col("src_b")).as("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Tolerance-bounded as-of join: each error event gets the user's
    // most recent earlier purchase ONLY if it is at most 1 hour stale —
    // the staleness contract real enrichment joins carry (a quote from
    // last week must not price today's trade). Same single-shuffle
    // union+window shape as q_asof_join, plus the integer staleness
    // column; the match ts and value come from the same window row.
    "q_asof_tolerance" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .where(col("ts").isNotNull && (col("event_type") === "error" ||
          (col("event_type") === "purchase" && col("value").isNotNull)))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_val",
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w))
        .withColumn("prev_us",
          last(when(col("event_type") === "purchase", col("us")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "error")
        .withColumn("stale_s", idiv(col("us") - col("prev_us"), lit(1000000L)))
        .select(col("event_id"), col("user_id"),
          when(col("stale_s") <= 3600, col("prev_val")).as("prev_purchase"),
          col("stale_s"))
        .orderBy(col("event_id"))
    }),

    // Degree histogram of the supplier–part bipartite graph (the
    // graph_pagerank edge list): per side, how many nodes have each
    // degree — the skew readout that predicts PageRank iteration
    // balance. Two keyed rollups; output bounded by distinct degrees.
    "graph_degree_hist" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(concat(lit("s:"), col("l_suppkey").cast("string")).as("a"),
          concat(lit("p:"), col("l_partkey").cast("string")).as("b"))
        .distinct()
      graft.ops.Graph.undirectedEdges(li, "a", "b")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .withColumn("side", substring(col("src"), 1, 1))
        .groupBy(col("side"), col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("side"), col("deg"))
    }),
  )

  val oracle: Map[String, String] = Map(

    // Same capped pair CTE as the dedup_clusters oracle family, rolled
    // up by unordered source pair.
    "dedup_source_matrix" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh0 AS (
         |  SELECT doc_id AS doc, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         |  FROM t),
         |dfreq AS (SELECT s, count(*) AS df FROM sh0 GROUP BY s),
         |sh AS (SELECT doc, sh0.s AS s FROM sh0 JOIN dfreq USING (s) WHERE df <= 50),
         |sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
         |inter AS (
         |  SELECT l.doc AS a, r.doc AS b, count(*) AS inter
         |  FROM sh l JOIN sh r ON l.s = r.s WHERE l.doc < r.doc GROUP BY l.doc, r.doc),
         |pairs AS (
         |  SELECT a, b FROM inter
         |  JOIN sizes sa ON sa.doc = a JOIN sizes sb ON sb.doc = b
         |  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5)
         |SELECT least(da.source, db.source) AS sa,
         |  greatest(da.source, db.source) AS sb, count(*) AS n_pairs
         |FROM pairs
         |JOIN documents da ON da.doc_id = pairs.a
         |JOIN documents db ON db.doc_id = pairs.b
         |GROUP BY sa, sb ORDER BY sa, sb""".stripMargin,

    "q_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |  WHERE ts IS NOT NULL AND (event_type = 'error'
        |    OR (event_type = 'purchase' AND value IS NOT NULL))),
        |w AS (
        |  SELECT event_id, user_id, event_type, us,
        |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |      OVER win AS prev_val,
        |    last_value(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS)
        |      OVER win AS prev_us
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id,
        |  CASE WHEN (us - prev_us) // 1000000 <= 3600 THEN prev_val END
        |    AS prev_purchase,
        |  CAST((us - prev_us) // 1000000 AS BIGINT) AS stale_s
        |FROM w WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "graph_degree_hist" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 's:' || l_suppkey AS a, 'p:' || l_partkey AS b
        |  FROM lineitem),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)
        |SELECT substring(src, 1, 1) AS side, deg, count(*) AS n_nodes
        |FROM deg GROUP BY side, deg ORDER BY side, deg""".stripMargin,
  )
}
