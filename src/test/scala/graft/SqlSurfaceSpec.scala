package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The SQL surface: the testdata tables registered as temp views plus
  * the GraftExtensions-registered native functions let a SQL user drive
  * the engine the way the reference's API users drove it — this spec
  * runs ALL 85 dialect-portable SURVEY §2 shapes as spark.sql TEXT
  * (each query's committed oracle SQL, where it is ANSI enough for
  * both engines — the graft.SqlSweep census) and pins every result
  * row-identical to the DataFrame registry entry. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.sources.Tables(spark, TestSpark.sf, t).createOrReplaceTempView(t)
    }

  // EVERY §2 shape whose committed oracle text is engine-portable ANSI
  // (no DuckDB-only operators like // / strftime / string_split) — the
  // round-14 graft.SqlSweep pass ran all 443 texts through spark.sql:
  // 85 parse AND match the DataFrame registry row-for-row (pinned here,
  // spanning agg, multi-join, window, set ops, subqueries, ETL
  // merge/CDC, events analytics, graph, multimodal, dedup, percentile);
  // 357 use DuckDB dialect (PARSE_FAIL — by design, the oracle is
  // DuckDB); ONE (q_regex_extract) parses on both engines but diverges
  // semantically (regex dialect), so it must never be pinned.
  private val candidates = Seq(
    "dedup_exact", "dedup_priority_keeper", "etl_apply_changes",
    "etl_cdc_collapse", "etl_changelog_dispatch", "etl_changelog_extract",
    "etl_clean_customer", "etl_incr_agg", "etl_merge_insert_only",
    "etl_merge_update_only", "etl_order_totals_audit", "etl_quarantine",
    "etl_run_report", "etl_schema_evolve", "etl_seq_gaps",
    "etl_snapshot_diff", "etl_upsert_merge", "etl_validate_keys",
    "events_autocorr", "events_changepoint", "events_correlate",
    "events_dow_anomaly", "events_drawdown", "events_funnel",
    "events_path", "events_type_overlap", "events_velocity",
    "events_zscore", "graph_bfs_2hop", "graph_bfs_layers",
    "graph_degree_hist", "graph_harmonic_2hop", "mm_format_sniff",
    "mm_qa_sample", "mm_size_hist", "q12_ship_latency", "q13_custdist",
    "q17_small_qty", "q1_agg", "q21_late_supplier", "q4_priority_exists",
    "q5_multi_join", "q7_trade_volume", "q_anti_join",
    "q_approx_distinct", "q_basket_pairs", "q_bloom_prune", "q_case_agg",
    "q_cond_aggs", "q_correlated", "q_count_distinct", "q_cube",
    "q_decile_stats", "q_distinct", "q_distinct_twophase", "q_except",
    "q_except_all", "q_exists_chain", "q_filter_pushdown",
    "q_gaps_islands", "q_grouping_sets", "q_histogram", "q_intersect",
    "q_intersect_all", "q_join_fanout_audit", "q_merge_intervals",
    "q_minmax_by", "q_null_handling", "q_null_safe_join", "q_outer_join",
    "q_rel_division", "q_rollup", "q_scalar_subquery", "q_semi_join",
    "q_skew_join", "q_skyline", "q_stats_corr", "q_string_funcs",
    "q_union_agg", "q_unpivot", "q_weighted_percentile",
    "q_window_funcs", "q_window_rank", "q_window_running",
    "text_dedup_xsource")

  private def norm(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
      .collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString))
      .toSeq.sortBy(_.mkString("\u0000"))
  }

  test("all 85 dialect-portable registry shapes run as spark.sql TEXT and match the DataFrame results") {
    registerViews()
    val results = candidates.map { q =>
      val sqlText = SparkEntry.oracleSql(q)
      val viaSql =
        try Right(norm(spark.sql(sqlText)))
        catch { case e: Throwable => Left(s"$q: ${e.getMessage.linesIterator.next()}") }
      q -> viaSql.map(s => s == norm(SparkEntry.queries(q)(spark, TestSpark.sf)))
    }
    val failedParse = results.collect { case (_, Left(m)) => m }
    val mismatched = results.collect { case (q, Right(false)) => q }
    val matched = results.collect { case (q, Right(true)) => q }
    assert(mismatched.isEmpty,
      s"SQL text and DataFrame results diverge for: $mismatched")
    assert(matched.size >= 80,
      s"need >=80 SQL-surface shapes green, got ${matched.size} " +
        s"(${matched.mkString(",")}); unparsed: $failedParse")
  }

  // --- the 27 strftime-dialect shapes, round 17 ------------------------
  //
  // The round-14 census left 27 §2 shapes whose oracle text parses on
  // DuckDB only because of MECHANICALLY-translatable dialect: strftime
  // with %-codes (→ date_format with Java patterns) and the `//`
  // integer-division operator (→ infix `div`; both truncate toward
  // zero on the non-negative operands these texts use, per the §6
  // integer-division parity note). The map below is that translation —
  // no semantic rewrites, so the committed DuckDB text stays the
  // single source of truth and the Spark surface is derived from it.

  private def sparkDialect(sql: String): String =
    sql
      .replace("strftime(", "date_format(")
      .replace("'%Y-%m-%d %H:00'", "'yyyy-MM-dd HH:00'")
      .replace("'%Y-%m-%d %H:00:00'", "'yyyy-MM-dd HH:00:00'")
      .replace("'%Y-%m-%d %H:%M:%S'", "'yyyy-MM-dd HH:mm:ss'")
      .replace("'%Y-%m-%d %H:%M'", "'yyyy-MM-dd HH:mm'")
      .replace("'%Y-%m-%d %H'", "'yyyy-MM-dd HH'")
      .replace("'%Y-%m-%d'", "'yyyy-MM-dd'")
      .replace("'%Y-%m'", "'yyyy-MM'")
      .replace(" // ", " div ")

  private val translatedCandidates = Seq(
    "etl_backfill_plan", "etl_clean_events", "etl_dedup_latest",
    "etl_double_orders", "etl_erasure_audit", "etl_partition_stats",
    "etl_scd2", "etl_scd2_asof", "etl_scd3", "etl_subject_access",
    "etl_watermark", "events_burst", "events_control_chart",
    "events_heavy_hitters", "events_retention", "events_sprt",
    "events_time_rollup", "events_user_growth", "events_window_agg",
    "q18_big_orders", "q3_join_agg", "q_backlog", "q_cohort_ltv",
    "q_count_distinct_multi", "q_mode", "q_range_join", "q_topk")

  test("the 27 strftime-dialect shapes run as spark.sql TEXT through " +
      "the mechanical dialect map and match the DataFrame results") {
    registerViews()
    val results = translatedCandidates.map { q =>
      val sqlText = sparkDialect(SparkEntry.oracleSql(q))
      val viaSql =
        try Right(norm(spark.sql(sqlText)))
        catch { case e: Throwable => Left(s"$q: ${e.getMessage.linesIterator.next()}") }
      q -> viaSql.map(s => s == norm(SparkEntry.queries(q)(spark, TestSpark.sf)))
    }
    val failedParse = results.collect { case (_, Left(m)) => m }
    val mismatched = results.collect { case (q, Right(false)) => q }
    assert(failedParse.isEmpty, s"translated texts must parse: $failedParse")
    assert(mismatched.isEmpty,
      s"translated SQL and DataFrame results diverge for: $mismatched")
  }
}
