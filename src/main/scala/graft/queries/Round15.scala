package graft.queries

import java.sql.SQLException

import org.apache.spark.sql.functions._
import graft.etl.{Normalize, Runner}
import graft.sources.{Jdbc, Tables}

/** Round-15 batch 1: the JDBC extract→clean→upsert round-trip run end to
  * end against an embedded database (the reference's source/target MySQL
  * pools), and the persisted run-history table (the durable twin of the
  * reference's run log).
  */
object Round15 {

  val queries: Map[String, Q] = Map(

    // The reference's WHOLE pipeline over real JDBC — changelog-driven
    // extract (EtlLogger.js:6-17), per-row cleaning (etlService.js:120-156
    // upper/trim), batched keyed upsert into the target pool
    // (etlService.js:36-53) — executed against an embedded Derby database
    // standing in for the MySQL pools, then read back partitioned. The
    // oracle recomputes the same pipeline in pure SQL over the parquet
    // source, so the gate checks the JDBC write/read path end to end:
    // what Derby returns must equal what the relational algebra says.
    // At scale the embedded URL swaps for the remote pool URL; every
    // Spark-side shape (pushdown extract semi-join, numPartitions-capped
    // batched upsert, range-partitioned read) is the cluster shape.
    "etl_jdbc_roundtrip" -> ((s, dir) => {
      val url = "jdbc:derby:memory:graftq;create=true"
      for (t <- Seq("CUST_SRC", "CUST_LOG", "CUST_TGT"))
        try Jdbc.execute(url, s"DROP TABLE $t")
        catch { case _: SQLException => () }
      Jdbc.execute(url,
        """CREATE TABLE CUST_SRC (C_CUSTKEY BIGINT NOT NULL,
          |  C_NAME VARCHAR(64), C_ACCTBAL DOUBLE,
          |  PRIMARY KEY (C_CUSTKEY))""".stripMargin)
      Jdbc.execute(url,
        """CREATE TABLE CUST_LOG (LOG_ID BIGINT NOT NULL,
          |  REF_KEY VARCHAR(32), TBL VARCHAR(32),
          |  PRIMARY KEY (LOG_ID))""".stripMargin)
      Jdbc.execute(url,
        """CREATE TABLE CUST_TGT (C_CUSTKEY BIGINT NOT NULL,
          |  C_NAME VARCHAR(64), C_ACCTBAL DOUBLE,
          |  PRIMARY KEY (C_CUSTKEY))""".stripMargin)
      // seed the "remote" source pool: a quarter of the customer table
      val src = Tables.customer(s, dir)
        .where(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      Jdbc.upsert(src, url, "CUST_SRC", Seq("c_custkey"))
      // the changelog marks every 20th key as changed for this entity
      val log = Tables.customer(s, dir)
        .where(col("c_custkey") % 20 === 0)
        .select(col("c_custkey").as("log_id"),
          col("c_custkey").cast("string").as("ref_key"),
          lit("customer").as("tbl"))
      Jdbc.upsert(log, url, "CUST_LOG", Seq("log_id"))
      // extract → clean → load, all through JDBC
      val cleaned = Jdbc.changelogExtract(s, url, "CUST_SRC", "C_CUSTKEY",
          "CUST_LOG", "REF_KEY", "TBL", "customer")
        .select(col("C_CUSTKEY"),
          Normalize.upperTrim(col("C_NAME")).as("C_NAME"), col("C_ACCTBAL"))
      Jdbc.upsert(cleaned, url, "CUST_TGT", Seq("C_CUSTKEY"))
      Jdbc.readPartitioned(s, url, "CUST_TGT", "C_CUSTKEY",
          0L, 1000000L, 4)
        .select(col("C_CUSTKEY").as("c_custkey"),
          col("C_NAME").as("name_clean"), col("C_ACCTBAL").as("acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // Persisted run history ≡ utils/logger.js + /api/logs: two pipeline
    // runs (the second ending in a failing stage — reference runs log
    // errors and keep the report, etlService.js:499-521) persisted
    // through the keyed parquet sink, run 1 re-persisted to prove the
    // upsert replaces instead of duplicating, then the STORED table read
    // back. Emits the deterministic report columns (run, stage, ok,
    // rows); attempts/duration/error text are runtime-dependent and stay
    // in the table for operators. The oracle recomputes each stage's row
    // count straight from the parquet sources.
    "etl_run_history" -> ((s, dir) => {
      // a fresh path that does NOT yet exist: tableExists must see the
      // first persist as the initial write, not an upsert into nothing
      val path = java.nio.file.Files
        .createTempDirectory("graft_runhist").toString + "/history"
      val r1 = Runner.run(s, Seq(
        Runner.Stage("clean_customer", sp => Tables.customer(sp, dir)),
        Runner.Stage("open_orders", sp =>
          Tables.orders(sp, dir).where(col("o_orderstatus") === "O"))),
        retries = 1)
      val r2 = Runner.run(s, Seq(
        Runner.Stage("high_value_events", sp =>
          Tables.events(sp, dir).where(col("value") > 50)),
        Runner.Stage("boom",
          _ => throw new IllegalStateException("injected failure"))),
        retries = 1)
      Runner.persistReport(s, path, 1L, r1)
      Runner.persistReport(s, path, 2L, r2)
      Runner.persistReport(s, path, 1L, r1) // idempotent re-persist
      Runner.runHistory(s, path)
        .select(col("run_id"), col("stage"), col("ok").cast("long").as("ok"),
          col("rows").as("n_rows"))
        .orderBy(col("run_id"), col("stage"))
    })
  )

  val oracle: Map[String, String] = Map(

    "etl_jdbc_roundtrip" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_clean,
        |  c_acctbal AS acctbal
        |FROM customer WHERE c_custkey % 20 = 0
        |ORDER BY c_custkey""".stripMargin,

    "etl_run_history" ->
      """SELECT CAST(1 AS BIGINT) AS run_id, 'clean_customer' AS stage,
        |  CAST(1 AS BIGINT) AS ok,
        |  (SELECT count(*) FROM customer) AS n_rows
        |UNION ALL
        |SELECT 1, 'open_orders', 1,
        |  (SELECT count(*) FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 2, 'high_value_events', 1,
        |  (SELECT count(*) FROM events WHERE value > 50)
        |UNION ALL
        |SELECT 2, 'boom', 0, 0
        |ORDER BY run_id, stage""".stripMargin
  )
}
