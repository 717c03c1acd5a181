package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** Round-11 batch 9: the seeding-quality audit (hash-sampled vs
  * farthest-first k-center seeds, judged by the assignment they induce)
  * and the point-in-time feature-leakage audit (the feature-store
  * correctness number: how many label rows a naive latest-value join
  * would contaminate with future data).
  */
object Round11h {

  val queries: Map[String, Q] = Map(

    // Seeding-quality audit: the two registered seeding strategies —
    // md5-hash sampling (the IVF convention) and farthest-first
    // k-center traversal — judged by the 4-cell assignment each
    // induces: total within-cell squared distance (SSE), the k-center
    // radius (max min-distance — what farthest-first 2-approximates),
    // and cell balance. Both 4-seed sets live on the DRIVER and are
    // compiled into the assignment scan as literal codewords
    // (array_min over 4 codegen'd (d2, cid) structs — ties → lowest
    // seed id), so each audit is a pure map pass over the shared
    // quantized corpus + a 4-group rollup: zero corpus shuffles, zero
    // per-query checkpoints — the structure that had this query at
    // 11× its anchor (per-round join/groupBy/checkpoint) is gone.
    "sim_seed_quality" -> ((s, dir) => {
      val base = SimShared.miln(s, dir)
      val hseeds = base
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(4)
        .select(col("vec_id"), col("mq"), col("nsq"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
      val ffseeds = Similarity.farthestFirstSeeds(base, 0L, 4)
        .map(c => (c.cid, c.cmq, c.cnsq))
      def audit(seeds: Seq[(Long, Seq[Long], Long)], tag: String) = {
        val pick = array_min(array(seeds.map { case (cid, cmq, cnsq) =>
          struct((col("nsq") + lit(cnsq) -
            lit(2L) * Similarity.dotMilli(col("mq"), typedLit(cmq))).as("d2"),
            lit(cid).as("cid"))
        }: _*))
        val a = base.select(pick.getField("d2").as("mind2"),
          pick.getField("cid").as("cell"))
        val cells = a.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
        a.agg(count(lit(1)).as("n_vecs"), sum(col("mind2")).as("sse"),
            max(col("mind2")).as("radius_d2"))
          .crossJoin(broadcast(cells.agg(min(col("cn")).as("min_cell_n"),
            max(col("cn")).as("max_cell_n"))))
          .select(lit(tag).as("method"), col("n_vecs"), col("sse"),
            col("radius_d2"), col("min_cell_n"), col("max_cell_n"))
      }
      audit(hseeds, "hash").unionByName(audit(ffseeds, "farthest_first"))
        .orderBy(col("method"))
    }),

    // Point-in-time feature-leakage audit — the feature-store
    // correctness number: for each label event (purchase), compare the
    // PIT-correct feature (latest click AT OR BEFORE the label) with
    // the naive latest-click join; a label is LEAKY when the naive pick
    // reads the future. Per label-day: labels, labels with any / with a
    // PIT-valid feature, leaky labels and the leak share — the audit
    // that says whether a training set built from a non-PIT join can be
    // trusted. Whale-proof by construction (see [[pitLeakage]]): the
    // deg_labels·deg_feats join is gone.
    "etl_pit_leakage" -> ((s, dir) =>
      pitLeakage(Tables.events(s, dir)
        .where(col("ts").isNotNull && col("user_id").isNotNull)))
  )

  /** The PIT leakage kernel, WHALE-GUARDED: the naive form joins every
    * label to every same-user feature (deg_l·deg_f pair rows — a single
    * 10⁴-activity user owns a 10⁸-row task at 100 TB). This form never
    * builds that product:
    *
    *  1. features compact to one row per (user, second) — a map-side-
    *     combinable rollup (same-ts duplicates keep the max value,
    *     exactly the old conditional-max tiebreak);
    *  2. the PIT pick rides the NATIVE as-of join
    *     (plans/AsOfJoinPlan): one sort per side, O(1)-state merge per
    *     partition — a whale's rows STREAM through the merge instead of
    *     cross-multiplying;
    *  3. the naive "latest" pick is a one-row-per-user rollup joined
    *     back 1:1.
    *
    * Per-user work is now O(activity log activity) (the sort), never
    * O(activity²); ScaleProbe's `pit_whale` case pins a 10⁴×10⁴ whale
    * at seconds. Output (and the DuckDB oracle) are unchanged — the
    * rewrite is exact. */
  def pitLeakage(ev: DataFrame): DataFrame = {
    val labels = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("label_id"),
        col("ts").cast("long").as("lt"))
    val featAgg = ev.where(col("event_type") === "click")
      .select(col("user_id").as("f_user"), col("ts").cast("long").as("ft"),
        round(col("value") * 100).cast("long").as("fv"))
      .groupBy(col("f_user"), col("ft")).agg(max(col("fv")).as("fv"))
    val latest = featAgg.groupBy(col("f_user").as("l_user"))
      .agg(max(struct(col("ft"), col("fv"))).as("latest"))
    graft.plans.AsOf.joinBackward(labels, featAgg,
        "user_id", "f_user", "lt", "ft")
      .join(latest, col("user_id") === col("l_user"), "left")
      .select(col("lt"),
        col("latest").isNotNull.cast("long").as("has_feat"),
        col("ft").isNotNull.cast("long").as("has_pit"),
        (col("latest").isNotNull &&
          col("latest.ft") > col("lt")).cast("long").as("leaky"))
      .groupBy(idiv(col("lt"), lit(86400L)).as("day"))
      .agg(count(lit(1)).as("n_labels"), sum(col("has_feat")).as("n_feat"),
        sum(col("has_pit")).as("n_pit"), sum(col("leaky")).as("n_leaky"))
      .withColumn("leak_bp",
        idiv(col("n_leaky") * 10000, col("n_labels")))
      .orderBy(col("day"))
  }

  val oracle: Map[String, String] = Map(

    "sim_seed_quality" -> {
      def d2(v: String, c: String) =
        s"$v.nsq + $c.cnsq - 2 * ${SimMm.dotmSql(s"$v.mq", s"$c.cmq")}"
      s"""WITH ${SimMm.milliNormCte},
         |ch1 AS (SELECT vec_id AS cid, mq AS cmq, nsq AS cnsq
         |        FROM miln WHERE vec_id = 0),
         |m2 AS (SELECT v.vec_id, CAST(min(${d2("v", "c")}) AS BIGINT) AS mind2
         |  FROM miln v CROSS JOIN ch1 c
         |  WHERE v.vec_id NOT IN (SELECT cid FROM ch1)
         |  GROUP BY v.vec_id),
         |s2 AS (SELECT vec_id FROM m2 ORDER BY mind2 DESC, vec_id LIMIT 1),
         |ch2 AS (SELECT * FROM ch1 UNION ALL
         |  SELECT miln.vec_id, mq, nsq FROM miln JOIN s2 USING (vec_id)),
         |m3 AS (SELECT v.vec_id, CAST(min(${d2("v", "c")}) AS BIGINT) AS mind2
         |  FROM miln v CROSS JOIN ch2 c
         |  WHERE v.vec_id NOT IN (SELECT cid FROM ch2)
         |  GROUP BY v.vec_id),
         |s3 AS (SELECT vec_id FROM m3 ORDER BY mind2 DESC, vec_id LIMIT 1),
         |ch3 AS (SELECT * FROM ch2 UNION ALL
         |  SELECT miln.vec_id, mq, nsq FROM miln JOIN s3 USING (vec_id)),
         |m4 AS (SELECT v.vec_id, CAST(min(${d2("v", "c")}) AS BIGINT) AS mind2
         |  FROM miln v CROSS JOIN ch3 c
         |  WHERE v.vec_id NOT IN (SELECT cid FROM ch3)
         |  GROUP BY v.vec_id),
         |s4 AS (SELECT vec_id FROM m4 ORDER BY mind2 DESC, vec_id LIMIT 1),
         |ff AS (SELECT * FROM ch3 UNION ALL
         |  SELECT miln.vec_id, mq, nsq FROM miln JOIN s4 USING (vec_id)),
         |hs AS (SELECT vec_id AS cid, mq AS cmq, nsq AS cnsq FROM miln
         |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4),
         |ah AS (SELECT v.vec_id, cid, CAST(${d2("v", "c")} AS BIGINT) AS dd,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${d2("v", "c")}, cid) AS rn
         |  FROM miln v CROSS JOIN hs c),
         |af AS (SELECT v.vec_id, cid, CAST(${d2("v", "c")} AS BIGINT) AS dd,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${d2("v", "c")}, cid) AS rn
         |  FROM miln v CROSS JOIN ff c),
         |sh AS (SELECT vec_id, cid AS cell, dd AS mind2 FROM ah WHERE rn = 1),
         |sf AS (SELECT vec_id, cid AS cell, dd AS mind2 FROM af WHERE rn = 1),
         |gh AS (SELECT count(*) AS n_vecs, CAST(sum(mind2) AS BIGINT) AS sse,
         |    CAST(max(mind2) AS BIGINT) AS radius_d2 FROM sh),
         |gf AS (SELECT count(*) AS n_vecs, CAST(sum(mind2) AS BIGINT) AS sse,
         |    CAST(max(mind2) AS BIGINT) AS radius_d2 FROM sf),
         |bh AS (SELECT min(cn) AS min_cell_n, max(cn) AS max_cell_n FROM (
         |  SELECT count(*) AS cn FROM sh GROUP BY cell) z),
         |bf AS (SELECT min(cn) AS min_cell_n, max(cn) AS max_cell_n FROM (
         |  SELECT count(*) AS cn FROM sf GROUP BY cell) z)
         |SELECT 'farthest_first' AS method, gf.n_vecs, gf.sse, gf.radius_d2,
         |  bf.min_cell_n, bf.max_cell_n FROM gf, bf
         |UNION ALL
         |SELECT 'hash', gh.n_vecs, gh.sse, gh.radius_d2,
         |  bh.min_cell_n, bh.max_cell_n FROM gh, bh
         |ORDER BY method""".stripMargin
    },

    "etl_pit_leakage" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST(round(value * 100) AS BIGINT) AS fv
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |lab AS (SELECT user_id, event_id AS label_id, es AS lt FROM ev
        |        WHERE event_type = 'purchase'),
        |ft AS (SELECT user_id, es AS ft, fv FROM ev
        |       WHERE event_type = 'click'),
        |j AS (
        |  SELECT l.label_id, l.lt,
        |    max(CASE WHEN f.ft <= l.lt THEN f.ft END) AS pit_ft,
        |    max(f.ft) AS latest_ft
        |  FROM lab l LEFT JOIN ft f ON f.user_id = l.user_id
        |  GROUP BY l.label_id, l.lt),
        |g AS (
        |  SELECT lt // 86400 AS day, count(*) AS n_labels,
        |    CAST(count(latest_ft) AS BIGINT) AS n_feat,
        |    CAST(count(pit_ft) AS BIGINT) AS n_pit,
        |    CAST(count(CASE WHEN latest_ft > lt THEN 1 END) AS BIGINT)
        |      AS n_leaky
        |  FROM j GROUP BY day)
        |SELECT day, n_labels, n_feat, n_pit, n_leaky,
        |  CAST(n_leaky * 10000 // n_labels AS BIGINT) AS leak_bp
        |FROM g ORDER BY day""".stripMargin
  )
}
