package graft

import org.apache.spark.sql.functions._

/** Scale-stress probe for the capped pair generators: replicates the
  * sf0.1 corpus `SPARK_GRAFT_SCALE_MULT`× with IDENTICAL text (the worst
  * case — every hot LSH band bucket and stop-shingle posting grows by
  * the full multiplier) and times the three operators whose uncapped
  * forms are quadratic in bucket occupancy. With the caps, work per
  * bucket is bounded, so runtime should grow ~linearly with the
  * multiplier; without them the degenerate bucket alone would emit
  * (0.8·n)²/2 pairs (≈ 800M rows at 10×).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // comma-separated case names to run (empty = all) — lets the 100×
    // passes target the iterative/sketch kernels without paying for the
    // full pair-generator suite each time
    val only = sys.env.getOrElse("SPARK_GRAFT_SCALE_CASES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    def enabled(tag: String): Boolean = only.isEmpty || only(tag)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.documents(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("vec_id") * mult + col("rep")).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    println(s"SCALE mult=$mult docs=${docs.count()} vectors=${emb.count()}")

    def time(tag: String)(f: => Long): Unit = if (enabled(tag)) {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SCALE $tag rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("lsh_candidate_pairs")(
      graft.ops.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4).count())
    time("ngram_jaccard_pairs")(
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1).count())
    time("nn_join")(
      graft.ops.Similarity.nnJoin(emb, "vec_id", "embedding",
        graft.ops.Similarity.autoPlanes(emb.count(), 64), 64, 256).count())
    // the fuzzy-dedup kernel: O(len²) DP per candidate pair — the band
    // cap must bound the pair count (and therefore total DP work) even
    // when every replica lands in the same buckets
    // Two-phase distributed rank (q_percent_rank's kernel, Round8): at
    // mult× the per-(priority, block) row_number windows stay bounded —
    // no single task ever sorts a full priority's orders. Output is one
    // row per order BY DESIGN (an operator that assigns a rank to every
    // row has output ∝ input); the probe pins that the COMPUTE scales
    // linearly, not that the output shrinks.
    time("percent_rank_2phase") {
      import org.apache.spark.sql.expressions.Window
      val o = graft.sources.Tables.orders(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("o_orderkey") * mult + col("rep")).as("o_orderkey"),
          col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("blk", expr("cents div 100000"))
        .localCheckpoint(true)
      val grp = o.groupBy(col("o_orderpriority"), col("blk"))
        .agg(count(lit(1)).as("bn")).localCheckpoint(true)
      val wB = Window.partitionBy(col("o_orderpriority")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = grp.withColumn("off",
        coalesce(sum(col("bn")).over(wB), lit(0L)))
        .select(col("o_orderpriority"), col("blk"), col("off"))
      val wIn = Window.partitionBy(col("o_orderpriority"), col("blk"))
        .orderBy(col("cents"), col("o_orderkey"))
      o.join(broadcast(offs), Seq("o_orderpriority", "blk"))
        .withColumn("rk", col("off") + row_number().over(wIn))
        .count()
    }
    // events_sliding_users' coverage explode under SPARSE hours: the
    // production query semi-joins the 24-way explode against the spine of
    // observed hours, which assumes nothing about density — cost is
    // 24 × |distinct (user, hour)| whether hours are adjacent or not.
    // Sparsify by spreading hour indices ×997 (every observed hour
    // isolated, so ~23/24 of cover rows miss the spine) and replicate
    // users mult×: runtime must stay ~linear in the explode size and
    // output collapses to one row per observed hour.
    time("sliding_users_sparse") {
      val uh = graft.sources.Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("user_id") * mult + col("rep")).as("user_id"),
          (expr("unix_micros(ts) div 3600000000") * 997).as("h"))
        .distinct()
        .localCheckpoint(true)
      val spine = uh.select(col("h").as("sh")).distinct()
      uh.select(col("user_id"),
          explode(sequence(col("h"), col("h") + 23)).as("sh"))
        .join(spine, Seq("sh"), "left_semi")
        .groupBy(col("sh"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .count()
    }
    // etl_pit_leakage's point-in-time feature join at mult× events with
    // SALTED users (user_id·mult+rep — the realistic growth shape: more
    // users, per-user activity constant): the user-keyed label×feature
    // join fans out per user only, so cost must stay ~linear in mult.
    // (Replicating events under IDENTICAL users would square per-user
    // fan-out — that is a data property, not a plan property: PIT joins
    // are user-keyed by definition.)
    time("pit_leakage_salted") {
      // the REGISTERED kernel (as-of merge form) at salted-user growth
      val ev = graft.sources.Tables.events(spark, dir)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("user_id") * mult + col("rep")).as("user_id"),
          (col("event_id") * mult + col("rep")).as("event_id"),
          col("ts"), col("event_type"), col("value"))
        .localCheckpoint(true)
      graft.queries.Round11h.pitLeakage(ev)
        .agg(sum(col("n_labels"))).collect().head.getLong(0)
    }
    // The whale case: ONE user with 10⁴ labels AND 10⁴ features on top
    // of the base corpus — 10⁸ pair rows under a naive user-keyed
    // label×feature join (one task owning hours at 100 TB). The as-of
    // merge form streams the whale's 2·10⁴ rows through one partition's
    // O(1)-state merge, so the case must stay SECONDS.
    time("pit_whale") {
      val base = graft.sources.Tables.events(spark, dir)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
      val whale = spark.range(20000).toDF("i").select(
        lit(-42L).as("user_id"),
        (col("i") + 10000000L).as("event_id"),
        timestamp_seconds(lit(1700000000L) + col("i") * 60).as("ts"),
        when(col("i") % 2 === 0, "click").otherwise("purchase")
          .as("event_type"),
        (col("i") % 97).cast("double").as("value"))
      graft.queries.Round11h.pitLeakage(base.unionByName(whale))
        .agg(sum(col("n_labels"))).collect().head.getLong(0)
    }
    // text_phrase_search's positional-postings adjacency join at mult×
    // docs: both term posting lists grow ∝ mult, but adjacency requires
    // doc_id equality, so the join fans out per document, never across
    // documents — row count and runtime must stay ~linear in mult even
    // with IDENTICAL replicated text (the hot-term worst case).
    time("phrase_search") {
      import graft.ops.{TextAnalysis => TA}
      val tp = docs.select(col("doc_id"),
        posexplode(TA.tokens(col("text"))).as(Seq("pos", "tok")))
      val a = tp.where(col("tok") === "fast")
        .select(col("doc_id"), col("pos").as("pa"))
      val b = tp.where(col("tok") === "merge")
        .select(col("doc_id").as("doc_b"), col("pos").as("pb"))
      a.join(b, col("doc_b") === col("doc_id") && col("pb") === col("pa") + 1)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        .count()
    }
    // SimHash Hamming pairs under the identical-text worst case: every
    // replica shares ALL FOUR 16-bit band keys, so every band bucket is
    // maximally hot and the bucket cap (200) is what stands between this
    // and (0.8·n)²·4 join rows. Work must stay ~linear in mult (cap² per
    // bucket × buckets), and the exact-popcount verify bounds emissions.
    time("simhash_hamming_pairs")(
      graft.ops.Dedup.simhashHammingPairs(docs, "doc_id", "text").count())
    // graph_pagerank's iteration kernel at mult× edges: each of the 3
    // iterations is one co-keyed join + one keyed rollup, so cost must
    // grow ~linearly with |E| (node count grows with mult, the 1-row
    // node-count broadcast and per-node state stay O(|V|) spread across
    // partitions — no step ever materializes the graph on one task).
    time("pagerank_3iter") {
      // the SHARED kernel (graft.ops.Graph.pagerank — the exact code
      // graph_pagerank registers), fed mult× replicated edges
      val li = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(concat(lit("s:"), ((col("l_suppkey") * mult) + col("rep")).cast("string")).as("a"),
          concat(lit("p:"), ((col("l_partkey") * mult) + col("rep")).cast("string")).as("b"))
        .distinct()
      graft.ops.Graph.pagerank(
        graft.ops.Graph.undirectedEdges(li, "a", "b"), 3).count()
    }
    // graph_pagerank_seeded's kernel at mult× edges with a FIXED-SIZE
    // seed set: the sparse rank frame only ever holds seeds + reached
    // nodes, so per-iteration exchange cost tracks the reached
    // frontier, not |V| — the property that makes personalized PR
    // usable when seeds ≪ graph. Kernel = the EXACT shared
    // Graph.personalizedPagerank the registered query runs.
    time("pagerank_seeded_3iter") {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(concat(lit("s:"), ((col("l_suppkey") * mult) + col("rep")).cast("string")).as("a"),
          concat(lit("p:"), ((col("l_partkey") * mult) + col("rep")).cast("string")).as("b"))
        .distinct()
      val seeds = graft.sources.Tables.supplier(spark, dir)
        .where(col("s_suppkey") % 10 === 0)
        .select(concat(lit("s:"), (col("s_suppkey") * mult).cast("string")).as("node"))
      graft.ops.Graph.personalizedPagerank(
        graft.ops.Graph.undirectedEdges(li, "a", "b"), seeds, 3).count()
    }
    // text_cooccur_lift's pair fan-out under replication: the vocabulary
    // cap (top-30 by df) bounds per-doc pairs at C(30,2) regardless of
    // corpus size, so total pair rows grow linearly with docs — the cap
    // is what stands between this and |vocab|² explosion.
    time("cooccur_pairs_capped") {
      // the SHARED kernel (graft.ops.Cooccur.cappedPairs — the exact
      // code text_cooccur_lift registers), fed mult× replicated docs
      val docTok = docs
        .select(col("doc_id"), explode(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct().localCheckpoint(true)
      graft.ops.Cooccur.cappedPairs(docTok, 30).count()
    }
    // q_cms_heavy's sketch build at mult× events: the sketch is 4×1024
    // cells NO MATTER the stream size (that is the point of CMS), so the
    // keyed rollup's map-side combine keeps shuffle rows bounded at
    // 4096 × partitions while scan cost grows linearly.
    time("cms_sketch_build") {
      // the SHARED kernel (graft.ops.Sketch.cmsSketch — the exact code
      // q_cms_heavy and cmsSketchStream run), fed mult× replicated keys
      val ev = graft.sources.Tables.events(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("user_id") * mult + col("rep")).as("user_id"))
      graft.ops.Sketch.cmsSketch(ev, "user_id", 4, 1024L).count()
    }
    // dedup_incremental's batch-vs-history path at mult×: every replica
    // carries the original text plus a per-replica salt token, so NO
    // batch doc is an exact dup and every one is a near-dup of ~mult
    // same-origin replicas — the worst case for the near path. The
    // bucket cap (50) plus the candidate-pruned trigram verify is what
    // keeps work ∝ candidates instead of ∝ corpus × bucket occupancy.
    // Kernel = graft.ops.IncrementalDedup.verdictsInline, the EXACT code
    // the registered query runs.
    time("dedup_incremental") {
      val salted = graft.sources.Tables.documents(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep").cast("string")).as("text"))
        .localCheckpoint(true)
      graft.ops.IncrementalDedup.verdictsInline(
        salted.where(pmod(col("doc_id"), lit(5)) < 4),
        salted.where(pmod(col("doc_id"), lit(5)) === 4),
        "doc_id", "text").count()
    }
    // Sorted-neighborhood dedup: candidates are O(n·w) BY CONSTRUCTION —
    // identical replicated text (all replicas share one fingerprint, so
    // they pack adjacently in sort order) is the LSH worst case that
    // needs bucket caps, but SNM's window bounds it for free. Kernel =
    // graft.ops.Dedup.snmPairs, the EXACT code the registered query runs.
    time("snm_pairs")(
      graft.ops.Dedup.snmPairs(docs, "doc_id", "text").count())
    // One-mode projection at mult× parts: via-side degrees stay constant
    // (pair fan-out per part is unchanged), so capped pair work grows
    // linearly with the edge list. Kernel = graft.ops.Graph.{cappedVia,
    // projectionPairs}, the EXACT code graph_common_neighbors runs.
    time("projection_pairs_capped") {
      val sp = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(col("sk"), (col("pk") * mult + col("rep")).as("pk"))
        .localCheckpoint(true)
      val spc = graft.ops.Graph.cappedVia(sp, "sk", "pk", 64)
      graft.ops.Graph.projectionPairs(spc, "sk", "pk").count()
    }
    // k-core peeling at mult× edges: each of the 3 rounds is one
    // node-sized rollup + two semi-joins against the kept-node set, so
    // cost must grow ~linearly with |E|; the re-checkpoint between
    // rounds keeps round r+1 from replaying round r's lineage. Kernel =
    // graft.ops.Graph.kcorePeel, the EXACT code graph_kcore_peel runs.
    time("kcore_peel_3round") {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(concat(lit("s:"), ((col("l_suppkey") * mult) + col("rep")).cast("string")).as("a"),
          concat(lit("p:"), ((col("l_partkey") * mult) + col("rep")).cast("string")).as("b"))
        .distinct()
      graft.ops.Graph.kcorePeel(li, 2, 3).count()
    }
    // k-truss peeling at mult× edges on the capped one-mode projection
    // (the raw bipartite frame is triangle-free, so the probe peels the
    // triangle-rich supplier co-part graph instead): the support join
    // is edge-keyed via the symmetrized adjacency — per-edge work ∝
    // deg(a)+deg(b), bounded by the projection cap — so cost must grow
    // ~linearly with |E|. Kernel = graft.ops.Graph.ktrussPeel, the
    // EXACT code graph_ktruss runs.
    // The raw supplier co-part projection is a near-complete clique
    // (every supplier shares a part with every other), whose support
    // join is Θ(n·deg²) for ANY engine — a degenerate input that
    // measures the clique, not the scaling. Thin it 17× with a
    // deterministic edge filter to near-dup-graph degrees (~59) so the
    // probe measures |E|-linearity at realistic degree.
    time("ktruss_peel_2round") {
      val sp = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(((col("l_suppkey") * mult) + col("rep")).as("sk"),
          ((col("l_partkey") * mult) + col("rep")).as("pk"))
        .distinct().localCheckpoint(true)
      val spc = graft.ops.Graph.cappedVia(sp, "sk", "pk", 64)
      val proj = graft.ops.Graph.projectionPairs(spc, "sk", "pk")
        .where(pmod(col("s1") * 31 + col("s2"), lit(17)) === 0)
        .select(col("s1").as("a"), col("s2").as("b"))
      graft.ops.Graph.ktrussPeel(proj, 3, 2).count()
    }
    // Local clustering coefficient at mult× edges on the capped
    // projection (same triangle-rich graph as the ktruss probe): the
    // triangle join is edge-keyed via the capped adjacency, so per-edge
    // work is deg-bounded and cost must grow ~linearly with |E|.
    // Kernel = graft.ops.Graph.localClustering, the EXACT code
    // graph_local_clustering runs.
    time("local_clustering") {
      val sp = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(((col("l_suppkey") * mult) + col("rep")).as("sk"),
          ((col("l_partkey") * mult) + col("rep")).as("pk"))
        .distinct().localCheckpoint(true)
      val spc = graft.ops.Graph.cappedVia(sp, "sk", "pk", 64)
      // same 17× deterministic thinning as the ktruss probe (the raw
      // projection is a degenerate near-clique)
      val proj = graft.ops.Graph.projectionPairs(spc, "sk", "pk")
        .where(pmod(col("s1") * 31 + col("s2"), lit(17)) === 0)
        .select(col("s1").as("a"), col("s2").as("b"))
      graft.ops.Graph.localClustering(proj).count()
    }
    // FS-linkage blocking at mult× docs under the worst case: every
    // replica keeps the original (lang, first-token) key, so every
    // block is maximally hot and the 32-cap is what stands between this
    // and C(m,2) per block — over-cap blocks DROP, so pair output must
    // stay bounded while scan cost grows linearly. Kernel =
    // graft.ops.Dedup.blockedPairs, the EXACT code dedup_linkage_fs runs.
    time("linkage_blocked_pairs") {
      val d = docs
        .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
        .select(col("doc_id"),
          element_at(col("toks"), 1).as("tok1"),
          substring(element_at(col("toks"), 1), 1, 1).as("lang"))
      graft.ops.Dedup.blockedPairs(d, Seq("lang", "tok1"), "doc_id", 32).count()
    }
    // Label propagation at mult× edges: per round one keyed join + one
    // (node, label) rollup + a per-node window over ≤ degree rows — no
    // step is ever node²; cost must grow ~linearly with |E|. Kernel =
    // graft.ops.Graph.lpaLabels, the EXACT code graph_lpa runs.
    time("lpa_3round") {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(concat(lit("s:"), ((col("l_suppkey") * mult) + col("rep")).cast("string")).as("a"),
          concat(lit("p:"), ((col("l_partkey") * mult) + col("rep")).cast("string")).as("b"))
        .distinct()
      graft.ops.Graph.lpaLabels(li, 3).count()
    }
    // Winnowing fingerprint selection at mult× docs: a pure per-row
    // array kernel (hash array projected first, w=4 window minima over
    // the attribute), so cost is O(total shingles) — must grow linearly
    // with the corpus, no shuffle before the rollup. Kernel =
    // graft.ops.TextAnalysis.winnowMinima, the EXACT code
    // text_winnowing runs.
    time("winnowing_fingerprints") {
      val TA = graft.ops.TextAnalysis
      docs.select(TA.tokens(col("text")).as("toks"))
        .select(TA.shinglesOf(col("toks"), 3).as("sh"))
        .where(size(col("sh")) >= 4)
        .select(transform(col("sh"), x => md5(x)).as("h"))
        .select(size(array_distinct(TA.winnowMinima(col("h"), 4))).as("nf"))
        .agg(sum(col("nf"))).count()
    }
    // HITS at mult× edges: each half-iteration is one keyed join +
    // rollup + a 1-row max broadcast, so cost must grow ~linearly with
    // |E|. Kernel = graft.ops.Graph.hits, the EXACT code graph_hits runs.
    time("hits_2iter") {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select(((col("l_suppkey") * mult) + col("rep")).as("sk"),
          ((col("l_partkey") * mult) + col("rep")).as("pk"))
        .distinct()
      graft.ops.Graph.hits(li, 2).count()
    }
    // Farthest-first at mult× vectors: each of the 3 selection rounds is
    // one scan of the quantized table vs the ≤4-row broadcast chosen set
    // plus a TakeOrdered(1) — cost must grow ~linearly with the table,
    // never pairwise. Kernel = graft.ops.Similarity.farthestFirst, the
    // EXACT code sim_farthest_first runs.
    time("farthest_first_4") {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("vec_id") * mult + col("rep")).as("vec_id"), col("embedding"))
      graft.ops.Similarity.farthestFirst(e, "vec_id", "embedding", 0L, 4).count()
    }
    // Storage-footprint diet (the round-15 localCheckpoint audit's
    // evidence line): the shared-quantized-frame + driver-side-codebook
    // pattern (sim_seed_quality's shape) must leave persisted storage
    // FLAT — the one shared frame and nothing else — at mult× vectors.
    // Before the diet this flow checkpointed per round and per audit,
    // so storage grew with every consumer; now `after == shared` bytes.
    time("seed_audit_storage") {
      def storageBytes: Long = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      val base = emb
        .select(col("vec_id"),
          graft.ops.Similarity.milliQuant(col("embedding")).as("mq"))
        .withColumn("nsq",
          graft.ops.Similarity.normSqMilli(col("mq")))
        .localCheckpoint(true) // the SimShared.miln analog, built once
      val shared = storageBytes
      val seeds = graft.ops.Similarity.farthestFirstSeeds(base, 0L, 4)
      val pick = array_min(array(seeds.map(c =>
        struct((col("nsq") + lit(c.cnsq) - lit(2L) *
          graft.ops.Similarity.dotMilli(col("mq"), typedLit(c.cmq))).as("d2"),
          lit(c.cid).as("cid"))): _*))
      val n = base.select(pick.getField("d2").as("mind2"))
        .agg(count(lit(1)), sum(col("mind2"))).count()
      val after = storageBytes
      println(s"SCALE seed_audit_storage_bytes shared=$shared after=$after " +
        s"flat=${shared == after}")
      n
    }
    time("edit_distance") {
      val t = docs.withColumn("len", length(col("text")).cast("long"))
      graft.ops.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4)
        .join(t.select(col("doc_id").as("a"), col("text").as("ta"),
          col("len").as("la")), "a")
        .join(t.select(col("doc_id").as("b"), col("text").as("tb"),
          col("len").as("lb")), "b")
        .where(col("la") <= 400 && col("lb") <= 400)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(levenshtein(col("ta"), col("tb")).as("d"))
        .agg(sum(col("d"))).count()
    }
    // q_band_join's bucket-expansion kernel at mult× events: replicas
    // are time-shifted a week apart so true co-occurrence (the output)
    // grows ~linearly with mult — the probe pins that the 3-replica
    // explode + bucket equi-join COMPUTE is |A|+|B|-linear, i.e. the
    // rewrite really did remove the |A|·|B| nested-loop term.
    time("band_join_bucketed") {
      val ev = graft.sources.Tables.events(spark, dir)
        .where(col("ts").isNotNull)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("event_id") * mult + col("rep")).as("event_id"),
          col("event_type"), col("user_id"),
          (col("ts").cast("long") + col("rep") * 604800L).as("es"))
        .localCheckpoint(true)
      val a = ev.where(col("event_type") === "error" && col("event_id") % 97 === 0)
        .select(col("event_id").as("a_id"), col("es").as("ea"))
        .withColumn("bk0", expr("ea div 600"))
      val b = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("es").as("eb"))
        .withColumn("bk", expr("eb div 600"))
      a.select(col("a_id"), col("ea"),
          explode(array(col("bk0") - 1, col("bk0"), col("bk0") + 1)).as("bk"))
        .join(b, Seq("bk"))
        .where(abs(col("eb") - col("ea")) <= 600).count()
    }
    // q_bloom_fpr_audit's build+probe at mult× keys: the m=4096 filter
    // SATURATES at high mult (fill → m, every probe a false positive) —
    // the probe pins that build and probe stay key-linear even then,
    // because both sides are distinct-then-hash-join against the ≤m-row
    // bit table, never key×key.
    time("bloom_build_probe") {
      def bits3(df: org.apache.spark.sql.DataFrame) = df.select(col("k"),
        explode(array((0 until 3).map(i =>
          graft.ops.Sketch.cmsBucket(col("k"), lit(i.toLong), 4096L)): _*))
          .as("bit"))
      val keys = graft.sources.Tables.orders(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("o_custkey") * mult + col("rep")).as("k")).distinct()
        .localCheckpoint(true)
      val bits = bits3(keys).select(col("bit")).distinct().localCheckpoint(true)
      val probes = graft.sources.Tables.customer(spark, dir)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("c_custkey") * mult + col("rep")).as("k"))
        .join(keys, Seq("k"), "left_anti")
      bits3(probes).distinct().join(bits, Seq("bit"), "left_anti")
        .select(col("k")).distinct().count()
    }
    // text_linear_score's hashed-feature apply at mult× docs: one token
    // explode + literal-array lookup + two map-side-combinable rollups —
    // token-linear by construction; the probe pins it.
    time("linear_score") {
      val wArr = "array(-180L, -120L, -60L, -20L, 0L, 10L, 25L, 40L, " +
        "60L, 85L, 110L, 140L, 170L, 200L, 240L, 280L)"
      docs.where(length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
        .select(col("doc_id"), element_at(expr(wArr),
          (pmod(graft.ops.Sketch.h3(col("tok")), lit(16L)) + 1).cast("int"))
          .as("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
        .select(expr("(sw + 200 * n) div n - 200").as("spt"))
        .groupBy(expr("(spt + 1000) div 100")).agg(count(lit(1))).count()
    }
    // Graph.coreNumbers at mult×: two extra bounded peels on top of the
    // kcore probe — each a node rollup + two semi-joins per round over
    // the checkpointed pair frame. Cost must track the pair count.
    time("core_numbers_3") {
      // scale the GRAPH (mult disjoint copies of the base pair index),
      // not the corpus: replicating identical texts only drives every
      // LSH bucket over its cap and empties the index — the graph
      // kernel's cost is |E|-bound, so |E|×mult is the honest probe
      val base = graft.ops.Dedup.pairIndex(
          graft.sources.Tables.documents(spark, dir), "doc_id", "text", 3, 0.5)
        .select(col("a"), col("b")).localCheckpoint(true)
      val pairs = base.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("a") * mult + col("rep")).as("a"),
          (col("b") * mult + col("rep")).as("b"))
      graft.ops.Graph.coreNumbers(pairs, 3, 3).count()
    }
    // Bitmap day-over-day retention at salted-user growth: every join is
    // user- or cell-keyed, the per-day cell frame is capped at 4096 rows
    // no matter the user volume — wall must stay scan-bound while the
    // exact-retention side grows with users.
    time("bitmap_retention") {
      val ev = graft.sources.Tables.events(spark, dir)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .crossJoin(spark.range(mult).toDF("rep"))
        .select((col("user_id") * mult + col("rep")).as("user_id"), col("ts"))
        .localCheckpoint(true)
      val du = ev
        .select(expr("CAST(ts AS LONG) div 86400").as("day"), col("user_id"))
        .distinct().localCheckpoint(true)
      val dc = du.select(col("day"),
          graft.ops.Sketch.bitmapCell(col("user_id"), 4096L).as("cell"))
        .distinct()
      val ret = du.select(col("day").as("da"), col("user_id"))
        .join(du.select((col("day") - 1).as("da"), col("user_id")),
          Seq("da", "user_id"))
        .groupBy(col("da")).agg(count(lit(1)).as("retained"))
      val cells = dc.select(col("day").as("da"), col("cell"))
        .join(dc.select((col("day") - 1).as("da"), col("cell")), Seq("da", "cell"))
        .groupBy(col("da")).agg(count(lit(1)).as("cells_inter"))
      ret.join(cells, Seq("da")).agg(sum(col("retained"))).collect()
        .head.getLong(0)
    }
    // Scale-adaptive IVF: cells = autoCells(n) ≈ √n, centroids trained
    // on a constant-per-cell hash sample, full corpus assigned against
    // the broadcast trained table. The probe prints the chosen cell
    // count and the mean/max per-cell occupancy: occupancy must grow as
    // ~√mult (the c + n/c balance point), NOT ∝ mult (what the fixed
    // 8-cell build degrades to), and wall time stays scan-bound.
    time("ivf_auto_build") {
      val stats = graft.ops.Similarity
        .ivfAutoStats(emb, "vec_id", "embedding")
        .agg(max(col("n_cells")).as("cells"), count(lit(1)).as("occupied"),
          avg(col("n")).as("mean_occ"), max(col("n")).as("max_occ"))
        .collect().head
      println(s"SCALE ivf_auto_detail cells=${stats.getAs[Long]("cells")} " +
        s"occupied=${stats.getAs[Long]("occupied")} " +
        f"mean_occ=${stats.getAs[Double]("mean_occ")}%.1f " +
        s"max_occ=${stats.getAs[Long]("max_occ")}")
      stats.getAs[Long]("occupied")
    }
    // Persisted IVF index: train+store once, then serve searches from
    // the ARTIFACT. Search cost = broadcast centroid rank + a
    // bucket-pruned read of nprobe cells' buckets (≈ nprobe·n/cells =
    // nprobe·√n rows under the autoCells rule) — per-query wall must
    // stay near-flat for 10× more vectors, never rescan the corpus.
    if (enabled("ivf_index_build") || enabled("ivf_index_search20") ||
        enabled("ivf_index_batch20") || enabled("ivf_append_churn") ||
        enabled("ivf_erase100")) {
      val idxPath = java.nio.file.Files
        .createTempDirectory("graft_scale_ivfidx").toString + "/idx"
      time("ivf_index_build") {
        val r = graft.ops.IvfIndex.build(spark, emb, "vec_id", "embedding",
          idxPath, numBuckets = 64)
        println(s"SCALE ivf_index_detail cells=${r.cells} " +
          s"vectors=${r.nVectors}")
        r.nVectors
      }
      val qvecs = emb.orderBy(col("vec_id")).limit(20)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1))
      time("ivf_index_search20") {
        qvecs.map { case (vid, v) =>
          graft.ops.IvfIndex.search(spark, idxPath, v, k = 10, nprobe = 2,
            numBuckets = 64, excludeId = Some(vid)).count()
        }.sum
      }
      // The SAME 20 queries as ONE batch against the STORED artifact:
      // all probe cells rank in one broadcast pass and the vectors table
      // is read ONCE (bucket-pruned to the probe-cell UNION) — the
      // amortization is the point; compare against ivf_index_search20's
      // 20 serial reads.
      time("ivf_index_batch20") {
        val qdf = emb.orderBy(col("vec_id")).limit(20)
          .select(col("vec_id").as("qid"), col("embedding"))
        graft.ops.IvfIndex.searchBatch(spark, idxPath, qdf, "qid",
          "embedding", k = 10, nprobe = 2, numBuckets = 64).count()
      }
      // Append-churn cadence: 8 small batches accrete ~1 file per
      // touched bucket each (the production ingest shape), Compaction
      // merges them back, and a search through the compacted store is
      // row-identical — the measured maintenance loop for the artifact.
      time("ivf_append_churn") {
        val (qv0, qvec0) = qvecs.head
        def top(): Seq[(Long, Long)] =
          graft.ops.IvfIndex.search(spark, idxPath, qvec0, k = 10,
              nprobe = 2, numBuckets = 64, excludeId = Some(qv0))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        (0 until 8).foreach { i =>
          val b = emb.where(pmod(col("vec_id"), lit(97L)) === i.toLong)
            .select((col("vec_id") + 100000000L * (i + 1)).as("vec_id"),
              col("embedding"))
          graft.ops.IvfIndex.append(spark, b, "vec_id", "embedding",
            idxPath, numBuckets = 64)
        }
        val preTop = top()
        val before = graft.sinks.Compaction
          .partitionStats(spark, s"$idxPath/vectors").map(_.nFiles.toLong).sum
        graft.sinks.Compaction.compact(spark, s"$idxPath/vectors",
          targetBytes = 64L * 1024 * 1024)
        val after = graft.sinks.Compaction
          .partitionStats(spark, s"$idxPath/vectors").map(_.nFiles.toLong).sum
        require(top() == preTop, "search must be identical after compaction")
        println(s"SCALE ivf_append_detail files_before=$before " +
          s"files_after=$after")
        before - after
      }
      // Subject erasure against the mult×-sized artifact: a FIXED
      // 100-subject batch. The locate pass is a column-pruned (vid,
      // cell) scan (grows with the store but reads two narrow columns);
      // the rewrite is bucket-pruned to the subjects' cells — erase
      // cost must track the SUBJECT BATCH, not the store.
      time("ivf_erase100") {
        import spark.implicits._
        val victims = (0L until 100L).toDF("vid")
        val removed = graft.ops.IvfIndex.delete(spark, idxPath, victims,
          "vid", numBuckets = 64)
        require(removed == 100L, s"all 100 subjects stored+erased: $removed")
        removed
      }
      if (enabled("ivf_erase100")) {
        import spark.implicits._
        val again = graft.ops.IvfIndex.delete(spark, idxPath,
          (0L until 100L).toDF("vid"), "vid", numBuckets = 64)
        require(again == 0L, s"re-erasure must remove nothing: $again")
      }
    }
    // PQ-coded persisted store: the codes tier replaces raw vectors as
    // the search-time memory side (ADC over subs small ints/vector).
    // The probe pins (a) the on-disk bytes ratio between pq_codes/ and
    // vectors/ — the 100 TB memory argument made measurable — and
    // (b) that ADC search cost stays bucket-pruned near-flat at mult×,
    // with the two-tier refine reading only the shortlist's raw rows.
    if (enabled("ivfpq_build") || enabled("ivfpq_adc20") ||
        enabled("ivfpq_batch20") || enabled("ivfpq_rerank20")) {
      val pqPath = java.nio.file.Files
        .createTempDirectory("graft_scale_ivfpq").toString + "/idx"
      time("ivfpq_build") {
        val t = graft.ops.Similarity.ivfAutoTrain(emb, "vec_id", "embedding")
        val r = graft.ops.IvfIndex.buildPq(spark, t, pqPath,
          codebook = 16, subs = 4, dim = 64, numBuckets = 64)
        def bytes(p: String): Long = {
          def walk(f: java.io.File): Long =
            if (f.isDirectory) f.listFiles.map(walk).sum else f.length
          walk(new java.io.File(p))
        }
        val raw = bytes(s"$pqPath/vectors")
        val codes = bytes(s"$pqPath/pq_codes")
        println(s"SCALE ivfpq_detail raw_bytes=$raw code_bytes=$codes " +
          f"ratio=${raw.toDouble / codes}%.1f")
        r.nVectors
      }
      val pqQvecs = emb.orderBy(col("vec_id")).limit(20)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1))
      time("ivfpq_adc20") {
        pqQvecs.map { case (vid, v) =>
          graft.ops.IvfIndex.searchPqAdc(spark, pqPath, v, k = 10,
            nprobe = 2, numBuckets = 64, excludeId = Some(vid)).count()
        }.sum
      }
      time("ivfpq_batch20") {
        val qdf = emb.orderBy(col("vec_id")).limit(20)
          .select(col("vec_id").as("qid"), col("embedding"))
        graft.ops.IvfIndex.searchPqBatch(spark, pqPath, qdf, "qid",
          "embedding", k = 10, nprobe = 2, numBuckets = 64).count()
      }
      // two-tier refine: ADC shortlists 100, exact cosine re-ranks to
      // top-10 from the raw buckets — the raw tier is touched for 100
      // rows per query, never the cell population
      time("ivfpq_rerank20") {
        pqQvecs.map { case (vid, v) =>
          graft.ops.IvfIndex.searchPqRerank(spark, pqPath, v, k = 10,
            nprobe = 2, shortlist = 100, numBuckets = 64,
            excludeId = Some(vid)).count()
        }.sum
      }
    }
    // The ANN-backed hard-negative miner (sim_hard_negatives's kernel,
    // Similarity.hardNegativesFrom): blocked by the scale-adaptive
    // cells, so the cross-label pair bound is Σ cell² = O(n·√n) — the
    // printed pair_bound must grow ≤ mult^1.5, never mult².
    time("hard_negatives") {
      val t = graft.ops.Similarity.ivfAutoTrain(emb, "vec_id", "embedding")
      val pb = t.assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("pb")).head.getLong(0)
      println(s"SCALE hard_negatives_detail cells=${t.cells} pair_bound=$pb")
      graft.ops.Similarity.hardNegativesFrom(t,
        emb.select(col("vec_id").as("vid"),
          pmod(col("vec_id"), lit(8L)).as("label"))).count()
    }
    spark.stop()
  }
}
