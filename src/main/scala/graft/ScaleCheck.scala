package graft

import java.io.File
import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.sqlgen.{Gen, SparkDialect, Wm}

/** Dev tool: scale-stress the engine on a FACTOR× replica of a testdata
  * directory (default 10× sf0.1 → 50k vectors / 50k docs) and time the
  * chain/ANN-heavy queries — the executable evidence behind SURVEY §4's
  * "would this hold at 10×?" claims. Replica vectors get a small
  * deterministic direction perturbation (pure scaling would put every
  * copy in the same LSH bucket — a degenerate corpus, not a bigger one);
  * replica docs get a suffix token.
  *
  * The LSH chain runs TWICE: once with the static bench plane count
  * (Wm.LshPlanes) and once with the N-derived count (Wm.lshPlanesFor) —
  * the gap is what the §4 sizing formula buys as the corpus grows.
  *
  * Usage: runMain graft.ScaleCheck [srcDir] [factor] [bigDir]
  */
object ScaleCheck {
  private def timeSec(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val dir = if (args.length > 2) args(2) else "/tmp/graft-sfbig"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // buildCorpus normalizes TIMESTAMP(US) events BEFORE
      // Tables.register pins the session zone, so pin it here too —
      // otherwise a non-UTC machine shifts every replica timestamp
      // by the zone offset relative to the registered view
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new File(s"$dir/_READY").exists()) buildCorpus(spark, src, factor, dir)

    Tables.register(spark, dir)
    val n = spark.table("embeddings").count()
    val nDocs = spark.table("documents").count()
    val scaledPlanes = Wm.lshPlanesFor(n)
    val scaledBands = Wm.simhashBandsFor(nDocs)
    val scaledL1J = Wm.l1HashesFor(n)
    println(s"[scale] corpus=$dir n_vectors=$n n_docs=$nDocs" +
      s" planes: static=${Wm.LshPlanes} scaled=$scaledPlanes" +
      s" simhash_bands: static=${Wm.SimhashBands} scaled=$scaledBands" +
      s" l1_hashes: static=2 scaled=$scaledL1J")

    // optional comma-separated op filter: the 30-100× decade runs only
    // re-measure the heaviest families instead of the full sweep
    val only: String => Boolean =
      sys.env.get("SPARK_GRAFT_SCALE_OPS")
        .map(_.split(",").map(_.trim).toSet)
        .map(s => (q: String) => s.contains(q))
        .getOrElse(_ => true)

    val genStatic = new Gen(SparkDialect)
    val genScaled = new Gen(SparkDialect, lshPlanes = scaledPlanes,
      l1Hashes = scaledL1J)
    // the N-derived SimHash band geometry (Wm.simhashBandsFor): same
    // pair semantics at the oracle floor, wider bands once the corpus
    // outgrows 5×12 — the gap is what the §4 band ladder buys
    val genBands = new Gen(SparkDialect, simhashBands = scaledBands)
    // chain-heavy queries (full inline chain — no WmCache views, so the
    // plane count under test is the one actually executed)
    val chainQs = Seq("wm_extract", "vec_topk_lsh", "dedup_embedding",
      "vec_topk_filtered_lsh", "graph_triangles", "vec_topk_graph",
      "graph_communities", "graph_kcore", "graph_beam_curve",
      "graph_assortativity", "wm_overwrite", "graph_hops_reach",
      "graph_clustering_coeff", "graph_hubness", "wm_repair",
      "wm_delta_curve", "wm_multi_tenant", "ann_recall_at_k_curve",
      "wm_extract_ids", "vec_graph_append", "ann_filter_strategy_curve",
      "graph_spectral", "graph_percolation_curve",
      "vec_topk_graph_filtered", "vec_bq_rotation",
      "ann_recall_after_delete", "vec_graph_compact",
      "vec_topk_ip_lsh", "vec_topk_l1_lsh",
      "ann_recall_eval_ip", "ann_recall_eval_l1"
      /* graph_betweenness + graph_closeness + graph_knn_degree_curve
       * run through the programmatic path (scratch edges) */)
    // plane-independent heavies: linear text/ANN paths (the banded
    // simhash pair join and the WAV decode pass scale with the corpus,
    // not the plane count)
    val flatQs = Seq("vec_topk_ivf", "vec_topk_pq", "vec_topk_ivf_pq",
      "text_chunk", "dedup_simhash_pairs", "sketch_distinct_by_source",
      "vec_topk_sq", "text_entropy", "sketch_bloom", "decontaminate_bloom",
      "sketch_cms", "sketch_quantiles", "events_anomaly",
      "events_rolling_dau", "dedup_semantic", "text_lm_score",
      "events_attribution", "dedup_substring", "data_mix_weights",
      "events_reconcile", "vec_topk_binary", "dedup_incremental",
      "pack_sequences", "events_ab_test", "q18_big_orders",
      "ann_nprobe_curve", "vec_append",
      "text_cooccur", "q2_min_cost_supp", "events_bot_detect",
      "events_forecast", "data_curriculum", "events_changepoint",
      "sketch_f2_ams", "events_autocorr", "events_survival",
      "vec_kmeans_step", "vec_pq_distortion", "text_keywords_llr",
      "q_pareto_share", "events_new_vs_returning",
      "events_segment_migration", "text_zipf_fit", "sketch_hll_curve",
      "data_shard_manifest", "dedup_winnow",
      "text_burrows_delta", "events_boot_ci", "q_spearman",
      "events_ab_cuped", "text_ks_length", "q_customer_deciles",
      "events_slo_burn", "q_order_reconcile", "events_attribution_curve",
      "events_metric_winsorize", "sample_balanced", "pca_variance_explained",
      "dedup_shingle_curve", "data_budget_curve", "q_cohort_revenue",
      "dedup_minhash", "dedup_paragraph",
      "decontaminate_ngram_curve", "text_lang_mix", "events_periodogram",
      "q12_shipmode", "q21_waiting_supplier", "q_gini_revenue",
      "events_ab_uplift_deciles", "search_maxsim", "wm_nn_decode",
      "search_maxsim_pruned")

    def run(gen: Gen, name: String): Double = {
      // the two HNSW-maintenance keys live as Option[links] methods now
      // (serving reads the shared scratch artifact); the inline form
      // measured here is the N-geometry leg under test
      val sqlText = name match {
        case "vec_graph_append"  => gen.graphAppendSql(None)
        case "vec_graph_compact" => gen.graphCompactSql(None)
        case other               => gen.sql(other)
      }
      val df = spark.sql(sqlText)
      df.count() // warm: codegen + broadcast
      timeSec { df.count(); () }
    }
    val results = new StringBuilder
    // the 100× decade runs skip the static leg: the 30× table already
    // shows the static geometry collapsing (507/431/753 s), and another
    // decade of a known-quadratic curve is hours of machine time for no
    // new information — the derived leg is the claim under test
    val legs =
      if (sys.env.contains("SPARK_GRAFT_SCALE_SKIP_STATIC")) Seq("scaled" -> genScaled)
      else Seq("static" -> genStatic, "scaled" -> genScaled)
    for (q <- chainQs.filter(only); (tag, g) <- legs) {
      val s = run(g, q)
      println(s"[scale] $q/$tag ${s}s")
      results.append(s"""  "$q/$tag": $s,\n""")
    }
    for (q <- flatQs.filter(only)) {
      val s = run(genStatic, q)
      println(s"[scale] $q ${s}s")
      results.append(s"""  "$q": $s,\n""")
    }
    if (scaledBands != Wm.SimhashBands && only("dedup_simhash_pairs")) {
      val s = run(genBands, "dedup_simhash_pairs")
      println(s"[scale] dedup_simhash_pairs/bands$scaledBands ${s}s")
      results.append(s"""  "dedup_simhash_pairs/bands$scaledBands": $s,\n""")
    }
    // programmatic paths (checkpointed build tables / cached chain
    // views): real codec decodes, unrolled components propagation,
    // the two-leg hybrid score table, the BPE vocabulary rounds, and
    // the served-index carrier re-assignment
    for (q <- Seq("multimodal_wav_stats", "multimodal_bmp_stats",
      "multimodal_png_stats", "dedup_components", "search_hybrid_rrf",
      "text_bpe_merges", "vec_ivf_reindex", "dedup_jaccard",
      "vec_topk_grouped", "graph_modularity", "events_attribution_markov",
      "multimodal_wav_features", "sketch_cms_native",
      "search_rerank_agreement", "dedup_tier_eval",
      "multimodal_audio_fp", "wm_recover_registry", "wm_repair",
      "dedup_quality_impact", "graph_betweenness", "graph_closeness",
      "events_markov_stationary", "vec_pca_residual",
      "multimodal_bmp_resize", "graph_knn_degree_curve",
      "vec_mds2d", "dedup_upsert", "vec_graph_compact",
      "vec_graph_append", "graph_lpa_curve", "sketch_quantiles",
      "sketch_quantile_curve", "wm_nn_decode_deep",
      "dedup_upsert_minhash", "vec_ivf_reindex_delete",
      "vec_topk_ivfpq_res", "vec_ivfpq_res_distortion",
      "search_hybrid_upsert", "ann_recall_eval_ivfpq_res",
      "events_value_quantiles", "events_rfm", "wm_audit_curve",
      "text_centroid_classify",
      // serving paths of the r12 artifact splits (their flatQs/chainQs
      // entries measure the INLINE oracle shape; these measure what
      // the bench actually executes — printed second when both match)
      "dedup_shingle_curve", "text_burrows_delta",
      "wm_multi_tenant").filter(only)) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).count() // warm
      val s = timeSec { fn(spark, dir).count(); () }
      println(s"[scale] $q ${s}s")
      results.append(s"""  "$q": $s,\n""")
    }
    println(s"""{"scale_check": {\n${results.toString.stripSuffix(",\n")}\n}, "n": $n, "factor": $factor}""")
    spark.stop()
  }

  /** FACTOR× replicas with deterministic perturbation, plus verbatim
    * copies of the small relational tables. */
  private def buildCorpus(spark: SparkSession, src: String, factor: Int,
                          dir: String): Unit = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nV = emb.count()
    emb.selectExpr(s"explode(sequence(0, ${factor - 1})) as rep", "*")
      .selectExpr(
        s"vec_id + rep * ${nV}L as vec_id",
        // ±0.05-ish per-dim nudge rotates each replica off the original's
        // hyperplane signs; deterministic (no rand()) so reruns agree
        "transform(embedding, (x, i) -> cast(x + 0.05d * sin(cast(vec_id * 131 + rep * 7919 + i * 17 as double)) as float)) as embedding",
        "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nD = docs.count()
    docs.selectExpr(s"explode(sequence(0, ${factor - 1})) as rep", "*")
      .selectExpr(s"doc_id + rep * ${nD}L as doc_id",
        "concat(text, ' rep', rep) as text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    // events: each replica shifted 30 days with its own user universe,
    // so hour count AND user count scale with the factor (the axes
    // events_anomaly / events_rolling_dau grow along). ts is normalized
    // to BIGINT nanos up front (the source file has shipped as both
    // TIMESTAMP(NANOS) and TIMESTAMP(US)) and written back as INT64,
    // which Tables.register passes through unchanged.
    val evs0 = spark.read.parquet(s"$src/events.parquet")
    val evs =
      if (evs0.schema("ts").dataType.isInstanceOf[org.apache.spark.sql.types.LongType]) evs0
      else evs0.withColumn("ts",
        org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp_ltz)) * 1000"))
    val nE = evs.count()
    evs.selectExpr(s"explode(sequence(0, ${factor - 1})) as rep", "*")
      .selectExpr(s"event_id + rep * ${nE}L as event_id",
        "ts + rep * 2592000000000000L as ts",
        "user_id + rep * 100000L as user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    // lineitem: replicas keep the price distribution with a sub-cent
    // nudge (new distinct values — sketch_quantiles' rank selection
    // sees a genuinely bigger value set)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val liCols = li.columns.map {
      case "l_orderkey" => s"l_orderkey + rep * 10000000L as l_orderkey"
      case "l_extendedprice" => "l_extendedprice + rep * 0.0001d as l_extendedprice"
      case c => c
    }
    li.selectExpr(s"explode(sequence(0, ${factor - 1})) as rep", "*")
      .selectExpr(liCols: _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    for (t <- Tables.names if !Set("embeddings", "documents", "events", "lineitem").contains(t))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    new File(s"$dir/_READY").createNewFile(): Unit
  }
}
