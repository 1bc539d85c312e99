package graft

/** Whole-inventory plan guard: no declared query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin may appear only in the
  * queries that deliberately use a tiny-broadcast scoring scan or
  * scalar attachment (the documented set below). A refactor that
  * accidentally drops a join key or broadcast hint anywhere in the
  * inventory fails here, not in a 100 TB run.
  *
  * Queries whose CONSTRUCTION runs heavyweight model fits (k-means) or
  * driver-side sketch materialization are excluded — their plan shapes
  * are asserted in their own specs; this sweep covers the long tail
  * nobody asserts individually.
  */
class CartesianGuardSpec extends SparkSuite {

  // construction executes fits/collects — covered by dedicated specs
  private val heavyConstruction = Set(
    "q45_ann_ivf_kmeans", "q79b_semantic_dedup_kmeans", "q86_countmin",
    "q87_pq_ann", "q90_int8_ann", "q92_ivfpq_ann", "q95_ivf_int8_ann",
    "q96_ivfpq_residual", "q155_ivf_incremental", "q160_phash_neardup", "q172_bootstrap_ci", "q40_multimodal", "q63_dedup_clusters",
    "q63b_dedup_clusters_star", "q66_dedup_pipeline", "q72_heavy_hitters",
    "q75_compression_quality", "q77_quantile_sketch")

  // documented tiny-broadcast NLJ users: scalar attachments (corpus N,
  // avgdl, vocab size) or 1-row/query-set broadcast scoring scans
  private val allowedNlj = Set(
    "q11b_theta_join", "q25_cosine_pairs", "q29_ngram_jaccard",
    "q35_ann_topk", "q36_ann_lsh", "q37_embed_neardup", "q38_ann_ivf",
    "q42_stats", "q48_tfidf", "q51_scalar_subquery", "q58_corpus_census",
    "q64_decontaminate", "q65_curation_pipeline", "q76_ann_lsh_multiprobe",
    "q79_semantic_dedup", "q80_span_dedup", "q84_bm25", "q88_hybrid_rrf",
    "q91_lm_perplexity", "q97_temperature_mix",
    // q113: 1-row-query broadcast MaxSim scoring scan;
    // q118: benchmark-embedding broadcast scoring scan (brute baseline,
    // ANN family documented as the at-scale candidate generator);
    // q123: groups-sized scalar attachment (crossJoin(broadcast(ng)));
    // q124: anchor-set broadcast scoring scan with the label-exclusion
    // predicate (two-phase top-k)
    // q128 composes q123's allocator, inheriting the same scalar attachment
    // q132: 1-row (Nt, Nr) totals attachment (crossJoin(broadcast(tot)))
    // q133 composes q91's LM, inheriting its vocab-size scalar attachment
    // q139: scalar-row (n_nodes, n_edges, n_triangles) attachments
    "q113_maxsim_retrieval", "q118_embed_decontam", "q123_epoch_mix",
    "q124_hard_negatives", "q128_curation_v2", "q132_dsir_resample",
    "q133_perplexity_split", "q139_triangle_count",
    // q140 composes q91's LM + a total-tokens scalar attachment
    "q140_curriculum_phases",
    // q141: 1-row sketch + scalar exact-count attachments
    "q141_kmv_overlap",
    // q149: 1-row bigram-total scalar attachment
    "q149_pmi_collocations",
    // q156: 1-row distinct-bigram-type total attachment (crossJoin(broadcast(tt)))
    "q156_kneser_ney",
    // q161: 1-row vocabulary-size attachment (crossJoin(broadcast(v)))
    "q161_event_transitions",
    // q163: 1-row sample-size totals attachment (crossJoin(broadcast(tot)))
    "q163_ks_drift",
    // q173: 1-row total/extra-seat attachments (crossJoin(broadcast(...)))
    "q173_apportioned_panel",
    // q150 composes q132, inheriting its totals attachment
    "q150_curation_v3",
    // q180: 50-query broadcast brute-force ground-truth scan (q35's
    // documented eval-panel shape — the production retriever is the
    // LSH leg; brute force exists only to score it)
    "q180_ranking_metrics",
    // q181: 1-row (ece, brier) release-totals attachment
    // (crossJoin(broadcast(tt)))
    "q181_calibration",
    // q183: 1-row Fleiss-kappa totals attachment (crossJoin(broadcast(tot)))
    "q183_label_model",
    // q184: broadcast centroid scoring scan (the ivfTopK/q79 contract)
    // + 1-row overall-silhouette attachment
    "q184_silhouette",
    // q188: 1-row corpus-token-total attachment (crossJoin(broadcast(n)))
    "q188_domain_kl",
    // q192: 1-row min/max scalar attach + the isotonic minimax's
    // bounded triangle joins over the <=64-row bin relation (broadcast
    // non-equi by construction — see Calibration.isotonicFit)
    "q192_isotonic_calibration")

  test("no declared query plans a CartesianProduct; NLJ only where documented") {
    val sf = sfDir
    val offenders = collection.mutable.ListBuffer.empty[String]
    for (q <- SparkEntry.registry if !heavyConstruction(q.name)) {
      val plan =
        try q.fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !allowedNlj(q.name))
        offenders += s"${q.name}: undocumented BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
