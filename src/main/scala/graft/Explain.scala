package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q1_pricing_summary","q3_shipping_priority","q6_revenue_forecast",
                  "q19_topk_orders","v1_cosine_topk","k7_search_chunks",
                  "k1_chunks","k9_triangles","d2_dedup_jaccard","d3_dedup_minhash",
                  "x2_asof_attrib","k10_sections","v7_knn_ivf_learned",
                  "d7_dedup_editdist","m2_decode_frames","t10_bm25",
                  "x6_clean_pipeline","x7_pack_sequences","x8_merge_upsert",
                  "v9_knn_pq","d8_dedup_hamming","d9_decontaminate",
                  "x9_range_join","x10_heavy_hitters","q30_lead_lag",
                  "k11_pagerank","x11_kmeans_exact","x12_incremental_agg",
                  "t12_mixture_target","d10_dedup_canonical",
                  "q21_percentiles","k12_kg_edges_capped",
                  "v8_knn_ivf_probe2","v11_knn_sq8",
                  "d11_decontaminate_fuzzy","v12_knn_ivfpq",
                  "t13_stratified_sample","x13_salted_count",
                  "x14_incremental_dedup","x15_heavy_hitters_grouped",
                  "t14_filter_funnel","x16_global_shuffle",
                  "t15_quality_score","v13_label_centroid",
                  "t16_boilerplate","t17_perplexity","d12_span_dedup",
                  "k13_clustering_coeff","v14_semdedup",
                  "v15_standardize","t18_vocab_coverage","q31_grouping_sets",
                  "v16_knn_truncated","t19_dsir_weights","t20_gopher_rules",
                  "x17_scd2_history","s4_funnel","x18_snapshot_diff",
                  "t21_profile","t22_ccnet_buckets","k14_label_prop",
                  "v17_recall_eval","q32_cume_dist","s5_retention",
                  "k15_components","k16_kcore","k17_node_similarity",
                  "t23_weighted_sample","k18_shortest_paths",
                  "x19_zorder_layout","v18_mmr_rerank",
                  "d13_containment","x20_compaction_plan")) {
      println(s"==== $q ====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
