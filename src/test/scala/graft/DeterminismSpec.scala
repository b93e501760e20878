package graft

/** Partition-invariance net: every oracle-checked query must produce
  * identical rows whatever the scan/shuffle layout — the property the
  * whole DuckDB-oracle gate rests on (the oracle is single-node;
  * Spark's answer must not depend on partial-aggregation order,
  * partition count, or scan splits). Runs a representative slice of
  * the pipeline queries at sf0.001 under deliberately tiny scan
  * partitions + a different shuffle width and compares canonicalized
  * row sets against the default layout. Catches the classic
  * regressions: raw double sums, first()/head-dependent picks,
  * rand()/monotonically_increasing_id leakage. */
class DeterminismSpec extends SparkTestBase {

  private val Dir = "/root/testdata/sf0.001"

  /** Queries spanning each operator family's accumulation pattern. */
  private val Names = Seq(
    "dedup_exact_hash",     // digest grouping
    "dedup_minhash_pairs",  // min-agg over permutations + banded join
    "dedup_clusters",       // iterative label propagation
    "text_tfidf",           // two-level agg + window top-k
    "text_vocab",           // pre-agg + heap top-k
    "sample_temperature",   // data-derived rates + hash gate
    "split_shuffle_order",  // per-shard window rank
    "emb_quantize",         // per-row fold over arrays
    "ann_pq_topk",          // trained codebooks + ADC window
    "agg_revenue_by_nation",// decimal-accumulated join aggregate
    "pack_sequences",       // distributed prefix sum
    "text_bpe_pairs",       // combinable pair count + heap top-k
    "sketch_kmv_distinct",  // distinct-bounded shuffle + k-minima heaps
    "agg_decile_profile",   // two-phase global rank over range partitions
    "graph_pagerank",       // iterative integer fixed-point recurrence
    "agg_corr_pricing",     // decimal moment sums + one IEEE expression
    "ts_gapfill",           // grid explode + LOCF window carry
    "profile_columns",      // melt + exact distinct per column
    "mm_dimensions",        // in-plan byte assembly + native SOF walk
    "agg_daily_anomaly",    // exact .5-fraction medians + float compares
    "sketch_kmv_groups",    // per-group k-minima over distinct hashes
    "agg_q21_blame",        // Catalyst-decorrelated EXISTS/NOT EXISTS
    "dedup_source_overlap", // digest-keyed self-join + pair counts
    "text_lm_score",        // fixed-point probability sums over a cached pre-agg
    "emb_centroid_outliers",// exact-integer group centroids + dist² window
    "ann_filtered_topk",    // scan-pushed predicate + broadcast-query top-k
    "ann_lsh_recall",       // composed approx-vs-exact semi-join eval
    "text_cooccurrence",    // shared-scan pair/unigram counts + double ratio
    "graph_common_neighbors",// wedge self-join + fixed-point RA discount
    "sample_mix_budget",    // census-window budgets + running admission sum
    "pipeline_curate_lm",   // LM gate composed with budget admission
    "er_entities",          // fuzzy edges -> components -> canonical agg
    "dedup_semantic",       // k-means cells + earliest-dominator min-agg
    "dedup_incremental_near",// split band tables + collision count
    "dedup_minhash_recall", // truth/candidate/hit count composition
    "join_bloom_filter",    // distributed bitset build + literal probe
    "graph_label_prop",     // unrolled sync label rounds + top-1 windows
    "dedup_prefix_pairs",   // global-frequency prefix rank + lossless join
    "pipeline_curate_semantic", // cross-modal gate composition + packing
    "text_winnow",          // per-doc sliding-window minima + distinct
    "agg_q8_market_share",  // 6-way join + conditional decimal sums
    "emb_gram",             // quantized integer second-moment aggregation
    "text_gopher_rules",    // rounded rational signals + boolean verdicts
    "dedup_weights",        // cluster closure + size join-back
    "layout_hilbert",       // native per-row integer walk (order 16)
    "mm_tiff_meta",         // offset-table byte walk under both endians
    "graph_kcore",          // iterative degree-threshold peel cascade
    "agg_q9_profit",        // decimal profit diff over a pruned dimension
    "agg_q19_disjunctive",  // OR-of-conjunctions cross-table predicate
    "asof_nearest_purchase",// two opposed window passes + delta pick
    "win_rolling_median",   // windowed exact median over integer counts
    "ann_lsh_multiprobe",   // exploded probe set + bucket equi-join
    "sketch_kmv_overlap",   // two k-minima heaps + union re-rank algebra
    "agg_q11_share",        // one-row broadcast total gating decimal groups
    "text_line_dedup",      // distinct-doc segment counts + conditional reassembly
    "warehouse_merge_upsert",// changelog anti-join + image union
    "warehouse_scd2",       // lag change-detect + lead interval-close windows
    "warehouse_incr_agg",   // partial agg states merged (algebraic property)
    "layout_compaction",    // per-group metadata window bin assignment
    "sketch_kmv_rollup",    // per-group minima merged to the global sketch
    "seq_window_funnel",    // iterated forward as-of chains + max depth
    "graph_jaccard_links",  // wedge counts + broadcast degree normalization
    "mm_phash_dupes",       // strided byte-gradient bits + hash dup window
    "graph_clustering_coeff",// per-center closed wedges + one IEEE division
    "emb_hard_negatives",   // cross-label broadcast top-k
    "text_bpe_train",       // histogram-domain iterated argmax + checkpointed word table
    "pipeline_tokenize_pack",// trained merges + vocab join + prefix-sum packing + md5 digests
    "ann_ivf_persist",      // versioned-artifact restore + cell-probe top-k
  )

  private def canonical(name: String): String = {
    val df = SparkEntry.queries(name)(spark, Dir)
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case a: Seq[_] => a.mkString("[", ",", "]")
        case v => v.toString
      }.mkString("|")).sorted.mkString("\n").hashCode.toString + ":" +
      df.count()
  }

  test("oracle queries are invariant to scan partitioning and shuffle width") {
    val conf = spark.conf
    val defaults = Names.map(n => n -> canonical(n)).toMap
    val oldMax = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    val oldShuffle = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "16384") // many tiny scan splits
      conf.set("spark.sql.shuffle.partitions", "13")
      spark.catalog.clearCache()
      for (n <- Names)
        assert(canonical(n) == defaults(n),
          s"$n changed its answer under a different partition layout")
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      conf.set("spark.sql.shuffle.partitions", oldShuffle)
      spark.catalog.clearCache()
    }
  }
}
