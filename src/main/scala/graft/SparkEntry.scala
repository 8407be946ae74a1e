package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle registries. Each module documents
  * which SURVEY §2 operators it covers.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's canonical extract is `SELECT Id, AccountId, ContactId,
    * Description FROM Case` over an FK model (client.rs:376, main.rs:89) —
    * transposed to testdata: orders⋈customer on the FK, filter, project,
    * order, limit.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val o = etl.Tables.load(spark, d, "orders")
    val c = etl.Tables.load(spark, d, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .filter(col("o_totalprice") > 1000.0)
      .select("o_orderkey", "o_custkey", "c_name", "o_orderstatus")
      .orderBy("o_orderkey")
      .limit(100)
  }

  private def modules: Seq[(Map[String, ops.Q], Map[String, String])] = Seq(
    (ops.Relational.queries, ops.Relational.oracles),
    (ops.Etl.queries, ops.Etl.oracles),
    (ops.Windows.queries, ops.Windows.oracles),
    (ops.Events.queries, ops.Events.oracles),
    (ops.Text.queries, ops.Text.oracles),
    (ops.Dedup.queries, ops.Dedup.oracles),
    (ops.Vectors.queries, ops.Vectors.oracles),
    (ops.Multimodal.queries, ops.Multimodal.oracles),
    (ops.Temporal.queries, ops.Temporal.oracles),
    (ops.Extras.queries, ops.Extras.oracles),
    (ops.SoqlFront.queries, ops.SoqlFront.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)

  /** Headline subset used by Bench (kept representative but bounded). */
  def benchQueries: Seq[String] = {
    val preferred = Seq(
      "a2_group", "j6_star", "j1_inner", "j3_children", "w3_running",
      "o3_topk", "a3_distinct", "t_quality", "d_minhash_pairs",
      "d_embed_pairs", "v_knn_brute", "v_ann_lsh", "e_session", "f_json",
      "s3_csv_roundtrip", "w1_rank", "e_tumble", "t_fingerprint",
      "j7_range", "x_percentile", "m_decode_features", "d_simhash",
      "d_ngram_jaccard", "d_clusters", "t_contam", "v_quant",
      "e_retention", "e_funnel", "v_ann_ivfq", "t_tfidf", "m_decode_real",
      "t_spandedup", "j_salted", "l_scd2", "d_embed_lsh", "m_audio_real",
      "j_bloom", "d_simhash_hamming", "l_sorted_scan", "v_ann_ivf4",
      "t_chunkpack", "j7_interval", "d_incremental", "l_zorder_scan",
      "e_rolling28", "l_bucket_join", "x_winsorize", "x_heavyhitters",
      "t_bm25", "l_rollup_merge", "t_lmscore",
      // round-11 headline training-pipeline ops
      "t_scrub", "d_semdedup", "d_minhash_idf",
      // round-12 headline maintenance ops
      "x_pctile_maintained", "l_scd2_late", "l_ivm_leftjoin",
      // round-12 second-wave headliners: graph, compressed ANN,
      // attribution
      "g_triangles", "v_pq", "e_attribution",
      // round-13 headliners: MIN/MAX IVM, sampled-training PQ,
      // gen-layout t-digest maintenance
      "l_ivm_minmax", "v_pq256", "x_tdigest_maintained",
      // round-14 headliners: single-commit two-level IVM, two-stage
      // IVF-PQ refine
      "l_ivm_joinagg", "v_ivfpq_rerank",
      // round-16 headliner: filtered + maintained + adaptive-nprobe ANN
      "v_ann_filtered_maintained",
      // round-16 second-wave headliners: KM survival, real-PCM VAD
      // segmentation, Matryoshka two-stage retrieval (g_sssp_incr was
      // measured 11.4 s — representative of the already-headlined
      // iterative-graph family, so it stays full-sweep-only to keep
      // the headline set bounded)
      "x_survival", "m_vad", "v_matryoshka",
      // round-17 headliners: the tokenizer apply side and the sampled
      // production k-means point; g_sssp_incr joins now that the 95/5
      // maintained-state refit makes it the incremental-win
      // demonstration row (5.0 s steady vs 5.8-6.3 from-scratch)
      "t_bpe_encode", "v_kmeans_sampled", "g_sssp_incr",
      // round-18 headliner: the SECOND maintenance tick (tick N+1
      // consuming tick N's committed state — the production loop);
      // t_bpe_encode16 stays full-sweep-only (the representative-
      // depth variant of an already-headlined row)
      "g_sssp_incr2")
    val have = queries.keySet
    val unknown = preferred.filterNot(have)
    // a typo here would silently drop a query from every bench artifact
    require(unknown.isEmpty, s"benchQueries not in registry: $unknown")
    preferred
  }
}
