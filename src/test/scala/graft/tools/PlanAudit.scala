package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $name")
      println("  pushed_filters: " + "PushedFilters: \\[[^\\]]*\\]".r
        .findAllIn(formatted).take(3).mkString(" | "))
      println("  read_schema: " + "ReadSchema: [^\n]*".r
        .findFirstIn(formatted).getOrElse("-"))
      println("  exchanges: " + "Exchange [a-z]+".r.findAllIn(plan).length +
        "  broadcasts: " + plan.sliding("BroadcastHashJoin".length)
          .count(_ == "BroadcastHashJoin") +
        "  sortmerge: " + plan.sliding("SortMergeJoin".length)
          .count(_ == "SortMergeJoin") +
        "  cartesian: " + plan.contains("CartesianProduct") +
        "  wscg_spans: " + "WholeStageCodegen".r.findAllIn(plan).length)
    }
    Seq("q1_agg", "q6_revenue", "flatten_customer",
      "join_orders_customers", "join_nation_revenue", "window_top_orders",
      "similarity_topk", "similarity_lsh_topk", "similarity_ivf_topk",
      "dedup_exact_documents", "dedup_ngram_documents",
      "minhash_pairs_documents", "simhash_pairs_documents",
      "embedding_dedup_pairs", "json_union_ingest", "quarantine_orders",
      "multimodal_features", "enum_encode_orders",
      "line_stats_documents", "line_dedup_documents",
      "mixture_plan_documents", "mixture_sample_documents",
      "semantic_dedup_pairs",
      // r13 families
      "bm25_search_documents", "sql_bm25_documents",
      "rag_chunk_search_documents", "chunk_documents",
      "sql_chunk_documents", "bloom_join_orders",
      "bloom_antijoin_orders", "cms_estimate_documents",
      "video_dedup_pairs", "extract_text_documents",
      "lm_filter_sample_documents", "langid_documents").foreach(audit)
    spark.stop()
  }
}
