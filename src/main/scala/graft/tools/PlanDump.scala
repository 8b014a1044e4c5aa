package graft.tools

import graft.pipeline.GraftSession

/** Write PLANS.md: formatted physical plans of the headline queries — the
  * explain-and-iterate artifact (pushdown, pruning, broadcast, codegen
  * spans are also asserted in PlanSpec; this file is for reading).
  * sbt "runMain graft.tools.PlanDump [sfDir]" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8)
    val names = Seq(
      "q_filter_project", "q1_lineitem_agg", "q_join_stats", "q_asof_join",
      "q_range_join", "q_custdist",
      "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_emb_cosine",
      "q_dedup_cluster",
      "q_ann_brute_force", "q_ann_lsh", "q_ann_ivf",
      "q_decontaminate", "q_dedup_substring", "q_dedup_segments",
      "q_dedup_incr_bloom", "q_pack_sequences",
      "q_pagerank", "q_lm_score", "q_keyword_search",
      "q_semdedup", "q_hybrid_search", "q_nb_classify", "q_bpe_encode",
      "x_extract_summary")
    val sb = new StringBuilder
    sb.append("# PLANS — explain(formatted) of headline queries (")
      .append(dir).append(")\n\nRegenerate: `sbt \"runMain graft.tools.PlanDump\"`\n")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect() // finalize AQE
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANS.md"), sb.toString.getBytes("UTF-8"))
    println(s"PLANS.md written (${names.size} plans)")
    spark.stop()
  }
}
