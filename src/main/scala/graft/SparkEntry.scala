package graft

import graft.queries.{CurationQueries, ExtractionQueries, GraphQueries, QualityQueries, RelationalQueries, TrainingDataQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families:
  *  - q_*  relational surface (SURVEY.md §2.4) with DuckDB oracles;
  *  - x_*  extraction pipeline over the synthetic pages corpus (byte-level
  *         correctness pinned by GoldenSpec; rows-only here);
  *  - training-data ops (dedup/ANN/text analysis) over documents/embeddings,
  *    oracled where SQL-expressible.
  */
object SparkEntry {

  /** Flagship: full extraction pipeline summary on the small corpus. */
  def entry(spark: SparkSession): DataFrame =
    ExtractionQueries.xExtractSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TrainingDataQueries.all ++ CurationQueries.all ++
      ExtractionQueries.all ++ GraphQueries.all ++ QualityQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TrainingDataQueries.oracles ++ CurationQueries.oracles ++
      ExtractionQueries.oracles ++ GraphQueries.oracles ++ QualityQueries.oracles
}
