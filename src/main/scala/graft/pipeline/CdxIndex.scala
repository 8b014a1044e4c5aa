package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDX capture index over REAL crawl containers — the production twin of
  * the synthesis-oracled `q_cdx_index` (same SURT keying, same
  * new/revisit/changed lag classification, so the query's DuckDB oracle
  * pins this builder's arithmetic too): one row per response capture,
  * keyed by SURT (reversed host labels + path — what makes the sorted
  * index range-scannable by domain suffix), with the payload-digest
  * revisit classification a deduplicating crawler emits.
  *
  * 100 TB shape: map-only projection (url/ts/md5-of-payload — the html
  * bytes never survive past the digest), ONE window partitioned by url
  * (partition size = captures per url, bounded by crawl count, never
  * corpus size), and the (surt, ts) range sort that IS the artifact. */
object CdxIndex {

  /** Index every response record under `warcDir`. */
  def fromWarc(spark: SparkSession, warcDir: String): DataFrame =
    fromCaptures(spark.read.format("warc").load(warcDir))

  /** Core over any `(url, warc_ts, html)` capture frame. */
  def fromCaptures(df: DataFrame): DataFrame = {
    val caps = df
      .select(col("url"), col("warc_ts"), md5(col("html")).as("digest"))
      .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/:]+)", 1))
      .withColumn("path",
        when(regexp_extract(col("url"), "^[a-z]+://[^/]*(/.*)$", 1) === "", "/")
          .otherwise(regexp_extract(col("url"), "^[a-z]+://[^/]*(/.*)$", 1)))
      .withColumn("surt",
        concat(concat_ws(",", reverse(split(col("host"), "\\."))),
          lit(")"), col("path")))
    val w = Window.partitionBy(col("url")).orderBy(col("warc_ts"))
    caps
      .withColumn("prev", lag(col("digest"), 1).over(w))
      .select(
        col("surt"), col("url"), col("warc_ts").as("ts"), col("digest"),
        when(col("prev").isNull, "new")
          .when(col("prev") === col("digest"), "revisit")
          .otherwise("changed").as("status"))
      .orderBy(col("surt"), col("ts"))
  }
}
