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

  /** Core over any `(url, warc_ts, html)` capture frame. Real-crawl url
    * edges handled: schemes are case-insensitive (WARC-Target-URI does
    * not forbid `HTTP://`), hosts lowercase into the key, and NON-DEFAULT
    * ports survive into the SURT (`com,example:8080)/x` — dropping them
    * would collapse distinct origins onto one key). Same-timestamp
    * captures of one url tie-break on digest so the classification is
    * deterministic for deterministic input. */
  def fromCaptures(df: DataFrame): DataFrame = {
    val scheme = "^[A-Za-z][A-Za-z0-9+.-]*://"
    val caps = df
      .select(col("url"), col("warc_ts"), md5(col("html")).as("digest"))
      .withColumn("sch", lower(regexp_extract(col("url"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      // authority minus userinfo (user:pw@ must neither leak into the key
      // nor masquerade as the host), lowercased
      .withColumn("hostport", lower(regexp_replace(
        regexp_extract(col("url"), s"$scheme([^/]+)", 1), "^[^@]*@", "")))
      // IPv6 literals keep their brackets intact; otherwise host = up to
      // the first colon
      .withColumn("host",
        when(col("hostport").startsWith("["),
          regexp_extract(col("hostport"), "^(\\[[^\\]]*\\])", 1))
          .otherwise(regexp_extract(col("hostport"), "^([^:]+)", 1)))
      .withColumn("port",
        when(col("hostport").startsWith("["),
          regexp_extract(col("hostport"), "\\](:\\d+)$", 1))
          .otherwise(regexp_extract(col("hostport"), "(:\\d+)$", 1)))
      // DEFAULT ports canonicalize away (http://h:80/ == http://h/);
      // non-default ports stay in the key — distinct origins
      .withColumn("port",
        when(col("sch") === "http" && col("port") === ":80", "")
          .when(col("sch") === "https" && col("port") === ":443", "")
          .otherwise(col("port")))
      .withColumn("path",
        when(regexp_extract(col("url"), s"$scheme[^/]*(/.*)$$", 1) === "", "/")
          .otherwise(regexp_extract(col("url"), s"$scheme[^/]*(/.*)$$", 1)))
      .withColumn("surt",
        concat(concat_ws(",", reverse(split(col("host"), "\\."))),
          col("port"), lit(")"), col("path")))
    // classification partitions by the CANONICAL key, not the raw url:
    // spelling variants of one resource (case, default port) are the same
    // capture chain — the oracle twin keys by uk, which IS the surt
    val w = Window.partitionBy(col("surt")).orderBy(col("warc_ts"), col("digest"))
    caps
      .withColumn("prev", lag(col("digest"), 1).over(w))
      .select(
        col("surt"), col("url"), col("warc_ts").as("ts"), col("digest"),
        when(col("prev").isNull, "new")
          .when(col("prev") === col("digest"), "revisit")
          .otherwise("changed").as("status"))
      // digest in the sort: same-ts captures emit in a deterministic
      // order, so two emissions of the artifact are byte-comparable
      .orderBy(col("surt"), col("ts"), col("digest"))
  }
}
