package graft.pipeline

import graft.model.{ConversionOptions, OutputFormat, Page}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC → WET batch conversion — the canonical crawl text product
  * (Common Crawl publishes exactly this pairing: response-record WARC
  * segments plus `conversion`-record WET segments carrying the extracted
  * plain text). One job = `read.format("warc")` → extraction kernel →
  * `write.format("warc")`: both ends are the DataSource V2 source/sink,
  * so the job inherits their scale shapes verbatim — one gz member per
  * input partition (the crawl's own sharding is the parallelism), task
  * -temp + driver-rename commit on the output with job-unique segment
  * names (re-running an export never clobbers a previous one).
  *
  * WET payload semantics are the text export (T5, the reference's
  * transcribe.py text serializer) regardless of the caller's
  * `output_format` — WET is BY DEFINITION the plain-text product; the
  * option is overridden rather than require()d so callers can pass their
  * job-wide options object unchanged. Only `status = completed` rows
  * publish: an unparsable page has no text product (the error envelope
  * belongs in the lineage table, not the WET artifact). url + warc_ts
  * carry over unchanged, so a WET record joins back to its WARC capture
  * exactly (the sink formats WARC-Date from the Catalyst micros — sub
  * -millisecond exact).
  */
object WetExport {

  /** Convert every response record under `warcDir` into WET conversion
    * records under `wetDir`. Read the output back with
    * `spark.read.format("warc").option("all_records", "true")` —
    * conversion records are not pages, so the default (response-only)
    * read mode deliberately sees none of them. */
  def run(spark: SparkSession, warcDir: String, wetDir: String,
          options: ConversionOptions = ConversionOptions()): Unit = {
    val pages = graft.sources.WarcSource.asPages(
      spark.read.format("warc").load(warcDir))
    val results = ExtractKernel.extract(
      pages, options.copy(outputFormat = OutputFormat.Text))(spark)
    publish(results.toDF(), wetDir)
  }

  /** Re-publish WET segments from a COMMITTED lineage table — the
    * operational path when the extraction already ran ([[ExtractJob]] /
    * [[graft.streaming.StreamingExtract.runWarcToTable]]): no kernel
    * recompute, just latest-wins visible rows → conversion records. The
    * payload is the table's stored `content`, so the WET format
    * discipline belongs to the extraction job's config — run it with
    * `output_format = text` when the table feeds WET publication (this
    * method cannot re-derive text from a markdown-formatted table; it
    * faithfully publishes what was committed). */
  def fromTable(spark: SparkSession, table: graft.table.LineageTable,
                wetDir: String): Unit =
    publish(table.readLatest(spark, versionCol = "warc_ts"), wetDir)

  /** Publish one extracted frame as WET segments. `jobUid`, when given,
    * pins the sink's segment names (`part-NNNNN-<jobUid>.warc.gz`) so a
    * REPLAY of the same logical write replaces exactly its own segments —
    * the exactly-once hook [[graft.streaming.StreamingExtract
    * .runWarcToWet]] uses with uid = f(streamRunId, batchId). */
  private[graft] def publish(results: org.apache.spark.sql.DataFrame,
                             wetDir: String,
                             jobUid: Option[String] = None): Unit = {
    val w = results
      .where(col("status") === "completed")
      .select(col("url"), col("warc_ts"),
        lit("conversion").as("record_type"),
        lit("text/plain").as("content_type"),
        col("content").cast("binary").as("html"))
      .write.format("warc").mode("append")
    jobUid.fold(w)(u => w.option("job_uid", u)).save(wetDir)
  }
}
