package graft.streaming

import graft.model.{ConversionOptions, Page}
import graft.pipeline.ExtractKernel
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface: continuous ingestion of newly-crawled
  * pages (file-stream of the pages table → extraction kernel → append
  * sink with checkpointing) and watermarked windowed aggregation over the
  * events stream. The batch LineageTable path stays primary (SURVEY.md §2.4
  * streaming note); this is the incremental-ingest variant — same kernel,
  * exactly-once via the streaming checkpoint + idempotent parquet sink.
  */
object StreamingExtract {

  val PageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType),
  ))

  /** pages-dir file stream → extraction → parquet append. Runs until no
    * more available data when `availableNow` (for tests/backfills); pass
    * false for a continuously-running micro-batch query. */
  def run(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      options: ConversionOptions = ConversionOptions(),
      availableNow: Boolean = true,
  ): StreamingQuery = {
    import spark.implicits._
    val pages: Dataset[Page] = spark.readStream
      .schema(PageSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)
      .as[Page]

    val results = ExtractKernel.extract(pages, options)(spark)
      .select(col("url"), col("task_id"), col("status"), col("document_type"),
        col("content"), col("page_count"), col("created_at"))

    val writer = results.writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Watermarked sliding-window stats over a streaming events source —
    * the continuous analog of qAggStats (O5). */
  def eventsWindowedCounts(events: DataFrame, watermark: String = "10 minutes",
                           window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
}
