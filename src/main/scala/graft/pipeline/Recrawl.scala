package graft.pipeline

import graft.model.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The recurring-crawl loop: diff a new crawl against the previous one at
  * content-digest granularity and (re-)extract ONLY the pages that are new
  * or changed, appending the results as a merge-on-read snapshot. Unchanged
  * urls keep their existing extraction (zero kernel work), re-crawled urls
  * resolve latest-wins at read time via
  * `LineageTable.readLatest(versionCol = "warc_ts")` (warc_ts is carried
  * from the input and monotone across crawls, unlike wall-clock
  * created_at). `gone` urls stay visible until a retention pass tombstones
  * them — a crawl missing a url is weak evidence the page died.
  *
  * This is [[graft.queries.CurationQueries.qSnapshotDiff]] wired into the
  * job layer: the oracle checks the classification, this module is the
  * production consumer.
  *
  * 100 TB shape: the diff shuffles only (url, 32-char digest) rows — page
  * payloads reduce to md5 inside the scan. The delta rejoin is a left-semi
  * join keyed by url: when the changed set is small (the common recrawl
  * case) AQE broadcasts it and payloads never shuffle at all; on a
  * url-bucketed pages table both joins are co-located and shuffle-free
  * even for a full-churn crawl.
  */
object Recrawl {

  /** Per-url crawl-over-crawl status: added / gone / changed / same.
    * Digest-only — neither side's payload crosses the join. */
  def diff(prev: Dataset[Page], next: Dataset[Page]): DataFrame = {
    val a = prev.select(col("url"), md5(col("html")).as("dig_prev"))
    val b = next.select(col("url"), md5(col("html")).as("dig_next"))
    a.join(b, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("dig_prev").isNull, lit("added"))
          .when(col("dig_next").isNull, lit("gone"))
          .when(col("dig_prev") =!= col("dig_next"), lit("changed"))
          .otherwise(lit("same")).as("status"))
  }

  /** Pages of `next` that need (re-)extraction: status added|changed. */
  def pagesNeedingExtraction(prev: Dataset[Page], next: Dataset[Page]): Dataset[Page] = {
    import next.sparkSession.implicits._
    val todo = diff(prev, next)
      .where(col("status").isin("added", "changed"))
      .select(col("url"))
    next.join(todo, Seq("url"), "left_semi").as[Page]
  }

  /** Diff, extract the delta, append as a merge-on-read snapshot. Returns
    * the job report (its wave/bucket counts cover only the delta). */
  def run(spark: SparkSession, prev: Dataset[Page], next: Dataset[Page],
          cfg: ExtractJob.Config): ExtractJob.Report =
    ExtractJob.run(spark, pagesNeedingExtraction(prev, next),
      cfg.copy(appendSnapshot = true))

  /** Retention for urls the new crawl no longer carries: tombstone their
    * extraction rows so `readVisible`/`readLatest` stop serving them,
    * while time-travel reads keep the history until compaction applies
    * the tombstones physically. Because task ids are the deterministic
    * name-UUID of the url ([[ExtractKernel.taskIdFor]]), retirement needs
    * NO data scan — the gone-url list maps straight to task ids, and the
    * digest diff that produces it never moved payloads either. Returns
    * the number of urls retired. Call with the diff of the LAST k crawls
    * if one missing crawl is considered too weak a death signal.
    *
    * Tombstones are a DRIVER-SIDE manifest, so this collects the gone-url
    * list — bounded by `maxRetire` (loud error beyond it, never a silent
    * truncation): tombstoning is the small-churn path. A crawl that drops
    * a large url fraction should instead rewrite via
    * `LineageTable.compact` filtered by an anti-join against the new
    * crawl's url set — a fully distributed physical delete. */
  def retireGone(table: graft.table.LineageTable,
                 prev: Dataset[Page], next: Dataset[Page],
                 maxRetire: Int = 100000): Long = {
    val gone = diff(prev, next).where(col("status") === "gone")
      .select(col("url")).limit(maxRetire + 1).collect().map(_.getString(0))
    require(gone.length <= maxRetire,
      s"more than $maxRetire gone urls — mass retirement must go through a " +
        "compaction rewrite (anti-join), not driver-side tombstones")
    // one lock + one manifest rewrite for the whole batch (per-url
    // deleteTask would re-serialize the tombstone list per id). A url
    // that later REAPPEARS is resurrected automatically: the recrawl's
    // append commit clears tombstones for re-extracted task ids
    // (ExtractJob resurrection pass).
    table.deleteTasks(gone.map(ExtractKernel.taskIdFor))
    gone.length.toLong
  }
}
