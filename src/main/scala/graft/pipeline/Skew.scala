package graft.pipeline

import graft.model.Page
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Skew handling for giant HTML/PDF blobs (the reference's
  * prefetch-multiplier-1 analog, app/worker.py:40 + docs/CONFIGURATION.md:
  * 256-289, re-expressed as data partitioning):
  *
  * Extraction cost scales with payload size, and CC-style size
  * distributions are heavy-tailed — hash partitioning by url alone leaves
  * some partitions with multiple multi-MB documents while others hold only
  * small pages (stragglers). We repartition on (size_bucket, salt):
  * `width_bucket(log2(length(html)))` groups rows by cost class and the
  * salt spreads each class uniformly over partitions, so every partition
  * draws the same cost mixture. AQE stays on as backstop for residual skew.
  *
  * At 100 TB this is the difference between a 1000-executor stage bounded
  * by avg-cost × rows/1000 and one bounded by the worst single partition.
  */
object Skew {

  /** Repartition pages so each output partition gets a uniform mix of
    * payload-cost classes. numPartitions ≤ 0 → spark.sql.shuffle.partitions. */
  def repartitionBySizeBucket(pages: Dataset[Page], numPartitions: Int = 0)(
      implicit spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // cost class = log2 size bucket; salt = deterministic per-url spread
    val bucketed = pages
      .withColumn("_bucket", floor(log(2.0, greatest(length(col("html")), lit(1)))))
      .withColumn("_salt", pmod(xxhash64(col("url")), lit(n)))
      .repartition(n, col("_bucket"), col("_salt"))
      .drop("_bucket", "_salt")
    bucketed.as[Page]
  }
}
