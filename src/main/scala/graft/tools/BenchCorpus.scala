package graft.tools

import org.apache.spark.sql.SparkSession

/** The single materialization point for the benchmark pages corpus —
  * Bench's extraction headline and ScalingBench's two legs MUST read the
  * same bytes with the same file layout for their pages/sec numbers to be
  * directly comparable, so the dir template and write shape live here
  * only. Keyed by generator version: a CorpusGen change can never
  * silently reuse stale bytes. */
object BenchCorpus {

  def dirFor(nPages: Int): String =
    s"/tmp/graft-bench-corpus-v${graft.gen.CorpusGen.GenVersion}-$nPages"

  def exists(nPages: Int): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dirFor(nPages), "_SUCCESS"))

  /** Materializes (once per machine per generator version) and returns
    * the corpus dir for `nPages` pages: 128 files so any core count gets
    * fine-grained splits. Generation is not part of any measurement. */
  def ensure(spark: SparkSession, nPages: Int): String = {
    val corpusDir = dirFor(nPages)
    if (!exists(nPages)) {
      import spark.implicits._
      spark.range(0, nPages, 1, 128)
        .map(i => graft.gen.CorpusGen.pageFor(i))
        .write.mode("overwrite").parquet(corpusDir)
    }
    corpusDir
  }
}
