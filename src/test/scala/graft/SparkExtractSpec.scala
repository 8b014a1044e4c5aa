package graft

import graft.gen.CorpusGen
import graft.model._
import graft.pipeline.{ExtractKernel, Skew}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** End-to-end Dataset pipeline tests (SURVEY.md §5.2-4): pages table →
  * skew repartition → extract kernel → results; output independent of
  * partitioning/parallelism; bad rows become failed rows, never job kills. */
class SparkExtractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val N = 150

  private def run(numParts: Int): Map[String, ExtractResult] = {
    implicit val s = spark
    import s.implicits._
    val pages = spark.createDataset(CorpusGen.pages(N))(implicitly)
      .repartition(numParts)
    val bucketed = Skew.repartitionBySizeBucket(pages)
    ExtractKernel.extract(bucketed, ConversionOptions())
      .collect().map(r => r.url -> r).toMap
  }

  test("pipeline completes; every row completed; content matches single-threaded kernel") {
    val results = run(7)
    assert(results.nonEmpty)
    assert(results.values.forall(_.status == TaskStatus.Completed),
      results.values.filter(_.status != TaskStatus.Completed).take(3).map(r => s"${r.url}: ${r.error}").mkString("; "))
    // spot-compare against the direct (no-Spark) kernel output
    for (i <- Seq(0L, 7L, 17L, 50L, 99L)) {
      val page = CorpusGen.pageFor(i)
      val direct = ExtractKernel.extractOne(page, ConversionOptions())
      assert(results(page.url).content == direct.content, s"row $i differs through Spark")
      assert(results(page.url).task_id == direct.task_id)
    }
  }

  test("output independent of partitioning (4 vs 13 partitions)") {
    val a = run(4)
    val b = run(13)
    assert(a.keySet == b.keySet)
    a.foreach { case (url, r) =>
      assert(r.content == b(url).content, s"$url differs across partitionings")
      assert(r.chunks.map(_.id) == b(url).chunks.map(_.id))
    }
  }

  test("user metadata passes through the envelope; system keys win on collision") {
    implicit val s = spark
    import s.implicits._
    val opts = ConversionOptions(userMetadata = Map("source" -> "crawl-7", "lang" -> "user-says-xx"))
    val ok = ExtractKernel.extractOne(CorpusGen.pageFor(0L), opts)
    assert(ok.status == TaskStatus.Completed)
    assert(ok.metadata("source") == "crawl-7") // user key preserved
    assert(ok.metadata("lang") != "user-says-xx") // system-derived key wins (tasks.py:116)
    // failed envelope carries the user metadata unmerged (tasks.py:152)
    val bad = Page("https://x.example/j.docx", new Timestamp(0), Array[Byte](80, 75, 3, 4, 9), "", "en")
    val failed = ExtractKernel.extract(spark.createDataset(Seq(bad))(implicitly), opts).collect()(0)
    assert(failed.status == TaskStatus.Failed)
    assert(failed.metadata == opts.userMetadata)
    // and the default stays byte-identical to before the feature existed
    assert(ExtractKernel.extractOne(CorpusGen.pageFor(0L), ConversionOptions()).metadata
      .get("source").isEmpty)
  }

  test("garbage payloads become failed rows without killing the job") {
    implicit val s = spark
    import s.implicits._
    val bad = Seq(
      Page("https://x.example/junk.docx", new Timestamp(0), Array[Byte](80, 75, 3, 4, 9, 9), "", "en"),
      Page("https://x.example/garbage", new Timestamp(0), Array.fill[Byte](64)(0x7f), "", "en"),
      Page("https://x.example/ok.html", new Timestamp(0),
        "<html><body><p>A real paragraph with enough words to keep here.</p></body></html>".getBytes("UTF-8"), "", "en"),
    )
    val out = ExtractKernel.extract(spark.createDataset(bad)(implicitly), ConversionOptions())
      .collect().map(r => r.url -> r).toMap
    assert(out("https://x.example/junk.docx").status == TaskStatus.Failed)
    assert(out("https://x.example/junk.docx").error.isDefined)
    assert(out("https://x.example/garbage").status == TaskStatus.Failed)
    assert(out("https://x.example/ok.html").status == TaskStatus.Completed)
    assert(out("https://x.example/ok.html").content.contains("real paragraph"))
  }

  test("latest-crawl dedup: duplicated urls resolve to max warc_ts row") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val pages = spark.createDataset(CorpusGen.pages(N))(implicitly)
    val w = Window.partitionBy(col("url")).orderBy(col("warc_ts").desc)
    val deduped = pages.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    val total = pages.count()
    val distinctUrls = pages.select("url").distinct().count()
    assert(total > distinctUrls, "corpus should contain duplicate urls")
    assert(deduped.count() == distinctUrls)
  }
}
