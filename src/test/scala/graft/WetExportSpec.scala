package graft

import java.nio.file.Files

import graft.gen.{CorpusGen, WarcGen}
import graft.model.{ConversionOptions, OutputFormat}
import graft.pipeline.{ExtractKernel, WetExport}
import org.scalatest.funsuite.AnyFunSuite

/** WARC → WET end to end: the job must publish exactly the kernel's text
  * export for every completed page, as conversion records the response
  * -only default read mode never mistakes for pages. */
class WetExportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("warc -> wet: conversion records carry the exact text export") {
    val s = spark
    import s.implicits._
    val pages = CorpusGen.pages(60)
    val warcDir = Files.createTempDirectory("graft-wet-in-").toString
    WarcGen.writeFiles(warcDir, pages, perFile = 20, gzipped = true)
    val wetDir = Files.createTempDirectory("graft-wet-out-").toString

    WetExport.run(spark, warcDir, wetDir)

    // conversion records are not pages: the default read mode sees none
    assert(spark.read.format("warc").load(wetDir).count() == 0)

    val wet = spark.read.format("warc").option("all_records", "true")
      .load(wetDir).collect()
    assert(wet.forall(_.getString(2) == "conversion"), "non-conversion record")
    assert(wet.forall(_.getString(3) == "text/plain"), "wrong content type")
    val got = wet.map(r => (r.getString(0), r.getTimestamp(1).getTime,
      new String(r.getAs[Array[Byte]](4), "UTF-8"))).sorted.toSeq

    // oracle: the kernel's text export on the same pages, completed only
    // (the output_format the job must force regardless of caller options)
    val direct = ExtractKernel.extract(spark.createDataset(pages),
        ConversionOptions(outputFormat = OutputFormat.Text))(spark)
      .collect()
      .filter(_.status == "completed")
      .map(r => (r.url, r.warc_ts.getTime, r.content)).sorted.toSeq
    assert(got.nonEmpty && got == direct)
  }

  test("wet from table: committed extractions re-publish without recompute") {
    val s = spark
    import s.implicits._
    val pages = CorpusGen.pages(40)
    val root = Files.createTempDirectory("graft-wet-table-").toString
    val cfg = graft.pipeline.ExtractJob.Config(root, "wet-run", numBuckets = 8,
      options = ConversionOptions(outputFormat = OutputFormat.Text))
    graft.pipeline.ExtractJob.run(spark, spark.createDataset(pages), cfg)
    val table = new graft.table.LineageTable(root, 8)
    val wetDir = Files.createTempDirectory("graft-wet-table-out-").toString

    WetExport.fromTable(spark, table, wetDir)

    val got = spark.read.format("warc").option("all_records", "true")
      .load(wetDir).collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](4), "UTF-8")))
      .sorted.toSeq
    val want = table.readLatest(spark, versionCol = "warc_ts")
      .where(org.apache.spark.sql.functions.col("status") === "completed")
      .select("url", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }

  test("wet export appends: a re-export never clobbers prior segments") {
    val pages = CorpusGen.pages(30)
    val warcDir = Files.createTempDirectory("graft-wet-in2-").toString
    WarcGen.writeFiles(warcDir, pages, perFile = 10, gzipped = true)
    val wetDir = Files.createTempDirectory("graft-wet-out2-").toString

    WetExport.run(spark, warcDir, wetDir,
      // caller's markdown options must not leak into the WET payload
      ConversionOptions(outputFormat = OutputFormat.Markdown))
    val first = spark.read.format("warc").option("all_records", "true")
      .load(wetDir).count()
    WetExport.run(spark, warcDir, wetDir)
    val second = spark.read.format("warc").option("all_records", "true")
      .load(wetDir).count()
    assert(first > 0 && second == 2 * first, s"$first -> $second")
  }
}
