package graft

import graft.export.TextExporter
import graft.functions.GraftFunctions
import graft.gen.CorpusGen
import graft.model.{ConversionOptions, OutputFormat}
import graft.pipeline.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: byte-identity with the kernel functions,
  * SQL registration, and whole-stage-codegen participation. */
class ExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("markdown_strip expression == TextExporter.stripMarkdown, via Column API") {
    import spark.implicits._
    val mds = (0 until 32).map { i =>
      ExtractKernel.extractOne(CorpusGen.pageFor(i.toLong), ConversionOptions()).content
    }
    val df = mds.toDF("md")
      .select(GraftFunctions.markdown_strip(org.apache.spark.sql.functions.col("md")).as("txt"))
    val got = df.as[String].collect()
    val want = mds.map(TextExporter.stripMarkdown)
    assert(got.toSeq == want)
  }

  test("markdown_strip / magic_doc_type usable from spark.sql") {
    import spark.implicits._
    Seq(("# Hi\n**bold** [l](u)", 1)).toDF("md", "i").createOrReplaceTempView("mdv")
    val out = spark.sql("SELECT markdown_strip(md) AS t FROM mdv").as[String].head()
    assert(out == "Hi\nbold l")

    spark.createDataset(Seq(
      ("u1.bin", "%PDF-1.4 x".getBytes("UTF-8")),
      ("u2.html", "random".getBytes("UTF-8")),
    ))(implicitly).toDF("url", "bytes").createOrReplaceTempView("bv")
    val types = spark.sql("SELECT magic_doc_type(bytes, url) AS t FROM bv ORDER BY url")
      .as[String].collect().toSeq
    assert(types == Seq("pdf", "html"))
  }

  test("expressions run inside WholeStageCodegen (no fallback)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a Range source (not a LocalRelation, which the optimizer folds
    // eagerly) so the expression must run inside generated code
    val df = spark.range(4)
      .select(concat(lit("**x** y "), col("id").cast("string")).as("md"))
      .select(GraftFunctions.markdown_strip(col("md")).as("t"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, s"no codegen span in:\n${df.queryExecution.executedPlan}")
    // and execution under codegen-only mode still works
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try assert(df.as[String].collect().sorted.head == "x y 0")
    finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("null handling") {
    import spark.implicits._
    val df = Seq[String](null).toDF("md")
      .select(GraftFunctions.markdown_strip(org.apache.spark.sql.functions.col("md")).as("t"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("host_of: eval parity with LinkExtractor, NULL for host-less, codegen-only execution") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val urls = Seq(
      "https://User:pw@Host.Example:8443/x?q=1",
      "HTTP://a.b/x",
      "//cdn.example/lib.js",
      "/relative/only",
      "mailto:x@y.example",
      null,
    )
    // Range-joined source so codegen must execute the expression
    val df = spark.range(urls.size)
      .select(element_at(typedLit(urls), (col("id") + 1).cast("int")).as("u"))
      .select(GraftFunctions.host_of(col("u")).as("h"))
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val got =
      try df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    val want = urls.map(u => if (u == null) null else graft.html.LinkExtractor.hostOfOrNull(u))
    assert(got == want)
    assert(got(0) == "host.example" && got(3) == null && got(4) == null)
    // SQL registration
    val viaSql = spark.sql("SELECT host_of('https://Q.Example/p')").collect()(0).getString(0)
    assert(viaSql == "q.example")
  }

  test("cosine_q: scalar parity with TrainingDataQueries.cosineQ, codegen-only execution") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs: Seq[Seq[Float]] = Seq(
      Seq(1f, 0f, 0.5f, -0.25f),
      Seq(0.99f, 0.01f, 0.5f, -0.25f),
      Seq(-1f, 0f, 0f, 0f),
      Seq(0f, 0f, 0f, 0f), // zero norm -> 0.0 by definition
      Seq(0.3f, -0.7f, 0.2f, 0.9f),
    )
    val probe: Seq[Float] = Seq(1f, 0f, 0.5f, -0.25f)
    // Range-joined source so codegen must execute the expression
    val df = spark.range(vecs.size)
      .select(element_at(typedLit(vecs), (col("id") + 1).cast("int")).as("v"))
      .select(GraftFunctions.cosine_q(col("v"), typedLit(probe)).as("c"))
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val got =
      try df.collect().map(_.getDouble(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    val want = vecs.map(v => graft.queries.TrainingDataQueries.cosineQ(v, probe))
    assert(got == want, s"$got vs $want")
    assert(got(0) == 1.0 && got(3) == 0.0 && got(2) < 0.0)
    // expression stays inside a WholeStageCodegen span
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span in:\n${df.queryExecution.executedPlan}")
    // SQL registration
    val viaSql = spark.sql(
      "SELECT cosine_q(array(1.0f, 0.0f), array(1.0f, 0.0f))").collect()(0).getDouble(0)
    assert(viaSql == 1.0)
  }
}
