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

  test("nfc_normalize: composes combining sequences, idempotent, codegen-safe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // all non-ASCII built from codepoints so this source file stays ASCII
    val combAcute = 0x0301.toChar.toString // combining acute
    val combRing = 0x030A.toChar.toString  // combining ring above
    val eAcute = 0x00E9.toChar.toString    // precomposed e-acute
    val aRing = 0x00E5.toChar.toString     // precomposed a-ring
    // e + U+0301 -> precomposed (5 codepoints -> 4); precomposed unchanged;
    // ASCII untouched; a + U+030A -> a-ring
    val df = spark.range(1).select(
      GraftFunctions.nfc_normalize(lit("cafe" + combAcute)).as("a"),
      GraftFunctions.nfc_normalize(lit("caf" + eAcute)).as("b"),
      GraftFunctions.nfc_normalize(lit("plain ascii")).as("c"),
      GraftFunctions.nfc_normalize(lit("a" + combRing)).as("d"),
      length(GraftFunctions.nfc_normalize(lit("cafe" + combAcute))).as("la"),
    )
    val r = df.collect().head
    assert(r.getString(0) == "caf" + eAcute)
    assert(r.getString(1) == "caf" + eAcute)
    assert(r.getString(2) == "plain ascii")
    assert(r.getString(3) == aRing)
    assert(r.getInt(4) == 4)
    // SQL registration (combining diaeresis composes)
    Seq(("na" + 0x0308.toChar + "ive", 1)).toDF("s", "i").createOrReplaceTempView("nfcv")
    assert(spark.sql("SELECT nfc_normalize(s) AS t FROM nfcv").as[String].head()
      == "n" + 0x00E4.toChar + "ive")
    // codegen-only execution (Range source so nothing constant-folds away)
    val dfc = spark.range(3)
      .select(concat(lit("e" + combAcute + " x"), col("id").cast("string")).as("s"))
      .select(GraftFunctions.nfc_normalize(col("s")).as("t"))
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try assert(dfc.as[String].collect().sorted.head == eAcute + " x0")
    finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
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
