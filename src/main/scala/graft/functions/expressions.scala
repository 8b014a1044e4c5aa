package graft.functions

import graft.export.TextExporter
import graft.pipeline.TypeDetector
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the SQL surface (SURVEY.md §4.2 item 3):
  * the two reference kernels useful outside the typed extraction pipeline.
  * Both generate a direct static call inside whole-stage codegen — no
  * interpreted fallback, no UDF wrapper — so they stay inside the fused
  * WholeStageCodegen span of the surrounding plan.
  */

/** `markdown_strip(str)` — the reference's markdown→text conversion
  * (app/transcribe.py:167-189), byte-identical with the kernel's T5 port. */
case class MarkdownStrip(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "markdown_strip"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextExporter.stripMarkdown(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.export.TextExporter.stripMarkdown($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): MarkdownStrip =
    copy(child = newChild)
}

/** `magic_doc_type(bytes, url)` — content-sniff + extension-fallback
  * document type detection (app/utils.py:76-93). */
case class MagicDocType(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "magic_doc_type"

  override def nullSafeEval(bytes: Any, url: Any): Any =
    UTF8String.fromString(
      TypeDetector.detect(bytes.asInstanceOf[Array[Byte]], url.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, u) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.pipeline.TypeDetector.detect($b, $u.toString()))")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MagicDocType =
    copy(left = newLeft, right = newRight)
}

/** `host_of(url)` — deterministic authority-host extraction (the link
  * family's resolution rule: absolute http(s)/protocol-relative urls
  * yield their lowercased host, userinfo/port stripped; everything else
  * is NULL). Unlike the two kernels above it can produce NULL from a
  * non-null input, so codegen uses nullSafeCodeGen with an explicit
  * isNull branch instead of defineCodeGen. */
case class HostOf(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "host_of"

  override def nullSafeEval(input: Any): Any = {
    val h = graft.html.LinkExtractor.hostOfOrNull(input.asInstanceOf[UTF8String].toString)
    if (h == null) null else UTF8String.fromString(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("host")
      s"""
         |String $h = graft.html.LinkExtractor.hostOfOrNull($c.toString());
         |if ($h == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($h);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HostOf =
    copy(child = newChild)
}

/** ArrayData-direct vector kernels for the expressions below: the Scala-UDF
  * route deserializes each array to a boxed Seq[Float] per row (two
  * allocations + 2·dim boxing per cosine); these read the columnar floats
  * in place. Quantization delegates to [[graft.queries.TrainingDataQueries.quantize]]
  * — ONE definition of the oracle-exact rounding. */
object VectorKernels {
  def cosineQ(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val qa = graft.queries.TrainingDataQueries.quantize(a.getFloat(i))
      val qb = graft.queries.TrainingDataQueries.quantize(b.getFloat(i))
      dot += qa * qb; na += qa * qa; nb += qb * qb
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
  }
}

/** `cosine_q(a, b)` — the quantized deterministic cosine
  * ([[graft.queries.TrainingDataQueries.cosineQ]] semantics, bit-identical
  * in DuckDB) as a NATIVE expression over two array<float> columns: inside
  * whole-stage codegen it compiles to one static call over the columnar
  * ArrayData — no UDF serde, no Seq boxing — which is the hot inner loop
  * of every ANN probe and dedup verification at corpus scale. */
case class CosineQ(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_q"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineQ(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosineQ($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineQ =
    copy(left = newLeft, right = newRight)
}

/** `nfc_normalize(str)` — Unicode NFC normalization (canonical
  * decomposition + composition), the text-canonicalization step every
  * web-corpus cleanup runs before hashing/dedup so that `e` +
  * U+0301 and precomposed `é` digest identically. Spark has no builtin
  * for this; DuckDB's `nfc_normalize` is the oracle twin (both sides
  * implement the same Unicode NFC algorithm — utf8proc there,
  * `java.text.Normalizer` here). Codegen'd static call, no fallback. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Session extension injecting the functions into the registry — sessions
  * built by GraftSession get `markdown_strip` / `magic_doc_type` /
  * `host_of` / `cosine_q` / `nfc_normalize` in both the SQL parser and
  * (via call_function) the Column API. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.SparkSessionExtensions
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("markdown_strip"),
      new ExpressionInfo(classOf[MarkdownStrip].getName, "markdown_strip"),
      (exprs: Seq[Expression]) => MarkdownStrip(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("magic_doc_type"),
      new ExpressionInfo(classOf[MagicDocType].getName, "magic_doc_type"),
      (exprs: Seq[Expression]) => MagicDocType(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("host_of"),
      new ExpressionInfo(classOf[HostOf].getName, "host_of"),
      (exprs: Seq[Expression]) => HostOf(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("cosine_q"),
      new ExpressionInfo(classOf[CosineQ].getName, "cosine_q"),
      (exprs: Seq[Expression]) => CosineQ(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}

/** Column surface (requires a session built with [[GraftExtensions]]). */
object GraftFunctions {
  import org.apache.spark.sql.functions.call_function

  def markdown_strip(c: Column): Column = call_function("markdown_strip", c)

  def magic_doc_type(bytes: Column, url: Column): Column =
    call_function("magic_doc_type", bytes, url)

  def host_of(url: Column): Column = call_function("host_of", url)

  def cosine_q(a: Column, b: Column): Column = call_function("cosine_q", a, b)

  def nfc_normalize(c: Column): Column = call_function("nfc_normalize", c)
}
