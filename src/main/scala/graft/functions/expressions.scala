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

/** Session extension injecting the functions into the registry — sessions
  * built by GraftSession get `markdown_strip` / `magic_doc_type` /
  * `host_of` in both the SQL parser and (via call_function) the Column
  * API. */
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
  }
}

/** Column surface (requires a session built with [[GraftExtensions]]). */
object GraftFunctions {
  import org.apache.spark.sql.functions.call_function

  def markdown_strip(c: Column): Column = call_function("markdown_strip", c)

  def magic_doc_type(bytes: Column, url: Column): Column =
    call_function("magic_doc_type", bytes, url)

  def host_of(url: Column): Column = call_function("host_of", url)
}
