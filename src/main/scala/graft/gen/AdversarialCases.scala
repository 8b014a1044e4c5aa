package graft.gen

/** Handcrafted adversarial HTML payloads for golden pinning (SURVEY.md §9
  * lever 3): each stresses a parser/extractor path that the generated corpus
  * (realistic, well-formed-ish) exercises only lightly. Frozen alongside the
  * generated goldens — byte-stability on hostile input is the point; crash
  * safety alone is FuzzSpec's job.
  */
object AdversarialCases {

  val cases: Vector[(String, String)] = Vector(
    "misnesting" ->
      """<html><body>
        |<b><i><p>bold italic paragraph text here</b></i> trailing after close
        |<table><p>paragraph opened inside table element body rows</p>
        |<tr><td>cell one<td>cell two<tr><td>three<td>four</table>
        |<ul><li>alpha item text<li>beta item text<ol><li>nested ordered thing</ul>
        |<div><div><div><p>deep unclosed divs with a real paragraph of words
        |</body></html>""".stripMargin,

    "entity-dense" ->
      """<html><head><title>S&eacute;ances &amp; Caf&eacute;s</title></head><body>
        |<p>Latin: &Agrave; &ccedil;a &frac12; price &mdash; &laquo;quoted&raquo; &iexcl;hola! text words.</p>
        |<p>Greek &alpha;&beta;&gamma; sums &sum; &int; &radic; limits &le; x &ge; y and &ne; z here.</p>
        |<p>Numeric &#65;&#x42;&#X63; mixed &#8364;99 &#x1F600; emoji and bad refs &#0; &#xZZ; &unknown; stay.</p>
        |<p>Spacing a&nbsp;b&ensp;c&emsp;d&thinsp;e and control &shy;soft&shy;hyphen gone now ok.</p>
        |</body></html>""".stripMargin,

    "giant-table" -> {
      val sb = new StringBuilder("<html><body><h1>Matrix Report</h1><table><thead><tr>")
      (0 until 10).foreach(c => sb.append("<th>col").append(c).append("</th>"))
      sb.append("</tr></thead><tbody>")
      (0 until 100).foreach { r =>
        sb.append("<tr>")
        (0 until 10).foreach(c => sb.append("<td>v").append(r).append('_').append(c).append("</td>"))
        sb.append("</tr>")
      }
      sb.append("</tbody></table><p>after the big table three words more.</p></body></html>")
      sb.toString
    },

    "boilerplate-traps" ->
      """<html><body>
        |<div class="NAV-Header">link farm <a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></div>
        |<div role="NAVIGATION"><p>role-marked nav paragraph should vanish entirely now</p></div>
        |<article><nav><p>nav inside article vanishes</p></nav>
        |<p>The surviving article body paragraph has plenty of ordinary words to keep.</p>
        |<div id="sideBar-Widget"><p>sidebar widget text should vanish from output</p></div>
        |<div class="advertise-me"><p>advert marker matches the stem so this vanishes too</p></div>
        |</article>
        |<footer><p>footer text gone</p></footer>
        |</body></html>""".stripMargin,

    "script-soup" ->
      """<html><head>
        |<script>var html = "<p>fake paragraph</p>"; if (a < b && b > c) { emit("</div>"); }</script>
        |<style>p::before { content: "<li>not a list</li>"; }</style>
        |</head><body>
        |<!-- <p>commented out paragraph</p> --><p>real paragraph one with words enough.</p>
        |<![CDATA[ <table><tr><td>cdata junk</td></tr></table> ]]>
        |<script type="text/template"><div>template div skipped</div></script>
        |<p>real paragraph two also has words enough.</p>
        |<noscript><p>noscript content dropped</p></noscript>
        |</body></html>""".stripMargin,

    "attr-edge-cases" ->
      """<html><body>
        |<p class=unquoted id='single' hidden data-x = "spaced equals" CLASS="dup">attr soup paragraph with words.</p>
        |<a href = "/real path">spaced link text here</a> <a href="#frag">frag text</a> <a href="javascript:x()">js text</a>
        |<p>Anchors above fold into this paragraph of sufficient words to keep.</p>
        |<img src="/i.png" alt="ignored by default"><br/><hr/>
        |<p a"b=c <weird>>recovered paragraph tail with enough words kept.</p>
        |</body></html>""".stripMargin,

    "unicode-mix" ->
      """<html><head><title>多言語 テスト — עברית</title></head><body>
        |<h2>中文标题与内容</h2>
        |<p>日本語の段落です。スペースのない言語でも単語数の見積もりが動く必要があります。</p>
        |<p>עברית מימין לשמאל עם <b>הדגשה</b> באמצע המשפט וסוף ברור.</p>
        |<p>Emoji 🚀 and combining é accents mixed with ASCII words here.</p>
        |</body></html>""".stripMargin,

    "pre-and-code" ->
      """<html><body>
        |<p>Paragraph before the code block with several words.</p>
        |<pre>
        |def f(x):   # markdown-looking ** stars ** and | pipes |
        |    return [x](y) + `ticks`
        |</pre>
        |<p>Paragraph after the code block with several words.</p>
        |<pre>   </pre>
        |</body></html>""".stripMargin,

    "empty-and-whitespace" -> "   \n\t  \n",

    "headings-only" ->
      """<html><body><h1>Lone Title Words</h1><h2></h2><h3>   </h3>
        |<h2>Second Heading Words</h2></body></html>""".stripMargin,
  )
}
