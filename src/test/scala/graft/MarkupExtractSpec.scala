package graft

import graft.functions.MarkupExtract
import org.apache.spark.sql.functions._

/** Real-world HTML shapes through the boilerplate extractor
  * ([[graft.functions.MarkupExtract]]) — nested block tags, entities,
  * script/style with attributes and multiline bodies, link-density
  * drops, malformed-markup degradation. The cross-engine arithmetic
  * is gated by q206; this spec pins the RULE on adversarial pages. */
class MarkupExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (Long, Long, String) =
    Seq(html).toDF("html")
      .select(
        size(MarkupExtract.blockStats($"html")).cast("long").as("nb"),
        size(MarkupExtract.keptBlocks($"html")).cast("long").as("nk"),
        MarkupExtract.extractText($"html").as("t"))
      .as[(Long, Long, String)].head()

  test("script and style bodies are stripped wholesale, attributes and all") {
    val (_, nk, t) = extract(
      """<html><head>
        |<script type="text/javascript" async>
        |  var threshold = 25; if (a < b) { render("<p>fake</p>"); }
        |</script>
        |<style media="screen">.nav { color: red } /* <div> in css */</style>
        |</head><body>
        |<p>Real prose content that is comfortably long enough to keep.</p>
        |</body></html>""".stripMargin)
    assert(nk == 1L)
    assert(t == "Real prose content that is comfortably long enough to keep.")
    assert(!t.contains("threshold") && !t.contains("color"))
  }

  test("nested blocks segment at every boundary; inline tags stay in their block") {
    val (nb, nk, t) = extract(
      "<div><p>Outer paragraph text with <b>bold</b> and <em>emphasis</em> kept inline.</p>" +
        "<div><p>Inner nested paragraph, also long enough to survive the floor.</p></div></div>")
    assert(nb == 2L && nk == 2L)
    assert(t ==
      "Outer paragraph text with bold and emphasis kept inline.\n" +
        "Inner nested paragraph, also long enough to survive the floor.")
  }

  test("entities decode once, in pinned order, with &amp; last") {
    val (_, _, t) = extract(
      "<p>Fish &amp; chips cost &quot;less&quot; than &lt;expected&gt;, isn&#39;t that nice&nbsp;here</p>")
    assert(t == "Fish & chips cost \"less\" than <expected>, isn't that nice here")
    // double-encoded &amp;lt; is one pass: the &amp; decodes, the lt survives
    val (_, _, t2) = extract(
      "<p>A double encoded &amp;lt;tag&amp;gt; stays literal text in this long block.</p>")
    assert(t2.contains("&lt;tag&gt;"))
  }

  test("link-dense blocks drop (menus/footers), prose with an inline link keeps") {
    val (_, nk, t) = extract(
      "<div><a href='/a'>First navigation entry</a> <a href='/b'>Second navigation entry</a> x</div>" +
        "<p>A sentence of genuine content that happens to cite <a href='/r'>one reference</a> inline.</p>")
    assert(nk == 1L)
    assert(t == "A sentence of genuine content that happens to cite one reference inline.")
  }

  test("short chrome fragments drop at the length floor") {
    val (nb, nk, _) = extract(
      "<h1>Title</h1><li>Home</li><li>About</li>" +
        "<p>Only this block carries enough characters to count as prose.</p>")
    assert(nb == 4L && nk == 1L)
  }

  test("multiline blocks collapse whitespace; br splits a block") {
    val (_, nk, t) = extract(
      "<p>line one of a paragraph spread\n   across   several\n\tphysical lines here<br>" +
        "and a second long enough line after the break element too ok</p>")
    assert(nk == 2L)
    assert(t ==
      "line one of a paragraph spread across several physical lines here\n" +
        "and a second long enough line after the break element too ok")
  }

  test("malformed markup degrades gracefully, never errors") {
    val (_, _, t) = extract(
      "<p>An unclosed paragraph with a stray <div and a dangling bracket > " +
        "still yields its readable text rather than failing the scan")
    assert(t.nonEmpty && t.contains("still yields its readable text"))
    val (nb0, nk0, t0) = extract("")
    assert(nb0 == 0L && nk0 == 0L && t0 == "")
  }
}
