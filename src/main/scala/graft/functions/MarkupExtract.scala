package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup/boilerplate extraction — the missing FIRST stage of a
  * crawl-scale LLM corpus pipeline (HTML → clean training prose),
  * ahead of the quality/language gates (q16/q17/q34/q65). The rule is
  * the jusText/trafilatura-class heuristic family reduced to a
  * deterministic, engine-replayable core:
  *
  *   1. strip `<script>`/`<style>` elements wholesale (code and CSS
  *      are never prose);
  *   2. segment into BLOCKS at block-level tags (`p`, `div`,
  *      headings, list/table elements, `br`, …) — inline tags
  *      (`a`, `b`, `span`, …) stay inside their block;
  *   3. per block, compute the tag-stripped, entity-decoded,
  *      whitespace-collapsed text and its LINK text (the same
  *      cleaning applied to `<a>…</a>` contents only);
  *   4. KEEP a block iff its text is ≥ [[MinBlockChars]] chars (short
  *      fragments are navigation/chrome) AND link text is ≤ half the
  *      block text (link-dense blocks are menus/footers — the
  *      link-density rule, jusText's core discriminator);
  *   5. the document's extracted text is the kept blocks joined in
  *      order with a newline.
  *
  * Everything is a row-local Column expression (regexp_replace /
  * split / higher-order functions) — no UDF, no shuffle: the operator
  * runs at parquet-scan speed over 100 TB of raw HTML, and every step
  * is mirrored 1:1 in the q206 oracle's DuckDB SQL (RE2-safe
  * patterns: no lookarounds, no backreferences). Heuristic by design:
  * a recall-first boilerplate filter, not a DOM parser — malformed
  * markup degrades to keeping slightly more or less, never to an
  * error.
  */
object MarkupExtract {

  /** A block below this many cleaned chars is chrome, not prose. */
  val MinBlockChars = 25

  /** Block-boundary tags: opening, closing, or self-closing forms,
    * with or without attributes. Inline markup is deliberately NOT
    * here — it belongs to its block's text. */
  val BlockTagRe: String =
    "(?i)</?(?:html|head|body|title|h[1-6]|p|div|ul|ol|li|table|thead|tbody|tr|td|th|section|article|header|footer|nav|blockquote|pre|br|hr)(?:\\s[^>]*)?/?>"

  /** Anchor elements, dotall (multiline links) — group 1 is the link
    * text. `<a>` or `<a …>` only, so `<abbr>` never matches. */
  val AnchorRe: String = "(?is)<a(?:\\s[^>]*)?>(.*?)</a>"

  /** Drop script/style elements wholesale (two passes — RE2 has no
    * backreferences, so the oracle cannot replay a `</\1>` form). */
  def stripNoise(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")

  /** The five named HTML entities the corpus rule decodes, in a PINNED
    * order (`&amp;` strictly last, so `&amp;lt;` decodes to the
    * literal text "&lt;" — one decoding pass, standard behavior). */
  def decodeEntities(x: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(x) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** Tag-strip + entity-decode + whitespace-collapse + trim — the
    * block-text cleaner (step 3). */
  def cleanText(x: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(x, "<[^>]*>", " ")),
      "\\s+", " "))

  /** Per-block stats: array<struct<btext, llen>> over the document's
    * non-empty blocks, in order — `btext` the cleaned block text,
    * `llen` the cleaned length of its anchor text. */
  def blockStats(html: Column): Column =
    filter(
      transform(split(stripNoise(html), BlockTagRe), b =>
        struct(
          cleanText(b).as("btext"),
          // coalesce is pinned on BOTH engines: DuckDB's
          // regexp_extract_all yields NULL (not []) on a linkless
          // block, and a NULL llen would NULL the keep predicate
          coalesce(length(cleanText(array_join(
            regexp_extract_all(b, lit(AnchorRe), lit(1)), " "))), lit(0))
            .as("llen"))),
      s => s.getField("btext") =!= "")

  /** The keep rule (step 4) over a [[blockStats]] element. */
  private def keep(s: Column): Column =
    length(s.getField("btext")) >= MinBlockChars &&
      s.getField("llen") * 2 <= length(s.getField("btext"))

  /** Kept blocks only, order preserved. */
  def keptBlocks(html: Column): Column = filter(blockStats(html), keep _)

  /** The document's extracted main text (step 5). */
  def extractText(html: Column): Column =
    array_join(transform(keptBlocks(html), _.getField("btext")), "\n")
}
