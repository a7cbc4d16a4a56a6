package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue
import graft.ops.TextOps

/** P12 — HTML extraction as pure column expressions (SURVEY.md §2.3).
  *
  * The environment ships no HTML parser library, and the reference's DOM
  * usage is a small fixed set of patterns (label-cell table rows, first
  * anchor/img, attribute reads — /root/reference/src/extract.py:57-97,
  * 185-227, 292-341), so extraction is regex-based and fully columnar: the
  * whole page pipeline stays inside Catalyst, shuffles nothing, and
  * parallelizes per page. A general-purpose engine would swap these for a
  * jsoup-backed UDF set without touching any caller (same Column → Column
  * contract).
  */
object HtmlOps {

  /** Remove HTML comments — a DOM parser never sees commented-out markup,
    * but the anchor regexes would (r2 verdict hardening item). An
    * UNTERMINATED `<!--` comments out the rest of the document in
    * html.parser, so the second pass drops everything after one.
    */
  def stripComments(h: Column): Column =
    regexp_replace(
      regexp_replace(h, "(?s)<!--.*?-->", ""),
      "(?s)<!--.*$", "")

  /** DOM-grade table rows: every `<tr>` (any depth, document order) with
    * its descendant `<td>` bodies balanced across nested tables and the
    * first cell's opening tag — the native tokenizer expression
    * [[graft.expr.HtmlTableRows]] (see its doc for the BeautifulSoup
    * parity points).
    */
  def tableRows(html: Column): Column =
    ExprGlue.column(graft.expr.HtmlTableRows(ExprGlue.expression(html)))

  /** An attribute value from an opening tag ("" when absent). Quoted
    * values keep embedded spaces (`title="a b"` → `a b`); unquoted values
    * run to the next delimiter.
    */
  def attr(tag: Column, name: String): Column = {
    val pre = "(?i)" + name + "\\s*=\\s*"
    coalesce(
      TextOps.nullIfEmpty(regexp_extract(tag, pre + "\"([^\"]*)\"", 1)),
      TextOps.nullIfEmpty(regexp_extract(tag, pre + "'([^']*)'", 1)),
      regexp_extract(tag, pre + "([^\"'\\s>]+)", 1))
  }

  /** Remove all tags. */
  def stripTags(h: Column): Column =
    regexp_replace(h, "(?s)<[^>]*>", "")

  /** Minimal entity decode (the set the reference pages use; `&nbsp;`
    * becomes U+00A0 exactly as BeautifulSoup yields it — extract.py:257
    * then converts it to a plain space).
    */
  def unescape(h: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(h, "&nbsp;", "\u00a0"),
            "&lt;", "<"),
          "&gt;", ">"),
        "&quot;", "\""),
      "&amp;", "&")

  /** Reference `get_text(strip=True)` (extract.py:100-107): every text
    * node is stripped and empties drop, so the `<br>`-inserted newlines
    * VANISH — the result is the cell's text nodes joined with nothing.
    * Columnar equivalent: strip tags, then delete all whitespace runs that
    * contain a newline, then trim.
    */
  def cellText(td: Column): Column =
    trim(
      regexp_replace(unescape(stripTags(TextOps.brToNewline(td))),
        "[ \\t\u00a0]*\\n[\\s\u00a0]*", ""),
      " \t\n\r\u00a0")

  /** Reference `td.get_text()` + whole-string strip (the knowledge and
    * sources paths, extract.py:147-149, 233-235): newlines from `<br>`
    * SURVIVE here — that is what the list parsers split on.
    */
  def cellTextRaw(td: Column): Column =
    trim(unescape(stripTags(TextOps.brToNewline(td))), " \t\n\r\u00a0")

  /** Reference `get_html_text(label)` (extract.py:109-130): paragraphs
    * regrouped with blank lines between.
    */
  def cellHtmlText(td: Column): Column =
    TextOps.paragraphs(unescape(stripTags(TextOps.brToNewline(td))))

  /** F2 — the page's label→value map: rows whose first td carries
    * `bgcolor=#DFE9F2` (case-insensitive, extract.py:69-71), as an array
    * of (label, value-html) structs. Rows with <2 cells are skipped.
    * Built on the DOM-grade tokenizer rows, so commented-out rows are
    * invisible, nested tables inside a value cell stay balanced, and —
    * matching `row.find_all("td")[-1]` pre-order semantics — the value
    * cell of a row whose last cell holds a nested table is the LAST INNER
    * cell (extract.py:64-66).
    */
  def labelMap(html: Column): Column =
    filter(
      transform(tableRows(html), r =>
        struct(
          upper(attr(r.getField("first_tag"), "bgcolor")).as("bg"),
          size(r.getField("cells")).as("n"),
          cellText(coalesce(try_element_at(r.getField("cells"), lit(1)),
            lit(""))).as("label"),
          coalesce(try_element_at(r.getField("cells"), lit(-1)), lit(""))
            .as("value"))),
      s => s.getField("bg") === "#DFE9F2" && s.getField("n") >= 2)

  /** Value-html of a labeled field, "" when the label is absent. LAST
    * occurrence wins when a label repeats — the reference assigns
    * `field_map[label] = ...` per row in document order (extract.py:79),
    * so a later duplicate overwrites an earlier one.
    */
  def field(lm: Column, label: String): Column =
    coalesce(
      try_element_at(
        filter(lm, s => s.getField("label") === label), lit(-1))
        .getField("value"),
      lit(""))

  /** First `<a href>` in a fragment ("" when none). */
  def aHref(h: Column): Column =
    regexp_extract(h, "(?is)<a[^>]+href\\s*=\\s*[\"']?([^\"'\\s>]+)", 1)

  /** All anchors of the page as (href, caption) structs, in order
    * (comment-stripped first — a commented-out link is not in the DOM).
    */
  def anchors(html0: Column): Column = {
    val html = stripComments(html0)
    val pat = "(?is)<a[^>]+href\\s*=\\s*[\"']?([^\"'\\s>]+)[^>]*>(.*?)</a>"
    zip_with(
      regexp_extract_all(html, lit(pat), lit(1)),
      regexp_extract_all(html, lit(pat), lit(2)),
      (h, t) => struct(h.as("href"), cellText(t).as("caption")))
  }

  /** First `<img src>` in a fragment ("" when none). */
  def imgSrc(h: Column): Column =
    regexp_extract(h, "(?is)<img[^>]+src\\s*=\\s*[\"']?([^\"'\\s>]+)", 1)

  /** F4 — order-preserving first-wins dedup of an array (the reference's
    * seen-set, extract.py:87-97) as a fold.
    */
  def dedupFirst(arr: Column): Column =
    aggregate(arr, array().cast("array<struct<href:string,caption:string>>"),
      (acc, x) =>
        when(exists(acc, y => y === x), acc)
          .otherwise(concat(acc, array(x))))

  /** P9 — urljoin for the site-relative shapes the reference produces
    * (extract.py:203,209,403): absolute passthrough, root-relative against
    * the origin, else resolved against the base's directory with up to
    * four `../` collapses.
    */
  def urljoin(base: Column, href: Column): Column = {
    val origin = regexp_extract(base, "^(https?://[^/]+)", 1)
    val dir = regexp_replace(base, "/[^/]*$", "/")
    val joined = concat(dir, href)
    val collapsed = (1 to 4).foldLeft(joined) { (u, _) =>
      regexp_replace(u, "/[^/]+/\\.\\./", "/")
    }
    when(href === "", lit(""))
      .when(href.rlike("^https?://"), href)
      .when(href.startsWith("/"), concat(origin, href))
      .otherwise(collapsed)
  }
}
