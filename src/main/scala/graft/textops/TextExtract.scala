package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction as pure column expressions (codegen,
  * engine-portable — every step is a regexp/replace chain a DuckDB oracle
  * can replicate).
  *
  * This is the operator behind the corpus per-row invariant (BASELINE.json
  * north star): the `text` column stored beside `html` at crawl time must be
  * BYTE-IDENTICAL to what extraction recovers from the `html` payload, per
  * url, on every run and at every parallelism level. [[fromHtml]] is the
  * canonical extractor; `WebLinkageSpec` asserts the round-trip over the
  * whole synthetic corpus and `q_extract_text` oracle-checks it on the
  * `documents` table (escape → embed → extract → byte-compare).
  *
  * Scope (deterministic by construction, no DOM): drop `<script>`/`<style>`
  * subtrees, keep `<body>` content when a body tag exists, strip remaining
  * tags, decode the five predefined XML entities. Entity decode order
  * matters — `&amp;` last, so `&amp;lt;` correctly yields `&lt;`, not `<`.
  */
object TextExtract {

  /** Escapes `& < >` for embedding text in an HTML payload (the generator
    * side of the round-trip; `&` first so later entities survive).
    */
  def htmlEscape(text: Column): Column = {
    val amp = replace(text, lit("&"), lit("&amp;"))
    val ltv = replace(amp, lit("<"), lit("&lt;"))
    replace(ltv, lit(">"), lit("&gt;"))
  }

  /** Decodes the five predefined entities; `&amp;` LAST (inverse of
    * [[htmlEscape]]'s order).
    */
  def htmlUnescape(text: Column): Column = {
    val lt = replace(text, lit("&lt;"), lit("<"))
    val gt = replace(lt, lit("&gt;"), lit(">"))
    val qt = replace(gt, lit("&quot;"), lit("\""))
    val ap = replace(qt, lit("&#39;"), lit("'"))
    replace(ap, lit("&amp;"), lit("&"))
  }

  /** Extracts text from an `html` column (binary or string; binary is
    * decoded as UTF-8). Tag-free body content round-trips byte-identically:
    * `fromHtml(htmlEscape(text) embedded in a page) === text`.
    *
    * RE2-compatible patterns only (no backreferences, non-greedy allowed) so
    * the DuckDB oracle runs the very same regexes.
    */
  def fromHtml(html: Column): Column = {
    val s = html.cast("string")
    // script/style subtrees carry no text — drop them before tag stripping
    // (two passes, no backreference: RE2 engines reject \1)
    val noScript = regexp_replace(s, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    // prefer the <body> subtree when present (head/title text is metadata,
    // not page text); fall back to the whole document for fragments
    val body = when(noStyle.rlike("(?is)<body[^>]*>.*</body>"),
      regexp_extract(noStyle, "(?is)<body[^>]*>(.*)</body>", 1))
      .otherwise(noStyle)
    // strip remaining tags with NO inserted separator: extraction must be
    // the exact inverse of embedding for tag-free bodies (byte-identity)
    val noTags = regexp_replace(body, "(?s)<[^>]*>", "")
    htmlUnescape(noTags)
  }
}
