package graft

import org.apache.spark.sql.functions._
import graft.textops.TextExtract
import graft.sources.WebCorpus

class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("html")
      .select(TextExtract.fromHtml(col("html")).as("t"))
      .head().getString(0)

  test("body content is kept, head/title and tags are stripped") {
    assert(extract("<html><head><title>meta</title></head>" +
      "<body><p>hello</p> <b>world</b></body></html>") == "hello world")
  }

  test("script and style subtrees are dropped, even fake </body> inside them") {
    val page = "<html><head><style>p{color:red}</style>" +
      "<script>var x = '<body>not text</body>';</script></head>" +
      "<body>real text</body></html>"
    assert(extract(page) == "real text")
  }

  test("fragments without a body tag fall back to the whole document") {
    assert(extract("<p>just a fragment</p>") == "just a fragment")
  }

  test("predefined entities decode, &amp; last (no double-decode)") {
    assert(extract("<body>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; e &amp; f</body>")
      == "a <b> \"c\" 'd' &lt; e & f")
    // escape/unescape are inverses on entity-heavy text
    val tricky = "x & y < z > w &amp; &lt;tag>"
    val rt = Seq(tricky).toDF("t")
      .select(TextExtract.htmlUnescape(TextExtract.htmlEscape(col("t"))).as("rt"))
      .head().getString(0)
    assert(rt == tricky)
  }

  test("corpus invariant: extraction recovers text byte-identically per url") {
    // the north-star per-row invariant over the WHOLE synthetic corpus:
    // fromHtml(html) === text for every page, at any parallelism, including
    // binary-level equality of the UTF-8 payloads
    val pages = WebCorpus.pages(spark, WebCorpus.Params(nBase = 500, seed = 7L))
    val mismatches = pages
      .select(col("url"), col("text"),
        TextExtract.fromHtml(col("html")).as("extracted"))
      .filter(not(col("extracted") === col("text")) ||
        not(col("extracted").cast("binary") === col("text").cast("binary")))
      .count()
    assert(mismatches == 0L)
  }
}
