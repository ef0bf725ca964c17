package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** `TextOps.stripMarkup` / `domainsOf` on real markup (the corpus is
  * plain text, so the oracle pins only the plumbing — these pin the
  * HTML semantics). */
class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextOps.stripMarkup(col("t"))).collect().head.getString(0)

  test("script/style blocks vanish wholesale; tags become boundaries") {
    assert(strip("<html><head><SCRIPT src=x>var a=1;</script><style>.c{}</style>" +
      "</head><body><p>Hello<br/>world</p></body></html>") == "Hello world")
    // multi-line script bodies ((?s) dot-matches-newline)
    assert(strip("a<script>\nline1\nline2\n</script>b") == "a b")
    // a tag between words never glues them together
    assert(strip("one<div>two</div>three") == "one two three")
  }

  test("the six common entities decode; whitespace collapses") {
    assert(strip("x &amp;&nbsp;y\t\tz &lt;3&gt; &quot;q&quot; &#39;s&#39;") ==
      "x & y z <3> \"q\" 's'")
    assert(strip("  plain   text  ") == "plain text")
  }

  test("escaped markup decodes ONCE (&amp; last), never into live tags") {
    // a page showing '<div>' as text escapes it '&amp;lt;div&amp;gt;':
    // one decode yields the literal '&lt;div&gt;', not '<div>'
    assert(strip("code: &amp;lt;div&amp;gt;") == "code: &lt;div&gt;")
  }

  test("bare inequalities in prose are not tags; comments and DOCTYPE are") {
    // digit comparisons and unclosed '<x' never look tag-shaped
    assert(strip("price<10 and rate>5") == "price<10 and rate>5")
    assert(strip("if a<b then stop") == "if a<b then stop")
    // the irreducible ambiguity: '<b and c>' IS a tag shape (<b> with
    // attributes) and strips — documented trade-off of tag anchoring
    assert(strip("<!DOCTYPE html><!-- nav\nchrome --><p>body</p>") == "body")
  }

  test("domainsOf skips userinfo: a blocklisted host cannot hide behind credentials") {
    val got = Seq("fetch http://anything@evil.com/page and https://ok.org/x")
      .toDF("t").select(TextOps.domainsOf(col("t"))).collect().head.getSeq[String](0)
    assert(got == Seq("evil.com", "ok.org"), got.toString)
  }

  test("domainsOf extracts distinct lowercased hosts in first-seen order") {
    val got = Seq("see HTTPS://Example.COM/a and http://sub.site.org/b " +
      "plus https://example.com/c, no-scheme.com ignored").toDF("t")
      .select(TextOps.domainsOf(col("t"))).collect().head.getSeq[String](0)
    assert(got == Seq("example.com", "sub.site.org"), got.toString)
    val none = Seq("no urls here").toDF("t")
      .select(TextOps.domainsOf(col("t"))).collect().head.getSeq[String](0)
    assert(none.isEmpty)
  }
}
