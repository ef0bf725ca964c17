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
