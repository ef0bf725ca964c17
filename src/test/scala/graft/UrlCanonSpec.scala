package graft

import org.apache.spark.sql.functions._

/**
 * Exhaustive component-permutation pinning of `TextOps.canonicalUrl`
 * against an independent Scala model (string operations over the URL
 * COMPONENTS — no regex shared with the implementation): every
 * combination of scheme case, userinfo, host case, default/non-default
 * port, path shape (including '&' as a legal path sub-delimiter), query
 * param multiset (tracking/genuine, valued/valueless, case variants,
 * empty params), and fragment, plus seeded-random longer param runs.
 * One Spark job evaluates the whole grid — the ScalaCheck-style
 * guarantee (the round-12 verdict's optional hardening #8) without
 * per-case query overhead.
 */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  /** The model: canonicalization defined on components.
    * Tracking name = (?i) utm_-prefixed, fbclid, gclid. */
  private def isTracking(param: String): Boolean = {
    val name = param.takeWhile(_ != '=').toLowerCase
    name.startsWith("utm_") || name == "fbclid" || name == "gclid"
  }
  private def model(scheme: String, userinfo: String, host: String,
                    port: String, path: String, params: Option[Seq[String]],
                    frag: String): String = {
    val ls = scheme.toLowerCase
    val keepPort = !((ls == "http" && port == ":80") || (ls == "https" && port == ":443"))
    val h = host.toLowerCase + (if (keepPort) port.toLowerCase else "")
    val q = params match {
      case None => ""
      case Some(ps) =>
        val kept = ps.filter(p => p.nonEmpty && !isTracking(p))
        if (kept.isEmpty) "" else kept.mkString("?", "&", "")
    }
    ls + "://" + userinfo + h + path + q
  }

  private def assemble(scheme: String, userinfo: String, host: String,
                       port: String, path: String, params: Option[Seq[String]],
                       frag: String): String =
    scheme + "://" + userinfo + host + port + path +
      params.map(_.mkString("?", "&", "")).getOrElse("") + frag

  test("canonicalUrl == component model over the full permutation grid") {
    val schemes = Seq("http", "HTTPS", "ftp", "a+b-c")
    val userinfos = Seq("", "User:Pa55@", "uSeR@")
    val hosts = Seq("Example.COM", "h0st.x-y.net")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/A/B", "/a&utm_b=1/x", "/p@t.h")
    val frags = Seq("", "#Frag", "#a?b=utm_source")
    val paramSets: Seq[Option[Seq[String]]] = Seq(
      None,
      Some(Seq.empty),                       // bare '?'
      Some(Seq("q=1")),
      Some(Seq("utm_source=a", "utm_medium=b")),
      Some(Seq("UTM_Source=a", "Fbclid=b")), // names case-insensitive
      Some(Seq("fbclid", "q=1")),            // valueless tracking, leading
      Some(Seq("a=1", "UTM_x", "fbclid")),   // valueless run, trailing
      Some(Seq("fbclid", "gclid", "q=1")),   // valueless run, leading
      Some(Seq("q=1", "fbclid", "r=2", "gclid=3")),
      Some(Seq("fbclidX=1", "q=2")),         // prefix of a tracking name
      Some(Seq("fbclidX", "utm", "q=2")),    // ...valueless too; bare 'utm'
      Some(Seq("utm_", "gclid")),            // bare 'utm_' IS tracking
      Some(Seq("a=1", "", "b=2")),           // empty param ('&&') collapses
      Some(Seq("x=a==b", "utm_c=d=e")))      // '=' legal inside values
    val cases = for {
      s <- schemes; u <- userinfos; h <- hosts; p <- ports
      pa <- paths; ps <- paramSets; f <- frags
    } yield (assemble(s, u, h, p, pa, ps, f), model(s, u, h, p, pa, ps, f))

    // seeded-random longer runs over a param alphabet (the permutation
    // shapes the curated sets can miss: arbitrary interleavings)
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("q=1", "A=2", "page=3", "fbclid", "FBCLID=z", "gclid",
      "Gclid=7", "utm_source=a", "UTM_X", "utm_", "utm=keep", "xutm_y=keep",
      "", "v=a==b")
    val randomCases = (0 until 400).map { _ =>
      val ps = Some(Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.size))))
      ("https", "", "H.com", "", "/p", ps, "")
    }.map { case (s, u, h, p, pa, ps, f) =>
      (assemble(s, u, h, p, pa, ps, f), model(s, u, h, p, pa, ps, f))
    }

    // non-URLs (no scheme://) pass through unchanged, protocol-relative included
    val passthrough = Seq("not a url at all", "//Host.com/Path?utm_source=x",
      "relative/path?fbclid=1", "")
      .map(s => (s, s))

    val all = (cases ++ randomCases ++ passthrough).distinct
    val got = all.map(_._1).toDF("u")
      .select(col("u"), graft.pipeline.TextOps.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bad = all.filter { case (in, want) => got(in) != want }
    assert(bad.isEmpty,
      s"${bad.size}/${all.size} mismatches, first 5: " +
        bad.take(5).map { case (in, want) =>
          s"\n  in=$in\n  want=$want\n  got=${got(in)}"
        }.mkString)
  }
}
