package graft

import org.apache.spark.sql.functions.{lit, lower}

import graft.operators.WebText

class WebTextSpec extends SparkTestBase {
  import spark.implicits._

  test("htmlToText: tags stripped, blocks break lines, whitespace collapsed") {
    val html =
      """<html><head><title>ignored?</title></head><body>
        |<h1>Heading</h1>
        |<p>First   paragraph
        |   wraps.</p><div>Second<br>third</div>
        |<span>inline </span><b>bold</b> tail
        |</body></html>""".stripMargin
    val got = WebText.htmlToTextKernel(html)
    assert(got ==
      "ignored?\nHeading\nFirst paragraph wraps.\nSecond\nthird\ninline bold tail")
  }

  test("htmlToText: script/style/comment content is invisible, even with markup inside") {
    val html =
      """<p>before</p><script>var x = "<p>not text</p>";</script>
        |<style>p { color: red; }</style><!-- <p>comment</p> --><p>after</p>""".stripMargin
    assert(WebText.htmlToTextKernel(html) == "before\nafter")
  }

  test("htmlToText: entities decode; unknown entities and bare ampersands survive") {
    val html = "<p>Tom &amp; Jerry &lt;tag&gt; &#65;&#x42; &bogus; A&B &quot;q&quot;</p>"
    assert(WebText.htmlToTextKernel(html) == "Tom & Jerry <tag> AB &bogus; A&B \"q\"")
  }

  test("htmlToText: bare '<' inside script bodies and prose is content, not a tag") {
    // `a<b` in script must NOT swallow the real closing tag
    assert(WebText.htmlToTextKernel("<script>if(a<b)x()</script><p>hello</p>") == "hello")
    // '<' followed by a non-letter in prose is text (HTML5 rule)
    assert(WebText.htmlToTextKernel("<p>a < b and x <3 y</p>") == "a < b and x <3 y")
    // a stray close tag inside a script string stays invisible
    assert(WebText.htmlToTextKernel("<script>s=\"</b>\"</script><p>t</p>") == "t")
    // '<?' is a bogus comment (XML prolog, leaked PHP), never text
    assert(WebText.htmlToTextKernel("<?xml version=\"1.0\"?><p>hi</p>") == "hi")
    assert(WebText.htmlToTextKernel("<p>a<?php x() ?>b</p>") == "ab")
  }

  test("htmlToText: quoted '>' in attributes and unterminated tags don't derail the scan") {
    val html = """<p><a href="x?q=a>b" title='1>2'>link</a> rest</p><p>trail"""
    assert(WebText.htmlToTextKernel(html) == "link rest\ntrail")
    assert(WebText.htmlToTextKernel("ok <unclosed") == "ok")
    assert(WebText.htmlToTextKernel(null) == null)
  }

  test("htmlToText paragraphBreaks: blocks become blank lines, br stays a single newline") {
    val html = "<html><body><h1>title here</h1><p>alpha   line<br>beta line</p>" +
      "<div>gamma &amp; delta</div></body></html>"
    assert(WebText.htmlToTextKernel(html, paragraphBreaks = true) ==
      "title here\n\nalpha line\nbeta line\n\ngamma & delta")
    // default mode: byte-stable historical single-newline output
    assert(WebText.htmlToTextKernel(html) ==
      "title here\nalpha line\nbeta line\ngamma & delta")
    // empty blocks collapse — never more than one blank line
    assert(WebText.htmlToTextKernel(
      "<p></p><p>a</p><div> </div><ul><li></li></ul><p>b</p>",
      paragraphBreaks = true) == "a\n\nb")
    // nested blocks at one boundary still collapse to one break
    assert(WebText.htmlToTextKernel(
      "<div><p>x</p></div><div><p>y</p></div>", paragraphBreaks = true) == "x\n\ny")
    assert(WebText.htmlToTextKernel(null, paragraphBreaks = true) == null)
  }

  test("htmlToText paragraphBreaks: content cannot forge a paragraph boundary") {
    // literal U+0003 and an entity-decoded &#3; must both scrub to a
    // space, not split the paragraph
    val html = "<p>left \u0003 mid &#3; right</p><p>next</p>"
    assert(WebText.htmlToTextKernel(html, paragraphBreaks = true) ==
      "left mid right\n\nnext")
    // and in default mode the same bytes pass through untouched text
    // handling (no paragraph machinery involved)
    assert(!WebText.htmlToTextKernel(html).contains("\n\n"))
  }

  test("htmlToMainText paragraphBreaks: link-dense block drops whole, others keep structure") {
    val html = "<h1>real title</h1>" +
      "<div><a href='/a'>one</a> <a href='/b'>two</a></div>" +
      "<p>prose body here<br>second line</p>"
    assert(WebText.htmlToMainTextKernel(html, 0.5, paragraphBreaks = true) ==
      "real title\n\nprose body here\nsecond line")
    // text mode keeps the nav block as its own paragraph
    assert(WebText.htmlToTextKernel(html, paragraphBreaks = true) ==
      "real title\n\none two\n\nprose body here\nsecond line")
    // anchor state carries across paragraph boundaries: a link left
    // open before a block break still counts on the next block's line
    val spanning = "<p><a href='/x'>open anchor" +
      "</p><p>still anchor text</a> done</p><p>clean prose line follows</p>"
    assert(WebText.htmlToMainTextKernel(spanning, 0.5, paragraphBreaks = true) ==
      "clean prose line follows")
  }

  test("normalizeUrl: case, default ports, fragments; query order preserved") {
    assert(WebText.normalizeUrlKernel("HTTPS://WWW.Example.COM:443/Path/1?b=2&a=1#frag") ==
      "https://www.example.com/Path/1?b=2&a=1")
    assert(WebText.normalizeUrlKernel("http://Host.com:80/") == "http://host.com/")
    assert(WebText.normalizeUrlKernel("http://host.com:8080/x") == "http://host.com:8080/x")
    assert(WebText.normalizeUrlKernel("https://h.com/x?") == "https://h.com/x")
    assert(WebText.normalizeUrlKernel("not a url") == "not a url")
    assert(WebText.normalizeUrlKernel(null) == null)
  }

  test("urlHost: lowercased, port stripped, null for no authority") {
    assert(WebText.urlHostKernel("https://Sub.Example.com:8443/p") == "sub.example.com")
    assert(WebText.urlHostKernel("http://h.com?q=1") == "h.com")
    assert(WebText.urlHostKernel("mailto:x") == null)
    val df = Seq("https://A.b.C/x#f").toDF("url")
    val out = WebText.withUrlParts(df, "url").select("url_norm", "url_host")
      .as[(String, String)].head()
    assert(out == ("https://a.b.c/x", "a.b.c"))
  }

  test("html extraction roundtrips a templated document") {
    val text = "the quick data pipeline runs batch jobs"
    val html = s"""<html><head><style>.x{}</style></head>
      |<body><div class="main"><p>$text</p></div>
      |<script>track("<b>x</b>");</script></body></html>""".stripMargin
    val out = WebText.htmlToText(Seq(html).toDF("h"), "h").select("text")
      .as[String].head()
    assert(out == text)
  }

  test("hostSuffixes: dot suffixes in order; degenerate hosts give empty lists") {
    val got = Seq("a.b.example.com", "example.com", "com", "", null)
      .toDF("h")
      .select(WebText.hostSuffixes($"h"))
      .as[Seq[String]]
      .collect()
      .toSeq
    assert(got(0) == Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    assert(got(1) == Seq("example.com", "com"))
    assert(got(2) == Seq("com"))
    assert(got(3).isEmpty && got(4).isEmpty)
  }

  test("filterBlockedHosts: exact and subdomain matches drop; siblings and suffixes-of survive") {
    val docs = Seq(
      (1L, "bad.com"),          // exact block
      (2L, "a.bad.com"),        // subdomain of a blocked domain
      (3L, "notbad.com"),       // sibling — 'bad.com' is NOT a dot-suffix
      (4L, "good.org"),
      (5L, "bad.com.evil.net"), // 'bad.com' appears mid-host, not as suffix — survives
      (6L, null: String),       // no host → no suffixes → survives the blocklist stage
    ).toDF("id", "host")
    val blocklist = Seq("bad.com", "BLOCKED.ORG").toDF("domain") // case-folded
    val kept = WebText.filterBlockedHosts(docs, "id", "host", blocklist)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L, 6L), s"kept=$kept")
    // case-folds BOTH sides: mixed-case crawled hosts hit lowercase
    // entries and vice versa (RFC 4343)
    val kept2 = WebText.filterBlockedHosts(
      docs.withColumn("host", lit("x.Blocked.org")), "id", "host", blocklist)
    assert(kept2.count() == 0L, "mixed-case host must match a case-folded entry")
    val kept3 = WebText.filterBlockedHosts(
      docs.withColumn("host", lit("Ads.BAD.com")), "id", "host", blocklist)
    assert(kept3.count() == 0L, "mixed-case host must match a lowercase entry")
  }

  test("stripTrackingParams: mixed/all/none queries, case-folded names, order preserved") {
    def k(u: String) = WebText.stripTrackingParamsKernel(u)
    assert(k("https://a.com/p?id=1&utm_source=x&page=2&gclid=g&q=a+b") ==
      "https://a.com/p?id=1&page=2&q=a+b")
    assert(k("https://a.com/p?utm_source=x&FBCLID=y") == "https://a.com/p",
      "fully-tracking query loses its ?")
    assert(k("https://a.com/p?page=3") == "https://a.com/p?page=3")
    assert(k("https://a.com/p") == "https://a.com/p")
    assert(k("https://a.com/p?UTM_Campaign=y&b=2") == "https://a.com/p?b=2",
      "param-name match is case-folded")
    // valueless and empty params: name-only match, empties survive
    assert(k("https://a.com/p?gclid&a=1&&b") == "https://a.com/p?a=1&&b")
    assert(k(null) == null)
    // fragment (if present pre-normalization) stays put
    assert(k("https://a.com/p?utm_id=9&x=1#sec") == "https://a.com/p?x=1#sec")
  }

  test("htmlToMainText: link-dense nav/footer drop, inline anchors survive, link spans line break") {
    def m(h: String, d: Double = 0.5) = WebText.htmlToMainTextKernel(h, d)
    val page = "<html><body>" +
      "<div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
      "<p>real prose here with an <a href='/x'>inline link</a> in the middle of it</p>" +
      "<div><a>Privacy</a> | <a>Terms</a></div></body></html>"
    assert(m(page) == "real prose here with an inline link in the middle of it")
    // the plain extractor keeps all three lines — main-content is the delta
    assert(WebText.htmlToTextKernel(page).split("\n").length == 3)
    // anchor state carries across a <br> inside the link: both halves
    // count as link text, so both short lines drop
    val spanning = "<p>good long prose line stays intact here</p>" +
      "<p><a>first<br>second</a></p>"
    assert(m(spanning) == "good long prose line stays intact here")
    // threshold is a parameter: at 1.0 nothing drops
    assert(m(page, d = 1.0).split("\n").length == 3)
    // entities decode before counting and output
    assert(m("<p>Tom &amp; Jerry win</p>") == "Tom & Jerry win")
    assert(m(null) == null)
    // sentinel forgery: a literal U+0001/U+0002 in content, or the
    // numeric entities &#1;/&#2; that would DECODE into the anchor
    // sentinels, must not flip link state — the lines after them
    // still count as prose and survive
    val forged = "<p>junk \u0001 here in this line today</p>" +
      "<p>second good prose line stays present</p>"
    assert(m(forged).split("\n").length == 2, s"literal ctrl char forged state: ${m(forged)}")
    val forgedEnt = "<p>junk &#1; here in this line today</p>" +
      "<p>second good prose line stays present</p>" +
      "<p><a>Privacy</a> &#2; <a>Terms</a></p>"
    val got = m(forgedEnt)
    assert(got.split("\n").length == 2 && !got.contains("Privacy"),
      s"entity-decoded sentinel forged state: $got")
  }

  test("latestCapture: newest capture wins per url_norm, campaign spellings collapse, ties break to min id") {
    def ts(sec: Long) = new java.sql.Timestamp(1717236000000L + sec * 1000)
    val captures = Seq(
      (1L, ts(10), "http://a.com/page"),
      (2L, ts(20), "http://A.com:80/page"), // same page normalized — newer, wins
      (3L, ts(15), "http://a.com/page?utm_source=mail"), // campaign spelling, older
      (4L, ts(30), "http://a.com/other"), // solo capture survives
      (5L, ts(40), "http://b.com/x"),
      (6L, ts(40), "http://b.com/x"), // exact tie → min id wins
    ).toDF("id", "ts", "url")
    val kept = WebText.latestCapture(captures, "id", "url", "ts")
      .select($"id", $"url_norm").as[(Long, String)].collect().toMap
    assert(kept.keySet == Set(2L, 4L, 5L), s"kept=$kept")
    assert(kept(2L) == "http://a.com/page", "default port + tracking collapse to one url_norm")
    // stripTracking=false keeps the campaign spelling as its own URL
    val keptRaw = WebText.latestCapture(captures, "id", "url", "ts", stripTracking = false)
      .select($"id").as[Long].collect().toSet
    assert(keptRaw == Set(2L, 3L, 4L, 5L), s"keptRaw=$keptRaw")
  }

  test("filterBlockedHosts streaming: broadcast ceiling enforced with an actionable error") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val blocklist = Seq("a.com", "b.com", "c.com").toDF("domain")
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDS().toDF("id", "host")
    // over the (test-sized) ceiling → fail fast at plan time, not as
    // an executor OOM mid-stream
    val e = intercept[IllegalArgumentException] {
      WebText.filterBlockedHosts(docs, "id", "host", blocklist, maxBroadcastDomains = 2L)
    }
    assert(e.getMessage.contains("broadcast ceiling"), e.getMessage)
    assert(e.getMessage.contains("batch"), "error must point at the batch alternative")
    // at-or-under the ceiling the stream plans and runs
    val q = WebText
      .filterBlockedHosts(docs, "id", "host", blocklist, maxBroadcastDomains = 3L)
      .writeStream.format("memory").queryName("bl_ceiling").outputMode("append").start()
    try {
      in.addData((1L, "a.com"), (2L, "sub.b.com"), (3L, "ok.org"))
      q.processAllAvailable()
      val kept = spark.table("bl_ceiling").select($"id").as[Long].collect().toSet
      assert(kept == Set(3L), s"kept=$kept")
    } finally q.stop()
  }
}
