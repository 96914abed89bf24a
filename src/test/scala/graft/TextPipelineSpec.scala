package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.operators.NearDupCluster

/** PII kernels, winnowing fingerprints, and near-dup connected components. */
class TextPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def sql1(q: String): Any = spark.sql(s"SELECT $q").collect()(0).get(0)

  // ------------------------------------------------------------------- PII

  test("pii counts and redaction") {
    val t = "mail a.b+c@test.org or root@10.2.3.4, call +1 555-123-4567 " +
      "or (555) 987 6543; server 192.168.0.1 and 8.8.8.8 up, not 1.2.3"
    assert(sql1(s"pii_emails('$t')") == 1) // root@10.2.3.4 is not an email: TLD must be alphabetic
    assert(sql1(s"pii_ipv4('$t')") == 3) // 10.2.3.4 counts as an IP; 1.2.3 doesn't
    assert(sql1(s"pii_phones('$t')") == 2)
    val red = sql1(s"pii_redact('$t')").toString
    assert(!red.contains("test.org") && !red.contains("555"))
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    assert(red.contains("root@<IP>")) // numeric host: IP pass catches what the email pass left
    assert(red.contains("not 1.2.3")) // too-short dotted run untouched
  }

  test("pii redaction leaves clean text alone") {
    assert(sql1("pii_redact('plain words only here')") == "plain words only here")
    assert(sql1("pii_emails('no at signs')") == 0)
  }

  // ---------------------------------------------------------- tokenization

  test("norm_tokens keeps duplicates (term frequency), word_ngrams dedupes") {
    assert(sql1("size(norm_tokens('The the  THE cat'))") == 4)
    assert(sql1("size(word_ngrams('The the  THE cat', 1))") == 2)
    assert(sql1("norm_tokens('  A  b ')").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("a", "b"))
    assert(sql1("size(norm_tokens(''))") == 0)
  }

  // ------------------------------------------------------------- winnowing

  test("winnowing guarantee: every w-window of shingle hashes contains a selected hash") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running far away",
      "aaaaabaaaaabaaaaabaaaaab repeated block structure aaaaabaaaaab",
      "short but long enough to produce several windows of hashes")
    val k = 5; val w = 4
    for (d <- docs) {
      val selected = TextFns.winnow(d, k, w).toSet
      // selected hashes must be a subset of the k-gram hash set, and every
      // window of w consecutive positions must contain >= 1 selected hash
      val hashSeq = spark.sql(
        s"SELECT winnow_fingerprint('${d.replace("'", "''")}', $k, 1)").collect()(0)
        .getSeq[Long](0) // w=1 selects every position's hash == the full hash sequence
      assert(selected.subsetOf(hashSeq.toSet))
      hashSeq.sliding(w).foreach { win =>
        assert(win.exists(selected.contains), s"window with no fingerprint in: $d")
      }
    }
  }

  test("winnowing edge cases") {
    assert(TextFns.winnow("abc", 8, 4).isEmpty) // shorter than one shingle
    assert(TextFns.winnow("abcdefgh", 8, 4).length == 1) // exactly one shingle
    // identical text -> identical fingerprints (determinism)
    assert(TextFns.winnow("some document text here", 5, 4).toSeq ==
      TextFns.winnow("some document text here", 5, 4).toSeq)
  }

  test("gopher_stats: dup lines, bullets, ellipses, symbols, alpha words") {
    val g = TextFns.gopherStats("- a\n- a\n- b\nmore text here...\nmore text here...")
    assert(g(0) == 2.0 / 5)                       // two 2nd-occurrence lines
    assert(g(1) == (3 + 17).toDouble / (3 + 3 + 3 + 17 + 17)) // their chars
    assert(g(2) == 3.0 / 5)                       // bullet lines
    assert(g(3) == 2.0 / 5)                       // ellipsis lines
    assert(g(4) == 2.0 / 12)                      // 2 '...' over 12 ws-tokens
    assert(g(5) == 9.0 / 12)                      // '-' tokens have no letter
    val empty = TextFns.gopherStats("")
    assert(empty.forall(_ == 0.0))
    val sym = TextFns.gopherStats("## x … y")
    assert(sym(4) == 3.0 / 4 && sym(5) == 2.0 / 4) // 2 '#' + 1 '…', 4 tokens
  }

  test("url_normalize: case, ports, www, trackers, sort, slash, fragment") {
    import TextFns.urlNormalize
    assert(urlNormalize("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag")
      == "https://example.com/A/b?a=1&b=2")
    assert(urlNormalize("http://site.org:80/") == "http://site.org")
    assert(urlNormalize("http://site.org:8080/p") == "http://site.org:8080/p")
    assert(urlNormalize("https://a.b/p?fbclid=z") == "https://a.b/p")
    assert(urlNormalize("https://a.b/p?ref=1&x=2&REF=3") == "https://a.b/p?x=2")
    assert(urlNormalize("not a url") == "not a url")
    assert(urlNormalize("  ftp://Host.Net/f  ") == "ftp://host.net/f")
  }

  test("chunk_text windows, overlap, and boundary behavior") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    assert(TextFns.chunkText(doc, 4, 1).toSeq ==
      Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // exact multiple: final window reaches the end, no empty tail chunk
    assert(TextFns.chunkText("a b c d", 2, 0).toSeq == Seq("a b", "c d"))
    assert(TextFns.chunkText("a b c", 8, 2).toSeq == Seq("a b c")) // shorter than one window
    assert(TextFns.chunkText("", 4, 1).isEmpty)
    assert(TextFns.hashBucket("same text", 1000) == TextFns.hashBucket("same text", 1000))
    assertThrows[IllegalArgumentException](TextFns.chunkText("x", 4, 4))
  }

  // --------------------------------------------------- connected components

  test("hash-min connected components: chain, clique, singleton-pair") {
    import spark.implicits._
    // chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)).toDF("a", "b")
    val cc = NearDupCluster.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("clusters() sizes and canonical flags") {
    import spark.implicits._
    val pairs = Seq((7L, 3L), (3L, 9L)).toDF("x", "y")
    val rows = NearDupCluster.clusters(pairs, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3))).sortBy(_._1)
    assert(rows.toSeq == Seq((3L, 3L, 3, true), (7L, 3L, 3, false), (9L, 3L, 3, false)))
  }

  test("html_text: scripts, styles, comments, entities, whitespace") {
    import graft.functions.TextFns.htmlText
    assert(htmlText("<p>a</p><p>b</p>") == "a\nb")
    // script/style subtrees go entirely, including embedded angle brackets
    assert(htmlText("x<script>if (a<b) { f('</'); }</script>y") == "xy")
    assert(htmlText("x<style>p > a { }</style>y") == "xy")
    assert(htmlText("a<!-- <p>not text</p> -->b") == "ab")
    // entity order: &amp; decodes LAST so '&amp;lt;' yields literal '&lt;'
    assert(htmlText("&amp;lt;") == "&lt;")
    assert(htmlText("&lt;b&gt; &#72;&#x69; &nbsp;x") == "<b> Hi x")
    // invalid/control numeric refs vanish rather than corrupt
    assert(htmlText("a&#8;b&#xD800;c") == "abc")
    // block closers become newlines; runs collapse to at most two
    assert(htmlText("<h1>t</h1><div>a</div><div></div><div></div><div>b</div>") == "t\na\n\nb")
    // CR and tabs collapse like spaces; bare LF stays a line break
    assert(htmlText("a \t b\r\nc") == "a b\nc")
    assert(htmlText(null) == null)
  }
}
