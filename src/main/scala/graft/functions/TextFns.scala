package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3

/**
 * Text-analysis / dedup primitives for LLM training-data pipelines (a
 * first-class extension area beyond the reference's surface — see the build
 * brief): tokenization, quality signals, language ID, fingerprinting, MinHash/
 * SimHash for near-dup detection. All deterministic (seeded hashes), all
 * evaluated row-local so they parallelize embarrassingly at 100 TB.
 */
object TextFns {

  private val S = StringType
  private val I = IntegerType
  private val L = LongType
  private val D = DoubleType

  private def str(a: Any): String = a.asInstanceOf[UTF8String].toString
  private def utf(s: String): UTF8String = UTF8String.fromString(s)
  private def int(a: Any): Int = a.asInstanceOf[Int]

  private def fn(name: String, out: DataType, in: Seq[DataType]*)(eval: Array[Any] => Any): Unit =
    FnRegistry.add(FnSpec(name, in.map(s => s.length -> s).toMap, out, _ => eval))

  // ---------------------------------------------------------------- helpers
  def wsTokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Canonical dedup normalization: lowercase, collapse runs of whitespace. */
  def normalize(s: String): String = s.trim.toLowerCase.replaceAll("\\s+", " ")

  /** Distinct lowercase character k-shingles. */
  def charShingles(s: String, k: Int): Array[String] = {
    val n = normalize(s)
    if (n.length < k) { if (n.isEmpty) Array.empty else Array(n) }
    else {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + k <= n.length) { set.add(n.substring(i, i + k)); i += 1 }
      set.toArray(new Array[String](set.size))
    }
  }

  /** Distinct lowercase word n-grams. */
  def wordNgrams(s: String, n: Int): Array[String] = {
    val words = wsTokens(normalize(s))
    if (words.length < n) { if (words.isEmpty) Array.empty else Array(words.mkString(" ")) }
    else {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= words.length) { set.add(words.slice(i, i + n).mkString(" ")); i += 1 }
      set.toArray(new Array[String](set.size))
    }
  }

  private def hash64(s: String, seed: Int): Long = {
    val h1 = MurmurHash3.stringHash(s, seed)
    val h2 = MurmurHash3.stringHash(s, seed * 0x9e3779b9 + 1)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** splitmix64 finalizer (public domain constant schedule) */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** k-min MinHash signature over char shingles. The hash family is
   *  Kirsch-Mitzenmacher double hashing — h_i = h1 + i*h2 — with h1/h2
   *  derived from ONE murmur pass per shingle via splitmix64, so cost is
   *  O(shingles + numHashes) with a single string traversal per shingle. */
  def minhash(s: String, numHashes: Int, shingleK: Int, seed: Int): Array[Long] = {
    val sh = charShingles(s, shingleK)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < sh.length) {
      val base = MurmurHash3.stringHash(sh(j), seed).toLong
      val h1 = splitmix64(base)
      val h2 = splitmix64(base ^ 0x632be59bd9b4e019L) | 1L
      var i = 0
      var h = h1
      while (i < numHashes) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      j += 1
    }
    sig
  }

  /** LSH band buckets from a MinHash signature: one 64-bit bucket id per band
   *  (band index folded in so buckets never collide across bands). Near-dup
   *  candidate generation = explode + equi-join on bucket — shuffle-friendly,
   *  never all-pairs. */
  def minhashBands(s: String, numHashes: Int, shingleK: Int, bands: Int, seed: Int): Array[Long] = {
    val sig = minhash(s, numHashes, shingleK, seed)
    val rows = numHashes / bands
    Array.tabulate(bands) { b =>
      var h = 1125899906842597L + b
      var i = b * rows
      while (i < (b + 1) * rows) { h = h * 31 + sig(i); i += 1 }
      h
    }
  }

  def simhash(s: String, shingleK: Int): Long = {
    val sh = charShingles(s, shingleK)
    val counts = new Array[Int](64)
    var j = 0
    while (j < sh.length) {
      val h = hash64(sh(j), 0x5f3759df)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def jaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  /** Rabin-Karp rolling polynomial fingerprint (base 1000003, 64-bit wrap) of
   *  the normalized text. */
  def fingerprint(s: String): Long = {
    val n = normalize(s)
    var h = 1469598103934665603L
    var i = 0
    while (i < n.length) { h = h * 1000003L + n.charAt(i); i += 1 }
    h
  }

  // ------------------------------------------------------------- PII handling

  /** PII patterns restricted to the syntax both java.util.regex and RE2-class
   *  engines evaluate identically (character classes, bounded quantifiers,
   *  \b, non-capturing groups — no lookaround, no backrefs), so an external
   *  SQL engine can serve as an independent oracle for counts and redaction. */
  // Hoisted per-row regexes (Pattern.compile inside an eval is per-row cost)
  private val reBullet = java.util.regex.Pattern.compile("^[ \t]*[-*•]")
  private val reEllipsis = java.util.regex.Pattern.compile("(\\.\\.\\.|…)[ \t]*$")
  private val reBpePretok = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  private val piiEmail = java.util.regex.Pattern.compile(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val piiIpv4 = java.util.regex.Pattern.compile(
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")
  private val piiPhone = java.util.regex.Pattern.compile(
    "(?:\\+?\\d{1,2}[ .-]?)?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}\\b")

  private def countMatches(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s); var n = 0
    while (m.find()) n += 1
    n
  }

  /** Redaction replaces emails, then IPv4s, then phones — placeholders contain
   *  no digits or '@', so later passes never match inside earlier ones. */
  def piiRedact(s: String): String = {
    val a = piiEmail.matcher(s).replaceAll("<EMAIL>")
    val b = piiIpv4.matcher(a).replaceAll("<IP>")
    piiPhone.matcher(b).replaceAll("<PHONE>")
  }

  // ------------------------------------------------ winnowing fingerprints

  /** Winnowing document fingerprint (Schleimer, Wilkerson & Aiken, SIGMOD
   *  2003): hash every k-char shingle of the normalized text, slide a window
   *  of w consecutive hashes, keep each window's minimum (rightmost on ties),
   *  dedupe consecutive selections by position. Guarantees every w-run of
   *  shingles contributes a fingerprint (detection of any match ≥ k+w-1
   *  chars), at expected density 2/(w+1). Row-local — embarrassingly
   *  parallel at corpus scale. */
  def winnow(s: String, k: Int, w: Int): Array[Long] = {
    require(k >= 1 && w >= 1, "winnow_fingerprint needs k >= 1 and w >= 1")
    val n = normalize(s)
    if (n.length < k) return Array.empty
    val m = n.length - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hash64(n.substring(i, i + k), 7919); i += 1 }
    val windows = m - w + 1
    if (windows <= 1) { // document shorter than one window: global min
      var best = 0; var j = 1
      while (j < m) { if (hs(j) <= hs(best)) best = j; j += 1 }
      return Array(hs(best))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last = -1
    var start = 0
    while (start < windows) {
      var best = start; var j = start + 1
      while (j < start + w) { if (hs(j) <= hs(best)) best = j; j += 1 }
      if (best != last) { out += hs(best); last = best }
      start += 1
    }
    out.toArray
  }

  // --------------------------------------------------- quality signals (Gopher-style)

  /** Shannon entropy (bits) of the codepoint distribution — low entropy flags
    * boilerplate/repetition, high flags gibberish (a standard pretraining
    * quality filter signal). */
  def charEntropy(s: String): Double = {
    if (s.isEmpty) return 0.0
    val counts = scala.collection.mutable.HashMap.empty[Int, Int]
    var i = 0; var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.update(cp, counts.getOrElse(cp, 0) + 1)
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    counts.valuesIterator.foreach { c =>
      val p = c.toDouble / n
      h -= p * (math.log(p) / math.log(2))
    }
    h
  }

  /** Fraction of word n-grams that are repeats of an earlier occurrence —
    * the repetition-filter family from published pretraining pipelines. */
  def dupNgramFrac(s: String, n: Int): Double = {
    val toks = wsTokens(normalize(s))
    if (toks.length < n || n < 1) return 0.0
    val total = toks.length - n + 1
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < total) { seen.add(toks.slice(i, i + n).mkString(" ")); i += 1 }
    1.0 - seen.size.toDouble / total
  }

  /** (n_lines, max_len, mean_len) over newline-split lines (codepoint
    * lengths) — layout signals for document quality filtering. */
  def lineStats(s: String): (Int, Int, Double) = {
    val lines = s.split("\n", -1)
    val lens = lines.map(l => l.codePointCount(0, l.length))
    (lines.length, if (lens.isEmpty) 0 else lens.max,
      if (lines.isEmpty) 0.0 else lens.sum.toDouble / lines.length)
  }

  /** Gopher repetition/layout signals (Rae et al. 2021, Table A1, with the
   *  public pipeline stacks' conventions): duplicate-line fractions count
   *  2nd+ occurrences; bullet/ellipsis tests use [ \t]-trimmed line edges;
   *  words are whitespace tokens; the alphabetic test is ASCII-scoped so the
   *  oracle engine reproduces it exactly. Char counts are codepoints. */
  def gopherStats(s: String): Array[Double] = {
    val lines = s.split("\n", -1)
    val nLines = lines.length
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    lines.foreach(l => counts.update(l, counts.getOrElse(l, 0) + 1))
    def cp(l: String): Int = l.codePointCount(0, l.length)
    val totalChars = lines.map(cp).sum
    val dupChars = counts.iterator.map { case (l, c) => (c - 1) * cp(l) }.sum
    val bullet = reBullet
    val ell = reEllipsis
    val toks = wsTokens(s)
    val hashes = s.count(_ == '#')
    val dots = (s.length - s.replace("...", "").length) / 3
    val ells = s.count(_ == '…')
    Array(
      if (nLines == 0) 0.0 else (nLines - counts.size).toDouble / nLines,
      if (totalChars == 0) 0.0 else dupChars.toDouble / totalChars,
      if (nLines == 0) 0.0 else lines.count(l => bullet.matcher(l).find).toDouble / nLines,
      if (nLines == 0) 0.0 else lines.count(l => ell.matcher(l).find).toDouble / nLines,
      (hashes + dots + ells).toDouble / math.max(toks.length, 1),
      if (toks.isEmpty) 0.0
      else toks.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
        .toDouble / toks.length)
  }

  /** Engine-portable polynomial hash: h = (h*31 + codepoint) mod 2^31-1,
   *  init 7 — reproducible in plain SQL via list_reduce. */
  def polyHash(g: String): Long = {
    var h = 7L
    g.codePoints().forEach(cp => h = (h * 31 + cp) % 2147483647L)
    h
  }

  /** Deterministic dataset-split bucket in [0, n) from the polynomial hash —
   *  the standard stable train/val/test assignment. */
  def hashBucket(s: String, n: Int): Int = (polyHash(s) % n).toInt

  /** Overlapping token-window chunks (RAG/context-window splitting): windows
   *  of `size` whitespace tokens advancing by `size - overlap`, the final
   *  window emitted once it reaches the end of the document. Chunks are
   *  space-rejoined (whitespace-normalized by construction). */
  def chunkText(s: String, size: Int, overlap: Int): Array[String] = {
    require(size > 0 && overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val toks = wsTokens(s)
    if (toks.isEmpty) return Array.empty
    val step = size - overlap
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var done = false
    while (!done) {
      out += toks.slice(i, i + size).mkString(" ")
      if (i + size >= toks.length) done = true else i += step
    }
    out.toArray
  }

  /** DSIR-style hashed n-gram features (Xie et al. 2023): all 1..nmax word
   *  n-grams of the normalized text, non-distinct, each hashed into
   *  [0, buckets) with an engine-portable polynomial hash
   *  (h = (h*31 + codepoint) mod 2147483647, init 7) — reproducible in plain
   *  SQL via list_reduce, unlike murmur. */
  def hashedNgrams(s: String, nmax: Int, buckets: Int): Array[Int] = {
    val words = wsTokens(normalize(s))
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var n = 1
    while (n <= nmax) {
      var i = 0
      while (i + n <= words.length) {
        val gram = words.slice(i, i + n).mkString(" ")
        out += (polyHash(gram) % buckets).toInt
        i += 1
      }
      n += 1
    }
    out.toArray
  }

  private val urlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$".r
  private val trackerKeys = Set("fbclid", "gclid", "msclkid", "ref")

  /** Canonical URL form for web-corpus dedup: lowercase scheme+host, strip
   *  `www.`, strip default ports (:80/http, :443/https), drop the fragment,
   *  drop tracking params (utm_*, fbclid, gclid, msclkid, ref), sort the
   *  surviving query params, strip trailing path slashes. Path case is
   *  preserved (paths are case-sensitive per RFC 3986). Non-URL input is
   *  returned trimmed, unchanged. */
  def urlNormalize(u: String): String = u.trim match {
    case urlRe(scheme, auth, path, query, _) =>
      val sch = scheme.toLowerCase
      val hostport = auth.toLowerCase
      val (host0, port0) = hostport.lastIndexOf(':') match {
        case -1 => (hostport, "")
        case i if i + 1 < hostport.length && hostport.substring(i + 1).forall(_.isDigit) =>
          (hostport.substring(0, i), hostport.substring(i))
        case _ => (hostport, "")
      }
      val host = if (host0.startsWith("www.")) host0.substring(4) else host0
      val port = if ((sch == "http" && port0 == ":80") || (sch == "https" && port0 == ":443")) ""
                 else port0
      val pathNorm = path.reverse.dropWhile(_ == '/').reverse
      val kept = Option(query).map(_.drop(1)).getOrElse("")
        .split("&").filter(_.nonEmpty)
        .filterNot { kv =>
          val k = kv.takeWhile(_ != '=').toLowerCase
          k.startsWith("utm_") || trackerKeys(k)
        }.sorted
      sch + "://" + host + port + pathNorm +
        (if (kept.isEmpty) "" else "?" + kept.mkString("&"))
    case other => other
  }

  // ------------------------------------------------------------ language ID
  // Two stages: (1) Unicode-script histogram — a dominant non-Latin script
  // identifies the language (macro codes: zh for Han, ru for Cyrillic, …);
  // (2) Latin-script text falls through to stopword-hit voting over small
  // built-in lists. No corpus-trained model — honest heuristic, labeled so.
  private val stop: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "it", "that", "was", "for", "on", "with", "as", "are", "at", "be", "this", "have", "from", "or", "by", "not", "but"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "für", "von", "dem", "den", "des", "sich", "im", "zu", "auch", "als"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "un", "une", "des", "du", "dans", "pour", "que", "qui", "sur", "avec", "au", "ce", "il", "ne"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "no", "un", "una", "de", "en", "que", "por", "para", "con", "se", "del", "su", "al", "lo"),
    "it" -> Set("il", "la", "le", "e", "è", "non", "un", "una", "di", "che", "per", "con", "si", "del", "della", "in", "da", "su", "al", "dei"),
    "pt" -> Set("o", "a", "os", "as", "e", "é", "não", "um", "uma", "de", "em", "que", "por", "para", "com", "se", "do", "da", "no", "na"),
    "nl" -> Set("de", "het", "een", "en", "van", "ik", "te", "dat", "die", "in", "is", "niet", "op", "aan", "met", "als", "voor", "er", "maar", "om"),
    "sv" -> Set("och", "att", "det", "som", "en", "på", "är", "av", "för", "med", "den", "till", "inte", "om", "ett", "han", "var", "jag", "de", "så"),
    "pl" -> Set("w", "z", "na", "się", "nie", "jest", "do", "że", "ale", "po", "jak", "co", "tak", "ma", "od", "za", "przez", "która", "być", "tym"),
    "tr" -> Set("ve", "bir", "bu", "için", "ile", "ne", "gibi", "daha", "çok", "ama", "olarak", "sonra", "kadar", "olan", "ben", "bunun", "değil", "ki", "mi", "şey"),
    "vi" -> Set("và", "của", "là", "có", "không", "được", "trong", "một", "người", "này", "cho", "với", "các", "những", "để", "đã", "khi", "cũng", "như", "tôi"),
    "id" -> Set("yang", "dan", "di", "ini", "itu", "dengan", "untuk", "tidak", "dari", "dalam", "akan", "pada", "juga", "saya", "ke", "karena", "ada", "mereka", "bisa", "atau"),
    "fi" -> Set("ja", "ei", "että", "se", "oli", "hän", "mutta", "ovat", "kun", "niin", "myös", "joka", "jos", "mitä", "tämä", "ole", "sen", "vain", "hyvä", "kovin"),
    "da" -> Set("og", "det", "er", "en", "til", "på", "de", "ikke", "af", "med", "den", "han", "hvad", "var", "som", "jeg", "et", "der", "ved", "dag"),
    "no" -> Set("og", "det", "er", "en", "til", "på", "de", "ikke", "av", "med", "den", "han", "hva", "var", "som", "jeg", "et", "vet", "oss", "fin"))

  def langId(s: String): String = {
    import Character.UnicodeScript
    var letters = 0
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var arab = 0
    var deva = 0; var greek = 0; var heb = 0; var thai = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        UnicodeScript.of(cp) match {
          case UnicodeScript.HAN                            => han += 1
          case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => kana += 1
          case UnicodeScript.HANGUL                         => hangul += 1
          case UnicodeScript.CYRILLIC                       => cyr += 1
          case UnicodeScript.ARABIC                         => arab += 1
          case UnicodeScript.DEVANAGARI                     => deva += 1
          case UnicodeScript.GREEK                          => greek += 1
          case UnicodeScript.HEBREW                         => heb += 1
          case UnicodeScript.THAI                           => thai += 1
          case _                                            =>
        }
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return "und"
    def frac(n: Int) = n.toDouble / letters
    // Japanese mixes Han with kana, so any meaningful kana wins before Han.
    if (frac(kana) >= 0.05) return "ja"
    if (frac(hangul) >= 0.30) return "ko"
    if (frac(han) >= 0.30) return "zh"
    if (frac(cyr) >= 0.30) return "ru"
    if (frac(arab) >= 0.30) return "ar"
    if (frac(deva) >= 0.30) return "hi"
    if (frac(greek) >= 0.30) return "el"
    if (frac(heb) >= 0.30) return "he"
    if (frac(thai) >= 0.30) return "th"
    val toks = wsTokens(normalize(s))
    if (toks.isEmpty) return "und"
    var best = "und"; var bestHits = 0
    stopOrdered.foreach { case (lang, words) =>
      var hits = 0
      toks.foreach(t => if (words.contains(t)) hits += 1)
      if (hits > bestHits) { bestHits = hits; best = lang }
    }
    if (bestHits * 20 < toks.length) "und" else best // < 5% stopwords → unknown
  }

  // alphabetical vote order so equal-hit ties break deterministically
  private val stopOrdered: Seq[(String, Set[String])] = stop.toSeq.sortBy(_._1)

  // ------------------------------------------------------------ html → text
  // Boilerplate removal for web corpora (the C4/CCNet extraction stage):
  // a DETERMINISTIC regex pipeline, spelled so an independent RE2 engine
  // reproduces it byte for byte: drop script/style subtrees and comments,
  // turn block-closing tags into newlines, strip remaining tags, decode the
  // named entity subset + numeric refs, collapse whitespace.
  private val reScript = java.util.regex.Pattern.compile("(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>")
  private val reComment = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private val reBlock = java.util.regex.Pattern.compile("(?i)<(br\\s*/?|/p|/div|/li|/tr|/h[1-6]|/title)\\s*>")
  private val reTag = java.util.regex.Pattern.compile("<[^>]*>")
  private val reDec = java.util.regex.Pattern.compile("&#([0-9]{1,7});")
  private val reHex = java.util.regex.Pattern.compile("&#[xX]([0-9a-fA-F]{1,6});")
  private val reSpaces = java.util.regex.Pattern.compile("[ \\t\\x0B\\f\\r]+")
  private val reNlSpace = java.util.regex.Pattern.compile(" ?\\n ?")
  private val reManyNl = java.util.regex.Pattern.compile("\\n{3,}")

  private def decodeNumeric(p: java.util.regex.Pattern, s: String, radix: Int): String = {
    val m = p.matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val cp = try Integer.parseInt(m.group(1), radix) catch { case _: Exception => -1 }
      val rep =
        if (cp >= 0x20 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
          java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
        else ""
      m.appendReplacement(sb, rep)
    }
    m.appendTail(sb)
    sb.toString
  }

  private[graft] def htmlText(html: String): String = {
    if (html == null) return null
    var s = reScript.matcher(html).replaceAll("")
    s = reComment.matcher(s).replaceAll("")
    s = reBlock.matcher(s).replaceAll("\n")
    s = reTag.matcher(s).replaceAll("")
    // entities AFTER tag strip so '&lt;b&gt;' never becomes a real tag
    s = s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&#39;", "'")
    s = decodeNumeric(reDec, s, 10)
    s = decodeNumeric(reHex, s, 16)
    s = s.replace("&amp;", "&") // LAST, per the HTML unescape order
    s = reSpaces.matcher(s).replaceAll(" ")
    s = reNlSpace.matcher(s).replaceAll("\n")
    s = reManyNl.matcher(s).replaceAll("\n\n")
    s.trim
  }

  // ---------------------------------------------------------------- loading
  def load(): Unit = {
    fn("token_count", I, Seq(S))(a => wsTokens(str(a(0))).length)
    fn("bpe_token_count", I, Seq(S)) { a =>
      // BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
      val m = reBpePretok.matcher(str(a(0)))
      var c = 0
      while (m.find()) c += 1
      c
    }
    fn("punct_ratio", D, Seq(S)) { a =>
      val s = str(a(0))
      if (s.isEmpty) 0.0
      else s.count(c => ".,!?;:'\"()-".indexOf(c) >= 0).toDouble / s.length.toDouble
    }
    fn("digit_ratio", D, Seq(S)) { a =>
      val s = str(a(0))
      if (s.isEmpty) 0.0 else s.count(_.isDigit).toDouble / s.length.toDouble
    }
    fn("upper_ratio", D, Seq(S)) { a =>
      val s = str(a(0))
      if (s.isEmpty) 0.0 else s.count(_.isUpper).toDouble / s.length.toDouble
    }
    fn("stopword_ratio", D, Seq(S)) { a =>
      val toks = wsTokens(normalize(str(a(0))))
      if (toks.isEmpty) 0.0
      else toks.count(stop("en").contains).toDouble / toks.length.toDouble
    }
    fn("mean_token_len", D, Seq(S)) { a =>
      val toks = wsTokens(str(a(0)))
      if (toks.isEmpty) 0.0 else toks.map(_.length).sum.toDouble / toks.length.toDouble
    }
    fn("char_entropy", D, Seq(S))(a => charEntropy(str(a(0))))
    fn("dup_ngram_frac", D, Seq(S, I))(a => dupNgramFrac(str(a(0)), int(a(1))))
    fn("line_stats",
      StructType(Seq(StructField("n_lines", I), StructField("max_len", I),
        StructField("mean_len", D))), Seq(S)) { a =>
      val (n, mx, mean) = lineStats(str(a(0)))
      new GenericInternalRow(Array[Any](n, mx, mean))
    }
    fn("gopher_stats",
      StructType(Seq(StructField("dup_line_frac", D), StructField("dup_line_char_frac", D),
        StructField("bullet_line_frac", D), StructField("ellipsis_line_frac", D),
        StructField("symbol_word_ratio", D), StructField("alpha_word_frac", D))), Seq(S)) { a =>
      new GenericInternalRow(gopherStats(str(a(0))).map(x => x: Any))
    }
    fn("url_normalize", S, Seq(S))(a => utf(urlNormalize(str(a(0)))))
    fn("hashed_ngrams", ArrayType(I), Seq(S, I, I))(a =>
      new GenericArrayData(hashedNgrams(str(a(0)), int(a(1)), int(a(2)))))
    fn("hash_bucket", I, Seq(S, I))(a => hashBucket(str(a(0)), int(a(1))))
    fn("chunk_text", ArrayType(S), Seq(S, I, I))(a =>
      new GenericArrayData(chunkText(str(a(0)), int(a(1)), int(a(2))).map(utf)))
    fn("lang_id", S, Seq(S))(a => utf(langId(str(a(0)))))
    fn("pii_emails", I, Seq(S))(a => countMatches(piiEmail, str(a(0))))
    fn("pii_phones", I, Seq(S))(a => countMatches(piiPhone, str(a(0))))
    fn("pii_ipv4", I, Seq(S))(a => countMatches(piiIpv4, str(a(0))))
    fn("pii_redact", S, Seq(S))(a => utf(piiRedact(str(a(0)))))
    fn("winnow_fingerprint", ArrayType(L), Seq(S, I, I))(a =>
      new GenericArrayData(winnow(str(a(0)), int(a(1)), int(a(2)))))
    fn("doc_fingerprint", L, Seq(S))(a => fingerprint(str(a(0))))
    fn("html_text", S, Seq(S))(a => utf(htmlText(str(a(0)))))
    fn("norm_text", S, Seq(S))(a => utf(normalize(str(a(0)))))
    // raw (non-distinct) normalized tokens — term frequencies need duplicates,
    // unlike word_ngrams' distinct sets
    fn("norm_tokens", ArrayType(S), Seq(S))(a =>
      new GenericArrayData(wsTokens(normalize(str(a(0)))).map(utf): Array[Any]))
    fn("char_shingles", ArrayType(S), Seq(S, I))(a =>
      new GenericArrayData(charShingles(str(a(0)), int(a(1))).map(utf): Array[Any]))
    fn("word_ngrams", ArrayType(S), Seq(S, I))(a =>
      new GenericArrayData(wordNgrams(str(a(0)), int(a(1))).map(utf): Array[Any]))
    fn("minhash", ArrayType(L), Seq(S, I, I, I))(a =>
      new GenericArrayData(minhash(str(a(0)), int(a(1)), int(a(2)), int(a(3))).map(x => x: Any)))
    fn("minhash_lsh_buckets", ArrayType(L), Seq(S, I, I, I, I))(a =>
      new GenericArrayData(minhashBands(str(a(0)), int(a(1)), int(a(2)), int(a(3)), int(a(4))).map(x => x: Any)))
    fn("simhash", L, Seq(S, I))(a => simhash(str(a(0)), int(a(1))))
    fn("jaccard_shingles", D, Seq(S, S, I))(a =>
      jaccard(charShingles(str(a(0)), int(a(2))), charShingles(str(a(1)), int(a(2)))))
    fn("jaccard_arrays", D, Seq(ArrayType(S), ArrayType(S))) { a =>
      def strs(x: Any): Array[String] =
        x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(S).map(v => if (v == null) null else v.toString)
      jaccard(strs(a(0)), strs(a(1)))
    }
    fn("jaccard_word_ngrams", D, Seq(S, S, I))(a =>
      jaccard(wordNgrams(str(a(0)), int(a(2))), wordNgrams(str(a(1)), int(a(2)))))
    fn("c4_keep_lines", ArrayType(S), Seq(S))(a =>
      new GenericArrayData(c4KeepLines(str(a(0))).map(utf): Array[Any]))
    fn("c4_page_ok", BooleanType, Seq(S))(a => c4PageOk(str(a(0))))
  }

  /** C4 line-level cleaning (Raffel et al. 2020 §2.2): a line survives iff it
   *  ends in a terminal punctuation mark (period, exclamation, question mark,
   *  end quote), contains at least 5 words, and does not mention "javascript".
   *  Lines are trimmed before the checks, matching the paper's sentence
   *  normalization. Row-local — parallelizes embarrassingly. */
  def c4KeepLines(text: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var from = 0
    while (from <= text.length) {
      val nl = text.indexOf('\n', from)
      val end = if (nl < 0) text.length else nl
      val l = text.substring(from, end).trim
      if (l.nonEmpty && ".!?\"".indexOf(l.charAt(l.length - 1)) >= 0 &&
        l.split("\\s+").length >= 5 &&
        !l.toLowerCase.contains("javascript")) out += l
      from = end + 1
    }
    out.toArray
  }

  /** C4 page-level filter: drop pages mentioning "lorem ipsum", containing a
   *  curly brace (code), or retaining fewer than 3 cleaned lines. The paper's
   *  bad-word page filter needs its published word list (not available
   *  offline); callers AND their own blocklist predicate on top. */
  def c4PageOk(text: String): Boolean = {
    val lower = text.toLowerCase
    !lower.contains("lorem ipsum") && text.indexOf('{') < 0 &&
      c4KeepLines(text).length >= 3
  }
}
