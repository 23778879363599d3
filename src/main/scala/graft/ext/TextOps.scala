package graft.ext

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static kernels for the LLM-data-pipeline operators (dedup, similarity,
 * text analysis). Deterministic by construction — no RNG state, all hash
 * mixing via fixed 64-bit constants (splitmix64, public domain algorithm).
 * Java-callable for Catalyst codegen, same pattern as graft.core.GeoOps.
 */
object TextOps {

  // splitmix64 finalizer — the standard public-domain 64-bit mixer
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct rolling-hash values of all char k-grams (shingle set). */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    if (s.length < k) return new GenericArrayData(
      if (s.isEmpty) Array.empty[Long] else Array(mix64(s.hashCode.toLong)))
    val B = 0x100000001b3L // FNV-ish odd base
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val seen = new java.util.HashSet[java.lang.Long]()
    var h = 0L
    i = 0
    while (i < s.length) {
      h = h * B + s.charAt(i)
      if (i >= k - 1) {
        seen.add(mix64(h))
        h -= pow * s.charAt(i - k + 1) // slide: drop leading char (weight B^(k-1))
      }
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator; var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out) // determinism independent of set order
    new GenericArrayData(out)
  }

  /** Word shingles (n-gram over whitespace tokens), hashed. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(
      if (toks.isEmpty) Array.empty[Long] else Array(mix64(toks.mkString(" ").hashCode.toLong)))
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + n <= toks.length) {
      var h = 0L
      var j = i
      while (j < i + n) { h = h * 0x100000001b3L + toks(j).hashCode; j += 1 }
      seen.add(mix64(h))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator; var j2 = 0
    while (it.hasNext) { out(j2) = it.next(); j2 += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /**
   * Positional word k-gram 128-bit keys: one inner `[h1, h2]` array per
   * token window, in document order (NOT a distinct set — repeats and
   * positions matter for span detection), with zero gram-string
   * allocation. Tokenization is char-for-char identical to
   * [[TextAnalysis.wordTokens]] (the family's one shared tokenizer
   * expression): `\s+` runs of the lowercased text delimit tokens,
   * empties dropped — change either side only together.
   * Each token is hashed once (64-bit FNV-1a over its UTF-16 chars, plus
   * a splitmix64-decorrelated twin); each window chains the k token
   * hashes through two independent multiply-accumulate chains with a
   * final splitmix64, so (h1, h2) is an effectively-128-bit key —
   * birthday bound ~2^64 distinct grams, same as the boilerplate line
   * keys (SCALE.md). Fewer than k tokens -> empty array.
   */
  def wordShinglePairs(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString // UTF8String lowering: locale-free
    val len = s.length
    // pass 1: per-token hash twins, no token strings materialized
    var t1 = new Array[Long](8); var t2 = new Array[Long](8)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !isRegexWs(s.charAt(i))) {
          h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1
        }
        if (m == t1.length) {
          t1 = java.util.Arrays.copyOf(t1, m * 2)
          t2 = java.util.Arrays.copyOf(t2, m * 2)
        }
        t1(m) = h; t2(m) = mix64(h ^ 0x6a09e667f3bcc908L); m += 1
      }
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // pass 2: two independent chains per window (k is small; a rolling
    // formulation would need modular inverses for no measurable win)
    val out = new Array[Any](m - n + 1)
    var w = 0
    while (w + n <= m) {
      var h1 = 0xcbf29ce484222325L; var h2 = 0x9e3779b97f4a7c15L
      var j = w
      while (j < w + n) {
        h1 = (h1 ^ t1(j)) * 0x100000001b3L
        h2 = h2 * 0xc2b2ae3d27d4eb4fL + t2(j)
        j += 1
      }
      out(w) = new GenericArrayData(Array(mix64(h1), mix64(h2)))
      w += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Per-document n-gram repetition statistics in ONE pass, no gram
   * strings and no shuffle: returns [top_chars, dup_chars, denom] where
   * top_chars = max over word-n-grams of count × gramCharLen,
   * dup_chars = Σ count × gramCharLen over grams with count ≥ 2, and
   * denom = the char length of the space-joined lowercased token stream
   * (Σ token code points + m−1). gramCharLen counts the joined form
   * (token code points + n−1 separators), so top_chars/denom and
   * dup_chars/denom are exactly the Gopher repetition fractions before
   * their 1.0 clamp. Fewer than n tokens → [0, 0, denom].
   *
   * Counting key is one 64-bit FNV-over-token-hash chain + splitmix64:
   * counting is WITHIN a document, so the birthday bound is per-doc
   * (g grams → g²/2⁶⁵; a 10⁶-token doc ≈ 5e-8), not corpus-wide —
   * unlike q113's corpus-global keys, 64 bits is the right size here.
   */
  def ngramCharStats(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val len = s.length
    var th = new Array[Long](8); var tc = new Array[Int](8)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isRegexWs(s.charAt(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L; var cp = 0
        while (i < len && !isRegexWs(s.charAt(i))) {
          val c = s.charAt(i)
          h = (h ^ c) * 0x100000001b3L
          if (!Character.isLowSurrogate(c)) cp += 1 // code points, not UTF-16 units
          i += 1
        }
        if (m == th.length) {
          th = java.util.Arrays.copyOf(th, m * 2)
          tc = java.util.Arrays.copyOf(tc, m * 2)
        }
        th(m) = h; tc(m) = cp; m += 1
      }
    }
    var denom = 0L
    var j = 0
    while (j < m) { denom += tc(j); j += 1 }
    if (m > 0) denom += m - 1
    if (m < n) return new GenericArrayData(Array(0L, 0L, denom))
    // HashMap value = [count, gramCharLen] (len identical for equal grams)
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var w = 0
    while (w + n <= m) {
      var h1 = 0xcbf29ce484222325L
      var glen = (n - 1).toLong
      var k = w
      while (k < w + n) {
        h1 = (h1 ^ th(k)) * 0x100000001b3L; glen += tc(k); k += 1
      }
      val key = java.lang.Long.valueOf(mix64(h1)) // one mix + one box per window
      val e = counts.get(key)
      if (e == null) counts.put(key, Array(1L, glen)) else e(0) += 1
      w += 1
    }
    var top = 0L; var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next(); val mass = e(0) * e(1)
      if (mass > top) top = mass
      if (e(0) >= 2) dup += mass
    }
    new GenericArrayData(Array(top, dup, denom))
  }

  /**
   * MinHash signature via the Kirsch-Mitzenmacher construction
   * (public result from "Less Hashing, Same Performance", 2006):
   * h_j(x) = h1(x) + j*h2(x) with two independent 64-bit mixes — the j-loop
   * is add+compare only, ~10x cheaper than n independent mixes while
   * preserving the MinHash collision property. One pass over the shingle
   * set, n mins in a local array, no allocation beyond the output.
   */
  def minhash(shingleSet: ArrayData, n: Int): ArrayData = {
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = shingleSet.numElements()
    var i = 0
    while (i < m) {
      val x = shingleSet.getLong(i)
      val h1 = mix64(x)
      val h2 = mix64(x ^ 0x9e3779b97f4a7c15L) | 1L // odd increment
      var h = h1
      var j = 0
      while (j < n) {
        if (h < sig(j)) sig(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Fraction of equal minhash components — the Jaccard estimator. */
  def sigSimilarity(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  /** 64-bit SimHash over word tokens (unit weights). */
  def simhash(text: UTF8String): Long = {
    val toks = text.toString.toLowerCase.split("\\W+")
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = mix64(toks(i).hashCode.toLong)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // the \s class of java.util.regex (NOT Character.isWhitespace's superset)
  private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace token count — O(n) scan EXACTLY equivalent to
    * `size(split(trim(text), "\\s+"))`: trim strips spaces only;
    * split keeps one leading/trailing empty token around \s runs;
    * split("") yields [""] (count 1). */
  def tokenCount(text: UTF8String): Int = {
    val s = text.toString
    var i = 0; var end = s.length
    while (i < end && s.charAt(i) == ' ') i += 1       // trim = spaces only
    while (end > i && s.charAt(end - 1) == ' ') end -= 1
    if (i >= end) return 1 // split("") -> [""]
    var count = 0; var inTok = false
    if (isRegexWs(s.charAt(i))) count += 1       // leading empty token
    var j = i
    while (j < end) {
      val ws = isRegexWs(s.charAt(j))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      j += 1
    }
    if (isRegexWs(s.charAt(end - 1))) count += 1 // trailing empty token
    count
  }

  /** Whole-token occurrence count: how many \s+-delimited tokens of `text`
    * equal `term` — O(n) scan, EXACTLY equivalent to
    * `size(filter(split(text, "\\s+"), x -> x == term))` for nonempty
    * terms, with no array materialization (the BM25 tf kernel). */
  def tokenOccurrences(text: UTF8String, term: UTF8String): Int = {
    val s = text.toString; val t = term.toString
    if (t.isEmpty) return 0
    val n = s.length
    var i = 0; var count = 0
    while (i < n) {
      while (i < n && isRegexWs(s.charAt(i))) i += 1
      var j = i
      while (j < n && !isRegexWs(s.charAt(j))) j += 1
      if (j - i == t.length && s.regionMatches(i, t, 0, t.length)) count += 1
      i = j
    }
    count
  }

  /** BPE-ish subword count — O(n) scan equivalent to counting matches of
    * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (letter runs, digit runs, single
    * other symbols), with no array materialization. */
  def bpeCount(text: UTF8String): Int = {
    val s = text.toString
    var i = 0; val n = s.length
    var count = 0
    var mode = 0 // 0 = none, 1 = letters, 2 = digits
    while (i < n) {
      val c = s.charAt(i)
      val isL = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
      val isD = c >= '0' && c <= '9'
      if (isL) { if (mode != 1) { count += 1; mode = 1 } }
      else if (isD) { if (mode != 2) { count += 1; mode = 2 } }
      else {
        mode = 0
        if (!Character.isWhitespace(c)) count += 1
      }
      i += 1
    }
    count
  }

  /** Intersection size of two SORTED long arrays (linear merge, zero
    * allocation) — the shingle/gram sets from [[shingles]]/[[wordShingles]]
    * are emitted sorted, so set-similarity verification never needs the
    * hash-set building of Spark's array_intersect. Jaccard follows as
    * c / (|A| + |B| - c). */
  def sortedOverlap(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Rabin-Karp rolling hash of the whole document → 64-bit fingerprint. */
  def fingerprint(text: UTF8String): Long = {
    val s = text.toString
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  // ---- language id: n-gram/stopword heuristic over small public profiles ----
  private val profiles: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on", "at", "this"),
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "für", "von", "den", "im", "zu"),
    "fr" -> Array("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que", "pour", "pas", "sur", "avec", "au"),
    "es" -> Array("el", "la", "los", "las", "y", "es", "un", "una", "en", "que", "de", "no", "por", "con", "para"),
    "it" -> Array("il", "la", "che", "e", "di", "un", "una", "per", "non", "sono", "con", "del", "si", "mi", "ma"),
    "pt" -> Array("o", "a", "os", "as", "e", "é", "um", "uma", "em", "que", "de", "não", "por", "com", "para"),
    "nl" -> Array("de", "het", "een", "en", "van", "is", "dat", "op", "te", "zijn", "met", "voor", "niet", "aan", "er"))
  private val profileSets: Array[(String, java.util.HashSet[String])] =
    profiles.map { case (l, ws) =>
      val s = new java.util.HashSet[String](); ws.foreach(s.add); l -> s
    }

  /**
   * Heuristic language id: CJK/Cyrillic/Arabic by script ranges, otherwise
   * argmax of stopword hits (ties broken by profile order; "und" if none).
   */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    var cjk = 0; var cyr = 0; var ar = 0; var letters = 0
    var i = 0
    while (i < s.length && i < 2000) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
        else if (c >= 0x0400 && c <= 0x04ff) cyr += 1
        else if (c >= 0x0600 && c <= 0x06ff) ar += 1
      }
      i += 1
    }
    if (letters > 0) {
      if (cjk * 2 > letters) return UTF8String.fromString("zh")
      if (cyr * 2 > letters) return UTF8String.fromString("ru")
      if (ar * 2 > letters) return UTF8String.fromString("ar")
    }
    val toks = s.toLowerCase.split("\\W+")
    var best = "und"; var bestHits = 0
    var p = 0
    while (p < profileSets.length) {
      val (lang, set) = profileSets(p)
      var hits = 0; var t = 0
      while (t < toks.length && t < 500) { if (set.contains(toks(t))) hits += 1; t += 1 }
      if (hits > bestHits) { best = lang; bestHits = hits }
      p += 1
    }
    UTF8String.fromString(best)
  }

  /**
   * Unicode NFC canonical composition (java.text.Normalizer — the JDK's
   * implementation of UAX #15, the same public spec DuckDB's
   * nfc_normalize implements). ASCII fast path: NFC is the identity on
   * ASCII, so the common case skips the UTF8String→String decode
   * entirely; non-ASCII strings that are ALREADY NFC (most real text)
   * return the input buffer after the isNormalized scan, no re-encode.
   */
  def nfcNormalize(text: UTF8String): UTF8String = {
    if (text.isFullAscii) return text
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /**
   * Jaro-Winkler similarity — the classic Winkler variant (match
   * window floor(max/2)-1, half-transpositions, prefix boost l<=4 at
   * p=0.1 applied only when jaro > 0.7), which is exactly what DuckDB's
   * `jaro_winkler_similarity` computes (verified case-by-case against
   * it, including the boost-threshold-sensitive cases). Operates on
   * CODE POINTS, so astral chars compare as one symbol. O(|a|·window)
   * time, two small int arrays per call.
   */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    // empty-FIRST: DuckDB scores two empty strings 0.0, not 1.0
    // (pinned by the 3000-pair fuzz against jaro_winkler_similarity)
    if (s1.length == 0 || s2.length == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val w = math.max(math.max(s1.length, s2.length) / 2 - 1, 0)
    val m1 = new Array[Boolean](s1.length)
    val m2 = new Array[Boolean](s2.length)
    var m = 0
    var i = 0
    while (i < s1.length) {
      val lo = math.max(0, i - w)
      val hi = math.min(s2.length, i + w + 1)
      var k = lo
      var done = false
      while (k < hi && !done) {
        if (!m2(k) && s2(k) == s1(i)) {
          m1(i) = true; m2(k) = true; m += 1; done = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < s1.length) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    // HALF-transpositions FLOORED (integer division) — the rapidfuzz/
    // DuckDB convention; t/2.0 diverges whenever the mismatch count is
    // odd (caught by the gate: 'Customer#000001120' vs its X-twin has
    // t = 3)
    val tr = (t / 2).toDouble
    val md = m.toDouble
    val jaro = (md / s1.length + md / s2.length + (md - tr) / md) / 3.0
    var l = 0
    while (l < 4 && l < s1.length && l < s2.length && s1(l) == s2(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }

  // ---- float-vector kernels (embeddings are ArrayType(FloatType)) ----
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def normF(a: ArrayData): Double = math.sqrt(dotF(a, a))

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val na = normF(a); val nb = normF(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dotF(a, b) / (na * nb)
  }

  /**
   * Random-hyperplane LSH signature: bit i = sign(dot(v, r_i)) with
   * deterministic pseudo-gaussian planes derived from (seed, i, dim) via
   * splitmix64 (sum of two uniforms, symmetric around 0).
   */
  def hyperplaneSig(v: ArrayData, nbits: Int, seed: Long): Long = {
    val d = v.numElements()
    var sig = 0L
    var b = 0
    while (b < nbits) {
      var s = 0.0
      var i = 0
      while (i < d) {
        val h = mix64(seed ^ (b.toLong << 32) ^ i.toLong)
        // uniform in [-1, 1): deterministic plane component
        val r = (h.toDouble / Long.MaxValue.toDouble)
        s += v.getFloat(i) * r
        i += 1
      }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
