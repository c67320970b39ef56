package graft.matching

/**
 * WRatio-family fuzzy string scoring (J1) — reimplementation of the public
 * fuzzywuzzy/rapidfuzz scoring scheme used by the reference's matcher
 * (app/pipeline/matcher.py:64-69, scorer=fuzz.WRatio). Parity is asserted
 * on match DECISIONS (>=70 suggest / >=90 auto bands, SURVEY.md §2.12),
 * not on exact scores.
 *
 * All scores are 0..100 doubles.
 */
object Fuzzy {

  /** Python/rapidfuzz alphanumeric class: str.isalnum() = letters + ALL
    * Unicode numerics incl. Nl/No (e.g. '²'), wider than Java's
    * isLetterOrDigit (round-2 differential caught the gap on 'м²'). */
  private def isPyAlnum(c: Char): Boolean = {
    val t = Character.getType(c)
    Character.isLetter(c) || Character.isDigit(c) ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  /** default_process: lowercase, non-alphanumeric -> space, trim. */
  def process(s: String): String = {
    if (s == null) return ""
    val sb = new StringBuilder(s.length)
    s.foreach { c =>
      if (isPyAlnum(c)) sb.append(Character.toLowerCase(c))
      else sb.append(' ')
    }
    sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** Longest common subsequence length (O(mn), names are short). */
  private def lcs(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        cur(j + 1) = if (a.charAt(i) == b.charAt(j)) prev(j) + 1
        else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length)
  }

  /** Indel-normalized similarity x100 (rapidfuzz fuzz.ratio). */
  def ratio(a: String, b: String): Double = {
    val n = a.length + b.length
    if (n == 0) return 100.0
    100.0 * (2.0 * lcs(a, b)) / n
  }

  /** Best ratio of the shorter string vs any same-length window of the
    * longer (exhaustive sliding window — superset of rapidfuzz's
    * block-anchored candidates, deterministic). */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    if (s.length == l.length) return ratio(s, l)
    var best = 0.0
    var i = 0
    while (i <= l.length - s.length && best < 100.0) {
      val w = l.substring(i, i + s.length)
      val r = ratio(s, w)
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def sortedTokens(s: String): Array[String] = s.split(" ").filter(_.nonEmpty).sorted

  def tokenSortRatio(a: String, b: String): Double =
    ratio(sortedTokens(a).mkString(" "), sortedTokens(b).mkString(" "))

  def partialTokenSortRatio(a: String, b: String): Double =
    partialRatio(sortedTokens(a).mkString(" "), sortedTokens(b).mkString(" "))

  private def tokenSetParts(a: String, b: String): (String, String, String) = {
    val ta = sortedTokens(a).toSet
    val tb = sortedTokens(b).toSet
    val inter = (ta intersect tb).toSeq.sorted.mkString(" ")
    val diffA = (ta diff tb).toSeq.sorted.mkString(" ")
    val diffB = (tb diff ta).toSeq.sorted.mkString(" ")
    val combA = if (inter.isEmpty) diffA else if (diffA.isEmpty) inter else s"$inter $diffA"
    val combB = if (inter.isEmpty) diffB else if (diffB.isEmpty) inter else s"$inter $diffB"
    (inter, combA, combB)
  }

  def tokenSetRatio(a: String, b: String): Double = {
    val (inter, combA, combB) = tokenSetParts(a, b)
    if (inter.nonEmpty && (combA == inter || combB == inter)) return 100.0
    Seq(ratio(inter, combA), ratio(inter, combB), ratio(combA, combB)).max
  }

  def partialTokenSetRatio(a: String, b: String): Double = {
    val (inter, combA, combB) = tokenSetParts(a, b)
    if (inter.nonEmpty) return 100.0
    // empty intersection -> compare the DEDUPLICATED sorted diff strings
    // (the token_set family is set-based; round-2 differential vs the
    // published spec caught the duplicate-keeping variant scoring 6.75 high)
    partialRatio(combA, combB)
  }

  /** WRatio (fuzzywuzzy/rapidfuzz weighted composite). Inputs are
    * preprocessed internally, like rapidfuzz's default processor. */
  def wratio(rawA: String, rawB: String): Double = {
    val a = process(rawA)
    val b = process(rawB)
    if (a.isEmpty || b.isEmpty) return 0.0
    val unbaseScale = 0.95
    val lenRatio = math.max(a.length, b.length).toDouble / math.min(a.length, b.length)
    var end = ratio(a, b)
    if (lenRatio < 1.5) {
      val tok = math.max(tokenSortRatio(a, b), tokenSetRatio(a, b))
      math.max(end, tok * unbaseScale)
    } else {
      val partialScale = if (lenRatio < 8.0) 0.9 else 0.6
      end = math.max(end, partialRatio(a, b) * partialScale)
      val ptok = math.max(partialTokenSortRatio(a, b), partialTokenSetRatio(a, b))
      math.max(end, ptok * unbaseScale * partialScale)
    }
  }
}
