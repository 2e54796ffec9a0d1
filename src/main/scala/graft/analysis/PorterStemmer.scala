package graft.analysis

/** Porter stemming algorithm (Porter, 1980 — public specification),
  * the reference's PorterStemFilter
  * [U lucene/analysis/common/.../en/PorterStemFilter.java;
  * SURVEY.md §2.2 P1]. Implemented from the published rules, steps
  * 1a-5b, with the standard measure/vowel machinery. */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length < 3) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w)
    w = step5a(w); w = step5b(w)
    w
  }

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in [C](VC){m}[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceIf(w: String, suffix: String, repl: String,
                        cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(w)
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else {
      val matched =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      matched match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1)))
      w.dropRight(1) + "i"
    else w

  /** Step-2 suffix map. Two deliberate departures from the published
    * 1980 rules, matching Lucene's PorterStemmer (marked DEPARTURE in
    * [U lucene/analysis/common/.../en/PorterStemmer.java]):
    * "bli"→"ble" (generalizes "abli"→"able") and "logi"→"log" — so
    * e.g. possibly→possibl and biology→biolog as in the reference. */
  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "bli" -> "ble", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
    "logi" -> "log")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def applyRules(w: String, rules: Seq[(String, String)],
                         minMeasure: Int): String = {
    rules.foreach { case (suf, rep) =>
      if (w.endsWith(suf)) {
        val stem = w.dropRight(suf.length)
        return if (measure(stem) > minMeasure - 1) stem + rep else w
      }
    }
    w
  }

  private def step2(w: String): String = applyRules(w, step2Rules, 1)
  private def step3(w: String): String = applyRules(w, step3Rules, 1)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String = {
    // special case: -ion only after s or t
    if (w.endsWith("ion")) {
      val stem = w.dropRight(3)
      if (stem.nonEmpty && (stem.last == 's' || stem.last == 't') &&
        measure(stem) > 1) return stem
    }
    step4Suffixes.foreach { suf =>
      if (w.endsWith(suf) && suf != "ion") {
        val stem = w.dropRight(suf.length)
        return if (measure(stem) > 1) stem else w
      }
    }
    w
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l"))
      w.dropRight(1)
    else w
}
