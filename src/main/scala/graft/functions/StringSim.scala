package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM string similarity kernels.
  *
  * Semantics mirror the reference engine's comparison contract
  * (`/root/reference/src/gammas/gammaCKpar.jl:59-129`): every function returns
  * a similarity normalized to [0,1] (1 = identical), like
  * StringDistances.jl's `compare`. The caller applies the reference's
  * 4-digit rounding (`gammaCKpar.jl:103`) and cut_a/cut_b thresholds.
  *
  * All methods are static so Catalyst codegen (see expressions.scala) can
  * call them from generated Java inside whole-stage codegen.
  */
object StringSim {

  /** Classic Jaro similarity. Both-empty => 1.0 (StringDistances.jl
    * convention: the distance between two empty strings is 0).
    */
  def jaro(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val maxLen = math.max(len1, len2)
    val window = math.max(maxLen / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val c = s1.charAt(i)
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && c == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - t / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler similarity: Winkler prefix boost (scaling `p`, prefix
    * capped at 4) applied when jaro >= 0.7 (StringDistances.jl:
    * `JaroWinkler(p, threshold=0.3, maxlength=4)`, boost when distance <=
    * threshold). The reference's `jarowinkler` method uses p = config `w`
    * (default 0.1).
    */
  def jaroWinkler(s1: String, s2: String, p: Double): Double = {
    val j = jaro(s1, s2)
    if (j >= 0.7) {
      val maxPrefix = math.min(math.min(s1.length, s2.length), 4)
      var l = 0
      while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * p * (1.0 - j)
    } else j
  }

  /** Levenshtein edit distance (insert/delete/substitute), two-row DP. */
  def levenshteinDist(s1: String, s2: String): Int = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0) return len2
    if (len2 == 0) return len1
    var prev = new Array[Int](len2 + 1)
    var cur = new Array[Int](len2 + 1)
    var j = 0
    while (j <= len2) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= len1) {
      cur(0) = i
      val c1 = s1.charAt(i - 1)
      j = 1
      while (j <= len2) {
        val cost = if (c1 == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(len2)
  }

  /** Normalized Levenshtein similarity = 1 - dist / max(len); both-empty => 1. */
  def levenshteinSim(s1: String, s2: String): Double = {
    val maxLen = math.max(s1.length, s2.length)
    if (maxLen == 0) 1.0
    else 1.0 - levenshteinDist(s1, s2).toDouble / maxLen
  }

  /** Optimal String Alignment (restricted Damerau-Levenshtein: adjacent
    * transposition, no substring edited twice).
    */
  def osaDist(s1: String, s2: String): Int = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0) return len2
    if (len2 == 0) return len1
    var prev2 = new Array[Int](len2 + 1)
    var prev = new Array[Int](len2 + 1)
    var cur = new Array[Int](len2 + 1)
    var j = 0
    while (j <= len2) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= len1) {
      cur(0) = i
      val c1 = s1.charAt(i - 1)
      j = 1
      while (j <= len2) {
        val cost = if (c1 == s2.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && c1 == s2.charAt(j - 2) && s1.charAt(i - 2) == s2.charAt(j - 1))
          d = math.min(d, prev2(j - 2) + 1)
        cur(j) = d
        j += 1
      }
      val tmp = prev2; prev2 = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(len2)
  }

  def osaSim(s1: String, s2: String): Double = {
    val maxLen = math.max(s1.length, s2.length)
    if (maxLen == 0) 1.0 else 1.0 - osaDist(s1, s2).toDouble / maxLen
  }

  /** Unrestricted Damerau-Levenshtein (true DL, with alphabet table). */
  def damerauLevenshteinDist(s1: String, s2: String): Int = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0) return len2
    if (len2 == 0) return len1
    val inf = len1 + len2
    val d = Array.ofDim[Int](len1 + 2, len2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= len1) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= len2) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val lastRow = new java.util.HashMap[Char, Int]()
    i = 1
    while (i <= len1) {
      val c1 = s1.charAt(i - 1)
      var lastMatchCol = 0
      j = 1
      while (j <= len2) {
        val c2 = s2.charAt(j - 1)
        val last = lastRow.getOrDefault(c2, 0)
        val cost = if (c1 == c2) 0 else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(last)(lastMatchCol) + (i - last - 1) + 1 + (j - lastMatchCol - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        if (cost == 0) lastMatchCol = j
        j += 1
      }
      lastRow.put(c1, i)
      i += 1
    }
    d(len1 + 1)(len2 + 1)
  }

  def damerauLevenshteinSim(s1: String, s2: String): Double = {
    val maxLen = math.max(s1.length, s2.length)
    if (maxLen == 0) 1.0 else 1.0 - damerauLevenshteinDist(s1, s2).toDouble / maxLen
  }

  /** Hamming similarity (StringDistances.jl convention): distance = #unequal
    * positions over the shorter length + length difference; normalized by
    * the longer length.
    */
  def hammingSim(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    val maxLen = math.max(len1, len2)
    if (maxLen == 0) return 1.0
    val minLen = math.min(len1, len2)
    var d = maxLen - minLen
    var i = 0
    while (i < minLen) {
      if (s1.charAt(i) != s2.charAt(i)) d += 1
      i += 1
    }
    1.0 - d.toDouble / maxLen
  }

  /** Ratcliff-Obershelp (gestalt pattern matching) similarity:
    * 2 * (matched chars via recursive longest-common-substring) / (len1+len2).
    */
  def ratcliffObershelpSim(s1: String, s2: String): Double = {
    val total = s1.length + s2.length
    if (total == 0) return 1.0
    2.0 * roMatches(s1, 0, s1.length, s2, 0, s2.length) / total
  }

  private def roMatches(s1: String, a0: Int, a1: Int, s2: String, b0: Int, b1: Int): Int = {
    if (a0 >= a1 || b0 >= b1) return 0
    // longest common substring in s1[a0,a1) x s2[b0,b1)
    var bestLen = 0; var bestA = a0; var bestB = b0
    var i = a0
    while (i < a1) {
      var j = b0
      while (j < b1) {
        if (s1.charAt(i) == s2.charAt(j)) {
          var k = 0
          while (i + k < a1 && j + k < b1 && s1.charAt(i + k) == s2.charAt(j + k)) k += 1
          if (k > bestLen) { bestLen = k; bestA = i; bestB = j }
        }
        j += 1
      }
      i += 1
    }
    if (bestLen == 0) 0
    else bestLen +
      roMatches(s1, a0, bestA, s2, b0, bestB) +
      roMatches(s1, bestA + bestLen, a1, s2, bestB + bestLen, b1)
  }

  // ---- allocation-free ASCII fast path ----
  // The gamma stage evaluates one of these per candidate pair per fuzzy
  // variable — at 10^8+ pairs the UTF8String->String conversion (2 allocs +
  // copies per call) and the per-call boolean match arrays dominate. For
  // full-ASCII inputs we work directly on the UTF8String bytes with
  // thread-local scratch buffers (safe: Spark evaluates expressions
  // single-threaded per task).
  private final val ScratchCap = 4096
  private val scratch1 = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](ScratchCap)
  }
  private val scratch2 = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](ScratchCap)
  }

  // Bit-parallel Jaro for ASCII strings up to 64 bytes: per-character
  // occurrence bitmasks of s2 turn the O(len1 x window) nested matching
  // scan into O(len1) constant-time bit ops (lowest set bit in the window
  // mask = the first unmatched candidate — exactly the greedy order of the
  // classic loop, so matches, transpositions and the final double are
  // bit-identical). The 256-entry mask table is thread-local and cleared
  // surgically (only s2's bytes) after use. Measured ~5x over the
  // boolean-scratch loop on the 40-60 byte titles that dominate the link
  // bench's comparison phase.
  private val occTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }

  /** Jaro over raw ASCII bytes; caller guarantees ascii and lengths in
    * 1..64 on both sides.
    */
  private def jaroAsciiBit(s1: UTF8String, s2: UTF8String): Double = {
    val len1 = s1.numBytes()
    val len2 = s2.numBytes()
    val occ = occTL.get()
    var j = 0
    while (j < len2) { occ(s2.getByte(j) & 0xff) |= (1L << j); j += 1 }
    val maxLen = if (len1 > len2) len1 else len2
    val window = math.max(maxLen / 2 - 1, 0)
    var matched1 = 0L
    var matched2 = 0L
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = if (i > window) i - window else 0
      val hi = math.min(len2 - 1, i + window)
      if (hi >= lo) {
        val range =
          if (hi >= 63) -1L << lo
          else ((1L << (hi + 1)) - 1) & (-1L << lo)
        val cand = occ(s1.getByte(i) & 0xff) & range & ~matched2
        if (cand != 0L) {
          matched2 |= cand & -cand // lowest candidate = first unmatched j
          matched1 |= 1L << i
          matches += 1
        }
      }
      i += 1
    }
    j = 0
    while (j < len2) { occ(s2.getByte(j) & 0xff) = 0L; j += 1 }
    if (matches == 0) return 0.0
    // transpositions: k-th matched char of s1 vs k-th matched char of s2
    var t = 0
    var mm1 = matched1
    var mm2 = matched2
    while (mm1 != 0L) {
      val i1 = java.lang.Long.numberOfTrailingZeros(mm1)
      val j1 = java.lang.Long.numberOfTrailingZeros(mm2)
      if (s1.getByte(i1) != s2.getByte(j1)) t += 1
      mm1 &= mm1 - 1
      mm2 &= mm2 - 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - t / 2.0) / m) / 3.0
  }

  /** Jaro over raw ASCII bytes; caller guarantees isFullAscii on both. */
  private def jaroAscii(s1: UTF8String, s2: UTF8String): Double = {
    if (s1.numBytes() <= 64 && s2.numBytes() <= 64 &&
        s1.numBytes() > 0 && s2.numBytes() > 0)
      return jaroAsciiBit(s1, s2)
    val len1 = s1.numBytes()
    val len2 = s2.numBytes()
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    if (len1 > ScratchCap || len2 > ScratchCap)
      return jaro(s1.toString, s2.toString)
    val maxLen = math.max(len1, len2)
    val window = math.max(maxLen / 2 - 1, 0)
    val m1 = scratch1.get()
    val m2 = scratch2.get()
    java.util.Arrays.fill(m1, 0, len1, false)
    java.util.Arrays.fill(m2, 0, len2, false)
    var matches = 0
    var i = 0
    while (i < len1) {
      val c = s1.getByte(i)
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && c == s2.getByte(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.getByte(i) != s2.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - t / 2.0) / m) / 3.0
  }

  /** Cheap ASCII check (single pass over the bytes; avoids UTF8String's
    * isFullAscii bookkeeping which showed up in profiles).
    */
  private def asciiOnly(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  // ---- UTF8String entry points for Catalyst codegen ----
  def jaroWinklerUTF8(a: UTF8String, b: UTF8String, p: Double): Double = {
    if (a.equals(b)) return 1.0 // exact match: jw = 1 regardless of p
    if (asciiOnly(a) && asciiOnly(b)) {
      val j = jaroAscii(a, b)
      if (j >= 0.7) {
        val maxPrefix = math.min(math.min(a.numBytes(), b.numBytes()), 4)
        var l = 0
        while (l < maxPrefix && a.getByte(l) == b.getByte(l)) l += 1
        j + l * p * (1.0 - j)
      } else j
    } else jaroWinkler(a.toString, b.toString, p)
  }
  def jaroUTF8(a: UTF8String, b: UTF8String): Double =
    if (a.equals(b)) 1.0
    else if (asciiOnly(a) && asciiOnly(b)) jaroAscii(a, b)
    else jaro(a.toString, b.toString)
  private val scratchInt1 = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](ScratchCap + 1)
  }
  private val scratchInt2 = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](ScratchCap + 1)
  }

  // Myers/Hyyrö bit-parallel Levenshtein (exact): the pattern (shorter
  // side, <= 64 bytes) becomes per-character occurrence bitmasks and each
  // text byte advances the whole DP column in ~15 word ops — O(n) total vs
  // the two-row DP's O(n*m). Canonical Hyyrö (2001) recurrence;
  // parity-pinned against the DP in StringSimSpec.
  private val peqTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }

  /** Exact Levenshtein distance; caller guarantees ascii on both and
    * 1 <= p.numBytes <= 64 (p = pattern, t = text).
    */
  private def levMyers(p: UTF8String, t: UTF8String): Int = {
    val m = p.numBytes()
    val n = t.numBytes()
    val peq = peqTL.get()
    var i = 0
    while (i < m) { peq(p.getByte(i) & 0xff) |= (1L << i); i += 1 }
    val highBit = 1L << (m - 1)
    var pv = if (m == 64) -1L else (1L << m) - 1
    var mv = 0L
    var score = m
    var j = 0
    while (j < n) {
      val eq = peq(t.getByte(j) & 0xff)
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      val mh = pv & xh
      if ((ph & highBit) != 0L) score += 1
      if ((mh & highBit) != 0L) score -= 1
      ph = (ph << 1) | 1L
      pv = (mh << 1) | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    i = 0
    while (i < m) { peq(p.getByte(i) & 0xff) = 0L; i += 1 }
    score
  }

  def levenshteinSimUTF8(a: UTF8String, b: UTF8String): Double = {
    if (a.equals(b)) return 1.0
    if (asciiOnly(a) && asciiOnly(b) &&
        a.numBytes() <= ScratchCap && b.numBytes() <= ScratchCap) {
      val len1 = a.numBytes()
      val len2 = b.numBytes()
      if (len1 > 0 && len2 > 0 && math.min(len1, len2) <= 64) {
        val d = if (len1 <= len2) levMyers(a, b) else levMyers(b, a)
        return 1.0 - d.toDouble / math.max(len1, len2)
      }
      val maxLen = math.max(len1, len2)
      if (maxLen == 0) return 1.0
      if (len1 == 0 || len2 == 0) return 1.0 - maxLen.toDouble / maxLen // 0.0
      var prev = scratchInt1.get()
      var cur = scratchInt2.get()
      var j = 0
      while (j <= len2) { prev(j) = j; j += 1 }
      var i = 1
      while (i <= len1) {
        cur(0) = i
        val c1 = a.getByte(i - 1)
        j = 1
        while (j <= len2) {
          val cost = if (c1 == b.getByte(j - 1)) 0 else 1
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
          j += 1
        }
        val tmp = prev; prev = cur; cur = tmp
        i += 1
      }
      1.0 - prev(len2).toDouble / maxLen
    } else levenshteinSim(a.toString, b.toString)
  }
  private val scratchInt3 = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](ScratchCap + 1)
  }

  def osaSimUTF8(a: UTF8String, b: UTF8String): Double = {
    if (a.equals(b)) return 1.0
    if (asciiOnly(a) && asciiOnly(b) &&
        a.numBytes() <= ScratchCap && b.numBytes() <= ScratchCap) {
      val len1 = a.numBytes()
      val len2 = b.numBytes()
      val maxLen = math.max(len1, len2)
      if (maxLen == 0) return 1.0
      if (len1 == 0 || len2 == 0) return 0.0
      var prev2 = scratchInt1.get()
      var prev = scratchInt2.get()
      var cur = scratchInt3.get()
      var j = 0
      while (j <= len2) { prev(j) = j; j += 1 }
      var i = 1
      while (i <= len1) {
        cur(0) = i
        val c1 = a.getByte(i - 1)
        j = 1
        while (j <= len2) {
          val cost = if (c1 == b.getByte(j - 1)) 0 else 1
          var d = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
          if (i > 1 && j > 1 && c1 == b.getByte(j - 2) && a.getByte(i - 2) == b.getByte(j - 1))
            d = math.min(d, prev2(j - 2) + 1)
          cur(j) = d
          j += 1
        }
        val tmp = prev2; prev2 = prev; prev = cur; cur = tmp
        i += 1
      }
      1.0 - prev(len2).toDouble / maxLen
    } else osaSim(a.toString, b.toString)
  }

  // Unrestricted DL needs a full (len1+2)x(len2+2) matrix; cap the scratch
  // path at 256 bytes (names/titles — the compared fields — are short) and
  // fall back to the String version above it.
  private final val DlCap = 256
  private val dlMatrix = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int]((DlCap + 2) * (DlCap + 2))
  }
  private val dlLastRow = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](128)
  }

  def damerauLevenshteinSimUTF8(a: UTF8String, b: UTF8String): Double = {
    if (a.equals(b)) return 1.0
    if (asciiOnly(a) && asciiOnly(b) && a.numBytes() <= DlCap && b.numBytes() <= DlCap) {
      val fullLen1 = a.numBytes()
      val fullLen2 = b.numBytes()
      val maxLen = math.max(fullLen1, fullLen2)
      if (maxLen == 0) return 1.0
      if (fullLen1 == 0 || fullLen2 == 0) return 0.0
      // Common prefix/suffix trimming: an optimal DL alignment never edits
      // inside a shared prefix or suffix, so the distance over the trimmed
      // middles equals the full distance (parity-pinned against the
      // untrimmed DP in StringSimSpec) while the O(n*m) matrix shrinks to
      // the differing middle — decisive on id-style keys sharing long
      // literal prefixes. Normalization still uses the FULL lengths.
      val minLen = math.min(fullLen1, fullLen2)
      var pre = 0
      while (pre < minLen && a.getByte(pre) == b.getByte(pre)) pre += 1
      var suf = 0
      while (suf < minLen - pre &&
        a.getByte(fullLen1 - 1 - suf) == b.getByte(fullLen2 - 1 - suf)) suf += 1
      val len1 = fullLen1 - pre - suf
      val len2 = fullLen2 - pre - suf
      if (len1 == 0 || len2 == 0)
        return 1.0 - math.max(len1, len2).toDouble / maxLen
      val stride = len2 + 2
      val d = dlMatrix.get()
      val lastRow = dlLastRow.get()
      java.util.Arrays.fill(lastRow, 0)
      val inf = len1 + len2
      d(0) = inf
      var i = 0
      while (i <= len1) { d((i + 1) * stride + 1) = i; d((i + 1) * stride) = inf; i += 1 }
      var j = 0
      while (j <= len2) { d(stride + j + 1) = j; d(j + 1) = inf; j += 1 }
      i = 1
      while (i <= len1) {
        val c1 = a.getByte(pre + i - 1)
        var lastMatchCol = 0
        val rowPrev = i * stride
        val rowCur = (i + 1) * stride
        j = 1
        while (j <= len2) {
          val c2 = b.getByte(pre + j - 1)
          val last = lastRow(c2)
          val cost = if (c1 == c2) 0 else 1
          val sub = d(rowPrev + j) + cost
          val ins = d(rowCur + j) + 1
          val del = d(rowPrev + j + 1) + 1
          val trans = d(last * stride + lastMatchCol) + (i - last - 1) + 1 + (j - lastMatchCol - 1)
          d(rowCur + j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
          if (cost == 0) lastMatchCol = j
          j += 1
        }
        lastRow(c1) = i
        i += 1
      }
      1.0 - d((len1 + 1) * stride + len2 + 1).toDouble / maxLen
    } else damerauLevenshteinSim(a.toString, b.toString)
  }

  def hammingSimUTF8(a: UTF8String, b: UTF8String): Double = {
    if (a.equals(b)) return 1.0
    if (asciiOnly(a) && asciiOnly(b)) {
      val len1 = a.numBytes()
      val len2 = b.numBytes()
      val maxLen = math.max(len1, len2)
      if (maxLen == 0) return 1.0
      val minLen = math.min(len1, len2)
      var d = maxLen - minLen
      var i = 0
      while (i < minLen) {
        if (a.getByte(i) != b.getByte(i)) d += 1
        i += 1
      }
      1.0 - d.toDouble / maxLen
    } else hammingSim(a.toString, b.toString)
  }
  def ratcliffObershelpSimUTF8(a: UTF8String, b: UTF8String): Double =
    ratcliffObershelpSim(a.toString, b.toString)
}
