package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.StringSim

/** Golden values for the comparison kernels. Cross-checked against the
  * published Jaro/Winkler examples and the reference's StringDistances.jl
  * contract (similarity in [0,1], both-empty = 1).
  */
class StringSimSpec extends AnyFunSuite {

  /** deterministic sampled property check */
  private def forAllPairs(n: Int)(check: (String, String) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    def s(): String = {
      val len = rnd.nextInt(12)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    (0 until n).foreach { _ => check(s(), s()) }
  }

  private def approx(a: Double, b: Double, tol: Double = 1e-9) =
    assert(math.abs(a - b) <= tol, s"$a != $b")

  test("jaro golden values") {
    approx(StringSim.jaro("MARTHA", "MARHTA"), 17.0 / 18)
    approx(StringSim.jaro("DWAYNE", "DUANE"), 0.8222222222222223, 1e-12)
    approx(StringSim.jaro("DIXON", "DICKSONX"), 0.7666666666666666, 1e-12)
    assert(StringSim.jaro("", "") == 1.0)
    assert(StringSim.jaro("", "abc") == 0.0)
    assert(StringSim.jaro("abc", "abc") == 1.0)
    assert(StringSim.jaro("abc", "xyz") == 0.0)
  }

  test("jaro-winkler golden values (p=0.1)") {
    approx(StringSim.jaroWinkler("MARTHA", "MARHTA", 0.1), 0.9611111111111111, 1e-12)
    approx(StringSim.jaroWinkler("DWAYNE", "DUANE", 0.1), 0.84, 1e-12)
    approx(StringSim.jaroWinkler("DIXON", "DICKSONX", 0.1), 0.8133333333333332, 1e-12)
    // below the 0.7 boost threshold: no prefix boost even with common prefix
    val j = StringSim.jaro("ABCXXXXXX", "ABCYYYYYYYYYYYYYYYYYYYY")
    assert(j < 0.7)
    approx(StringSim.jaroWinkler("ABCXXXXXX", "ABCYYYYYYYYYYYYYYYYYYYY", 0.1), j, 1e-12)
  }

  test("levenshtein") {
    assert(StringSim.levenshteinDist("kitten", "sitting") == 3)
    assert(StringSim.levenshteinDist("", "abc") == 3)
    approx(StringSim.levenshteinSim("kitten", "sitting"), 1.0 - 3.0 / 7)
    assert(StringSim.levenshteinSim("", "") == 1.0)
  }

  test("damerau-levenshtein vs osa") {
    // classic case separating true DL from OSA: CA -> ABC
    assert(StringSim.osaDist("ca", "abc") == 3)
    assert(StringSim.damerauLevenshteinDist("ca", "abc") == 2)
    assert(StringSim.damerauLevenshteinDist("abcdef", "abcdfe") == 1)
    assert(StringSim.osaDist("abcdef", "abcdfe") == 1)
  }

  test("hamming") {
    approx(StringSim.hammingSim("karolin", "kathrin"), 1.0 - 3.0 / 7)
    approx(StringSim.hammingSim("abc", "abcdd"), 1.0 - 2.0 / 5)
  }

  test("ratcliff-obershelp") {
    // golden values match python difflib.SequenceMatcher.ratio
    approx(StringSim.ratcliffObershelpSim("WIKIMEDIA", "WIKIMANIA"), 14.0 / 18, 1e-12)
    approx(StringSim.ratcliffObershelpSim("GESTALT PATTERN MATCHING", "GESTALT PRACTICE"), 0.6, 1e-12)
  }

  test("properties: symmetry, range, identity") {
    forAllPairs(500) { (a: String, b: String) =>
      val jw = StringSim.jaroWinkler(a, b, 0.1)
      assert(jw >= 0.0 && jw <= 1.0)
      approx(jw, StringSim.jaroWinkler(b, a, 0.1), 1e-12)
      approx(StringSim.levenshteinSim(a, b), StringSim.levenshteinSim(b, a), 1e-12)
      assert(StringSim.jaroWinkler(a, a, 0.1) == 1.0)
      assert(StringSim.levenshteinSim(a, a) == 1.0)
      assert(StringSim.damerauLevenshteinSim(a, a) == 1.0)
    }
  }

  test("UTF8String ASCII fast path == String path") {
    import org.apache.spark.unsafe.types.UTF8String
    forAllPairs(500) { (a: String, b: String) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      approx(StringSim.jaroWinklerUTF8(ua, ub, 0.1), StringSim.jaroWinkler(a, b, 0.1), 1e-12)
      approx(StringSim.jaroUTF8(ua, ub), StringSim.jaro(a, b), 1e-12)
      approx(StringSim.levenshteinSimUTF8(ua, ub), StringSim.levenshteinSim(a, b), 1e-12)
    }
    // non-ASCII falls back to the String path
    val (x, y) = ("müller", "mueller")
    approx(StringSim.jaroWinklerUTF8(UTF8String.fromString(x), UTF8String.fromString(y), 0.1),
      StringSim.jaroWinkler(x, y, 0.1), 1e-12)
  }

  test("bit-parallel fast paths == String paths across the 64-byte boundary") {
    // the jaro bitmask path covers lengths 1..64 and the Myers levenshtein
    // path covers min-length <= 64: exercise lengths straddling both
    // boundaries with a small alphabet (forces matches + transpositions)
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    def s(len: Int): String =
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val lens = Seq(0, 1, 2, 31, 32, 33, 62, 63, 64, 65, 66, 100, 130)
    for (l1 <- lens; l2 <- lens; _ <- 1 to 3) {
      val a = s(l1)
      val b = s(l2)
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      approx(StringSim.jaroUTF8(ua, ub), StringSim.jaro(a, b), 1e-12)
      approx(StringSim.jaroWinklerUTF8(ua, ub, 0.1), StringSim.jaroWinkler(a, b, 0.1), 1e-12)
      approx(StringSim.levenshteinSimUTF8(ua, ub), StringSim.levenshteinSim(a, b), 1e-12)
    }
  }

  test("DL prefix/suffix trimming == untrimmed DP (transposition-heavy alphabet)") {
    // tiny alphabets maximize shared prefixes/suffixes AND transpositions —
    // the regime where a trim bug would surface; the String path is the
    // untrimmed oracle
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(11)
    for (alpha <- Seq(2, 3, 4); _ <- 1 to 2000) {
      def s(): String = {
        val len = rnd.nextInt(16)
        (0 until len).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
      }
      val (a, b) = (s(), s())
      approx(
        StringSim.damerauLevenshteinSimUTF8(
          UTF8String.fromString(a), UTF8String.fromString(b)),
        StringSim.damerauLevenshteinSim(a, b), 1e-12)
    }
    // long shared prefix + transposition at the boundary
    val p = "Customer#000000"
    for ((x, y) <- Seq((p + "12", p + "21"), (p + "a", p), (p, p + "ab"),
        (p + "ab" + p, p + "ba" + p))) {
      approx(
        StringSim.damerauLevenshteinSimUTF8(
          UTF8String.fromString(x), UTF8String.fromString(y)),
        StringSim.damerauLevenshteinSim(x, y), 1e-12)
    }
  }

  test("dl <= osa <= lev distances") {
    forAllPairs(500) { (a: String, b: String) =>
      val lv = StringSim.levenshteinDist(a, b)
      val osa = StringSim.osaDist(a, b)
      val dl = StringSim.damerauLevenshteinDist(a, b)
      assert(dl <= osa && osa <= lv)
    }
  }
}
