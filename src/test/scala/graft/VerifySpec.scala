package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The content fingerprint is the evidence primitive of the entire
  * correctness record (CORRECTNESS.json) — pin its algebra here.
  */
class VerifySpec extends SparkSpec {

  private def fpOf(rows: Seq[(String, String)]): (Long, Seq[String], String) = {
    val dir = Files.createTempDirectory("graft-verify").toString + "/t.parquet"
    import spark.implicits._
    rows.toDF("x", "y").coalesce(1).write.parquet(dir)
    Verify.fingerprint(spark, dir)
  }

  test("canonical row string separates fields: (ab,c) and (a,bc) hash differently") {
    // without the \u0001 separator the concatenated canonical strings are
    // identical ("abc") and a transposition-style engine bug could slip
    // past the recorded content hash
    val (n1, _, h1) = fpOf(Seq(("ab", "c")))
    val (n2, _, h2) = fpOf(Seq(("a", "bc")))
    assert(n1 == 1 && n2 == 1)
    assert(h1 != h2)
  }

  test("fingerprint is row-order-independent and duplicate-sensitive") {
    val (_, _, hForward) = fpOf(Seq(("a", "1"), ("b", "2"), ("c", "3")))
    val (_, _, hShuffled) = fpOf(Seq(("c", "3"), ("a", "1"), ("b", "2")))
    assert(hForward == hShuffled) // multiset semantics: order must not matter
    val (_, _, hDup) = fpOf(Seq(("a", "1"), ("a", "1"), ("b", "2"), ("c", "3")))
    assert(hDup != hForward) // sum (not xor): duplicates change the hash
  }

  test("canonValue: stable float/NULL/seq/binary forms") {
    assert(Verify.canonValue(null) == "NULL")
    assert(Verify.canonValue(Double.box(0.1)) == "1.000000000e-01")
    assert(Verify.canonValue(Double.box(Double.NaN)) == "NaN")
    assert(Verify.canonValue(Float.box(0.5f)) == "5.000000000e-01")
    assert(Verify.canonValue(collection.Seq(1, 2)) == "[1,2]")
    assert(Verify.canonValue(Array[Byte](1, 2)) == "AQI=")
  }
}
