package graft

import graft.functions.{HyperplaneCodesMd5, Md5Hash}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-engine hash contract: Md5Hash.hash must equal DuckDB's
  * `md5_number_upper` (first 8 MD5 digest bytes, little-endian) bit for
  * bit — every differential oracle for a hash-seeded operator (SimHash,
  * LSH, IVF, sampling) rests on this. Constants below were read from
  * DuckDB 1.0 directly. */
class Md5HashSpec extends AnyFunSuite {

  private def h(s: String): Long = Md5Hash.hash(UTF8String.fromString(s))

  test("md5_long matches DuckDB md5_number_upper verbatim") {
    // SELECT md5_number_upper('abc')  → 12704604231530709392
    assert(h("abc") === java.lang.Long.parseUnsignedLong("12704604231530709392"))
    // SELECT md5_number_upper('')     → 338333539836370388
    assert(h("") === 338333539836370388L)
    // SELECT md5_number_upper('hp:0:0:0') → 378688911302295550
    assert(h("hp:0:0:0") === 378688911302295550L)
  }

  test("Rademacher weights derive from the hash low bit and cache consistently") {
    for (t <- 0 until 4; j <- 0 until 16; i <- Seq(0, 1, 63, 127)) {
      val expected = if ((h(s"hp:$t:$j:$i") & 1L) == 1L) 1.0 else -1.0
      assert(HyperplaneCodesMd5.weight(t, j, i) === expected, s"(t=$t,j=$j,i=$i)")
    }
    // Beyond the cache boundary the lazy path must agree with the formula.
    assert(HyperplaneCodesMd5.weight(0, 0, 200) ===
      (if ((h("hp:0:0:200") & 1L) == 1L) 1.0 else -1.0))
  }
}
