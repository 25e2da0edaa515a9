package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Canon

/** §2.8 — `%g` float canonicalization. Golden values produced by CPython
  * `'{0:g}'.format(v)` (the exact call the reference makes at
  * `utils.py:197-198`), plus seeded property sweeps.
  */
class CanonSpec extends AnyFunSuite {

  val goldens: Seq[(Double, String)] = Seq(
    7.0 -> "7",
    711.56 -> "711.56",
    1e6 -> "1e+06",
    999999.0 -> "999999",
    1234567.0 -> "1.23457e+06",
    0.00001 -> "1e-05",
    0.0001 -> "0.0001",
    -7.5 -> "-7.5",
    1.5e-5 -> "1.5e-05",
    123456.789 -> "123457",
    0.0 -> "0",
    1e100 -> "1e+100",
    3.14159265 -> "3.14159")

  test("CPython '{0:g}' goldens") {
    goldens.foreach { case (in, want) =>
      assert(Canon.gFormat(in) === want, s"gFormat($in)")
    }
  }

  test("integral floats below 1e6 render with no decimal point or exponent") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(1999999) - 999999
      if (math.abs(n) < 1000000)
        assert(Canon.gFormat(n.toDouble) === n.toString, s"n=$n")
    }
  }

  test("round-trip: parsing the output stays within 6-sig-digit tolerance") {
    val rnd = new scala.util.Random(7)
    (1 to 5000).foreach { _ =>
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(24) - 12)
      if (d != 0.0) {
        val s = Canon.gFormat(d)
        val rel = math.abs(s.toDouble - d) / math.abs(d)
        assert(rel < 1e-5, s"gFormat($d)=$s")
      }
    }
  }
}
