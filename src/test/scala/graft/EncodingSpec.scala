package graft

import org.apache.spark.sql.functions._

import graft.operators.Encoding

/** Encoding-anomaly goldens: each counter counts exactly its class and
  * nothing else; clean text scores zero everywhere. Strings use \\u
  * escapes so the fixtures survive any source-encoding round trip.
  */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private val eAcuteMoji = "Ã©" // "é" double-encoded
  private val iDiaMoji = "Ã¯" // "ï" double-encoded, NOT pinned
  private val rsquoMoji = "â€™" // cp1252 curly apostrophe
  private val ldquoMoji = "â€œ" // cp1252 left double quote

  private def counts(s: String): (Long, Long, Long) =
    Seq(s).toDF("t").select(
      Encoding.countReplacement(col("t")),
      Encoding.countMojibake(col("t")),
      Encoding.countControl(col("t")))
      .as[(Long, Long, Long)].head()

  test("replacement chars counted, one per occurrence") {
    assert(counts("ok � bad �� worse") === ((3L, 0L, 0L)))
  }

  test("cp1252 double-encode artifacts counted (pinned list only)") {
    // pinned hits count; iDiaMoji is real mojibake but outside the
    // high-precision list — precision over recall by design
    assert(counts(s"caf$eAcuteMoji na${iDiaMoji}ve $rsquoMoji $ldquoMoji") ===
      ((0L, 3L, 0L)))
    assert(counts(s"Andr$eAcuteMoji said ${ldquoMoji}hi") === ((0L, 2L, 0L)))
  }

  test("C0 controls counted; tab/newline/CR exempt") {
    assert(counts("a\u0001b\u000Bc") === ((0L, 0L, 2L)))
    assert(counts("tabs\tand\nnewlines\rok") === ((0L, 0L, 0L)))
  }

  test("clean unicode text is not flagged") {
    assert(counts("naïve café — 日本語 fine") ===
      ((0L, 0L, 0L)))
  }
}
