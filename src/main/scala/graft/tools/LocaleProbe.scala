package graft.tools

/** Dateparser tier expansion helper: print each candidate locale's
  * CLDR month names from THIS JDK, so a tier addition
  * ([[graft.functions.DateParse]] monthTable) only ever lists locales
  * verified to carry real data — a locale that falls back to root
  * prints the English names and is excluded (it would add nothing:
  * the englishKeys guard strips those forms anyway).
  *
  * Usage: `sbt "runMain graft.tools.LocaleProbe tag1 tag2 ..."`
  * (no args → the r18 tier-5 candidate list).
  */
object LocaleProbe {
  def main(args: Array[String]): Unit = {
    import java.time.Month
    import java.time.format.TextStyle
    import java.util.Locale
    val cands = if (args.nonEmpty) args.toSeq else Seq(
      "jv", "su", "ug", "bo", "dz", "ti", "om", "ln", "wo", "sn", "xh",
      "lg", "ak", "bm", "ee", "rn", "yi", "eo", "se", "rm", "gv", "kw",
      "fur", "mi", "haw", "to", "qu", "ckb", "ku", "sd", "ks", "ht",
      "sm", "ny", "st", "tn", "ce", "cv", "os", "sah", "ba", "tl")
    val out = new StringBuilder
    for (t <- cands) {
      val l = Locale.forLanguageTag(t)
      val jan = Month.JANUARY.getDisplayName(TextStyle.FULL, l)
      val may = Month.MAY.getDisplayName(TextStyle.FULL, l)
      val sep = Month.SEPTEMBER.getDisplayName(TextStyle.SHORT, l)
      out ++= s"$t\t$jan\t$may\t$sep\n"
    }
    print(out)
    // the console may not be UTF-8 — a file copy keeps the exact bytes
    java.nio.file.Files.write(java.nio.file.Paths.get("target/locale_probe.txt"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
