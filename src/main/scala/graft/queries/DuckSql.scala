package graft.queries

/** Shared DuckDB-SQL fragments mirroring graft's column-level operators
  * exactly (tokenizer, shingles, portable hash). Every fragment is the
  * oracle twin of a Spark expression; keep the two in lockstep.
  */
object DuckSql {

  /** Twin of [[graft.operators.Fts.tokens]]. */
  def tokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), t -> t <> '')"

  /** Twin of [[graft.functions.PortableHash.hash60]]. */
  def hash60(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"

  /** Twin of [[graft.functions.PortableHash.hash60Seeded]]. */
  def hash60Seeded(seedExpr: String, expr: String): String =
    hash60(s"CAST($seedExpr AS VARCHAR) || ':' || ($expr)")

  /** Twin of [[graft.functions.PortableHash.affine]]. */
  def affine(hExpr: String, kExpr: String): String =
    s"((($hExpr) % 1000000007) * (2 * ($kExpr) + 1) + (12345 * ($kExpr) + 677)) % 1000000007"

  /** Twin of [[graft.operators.TextDedup.shingles]] given a token-list
    * expression.
    */
  def shinglesFromTokens(t: String, w: Int = 3): String =
    s"""CASE WHEN len($t) >= $w
       | THEN list_transform(range(1, len($t) - ${w - 2}), i -> array_to_string(($t)[i:i+${w - 1}], ' '))
       | ELSE [array_to_string($t, ' ')] END""".stripMargin.replace("\n", " ")

  /** Twin of [[graft.operators.TextStats]] stopword hit count. */
  def hitCount(toksExpr: String, words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksExpr, t -> t IN ($inList)))"
  }

  /** Twin of [[graft.operators.TextStats.quality]]'s `quality_score` as
    * ONE scalar expression (same component arithmetic and order as the
    * per-component oracles in DedupQueries — keep all three in
    * lockstep).
    */
  def qualityScore(textExpr: String): String = {
    val t = tokens(textExpr)
    val allStop = graft.operators.TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    val nToks = s"len($t)"
    val alnum = s"length(regexp_replace(lower($textExpr), '[^a-z0-9]', '', 'g'))"
    val spaces = s"length(regexp_replace($textExpr, '[^ ]', '', 'g'))"
    s"""round(greatest(0.0, least(1.0,
       |  0.5 * (CASE WHEN $nToks > 0 THEN CAST(${hitCount(t, allStop)} AS DOUBLE) / CAST($nToks AS BIGINT) ELSE 0.0 END) +
       |  0.1 * (CASE WHEN $nToks > 0 THEN CAST($alnum AS DOUBLE) / CAST($nToks AS BIGINT) ELSE 0.0 END) -
       |  (CASE WHEN length($textExpr) > 0 THEN CAST(length($textExpr) - $alnum - $spaces AS DOUBLE) / CAST(length($textExpr) AS BIGINT) ELSE 0.0 END))), 6)"""
      .stripMargin.replace("\n", " ")
  }
}
