package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.DateParse
import graft.operators.{Extract, Fts, Shape}

/** Graded queries exercising the reference's own operator inventory
  * (SURVEY §2) over the driver's testdata parquet. Each has a DuckDB
  * oracle in [[graft.SparkEntry.oracleSql]]; Spark/SQL column names and
  * types are kept identical (BIGINT ids/counts, DOUBLE measures,
  * VARCHAR/ISO strings) and every query ends in a deterministic ORDER BY.
  */
object ParityQueries {

  /** S1/§2.7 — rowid over a deterministic input order. The upstream has
    * a global sort, so this exercises [[graft.operators.Rowid.attachZip]]
    * (same-job zipWithIndex numbering); the scan-stable fast path
    * ([[graft.operators.Rowid.attach]]) rejects sorted upstreams by
    * design and is covered by CsvLoaderSpec.
    */
  def rowidScan(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").orderBy(col("r_regionkey"))
    graft.operators.Rowid.attachZip(region)
      .select(col("rowid"), col("r_regionkey").cast(LongType).as("r_regionkey"), col("r_name"))
      .orderBy("rowid")
  }

  /** P1+P2 — shape parse + prune/rename/cast on `part`:
    * `p_partkey:part_id,p_name:part_name,p_size:size_real(REAL),p_retailprice:price` —
    * one rename, one REAL cast, implicit prune of the rest.
    */
  def shapePart(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
    val shape = Shape.parseShape("p_partkey:part_id,p_name:part_name,p_size:size_real(REAL),p_brand:brand(TEXT)")
    val (shaped, _) = Shape.applyShape(part, shape)
    shaped.withColumn("part_id", col("part_id").cast(LongType)).orderBy("part_id")
  }

  /** P3+P4 — filename column + typed fixed columns on `nation`. */
  def literalColumns(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val named = Shape.withFilenameColumn(nation, "filename", "nation")
    Shape.withFixedColumns(named, Seq(
        "batch" -> Shape.FixedStr("batch42"),
        "load_id" -> Shape.FixedInt(42L),
        "weight" -> Shape.FixedFloat(1.5)))
      .select(col("n_nationkey").cast(LongType).as("n_nationkey"), col("n_name"),
        col("filename"), col("batch"), col("load_id"), col("weight"))
      .orderBy("n_nationkey")
  }

  /** P5 — date/datetime normalization to ISO strings, including a round
    * trip through the fuzzy natural-language parser ("July 4, 1996" ->
    * "1996-07-04").
    */
  def datesIso(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    orders.select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_iso"),
        DateParse.parseDate(date_format(col("o_orderdate"), "MMMM d, yyyy")).as("d_fuzzy"),
        DateParse.parseDate(date_format(col("o_orderdate"), "d MMMM yyyy")).as("d_fuzzy2"))
      .orderBy("o_orderkey")
  }

  /** P5 — datetime variant on `events.ts` (real time-of-day component). */
  def datetimesIso(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    events.select(
        col("event_id").cast(LongType).as("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_iso"))
      .orderBy("event_id")
  }

  /** E2 phase 1 — dictionary build on `orders.o_orderpriority` with
    * first-seen ordering keyed by o_orderkey-as-rowid. Golden semantics:
    * ids 1..N in first-occurrence order.
    */
  def dictOrderpriority(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey").as("rowid"))
    Extract.buildDictionary(Seq(Extract.Source(orders, "o_orderpriority")))
      .select(col("id"), col("value"))
      .orderBy("id")
  }

  /** E2 phase 2 — encode the fact table against the built dictionary
    * (broadcast join; fact never shuffles).
    */
  def encodeOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val src = orders.select(col("o_orderpriority"), col("o_orderkey").as("rowid"))
    val dict = Extract.buildDictionary(Seq(Extract.Source(src, "o_orderpriority")))
    Extract.encode(orders, "o_orderpriority", dict)
      .select(col("o_orderkey").cast(LongType).as("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority").cast(LongType).as("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** E2 — shared dictionary: two source columns of the same table feeding
    * ONE lookup table (the actors pattern,
    * `tests/test_csvs_to_sqlite.py:232-261`): first all of l_returnflag
    * in row order, then all of l_linestatus.
    */
  def sharedDict(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("rowid",
        col("l_orderkey") * lit(10L) + col("l_linenumber").cast(LongType))
    Extract.buildDictionary(Seq(
        Extract.Source(li, "l_returnflag"),
        Extract.Source(li, "l_linestatus")))
      .select(col("id"), col("value"))
      .orderBy("id")
  }

  /** §2.8 — `%g` float canonicalization in the dictionary path: a DOUBLE
    * column's distinct values become the strings the reference would
    * store (`"{0:g}".format`, utils.py:196-200). The oracle's
    * `printf('%g', x)` is C-printf %g — identical semantics.
    */
  def canonFloatDict(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_acctbal"), col("c_custkey").as("rowid"))
    Extract.buildDictionary(Seq(Extract.Source(cust, "c_acctbal")))
      .select(col("id"), col("value"))
      .orderBy("id")
  }

  /** Extension — window functions: top-3 orders per customer by total
    * price (rank inside partition; one shuffle keyed by o_custkey).
    */
  def windowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
      .select(col("o_custkey").cast(LongType).as("o_custkey"), col("rank"),
        col("o_orderkey").cast(LongType).as("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rank")
  }

  /** S10 — FTS-populate reconstruction join: encoded fact LEFT JOIN
    * lookup to index the original strings, ordered by rowid
    * (`utils.py:395-432`).
    */
  def ftsReconstruct(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val src = orders.select(col("o_orderpriority"), col("o_orderkey").as("rowid"))
    val dict = Extract.buildDictionary(Seq(Extract.Source(src, "o_orderpriority")))
    val encoded = Extract.encode(orders, "o_orderpriority", dict)
    Extract.reconstruct(encoded, "o_orderpriority", dict)
      .select(col("o_orderkey").cast(LongType).as("o_orderkey"),
        col("o_orderpriority").as("priority_text"))
      .orderBy("o_orderkey")
  }

  /** S13 — FTS MATCH semantics: implicit-AND bag-of-words over
    * `documents.text`, predicate form (stays in whole-stage codegen,
    * filter pushes to the scan).
    */
  def ftsMatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(Fts.matches(Seq(col("text")), "spark window merge"))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** S12 — inverted-index build over documents: distinct (term, doc)
    * pairs aggregated to per-term document frequency.
    */
  def ftsTermStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    Fts.invertedIndex(docs.withColumnRenamed("doc_id", "rowid"), Seq("text"))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast(LongType).as("df"))
      .orderBy(col("term"))
  }

  /** Extension — relevance-ranked FTS over documents: tf * scaled-idf
    * scoring (exact integer arithmetic; see [[Fts.rankedMatch]]).
    */
  def ftsRanked(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    Fts.rankedMatch(docs, Seq("text"), "spark vector hash")
      .select(col("rowid").cast(LongType).as("doc_id"), col("score"), col("terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** S10/S13 — MATCH via the inverted index (semi-join path): rowids of
    * documents matching all terms, resolved back to language counts.
    */
  def ftsIndexMatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    val index = Fts.invertedIndex(docs, Seq("text"))
    Fts.matchRowids(index, "vector hash join")
      .select(col("rowid").cast(LongType).as("doc_id"))
      .orderBy("doc_id")
  }

  /** S13 extension — FTS5 boolean MATCH syntax: quoted phrase,
    * OR / NOT, parentheses ([[Fts.matchQuery]]). One codegen'd
    * predicate on the scan, no shuffle.
    */
  def ftsBoolean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(Fts.matchQuery(Seq(col("text")), """"table hash" OR (vector NOT stream)"""))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val ftsBooleanOracle: String = {
    val toks = DuckSql.tokens("text")
    val stream = s"' ' || array_to_string($toks, ' ') || ' '"
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
       |FROM documents
       |WHERE position(' table hash ' IN $stream) > 0
       |   OR (list_contains($toks, 'vector') AND NOT list_contains($toks, 'stream'))
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — FTS5 `snippet()`: best 8-token window by distinct
    * query-term hits for every matching document, matches wrapped in
    * FTS5's default `<b>` markers ([[Fts.snippet]]).
    */
  def ftsSnippet(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(Fts.matches(Seq(col("text")), "vector hash"))
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.snippet(Seq(col("text")), "vector hash", window = 8).as("snippet"))
      .orderBy("doc_id")
  }

  val ftsSnippetOracle: String = {
    val toks = DuckSql.tokens("text")
    val hit = "t IN ('vector', 'hash')"
    s"""WITH base AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks
       |  FROM documents
       |  WHERE list_contains($toks, 'vector') AND list_contains($toks, 'hash')),
       |sc AS (SELECT doc_id, toks,
       |    list_max(list_transform(range(1, greatest(len(toks) - 7, 1) + 1),
       |      s -> len(list_distinct(list_filter(toks[s:s+7], t -> $hit))) * 100000
       |           + (100000 - s))) AS best
       |  FROM base),
       |bs AS (SELECT doc_id, toks, 100000 - best % 100000 AS s FROM sc)
       |SELECT doc_id,
       |  array_to_string(list_transform(toks[s:s+7],
       |    t -> CASE WHEN $hit THEN '<b>' || t || '</b>' ELSE t END), ' ') AS snippet
       |FROM bs ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — FTS5 `highlight()`: the whole-document match
    * markup ([[Fts.highlight]]) for every document matching the query.
    */
  def ftsHighlight(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(Fts.matches(Seq(col("text")), "spark window"))
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.highlight(Seq(col("text")), "spark window").as("highlighted"))
      .orderBy("doc_id")
  }

  val ftsHighlightOracle: String = {
    val toks = DuckSql.tokens("text")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  array_to_string(list_transform($toks,
       |    t -> CASE WHEN t IN ('spark', 'window') THEN '<b>' || t || '</b>'
       |         ELSE t END), ' ') AS highlighted
       |FROM documents
       |WHERE list_contains($toks, 'spark') AND list_contains($toks, 'window')
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension (r18) — PHRASE-level FTS5 `highlight()`
    * ([[Fts.highlight]]): multi-token phrase hits wrap WHOLE
    * (`<b>part line</b>`, never a lone `line`), overlapping hits
    * coalesce (`"part part"` + `"part line"` over `part part line` →
    * one region), and instances are OR-GATED exactly as FTS5 reports
    * them — the `agg "part part"` branch's hits only highlight on rows
    * where that whole branch matched (pinned against sqlite3 in
    * SqliteCliSpec's phrase fuzz). The oracle replays spans, gates,
    * and the pairwise-witness merge in DuckDB list HOFs.
    */
  def ftsHighlightPhrase(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val q = "agg \"part part\" OR \"part line\""
    docs.filter(Fts.matchQuery(Seq(col("text")), q))
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.highlight(Seq(col("text")), q).as("highlighted"))
      .orderBy("doc_id")
  }

  val ftsHighlightPhraseOracle: String = {
    val toks = DuckSql.tokens("text")
    s"""WITH t AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, toks,
       |    list_filter(list_transform(toks, (x, i) ->
       |      CASE WHEN x = 'agg' THEN struct_pack(s := i, e := i) END),
       |      h -> h IS NOT NULL) AS sa,
       |    list_filter(list_transform(toks, (x, i) ->
       |      CASE WHEN i < len(toks) AND x = 'part' AND toks[i+1] = 'part'
       |        THEN struct_pack(s := i, e := i + 1) END),
       |      h -> h IS NOT NULL) AS sp,
       |    list_filter(list_transform(toks, (x, i) ->
       |      CASE WHEN i < len(toks) AND x = 'part' AND toks[i+1] = 'line'
       |        THEN struct_pack(s := i, e := i + 1) END),
       |      h -> h IS NOT NULL) AS sl
       |  FROM t
       |), g AS (
       |  SELECT doc_id, toks,
       |    (len(sa) > 0 AND len(sp) > 0) AS b1, (len(sl) > 0) AS b2,
       |    list_concat(
       |      CASE WHEN len(sa) > 0 AND len(sp) > 0
       |        THEN list_concat(sa, sp) ELSE list_filter(sa, h -> false) END,
       |      CASE WHEN len(sl) > 0 THEN sl ELSE list_filter(sl, h -> false) END)
       |      AS spans
       |  FROM s
       |)
       |SELECT doc_id,
       |  array_to_string(list_transform(toks, (x, i) ->
       |    (CASE WHEN len(list_filter(spans, h -> h.s = i)) > 0
       |           AND len(list_filter(spans, h -> h.s < i AND h.e >= i)) = 0
       |      THEN '<b>' ELSE '' END) || x ||
       |    (CASE WHEN len(list_filter(spans, h -> h.e = i)) > 0
       |           AND len(list_filter(spans, h -> h.s <= i AND h.e > i)) = 0
       |      THEN '</b>' ELSE '' END)), ' ') AS highlighted
       |FROM g WHERE b1 OR b2 ORDER BY doc_id""".stripMargin
  }

  /** S13 extension (r18b) — NEAR INSTANCE narrowing in `highlight()`:
    * FTS5 trims each NEAR member's instance list to valid-clump
    * participants (`max(start) − min(end) − 1 <= N` over some
    * one-instance-per-member assignment), so a `part` far from every
    * `line` does NOT highlight even on matching rows — the poslist
    * trim of fts5_expr.c, probed + fuzzed against the sqlite3 binary
    * in SqliteCliSpec. The oracle replays the witness rule in DuckDB
    * list HOFs (single-token members: survivor iff `abs(x − y) <= N +
    * 1` for some partner); spans are width-1, so overlap-coalescing is
    * vacuous and each surviving token wraps individually.
    */
  def ftsHighlightNear(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val q = "NEAR(part line, 3)"
    docs.filter(Fts.matchQuery(Seq(col("text")), q))
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.highlight(Seq(col("text")), q).as("highlighted"))
      .orderBy("doc_id")
  }

  val ftsHighlightNearOracle: String = {
    val toks = DuckSql.tokens("text")
    def pos(t: String) =
      s"list_filter(list_transform(toks, (x, i) -> CASE WHEN x = '$t' THEN i END), p -> p IS NOT NULL)"
    s"""WITH t AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, toks, ${pos("part")} AS pa, ${pos("line")} AS pb FROM t
       |), w AS (
       |  SELECT doc_id, toks,
       |    list_filter(pa, x -> len(list_filter(pb, y -> abs(x - y) <= 4)) > 0) AS ka,
       |    list_filter(pb, y -> len(list_filter(pa, x -> abs(x - y) <= 4)) > 0) AS kb
       |  FROM s
       |)
       |SELECT doc_id,
       |  array_to_string(list_transform(toks, (x, i) ->
       |    CASE WHEN list_contains(ka, i) OR list_contains(kb, i)
       |      THEN '<b>' || x || '</b>' ELSE x END), ' ') AS highlighted
       |FROM w WHERE len(ka) > 0 ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — FTS5 `NEAR(spark hash, 3)`: documents where the
    * terms occur within 3 intervening tokens, with the minimum gap
    * ([[Fts.nearMinGap]]).
    */
  def ftsNear(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.nearMinGap(Seq(col("text")), "spark", "hash").as("min_gap"))
      .filter(col("min_gap") <= 3)
      .orderBy("doc_id")
  }

  val ftsNearOracle: String = {
    val toks = DuckSql.tokens("text")
    def pos(t: String) =
      s"list_filter(list_transform($toks, (x, i) -> CASE WHEN x = '$t' THEN i END), p -> p IS NOT NULL)"
    s"""WITH g AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    ${pos("spark")} AS pa, ${pos("hash")} AS pb
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(list_min(flatten(list_transform(pa,
       |    x -> list_transform(pb, y -> abs(x - y) - 1)))) AS BIGINT) AS min_gap
       |FROM g
       |WHERE len(pa) > 0 AND len(pb) > 0
       |  AND list_min(flatten(list_transform(pa,
       |    x -> list_transform(pb, y -> abs(x - y) - 1)))) <= 3
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — FTS5 prefix queries (`tok*`) composed through the
    * boolean grammar ([[Fts.matchesPrefix]]); the prefix predicate is
    * one `exists(tokens, startswith)` per star — row-local, rides the
    * scan, cross-validated against real FTS5 in SqliteCliSpec.
    */
  def ftsPrefix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(Fts.matchQuery(Seq(col("text")), "vec* AND hash NOT stream"))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val ftsPrefixOracle: String = {
    val toks = DuckSql.tokens("text")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
       |FROM documents
       |WHERE len(list_filter($toks, t -> starts_with(t, 'vec'))) > 0
       |  AND list_contains($toks, 'hash')
       |  AND NOT list_contains($toks, 'stream')
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — FTS5 column-filter syntax (`col:operand`) over the
    * named-column grammar entry point ([[Fts.matchQueryNamed]]): each
    * filter restricts its operand (term / phrase / prefix) to one
    * column's token stream, composing with the boolean grammar
    * (`OR` splits looser than the implicit ANDs here). Cross-validated
    * against real FTS5 in SqliteCliSpec.
    */
  def ftsColFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val named = Seq("text" -> col("text"), "lang" -> col("lang"), "source" -> col("source"))
    docs.filter(Fts.matchQueryNamed(named,
        """lang:en AND text:"vector hash" OR source:src7 text:spar*"""))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  val ftsColFilterOracle: String = {
    val toks = DuckSql.tokens("text")
    val stream = s"' ' || array_to_string($toks, ' ') || ' '"
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
       |FROM documents
       |WHERE (list_contains(${DuckSql.tokens("lang")}, 'en')
       |        AND position(' vector hash ' IN $stream) > 0)
       |   OR (list_contains(${DuckSql.tokens("source")}, 'src7')
       |        AND len(list_filter($toks, t -> starts_with(t, 'spar'))) > 0)
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — filtered SUB-QUERIES (`col:(expr)`): the column
    * filter scopes a whole parenthesized boolean expression, and nested
    * filters intersect the context — `text:(lang:de OR hash)` reduces
    * to `text:hash` because {text} ∩ {lang} = ∅ matches nothing (pinned
    * against the sqlite3 binary; fuzz-verified over two-column corpora
    * in SqliteCliSpec).
    */
  def ftsColSetExpr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val named = Seq("text" -> col("text"), "lang" -> col("lang"), "source" -> col("source"))
    docs.filter(Fts.matchQueryNamed(named,
        """text:(spark AND vector NOT "spark vector") OR {lang source}:(en src3) OR text:(lang:de OR hash)"""))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  val ftsColSetExprOracle: String = {
    val toks = DuckSql.tokens("text")
    val stream = s"' ' || array_to_string($toks, ' ') || ' '"
    def inCol(c: String, t: String) = s"list_contains(${DuckSql.tokens(c)}, '$t')"
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
       |FROM documents
       |WHERE (list_contains($toks, 'spark') AND list_contains($toks, 'vector')
       |        AND NOT position(' spark vector ' IN $stream) > 0)
       |   OR ((${inCol("lang", "en")} OR ${inCol("source", "en")})
       |        AND (${inCol("lang", "src3")} OR ${inCol("source", "src3")}))
       |   OR list_contains($toks, 'hash')
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — k-phrase NEAR (`NEAR(p1 p2 p3, N)`): FTS5's clump
    * rule, min over one-occurrence-per-phrase assignments of
    * `max(start) − min(end) − 1` ([[Fts.nearMinGapK]]) — pinned against
    * the sqlite3 binary in SqliteCliSpec; the oracle replays the same
    * cross-product minimization over DuckDB position lists.
    */
  def ftsNear3(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.nearMinGapK(Seq(col("text")), Seq("spark", "vector", "hash")).as("min_gap"))
      .filter(col("min_gap") <= 8)
      .orderBy("doc_id")
  }

  val ftsNear3Oracle: String = {
    val toks = DuckSql.tokens("text")
    def pos(t: String) =
      s"list_filter(list_transform($toks, (x, i) -> CASE WHEN x = '$t' THEN i END), p -> p IS NOT NULL)"
    s"""WITH g AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    ${pos("spark")} AS pa, ${pos("vector")} AS pb, ${pos("hash")} AS pc
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(list_min(flatten(list_transform(pa, x ->
       |      flatten(list_transform(pb, y ->
       |        list_transform(pc, z ->
       |          greatest(x, y, z) - least(x, y, z) - 1)))))) AS BIGINT) AS min_gap
       |  FROM g WHERE len(pa) > 0 AND len(pb) > 0 AND len(pc) > 0)
       |SELECT doc_id, min_gap FROM m WHERE min_gap <= 8
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — FTS5 initial-token queries (`^tok`): the anchored
    * term must be the FIRST token of the column's own stream
    * ([[Fts.matchesAnchored]]), composed with plain terms and an
    * anchored prefix through the boolean grammar. Cross-validated
    * against real FTS5 in SqliteCliSpec.
    */
  def ftsAnchor(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(Fts.matchQuery(Seq(col("text")), "^the spark OR ^batc*"))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val ftsAnchorOracle: String = {
    val toks = DuckSql.tokens("text")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
       |FROM documents
       |WHERE (($toks)[1] = 'the' AND list_contains($toks, 'spark'))
       |   OR starts_with(($toks)[1], 'batc')
       |ORDER BY doc_id""".stripMargin
  }

  /** The multilingual corpus for the unicode61 graded queries:
    * `documents.text` with a deterministic multilingual suffix planted
    * per row. Every non-ASCII char is from the SAFE ALPHABET pinned by
    * Unicode61Spec — the set where DuckDB's
    * `strip_accents(lower())` + `[^\p{L}\p{N}]+` split provably equals
    * SQLite's unicode61 (accented Latin-1, base Cyrillic minus й/ё,
    * CJK) — so the oracle can replicate the tokenizer exactly.
    */
  private def multilingualDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" Привет мир — café au lait"))
          .when(col("doc_id") % 4 === 1, lit(" Müller naïve 你好世界"))
          .when(col("doc_id") % 4 === 2, lit(" crème brûlée Ж"))
          .otherwise(lit(" plain ascii tail"))))

  private val multilingualDocsSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
      |    text || CASE WHEN doc_id % 4 = 0 THEN ' Привет мир — café au lait'
      |                 WHEN doc_id % 4 = 1 THEN ' Müller naïve 你好世界'
      |                 WHEN doc_id % 4 = 2 THEN ' crème brûlée Ж'
      |                 ELSE ' plain ascii tail' END AS raw
      |  FROM documents""".stripMargin

  /** S13 extension — unicode61 tokenization inside MATCH over RAW
    * multilingual text (the round-11 fidelity gap: the old tokenizer
    * silently dropped every non-ASCII token). The query mixes an
    * accented bareword (`café` folds to the corpus's `cafe`... and vice
    * versa), a Cyrillic phrase, and a NOT over a folded umlaut —
    * verdict parity with the real FTS5 binary is fuzzed in
    * SqliteCliSpec; this entry grades the same semantics against the
    * DuckDB replica at sf0.01. Predicate form: whole-stage codegen,
    * no shuffle.
    */
  def ftsUnicode(spark: SparkSession, dir: String): DataFrame = {
    val docs = multilingualDocs(spark, dir)
    docs.filter(Fts.matchQuery(Seq(col("text")), """("привет мир" OR café) NOT müller"""))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val ftsUnicodeOracle: String = {
    val toks = DuckSql.tokensUnicode("raw")
    val stream = s"' ' || array_to_string($toks, ' ') || ' '"
    s"""WITH p AS ($multilingualDocsSql)
       |SELECT doc_id, lang
       |FROM p
       |WHERE (position(' привет мир ' IN $stream) > 0
       |       OR list_contains($toks, 'cafe'))
       |  AND NOT list_contains($toks, 'muller')
       |ORDER BY doc_id""".stripMargin
  }

  /** S13 extension — STEMMED MATCH ([[Fts.matchesStemmed]], FTS5
    * `tokenize='porter'` semantics; row-set parity vs a real porter
    * table pinned in SqliteCliSpec): the query surface form
    * ('hopefulness') differs from every planted document surface
    * ('hopeful', 'hoped', …) — only correct stemming on BOTH sides
    * unifies them. The oracle is the answer by construction
    * (`doc_id % 4 = 2` rows carry the hope-family plants and nothing
    * else in the fixed 31-word base vocabulary stems into it), so any
    * stemming defect anywhere changes the row set and breaks the hash.
    */
  def porterSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" running runs"))
          .when(col("doc_id") % 4 === 1, lit(" connection connected connecting"))
          .when(col("doc_id") % 4 === 2, lit(" hopefulness hopeful hoped"))
          .otherwise(lit(" formality formalize formal"))))
    docs.filter(Fts.matchesStemmed(Seq(col("text")), "hopefulness"))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val porterSearchOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
      |FROM documents WHERE doc_id % 4 = 2
      |ORDER BY doc_id""".stripMargin

  /** S13 extension — FTS5 `highlight()` on the RAW text
    * ([[Fts.highlightRaw]], byte-parity with the binary pinned in
    * SqliteCliSpec): the original multilingual text comes back intact
    * with only the markers inserted around folded-match token spans
    * ('Müller' highlighted for the query term müller). The oracle
    * reconstructs via literal replacement of the planted surfaces —
    * exact because the planted forms appear nowhere else (the base
    * corpus is ASCII with a fixed 31-word vocabulary).
    */
  def ftsHighlightRaw(spark: SparkSession, dir: String): DataFrame = {
    val docs = multilingualDocs(spark, dir)
    docs.filter(Fts.matchQuery(Seq(col("text")), "café OR müller"))
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.highlightRaw(col("text"), "café OR müller").as("highlighted"))
      .orderBy("doc_id")
  }

  val ftsHighlightRawOracle: String =
    s"""WITH p AS ($multilingualDocsSql)
       |SELECT doc_id,
       |  replace(replace(raw, 'café', '<b>café</b>'),
       |          'Müller', '<b>Müller</b>') AS highlighted
       |FROM p
       |WHERE doc_id % 4 = 0 OR doc_id % 4 = 1
       |ORDER BY doc_id""".stripMargin

  /** S12 extension — full term statistics of the multilingual corpus:
    * the entire unicode61 token vocabulary (folded accents, Cyrillic,
    * CJK, plus all ASCII corpus terms) with document frequencies. This
    * hashes every token the tokenizer emits over every row — the
    * strongest oracle check of tokenizer fidelity. Distinct-explode +
    * one map-side-combined count shuffle keyed by term; scales like any
    * inverted-index build.
    */
  def u61TermStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = multilingualDocs(spark, dir).withColumnRenamed("doc_id", "rowid")
    Fts.invertedIndex(docs, Seq("text"))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast(LongType).as("df"))
      .orderBy(col("term"))
  }

  val u61TermStatsOracle: String = {
    val toks = DuckSql.tokensUnicode("raw")
    s"""WITH p AS ($multilingualDocsSql),
       |t AS (SELECT doc_id, unnest(list_distinct($toks)) AS term FROM p)
       |SELECT term, CAST(count(*) AS BIGINT) AS df
       |FROM t GROUP BY term ORDER BY term""".stripMargin
  }

  /** S13 extension — `unicode61 remove_diacritics 2` term statistics
    * ([[graft.expressions.Unicode61Rd2Tokens]], tables probed per
    * codepoint, binary-parity fuzzed in Unicode61Rd2Spec). The plants
    * are exactly the rd=2 DELTA class — multi-diacritic codepoints
    * ('Ǖ' u+diaeresis+macron, 'ǟ', 'ḉ', 'ḕ', 'ȱ') that rd=1 folds to
    * an accent-BEARING char but rd=2 fully unaccents — so a regression
    * to the rd=1 table changes the vocabulary and breaks the hash. The
    * oracle appends each plant's probed fold as a literal (the base
    * corpus is ASCII, where rd=2 ≡ lower+split). Distinct-explode +
    * one map-side-combined count shuffle; scales like any
    * inverted-index build.
    */
  def rd2TermStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" Ǖbung für GRÜN"))
          .when(col("doc_id") % 4 === 1, lit(" ǟrger ǖber ǭr"))
          .when(col("doc_id") % 4 === 2, lit(" ḉa ḕve ȱzone"))
          .otherwise(lit(" plain ascii tail"))))
    docs.select(explode(array_distinct(
        graft.expressions.Unicode61Rd2Tokens.u61_rd2_tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast(LongType).as("df"))
      .orderBy(col("term"))
  }

  val rd2TermStatsOracle: String = {
    val toks = DuckSql.tokensUnicode("text")
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct(list_concat($toks,
       |      CASE WHEN doc_id % 4 = 0 THEN ['ubung','fur','grun']
       |           WHEN doc_id % 4 = 1 THEN ['arger','uber','or']
       |           WHEN doc_id % 4 = 2 THEN ['ca','eve','ozone']
       |           ELSE ['plain','ascii','tail'] END))) AS term
       |  FROM documents)
       |SELECT term, CAST(count(*) AS BIGINT) AS df
       |FROM t GROUP BY term ORDER BY term""".stripMargin
  }

  /** S13 extension — FTS5 `ascii` tokenizer term statistics
    * ([[graft.expressions.AsciiTokens]], closed-form rule set probed
    * per codepoint and binary-parity fuzzed in AsciiTokSpec). The
    * plants pin the two behaviors that distinguish `ascii` from every
    * unicode61 option: non-ASCII codepoints are token chars kept
    * VERBATIM (no fold — 'ёж' and 'Ёж' are distinct terms, 'MÜller'
    * keeps its Ü as 'mÜller'), and only ASCII A-Z case-folds. The
    * oracle appends each plant's rule-applied form as a literal (the
    * base corpus is ASCII, where `ascii` ≡ lower+split).
    */
  def asciiTermStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" MÜller STRASSE"))
          .when(col("doc_id") % 4 === 1, lit(" ёж Ёж"))
          .when(col("doc_id") % 4 === 2, lit(" naïve-NAÏVE"))
          .otherwise(lit(" plain TAIL"))))
    docs.select(explode(array_distinct(
        graft.expressions.AsciiTokens.ascii_tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast(LongType).as("df"))
      .orderBy(col("term"))
  }

  val asciiTermStatsOracle: String = {
    val toks = DuckSql.tokensUnicode("text")
    s"""WITH t AS (SELECT doc_id, unnest(list_distinct(list_concat($toks,
       |      CASE WHEN doc_id % 4 = 0 THEN ['mÜller','strasse']
       |           WHEN doc_id % 4 = 1 THEN ['ёж','Ёж']
       |           WHEN doc_id % 4 = 2 THEN ['naïve','naÏve']
       |           ELSE ['plain','tail'] END))) AS term
       |  FROM documents)
       |SELECT term, CAST(count(*) AS BIGINT) AS df
       |FROM t GROUP BY term ORDER BY term""".stripMargin
  }

  /** Extension — BM25-ranked FTS (FTS5's `bm25()` rank function,
    * k1=1.2 b=0.75) in deterministic integer fixed point with a
    * square-and-shift log2 idf ([[Fts.bm25Match]]) — ranking
    * cross-validated against real SQLite FTS5 (SqliteCliSpec); the
    * oracle replays the identical integer steps via
    * [[DuckSql.ilog2Cte]].
    */
  def ftsBm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    Fts.bm25Match(docs, Seq("text"), "spark vector hash")
      .select(col("rowid").cast(LongType).as("doc_id"), col("score"), col("terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** Surface forms of the four audited Porter inflection families —
    * BOTH sides of the parity check enumerate exactly this list, so the
    * hash is corpus-vocabulary independent: a base-corpus word that
    * happens to stem into run/connect/hope/formal ("hoping",
    * "formally", "connects") is excluded on both sides instead of
    * breaking the oracle at a new scale factor.
    */
  private val porterSurfaceForms = Seq(
    "running", "runs", "run",
    "connection", "connected", "connecting", "connect",
    "hopefulness", "hopeful", "hoped", "hope",
    "formality", "formalize", "formal")

  /** Extension — FTS5's `tokenize='porter'` (classic Porter stemming
    * over unicode61, [[graft.functions.Porter]], fuzzed token-for-token
    * against the binary in PorterSpec): stemmed term statistics over
    * planted inflection families. The engine tokenizes with unicode61,
    * restricts to the enumerated surface forms, then stems each
    * survivor through the NATIVE Porter expression
    * ([[graft.expressions.PorterTokens]] codegen) — the oracle replays
    * the same surface-form→stem map in SQL, so a stemming regression on
    * any audited form breaks the hash, while out-of-list corpus
    * vocabulary can never perturb the counts.
    */
  def porterStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" running runs"))
          .when(col("doc_id") % 4 === 1, lit(" connection connected connecting"))
          .when(col("doc_id") % 4 === 2, lit(" hopefulness hopeful hoped"))
          .otherwise(lit(" formality formalize formal"))))
    docs.select(col("doc_id"),
        explode(Fts.tokens(Seq(col("text")))).as("term"))
      .filter(col("term").isin(porterSurfaceForms: _*))
      .select(col("doc_id"),
        element_at(graft.expressions.PorterTokens.porter_tokens(col("term")), 1).as("stem"))
      .groupBy(col("stem"))
      .agg(countDistinct(col("doc_id")).cast(LongType).as("df"),
        count(lit(1)).cast(LongType).as("occurrences"))
      .orderBy("stem")
  }

  val porterStatsOracle: String = {
    val toks = DuckSql.tokens(
      """text || CASE WHEN doc_id % 4 = 0 THEN ' running runs'
        |             WHEN doc_id % 4 = 1 THEN ' connection connected connecting'
        |             WHEN doc_id % 4 = 2 THEN ' hopefulness hopeful hoped'
        |             ELSE ' formality formalize formal' END""".stripMargin)
    s"""WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest($toks) AS term
       |  FROM documents),
       |m AS (SELECT doc_id,
       |    CASE WHEN term IN ('running', 'runs', 'run') THEN 'run'
       |         WHEN term IN ('connection', 'connected', 'connecting', 'connect') THEN 'connect'
       |         WHEN term IN ('hopefulness', 'hopeful', 'hoped', 'hope') THEN 'hope'
       |         WHEN term IN ('formality', 'formalize', 'formal') THEN 'formal'
       |    END AS stem
       |  FROM t)
       |SELECT stem, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       |  CAST(count(*) AS BIGINT) AS occurrences
       |FROM m WHERE stem IS NOT NULL
       |GROUP BY stem ORDER BY stem""".stripMargin
  }

  /** Extension — the complementary GUARD for [[porterStats]]'s
    * enumerated-surface-form restriction: stem EVERY distinct corpus
    * token (base vocabulary AND plants) through the native
    * [[graft.expressions.PorterTokens]] codegen path and keep the
    * (surface, stem) pairs landing in the four audited stem families.
    * The oracle enumerates exactly the 11 planted surfaces with their
    * per-branch document frequencies — so an OVER-stemming regression
    * (some base-corpus word newly stemming into run/connect/hope/
    * formal) adds a row and breaks the hash, and an UNDER-stemming
    * regression (a planted inflection no longer unifying) drops one.
    * This closes the coverage hole the vocabulary-independent
    * porterStats fix opened: whole-corpus stemming is hash-pinned
    * again, without being corpus-vocabulary-fragile (a new scale
    * factor reusing the fixed 31-word vocabulary cannot change the
    * row set — and if the vocabulary itself ever changes, the loud
    * hash break is the correct outcome).
    */
  def porterGuard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" running runs"))
          .when(col("doc_id") % 4 === 1, lit(" connection connected connecting"))
          .when(col("doc_id") % 4 === 2, lit(" hopefulness hopeful hoped"))
          .otherwise(lit(" formality formalize formal"))))
    docs.select(col("doc_id"),
        explode(array_distinct(Fts.tokens(Seq(col("text"))))).as("term"))
      .select(col("doc_id"), col("term"),
        element_at(graft.expressions.PorterTokens.porter_tokens(col("term")), 1).as("stem"))
      .filter(col("stem").isin("run", "connect", "hope", "formal"))
      .groupBy(col("term"), col("stem"))
      .agg(countDistinct(col("doc_id")).cast(LongType).as("df"))
      .orderBy("term")
  }

  val porterGuardOracle: String =
    """WITH b AS (SELECT doc_id % 4 AS br, CAST(count(*) AS BIGINT) AS n
      |    FROM documents GROUP BY 1),
      |v(term, stem, br) AS (VALUES
      |  ('running', 'run', 0), ('runs', 'run', 0),
      |  ('connection', 'connect', 1), ('connected', 'connect', 1),
      |  ('connecting', 'connect', 1),
      |  ('hopefulness', 'hope', 2), ('hopeful', 'hope', 2), ('hoped', 'hope', 2),
      |  ('formality', 'formal', 3), ('formalize', 'formal', 3), ('formal', 'formal', 3))
      |SELECT v.term, v.stem, b.n AS df
      |FROM v JOIN b ON v.br = b.br
      |ORDER BY v.term""".stripMargin

  /** Extension — trigram-indexed SUBSTRING search
    * ([[graft.operators.Trigram]]): `LIKE '%vector hash%'` through the
    * (trigram, rowid) inverted index with exact contains-verify — the
    * pg_trgm / FTS5-trigram-tokenizer capability token FTS cannot
    * express (the needle crosses a token boundary mid-phrase). The
    * oracle is the plain scan predicate: two spellings, identical
    * rows, and the index may only PRUNE, never drop a match.
    */
  def trigramSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    val idx = graft.operators.Trigram.index(docs)
    graft.operators.Trigram.search(docs, idx, "vector hash")
      .select(col("rowid").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val trigramSearchOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
      |FROM documents
      |WHERE contains(lower(text), 'vector hash')
      |ORDER BY doc_id""".stripMargin

  /** S13 extension — FTS5 MATCH over a `tokenize='trigram'` table
    * ([[graft.operators.FtsTrigram]]): the full boolean grammar where
    * every leaf is SUBSTRING search (phrases cross token boundaries,
    * '^' anchors the folded text) — the MATCH surface FTS5's trigram
    * tokenizer enables, probe-first pinned and fuzz-verified against
    * the sqlite3 binary in FtsTrigramSpec. One codegen'd predicate on
    * the scan (single-unit leaves compile to `contains`/`startsWith`
    * on the folded text — no token array on the hot path), no shuffle.
    * The oracle replays the substring semantics directly; the corpus
    * is lowercase ASCII, where the probed fold is the identity.
    */
  def ftsTrigramMatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    docs.filter(graft.operators.FtsTrigram.matchQuery(Seq(col("text")),
        """^the OR ("ctor ha" NOT "stream merge")"""))
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val ftsTrigramMatchOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
      |FROM documents
      |WHERE starts_with(lower(text), 'the')
      |   OR (contains(lower(text), 'ctor ha')
      |       AND NOT contains(lower(text), 'stream merge'))
      |ORDER BY doc_id""".stripMargin

  /** The index-accelerated twin of [[ftsTrigramMatch]]
    * ([[graft.operators.FtsTrigram.matchRowidsViaIndex]]): the same
    * boolean substring MATCH answered through the persisted trigram
    * posting lists — per-leaf gram intersections, set algebra over the
    * boolean structure, exact verify on the surviving candidates only.
    * The scale path when one corpus serves many substring queries (a
    * query reads its own grams' postings, never the corpus bytes).
    * Same oracle semantics as the predicate path.
    */
  def ftsTrigramIndexMatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    val idx = graft.operators.FtsTrigram.index(docs)
    graft.operators.FtsTrigram
      .matchRowidsViaIndex(docs, idx, """"ctor ha" OR ("window me" NOT "stream")""")
      .select(col("rowid").cast(LongType).as("doc_id"))
      .orderBy("doc_id")
  }

  val ftsTrigramIndexMatchOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id
      |FROM documents
      |WHERE contains(lower(text), 'ctor ha')
      |   OR (contains(lower(text), 'window me')
      |       AND NOT contains(lower(text), 'stream'))
      |ORDER BY doc_id""".stripMargin

  /** Extension — GLOB pattern search through the trigram index
    * ([[graft.operators.Trigram.globSearch]]): SQLite GLOB semantics
    * (case-sensitive whole-string, `*`/`?`/`[class]`, probed against
    * the binary), pruned by the literal runs' trigram postings and
    * verified with the anchored regex translation. The `[mw]erge`
    * class exercises run-breaking; DuckDB's GLOB agrees with SQLite on
    * every construct used here (negated classes diverge and are
    * spec-pinned against sqlite3 instead).
    */
  def trigramGlob(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    val idx = graft.operators.Trigram.index(docs)
    graft.operators.Trigram.globSearch(docs, idx, "*spark*[mw]erge*")
      .select(col("rowid").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val trigramGlobOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
      |FROM documents
      |WHERE text GLOB '*spark*[mw]erge*'
      |ORDER BY doc_id""".stripMargin

  /** Extension — SQL LIKE through the trigram index
    * ([[graft.operators.Trigram.likeSearch]]): `%`/`_` wildcards with
    * SQLite's ASCII-only case folding (probed; the regex verify folds
    * per ASCII letter, never `(?i)`). On this lowercase-ASCII corpus
    * DuckDB's case-sensitive LIKE is the exact oracle.
    */
  def trigramLike(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents").withColumnRenamed("doc_id", "rowid")
    val idx = graft.operators.Trigram.index(docs)
    graft.operators.Trigram.likeSearch(docs, idx, "%ve_tor%hash%")
      .select(col("rowid").cast(LongType).as("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val trigramLikeOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
      |FROM documents
      |WHERE text LIKE '%ve_tor%hash%'
      |ORDER BY doc_id""".stripMargin

  /** Extension — FTS5's column-WEIGHTED `bm25(t, w1, w2)`
    * ([[Fts.bm25MatchWeighted]]): the corpus splits each document's
    * token stream into a title (first third) and body, and the ranking
    * weights title hits 3x. Weighted-tf / raw-dl semantics probed off
    * the real FTS5 implementation and ordering cross-validated against
    * the binary in SqliteCliSpec; the oracle replays the identical
    * integer arithmetic with the weighted tf.
    */
  def ftsBm25Weighted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val toks = Fts.tokens(Seq(col("text")))
    val cut = greatest(floor(size(toks) / 3), lit(1)).cast("int")
    val two = docs.select(
      col("doc_id").cast(LongType).as("rowid"),
      array_join(slice(toks, lit(1), cut), " ").as("title"),
      array_join(slice(toks, cut + 1, greatest(size(toks) - cut, lit(0))), " ").as("body"))
    Fts.bm25MatchWeighted(two, Seq("title" -> 3L, "body" -> 1L), "spark vector hash", "rowid")
      .select(col("rowid").as("doc_id"), col("score"), col("terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val ftsBm25WeightedOracle: String = {
    val toks = DuckSql.tokens("text")
    s"""WITH base AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |split AS (
       |  SELECT doc_id, toks, greatest(len(toks) // 3, 1) AS cut FROM base),
       |stats AS (
       |  SELECT count(*) AS n,
       |    CAST((sum(len(toks)) // count(*)) * 1000000
       |      + ((sum(len(toks)) % count(*)) * 1000000) // count(*) AS BIGINT) AS avgdl_s
       |  FROM base),
       |tf AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, term,
       |    CAST(3 * len(list_filter(toks[1:cut], t -> t = term))
       |       + len(list_filter(toks[cut+1:], t -> t = term)) AS BIGINT) AS tfw
       |  FROM (SELECT doc_id, toks, cut, unnest(list_distinct(toks)) AS term FROM split)
       |  WHERE term IN ('spark', 'vector', 'hash')),
       |dfx AS (
       |  SELECT term,
       |    CAST(2 * (s.n - count(DISTINCT doc_id)) + 1 AS BIGINT) AS p,
       |    CAST(2 * count(DISTINCT doc_id) + 1 AS BIGINT) AS q
       |  FROM tf CROSS JOIN stats s GROUP BY term, s.n),
       |${DuckSql.ilog2Cte("dfx", "idf", Seq("term"))},
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    idf.idf2 * ((least(tf.tfw, 100000) * 44000000000000)
       |      // (least(tf.tfw, 100000) * 10000000 + 3000000
       |         + 9 * ((tf.dl * 1000000000000) // s.avgdl_s))) AS ts
       |  FROM tf JOIN idf USING (term) CROSS JOIN stats s)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(sum(ts) AS BIGINT) AS score,
       |  CAST(count(DISTINCT term) AS BIGINT) AS terms_hit
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  val ftsBm25Oracle: String = {
    val toks = DuckSql.tokens("text")
    s"""WITH base AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |stats AS (
       |  SELECT count(*) AS n,
       |    CAST((sum(len(toks)) // count(*)) * 1000000
       |      + ((sum(len(toks)) % count(*)) * 1000000) // count(*) AS BIGINT) AS avgdl_s
       |  FROM base),
       |tf AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, term,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM base)
       |  WHERE term IN ('spark', 'vector', 'hash')
       |  GROUP BY doc_id, dl, term),
       |dfx AS (
       |  SELECT term,
       |    CAST(2 * (s.n - count(DISTINCT doc_id)) + 1 AS BIGINT) AS p,
       |    CAST(2 * count(DISTINCT doc_id) + 1 AS BIGINT) AS q
       |  FROM tf CROSS JOIN stats s GROUP BY term, s.n),
       |${DuckSql.ilog2Cte("dfx", "idf", Seq("term"))},
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    idf.idf2 * ((least(tf.tf, 100000) * 44000000000000)
       |      // (least(tf.tf, 100000) * 10000000 + 3000000
       |         + 9 * ((tf.dl * 1000000000000) // s.avgdl_s))) AS ts
       |  FROM tf JOIN idf USING (term) CROSS JOIN stats s)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(sum(ts) AS BIGINT) AS score,
       |  CAST(count(DISTINCT term) AS BIGINT) AS terms_hit
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }
}
