package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{TrigramFold, TrigramTokens}
import graft.functions.TrigramTok
import graft.operators.Fts.{NearPhrase, isBarewordChar, lexQuery, nearMinGapOver, spanStarts}

/** FTS5 MATCH over a `tokenize='trigram'` table — the substring-search
  * MATCH surface (`sqlite.org/fts5.html#the_trigram_tokenizer`),
  * completing the probed tokenizer matrix (unicode61 rd0/rd1/rd2,
  * ascii, porter, trigram). The reference delegates MATCH semantics to
  * the SQLite binary (`/root/reference/csvs_to_sqlite/utils.py:379-383`
  * emits the DDL); the binary defines them, so every rule here is
  * probed against it (sqlite3 3.51.2) and fuzz-pinned in
  * FtsTrigramSpec.
  *
  * The QUERY grammar is FTS5's, tokenizer-independent — same lexer
  * ([[Fts.lexQuery]]), same operator binding (OR < AND < NOT <
  * juxtaposition), same pinned quirks (postfix '*' attaching across
  * whitespace, parenthesized groups needing explicit operators,
  * column filters/sets with '-' negation, '^' anchors, NEAR groups,
  * '+' phrase concatenation, empty operands dropped from juxtaposition
  * but match-nothing under explicit operators). What differs is what a
  * phrase's text TOKENIZES to, and trigram's answers (each probed):
  *
  *   - a unit's token list = every 3-codepoint window of its
  *     case-folded text ([[graft.functions.TrigramTok]]); whitespace
  *     and punctuation are literal stream characters ('"quick-brown"'
  *     matches that exact substring);
  *   - a '*' INSIDE a quoted phrase is a LITERAL character ('"y*z"'
  *     matches the text `xy*zw`) — unicode61 reads it as a separator;
  *   - the postfix '*' prefix flag lands on the unit's last gram —
  *     INERT, because a 3-cp prefix of a 3-cp token is equality
  *     ('abcd*' ≡ 'abcd', probed), but the syntax rules still apply
  *     (doubled star errors);
  *   - a unit of fewer than 3 codepoints has NO tokens and behaves
  *     exactly like the empty phrase '""': dropped from juxtaposition
  *     and NEAR argument lists, match-nothing under explicit
  *     operators ('hello ab' ≡ hello; 'hello AND ab' ≡ nothing;
  *     'NEAR(ab cd, 1)' ≡ nothing — all probed);
  *   - '+' concatenates TOKEN LISTS with positional adjacency, not
  *     strings: '"hell" + "llo"' matches "hello" (grams hel,ell,llo at
  *     consecutive stream offsets) while 'hel + llo' matches nothing
  *     (hel@p forces folded[p+1]='e', llo@p+1 forces 'l') — probed;
  *   - phrase adjacency over one unit's grams IS substring occurrence
  *     of the folded unit in the folded text, so single-unit leaves
  *     compile to a codegen'd `contains` on [[TrigramFold]] (and '^'
  *     anchors to `startsWith`) — no token array on the hot path;
  *   - NEAR positions are stream offsets (codepoint offsets): the gap
  *     between 'qui'@4 and 'fox'@16 is 11 ('NEAR(qui fox, 11)' matches,
  *     10 does not — probed); [[Fts.nearMinGapOver]] applies the same
  *     span-clump rule over trigram streams.
  *
  * Architecture: the parser builds one AST; two interpreters consume
  * it. [[matchQuery]] compiles the predicate (one Column, whole-stage
  * codegen, rides the scan, no shuffle — the right shape for one-shot
  * queries). [[matchRowidsViaIndex]] compiles a CANDIDATE superset
  * from the persisted [[index]] (posting-list intersections per
  * required phrase, set algebra over the boolean structure) and
  * exact-verifies only the candidates with the same predicate — the
  * scale path when one corpus serves MANY substring queries: a query
  * touches only its own grams' postings, never the corpus bytes,
  * exactly how an FTS5 trigram table answers MATCH/LIKE from the
  * index. Both paths are the same probed semantics; IndexSpec-style
  * equality is fuzz-pinned in FtsTrigramSpec.
  */
object FtsTrigram {

  /** Trigram MATCH predicate over unnamed columns (column filters in
    * the query need [[matchQueryNamed]] and error loudly here, as
    * [[Fts.matchQuery]]).
    */
  def matchQuery(cols: Seq[Column], query: String): Column = {
    val (node, _) = parse(cols.map("" -> _), None, query, TrigramTok.ModeFold0)
    predicate(node, TrigramTok.ModeFold0)
  }

  /** [[matchQuery]] under the tokenizer OPTION matrix — `case_sensitive
    * 1` (identity fold) or `remove_diacritics 1` (case fold + accent
    * strip + the 25 combining marks removed from the stream), both
    * folds probed per codepoint from the binary. Requesting BOTH is a
    * loud error, exactly the binary's tokenizer-constructor error
    * (probed). Semantics fuzz-pinned per mode in FtsTrigramSpec.
    */
  def matchQueryOpts(cols: Seq[Column], query: String,
      caseSensitive: Boolean = false, removeDiacritics: Boolean = false): Column = {
    require(!(caseSensitive && removeDiacritics),
      "error in tokenizer constructor (as FTS5): trigram case_sensitive 1 " +
        "cannot combine with remove_diacritics 1")
    val mode =
      if (caseSensitive) TrigramTok.ModeCaseSensitive
      else if (removeDiacritics) TrigramTok.ModeRd1
      else TrigramTok.ModeFold0
    val (node, _) = parse(cols.map("" -> _), None, query, mode)
    predicate(node, mode)
  }

  /** [[matchQuery]] over NAMED columns, enabling FTS5 column-filter
    * syntax (`a:term`, `{a b}:term`, `-a:term`, `a:(x OR y)` — the
    * filter machinery is tokenizer-independent and probed to behave
    * identically on trigram tables).
    */
  def matchQueryNamed(cols: Seq[(String, Column)], query: String): Column = {
    val (node, _) = parse(cols, Some(cols), query, TrigramTok.ModeFold0)
    predicate(node, TrigramTok.ModeFold0)
  }

  /** Distinct `(trigram, rowid)` inverted index under the PROBED fts5
    * fold — the MATCH-grade twin of [[Trigram.index]] (which folds
    * with SQL `lower()` for the LIKE accelerator; the two folds agree
    * on ASCII but diverge on codepoints like 'İ' where `lower()`
    * expands to two chars, so the MATCH path builds its own). One
    * explode + distinct, map-side combined, shuffled by trigram like
    * any inverted index.
    */
  def index(df: DataFrame, rowidCol: String = Rowid.ColName,
      textCol: String = "text"): DataFrame =
    df.select(col(rowidCol),
        explode(array_distinct(TrigramTokens.trigram_tokens(col(textCol)))).as("trigram"))

  /** Rowids matching a full boolean trigram MATCH query, answered
    * through the index: every REQUIRED phrase's grams prune via
    * posting-list intersection, the boolean structure combines the
    * per-leaf candidate sets (AND → rowid semi-join, OR → union, the
    * positive side of NOT prunes alone), and the surviving candidates
    * — usually orders of magnitude under the corpus — are
    * exact-verified with the compiled predicate. `corpus` must be the
    * SAME rows the index was built from. The result is EXACT; only
    * the pruning is approximate (grams-present does not imply
    * adjacency), the same stance as [[Trigram.search]] and [[Bloom]].
    *
    * When the boolean structure admits no index pruning (e.g. the
    * query is one big negation), the verify runs over the full corpus
    * — still correct, same cost as [[matchQuery]].
    */
  def matchRowidsViaIndex(corpus: DataFrame, idx: DataFrame, query: String,
      rowidCol: String = Rowid.ColName, textCol: String = "text"): DataFrame = {
    val (node, _) = parse(Seq("" -> col(textCol)), None, query, TrigramTok.ModeFold0)
    val verified = candidates(node, idx, rowidCol, TrigramTok.ModeFold0) match {
      case None => corpus
      case Some(cand) => corpus.join(cand, Seq(rowidCol), "left_semi")
    }
    verified.filter(predicate(node, TrigramTok.ModeFold0)).select(col(rowidCol))
  }

  /** FTS5 `highlight()` over a trigram table, on the RAW text: every
    * positive phrase occurrence's character range wraps in
    * `open`/`close`, overlapping AND touching spans coalesce, case
    * folding on both sides, anchored (`^`) phrases mark only an
    * occurrence at offset 0, a NOT operand's phrases never mark — all
    * probed against the binary. Supported queries: the boolean grammar
    * over single-unit phrases (bareword/quoted, which for trigram IS
    * substring semantics); NEAR groups and multi-unit '+'-chains are a
    * loud unsupported error rather than a silently wrong rendering.
    * One codegen'd expression per row, no shuffle.
    */
  def highlightRaw(textCol: Column, query: String,
      open: String = "<b>", close: String = "</b>"): Column = {
    val (node, _) = parse(Seq("" -> textCol), None, query, TrigramTok.ModeFold0)
    def needles(n: Node): Seq[(String, Boolean)] = n match {
      case NothingN => Seq.empty
      case LeafN(units, _, anchored) =>
        units.filter(u => TrigramTok.tokenize(u.text).nonEmpty) match {
          case Seq(only) => Seq((TrigramTok.fold(only.text), anchored))
          case _ => throw new IllegalArgumentException(
            s"trigram highlight does not support multi-unit '+'-chains: $query")
        }
      case NearN(_, _, _) => throw new IllegalArgumentException(
        s"trigram highlight does not support NEAR groups: $query")
      case AndN(l, r) => needles(l) ++ needles(r)
      case OrN(l, r) => needles(l) ++ needles(r)
      case NotN(l, _) => needles(l) // excluded operands never mark
    }
    val ns = needles(node).distinct
    if (ns.isEmpty) textCol
    else graft.expressions.TrigramHighlightRaw
      .trigram_highlight_raw(textCol, ns, open, close)
  }

  // ---- AST ------------------------------------------------------------

  /** One chain unit: raw text (quoted content verbatim, bareword as
    * written) + the postfix prefix-star flag.
    */
  private case class QUnit(text: String, starred: Boolean)

  private sealed trait Node
  /** Match-nothing (empty phrase / emptied filter context). */
  private case object NothingN extends Node
  /** A '+'-chain of units evaluated against resolved columns. */
  private case class LeafN(units: Vector[QUnit], cols: Seq[Column],
      anchored: Boolean) extends Node
  private case class NearN(args: Seq[Vector[QUnit]], n: Int,
      cols: Seq[Column]) extends Node
  private case class AndN(l: Node, r: Node) extends Node
  private case class OrN(l: Node, r: Node) extends Node
  /** `l NOT r` — binary, as FTS5. */
  private case class NotN(l: Node, r: Node) extends Node

  private def gramsOf(u: QUnit, mode: Int): Seq[(String, Boolean)] = {
    val g = TrigramTok.tokenize(u.text, mode)
    if (g.isEmpty) Seq.empty
    else g.init.map((_, false)).toSeq :+ ((g.last, u.starred))
  }

  private def chainTerms(units: Seq[QUnit], mode: Int): Seq[(String, Boolean)] =
    units.flatMap(gramsOf(_, mode))

  // ---- interpreter 1: the codegen predicate ---------------------------

  private def docToks(c: Column, mode: Int): Column = TrigramTokens.trigram_tokens(c, mode)
  private def docFold(c: Column, mode: Int): Column = TrigramFold.trigram_fold(c, mode)

  /** Phrase presence for a '+'-chain. Single-token-bearing-unit chains
    * take the folded-substring fast path; genuine multi-unit chains go
    * through the generic span scan over the trigram stream.
    */
  private def presence(colsIn: Seq[Column], units: Seq[QUnit], mode: Int): Column =
    units.filter(u => TrigramTok.tokenize(u.text, mode).nonEmpty) match {
      case Seq(only) =>
        val needle = TrigramTok.fold(only.text, mode)
        colsIn.map(c => coalesce(docFold(c, mode).contains(needle), lit(false)))
          .reduce(_ || _)
      case nonEmpty =>
        val np = NearPhrase(chainTerms(nonEmpty, mode))
        colsIn.map(c =>
            coalesce(size(spanStarts(docToks(c, mode), np)._1) > 0, lit(false)))
          .reduce(_ || _)
    }

  /** '^'-anchored chain: the phrase must start at stream offset 0 —
    * for a single unit, `startsWith` on the folded text; for a
    * multi-unit chain, a positional conjunction at positions 1..l.
    */
  private def anchoredPresence(colsIn: Seq[Column], units: Seq[QUnit], mode: Int): Column =
    units.filter(u => TrigramTok.tokenize(u.text, mode).nonEmpty) match {
      case Seq(only) =>
        val needle = TrigramTok.fold(only.text, mode)
        colsIn.map(c => coalesce(docFold(c, mode).startsWith(needle), lit(false)))
          .reduce(_ || _)
      case nonEmpty =>
        val terms = chainTerms(nonEmpty, mode)
        colsIn.map { c =>
          val toks = docToks(c, mode)
          val conj = terms.zipWithIndex.map { case ((t, pfx), k) =>
            val tok = try_element_at(toks, lit(k + 1))
            if (pfx) tok.startsWith(t) else tok === lit(t)
          }.reduce(_ && _)
          coalesce(conj, lit(false))
        }.reduce(_ || _)
    }

  private def predicate(node: Node, mode: Int): Column = node match {
    case NothingN => lit(false)
    case LeafN(units, cols, false) => presence(cols, units, mode)
    case LeafN(units, cols, true) => anchoredPresence(cols, units, mode)
    case NearN(args, n, cols) => args match {
      case Seq(only) => presence(cols, only, mode)
      case many =>
        val nps = many.map(u => NearPhrase(chainTerms(u, mode)))
        coalesce(nearMinGapOver(cols.map(docToks(_, mode)), nps) <= n, lit(false))
    }
    case AndN(l, r) => predicate(l, mode) && predicate(r, mode)
    case OrN(l, r) => predicate(l, mode) || predicate(r, mode)
    case NotN(l, r) => predicate(l, mode) && !predicate(r, mode)
  }

  // ---- interpreter 2: index candidate sets ----------------------------

  /** Required-gram sets per node, combined over the boolean structure.
    * `None` = "no pruning possible from here" (the index cannot bound
    * the match set — only negations produce it); `Some(df)` = a SAFE
    * SUPERSET of the node's matching rowids. Adjacency and anchoring
    * are ignored at prune stage (verify restores exactness).
    */
  private def candidates(node: Node, idx0: DataFrame,
      rowidCol: String, mode: Int): Option[DataFrame] = {
    def allGrams(unitss: Seq[Vector[QUnit]]): Seq[String] =
      unitss.flatMap(us => chainTerms(us, mode).map(_._1)).distinct
    // ONE pass over the full index: pre-filter to the union of every
    // leaf's grams and materialize (eager checkpoint) — per-leaf
    // intersections then read the tiny filtered postings instead of
    // re-scanning the index once per leaf. A query with no grams at
    // all (pure negation / all-empty) never touches the index.
    def collectGrams(n: Node): Seq[String] = n match {
      case NothingN => Seq.empty
      case LeafN(units, _, _) => allGrams(Seq(units))
      case NearN(args, _, _) => allGrams(args)
      case AndN(l, r) => collectGrams(l) ++ collectGrams(r)
      case OrN(l, r) => collectGrams(l) ++ collectGrams(r)
      case NotN(l, _) => collectGrams(l)
    }
    val union = collectGrams(node).distinct
    lazy val idx =
      if (union.isEmpty) idx0
      else idx0.filter(col("trigram").isin(union: _*)).localCheckpoint(true)
    def rowsWithAll(grams: Seq[String]): DataFrame = {
      // rows whose posting lists contain EVERY gram: one aggregation
      // over the shared gram-filtered postings (tiny — selectivity ~
      // product of gram frequencies), no self-join
      idx.filter(col("trigram").isin(grams: _*))
        .groupBy(col(rowidCol))
        .agg(countDistinct(col("trigram")).as("__ng"))
        .filter(col("__ng") === lit(grams.size.toLong))
        .select(col(rowidCol))
    }
    def walk(node: Node): Option[DataFrame] = node match {
      case NothingN => Some(idx0.filter(lit(false)).select(col(rowidCol)))
      case LeafN(units, _, _) => Some(rowsWithAll(allGrams(Seq(units))))
      case NearN(args, _, _) => Some(rowsWithAll(allGrams(args)))
      case AndN(l, r) =>
        (walk(l), walk(r)) match {
          case (Some(a), Some(b)) => Some(a.join(b, Seq(rowidCol), "left_semi"))
          case (a, b) => a.orElse(b)
        }
      case OrN(l, r) =>
        for { a <- walk(l); b <- walk(r) } yield a.unionByName(b).distinct()
      case NotN(l, _) => walk(l)
    }
    walk(node)
  }

  // ---- the parser (shared by both interpreters) -----------------------

  private def parse(universeCols: Seq[(String, Column)],
      named: Option[Seq[(String, Column)]], query: String, mode: Int): (Node, Boolean) = {
    // column CONTEXT machinery — identical to Fts.matchQueryImpl
    // (tokenizer-independent, probed to behave the same on trigram
    // tables): filters RESTRICT the context, nested filters intersect,
    // an emptied context matches nothing without error
    type Ctx = Seq[(String, Column)]
    val universe: Ctx = universeCols
    def resolveSet(names: Seq[String], negate: Boolean, ctx: Ctx): Ctx = {
      val ns = named.getOrElse(throw new IllegalArgumentException(
        s"column filter needs named columns — use FtsTrigram.matchQueryNamed: $query"))
      val uniq = names.map(_.toLowerCase).distinct
      uniq.foreach { n =>
        if (!ns.exists(_._1.equalsIgnoreCase(n)))
          throw new IllegalArgumentException(
            s"no such FTS column '$n' in query: $query")
      }
      if (negate) ctx.filterNot { case (n, _) => uniq.contains(n.toLowerCase) }
      else ctx.filter { case (n, _) => uniq.contains(n.toLowerCase) }
    }
    val lexemes = lexQuery(query)
    var pos = 0
    def peek: Option[String] = if (pos < lexemes.length) Some(lexemes(pos)) else None
    def next(): String = {
      require(pos < lexemes.length,
        s"syntax error: unexpected end of FTS query (as FTS5): $query")
      val l = lexemes(pos); pos += 1; l
    }
    // one unit: quoted content VERBATIM (for trigram a '*' inside the
    // quotes is a literal stream character — probed), or a bareword of
    // FTS5 bareword characters (punctuation in a bare query word is a
    // loud syntax error, operator keywords in operand position error —
    // the query SYNTAX rules are tokenizer-independent)
    def unit(lx: String): QUnit = lx match {
      case p if p.startsWith("\"") =>
        QUnit(p.substring(1, p.length - 1), starred = false)
      case w =>
        require(w != "(" && w != ")" && w != ":" && w != "{" && w != "}"
          && w != "+" && w != "*" && !w.startsWith("^") && !w.startsWith("-"),
          s"unexpected '$w' in FTS query: $query")
        require(w != "AND" && w != "OR" && w != "NOT",
          s"syntax error near '$w' (operator in operand position, as FTS5): $query")
        require(w.forall(isBarewordChar),
          s"syntax error near '$w' (punctuation inside a bare query word, as FTS5): $query")
        QUnit(w, starred = false)
    }
    // a '+'-chain of units with postfix stars (same attach rules as the
    // unicode61 grammar: star binds across whitespace to the preceding
    // unit, doubled star errors — probed on trigram tables too)
    def parseChain(firstLexeme: String): Vector[QUnit] = {
      var units = Vector(unit(firstLexeme))
      var lastStarred = false
      def absorbStars(): Unit =
        while (peek.contains("*")) {
          next()
          require(!lastStarred, s"syntax error near '*' (as FTS5): $query")
          lastStarred = true
          units = units.init :+ units.last.copy(starred = true)
        }
      absorbStars()
      while (peek.contains("+")) {
        next()
        require(peek.isDefined, s"dangling '+' in FTS query: $query")
        units = units :+ unit(next())
        lastStarred = false
        absorbStars()
      }
      units
    }
    // NEAR(p1 … pk [, N]) — same arg grammar as the unicode61 parser
    // (one comma, only the integer N after it, '^' rejected inside,
    // '+' glues, empty-token units DROP from the argument list — all
    // probed on trigram: 'NEAR(abc ef, 1)' ≡ 'NEAR(abc)')
    def nearGroup(ctx: Ctx): (Node, Boolean) = {
      next() // "("
      val args = scala.collection.mutable.ArrayBuffer.empty[Vector[QUnit]]
      var n = 10
      var sawComma = false
      var nRead = false
      var gluePlus = false
      var lastStarred = false
      def pushUnit(u: QUnit): Unit = {
        require(!sawComma,
          s"syntax error: only the N integer may follow ',' in NEAR (as FTS5): $query")
        if (gluePlus) {
          require(args.nonEmpty, s"dangling '+' in NEAR: $query")
          args(args.length - 1) = args.last :+ u
          gluePlus = false
        } else args += Vector(u)
        lastStarred = false
      }
      while (!peek.contains(")")) {
        val raw = next()
        require(!raw.startsWith("^"), s"'^' is not allowed inside NEAR (as FTS5): $query")
        if (raw == "+") {
          require(!sawComma, s"syntax error near '+' after ',' in NEAR: $query")
          gluePlus = true
        } else if (raw == "*") {
          require(!sawComma && !gluePlus && args.nonEmpty && !lastStarred,
            s"syntax error near '*' in NEAR (as FTS5): $query")
          lastStarred = true
          args(args.length - 1) =
            args.last.init :+ args.last.last.copy(starred = true)
        } else if (raw.startsWith("\"")) {
          pushUnit(unit(raw))
        } else {
          var first = true
          for (seg <- raw.split(",", -1)) {
            if (!first) {
              require(!sawComma, s"syntax error near ',' in NEAR (as FTS5): $query")
              sawComma = true
            }
            first = false
            val s = seg.trim
            if (s.nonEmpty) {
              if (sawComma) {
                require(!nRead && s.forall(_.isDigit),
                  s"syntax error: N must be one integer after ',' in NEAR (as FTS5): $query")
                n = s.toInt; nRead = true
              } else {
                require(s.forall(isBarewordChar),
                  s"syntax error near '$s' in NEAR (as FTS5): $query")
                pushUnit(QUnit(s, starred = false))
              }
            }
          }
        }
      }
      require(!gluePlus, s"dangling '+' in NEAR: $query")
      require(!sawComma || nRead, s"missing N after ',' in NEAR (as FTS5): $query")
      require(args.nonEmpty, s"syntax error: empty NEAR() (as FTS5): $query")
      next() // ")"
      val phrases = args.toSeq.filter(u => chainTerms(u, mode).nonEmpty)
      phrases match {
        case Seq() => (NothingN, true) // all-empty NEAR: droppable
        case _ if ctx.isEmpty => (NothingN, false)
        case some => (NearN(some, n, ctx.map(_._2)), false)
      }
    }
    def chainNode(ctx: Ctx, units: Vector[QUnit], anchor: Boolean): (Node, Boolean) =
      if (chainTerms(units, mode).isEmpty) (NothingN, true) // no tokens: droppable
      else if (ctx.isEmpty) (NothingN, false) // emptied filter ctx
      else (LeafN(units, ctx.map(_._2), anchor), false)
    def operandFrom(lx: String, ctx: Ctx): (Node, Boolean) = lx match {
      case "NEAR" if peek.contains("(") => nearGroup(ctx)
      case "^" if peek.isDefined => chainNode(ctx, parseChain(next()), anchor = true)
      case w if w.startsWith("^") && w.length > 1 =>
        chainNode(ctx, parseChain(w.drop(1)), anchor = true)
      case other => chainNode(ctx, parseChain(other), anchor = false)
    }
    def colOperand(ctx: Ctx): (Node, Boolean) = {
      require(peek.exists(l => l != ")" && l != ":" && l != "{" && l != "}"),
        s"missing operand after column filter in FTS query: $query")
      operandFrom(next(), ctx)
    }
    def readColSetNames(): Seq[String] = {
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (!peek.contains("}")) {
        require(peek.exists(l =>
          l != "(" && l != ")" && l != ":" && l != "{" && !l.startsWith("\"")),
          s"bad column set in FTS query: $query")
        names += next()
      }
      next() // "}"
      require(names.nonEmpty, s"empty column set in FTS query: $query")
      names.toSeq
    }
    def filterBody(ctx: Ctx): (Node, Boolean, Boolean) =
      if (peek.contains("(")) {
        next()
        val inner = orExpr(ctx)
        require(peek.contains(")"), s"missing ')' in FTS query: $query"); next()
        (inner, false, true)
      } else {
        val (c, drop) = colOperand(ctx); (c, drop, false)
      }
    def afterColon(ctx: Ctx): (Node, Boolean, Boolean) = {
      require(peek.contains(":"), s"expected ':' after column set in FTS query: $query")
      next()
      filterBody(ctx)
    }
    def primary(ctx: Ctx): (Node, Boolean, Boolean) = next() match {
      case "(" =>
        val inner = orExpr(ctx)
        require(peek.contains(")"), s"missing ')' in FTS query: $query"); next()
        (inner, false, true)
      case "{" => afterColon(resolveSet(readColSetNames(), negate = false, ctx))
      case "-" if peek.contains("{") =>
        next(); afterColon(resolveSet(readColSetNames(), negate = true, ctx))
      case w if w.startsWith("-") && w.length > 1 && peek.contains(":") =>
        next(); filterBody(resolveSet(Seq(w.drop(1)), negate = true, ctx))
      case w if !w.startsWith("\"") && !w.startsWith("^") && w != "NEAR" && peek.contains(":") =>
        next(); filterBody(resolveSet(Seq(w), negate = false, ctx))
      case lx => val (c, d) = operandFrom(lx, ctx); (c, d, false)
    }
    def juxtaList(ctx: Ctx): Node = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[Node]
      val (c0, drop0, paren0) = primary(ctx)
      var lastParen = paren0
      if (!drop0) kept += c0
      while (peek.exists(l => l != ")" && l != "OR" && l != "NOT" && l != "AND")) {
        val (c2, drop2, paren2) = primary(ctx)
        require(!lastParen && !paren2,
          s"syntax error: a parenthesized group needs an explicit AND/OR/NOT (as FTS5): $query")
        lastParen = paren2
        if (!drop2) kept += c2
      }
      if (kept.isEmpty) NothingN else kept.reduce(AndN(_, _))
    }
    def notExpr(ctx: Ctx): Node = {
      var acc = juxtaList(ctx)
      while (peek.contains("NOT")) { next(); acc = NotN(acc, juxtaList(ctx)) }
      acc
    }
    def andExpr(ctx: Ctx): Node = {
      var acc = notExpr(ctx)
      while (peek.contains("AND")) { next(); acc = AndN(acc, notExpr(ctx)) }
      acc
    }
    def orExpr(ctx: Ctx): Node = {
      var acc = andExpr(ctx)
      while (peek.contains("OR")) { next(); acc = OrN(acc, andExpr(ctx)) }
      acc
    }
    require(lexemes.nonEmpty, "empty FTS query")
    val result = orExpr(universe)
    require(pos == lexemes.length, s"trailing tokens in FTS query: $query")
    (result, false)
  }
}
