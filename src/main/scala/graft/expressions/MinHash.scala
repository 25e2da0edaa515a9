package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the MinHash/SimHash dedup pipeline.
  *
  * The Column-function spelling of shingle hashing is a deep
  * higher-order-function tree (`array_distinct(transform(shingles(...)))`
  * with an md5 per element) — HOFs are CodegenFallback, so every element
  * costs an interpreted expression walk with boxing, and the huge tree
  * inflates whole-stage-codegen compile time on every cold run. These
  * expressions collapse tokenize → shingle → md5 → distinct (and the
  * numPerms-way affine-min signature) into one static JVM call per row:
  * plain JIT'd loops, tiny expression trees, identical semantics.
  *
  * Parity contract (pinned by TextDedupSpec against the HOF spelling and
  * by the DuckDB oracle):
  *   - tokens  = array_remove(split(lower(s), "[^a-z0-9]+"), "")
  *   - shingle = space-joined w-grams; docs with < w tokens yield ONE
  *               shingle = all tokens joined (empty string for no tokens)
  *   - hash60  = conv(substring(md5(utf8), 1, 15), 16, 10) = top 60 bits
  *               of the md5 digest
  *   - distinct keeps first-occurrence order
  *   - sig[s]  = min over hashes of ((h%P)*(2s+1) + (12345s+677)) % P,
  *               null (not MaxValue) for an empty hash array
  */
object MinHashKernel {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val splitter = Pattern.compile("[^a-z0-9]+")

  /** The DEDUP tokenizer — `lower` + split on `[^a-z0-9]+` (UTF8String
    * lowercase for byte-parity with Spark's `lower`), the shingling
    * contract every dedup oracle replicates in DuckDB SQL. Deliberately
    * NOT [[graft.operators.Fts.tokens]]: FTS carries SQLite's unicode61
    * fidelity ([[graft.functions.Unicode61]]), while shingle identity
    * is an engine design choice that only needs to be deterministic and
    * oracle-replicable.
    */
  def tokens(text: UTF8String): Array[String] = {
    val parts = splitter.split(text.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) n += 1; i += 1 }
    if (n == parts.length) parts
    else {
      val out = new Array[String](n)
      var j = 0
      i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) { out(j) = parts(i); j += 1 }
        i += 1
      }
      out
    }
  }

  /** Top 60 bits of md5 — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` ([[graft.functions.PortableHash.hash60]]).
    */
  def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val top =
      ((b(0) & 0xFFL) << 56) | ((b(1) & 0xFFL) << 48) |
      ((b(2) & 0xFFL) << 40) | ((b(3) & 0xFFL) << 32) |
      ((b(4) & 0xFFL) << 24) | ((b(5) & 0xFFL) << 16) |
      ((b(6) & 0xFFL) << 8) | (b(7) & 0xFFL)
    top >>> 4
  }

  /** Distinct (first-seen order) hash60 of w-shingles of `text`. */
  def shingleHashes(text: UTF8String, w: Int): ArrayData = {
    val toks = tokens(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length >= w) {
      val sb = new java.lang.StringBuilder(w * 12)
      var i = 0
      while (i <= toks.length - w) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(hash60(sb.toString))
        i += 1
      }
    } else {
      seen.add(hash60(toks.mkString(" ")))
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** hash60 per w-shingle, POSITIONAL: order kept, NOT distinct — the
    * contamination-span input, where consecutive-run extraction needs
    * every occurrence at its position (set semantics would delete
    * repeats and split runs).
    */
  def shingleHashSeq(text: UTF8String, w: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length >= w) {
      val out = new Array[Long](toks.length - w + 1)
      val sb = new java.lang.StringBuilder(w * 12)
      var i = 0
      while (i <= toks.length - w) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = hash60(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array(hash60(toks.mkString(" "))))
    }
  }

  /** hash60 per token, order kept, NOT distinct (the SimHash input —
    * frequency-weighted bit votes need every occurrence).
    */
  def tokenHashes(text: UTF8String): ArrayData = {
    val toks = tokens(text)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = hash60(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Tokens that are members of `words`, counted with multiplicity. */
  def stopwordHits(text: UTF8String, words: java.util.HashSet[String]): Long = {
    val toks = tokens(text)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (words.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  private val P = graft.functions.PortableHash.P

  /** numPerms affine-min signature over a hash array. */
  def minhashSig(hashes: ArrayData, numPerms: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) {
      // array_min over an empty transform yields null per perm — keep it
      return new GenericArrayData(Array.fill[Any](numPerms)(null))
    }
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i) % P
      var s = 0
      while (s < numPerms) {
        val v = (h * (2L * s + 1L) + (12345L * s + 677L)) % P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Winnowing selection (Schleimer–Wilkerson–Aiken, SIGMOD'03): over
    * every window of `w` consecutive hashes, select the minimum —
    * rightmost on ties — and record each selected POSITION once
    * (1-based, ascending). Documents with fewer than `w` hashes use one
    * window covering all of them. O(P) via a monotonic deque (back-pop
    * on `>=` keeps the LATEST index among equal minima, which is
    * exactly the rightmost-tie rule).
    *
    * Selections of overlapping windows form contiguous runs (a position
    * inside two windows is inside every window between them), so
    * "record on change" emits precisely the distinct selected set.
    */
  def winnowPositions(hashes: ArrayData, w: Int): ArrayData = {
    val p = hashes.numElements()
    if (p == 0) return new GenericArrayData(Array.emptyLongArray)
    val we = math.min(w, p)
    val h = new Array[Long](p)
    var i = 0
    while (i < p) { h(i) = hashes.getLong(i); i += 1 }
    val out = new java.util.ArrayList[Long](2 * p / (we + 1) + 2)
    val deque = new Array[Int](p)
    var head = 0
    var tail = 0
    var last = -1
    var e = 0
    while (e < p) {
      while (tail > head && h(deque(tail - 1)) >= h(e)) tail -= 1
      deque(tail) = e; tail += 1
      if (e >= we - 1) {
        while (deque(head) < e - we + 1) head += 1
        val m = deque(head)
        if (m != last) { out.add((m + 1).toLong); last = m }
      }
      e += 1
    }
    val arr = new Array[Long](out.size)
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }
}

/** `stopword_hits(text, words)`: tokens of `text` that are members of
  * `words`, counted with multiplicity — the per-language scoring loop of
  * language-ID and the stopword-ratio of quality scoring. The
  * `size(filter(tokens, isin(...)))` spelling is a CodegenFallback HOF
  * with an interpreted `isin` per token; here it is one tokenizer pass
  * plus hash-set membership.
  */
case class StopwordHits(child: Expression, words: Seq[String]) extends UnaryExpression {

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.stopwordHits(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashKernel.stopwordHits($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  def stopword_hits(text: Column, words: Seq[String]): Column =
    GraftShim.column(StopwordHits(GraftShim.expression(text), words))
}

/** `shingle_hash60(text, w)` — see [[MinHashKernel.shingleHashes]]. */
case class ShingleHash60(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashKernel.shingleHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {
  def shingle_hash60(text: Column, w: Int): Column =
    GraftShim.column(ShingleHash60(GraftShim.expression(text), w))
}

/** `shingle_hash_seq60(text, w)` — see [[MinHashKernel.shingleHashSeq]]. */
case class ShingleHashSeq60(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHashSeq(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashKernel.shingleHashSeq($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSeq60 =
    copy(child = newChild)
}

object ShingleHashSeq60 {
  def shingle_hash_seq60(text: Column, w: Int): Column =
    GraftShim.column(ShingleHashSeq60(GraftShim.expression(text), w))
}

/** `token_hash60(text)` — see [[MinHashKernel.tokenHashes]]. */
case class TokenHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.tokenHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashKernel.tokenHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenHash60 =
    copy(child = newChild)
}

object TokenHash60 {
  def token_hash60(text: Column): Column =
    GraftShim.column(TokenHash60(GraftShim.expression(text)))
}

/** `minhash_sig(hashes, numPerms)` — see [[MinHashKernel.minhashSig]]. */
case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression {
  require(numPerms >= 1, "numPerms must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.minhashSig(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashKernel.minhashSig($c, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhash_sig(hashes: Column, numPerms: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(hashes), numPerms))
}

/** `winnow_pos(hashes, w)` — see [[MinHashKernel.winnowPositions]]. */
case class WinnowPos(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 2, "winnowing window must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.winnowPositions(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashKernel.winnowPositions($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowPos =
    copy(child = newChild)
}

object WinnowPos {
  def winnow_pos(hashes: Column, w: Int): Column =
    GraftShim.column(WinnowPos(GraftShim.expression(hashes), w))
}
