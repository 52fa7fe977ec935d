package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Embedded byte-pair-encoding vocabulary: merge rules trained ONCE, at
  * class init, from a fixed public-domain seed text by the standard
  * deterministic BPE trainer (most-frequent adjacent pair wins, ties to
  * the lexicographically smallest pair). Both the Spark expression
  * ([[BpeCount]]) and the DuckDB oracle (PipelineOracle.bpeTokens) read
  * THIS merge list, so the vocabulary exists in exactly one place — the
  * same single-source pattern BinAxis uses for bin edges.
  *
  * This is a real BPE — the merge loop is the GPT-2 `bpe()` algorithm
  * (minimum-rank adjacent pair merged until none applies; reference
  * encoder.py of the public GPT-2 release) over per-word character
  * symbols — with a small embedded vocabulary standing in for a
  * production merge table. For a real deployment the merge list is the
  * pluggable part: swap `merges` for a published tokenizer's table (50k
  * rows instead of 200) and nothing else changes.
  */
object BpeVocab {
  /** Pre-tokenizer shared with TextAnalysis.tokens' bpe-ish column:
    * letter runs | single digits | single other non-space chars. BPE
    * merges then run WITHIN each pre-token. */
  val WordRe: String = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Public-domain seed (United States Declaration of Independence,
    * 1776, opening; plus digits so numeric pre-tokens train too). */
  private val Seed: String =
    """When in the Course of human events, it becomes necessary for one
      |people to dissolve the political bands which have connected them
      |with another, and to assume among the powers of the earth, the
      |separate and equal station to which the Laws of Nature and of
      |Nature's God entitle them, a decent respect to the opinions of
      |mankind requires that they should declare the causes which impel
      |them to the separation. We hold these truths to be self-evident,
      |that all men are created equal, that they are endowed by their
      |Creator with certain unalienable Rights, that among these are
      |Life, Liberty and the pursuit of Happiness. July 4 1776.
      |""".stripMargin

  val NumMerges: Int = 200

  /** Ordered merge rules; rank = position. Deterministic: trainer ties
    * break lexicographically, so every JVM builds the same table. */
  lazy val merges: Vector[(String, String)] = train(Seed, NumMerges)

  /** rank lookup keyed "left right" (symbols never contain spaces: the
    * pre-tokenizer excludes whitespace). */
  lazy val ranks: java.util.HashMap[String, Integer] = ranksOf(merges)

  /** Standard BPE training: count adjacent symbol pairs over the word
    * frequency table, merge the most frequent pair everywhere, repeat.
    * Exposed for the determinism spec. */
  private[graft] def train(text: String, n: Int): Vector[(String, String)] = {
    import scala.collection.mutable
    val words = WordRe.r.findAllIn(text).toVector
    if (words.isEmpty) return Vector.empty
    // distinct words in sorted order: iteration order never depends on
    // hash-map internals
    var table: Vector[(Vector[String], Int)] = words.groupBy(identity).toVector
      .sortBy(_._1).map { case (w, g) => (symbols(w), g.size) }
    val out = Vector.newBuilder[(String, String)]
    var done = false
    var step = 0
    while (!done && step < n) {
      val pc = mutable.HashMap.empty[(String, String), Int]
      table.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0) + f)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val best = pc.toVector.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        table = table.map { case (syms, f) => (mergeAll(syms, best), f) }
        step += 1
      }
    }
    out.result()
  }

  /** Code-point symbols of a word (surrogate pairs stay whole). */
  private def symbols(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergeAll(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        b += syms(i) + syms(i + 1)
        i += 2
      } else {
        b += syms(i)
        i += 1
      }
    }
    b.result()
  }

  /** Encode one pre-token, returning its BPE token count. One merge per
    * iteration — the LEFTMOST occurrence of the minimum-rank pair — the
    * exact loop the oracle's recursive CTE runs. (Equivalent to merging
    * all occurrences per round: a merge can only create pairs of HIGHER
    * rank than the one it applied — a created pair contains the new
    * token, which the trainer learned later — so the minimum rank is
    * stable until its occurrences are exhausted left-to-right.) */
  def encodeCount(word: String): Int = encodeCount(word, ranks)

  private[graft] def encodeCount(word: String,
      rk: java.util.HashMap[String, Integer]): Int = encodeTokens(word, rk).size

  /** Encode one pre-token, returning its BPE token sequence (the worker
    * behind [[encodeCount]]). */
  def encodeTokens(word: String): java.util.ArrayList[String] =
    encodeTokens(word, ranks)

  private[graft] def encodeTokens(word: String,
      rk: java.util.HashMap[String, Integer]): java.util.ArrayList[String] = {
    // initial symbols are CODE POINTS, not UTF-16 units — the oracle's
    // substr/length are code-point-based, and a surrogate half is not a
    // character any merge table could contain
    val toks = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      toks.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    if (toks.size < 2) return toks
    var merging = true
    while (merging) {
      var bestRank = Int.MaxValue
      var pos = -1
      var j = 0
      while (j < toks.size - 1) {
        val r = rk.get(toks.get(j) + " " + toks.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; pos = j }
        j += 1
      }
      if (pos < 0) merging = false
      else {
        toks.set(pos, toks.get(pos) + toks.get(pos + 1))
        toks.remove(pos + 1)
      }
    }
    toks
  }

  private[graft] def ranksOf(m: Vector[(String, String)]): java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](m.size * 2)
    m.zipWithIndex.foreach { case ((a, b), i) => h.put(a + " " + b, i) }
    h
  }
}

/** Per-document BPE token count over the embedded [[BpeVocab]] — the
  * true-tokenizer counterpart of TextAnalysis.tokens' regex estimate,
  * exact enough to drive token-budget sampling. One pass per document,
  * no shuffle; whole-stage codegen via a static call, like GramHashes.
  */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    BpeCount.compute(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.BpeCount.compute($t)")
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  private val wordPattern = java.util.regex.Pattern.compile(BpeVocab.WordRe)

  // Per-thread bounded LRU of word -> count: natural-language corpora
  // repeat words heavily (Zipf), so most lookups skip the merge loop.
  // Thread-local => no contention in a 32-thread executor.
  private val memo: ThreadLocal[java.util.LinkedHashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, java.lang.Long](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
          size() > 65536
      })

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val m = wordPattern.matcher(s)
    val cache = memo.get()
    var total = 0L
    while (m.find()) {
      val w = m.group()
      var c = cache.get(w)
      if (c == null) {
        c = java.lang.Long.valueOf(BpeVocab.encodeCount(w).toLong)
        cache.put(w, c)
      }
      total += c.longValue()
    }
    total
  }

  def bpe_count(text: Column): Column =
    GraftShim.column(BpeCount(GraftShim.expression(text)))
}

/** Full BPE encode: the document's token sequence (pre-tokens in order,
  * merges within each) as Array[String] — the form packing/training jobs
  * consume; [[BpeCount]] is its length. Same one-pass, no-shuffle shape
  * and the same embedded [[BpeVocab]]; swap the merge table to tokenize
  * with a production vocabulary. */
case class BpeEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    BpeEncode.compute(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.BpeEncode.compute($t)")
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  private[functions] val wordPattern =
    java.util.regex.Pattern.compile(BpeVocab.WordRe)

  // word -> encoded UTF8String tokens; same bounded thread-local LRU
  // rationale as BpeCount's count memo (Zipf reuse, no contention)
  private[functions] def newMemo():
      ThreadLocal[java.util.LinkedHashMap[String, Array[UTF8String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[UTF8String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[UTF8String]]): Boolean =
          size() > 65536
      })

  private val memo = newMemo()

  /** The one encode worker: word-split, per-word memoized merge over the
    * given rank table — the embedded-vocab expression and the
    * runtime-table BpeEncodeWith both delegate here. */
  private[functions] def encodeWith(text: UTF8String,
      rk: java.util.HashMap[String, Integer],
      cache: java.util.LinkedHashMap[String, Array[UTF8String]])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = wordPattern.matcher(text.toString)
    val out = new java.util.ArrayList[UTF8String]()
    while (m.find()) {
      val w = m.group()
      var toks = cache.get(w)
      if (toks == null) {
        val enc = BpeVocab.encodeTokens(w, rk)
        toks = new Array[UTF8String](enc.size)
        var i = 0
        while (i < enc.size) { toks(i) = UTF8String.fromString(enc.get(i)); i += 1 }
        cache.put(w, toks)
      }
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    encodeWith(text, BpeVocab.ranks, memo.get())

  def bpe_encode(text: Column): Column =
    GraftShim.column(BpeEncode(GraftShim.expression(text)))
}

/** Code-point symbols of one pre-token: the BPE trainer's initial state
  * (surrogate pairs stay whole — the same contract as encodeTokens and
  * the oracle's character-based substr). */
case class CodePoints(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    CodePoints.compute(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CodePoints.compute($t)")
  override protected def withNewChildInternal(newChild: Expression): CodePoints =
    copy(child = newChild)
}

object CodePoints {
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out.add(UTF8String.fromString(new String(Character.toChars(cp))))
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  def code_points(text: Column): Column =
    GraftShim.column(CodePoints(GraftShim.expression(text)))
}

/** One BPE training round's apply step: merge every LEFT-TO-RIGHT
  * non-overlapping occurrence of (l, r) in the symbol array — exactly
  * BpeVocab.mergeAll, as a codegen expression over the distributed word
  * table. l and r are per-round constants (foldable literals). */
case class MergePair(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = first.dataType
  override protected def nullSafeEval(toks: Any, l: Any, r: Any): Any =
    MergePair.compute(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, l, r) => s"graft.functions.MergePair.compute($t, $l, $r)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MergePair = copy(first = f, second = s, third = t)
}

object MergePair {
  def compute(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      l: UTF8String, r: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && toks.getUTF8String(i).equals(l) &&
          toks.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(toks.getUTF8String(i))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  def merge_pair(toks: Column, l: Column, r: Column): Column =
    GraftShim.column(MergePair(GraftShim.expression(toks),
      GraftShim.expression(l), GraftShim.expression(r)))
}

/** BPE encode with a RUNTIME merge table (the output of
  * TextAnalysis.bpeTrain), closing the train → tokenize loop:
  * [[BpeEncode]] is this expression specialized to the embedded
  * BpeVocab table. The merge list is a constructor constant (driver-
  * collected, nMerges rows — bounded metadata), so the ranks map builds
  * once per executor and the per-word memo is thread-local exactly like
  * BpeEncode's. */
case class BpeEncodeWith(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  @transient private lazy val rk = BpeVocab.ranksOf(merges.toVector)
  @transient private lazy val memo = BpeEncode.newMemo()

  def encode(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    BpeEncode.encodeWith(text, rk, memo.get())

  override protected def nullSafeEval(t: Any): Any =
    encode(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeWith", this,
      classOf[BpeEncodeWith].getName)
    defineCodeGen(ctx, ev, t => s"$ref.encode($t)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWith =
    copy(child = newChild)
}

object BpeEncodeWith {
  def bpe_encode_with(text: Column, merges: Seq[(String, String)]): Column =
    GraftShim.column(BpeEncodeWith(GraftShim.expression(text), merges))
}
