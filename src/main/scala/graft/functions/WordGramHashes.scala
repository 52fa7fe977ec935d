package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, deduplicated array of 64-bit hashes of a document's WORD
  * n-grams (\S+ tokens joined by single spaces — the same tokenization
  * the decontamination oracle's relational form uses).
  *
  * The word-level sibling of [[GramHashes]]: replaces the
  * explode(token positions) -> array_to_string -> DISTINCT pipeline (row
  * count = token count, plus a dedup shuffle) with one tight loop per
  * document and no shuffle. Downstream: `size(gset)` is the distinct
  * n-gram count, SortedIntersectCount against a broadcast benchmark
  * array is the contamination overlap. Documents with fewer than n
  * tokens yield an empty array (no grams — the relational form's
  * `len(t) >= n` filter). Hash use is internally consistent only
  * (counting), like the rest of the gram-hash family. */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word-gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    WordGramHashes.compute(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.WordGramHashes.compute($t, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

object WordGramHashes {
  private val token = java.util.regex.Pattern.compile("\\S+")

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val words = new java.util.ArrayList[String]()
    val m = token.matcher(s)
    while (m.find()) words.add(m.group())
    val cnt = words.size - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val arr = new Array[Long](cnt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.get(i + j))
        j += 1
      }
      val g = UTF8String.fromString(sb.toString)
      arr(i) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0
    i = 0
    while (i < cnt) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  def word_gram_hashes(text: Column, n: Int): Column =
    GraftShim.column(WordGramHashes(GraftShim.expression(text), n))
}
