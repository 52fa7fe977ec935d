package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, deduplicated array of 64-bit hashes of a document's character
  * k-grams, salted by a blocking key (source).
  *
  * Replaces the explode(positions) -> substring -> hash -> DISTINCT
  * pipeline (row count = total characters, plus a dedup shuffle) with ONE
  * tight loop per document and NO shuffle — the gram-set relation
  * becomes a per-row array. Downstream set sizes are `size(gset)`, the
  * exploded relation is `explode(gset)` (already deduped), and pairwise
  * intersections run on the sorted arrays via SortedIntersectCount.
  *
  * The hash itself only needs to be internally consistent (candidate
  * generation); the final jaccard output is hash-independent (PPJoin
  * soundness), so no oracle mirror of the hash function is needed.
  */
case class GramHashes(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any, s: Any): Any =
    GramHashes.compute(t.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.functions.GramHashes.compute($t, $s, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GramHashes =
    copy(left = l, right = r)
}

object GramHashes {
  def compute(text: UTF8String, source: UTF8String, k: Int): GenericArrayData = {
    val n = text.numChars()
    val m = math.max(n - k + 1, 1)
    val seed = XXH64.hashUnsafeBytes(
      source.getBaseObject, source.getBaseOffset, source.numBytes, 42L)
    val arr = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sub = text.substringSQL(i + 1, k)
      arr(i) = XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes, seed)
      i += 1
    }
    java.util.Arrays.sort(arr)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  def gram_hashes(text: Column, source: Column, k: Int): Column =
    GraftShim.column(GramHashes(GraftShim.expression(text), GraftShim.expression(source), k))
}
