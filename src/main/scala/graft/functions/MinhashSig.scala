package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document MinHash signature as one codegen'd pass: for every distinct
  * character k-shingle, h = (first 60 bits of md5) mod P, then numHashes
  * affine rehashes h_j = (A_j*h + B_j) mod P with running minima.
  *
  * Produces EXACTLY the same values as the relational formulation
  * (explode shingles -> distinct -> conv(substring(md5(sh),1,15),16,10)
  * mod P -> 8 min-aggregates) that the DuckDB oracle runs — the first 15
  * hex chars of a digest are its first 60 bits — but with no shuffle at
  * all: one loop per document with an in-loop shingle dedup set.
  */
case class MinhashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    MinhashSig.compute(t.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.MinhashSig.compute($t, $k, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinhashSig = copy(child = c)
}

object MinhashSig {
  import graft.pipeline.Dedup.{mhA, mhB, MhMod}

  private val mdLocal = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String, k: Int, numHashes: Int): GenericArrayData = {
    val md = mdLocal.get()
    val n = text.numChars()
    val m = math.max(n - k + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val as = Array.tabulate(numHashes)(j => mhA(j + 1))
    val bs = Array.tabulate(numHashes)(j => mhB(j + 1))
    val seen = new java.util.HashSet[UTF8String](math.min(m * 2, 1 << 12))
    var i = 0
    while (i < m) {
      val sh = text.substringSQL(i + 1, k)
      if (seen.add(sh)) {
        md.reset()
        val digest = md.digest(sh.getBytes)
        // first 15 hex chars == first 60 bits, as an unsigned value
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
        val hs = (v >>> 4) % MhMod
        var j = 0
        while (j < numHashes) {
          val hj = (as(j) * hs + bs(j)) % MhMod
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash_sig(text: Column, k: Int, numHashes: Int): Column =
    GraftShim.column(MinhashSig(GraftShim.expression(text), k, numHashes))
}
