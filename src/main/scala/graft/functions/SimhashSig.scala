package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in one codegen'd pass: split on space runs,
  * dedup tokens, token hash = first 64 bits of md5, signed bit sums.
  *
  * Exactly the values of the relational form (explode(split(text,' +'))
  * -> distinct -> first 16 hex chars of md5 as two 32-bit halves -> 64
  * conditional sums) that the DuckDB oracle computes — but with no explode
  * and no shuffle. Bit b of the signature is set when the signed sum of
  * token-hash bit b is positive; bit b of a token hash is bit b of the
  * big-endian value of the digest's first 8 bytes (so the oracle reads it
  * from the hex prefix: bits 0-31 from chars 9-16, bits 32-63 from 1-8).
  *
  * 64 bits (vs 16 in an earlier revision) keeps unrelated docs from
  * colliding at hamming 0: a 16-bit space has 65,536 values, so any
  * billion-doc corpus aliases constantly; 64-bit is the standard width.
  */
case class SimhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    SimhashSig.compute(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SimhashSig.compute($t)")
  override protected def withNewChildInternal(c: Expression): SimhashSig = copy(child = c)
}

object SimhashSig {
  private val mdLocal = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): Long = {
    val md = mdLocal.get()
    val s = text.toString
    val sums = new Array[Int](64)
    val seen = new java.util.HashSet[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        if (seen.add(tok)) {
          md.reset()
          val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 16 hex chars == first 8 bytes, big-endian
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
          var b = 0
          while (b < 64) {
            if (((v >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
            b += 1
          }
        }
      }
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }

  def simhash_sig(text: Column): Column =
    GraftShim.column(SimhashSig(GraftShim.expression(text)))
}
