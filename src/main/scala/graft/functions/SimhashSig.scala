package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a document in one codegen'd pass: split on space runs,
  * dedup tokens, token hash = first 16 bits of md5, signed bit sums.
  *
  * Exactly the values of the relational form (explode(split(text,' +'))
  * -> distinct -> ('0x'||substr(md5(tok),1,4))::BIGINT -> 16 conditional
  * sums) that the DuckDB oracle computes — the first 4 hex chars of a
  * digest are its first 16 bits — but with no explode and no shuffle.
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
    val sums = new Array[Int](16)
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
          // first 4 hex chars == first 16 bits
          val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
          var b = 0
          while (b < 16) {
            if (((v >> b) & 1) == 1) sums(b) += 1 else sums(b) -= 1
            b += 1
          }
        }
      }
    }
    var sh = 0L
    var b = 0
    while (b < 16) {
      if (sums(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }

  def simhash_sig(text: Column): Column =
    GraftShim.column(SimhashSig(GraftShim.expression(text)))
}
