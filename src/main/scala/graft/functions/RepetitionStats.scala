package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE codegen'd pass: token count,
  * distinct-token count, and the highest token / adjacent-bigram
  * frequencies — the signals behind Gopher-style repetition filters for
  * training-data curation (duplicate-word fraction, top-n-gram fraction).
  *
  * The relational formulation (explode tokens -> two groupBys per doc)
  * shuffles one row per token; this expression is map-only, so the whole
  * repetition-filter pass over a 100 TB corpus has NO shuffle at all.
  * Tokenization is trim + split on runs of spaces, mirrored in the oracle
  * as string_split_regex(trim(text), ' +').
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_token_cnt", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false)))
  override protected def nullSafeEval(t: Any): Any =
    RepetitionStats.compute(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.RepetitionStats.compute($t)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.trim.split(" +") // [""] for all-space input
    val wc = new java.util.HashMap[String, Long](toks.length * 2)
    toks.foreach(t => wc.merge(t, 1L, _ + _))
    var topTok = 0L
    wc.values.forEach(v => if (v > topTok) topTok = v)
    var topBig = 0L
    if (toks.length > 1) {
      val bc = new java.util.HashMap[String, Long](toks.length * 2)
      var i = 0
      while (i < toks.length - 1) {
        bc.merge(toks(i) + " " + toks(i + 1), 1L, _ + _)
        i += 1
      }
      bc.values.forEach(v => if (v > topBig) topBig = v)
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, wc.size.toLong, topTok, topBig))
  }

  def repetition_stats(text: Column): Column =
    GraftShim.column(RepetitionStats(GraftShim.expression(text)))
}
