package graft.oracle

import graft.axes.BinAxis

/** DuckDB oracle-SQL generator mirroring [[graft.operators.Histogram]].
  *
  * Each histogram query's oracle is generated from the SAME BinAxis object
  * that drives the Spark plan, so bin semantics (half-open bins, flow
  * labels, literal edges) exist in exactly one place. Arithmetic is limited
  * to IEEE-pinned operations and DECIMAL(38,10) sums — identical bits in
  * both engines.
  */
object Oracle {

  /** One histogrammed variable: a SQL value expression + its axis. */
  final case class Spec(valueSql: String, axis: BinAxis)

  def hist(table: String, specs: Seq[Spec], dims: Seq[String] = Nil,
      weightSql: Option[String] = None, density: Boolean = false,
      flow: Boolean = false, dense: Boolean = false, intStorage: Boolean = false,
      where: Option[String] = None): String = {
    val idx = specs.indices.map(k => s"__i$k")
    val dimsSel = if (dims.isEmpty) "" else dims.mkString("", ", ", ", ")
    val idxExprs = specs.zipWithIndex
      .map { case (s, k) => s"${s.axis.indexSql(s.valueSql)} AS __i$k" }
      .mkString(", ")
    val wSel = weightSql.map(w => s", CAST($w AS DECIMAL(38,10)) AS __w").getOrElse("")
    val whereSql = where.map(w => s" WHERE $w").getOrElse("")

    val keep = specs.zipWithIndex.map { case (s, k) =>
      val lo = if (flow && s.axis.underflow) -1 else 0
      val hi = if (flow && s.axis.overflow) s.axis.nBins else s.axis.nBins - 1
      s"__i$k IS NOT NULL AND __i$k >= $lo AND __i$k <= $hi"
    }.mkString(" AND ")

    val cntExpr = weightSql match {
      case Some(_) => "CAST(SUM(__w) AS DOUBLE)"
      case None if intStorage => "COUNT(*)"
      case None => "CAST(COUNT(*) AS DOUBLE)"
    }
    val groupCols = (dims ++ idx).mkString(", ")

    val sb = new StringBuilder
    sb ++= s"WITH __idx AS (SELECT $dimsSel$idxExprs$wSel FROM $table$whereSql), "
    sb ++= s"__f AS (SELECT * FROM __idx WHERE $keep), "
    sb ++= s"__g0 AS (SELECT $groupCols, $cntExpr AS cnt FROM __f GROUP BY $groupCols)"

    var gTable = "__g0"
    if (dense) {
      val grids = specs.zipWithIndex.map { case (s, k) =>
        val lo = if (flow && s.axis.underflow) -1 else 0
        val hi = if (flow && s.axis.overflow) s.axis.nBins else s.axis.nBins - 1
        s"(SELECT CAST(UNNEST(generate_series($lo, $hi)) AS BIGINT) AS __i$k) __t$k"
      }
      val keySrc =
        if (dims.isEmpty) grids.mkString(" CROSS JOIN ")
        else (s"(SELECT DISTINCT ${dims.mkString(", ")} FROM __g0) __d" +: grids)
          .mkString(" CROSS JOIN ")
      val zero = if (intStorage) "CAST(0 AS BIGINT)" else "CAST(0 AS DOUBLE)"
      val joinCond = (dims ++ idx).map(c => s"__k.$c = __g0.$c").mkString(" AND ")
      sb ++= s", __k AS (SELECT * FROM ($keySrc))"
      sb ++= s", __gd AS (SELECT ${(dims ++ idx).map(c => s"__k.$c").mkString(", ")}, " +
        s"COALESCE(__g0.cnt, $zero) AS cnt FROM __k LEFT JOIN __g0 ON $joinCond)"
      gTable = "__gd"
    }

    val valueName = if (density) "pdf" else "cnt"
    if (density) {
      val anyFlow = specs.zipWithIndex
        .map { case (s, k) => s"__i$k = -1 OR __i$k = ${s.axis.nBins}" }
        .mkString("(", ") OR (", ")")
      val areaProd = specs.zipWithIndex
        .map { case (s, k) => s"(${s.axis.widthSql(s"__i$k")})" }.mkString(" * ")
      val area = s"CASE WHEN $anyFlow THEN CAST(1.0 AS DOUBLE) ELSE $areaProd END"
      val part = if (dims.isEmpty) "" else s" PARTITION BY ${dims.mkString(", ")}"
      val total = s"CAST(SUM(CAST(CASE WHEN $anyFlow THEN 0.0 ELSE cnt END AS DECIMAL(38,10))) OVER ($part) AS DOUBLE)"
      sb ++= s", __p AS (SELECT $groupCols, cnt / ($area) / ($total) AS pdf FROM $gTable)"
      gTable = "__p"
    }

    val labels = specs.zipWithIndex
      .map { case (s, k) => s"${s.axis.labelSql(s"__i$k")} AS ${s.axis.binsCol}" }
      .mkString(", ")
    sb ++= s" SELECT $dimsSel$labels, $valueName FROM $gTable"
    sb.toString
  }
}
