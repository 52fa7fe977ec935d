package graft.axes

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Axis (bin specification) for histogram computation.
  *
  * Re-expresses boost-histogram's axis families (see reference
  * xarray-histogram core.py:467-513 `get_axes_from_specs` and
  * core.py:524-587 `get_coord`) as Spark Column algebra:
  *
  *  - `index(x)`  : value -> bin index (-1 = underflow, 0..n-1 = regular,
  *                  n = overflow, null = discarded). Built exclusively from
  *                  `org.apache.spark.sql.functions` so it stays inside
  *                  whole-stage codegen.
  *  - `label(i)`  : bin index -> bin LEFT edge / category value, matching the
  *                  reference's output coordinate (`<var>_bins` holds left
  *                  edges; flow bins are labelled -inf/+inf, int min/max, or
  *                  "_flow_bin" — core.py:524-587).
  *  - `*Sql` twins: the exact same semantics rendered as ANSI SQL for the
  *                  DuckDB oracle. Literals are printed from the very same
  *                  Scala doubles, and label/width arithmetic is restricted to
  *                  IEEE-pinned ops (+,-,*,/) or literal CASE tables so both
  *                  engines produce bit-identical results.
  *
  * Bin semantics follow boost: half-open [left, right); x < lo -> underflow;
  * x >= hi -> overflow; NaN -> overflow (both engines order NaN above all
  * doubles).
  */
sealed trait BinAxis extends Serializable {
  /** Variable name; output bins column is s"${name}_bins". */
  def name: String
  /** Number of regular (non-flow) bins. */
  def nBins: Int
  def underflow: Boolean
  def overflow: Boolean
  def binsCol: String = s"${name}_bins"

  def index(x: Column): Column
  def label(i: Column): Column
  /** Bin width for density; flow and categorical bins have width 1 (core.py:614-646). */
  def width(i: Column): Column

  /** Row-keep predicate, PROVABLY equivalent to bounding index(x) by the
    * kept bin range but expressed directly on the value: the histogram
    * filter would otherwise re-evaluate the index's when/floor chain once
    * per pushed-down comparison (3x) plus once in the projection. Here the
    * filter is one or two raw comparisons and the index is computed exactly
    * once, for kept rows only. Relies on both engines ordering NaN above
    * every double (NaN >= hi -> overflow), the same property index() uses. */
  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column

  def indexSql(v: String): String
  def labelSql(i: String): String
  def widthSql(i: String): String

  protected def d(x: Double): String =
    if (x == Double.PositiveInfinity) "CAST('infinity' AS DOUBLE)"
    else if (x == Double.NegativeInfinity) "CAST('-infinity' AS DOUBLE)"
    else {
      // Quoted-string cast: a bare decimal literal would be typed DECIMAL by
      // DuckDB and lose the exact binary double; string->double parsing is
      // correctly rounded in both engines.
      s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    }

  /** CASE table keyed on bin index — identical literal doubles both engines. */
  protected def caseTableSql(i: String, regular: Array[Double],
      under: Option[Double], over: Option[Double]): String = {
    val sb = new StringBuilder(s"CASE $i")
    under.foreach(u => sb ++= s" WHEN -1 THEN ${d(u)}")
    over.foreach(o => sb ++= s" WHEN $nBins THEN ${d(o)}")
    regular.zipWithIndex.foreach { case (e, k) => sb ++= s" WHEN $k THEN ${d(e)}" }
    sb ++= " END"
    sb.toString
  }

  protected def caseTableCol(i: Column, regular: Array[Double],
      under: Option[Double], over: Option[Double]): Column = {
    val base = element_at(typedlit(regular.toSeq), (i + 1).cast("int"))
    val withOver = over.fold(base)(o => when(i === nBins, lit(o)).otherwise(base))
    under.fold(withOver)(u => when(i === -1, lit(u)).otherwise(withOver))
  }
}

/** Axis transform (boost `bh.axis.transform`): bins are equal-width in the
  * transformed space. Forward maps are restricted to functions that are
  * IEEE-identical in Spark and DuckDB: LN and SQRT are correctly rounded in
  * both; Pow(2) is spelled as `x*x` (a single rounded multiply). Generic
  * Pow(p) uses POWER — library-dependent in the last ulp, so bin boundaries
  * may differ cross-engine for values landing exactly on an edge (fine for
  * in-engine use; prefer p in {0.5, 2} when oracle-exactness matters). */
sealed trait AxTransform extends Serializable {
  def fwd(x: Double): Double
  def inv(y: Double): Double
  def fwdCol(x: Column): Column
  def fwdSql(v: String): String
  def tag: String
}
case object IdT extends AxTransform {
  def fwd(x: Double): Double = x
  def inv(y: Double): Double = y
  def fwdCol(x: Column): Column = x
  def fwdSql(v: String): String = v
  def tag = "id"
}
case object LogT extends AxTransform {
  def fwd(x: Double): Double = math.log(x)
  def inv(y: Double): Double = math.exp(y)
  def fwdCol(x: Column): Column = org.apache.spark.sql.functions.log(x)
  def fwdSql(v: String): String = s"LN($v)"
  def tag = "log"
}
case object SqrtT extends AxTransform {
  def fwd(x: Double): Double = math.sqrt(x)
  def inv(y: Double): Double = y * y
  def fwdCol(x: Column): Column = sqrt(x)
  def fwdSql(v: String): String = s"SQRT($v)"
  def tag = "sqrt"
}
final case class PowT(p: Double) extends AxTransform {
  require(p != 0.0)
  def fwd(x: Double): Double = if (p == 2.0) x * x else math.pow(x, p)
  // negative y only reaches here for odd-integer p (see the Regular
  // monotonicity guard), where the real root is -(-y)^(1/p) — pow itself
  // returns NaN for a negative base with fractional exponent
  def inv(y: Double): Double =
    if (y < 0) -math.pow(-y, 1.0 / p) else math.pow(y, 1.0 / p)
  def fwdCol(x: Column): Column =
    if (p == 2.0) x * x else pow(x, lit(p))
  def fwdSql(v: String): String =
    if (p == 2.0) s"($v * $v)"
    else s"POWER($v, CAST('${java.lang.Double.toString(p)}' AS DOUBLE))"
  def tag = s"pow:${java.lang.Double.toString(p)}"
}
object AxTransform {
  def fromTag(t: String): AxTransform = t match {
    case "id" => IdT
    case "log" => LogT
    case "sqrt" => SqrtT
    case s if s.startsWith("pow:") => PowT(java.lang.Double.parseDouble(s.drop(4)))
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }
}

/** Regular axis: n equal bins on [lo, hi) — equal in `transform` space
  * (boost transform.log / transform.sqrt / transform.Pow). */
final case class Regular(name: String, n: Int, lo: Double, hi: Double,
    underflow: Boolean = true, overflow: Boolean = true,
    transform: AxTransform = IdT) extends BinAxis {
  private def tf: AxTransform = transform
  require(n > 0 && hi > lo)
  require(tf != LogT || lo > 0)
  require(tf != SqrtT || lo >= 0)
  // PowT must be monotonic on [lo, hi): x^p is monotonic there only for
  // x >= 0 (or any x when p is an odd integer). A negative lo with e.g.
  // p = 2 silently yields tSpan = 0 and NaN edges — fail loudly like the
  // LogT/SqrtT guards. Negative exponents additionally blow up at 0
  // (0^-1 = inf -> infinite tSpan, NaN edges), so the domain must exclude
  // 0 entirely: lo > 0, or an all-negative [lo, hi] with an odd-integer p.
  require(tf match {
    case PowT(p) if p < 0 =>
      lo > 0 || (hi < 0 && p == math.rint(p) && math.rint(p).toLong % 2 != 0)
    case PowT(p) => lo >= 0 || (p == math.rint(p) && math.rint(p).toLong % 2 != 0)
    case _ => true
  }, s"PowT domain must keep x^p monotonic and finite; got p, [lo,hi)=[$lo,$hi)")
  def nBins: Int = n
  private val span = hi - lo
  private val widthV = span / n
  private val tLo = tf.fwd(lo)
  private val tSpan = tf.fwd(hi) - tLo
  /** Left edges, computed once on the driver; same literals feed both engines. */
  val edges: Array[Double] =
    if (tf == IdT) Array.tabulate(n)(k => lo + k * widthV)
    else Array.tabulate(n)(k => tf.inv(tLo + tSpan * k / n))
  val widths: Array[Double] =
    if (tf == IdT) Array.fill(n)(widthV)
    else Array.tabulate(n)(k =>
      (if (k == n - 1) hi else tf.inv(tLo + tSpan * (k + 1) / n)) - edges(k))

  // The else branch clamps to [0, n-1] on BOTH ends: x is in [lo, hi)
  // there, but last-ulp rounding in the scale arithmetic (most relevant
  // for library-dependent POWER transforms) could otherwise produce -1 or
  // n for edge values — which would make the raw-value keepPred and the
  // index-range test diverge. With the clamp, x in [lo, hi) <=> index in
  // [0, n-1] is an identity in both engines.
  def index(x: Column): Column = {
    val scaled =
      if (tf == IdT) (x - lit(lo)) / lit(span) * lit(n.toDouble)
      else (tf.fwdCol(x) - lit(tLo)) / lit(tSpan) * lit(n.toDouble)
    when(x.isNull, lit(null).cast(LongType))
      .when(x < lit(lo), lit(-1L))
      .when(x >= lit(hi), lit(n.toLong))
      .otherwise(greatest(least(floor(scaled), lit((n - 1).toLong)), lit(0L)))
  }
  def indexSql(v: String): String = {
    val scaled =
      if (tf == IdT) s"($v - ${d(lo)}) / ${d(span)} * ${d(n.toDouble)}"
      else s"(${tf.fwdSql(v)} - ${d(tLo)}) / ${d(tSpan)} * ${d(n.toDouble)}"
    s"""CASE WHEN $v IS NULL THEN NULL
       | WHEN $v < ${d(lo)} THEN CAST(-1 AS BIGINT)
       | WHEN $v >= ${d(hi)} THEN CAST($n AS BIGINT)
       | ELSE GREATEST(LEAST(CAST(FLOOR($scaled) AS BIGINT), CAST(${n - 1} AS BIGINT)), CAST(0 AS BIGINT)) END""".stripMargin.replaceAll("\n", "")
  }

  def label(i: Column): Column =
    caseTableCol(i, edges, Some(Double.NegativeInfinity), Some(Double.PositiveInfinity))
  def labelSql(i: String): String =
    caseTableSql(i, edges, Some(Double.NegativeInfinity), Some(Double.PositiveInfinity))
  def width(i: Column): Column = caseTableCol(i, widths, Some(1.0), Some(1.0))
  def widthSql(i: String): String = caseTableSql(i, widths, Some(1.0), Some(1.0))

  // index(x): null -> null (never kept); x < lo -> -1; x >= hi -> n (this
  // catches NaN: both engines order NaN above all doubles); else 0..n-1.
  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column =
    (includeUnder, includeOver) match {
      case (true, true) => x.isNotNull
      case (true, false) => x < lit(hi)
      case (false, true) => x >= lit(lo)
      case (false, false) => x >= lit(lo) && x < lit(hi)
    }
}

/** Variable axis: explicit (sorted) edges; nBins = edges.length - 1. */
final case class Variable(name: String, allEdges: Array[Double],
    underflow: Boolean = true, overflow: Boolean = true) extends BinAxis {
  require(allEdges.length >= 2 && allEdges.sliding(2).forall(p => p(0) < p(1)))
  def nBins: Int = allEdges.length - 1
  val edges: Array[Double] = allEdges.dropRight(1)
  val widths: Array[Double] = allEdges.sliding(2).map(p => p(1) - p(0)).toArray

  def index(x: Column): Column = {
    // when-chain over literal edges; O(n) comparisons but fully codegen'd.
    var c = when(x.isNull, lit(null).cast(LongType))
      .when(x < lit(allEdges(0)), lit(-1L))
    for (k <- 1 until allEdges.length)
      c = c.when(x < lit(allEdges(k)), lit((k - 1).toLong))
    c.otherwise(lit(nBins.toLong))
  }
  def indexSql(v: String): String = {
    val sb = new StringBuilder(s"CASE WHEN $v IS NULL THEN NULL")
    sb ++= s" WHEN $v < ${d(allEdges(0))} THEN CAST(-1 AS BIGINT)"
    for (k <- 1 until allEdges.length)
      sb ++= s" WHEN $v < ${d(allEdges(k))} THEN CAST(${k - 1} AS BIGINT)"
    sb ++= s" ELSE CAST($nBins AS BIGINT) END"
    sb.toString
  }
  def label(i: Column): Column =
    caseTableCol(i, edges, Some(Double.NegativeInfinity), Some(Double.PositiveInfinity))
  def labelSql(i: String): String =
    caseTableSql(i, edges, Some(Double.NegativeInfinity), Some(Double.PositiveInfinity))
  def width(i: Column): Column = caseTableCol(i, widths, Some(1.0), Some(1.0))
  def widthSql(i: String): String = caseTableSql(i, widths, Some(1.0), Some(1.0))

  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column =
    (includeUnder, includeOver) match {
      case (true, true) => x.isNotNull
      case (true, false) => x < lit(allEdges.last)
      case (false, true) => x >= lit(allEdges(0))
      case (false, false) => x >= lit(allEdges(0)) && x < lit(allEdges.last)
    }
}

/** Integer axis: unit bins on [lo, hi) over integer data (bh.axis.Integer).
  * Flow bins are labelled with Long.Min/MaxValue (core.py:535-552). */
final case class IntegerAxis(name: String, lo: Long, hi: Long,
    underflow: Boolean = true, overflow: Boolean = true) extends BinAxis {
  require(hi > lo)
  def nBins: Int = (hi - lo).toInt
  def index(x: Column): Column = {
    // accept boolean columns like the reference's bool dtype handling
    // (core.py:535-543): true/false -> 1/0
    val xl = x.cast(LongType)
    when(xl.isNull, lit(null).cast(LongType))
      .when(xl < lit(lo), lit(-1L))
      .when(xl >= lit(hi), lit(nBins.toLong))
      .otherwise(xl - lit(lo))
  }
  def indexSql(v: String): String =
    s"CASE WHEN $v IS NULL THEN NULL WHEN $v < $lo THEN CAST(-1 AS BIGINT)" +
      s" WHEN $v >= $hi THEN CAST($nBins AS BIGINT)" +
      s" ELSE CAST($v AS BIGINT) - $lo END"
  def label(i: Column): Column =
    when(i === -1, lit(Long.MinValue))
      .when(i === nBins, lit(Long.MaxValue))
      .otherwise(i + lit(lo))
  def labelSql(i: String): String =
    s"CASE WHEN $i = -1 THEN CAST(-9223372036854775807 - 1 AS BIGINT)" +
      s" WHEN $i = $nBins THEN CAST(9223372036854775807 AS BIGINT)" +
      s" ELSE CAST($i + $lo AS BIGINT) END"
  def width(i: Column): Column = lit(1.0)
  def widthSql(i: String): String = "CAST(1.0 AS DOUBLE)"

  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column = {
    val xl = x.cast(LongType)
    (includeUnder, includeOver) match {
      case (true, true) => xl.isNotNull
      case (true, false) => xl < lit(hi)
      case (false, true) => xl >= lit(lo)
      case (false, false) => xl >= lit(lo) && xl < lit(hi)
    }
  }
}

/** IntCategory axis: explicit integer categories; non-members go to the
  * overflow bin (labelled Long.MaxValue, core.py:554-568) or are dropped. */
final case class IntCategory(name: String, values: Seq[Long],
    overflow: Boolean = true) extends BinAxis {
  def nBins: Int = values.length
  def underflow: Boolean = false
  def index(x: Column): Column = {
    var c = when(x.isNull, lit(null).cast(LongType))
    values.zipWithIndex.foreach { case (v, k) => c = c.when(x === lit(v), lit(k.toLong)) }
    c.otherwise(if (overflow) lit(nBins.toLong) else lit(null).cast(LongType))
  }
  def indexSql(v: String): String = {
    val sb = new StringBuilder(s"CASE WHEN $v IS NULL THEN NULL")
    values.zipWithIndex.foreach { case (x, k) => sb ++= s" WHEN $v = $x THEN CAST($k AS BIGINT)" }
    sb ++= (if (overflow) s" ELSE CAST($nBins AS BIGINT) END" else " ELSE NULL END")
    sb.toString
  }
  def label(i: Column): Column = {
    var c = when(i === nBins, lit(Long.MaxValue))
    values.zipWithIndex.foreach { case (v, k) => c = c.when(i === k, lit(v)) }
    c.otherwise(lit(null).cast(LongType))
  }
  def labelSql(i: String): String = {
    val sb = new StringBuilder(s"CASE WHEN $i = $nBins THEN CAST(9223372036854775807 AS BIGINT)")
    values.zipWithIndex.foreach { case (v, k) => sb ++= s" WHEN $i = $k THEN CAST($v AS BIGINT)" }
    sb ++= " ELSE NULL END"
    sb.toString
  }
  def width(i: Column): Column = lit(1.0)
  def widthSql(i: String): String = "CAST(1.0 AS DOUBLE)"

  // no underflow bin; non-members land in overflow (if the axis has one)
  // or are dropped
  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column =
    if (includeOver && overflow) x.isNotNull
    else x.isin(values: _*)
}

/** StrCategory axis: explicit string categories; overflow label "_flow_bin"
  * (core.py:570-575). */
final case class StrCategory(name: String, values: Seq[String],
    overflow: Boolean = true) extends BinAxis {
  def nBins: Int = values.length
  def underflow: Boolean = false
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"
  def index(x: Column): Column = {
    var c = when(x.isNull, lit(null).cast(LongType))
    values.zipWithIndex.foreach { case (v, k) => c = c.when(x === lit(v), lit(k.toLong)) }
    c.otherwise(if (overflow) lit(nBins.toLong) else lit(null).cast(LongType))
  }
  def indexSql(v: String): String = {
    val sb = new StringBuilder(s"CASE WHEN $v IS NULL THEN NULL")
    values.zipWithIndex.foreach { case (x, k) => sb ++= s" WHEN $v = ${q(x)} THEN CAST($k AS BIGINT)" }
    sb ++= (if (overflow) s" ELSE CAST($nBins AS BIGINT) END" else " ELSE NULL END")
    sb.toString
  }
  def label(i: Column): Column = {
    var c = when(i === nBins, lit("_flow_bin"))
    values.zipWithIndex.foreach { case (v, k) => c = c.when(i === k, lit(v)) }
    c.otherwise(lit(null).cast("string"))
  }
  def labelSql(i: String): String = {
    val sb = new StringBuilder(s"CASE WHEN $i = $nBins THEN '_flow_bin'")
    values.zipWithIndex.foreach { case (v, k) => sb ++= s" WHEN $i = $k THEN ${q(v)}" }
    sb ++= " ELSE NULL END"
    sb.toString
  }
  def width(i: Column): Column = lit(1.0)
  def widthSql(i: String): String = "CAST(1.0 AS DOUBLE)"

  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column =
    if (includeOver && overflow) x.isNotNull
    else x.isin(values: _*)
}

/** Circular axis: periodic on [lo, hi); every finite value wraps into range
  * (bh.axis.Circular). Like boost, the axis has an overflow bin (no
  * underflow): NaN and +/-infinity cannot wrap — `(x-lo) mod span` is NaN —
  * and land in overflow (labelled +inf) instead of being silently folded
  * into the last regular bin. */
final case class Circular(name: String, n: Int, lo: Double, hi: Double)
    extends BinAxis {
  require(n > 0 && hi > lo)
  def nBins: Int = n
  def underflow: Boolean = false
  def overflow: Boolean = true
  private val span = hi - lo
  val edges: Array[Double] = Array.tabulate(n)(k => lo + k * (span / n))
  val widths: Array[Double] = Array.fill(n)(span / n)

  // Clamped to [0, n-1] on both ends: at magnitudes beyond double
  // resolution (|x| >> 2^53 * span) the modular arithmetic cannot
  // reconstruct a wrapped value in [0, span) — floor(x/span)*span rounds
  // away from x — and an unclamped index would fall outside every bin in
  // an engine-dependent way. The clamp saturates such values
  // deterministically (identically in both engines), keeping the
  // "every finite value wraps into a regular bin" contract exact.
  def index(x: Column): Column = {
    val shifted = x - lit(lo)
    val wrapped = shifted - floor(shifted / lit(span)) * lit(span) // in [0, span)
    when(x.isNull, lit(null).cast(LongType))
      .when(isnan(x) || abs(x) === lit(Double.PositiveInfinity), lit(n.toLong))
      .otherwise(greatest(
        least(floor(wrapped / lit(span) * lit(n.toDouble)), lit((n - 1).toLong)),
        lit(0L)))
  }
  def indexSql(v: String): String = {
    val sh = s"($v - ${d(lo)})"
    val wrapped = s"($sh - FLOOR($sh / ${d(span)}) * ${d(span)})"
    s"CASE WHEN $v IS NULL THEN NULL " +
      s"WHEN ISNAN($v) OR ABS($v) = CAST('infinity' AS DOUBLE) THEN CAST($n AS BIGINT) ELSE " +
      s"GREATEST(LEAST(CAST(FLOOR($wrapped / ${d(span)} * ${d(n.toDouble)}) AS BIGINT), " +
      s"CAST(${n - 1} AS BIGINT)), CAST(0 AS BIGINT)) END"
  }
  def label(i: Column): Column =
    caseTableCol(i, edges, None, Some(Double.PositiveInfinity))
  def labelSql(i: String): String =
    caseTableSql(i, edges, None, Some(Double.PositiveInfinity))
  def width(i: Column): Column = caseTableCol(i, widths, None, Some(1.0))
  def widthSql(i: String): String = caseTableSql(i, widths, None, Some(1.0))

  // every finite value wraps into a regular bin; NaN/+-inf are the
  // overflow bin (no underflow on a circular axis)
  def keepPred(x: Column, includeUnder: Boolean, includeOver: Boolean): Column =
    if (includeOver) x.isNotNull
    else x.isNotNull && !(isnan(x) || abs(x) === lit(Double.PositiveInfinity))
}
