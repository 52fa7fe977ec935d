package graft.operators

import graft.axes.Variable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equal-frequency (quantile) binning: a Variable axis whose edges are the
  * exact rank-based quantiles of the data — the Spark re-expression of the
  * common `bins=np.quantile(x, ...)` pattern over the reference's Variable
  * axis (bh.axis.Variable).
  *
  * Edge j (j = 1..nBins-1) is the value at 1-based rank
  * max(1, ceil(j/nBins * n)) in ascending order; the axis spans [min, max)
  * with x == max falling into overflow, exactly like the reference's
  * auto-range (core.py:499-506). Rank-based edges are actual data values:
  * no interpolation arithmetic, so any engine that sorts agrees bit-for-bit
  * (ties collapse via distinct — identical in both engines).
  *
  * The exact path computes global ranks with a distributed range-partition
  * sort + zipWithIndex (no single-partition window). At 100 TB swap in
  * `sketchAxis` (Greenwald-Khanna approxQuantile): one aggregation pass,
  * no sort, approximate edges — same downstream plan.
  */
object QuantileBins extends org.apache.spark.internal.Logging {

  /** autoAxis result: the axis plus WHICH path produced its edges — exact
    * rank edges are reproducibility-grade, sketch edges are approximate by
    * construction, and the switch happens on input size, so callers must
    * be able to tell the two apart (edges change discontinuously at the
    * threshold otherwise with no signal). */
  final case class QuantileAxis(axis: Variable, exact: Boolean)

  /** Default public path: exact rank edges below `exactThreshold` rows,
    * Greenwald-Khanna sketch edges above it. The exact path's global sort
    * is the right trade only while the column fits a quick distributed
    * sort; at 100 TB the GK sketch replaces it with ONE aggregation pass
    * whose per-edge rank error is bounded by relativeError * n (so each
    * sketch edge sits within +-relativeError of the requested quantile
    * fraction). The exact path stays available (and oracle-gated, q59)
    * for reproducibility-critical use. Logs and reports (via the returned
    * flag) which path was taken. */
  def autoAxisTagged(df: DataFrame, x: Column, name: String, nBins: Int,
      exactThreshold: Long = 10000000L, relativeError: Double = 1e-4): QuantileAxis = {
    val vals = df.select(x.cast("double").as("v")).filter(col("v").isNotNull)
    // one stats pass decides the path AND feeds the exact branch (its
    // count/min/max are exactly what quantileAxis needs) — no
    // decide-then-recompute double scan
    val stats = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = stats.getLong(0)
    if (n <= exactThreshold) {
      logInfo(s"quantile axis '$name': exact rank edges over $n rows")
      QuantileAxis(exactAxis(vals, stats, name, nBins), exact = true)
    } else {
      logWarning(s"quantile axis '$name': $n rows > exactThreshold=" +
        s"$exactThreshold, switching to Greenwald-Khanna SKETCH edges " +
        s"(rank error <= ${relativeError} * n; not oracle-exact)")
      QuantileAxis(sketchAxis(vals, "v", name, nBins, relativeError), exact = false)
    }
  }

  /** Axis-only convenience over [[autoAxisTagged]]. */
  def autoAxis(df: DataFrame, x: Column, name: String, nBins: Int,
      exactThreshold: Long = 10000000L, relativeError: Double = 1e-4): Variable =
    autoAxisTagged(df, x, name, nBins, exactThreshold, relativeError).axis

  /** Exact rank-based quantile edges; one stats pass + one sort + one tiny
    * collect. */
  def quantileAxis(df: DataFrame, x: Column, name: String, nBins: Int): Variable = {
    val vals = df.select(x.cast("double").as("v")).filter(col("v").isNotNull)
    val stats = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    exactAxis(vals, stats, name, nBins)
  }

  private def exactAxis(vals: DataFrame, stats: org.apache.spark.sql.Row,
      name: String, nBins: Int): Variable = {
    val n = stats.getLong(0)
    require(n > 0, "quantile axis needs data")
    // 0-based target indexes of the interior edges
    val targets = (1 until nBins)
      .map(j => math.max(1L, math.ceil(j.toDouble / nBins.toDouble * n.toDouble).toLong) - 1L)
      .toSet
    val interior = vals.orderBy("v").rdd.map(_.getDouble(0)).zipWithIndex()
      .filter { case (_, i) => targets.contains(i) }
      .map(_._1).collect()
    val allEdges = (Array(stats.getDouble(1)) ++ interior :+ stats.getDouble(2))
      .distinct.sorted
    require(allEdges.length >= 2, "degenerate distribution: all values equal")
    Variable(name, allEdges)
  }

  /** Sketch-based edges for the 100 TB path (no global sort; not
    * oracle-exact by construction). */
  def sketchAxis(df: DataFrame, xCol: String, name: String, nBins: Int,
      relativeError: Double = 1e-4): Variable = {
    val probs = (0 to nBins).map(_.toDouble / nBins).toArray
    val qs = df.stat.approxQuantile(xCol, probs, relativeError).distinct.sorted
    Variable(name, qs)
  }
}
