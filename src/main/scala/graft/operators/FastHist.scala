package graft.operators

import graft.axes.{BinAxis, IdT, Regular}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-array histogram kernel for the hot 1-D unweighted case.
  *
  * The declarative plan (filter → project index → HashAggregate) pays a
  * hash-table lookup per row to maintain ~nBins groups; this path replaces
  * the aggregation with a per-partition primitive array increment — the
  * preference-ladder (d) escape hatch, justified here because no built-in
  * operator can express "aggregate into a dense array without per-row
  * group lookup". Results are IDENTICAL to the declarative path (counts
  * are order-independent), verified by spec and the q78 oracle gate.
  *
  * Two kernels, picked by plan shape:
  *
  *  - COLUMNAR (the flagship flat-count path): when the physical plan of
  *    `df.select(x)` bottoms out in a single columnar scan (vectorized
  *    parquet / in-memory cache) whose only output IS the value column,
  *    the kernel consumes the scan's ColumnarBatch double vector directly
  *    — no ColumnarToRow materialization, no per-row codegen iterator,
  *    just branch-light index arithmetic per value. Restricted to IdT
  *    Regular axes so the JVM-side index math `(x-lo)/span*n` is the
  *    IDENTICAL IEEE expression the codegen'd BinAxis.index evaluates
  *    (transforms like LN go through StrictMath in codegen but Math in
  *    scala.math — last-ulp divergence risk — so they take the row path
  *    whose index is computed by the very same codegen'd Project).
  *
  *  - ROW: any other input (expressions over columns, filters, non-IdT
  *    transforms, non-Regular axes): filter by keepPred, project
  *    BinAxis.index in a codegen'd Project, then increment per row.
  *
  * Partial merge is `treeAggregate(depth = 2)`: per-partition nBins arrays
  * combine ON EXECUTORS in a tree, so the driver receives O(sqrt(P))
  * pre-merged arrays instead of every partition's partial (an RDD.fold
  * would stream all P arrays through one driver thread — at 100 TB with
  * ~1M map partitions that is an 8 GB single-threaded funnel). No shuffle
  * at any point; the result is nBins rows built as a LocalRelation.
  */
object FastHist {

  /** Dense 1-D unweighted histogram: (binsCol, cnt) rows, same layout as
    * Histogram.histogram(..., dense = true). */
  def histogram1d(df: DataFrame, x: Column, ax: BinAxis): DataFrame = {
    val counts = ax match {
      case r: Regular if r.transform == IdT =>
        columnarCounts(df, x, r).getOrElse(rowCounts(df, x, ax))
      case _ => rowCounts(df, x, ax)
    }
    val spark = df.sparkSession
    val nBins = ax.nBins
    val rows = (0 until nBins).map(i => Row(i.toLong, counts(i).toDouble))
    val schema = StructType(Seq(StructField("__i0", LongType, nullable = false),
      StructField("cnt", DoubleType, nullable = false)))
    // LocalRelation result (tiny): no 1-partition RDD round-trip
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .select(ax.label(col("__i0")).as(ax.binsCol,
        graft.axes.AxisMetadata.toMetadata(ax)), col("cnt"))
  }

  /** Executor-side tree merge of per-partition count arrays. */
  private def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Row kernel: index computed by the codegen'd BinAxis.index Project
    * (bit-identical to the declarative path by construction), counted into
    * a primitive array per partition. */
  private[graft] def rowCounts(df: DataFrame, x: Column, ax: BinAxis): Array[Long] = {
    val nBins = ax.nBins
    val idxDf = df
      .filter(ax.keepPred(x, includeUnder = false, includeOver = false))
      .select(ax.index(x).as("__i"))
    idxDf.queryExecution.toRdd.treeAggregate(new Array[Long](nBins))(
      (buf, r) => {
        if (!r.isNullAt(0)) {
          val i = r.getLong(0)
          if (i >= 0 && i < nBins) buf(i.toInt) += 1L
        }
        buf
      },
      merge _, depth = 2)
  }

  /** Walk past codegen/rename-only nodes to the columnar scan producing
    * exactly ONE double column — which must therefore hold the very values
    * of `df.select(x)` (the Project admits bare attribute renames only, so
    * no arithmetic happens above the scan). */
  private def columnarSource(plan: SparkPlan): Option[SparkPlan] = plan match {
    case w: WholeStageCodegenExec => columnarSource(w.child)
    case p: ProjectExec if p.projectList.forall {
        case _: AttributeReference => true
        case a: Alias => a.child.isInstanceOf[AttributeReference]
        case _ => false
      } => columnarSource(p.child)
    case i: InputAdapter => columnarSource(i.child)
    case c: ColumnarToRowExec => columnarSource(c.child)
    case s if s.supportsColumnar && s.output.length == 1 &&
        s.output.head.dataType == DoubleType => Some(s)
    case _ => None
  }

  /** Columnar kernel for IdT Regular axes: consume the scan's
    * ColumnarBatch vector directly. Returns None when the plan isn't a
    * bare columnar scan of the value column (the row kernel then owns
    * correctness). The index math mirrors Regular.index/keepPred exactly:
    * keep x in [lo, hi) — NaN fails `x >= lo` in Java just as it fails
    * `x < hi` in Spark's NaN-largest ordering, either way dropped — then
    * clamp floor((x-lo)/span*n) to [0, n-1]. */
  private[graft] def columnarCounts(df: DataFrame, x: Column,
      ax: Regular): Option[Array[Long]] = {
    val valDf = df.select(x)
    columnarSource(valDf.queryExecution.executedPlan).map { scan =>
      val n = ax.nBins
      val lo = ax.lo
      val hi = ax.hi
      val span = hi - lo
      val nD = n.toDouble
      val nM1 = (n - 1).toLong
      // After the [lo, hi) keep test, scaled = (x-lo)/span*n is >= 0 and
      // finite, so Math.floor == plain long truncation — same bit-identical
      // index the codegen'd GREATEST(LEAST(FLOOR(..))) computes, without
      // the floor call or the lower clamp.
      scan.executeColumnar().treeAggregate(new Array[Long](n))(
        (buf, batch) => {
          val v = batch.column(0)
          val m = batch.numRows()
          v match {
            case w: org.apache.spark.sql.execution.vectorized.WritableColumnVector
                if !w.hasNull && !w.hasDictionary =>
              // bulk-copy into a primitive array: one arraycopy, then a
              // tight monomorphic loop (no per-element virtual call)
              val arr = w.getDoubles(0, m)
              var i = 0
              while (i < m) {
                val xv = arr(i)
                if (xv >= lo && xv < hi) {
                  var b = ((xv - lo) / span * nD).toLong
                  if (b > nM1) b = nM1
                  buf(b.toInt) += 1L
                }
                i += 1
              }
            case _ =>
              var i = 0
              if (v.hasNull) {
                while (i < m) {
                  if (!v.isNullAt(i)) {
                    val xv = v.getDouble(i)
                    if (xv >= lo && xv < hi) {
                      var b = ((xv - lo) / span * nD).toLong
                      if (b > nM1) b = nM1
                      buf(b.toInt) += 1L
                    }
                  }
                  i += 1
                }
              } else {
                while (i < m) {
                  val xv = v.getDouble(i)
                  if (xv >= lo && xv < hi) {
                    var b = ((xv - lo) / span * nD).toLong
                    if (b > nM1) b = nM1
                    buf(b.toInt) += 1L
                  }
                  i += 1
                }
              }
          }
          buf
        },
        merge _, depth = 2)
    }
  }
}
