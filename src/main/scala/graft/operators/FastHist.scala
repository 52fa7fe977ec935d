package graft.operators

import graft.axes.BinAxis
import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * are order-independent), verified by spec; the bin index comes from the
  * very same BinAxis.index expression, evaluated in the same codegen'd
  * Project — only the aggregation differs.
  *
  * The partial shape matches HistVectorAgg's scale argument: one
  * nBins-array per partition to the driver (tiny), no shuffle at all.
  */
object FastHist {

  /** Dense 1-D unweighted histogram: (binsCol, cnt) rows, same layout as
    * Histogram.histogram(..., dense = true). */
  def histogram1d(df: DataFrame, x: Column, ax: BinAxis): DataFrame = {
    val spark = df.sparkSession
    val nBins = ax.nBins
    val idxDf = df
      .filter(ax.keepPred(x, includeUnder = false, includeOver = false))
      .select(ax.index(x).as("__i"))
    val counts = idxDf.queryExecution.toRdd.mapPartitions { rows =>
      val buf = new Array[Long](nBins)
      while (rows.hasNext) {
        val r = rows.next()
        if (!r.isNullAt(0)) {
          val i = r.getLong(0)
          if (i >= 0 && i < nBins) buf(i.toInt) += 1L
        }
      }
      Iterator.single(buf)
    }.fold(new Array[Long](nBins)) { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    val rows = (0 until nBins).map(i => Row(i.toLong, counts(i).toDouble))
    val schema = StructType(Seq(StructField("__i0", LongType, nullable = false),
      StructField("cnt", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .select(ax.label(col("__i0")).as(ax.binsCol,
        graft.axes.AxisMetadata.toMetadata(ax)), col("cnt"))
  }
}
