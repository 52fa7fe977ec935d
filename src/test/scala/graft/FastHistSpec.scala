package graft

import graft.axes.{LogT, Regular}
import graft.operators.{FastHist, HistOptions, Histogram}
import org.apache.spark.sql.functions._

/** The fast dense-array kernel's two paths (columnar scan consumer and
  * row iterator) must both agree exactly with the declarative dense path,
  * and the columnar path must actually ENGAGE on a vectorized parquet
  * scan — otherwise the flagship throughput claim silently regresses to
  * the row path. */
class FastHistSpec extends SparkSpec {
  import spark.implicits._

  private val ax = Regular("x", 8, 0.0, 4.0)

  // values exercising every index branch: interior, exact lo (bin 0),
  // exact hi (overflow, dropped), below lo, NaN (dropped), null (dropped),
  // last-bin interior, negative zero
  private def edgeValues: Seq[java.lang.Double] = Seq[java.lang.Double](
    0.5, 1.5, 1.7, 0.2, 5.0, -3.0, 0.0, 4.0, 3.999999, Double.NaN, null,
    -0.0, 3.0, 2.999999999, 1.0e300, -1.0e300)

  private def writeParquet(): String = {
    val dir = java.nio.file.Files.createTempDirectory("fasthist").toString
    val path = s"$dir/vals.parquet"
    edgeValues.map(Option(_).map(_.doubleValue())).toDF("x")
      .repartition(3).write.mode("overwrite").parquet(path)
    path
  }

  test("columnar kernel engages on a vectorized parquet scan and matches") {
    val df = spark.read.parquet(writeParquet())
    val cc = FastHist.columnarCounts(df, col("x"), ax)
    assert(cc.isDefined, "columnar path must engage on a bare parquet double scan")
    val rc = FastHist.rowCounts(df, col("x"), ax)
    assert(cc.get.toSeq == rc.toSeq)
    val fast = FastHist.histogram1d(df, col("x"), ax)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val decl = Histogram.histogram(df, col("x"), ax, Nil, HistOptions(dense = true))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(fast == decl)
  }

  test("columnar kernel does NOT engage when the value is a computed expression") {
    val df = spark.read.parquet(writeParquet())
    // x+1 needs the codegen'd Project: using raw scan values would be wrong
    assert(FastHist.columnarCounts(df, col("x") + lit(1.0), ax).isEmpty)
    val fast = FastHist.histogram1d(df, col("x") + lit(1.0), ax)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val decl = Histogram.histogram(df, col("x") + lit(1.0), ax, Nil,
        HistOptions(dense = true))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(fast == decl)
  }

  test("non-IdT transforms take the row path (codegen'd index) and match") {
    val df = Seq(1.5, 2.0, 10.0, 100.0, 999.0, 1000.0, 0.5).toDF("x")
    val axLog = Regular("x", 6, 1.0, 1000.0, transform = LogT)
    val fast = FastHist.histogram1d(df, col("x"), axLog)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val decl = Histogram.histogram(df, col("x"), axLog, Nil, HistOptions(dense = true))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(fast == decl)
  }

  test("2-D columnar kernel engages and matches the declarative dense grid") {
    val dir = java.nio.file.Files.createTempDirectory("fasthist2d").toString
    val path = s"$dir/pairs.parquet"
    // second column deliberately listed FIRST in the file: the resolver
    // must map selected columns to scan positions, not assume order
    val rnd = new scala.util.Random(3)
    ((0 until 500).map(_ => (rnd.between(-0.5, 4.5), rnd.between(-1.0, 3.0))) ++
      Seq((Double.NaN, 1.0), (1.0, Double.NaN), (0.0, 0.0), (3.9999, 1.9999)))
      .toDF("y", "x").repartition(3).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val ax2 = Regular("y", 3, 0.0, 3.0)
    val cc = FastHist.columnarCounts2d(df, col("x"), ax, col("y"), ax2)
    assert(cc.isDefined, "2-D columnar path must engage on a parquet double scan")
    assert(cc.get.toSeq == FastHist.rowCounts2d(df, col("x"), ax, col("y"), ax2).toSeq)
    val fast = FastHist.histogram2d(df, col("x"), ax, col("y"), ax2)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val decl = Histogram.histogramdd(df,
        Seq(col("x") -> ax, col("y") -> ax2), opts = HistOptions(dense = true))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(fast == decl)
    assert(fast.size == ax.nBins * ax2.nBins) // full dense grid
  }

  test("2-D kernel with expressions falls back to the row path and matches") {
    val df = Seq((0.5, 0.5), (1.5, 2.5), (3.0, 1.0)).toDF("x", "y")
    val ax2 = Regular("y", 3, 0.0, 3.0)
    assert(FastHist.columnarCounts2d(df, col("x") * 2, ax, col("y"), ax2).isEmpty)
    val fast = FastHist.histogram2d(df, col("x") * 2, ax, col("y"), ax2)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val decl = Histogram.histogramdd(df,
        Seq((col("x") * 2) -> ax, col("y") -> ax2), opts = HistOptions(dense = true))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(fast == decl)
  }

  test("treeAggregate merge is correct across a high partition count") {
    // 64 partitions on local[4]: many partial arrays, multi-level merge
    val df = spark.range(0, 20000).select((col("id") % 40 / lit(10.0)).as("x"))
      .repartition(64)
    val fast = FastHist.histogram1d(df, col("x"), ax)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val decl = Histogram.histogram(df, col("x"), ax, Nil, HistOptions(dense = true))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(fast == decl)
    assert(fast.values.sum == 20000.0)
  }
}
