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
