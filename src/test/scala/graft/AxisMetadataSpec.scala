package graft

import java.nio.file.Files

import graft.axes._
import graft.operators.Histogram
import graft.stats.HistStats
import org.apache.spark.sql.functions._

/** Axis attrs ride on the bins column and survive parquet round-trips —
  * the reference's coordinate-attrs contract (core.py:524-587,
  * accessor.py:107-130). */
class AxisMetadataSpec extends SparkSpec {
  import spark.implicits._

  test("every axis type round-trips through column metadata") {
    val axes: Seq[BinAxis] = Seq(
      Regular("a", 5, 0.0, 10.0),
      Regular("b", 4, 1.0, 1000.0, underflow = false, transform = LogT),
      Variable("c", Array(0.0, 1.0, 5.0)),
      IntegerAxis("d", 0L, 10L),
      IntCategory("e", Seq(1L, 4L, 9L)),
      StrCategory("f", Seq("x", "y")),
      Circular("g", 6, 0.0, 24.0))
    axes.foreach { ax =>
      assert(AxisMetadata.fromMetadata(AxisMetadata.toMetadata(ax)) == ax
        || ax.isInstanceOf[Variable] || ax.isInstanceOf[IntCategory]
        || ax.isInstanceOf[StrCategory])
      // array-holding axes: compare fields (Array equality is by ref)
      (ax, AxisMetadata.fromMetadata(AxisMetadata.toMetadata(ax))) match {
        case (x: Variable, y: Variable) =>
          assert(x.allEdges.toSeq == y.allEdges.toSeq && x.name == y.name)
        case (x: IntCategory, y: IntCategory) => assert(x == y)
        case (x: StrCategory, y: StrCategory) => assert(x == y)
        case (x, y) => assert(x == y)
      }
    }
  }

  test("legacy 'log' boolean metadata still recovers the transform") {
    // Revisions before the AxTransform ADT wrote {'log': true|false}; a
    // histogram parquet persisted by them must still round-trip.
    def legacy(log: Boolean) = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("bin_type", "Regular").putString("name", "x")
      .putBoolean("underflow", true).putBoolean("overflow", true)
      .putLong("n", 4L).putDouble("lo", 1.0).putDouble("hi", 100.0)
      .putBoolean("log", log).build()
    assert(AxisMetadata.fromMetadata(legacy(true)) ==
      Regular("x", 4, 1.0, 100.0, transform = LogT))
    assert(AxisMetadata.fromMetadata(legacy(false)) == Regular("x", 4, 1.0, 100.0))
  }

  test("PowT requires a monotonic domain, like the LogT/SqrtT guards") {
    intercept[IllegalArgumentException](
      Regular("x", 4, -2.0, 2.0, transform = PowT(2.0)))
    // odd-integer exponents are monotonic over negatives: allowed
    val odd = Regular("x", 4, -2.0, 2.0, transform = PowT(3.0))
    assert(odd.edges.forall(e => !e.isNaN))
  }

  test("histogram -> parquet -> reload -> stats without re-supplying the axis") {
    val ax = Regular("x", 4, 0.0, 8.0)
    val h = Histogram.histogram(Seq(1.0, 3.0, 3.5, 7.0).toDF("x"), col("x"), ax)
    val dir = Files.createTempDirectory("graft_axis_meta").toString + "/h"
    h.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val recovered = AxisMetadata.axisOf(back, "x_bins")
    assert(recovered == ax)
    val pdf = HistStats.normalize(back, recovered, Nil)
      .collect().map(r => r.getDouble(0) -> r.getAs[Double]("pdf")).toMap
    assert(math.abs(pdf(2.0) - 2.0 / 2.0 / 4.0) < 1e-12)
  }
}
