package graft

import graft.axes._
import graft.operators.{HistOptions, Histogram}
import org.apache.spark.sql.functions._

/** Pins boost-histogram semantics (reference xarray-histogram core.py):
  * half-open bins, x == hi -> overflow, flow labelling, density math. */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private def hist1d(values: Seq[Double], ax: BinAxis,
      opts: HistOptions = HistOptions()): Map[Any, Double] = {
    val df = values.toDF("x")
    Histogram.histogram(df, col("x"), ax, opts = opts)
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap
  }

  test("regular: half-open bins, x == hi goes to overflow (dropped w/o flow)") {
    val ax = Regular("x", 5, 0.0, 5.0)
    val h = hist1d(Seq(0.0, 0.5, 1.0, 4.999, 5.0), ax)
    assert(h == Map(0.0 -> 2.0, 1.0 -> 1.0, 4.0 -> 1.0)) // 5.0 -> overflow, dropped
  }

  test("regular with flow: underflow labelled -inf, overflow +inf") {
    val ax = Regular("x", 2, 0.0, 2.0)
    val h = hist1d(Seq(-1.0, 0.5, 1.5, 2.0, 99.0), ax, HistOptions(flow = true))
    assert(h == Map(Double.NegativeInfinity -> 1.0, 0.0 -> 1.0, 1.0 -> 1.0,
      Double.PositiveInfinity -> 2.0))
  }

  test("no-underflow axis discards x < lo entirely") {
    val ax = Regular("x", 2, 0.0, 2.0, underflow = false)
    val h = hist1d(Seq(-1.0, 0.5), ax, HistOptions(flow = true))
    assert(h == Map(0.0 -> 1.0, Double.PositiveInfinity -> 0.0) - Double.PositiveInfinity
      || h == Map(0.0 -> 1.0)) // -1.0 dropped, no underflow bin emitted
  }

  test("weights: bin value is sum of weights") {
    val df = Seq((0.5, 2.0), (0.7, 3.0), (1.5, 10.0)).toDF("x", "w")
    val h = Histogram.histogram(df, col("x"), Regular("x", 2, 0.0, 2.0),
      opts = HistOptions(weight = Some(col("w"))))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(h == Map(0.0 -> 5.0, 1.0 -> 10.0))
  }

  test("density: pdf integrates to 1 over non-flow bins") {
    val ax = Regular("x", 4, 0.0, 8.0) // width 2
    val h = hist1d(Seq(1.0, 1.5, 3.0, 5.0, 7.0, 7.5), ax, HistOptions(density = true))
    val integral = h.values.sum * 2.0
    assert(math.abs(integral - 1.0) < 1e-12)
  }

  test("density matches count/width/total (reference normalize, core.py:649)") {
    val ax = Regular("x", 2, 0.0, 2.0)
    val h = hist1d(Seq(0.5, 0.6, 1.5, 1.6, 1.7, 1.8), ax, HistOptions(density = true))
    assert(math.abs(h(0.0) - 2.0 / 1.0 / 6.0) < 1e-12)
    assert(math.abs(h(1.0) - 4.0 / 1.0 / 6.0) < 1e-12)
  }

  test("integer axis: unit bins, flow labelled with Long min/max") {
    val df = Seq(0L, 3L, 3L, 9L, 10L, -5L).toDF("x")
    val h = Histogram.histogram(df, col("x"), IntegerAxis("x", 0L, 10L),
      opts = HistOptions(flow = true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h == Map(0L -> 1.0, 3L -> 2.0, 9L -> 1.0,
      Long.MaxValue -> 1.0, Long.MinValue -> 1.0))
  }

  test("int category: non-member goes to overflow (Long.MaxValue label)") {
    val df = Seq(1L, 1L, 4L, 5L).toDF("x")
    val h = Histogram.histogram(df, col("x"), IntCategory("x", Seq(1L, 4L)),
      opts = HistOptions(flow = true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h == Map(1L -> 2.0, 4L -> 1.0, Long.MaxValue -> 1.0))
  }

  test("str category: non-member goes to '_flow_bin' (core.py:570-575)") {
    val df = Seq("A", "A", "N", "R").toDF("x")
    val h = Histogram.histogram(df, col("x"), StrCategory("x", Seq("A", "N")),
      opts = HistOptions(flow = true))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(h == Map("A" -> 2.0, "N" -> 1.0, "_flow_bin" -> 1.0))
  }

  test("variable axis: irregular edges, boundaries belong to right bin") {
    val ax = Variable("x", Array(0.0, 1.0, 10.0, 100.0))
    val h = hist1d(Seq(0.5, 1.0, 5.0, 99.9, 100.0), ax)
    assert(h == Map(0.0 -> 1.0, 1.0 -> 2.0, 10.0 -> 1.0)) // 100.0 -> overflow
  }

  test("circular axis: values wrap modulo the period") {
    val ax = Circular("x", 4, 0.0, 8.0)
    val h = hist1d(Seq(1.0, 9.0, -7.0, 17.0, 6.0), ax)
    // 1, 9->1, -7->1, 17->1 all wrap to bin [0,2); 6 -> bin [6,8)
    assert(h == Map(0.0 -> 4.0, 6.0 -> 1.0))
  }

  test("circular axis: NaN/inf land in overflow (boost), never the last bin") {
    val ax = Circular("x", 4, 0.0, 8.0)
    val bad = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    // flow=false: non-finite dropped — the [6,8) bin must NOT absorb them
    assert(hist1d(Seq(1.0) ++ bad, ax) == Map(0.0 -> 1.0))
    // flow=true: overflow bin (labelled +inf) holds all three
    val hf = hist1d(Seq(1.0) ++ bad, ax, HistOptions(flow = true))
    assert(hf == Map(0.0 -> 1.0, Double.PositiveInfinity -> 3.0))
  }

  test("log axis: bins equal in log-space") {
    val ax = Regular("x", 3, 1.0, 1000.0, transform = LogT)
    val h = hist1d(Seq(2.0, 15.0, 150.0, 999.0), ax)
    assert(h.keySet.map(_.asInstanceOf[Double]).map(v => math.round(v).toDouble)
      == Set(1.0, 10.0, 100.0))
    assert(h.values.toSeq.sorted == Seq(1.0, 1.0, 2.0))
  }

  test("sqrt axis: bins equal in sqrt-space") {
    val ax = Regular("x", 2, 0.0, 4.0, transform = SqrtT)
    assert(ax.edges.toSeq == Seq(0.0, 1.0)) // sqrt-space edges 0,1,2 -> 0,1,4
    val h = hist1d(Seq(0.5, 2.0, 3.9), ax)
    assert(h == Map(0.0 -> 1.0, 1.0 -> 2.0))
  }

  test("pow(2) axis: bins equal in x^2 space") {
    val ax = Regular("x", 2, 0.0, 2.0, transform = PowT(2.0))
    // x^2-space edges 0,2,4 -> x edges 0, sqrt(2), 2
    assert(ax.edges(1) == math.sqrt(2.0))
    val h = hist1d(Seq(1.0, 1.5), ax)
    assert(h == Map(0.0 -> 1.0, math.sqrt(2.0) -> 1.0))
  }

  test("dims: one histogram per group key (reference loop dims, core.py:271)") {
    val df = Seq(("a", 0.5), ("a", 1.5), ("b", 0.5)).toDF("g", "x")
    val rows = Histogram.histogram(df, col("x"), Regular("x", 2, 0.0, 2.0),
      dims = Seq("g")).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(rows == Map(("a", 0.0) -> 1.0, ("a", 1.0) -> 1.0, ("b", 0.0) -> 1.0))
  }

  test("dense: empty bins materialized with zero") {
    val df = Seq(0.5).toDF("x")
    val h = hist1d(Seq(0.5), Regular("x", 4, 0.0, 4.0), HistOptions(dense = true))
    assert(h == Map(0.0 -> 1.0, 1.0 -> 0.0, 2.0 -> 0.0, 3.0 -> 0.0))
  }

  test("2d histogram: joint bins") {
    val df = Seq((0.5, 0.5), (0.5, 1.5), (1.5, 1.5)).toDF("x", "y")
    val h = Histogram.histogramdd(df,
      Seq(col("x") -> Regular("x", 2, 0.0, 2.0), col("y") -> Regular("y", 2, 0.0, 2.0)))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(h == Map((0.0, 0.0) -> 1.0, (0.0, 1.0) -> 1.0, (1.0, 1.0) -> 1.0))
    val h2 = Histogram.histogram2d(df, col("x"), Regular("x", 2, 0.0, 2.0),
      col("y"), Regular("y", 2, 0.0, 2.0))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(h2 == h) // histogram2d is the 2-axis histogramdd
  }

  test("int storage: counts stay LongType") {
    val df = Seq(0.5, 0.6).toDF("x")
    val out = Histogram.histogram(df, col("x"), Regular("x", 1, 0.0, 1.0),
      opts = HistOptions(intStorage = true))
    assert(out.schema("cnt").dataType == org.apache.spark.sql.types.LongType)
    assert(out.collect().head.getLong(1) == 2L)
  }

  test("integer axis accepts boolean columns (reference bool dtype)") {
    val df = Seq(true, true, false).toDF("x")
    val h = Histogram.histogram(df, col("x"), IntegerAxis("x", 0L, 2L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h == Map(0L -> 1.0, 1L -> 2.0))
  }

  test("quantile bins: equal-frequency edges, deterministic across partitionings") {
    import graft.operators.QuantileBins
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(1000)(rnd.nextDouble() * 100.0)
    def axFor(parts: Int) =
      QuantileBins.quantileAxis(vals.toDF("x").repartition(parts), col("x"), "x", 4)
    val ax = axFor(1)
    assert(axFor(7).allEdges.toSeq == ax.allEdges.toSeq) // rank edges are layout-independent
    val h = Histogram.histogram(vals.toDF("x"), col("x"), ax)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // equal-frequency: every bin holds ~n/4 (the max value goes to overflow)
    assert(h.size == 4 && h.values.forall(c => math.abs(c - 250.0) <= 2.0))
    assert(h.values.sum == 999.0 || h.values.sum == 1000.0)
  }

  test("quantile bins: autoAxisTagged flips exact->sketch at the row threshold") {
    import graft.operators.QuantileBins
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(100)(rnd.nextDouble() * 50.0).toDF("x")
    val exact = QuantileBins.autoAxisTagged(df, col("x"), "x", 4,
      exactThreshold = 100L)
    assert(exact.exact)
    // below/at threshold the tagged axis IS the exact rank axis
    assert(exact.axis.allEdges.toSeq ==
      QuantileBins.quantileAxis(df, col("x"), "x", 4).allEdges.toSeq)
    val sketch = QuantileBins.autoAxisTagged(df, col("x"), "x", 4,
      exactThreshold = 99L)
    assert(!sketch.exact)
    assert(sketch.axis.allEdges.length >= 2)
    // the convenience wrapper returns the same edges as the tagged form
    assert(QuantileBins.autoAxis(df, col("x"), "x", 4, exactThreshold = 100L)
      .allEdges.toSeq == exact.axis.allEdges.toSeq)
  }

  test("quantile bins, sketch path: valid axis, near-uniform fill") {
    import graft.operators.QuantileBins
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(2000)(rnd.nextGaussian() * 10.0)
    val ax = QuantileBins.sketchAxis(vals.toDF("x"), "x", "x", 5, relativeError = 0.001)
    assert(ax.allEdges.length >= 2 && ax.allEdges.sameElements(ax.allEdges.sorted))
    val h = Histogram.histogram(vals.toDF("x"), col("x"), ax)
      .collect().map(_.getDouble(1))
    // sketch edges are approximate: bins are roughly equal-frequency and
    // nearly all rows are covered (max value may fall into overflow)
    assert(h.sum >= 1999.0 - 5.0)
    assert(h.forall(c => c > 250 && c < 550))
  }

  test("quantile bins, sketch path: relErr=0 is rank-exact; rank-error contract holds") {
    import graft.operators.QuantileBins
    val rnd = new scala.util.Random(43)
    val vals = Seq.fill(6000)(rnd.nextDouble() * 1000.0).distinct // distinct -> unambiguous ranks
    val n = vals.size
    val sorted = vals.sorted.toIndexedSeq
    val nBins = 10
    // relErr = 0: the GK summary retains every sample, so edge j is EXACTLY
    // the value at 1-based rank ceil(j/nBins*n); p=0 -> min, p=1 -> max.
    // This is the deterministic rule the q140 oracle mirrors in SQL.
    val exactEdges = QuantileBins
      .sketchAxis(vals.toDF("x"), "x", "x", nBins, relativeError = 0.0).allEdges
    val want = (sorted.head +:
      (1 until nBins).map(j =>
        sorted(math.ceil(j.toDouble / nBins * n).toInt - 1)) :+ sorted.last)
      .distinct
    assert(exactEdges.toSeq == want)
    // realistic relErr: the published GK contract — every interior edge's
    // true rank sits within relErr*n of its target rank j/nBins*n
    val relErr = 0.01
    val ax = QuantileBins
      .sketchAxis(vals.toDF("x"), "x", "x", nBins, relativeError = relErr)
    assert(ax.allEdges.length == nBins + 1) // distinct data, coarse bins: no edge collapse
    for (j <- 1 until nBins) {
      val e = ax.allEdges(j)
      val rank = sorted.count(_ <= e) // well-defined: values distinct
      val target = j.toDouble / nBins * n
      assert(math.abs(rank - target) <= relErr * n + 1.0,
        s"edge $j rank=$rank target=$target")
    }
  }

  test("nulls are never counted") {
    val df = Seq[Option[Double]](Some(0.5), None, Some(1.5)).toDF("x")
    val h = Histogram.histogram(df, col("x"), Regular("x", 2, 0.0, 2.0),
      opts = HistOptions(flow = true))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(h.values.sum == 2.0)
  }

  test("efficiency: per-bin pass fraction with Wilson bounds in [0,1]") {
    val df = Seq((0.5, true), (0.7, true), (0.9, false), (1.5, false))
      .toDF("x", "ok")
    val out = Histogram.efficiency(df, col("x"), Regular("x", 2, 0.0, 2.0),
        col("ok"))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val (n0, k0, e0, lo0, hi0) = out(0.0)
    assert(n0 == 3L && k0 == 2L && math.abs(e0 - 2.0 / 3.0) < 1e-12)
    assert(lo0 > 0.0 && lo0 < e0 && hi0 > e0 && hi0 < 1.0)
    val (n1, k1, e1, lo1, hi1) = out(1.0)
    assert(n1 == 1L && k1 == 0L && e1 == 0.0)
    // Wilson lower at k=0 is 0 up to sqrt(z²) ulp noise
    assert(math.abs(lo1) < 1e-12 && hi1 > 0.0 && hi1 < 1.0)
  }

  test("profile: per-bin count/mean/std of y; null y is not an entry") {
    val df = Seq(
      (0.5, Some(2.0)), (0.7, Some(4.0)),   // bin 0: mean 3, var 1
      (1.5, Some(10.0)),                     // bin 1: single entry, std 0
      (1.6, None),                           // null y: NOT an entry
      (9.0, Some(100.0))                     // out of range: dropped
    ).toDF("x", "y")
    val out = Histogram.profile(df, col("x"), Regular("x", 2, 0.0, 2.0), col("y"))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out == Map(0.0 -> ((2L, 3.0, 1.0)), 1.0 -> ((1L, 10.0, 0.0))))
    // determinism across partitionings (decimal-exact sums)
    val out7 = Histogram.profile(df.repartition(7), col("x"),
        Regular("x", 2, 0.0, 2.0), col("y"))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out7 == out)
  }

  test("profile2d: per-(x,y)-cell count/mean/std of z; out-of-range on either axis drops") {
    val df = Seq(
      (0.5, 0.5, Some(2.0)), (0.7, 0.3, Some(4.0)),  // cell (0,0): mean 3
      (0.5, 1.5, Some(10.0)),                         // cell (0,1)
      (1.5, 0.5, None),                               // null z: not an entry
      (9.0, 0.5, Some(50.0)), (0.5, 9.0, Some(60.0))  // out of range either axis
    ).toDF("x", "y", "z")
    val out = Histogram.profile2d(df, col("x"), Regular("x", 2, 0.0, 2.0),
        col("y"), Regular("y", 2, 0.0, 2.0), col("z"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out == Map((0.0, 0.0) -> ((2L, 3.0, 1.0)), (0.0, 1.0) -> ((1L, 10.0, 0.0))))
  }

  test("weightedProfile: bh WeightedMean accumulator; unit weights reduce to n-1 variance") {
    val df = Seq(
      // bin 0: y in {1, 3} with w = 2 each -> wmean 2, neff = 4 - 8/4 = 2,
      // wvar = (2*1 + 2*1) / 2 = 2
      (0.5, Some(1.0), Some(2.0)), (0.7, Some(3.0), Some(2.0)),
      // bin 1: unit weights -> the n-1 sample variance of {1, 3} = 2
      (1.5, Some(1.0), Some(1.0)), (1.6, Some(3.0), Some(1.0)),
      // bin 2: single entry -> neff = 0 -> NULL variance, mean defined
      (2.5, Some(7.0), Some(5.0)),
      // bin 3: zero weight -> sum_w = 0 -> NULL mean and variance
      (3.5, Some(9.0), Some(0.0)),
      // NULL y / NULL w are not entries; out of range dropped
      (0.1, None, Some(1.0)), (0.1, Some(1.0), None), (9.0, Some(1.0), Some(1.0))
    ).toDF("x", "y", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Histogram.weightedProfile(d, col("x"), Regular("x", 4, 0.0, 4.0),
          col("y"), col("w"))
        .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2),
          r.getDouble(3), Option(r.get(4)), Option(r.get(5))))).toMap
    val out = run(df)
    assert(out(0.0) == ((2L, 4.0, 8.0, Some(2.0), Some(2.0))))
    assert(out(1.0) == ((2L, 2.0, 2.0, Some(2.0), Some(2.0))))
    assert(out(2.0) == ((1L, 5.0, 25.0, Some(7.0), None)))
    assert(out(3.0) == ((1L, 0.0, 0.0, None, None)))
    // determinism across partitionings (decimal/quantized-integer sums)
    assert(run(df.repartition(7)) == out)
  }

  test("histogramCube: every grouping level equals its standalone histogram") {
    val ax = Regular("v", 4, 0.0, 4.0)
    val df = Seq(
      ("a", "x", 0.5), ("a", "x", 1.5), ("a", "y", 1.5), ("a", "y", 2.5),
      ("b", "x", 0.5), ("b", "y", 3.5), ("b", "y", 3.5)
    ).toDF("g1", "g2", "v")
    val cube = Histogram.histogramCube(df, col("v"), ax, Seq("g1", "g2"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getDouble(3)) -> r.getDouble(4)).toMap
    def level(dims: Seq[String], gid: Long): Unit = {
      val h = Histogram.histogram(df, col("v"), ax, dims = dims).collect()
      h.foreach { r =>
        val g1 = if (dims.contains("g1")) Some(r.getString(dims.indexOf("g1")))
          else None
        val g2 = if (dims.contains("g2")) Some(r.getString(dims.indexOf("g2")))
          else None
        val bin = r.getDouble(dims.size)
        val cnt = r.getDouble(dims.size + 1)
        assert(cube((g1, g2, gid, bin)) == cnt, s"dims=$dims bin=$bin")
      }
    }
    level(Seq("g1", "g2"), 0L)
    level(Seq("g1"), 1L)       // g2 grouped away -> bit 0 set
    level(Seq("g2"), 2L)       // g1 grouped away -> bit 1 (MSB) set
    level(Nil, 3L)
    // 4 levels of the same mass, nothing extra
    assert(cube.keys.map(_._3).toSet == Set(0L, 1L, 2L, 3L))
  }
}
