package graft

import graft.axes._
import graft.operators.{HistOptions, Histogram}
import graft.stats.HistStats
import org.apache.spark.sql.functions._

/** Randomized property tests (seeded, deterministic): the Spark histogram
  * must agree with a direct Scala implementation of boost semantics on
  * arbitrary data and axes. */
class HistogramPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  private def randomCase(): (Seq[Double], Regular) = {
    val n = 1 + rng.nextInt(200)
    val xs = Seq.fill(n)(-50.0 + rng.nextDouble() * 200.0)
    val bins = 1 + rng.nextInt(30)
    val lo = -20.0 + rng.nextDouble() * 40.0
    val ax = Regular("x", bins, lo, lo + 1.0 + rng.nextDouble() * 99.0)
    (xs, ax)
  }

  /** Direct boost-semantics reference: half-open bins, x==hi -> overflow. */
  private def refHist(xs: Seq[Double], ax: Regular): Map[Int, Double] =
    xs.map { x =>
      if (x < ax.lo) -1
      else if (x >= ax.hi) ax.n
      else math.min(math.floor((x - ax.lo) / (ax.hi - ax.lo) * ax.n).toInt, ax.n - 1)
    }.groupBy(identity).view.mapValues(_.size.toDouble).toMap

  test("sparse histogram equals direct binning on 20 random cases") {
    (1 to 20).foreach { _ =>
      val (xs, ax) = randomCase()
      val got = Histogram.histogram(xs.toDF("x"), col("x"), ax,
          opts = HistOptions(flow = true))
        .collect().map { r =>
          val lbl = r.getDouble(0)
          val idx =
            if (lbl == Double.NegativeInfinity) -1
            else if (lbl == Double.PositiveInfinity) ax.n
            else ax.edges.indexWhere(_ == lbl)
          idx -> r.getDouble(1)
        }.toMap
      assert(got == refHist(xs, ax), s"axis=$ax")
    }
  }

  test("transformed axes equal direct fwd-space binning on 15 random cases") {
    (1 to 15).foreach { i =>
      val tf: AxTransform = i % 3 match {
        case 0 => LogT
        case 1 => SqrtT
        case _ => PowT(2.0)
      }
      val n = 1 + rng.nextInt(20)
      val lo = 0.5 + rng.nextDouble() * 5.0 // > 0, valid for all transforms
      val hi = lo + 1.0 + rng.nextDouble() * 50.0
      val ax = Regular("x", n, lo, hi, transform = tf)
      val xs = Seq.fill(1 + rng.nextInt(150))(rng.nextDouble() * 70.0)
      val got = Histogram.histogram(xs.toDF("x"), col("x"), ax)
        .collect().map { r =>
          ax.edges.indexWhere(_ == r.getDouble(0)) -> r.getDouble(1)
        }.toMap
      val tLo = tf.fwd(lo); val tSpan = tf.fwd(hi) - tLo
      val want = xs.filter(x => x >= lo && x < hi).map { x =>
        math.min(math.floor((tf.fwd(x) - tLo) / tSpan * n).toInt, n - 1)
      }.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      assert(got == want, s"axis=$ax")
    }
  }

  test("circular axis equals direct modular binning on 15 random cases") {
    (1 to 15).foreach { _ =>
      val n = 1 + rng.nextInt(24)
      val lo = -10.0 + rng.nextDouble() * 20.0
      val span = 1.0 + rng.nextDouble() * 50.0
      val ax = Circular("x", n, lo, lo + span)
      // inject non-finite values: they must go to overflow (dropped when
      // flow=false), never perturb any regular bin's count
      val finite = Seq.fill(1 + rng.nextInt(150))(-200.0 + rng.nextDouble() * 400.0)
      val xs = rng.shuffle(finite ++
        Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      val got = Histogram.histogram(xs.toDF("x"), col("x"), ax)
        .collect().map { r =>
          ax.edges.indexWhere(_ == r.getDouble(0)) -> r.getDouble(1)
        }.toMap
      val want = finite.map { x =>
        val shifted = x - lo
        val wrapped = shifted - math.floor(shifted / span) * span
        math.min(math.floor(wrapped / span * n).toInt, n - 1)
      }.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      assert(got == want, s"axis=$ax")
    }
  }

  test("variable axis equals direct binning on 15 random edge sets") {
    (1 to 15).foreach { _ =>
      val nEdges = 2 + rng.nextInt(10)
      val edges = Seq.fill(nEdges)(-50.0 + rng.nextDouble() * 200.0)
        .distinct.sorted.toArray
      if (edges.length >= 2) {
        val ax = Variable("x", edges)
        val xs = Seq.fill(1 + rng.nextInt(150))(-60.0 + rng.nextDouble() * 220.0)
        val got = Histogram.histogram(xs.toDF("x"), col("x"), ax,
            opts = HistOptions(flow = true))
          .collect().map { r =>
            val lbl = r.getDouble(0)
            val idx =
              if (lbl == Double.NegativeInfinity) -1
              else if (lbl == Double.PositiveInfinity) ax.nBins
              else ax.edges.indexWhere(_ == lbl)
            idx -> r.getDouble(1)
          }.toMap
        val want = xs.map { x =>
          if (x < edges.head) -1
          else if (x >= edges.last) ax.nBins
          else edges.lastIndexWhere(_ <= x)
        }.groupBy(identity).view.mapValues(_.size.toDouble).toMap
        assert(got == want, s"edges=${edges.toSeq}")
      }
    }
  }

  test("keepPred == index-range predicate for every axis type and flow combo") {
    // keepPred is load-bearing: the Spark filter uses it while the DuckDB
    // oracle filters by index bounds — any divergence (NaN, +-inf, null,
    // exact edges) is a silent correctness gap the data-driven gates might
    // miss.
    val axes: Seq[BinAxis] = Seq(
      Regular("x", 7, -3.0, 11.0),
      Regular("x", 5, 1.0, 1000.0, transform = LogT),
      Variable("x", Array(-2.0, 0.5, 3.0, 9.0)),
      Circular("x", 6, 0.0, 24.0),
      IntegerAxis("x", -2L, 7L),
      IntCategory("x", Seq(1L, 4L, 9L)),
      StrCategory("x", Seq("a", "b")))
    val doubles = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      -1e300, -3.0000000001, -3.0, -2.0, 0.0, 0.5, 3.0, 9.0, 10.9999, 11.0, 24.0,
      1.0, 999.999, 1000.0, 1e300) ++ Seq.fill(60)(-20.0 + rng.nextDouble() * 1100.0)
    axes.foreach { ax =>
      val df = ax match {
        case _: StrCategory =>
          (Seq("a", "b", "zz", "") ++ Seq(null).map(_.asInstanceOf[String])).toDF("x")
        case _: IntegerAxis | _: IntCategory =>
          (Seq(-5L, -2L, 0L, 1L, 4L, 6L, 7L, 9L, 99L).map(Option(_)) :+
            Option.empty[Long]).toDF("x")
        case _ => (doubles.map(Option(_)) :+ Option.empty[Double]).toDF("x")
      }
      for (fu <- Seq(false, true); fo <- Seq(false, true)) {
        val inclU = fu && ax.underflow
        val inclO = fo && ax.overflow
        val lo = if (inclU) -1L else 0L
        val hi = if (inclO) ax.nBins.toLong else ax.nBins - 1L
        val i = ax.index(col("x"))
        val viaIndex = df.select(
          (i.isNotNull && i >= lit(lo) && i <= lit(hi)).as("k")).collect().map(_.getBoolean(0))
        val viaPred = df.select(
          coalesce(ax.keepPred(col("x"), inclU, inclO), lit(false)).as("k"))
          .collect().map(_.getBoolean(0))
        assert(viaIndex.toSeq == viaPred.toSeq, s"axis=$ax inclU=$inclU inclO=$inclO")
      }
    }
  }

  test("mean agrees with direct computation on bin centers (10 random cases)") {
    var done = 0
    while (done < 10) {
      val (xs, ax) = randomCase()
      val inRange = xs.filter(x => x >= ax.lo && x < ax.hi)
      if (inRange.nonEmpty) {
        val centers = inRange.map { x =>
          val i = math.min(
            math.floor((x - ax.lo) / (ax.hi - ax.lo) * ax.n).toInt, ax.n - 1)
          ax.edges(i) + ax.widths(i) / 2.0
        }
        val expected = centers.sum / centers.size
        val m = HistStats.mean(xs.toDF("x"), col("x"), ax, Nil).head().getDouble(0)
        assert(math.abs(m - expected) < 1e-6 * math.max(1.0, math.abs(expected)),
          s"axis=$ax got=$m want=$expected")
        done += 1
      }
    }
  }

  test("density integrates to 1 (10 random cases)") {
    var done = 0
    while (done < 10) {
      val (xs, ax) = randomCase()
      if (xs.exists(x => x >= ax.lo && x < ax.hi)) {
        val pdf = Histogram.histogram(xs.toDF("x"), col("x"), ax,
          opts = HistOptions(density = true)).collect()
        val integral = pdf.map { r =>
          val w = ax.widths(ax.edges.indexWhere(_ == r.getDouble(0)))
          r.getDouble(1) * w
        }.sum
        assert(math.abs(integral - 1.0) < 1e-9, s"axis=$ax integral=$integral")
        done += 1
      }
    }
  }
}
