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
