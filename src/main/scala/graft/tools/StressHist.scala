package graft.tools

import graft.axes.Regular
import graft.operators.{HistOptions, Histogram, HistVectorAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Core-engine scale stress: histogram throughput on an enlarged events
  * table (dev tool; pass the parquet path). Reports rows/s per operator
  * shape — the number that must hold at 100 TB. */
object StressHist {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/sfbig_events.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Vectorized parquet scan with small splits: a single local file at the
    // default 128 MB split size yields ~2 scan tasks (measuring single-file
    // decode, not the operator), and a deserialized-cache scan is SLOWER
    // than the columnar reader feeding whole-stage codegen (measured: 47 vs
    // 78 Mrows/s on the 1-D count path). At 100 TB the scan has thousands
    // of splits and this shape — columnar scan straight into codegen'd
    // filter/project/agg — is the real one.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    val ev = spark.read.parquet(path)
    val n = ev.count()
    println(s"rows=$n")
    val ax = Regular("value", 16, 0.0, 512.0)
    val ax1k = Regular("value", 1024, 0.0, 512.0)
    def time(name: String)(f: => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (dt, c) = times.minBy(_._1)
      println(f"[stress] $name best-of-3: $dt%.2f s (${n / dt / 1e6}%.1f Mrows/s, $c out)")
    }
    time("hist_1d")(Histogram.histogram(ev, col("value"), ax).count())
    time("hist_1d_fast")(
      graft.operators.FastHist.histogram1d(ev, col("value"), ax).count())
    time("hist_1d_grouped")(
      Histogram.histogram(ev, col("value"), ax, Seq("event_type")).count())
    time("hist_weighted_dec")(Histogram.histogram(ev, col("value"), ax,
      opts = HistOptions(weight = Some(col("value")))).count())
    time("hist_vector_1k")(
      HistVectorAgg.histogram(ev, col("value"), ax1k, Seq("event_type")).count())
    time("hist_sparse_1k")( // the row-per-bin layout the vector agg replaces
      Histogram.histogram(ev, col("value"), ax1k, Seq("event_type"),
        HistOptions(dense = true)).count())
    time("qbins_sketch")({
      // autoAxis above threshold: GK sketch pass, NO global sort
      val qax = graft.operators.QuantileBins.autoAxis(
        ev, col("value"), "value", 10, exactThreshold = 1000000L)
      val h = Histogram.histogram(ev, col("value"), qax)
      val plan = h.queryExecution.executedPlan.toString
      require(!plan.contains("rangepartitioning"),
        "sketch qbins plan must not contain a global sort")
      h.count()
    })
    // GK precision/speed curve: relativeError is the 100 TB lever — each
    // edge lands within ±relErr of its quantile fraction, and looser
    // sketches merge far cheaper
    for (re <- Seq(1e-3, 1e-2)) {
      time(f"qbins_sketch_relerr_$re%.0e")({
        val qax = graft.operators.QuantileBins.autoAxis(
          ev, col("value"), "value", 10,
          exactThreshold = 1000000L, relativeError = re)
        Histogram.histogram(ev, col("value"), qax).count()
      })
    }
    // 2-D kernel vs declarative dense grid (needs a 2-double-column file;
    // skipped when absent)
    val pairsPath = "/tmp/sf100m_pairs.parquet"
    if (new java.io.File(pairsPath).exists()) {
      val pairs = spark.read.parquet(pairsPath)
      val axX = Regular("x", 16, 0.0, 512.0)
      val axY = Regular("y", 16, 0.0, 512.0)
      time("hist_2d_decl")(Histogram.histogramdd(pairs,
        Seq(col("x") -> axX, col("y") -> axY),
        opts = HistOptions(dense = true)).count())
      time("hist_2d_fast")(graft.operators.FastHist.histogram2d(
        pairs, col("x"), axX, col("y"), axY).count())
    }
    time("windowed_hist")({
      // the stress copy stores ts as a real timestamp; testdata as nanos
      val eventTime =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else col("ts").cast("timestamp")
      val e = ev.withColumn("event_time", eventTime)
      graft.streaming.StreamingHist.windowedHistogram(
        e, "event_time", col("value"), ax, "1 hour").count()
    })
    spark.stop()
  }
}
