package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the rank-statistics / ML-eval family (AUC, MWU,
  * per-day AUC, calibration, Benford, classifier eval, KM survival) on
  * the 1e8-row MakeBig events table: the question each timing answers
  * is whether the operator's cost tracks the ONE corpus pass plus the
  * collapsed distinct-score relation (52k rows here), never a global
  * sort of raw rows. */
object StressRank {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/sfbig_events.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(path)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .persist()
    println(s"events=${ev.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    import graft.pipeline.RankStats
    val pos = col("event_type") === "t0"
    time("auc")(RankStats.auc(ev, "value", pos).count())
    time("mann_whitney")(RankStats.mannWhitney(ev, "value", pos).count())
    time("daily_auc")(RankStats.aucByGroup(ev,
      expr("unix_micros(event_time) div 86400000000"), "day",
      "value", pos).count())
    val scored = ev.withColumn("score", col("value") / lit(512.0))
    time("reliability")(RankStats.reliability(scored, "score", pos).count())
    time("classifier_eval")(
      RankStats.classifierEval(ev, "value", pos, 256.0).count())
    time("benford")(RankStats.benfordAudit(ev, "value").count())
    time("km_survival")(RankStats.kmSurvival(ev).count())
    time("km_summary")(RankStats.kmSummary(ev).count())
    time("best_threshold")(RankStats.bestThreshold(ev, "value", pos).count())
    time("pr_curve")(RankStats.prCurve(ev, "value", pos).count())
    time("logistic_fit")(RankStats.logisticFit(
      scored, "score", pos).count())
    time("windowed_auc")(graft.streaming.StreamingHist.windowedAuc(
      ev, "event_time", col("value") / lit(512.0), pos, "1 hour").count())
    spark.stop()
  }
}
