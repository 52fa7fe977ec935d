package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the events-analytics family (sessionize / funnel /
  * retention): runs them on an enlarged events table (dev tool; pass a
  * parquet path, e.g. a user-offset-replicated events table — replication
  * multiplies USERS, preserving per-user event structure, so per-key state
  * stays constant while key cardinality scales). */
object StressEvents {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/stress_events.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // normalize whatever ts encoding the copy carries (nanos-long, NTZ,
    // timestamp) to epoch-nanos long — the loader-point convention
    val raw = graft.sources.Tables.normalizeEventsTs(spark.read.parquet(path))
    val ev = raw.withColumn("event_time",
      timestamp_micros(expr("ts div 1000"))).persist()
    println(s"events=${ev.count()} users=${ev.select("user_id").distinct().count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    time("sessionize")(graft.streaming.StreamingHist.sessionize(
      ev, "event_time", "user_id", "6 hours", col("value")).count())
    time("funnel")(graft.pipeline.Funnel.funnel(
      ev, Seq("view", "click", "purchase")).count())
    time("retention")(graft.pipeline.Funnel.retention(ev).count())
    time("active_users_7d")(graft.pipeline.Funnel.activeUsers(ev, 7).count())
    // the repo's canonical events-value axis (0-512 covers the domain);
    // a narrow axis would filter most rows and measure nothing
    time("windowed_hist")(graft.streaming.StreamingHist.windowedHistogram(
      ev, "event_time", col("value"), graft.axes.Regular("value", 16, 0.0, 512.0),
      "1 hour").count())
    // as-of join: union+window — cost must track the INPUT row count
    // (L+R per key), never the LxR candidate volume a range join pays
    val us = ev.withColumn("us", expr("ts div 1000"))
    time("asof_join")(graft.pipeline.AsOf.asOfJoin(
      us.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "us"),
      us.filter(col("event_type") === "view")
        .select("event_id", "user_id", "us", "value"),
      "user_id", "us", "event_id", Seq("us", "value"), prefix = "view_").count())
    // exact KS: the window stage must run on the distinct-value relation
    time("ks_test")(graft.stats.HistStats.ksTest(
      us.withColumn("day", expr("us div 86400000000")),
      col("value"), col("event_type") === lit("view"),
      dims = Seq("day")).count())
    // anomaly scan: corpus collapses to (type, day) in one aggregate, the
    // z-score window runs on that tiny relation — cost must track the
    // aggregate, not the window
    time("rate_anomaly_7d")(graft.pipeline.Funnel.eventRateAnomaly(
      ev, windowDays = 7, k = 2.0).count())
    // windowed distinct: batch form is one count_distinct aggregate per
    // tumbling window; in streaming the dedup state is one row per
    // distinct (window, key) — this measures the batch cost AND prints
    // the state bound (rows the streaming form would hold per window)
    time("windowed_distinct_1h")(graft.streaming.StreamingHist
      .windowedDistinct(ev, "event_time", "user_id", "1 hour").count())
    val stateRows = ev.filter(col("user_id").isNotNull)
      .select((expr("ts div 1000") - pmod(expr("ts div 1000"),
        lit(3600000000L))).as("ws"), col("user_id"))
      .distinct().count()
    println(s"[stress] windowed_distinct_1h state bound: $stateRows distinct (window, key) rows")
    // schema-on-read JSON promotion: one codegen parse per row, one
    // |types|-row aggregate
    if (raw.columns.contains("props"))
      time("props_stats")(graft.pipeline.Funnel.jsonFieldStats(ev, "k").count())
    spark.stop()
  }
}
