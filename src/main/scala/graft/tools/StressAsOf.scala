package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key stress for the as-of join (dev tool): one pathological user
  * holds `hot` left rows and `hot` right rows — the candidate volume a
  * range-join shape must verify is hot², while the union+window form
  * sorts 2·hot rows. Times the union+window operator against the naive
  * inequality-join + per-left argmax form at growing hot sizes: the
  * naive curve is quadratic, the operator's is linear (and at real
  * skew the naive form simply does not finish). */
object StressAsOf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mk(hot: Long): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      // hot user 0 with `hot` rows per side; 1000 cold users with 100 each
      val left = spark.range(hot).select(($"id" + 1000000L).as("event_id"),
          lit(0L).as("user_id"), ($"id" * 7L + 3L).as("ts"))
        .union(spark.range(100L * 1000).select(($"id" + 5000000L).as("event_id"),
          ($"id" % 1000L + 1L).as("user_id"), ($"id" * 11L + 5L).as("ts")))
      val right = spark.range(hot).select($"id".as("event_id"),
          lit(0L).as("user_id"), ($"id" * 7L).as("ts"),
          ($"id" % 97L).cast("double").as("value"))
        .union(spark.range(100L * 1000).select(($"id" + 9000000L).as("event_id"),
          ($"id" % 1000L + 1L).as("user_id"), ($"id" * 11L).as("ts"),
          lit(1.0).as("value")))
      (left, right)
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }

    for (hot <- Seq(10000L, 50000L, 200000L, 1000000L)) {
      val (l, r) = mk(hot)
      time(s"asof_window hot=$hot")(graft.pipeline.AsOf.asOfJoin(
        l, r, "user_id", "ts", "event_id", Seq("ts", "value")).count())
      // the naive range-join form, only while it still finishes: measured
      // 9.0 s at hot=10k, 100 s at hot=50k (the hot² curve — 200k
      // projects to ~27 min, 1M to ~11 h) vs the window form's flat
      // 0.3-0.5 s through hot=1M
      if (hot <= (if (sys.env.contains("STRESS_ASOF_FULL")) 10000000L else 50000L)) {
        time(s"asof_rangejoin hot=$hot") {
          // consume the max struct — a bare count() after the groupBy
          // lets Catalyst prune the aggregate and ELIMINATE the left
          // join (distinct left keys are join-invariant), measuring
          // nothing; folding the match times keeps the hot² probe real
          l.as("l").join(r.as("r"),
              $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts", "left")
            .groupBy($"l.event_id")
            .agg(max(struct($"r.ts", $"r.event_id", $"r.value")).as("m"))
            .select(sum($"m.ts")).collect()
          l.count()
        }
      }
    }
    spark.stop()
  }
}
