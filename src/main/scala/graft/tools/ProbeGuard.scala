package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the auto-skew-guarded near-dup pipeline on a documents corpus
  * with WARN logging visible, so the guard's decision is observable
  * (dev tool). */
object ProbeGuard {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path).persist()
    println(s"docs=${docs.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    time("near_dup_pairs_auto")(
      graft.pipeline.Dedup.nearDupPairs(docs).count())
    time("leak_free_split_auto")(
      graft.pipeline.Dedup.leakFreeSplit(docs, 0.1, 0.1, "lfs1").count())
    spark.stop()
  }
}
