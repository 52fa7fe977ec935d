package graft.tools

import org.apache.spark.sql.SparkSession

/** Compares auto-guard vs explicit-cap candidate counts (dev tool). */
object ProbeGuard2 {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(path).persist()
    println(s"docs=${docs.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[probe2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    time("cand_auto")(graft.pipeline.Dedup.minhashLsh(docs).count())
    graft.pipeline.Dedup.clearCache()
    time("cand_cap16")(
      graft.pipeline.Dedup.minhashLsh(docs, bucketCap = Some(16)).count())
    spark.stop()
  }
}
