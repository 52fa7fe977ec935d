package graft.tools

import org.apache.spark.sql.SparkSession

/** Sequential isolated timings for the benchmark's slowest queries
  * (dev tool; bench itself runs concurrently). */
object ProfileTop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q54_neardup_pipeline", "q43_ngram_jaccard", "q41_dedup_minhash",
      "q42_dedup_simhash", "q52_ann_ivf", "q07_hist_dd3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BC", "10485760"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.cacheTables(spark, sfDir)
    names.foreach { n =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[isolated] $n run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
    }
    spark.stop()
  }
}
