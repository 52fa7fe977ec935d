package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the LSH blocking report for each documents.parquet given —
  * sizing evidence for the auto skew-guard threshold in minhashLsh
  * (dev tool). */
object ProbeBlocking {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (p <- args) {
      val docs = spark.read.parquet(p)
      println(s"REPORT $p -> " +
        graft.pipeline.Dedup.blockingReport(docs).collect()(0))
    }
    spark.stop()
  }
}
