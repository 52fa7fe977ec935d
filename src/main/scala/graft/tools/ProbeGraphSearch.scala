package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures graphSearch recall vs brute force across scale dirs (dev tool). */
object ProbeGraphSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 10)
      for ((rr, bm) <- Seq((2, 8))) {
        val t0 = System.nanoTime()
        val g = graft.pipeline.Similarity.knnGraph(emb, 10, rounds = 2)
        val got = graft.pipeline.Similarity.graphSearch(
          emb, queries, 3, g, rounds = rr, beam = bm)
        val exact = graft.pipeline.Similarity.bruteForceTopK(emb, queries, 3)
        val hits = exact.select(col("query_id"), col("neighbor_id"))
          .join(got.select(col("query_id"), col("neighbor_id"),
            lit(1L).as("__h")), Seq("query_id", "neighbor_id"), "left")
          .agg(sum(coalesce(col("__h"), lit(0L))).cast("double") /
            count(lit(1)).cast("double"))
          .collect()(0).getDouble(0)
        println(f"GSEARCH $d r=$rr beam=$bm recall=$hits%.3f " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
        graft.pipeline.Dedup.clearCache()
      }
    }
    spark.stop()
  }
}
