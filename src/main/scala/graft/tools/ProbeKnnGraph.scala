package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures knnGraph recall vs brute force across scale dirs (dev tool). */
object ProbeKnnGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      for ((kk, rr) <- Seq((10, 4))) {
      val t0 = System.nanoTime()
      val g = graft.pipeline.Similarity.knnGraph(emb, kk, rounds = rr)
        .filter(col("query_id") < 10)
      val exact = graft.pipeline.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), 3)
      val r = graft.pipeline.Contracts.annRecallContract(g, exact, 0.0)
      // re-derive the raw recall for sizing
      val hits = exact.select(col("query_id"), col("neighbor_id"))
        .join(g.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("__h")), Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("__h"), lit(0L))).cast("double") /
          count(lit(1)).cast("double"))
        .collect()(0).getDouble(0)
      println(f"KNNG $d k=$kk r=$rr recall=$hits%.3f wall=${(System.nanoTime()-t0)/1e9}%.1f s " +
        s"contract=${r.collect()(0)}")
      graft.pipeline.Dedup.clearCache()
      }
    }
    spark.stop()
  }
}
