package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures jlSearchTopK recall vs full-dim exact (dev tool). */
object ProbeJl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args; (dims, short) <- Seq((32, 100))) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 10)
      val approx = graft.pipeline.Similarity.jlSearchTopK(
        emb, queries, 3, dims, short)
      val exact = graft.pipeline.Similarity.bruteForceTopK(emb, queries, 3)
      val hits = exact.select(col("query_id"), col("neighbor_id"))
        .join(approx.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("__h")), Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("__h"), lit(0L))).cast("double") /
          count(lit(1)).cast("double"))
        .collect()(0).getDouble(0)
      println(f"JLS $d dims=$dims short=$short recall=$hits%.3f")
      graft.pipeline.Dedup.clearCache()
    }
    spark.stop()
  }
}
