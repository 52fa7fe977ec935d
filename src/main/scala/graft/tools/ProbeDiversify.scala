package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures graphSearch recall over the RobustPrune-diversified graph
  * vs the raw graph (dev tool). */
object ProbeDiversify {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 10)
      val g = graft.pipeline.Similarity.knnGraph(emb, 10, rounds = 2)
        .localCheckpoint(true)
      val dg = graft.pipeline.Similarity.diversifyGraph(emb, g, r = 6,
        alpha = 1.2).localCheckpoint(true)
      val exact = graft.pipeline.Similarity.bruteForceTopK(emb, queries, 3)
      def recall(graph: org.apache.spark.sql.DataFrame): Double = {
        val approx = graft.pipeline.Similarity.graphSearch(
          emb, queries, 3, graph, rounds = 2, beam = 8)
        exact.select(col("query_id"), col("neighbor_id"))
          .join(approx.select(col("query_id"), col("neighbor_id"),
            lit(1L).as("__h")), Seq("query_id", "neighbor_id"), "left")
          .agg(sum(coalesce(col("__h"), lit(0L))).cast("double") /
            count(lit(1)).cast("double"))
          .collect()(0).getDouble(0)
      }
      val er = g.count(); val ep = dg.count()
      println(f"DIV $d edges=$er->$ep rawRecall=${recall(g)}%.3f prunedRecall=${recall(dg)}%.3f")
      graft.pipeline.Dedup.clearCache()
    }
    spark.stop()
  }
}
