package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: chunkDedup at soak scale (the SoakPipeline corpus shape —
  * sf0.1 documents replicated, 10% verbatim copies whose EVERY chunk
  * repeats, 90% suffix-perturbed whose chunks repeat except the tail).
  * Records wall + the retention distribution so the operator's
  * linear-shuffle claim has a measured point at 1000× gate scale.
  * args: [replication] [docsParquet] */
object ProbeChunkDedup {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 1000
    val src = if (args.length > 1) args(1)
      else "/root/testdata/sf0.1/documents.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(src)
      .select(col("doc_id"), col("text"))
      .withColumn("__r", explode(expr(s"sequence(0, ${rep - 1})")))
      .select((col("doc_id") * rep + col("__r")).as("doc_id"),
        when(col("__r") % 10 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" v"), col("__r"))).as("text"))
      .persist()
    println(s"[probe] docs=${docs.count()} (rep=$rep)")
    val t0 = System.nanoTime()
    val out = graft.pipeline.Dedup.chunkDedup(docs, chunkTokens = 10)
    val agg = out.agg(count(lit(1)), sum("n_chunks"), sum("n_kept"),
      sum("n_tokens"), sum("kept_tokens")).collect()(0)
    println(f"[probe] chunkDedup: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"docs=${agg.getLong(0)} chunks=${agg.getLong(1)} " +
      s"kept=${agg.getLong(2)} tokens=${agg.getLong(3)} " +
      s"kept_tokens=${agg.getLong(4)}")
    spark.stop()
  }
}
