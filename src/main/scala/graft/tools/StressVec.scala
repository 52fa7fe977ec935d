package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the embedding-similarity family (dev tool; pass the
  * parquet path — e.g. a replicated embeddings table). Checks the shapes
  * that must hold at 100 TB: near-dup pair volume bounded by the
  * (label, table, bucket) blocking, ANN candidate volume bounded by
  * buckets/cells, and near-linear runtime growth in corpus size. */
object StressVec {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/sfbig_embeddings.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(path).persist()
    println(s"vectors=${emb.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    val q = emb.filter(col("vec_id") < 10)
    time("neardup_bucketed")(graft.pipeline.Similarity.nearDup(emb, 0.35).count())
    time("ann_lsh")(graft.pipeline.Similarity.annLsh(emb, q, 5).count())
    time("ann_ivf_128c")(
      graft.pipeline.Similarity.annIvf(emb, q, 5, nCells = 128, nprobe = 4).count())
    time("ann_bruteforce")(graft.pipeline.Similarity.bruteForceTopK(emb, q, 5).count())
    graft.pipeline.Dedup.clearCache()
    spark.stop()
  }
}
