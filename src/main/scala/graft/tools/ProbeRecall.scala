package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Dev tool: measure q46/q52 recall vs exact top-k at each sf, to pick
  * the q163/q164 recall-contract bounds with margin. */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
    for (sf <- dirs) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val qset = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, qset, 3)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def rec(ap: org.apache.spark.sql.DataFrame): Double = {
        val s = ap.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        exact.count(s.contains).toDouble / exact.size
      }
      val lsh = rec(Similarity.annLsh(emb, qset, 3, tables = 8, bits = 8, probeHamming = 2))
      val ivf = rec(Similarity.annIvf(emb, qset, 3, nCells = 64, nprobe = 8))
      println(s"RECALL $sf exact=${exact.size} lsh=$lsh ivf=$ivf")
      // the q229 gated config, vs the L2 exact ranking it contracts against
      val exactL2 = Similarity.bruteForceL2TopK(emb, qset, 3)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recL2(ap: org.apache.spark.sql.DataFrame): Double = {
        val s = ap.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        exactL2.count(s.contains).toDouble / exactL2.size
      }
      val ivfpq = recL2(Similarity.ivfPqSearch(emb, qset, 3, nCells = 16,
        nprobe = 8, m = 8, codes = 64, rerank = 100))
      println(s"RECALL-L2 $sf ivfpq(nCells=16,nprobe=8,m=8,k=64,rr=100)=$ivfpq")
      val trunc = recL2(Similarity.truncatedSearch(emb, qset, 3,
        dPrefix = 32, rerank = 100))
      println(s"RECALL-L2 $sf truncated(dPrefix=32,rr=100)=$trunc")
    }
    spark.stop()
  }
}
