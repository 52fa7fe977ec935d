package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession

/** Phase profiler for minhash LSH (dev tool). */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm")(docs.count())
    val sig = Dedup.minhashSignature(docs)
    time("signature")(println("  rows=" + sig.count()))
    time("full lsh")(println("  pairs=" + Dedup.minhashLsh(docs).count()))
    spark.stop()
  }
}
