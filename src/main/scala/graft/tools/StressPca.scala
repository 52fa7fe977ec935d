package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the PCA family (dev tool): the covariance pass is
  * the whole corpus cost (in-row upper-triangle pair generation, the
  * corpus never shuffled); the eigen math is d×d driver-bounded; the
  * projections are map-only literal dots. Run on a replicated / large
  * embeddings parquet to verify near-linear growth. */
object StressPca {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/sfbig_embeddings.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(path).persist()
    println(s"vectors=${emb.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    time("embed_covariance_agg")(
      graft.pipeline.Similarity.embedCovarianceAgg(emb).count())
    time("embed_covariance")(
      graft.pipeline.Similarity.embedCovariance(emb).count())
    time("pca_power_12it")(
      graft.pipeline.Similarity.pcaPower(emb, iters = 12).count())
    time("pca_project")(
      graft.pipeline.Similarity.pcaProject(emb, iters = 12).count())
    time("remove_top_component")(
      graft.pipeline.Similarity.removeTopComponent(emb, iters = 12).count())
    val top = graft.pipeline.Similarity.pcaPower(emb, iters = 12)
      .orderBy(desc("loading")).limit(1).collect().head
    println(f"[pca] top loading dim=${top.getInt(0)} share=${top.get(3)}")
    spark.stop()
  }
}
