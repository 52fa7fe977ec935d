package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase-level profiler for the n-gram Jaccard join — mirrors the CURRENT
  * Dedup.ngramJaccard implementation (dev tool). */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val k = 8; val threshold = 0.8

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warm")(docs.count())

    val gsets = docs.select(col("doc_id"),
        graft.functions.GramHashes.gram_hashes(col("text"), col("source"), k).as("gset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("gsets")(println("  rows=" + gsets.count()))

    val sizes = gsets.select(col("doc_id"), size(col("gset")).cast("long").as("sz"))
    val prefix = gsets.select(col("doc_id"),
        explode(expr(s"slice(gset, 1, CAST(FLOOR(${1.0 - threshold} * size(gset)) AS INT) + 1)")).as("__k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix")(println("  rows=" + prefix.count()))

    val szA = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa")
    val szB = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb")
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.__k") === col("b.__k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(broadcast(szA), "doc_a").join(broadcast(szB), "doc_b")
      .filter(col("sa").cast("double") >= lit(threshold) * col("sb").cast("double") &&
        col("sb").cast("double") >= lit(threshold) * col("sa").cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cand")(println("  rows=" + cand.count()))

    val inter = cand
      .join(gsets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("gset", "ga"), "doc_a")
      .join(gsets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("gset", "gb"), "doc_b")
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sorted_intersect_count(col("ga"), col("gb")))
      .select("doc_a", "doc_b", "sa", "sb", "inter")
    time("verify")(println("  rows=" + inter.count()))
    spark.stop()
  }
}
