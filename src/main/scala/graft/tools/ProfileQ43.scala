package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase-level profiler for the n-gram Jaccard join (dev tool). */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 8; val threshold = 0.8

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val grams = docs.select(col("doc_id"), col("text"),
        explode(expr(s"sequence(1, greatest(length(text) - ${k - 1}, 1))")).as("i"),
        col("source"))
      .select(col("doc_id"),
        xxhash64(col("source"), expr(s"substring(text, i, $k)")).as("__k"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("grams")(println("  rows=" + grams.count()))

    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val freq = grams.groupBy("__k").agg(count(lit(1)).as("f"))
    val prefix = grams.join(freq, "__k")
      .join(broadcast(sizes), "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("f"), col("__k"))))
      .filter(col("rn") <= floor(lit(1.0 - threshold) * col("sz")) + 1)
      .select("doc_id", "__k")
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

    val inter = broadcast(cand)
      .join(grams.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(grams.as("gb"),
        col("doc_b") === col("gb.doc_id") && col("ga.__k") === col("gb.__k"))
      .groupBy(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
    time("inter+verify")(println("  rows=" + inter.count()))
    spark.stop()
  }
}
