package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiler for the n-gram Jaccard join — mirrors the CURRENT
  * Dedup.ngramJaccard implementation (dev tool). */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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

    val oneMinusT = java.lang.Double.toString(1.0 - threshold)
    val prefix = gsets.select(col("doc_id"), size(col("gset")).cast("long").as("sz"),
      posexplode(expr(
        s"slice(gset, 1, CAST(FLOOR($oneMinusT * size(gset)) AS INT) + 1)"))
        .as(Seq("__p", "__k")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix")(println("  rows=" + prefix.count()))

    val sa = col("a.sz").cast("double")
    val sb = col("b.sz").cast("double")
    val ubound = (least(col("a.__p"), col("b.__p")) + 1 +
      least(col("a.sz") - col("a.__p") - 1, col("b.sz") - col("b.__p") - 1)).cast("double")
    val minOverlap = lit(threshold) / lit(1.0 + threshold) * (sa + sb) - lit(1e-9)
    val rawMatches = prefix.as("a").join(prefix.as("b"),
      col("a.__k") === col("b.__k") && col("a.doc_id") < col("b.doc_id"))
    time("raw prefix matches")(println("  rows=" + rawMatches.count()))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__k") === col("b.__k") && col("a.doc_id") < col("b.doc_id") &&
          sa >= lit(threshold) * sb && sb >= lit(threshold) * sa &&
          ubound >= minOverlap)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cand (filtered+distinct)")(println("  rows=" + cand.count()))

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
