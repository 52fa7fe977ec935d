package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the LSH blocking cost Σ min(s,c)·(min(s,c)−1)/2 of a documents
  * corpus for each candidate bucketCap — sizing evidence for the auto
  * skew-guard budget (dev tool). */
object ProbeCapCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val caps = Seq(16, 64, 256, 1024)
    for (p <- args) {
      val docs = spark.read.parquet(p)
      val sig = graft.pipeline.Dedup.minhashSignature(docs, 5, 64)
      val bandStructs = (0 until 16).map { b =>
        struct(lit(b).as("band") +:
          (0 until 4).map(r => col(s"h${b * 4 + r + 1}").as(s"s${r + 1}")): _*)
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"),
          col("bs.s1"), col("bs.s2"), col("bs.s3"), col("bs.s4"))
      val sizes = banded.groupBy("band", "s1", "s2", "s3", "s4")
        .agg(count(lit(1)).as("__s"))
      val aggs = sum(expr("__s * (__s - 1) div 2").cast("decimal(38,0)")).as("c_all") +:
        caps.map(c => sum(expr(
          s"least(__s, $c) * (least(__s, $c) - 1) div 2").cast("decimal(38,0)"))
          .as(s"c_$c"))
      println(s"CAPCOST $p -> ${sizes.agg(aggs.head, aggs.tail: _*).collect()(0)}")
    }
    spark.stop()
  }
}
