package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the 200k embedding-dedup gates (q357/q358): measures
  * the ACTUAL keep/drop split and pair recall on the deterministic
  * clustered corpus — not just the gated verdict — plus per-stage
  * walls, so the floors are pinned below measured values with known
  * margin. args: [n] [threads] */
object ProbeDedupScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val threads = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cs = 5
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.util.RelCache.persist(
      graft.pipeline.Contracts.clusteredCorpus(spark, n, 64, cs))
    time("materialize corpus")(emb.count())

    // q357 semDedup: full per-cluster keeper distribution
    val sp2 = if (args.length > 3) Some(args(3).toInt) else None
    val nc = if (args.length > 2) args(2).toInt else 512
    println(s"[probe] semDedup nCells=$nc superProbe=$sp2")
    val verdicts = graft.pipeline.Similarity.semDedup(
      emb, nCells = nc, threshold = 0.8, superProbe = sp2)
    val perCluster = time("semDedup verdicts") {
      verdicts.groupBy(expr(s"vec_id div $cs").as("cl"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("k"),
          min(col("vec_id")).as("mn"),
          min(when(col("keep"), col("vec_id"))).as("kmn"))
        .groupBy(col("k"), (col("kmn") === col("mn")).as("min_kept"))
        .agg(count(lit(1)).as("clusters"))
        .orderBy(col("k"), col("min_kept"))
        .collect()
    }
    perCluster.foreach(r => println(s"[probe] semDedup keepers=${r.get(0)} " +
      s"min_kept=${r.get(1)} clusters=${r.getLong(2)}"))
    val gate1 = time("semDedupScaleContract") {
      graft.pipeline.Contracts.semDedupScaleContract(
        verdicts, cs, n, 0.95).collect()(0)
    }
    println(s"[probe] q357 gate: $gate1")

    // q358 nearDup: measured pair recall + candidate volume
    val pairs = graft.pipeline.Similarity.nearDup(
      emb.withColumn("label", lit(0)),
      threshold = 0.8, tables = 4, bits = 16, probe = false)
    val stats = time("nearDup pairs") {
      pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(expr(s"vec_a div $cs = vec_b div $cs"), 1L).otherwise(0L))
          .as("mate_pairs")).collect()(0)
    }
    val expected = (n / cs) * (cs.toLong * (cs - 1) / 2)
    println(s"[probe] nearDup pairs=${stats.getLong(0)} " +
      s"mate=${stats.getLong(1)} expected=$expected " +
      f"recall=${stats.getLong(1).toDouble / expected}%.4f")
    val gate2 = time("nearDupPairRecallContract") {
      graft.pipeline.Contracts.nearDupPairRecallContract(
        pairs, cs, n, 0.99).collect()(0)
    }
    println(s"[probe] q358 gate: $gate2")
    spark.stop()
  }
}
