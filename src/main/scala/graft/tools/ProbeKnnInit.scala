package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attributes the knnGraph 200k cold-build wall phase by phase (dev
  * tool): replicates knnGraphBuild's init/round relations with
  * setJobDescription labels so ProfileStages-style listener output maps
  * stages to phases, and prints each phase's explain tail (join
  * strategies) plus wall. */
object ProbeKnnInit {
  def main(args: Array[String]): Unit = {
    val n0 = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def phase[T](name: String)(f: => T): T = {
      sc.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      sc.setJobDescription(null)
      r
    }
    val S = graft.pipeline.Similarity
    val emb = graft.pipeline.Contracts.clusteredCorpus(spark, n0, 64, 5)
    val k = 4; val tables = 8; val bits = 8; val c = 4
    val n = phase("cache-n") {
      val d = graft.util.RelCache.persist(S.withNorm(emb)
        .select(col("vec_id"), col("embedding"), col("nrm")))
      d
    }
    val bk = n.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            S.lshTableBucket(col("embedding"), t, bits).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tbl"), col("bucket")).orderBy(col("vec_id"))
    val withRn = phase("cache-ranked") {
      val d = graft.util.RelCache.persist(bk.withColumn("__rn", row_number().over(rn)))
      d
    }
    // BEFORE (r14) init-edge shape: rank-offset self-join on the ranked
    // bucket relation — builds + broadcasts a corpus·tables hash relation
    val fwdJoin = withRn
      .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"),
        explode(expr(s"sequence(__rn + 1, __rn + $c)")).as("__trn"))
      .join(withRn.select(col("vec_id").as("neighbor_id"), col("tbl"),
        col("bucket"), col("__rn").as("__trn")), Seq("tbl", "bucket", "__trn"))
      .select(col("query_id"), col("neighbor_id"))
    // AFTER (r15) shape: lead() over the same window — no join
    val fwd = withRn
      .select(col("vec_id").as("query_id"),
        array((1 to c).map(j => lead(col("vec_id"), j).over(rn)): _*).as("__nx"))
      .select(col("query_id"), explode(col("__nx")).as("neighbor_id"))
      .filter(col("neighbor_id").isNotNull)
    println("===== BEFORE fwd (rank-offset self-join) physical plan =====")
    println(fwdJoin.queryExecution.executedPlan.toString.take(4000))
    println("===== AFTER fwd (lead window) physical plan =====")
    println(fwd.queryExecution.executedPlan.toString.take(4000))
    println("===== fwd row parity check =====")
    println("before-only rows: " + fwdJoin.exceptAll(fwd).count() +
      ", after-only rows: " + fwd.exceptAll(fwdJoin).count())
    val initCand = fwd.union(
        fwd.select(col("neighbor_id").as("query_id"),
          col("query_id").as("neighbor_id")))
      .distinct()
    def score(cand: org.apache.spark.sql.DataFrame) = cand
      .join(n.select(col("vec_id").as("query_id"), col("embedding").as("__ea"),
        col("nrm").as("__na")), "query_id")
      .join(n.select(col("vec_id").as("neighbor_id"), col("embedding").as("__eb"),
        col("nrm").as("__nb")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        S.cosine(col("__ea"), col("__eb"), col("__na"), col("__nb")).as("cosine"))
    val scored = score(initCand)
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(col("cosine"), col("neighbor_id"), k)
        .as("__top"))
    println("===== init scored plan (tail) =====")
    println(scored.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("InMemory") || l.contains("Aggregate"))
      .mkString("\n"))
    val g0 = phase("init-score-rank-ckpt") {
      val d = scored
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__r", "__s")))
        .select(col("query_id"), col("__s.id").as("neighbor_id"),
          col("__s.score").as("cosine"), (col("__r") + 1).cast("int").as("rank"))
        .localCheckpoint(true)
      d
    }
    phase("round1") {
      val g = g0.select(col("query_id"), col("neighbor_id"))
      val rev = scoredTop(spark, g0.select(col("neighbor_id").as("query_id"),
        col("query_id").as("neighbor_id"), col("cosine")), k)
        .select(col("query_id"), col("neighbor_id"))
      val und = g.union(rev)
      val non = und.as("x").join(und.as("y"),
          col("x.neighbor_id") === col("y.query_id") &&
            col("x.query_id") =!= col("y.neighbor_id"))
        .select(col("x.query_id").as("query_id"),
          col("y.neighbor_id").as("neighbor_id"))
      val cand = g.union(non).distinct()
      scoredTop(spark, score(cand), k).localCheckpoint(true)
    }
    spark.stop()
  }
  private def scoredTop(spark: SparkSession,
      scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(col("cosine"), col("neighbor_id"), k)
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__r", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        col("__s.score").as("cosine"), (col("__r") + 1).cast("int").as("rank"))
}
