package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the ≥200k-vector recall gates (q340–q344): runs each
  * planned contract on the deterministic clustered corpus, printing the
  * MEASURED recall (not just the verdict) and per-stage walls, so the
  * gated floors are pinned below measured values with known margin.
  * args: [n] [threads] */
object ProbeScaleGates {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val threads = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val cs = 5 // cluster size; k = 4 mates
    val k = 4
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.util.RelCache.persist(
      graft.pipeline.Contracts.clusteredCorpus(spark, n, dim, cs))
    time("materialize corpus")(emb.count())
    val mate = expr(s"query_id div $cs = neighbor_id div $cs")
    def recallOf(df: org.apache.spark.sql.DataFrame, expected: Long): Double =
      df.filter(col("rank") <= k)
        .agg(sum(when(mate && col("query_id") =!= col("neighbor_id"), 1L)
          .otherwise(0L)).cast("double") / lit(expected.toDouble))
        .collect()(0).getDouble(0)
    // graph edge recall (self never in graph edges: query != neighbor)
    val g = time("knnGraph auto") {
      val x = graft.pipeline.Similarity.knnGraph(emb, k)
      x.count(); x
    }
    println(f"[probe] graph edge recall = ${recallOf(g, n * k)}%.4f")
    val queries = emb.filter(pmod(col("vec_id"), lit(1000L)) === 0L)
    val nq = queries.count()
    println(s"[probe] queries = $nq")
    val gs = time("graphSearch") {
      val x = graft.pipeline.Similarity.graphSearch(emb, queries, k, g,
        rounds = 2, beam = 8).localCheckpoint(true)
      x.count(); x
    }
    println(f"[probe] graphSearch recall = ${recallOf(gs, nq * k)}%.4f")
    val lsh = time("annLsh") {
      val x = graft.pipeline.Similarity.annLsh(emb, queries, k)
        .localCheckpoint(true)
      x.count(); x
    }
    println(f"[probe] annLsh recall = ${recallOf(lsh, nq * k)}%.4f")
    val ivf = time("annIvf") {
      val x = graft.pipeline.Similarity.annIvf(emb, queries, k,
        nCells = 64, nprobe = 4).localCheckpoint(true)
      x.count(); x
    }
    println(f"[probe] annIvf recall = ${recallOf(ivf, nq * k)}%.4f")
    val jl = time("jlSearch") {
      val x = graft.pipeline.Similarity.jlSearchTopK(emb, queries, k,
        dims = 16, shortlist = 64).localCheckpoint(true)
      x.count(); x
    }
    println(f"[probe] jlSearch recall = ${recallOf(jl, nq * k)}%.4f")
    val ivfpq = time("ivfPqSearch") {
      val x = graft.pipeline.Similarity.ivfPqSearch(emb, queries, k,
        nCells = 64, nprobe = 4, m = 4, codes = 16, rerank = 16)
        .localCheckpoint(true)
      x.count(); x
    }
    println(f"[probe] ivfPqSearch recall = ${recallOf(ivfpq, nq * k)}%.4f")
    for (d <- Seq(8, 16, 32)) {
      val trunc = emb.select(col("vec_id"),
        expr(s"slice(embedding, 1, $d)").as("embedding"))
      val tq = queries.select(col("vec_id"),
        expr(s"slice(embedding, 1, $d)").as("embedding"))
      val r = time(s"matryoshka_d$d") {
        val x = graft.pipeline.Similarity.bruteForceTopK(
          graft.util.RelCache.persist(trunc), tq, k).localCheckpoint(true)
        x.count(); x
      }
      println(f"[probe] matryoshka d=$d recall = ${recallOf(r, nq * k)}%.4f")
    }
    spark.stop()
  }
}
