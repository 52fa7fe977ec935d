package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the graph-ANN family (dev tool): NN-Descent build,
  * RobustPrune diversification, beam search, and the JL two-stage
  * searcher on a synthetic clustered corpus of N vectors. Prints build /
  * prune / search walls and search recall vs exact brute force over a
  * fixed query set — the shapes that must hold at 100 TB: build cost
  * bounded by n·k² per round, search cost by |Q|·beam·degree per round,
  * JL stage-1 bytes by dims/d. */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val dim = 64
    val nClusters = 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic clustered corpus: cluster centers on coordinate
    // pairs, per-vector jitter from a hash — the manifold regime the
    // graph family is built for
    val emb = spark.range(0, n.toLong).select(col("id").as("vec_id"))
      .select(col("vec_id"), (pmod(col("vec_id"), lit(nClusters.toLong)))
        .as("__c"))
      .select(col("vec_id"), expr(
        // jitter sign structure must be CLUSTER-correlated (like real
        // encoder embeddings, where similar texts share coordinate
        // sign patterns): sign-random per-vector noise is axis-sign
        // LSH's adversarial case (mates collide with prob 2^-bits per
        // table), and all-positive coordinates are its degenerate case
        // (one bucket per table) — see the graphSearch centering note
        s"""transform(sequence(0, ${dim - 1}), i -> CAST(
           |  CASE WHEN i = CAST(__c % $dim AS INT) THEN 1.0
           |       WHEN i = CAST((__c div $dim) % $dim AS INT) THEN 0.8
           |       ELSE 0.05 * (pmod(hash(__c, i), 7) - 3)
           |            + 0.005 * (pmod(hash(vec_id, i), 5) - 2) END AS FLOAT))
           |""".stripMargin.replaceAll("\n", " ")).as("embedding"))
      .persist()
    println(s"vectors=${emb.count()}")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val queries = emb.filter(col("vec_id") < 100).persist()
    queries.count()
    val rounds = if (args.length > 1) args(1).toInt else 2
    val g = time(s"knnGraph_k10_r$rounds") {
      val x = graft.pipeline.Similarity.knnGraph(emb, 10, rounds = rounds)
      x.count(); x
    }
    val dg = time("diversify_r6") {
      val x = graft.pipeline.Similarity.diversifyGraph(emb, g, r = 6)
        .localCheckpoint(true)
      x.count(); x
    }
    val approx = time("graphSearch_100q") {
      val x = graft.pipeline.Similarity.graphSearch(emb, queries, 3, dg,
        rounds = 2, beam = 8).localCheckpoint(true)
      x.count(); x
    }
    val jl = time("jlSearch_100q") {
      val x = graft.pipeline.Similarity.jlSearchTopK(emb, queries, 3,
        dims = 32, shortlist = 100).localCheckpoint(true)
      x.count(); x
    }
    val exact = time("bruteForce_100q") {
      val x = graft.pipeline.Similarity.bruteForceTopK(emb, queries, 3)
        .localCheckpoint(true)
      x.count(); x
    }
    def recall(a: org.apache.spark.sql.DataFrame): Double =
      exact.select(col("query_id"), col("neighbor_id"))
        .join(a.select(col("query_id"), col("neighbor_id"), lit(1L).as("__h")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("__h"), lit(0L))).cast("double") /
          count(lit(1)).cast("double"))
        .collect()(0).getDouble(0)
    println(f"[stress] graphSearch recall=${recall(approx)}%.3f")
    println(f"[stress] jlSearch recall=${recall(jl)}%.3f")
    // diagnostics: graph EDGE quality for the query nodes (is the
    // graph converged?) and search over the raw (unpruned) graph
    println(f"[stress] graphEdges recall=${
      recall(g.filter(col("query_id") < 100))}%.3f")
    val rawSearch = graft.pipeline.Similarity.graphSearch(emb, queries, 3, g,
      rounds = 2, beam = 8)
    println(f"[stress] rawGraphSearch recall=${recall(rawSearch)}%.3f")
    spark.stop()
  }
}
