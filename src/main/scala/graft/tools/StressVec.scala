package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the embedding-similarity family (dev tool; pass the
  * parquet path — e.g. a replicated embeddings table). Checks the shapes
  * that must hold at 100 TB: near-dup pair volume bounded by the
  * (label, table, bucket) blocking, ANN candidate volume bounded by
  * buckets/cells, and near-linear runtime growth in corpus size. */
object StressVec {
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_ == "nopairs")
    val path = if (paths.nonEmpty) paths(0) else "/tmp/sfbig_embeddings.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(path).persist()
    println(s"vectors=${emb.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    val q = emb.filter(col("vec_id") < 10)
    // ANN timings first: they are the sublinearity evidence. The pair join
    // runs last and can be skipped ("nopairs" arg) — on heavily-replicated
    // stress corpora its OUTPUT is quadratic in the replication factor
    // (every replica pair IS a near-dup), which measures duplicate density,
    // not algorithmic scaling.
    time("ann_lsh")(graft.pipeline.Similarity.annLsh(emb, q, 5).count())
    time("ann_ivf_128c")(
      graft.pipeline.Similarity.annIvf(emb, q, 5, nCells = 128, nprobe = 4).count())
    val nCellsSqrt = math.max(16, math.sqrt(emb.count().toDouble).toInt)
    time(s"ann_ivf_sqrtN_${nCellsSqrt}c")(
      graft.pipeline.Similarity.annIvf(emb, q, 5, nCells = nCellsSqrt, nprobe = 4).count())
    // two-level pruned build at the same sqrt(N) cell count: corpus-side
    // assignment mults drop from N*nCells to ~N*3*sqrt(nCells) — the
    // sub-N^1.5 build path; agreement with exact assignment printed below
    time(s"ann_ivf_sqrtN_${nCellsSqrt}c_pruned")(
      graft.pipeline.Similarity.annIvf(emb, q, 5, nCells = nCellsSqrt, nprobe = 4,
        superProbe = Some(2)).count())
    val exactAssign = graft.pipeline.Similarity.cluster(emb, nCellsSqrt)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- Seq(2, 3, 4)) {
      val prunedAssign = graft.pipeline.Similarity.cluster(emb, nCellsSqrt,
          superProbe = Some(w))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agree = exactAssign.count { case (v, c) => prunedAssign.get(v).contains(c) }
      println(f"[pruned] assignment agreement at $nCellsSqrt cells, superProbe=$w: " +
        f"$agree/${exactAssign.size} = ${agree.toDouble / exactAssign.size}%.3f")
    }
    time("ann_bruteforce")(graft.pipeline.Similarity.bruteForceTopK(emb, q, 5).count())
    // PQ family (r10): encode is the broadcast-codebook map pass — must
    // scale linearly; ADC search reads the CODES relation (m rows per
    // vector), shortlists per query, reranks |Q|*100 raw vectors
    time("pq_encode_m8k64")(
      graft.pipeline.Similarity.pqEncode(emb, m = 8, k = 64).count())
    time("pq_search_m8k64_r100")(graft.pipeline.Similarity.pqSearch(
      emb, q, 5, m = 8, codes = 64, rerank = 100).count())
    time("pq_error_m8k64")(
      graft.pipeline.Similarity.pqError(emb, m = 8, k = 64).count())
    time("hard_negatives")(graft.pipeline.Similarity.hardNegatives(emb, q, 5).count())
    time("hard_negatives_ivf")(graft.pipeline.Similarity.hardNegativesIvf(
      emb, q, 5, nCells = nCellsSqrt, nprobe = 4).count())
    // map-only: must scale linearly with zero exchanges at any size
    time("quantize_int8")(graft.pipeline.Similarity.quantizeInt8(emb).count())
    // PCA family (r10 third session): the covariance pass is the whole
    // corpus cost (in-row pair generation, never shuffled); the eigen
    // math is d×d driver-bounded; projections are map-only literals
    time("embed_covariance")(
      graft.pipeline.Similarity.embedCovariance(emb).count())
    time("pca_power_12it")(
      graft.pipeline.Similarity.pcaPower(emb, iters = 12).count())
    time("pca_project")(
      graft.pipeline.Similarity.pcaProject(emb, iters = 12).count())
    time("remove_top_component")(
      graft.pipeline.Similarity.removeTopComponent(emb, iters = 12).count())
    // SemDeDup at the paper's design point — nCells scaled to hold mean
    // cell size ~500 constant, so the within-cell pairwise work per
    // vector stays flat as the corpus grows (the output on a replicated
    // corpus measures duplicate density, like the pair join above)
    val semCells = math.max(16, (emb.count() / 500L).toInt)
    time(s"semdedup_${semCells}c")(
      graft.pipeline.Similarity.semDedup(emb, semCells, 0.35).count())
    // with constant cell size the exact assignment term is N*nCells =
    // N^2/500 — the pruned two-level path is the at-scale build knob
    time(s"semdedup_${semCells}c_pruned")(
      graft.pipeline.Similarity.semDedup(emb, semCells, 0.35,
        superProbe = Some(2)).count())
    if (flags.isEmpty)
      time("neardup_bucketed")(graft.pipeline.Similarity.nearDup(emb, 0.35).count())
    // IVF recall sweep vs brute-force top-3 at the GATED config's corpus
    // (sf0.01): nprobe is the standard IVF recall/candidate-volume knob —
    // print the curve so config choices are measured, not guessed.
    val recallPath =
      if (paths.length > 1) paths(1) else "/root/testdata/sf0.01/embeddings.parquet"
    if (!new java.io.File(recallPath).exists()) {
      println(s"[recall] skipped: $recallPath absent")
      graft.pipeline.Dedup.clearCache()
      spark.stop()
      return
    }
    val sfEmb = spark.read.parquet(recallPath).persist()
    val sfQ = sfEmb.filter(col("vec_id") < 10)
    val truth = graft.pipeline.Similarity.bruteForceTopK(sfEmb, sfQ, 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (np <- Seq(2, 4, 8, 16)) {
      val got = graft.pipeline.Similarity.annIvf(sfEmb, sfQ, 3,
          nCells = 64, nprobe = np)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] ivf nCells=64 nprobe=$np: " +
        f"${(got & truth).size}/${truth.size} = ${(got & truth).size.toDouble / truth.size}%.2f")
      val gotP = graft.pipeline.Similarity.annIvf(sfEmb, sfQ, 3,
          nCells = 64, nprobe = np, superProbe = Some(3))
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] ivf nCells=64 nprobe=$np pruned(superProbe=3): " +
        f"${(gotP & truth).size}/${truth.size} = ${(gotP & truth).size.toDouble / truth.size}%.2f")
    }
    graft.pipeline.Dedup.clearCache()
    spark.stop()
  }
}
