package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an Array[Float] column.
  *
  * Dot products are a codegen'd native expression (graft.functions.VecDot)
  * — per-row array math, no explode, no UDF. Elements are cast to double
  * BEFORE multiplying and folded left-to-right, which both engines can
  * reproduce exactly (DuckDB: SUM(x ORDER BY i)).
  *
  * Scale paths:
  *  - brute-force top-k broadcasts the (small) query set against the corpus
  *    — embarrassingly parallel, the 100 TB side is never shuffled;
  *  - LSH buckets (deterministic axis-sign hyperplanes) turn near-dup /
  *    ANN into bounded equi-join buckets.
  */
object Similarity {

  /** Left-to-right dot product of two float vectors, in double —
    * codegen'd native expression (see graft.functions.VecDot). */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.vec_dot(a, b)

  /** Euclidean norm (left-to-right sum of squares). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Corpus with a precomputed norm column. */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", norm(col("embedding")))

  /** Deterministic (cosine desc, neighbor asc) top-k per query via the
    * bounded heap aggregate — map-side partial top-k, so the shuffle
    * carries at most k rows per (query, map partition) instead of the
    * whole scored relation (the row_number window would move
    * |corpus| rows per query to a single reducer). Row-identical to the
    * window formulation. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(col("cosine"), col("neighbor_id"), k)
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__r", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        col("__s.score").as("cosine"), (col("__r") + 1).cast("int").as("rank"))

  /** Near-duplicate pairs within the same label, cosine >= threshold.
    * The label is the blocking key; on unlabeled corpora use lshBucket as
    * the blocking key instead. */
  def nearDup(emb: DataFrame, threshold: Double): DataFrame = {
    val n = withNorm(emb)
    val a = n.as("a")
    val b = n.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding"), col("a.nrm"), col("b.nrm"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Brute-force cosine top-k: broadcast the query set against the corpus;
    * rank by (cosine desc, vec_id asc) for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus).as("c")
    val q = withNorm(queries).as("q")
    val scored = c.join(broadcast(q), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding"), col("q.nrm"), col("c.nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** Deterministic sign-LSH bucket: bit j set when element 8j+1 > 0
    * (axis-aligned hyperplanes — reproducible in any engine; seeded random
    * hyperplanes drop in the same way at scale). */
  def lshBucket(v: Column, bits: Int = 8): Column =
    (0 until bits).map(j =>
      when(element_at(v, j * 8 + 1) > 0.0f, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** IVF ANN: the corpus is assigned to its nearest coarse-quantizer cell;
    * each query probes its `nprobe` nearest cells (nprobe=1 is the fastest/
    * least-recall point; raising it trades candidate volume for recall —
    * the standard IVF knob). Centroids are pluggable (here: the first
    * nCells vectors, deterministic). */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int = 8,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCells)
    val cent = withNorm(corpus.filter(col("vec_id") < nCells))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        col("nrm").as("cnrm"))

    // nearest `cells` centroids per vector via the bounded heap aggregate
    // (no window shuffle of the |corpus| x nCells scored relation)
    def assign(df: DataFrame, cells: Int): DataFrame = {
      val n = withNorm(df).as("v")
      n.join(broadcast(cent))
        .select(col("v.vec_id").as("vec_id"), col("v.embedding").as("embedding"),
          col("v.nrm").as("nrm"), col("cent_id"),
          cosine(col("v.embedding"), col("cvec"), col("v.nrm"), col("cnrm")).as("ccos"))
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(graft.functions.TopKByScore.top_k(col("ccos"), col("cent_id"), cells)
          .as("__top"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          explode(col("__top")).as("__s"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("__s.id").as("cell"))
    }

    val c = assign(corpus, 1).as("c")
    val q = assign(queries, nprobe).as("q")
    val scored = c.join(broadcast(q),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding"), col("q.nrm"), col("c.nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** LSH-bucketed ANN: candidates restricted to the query's bucket, then
    * exact cosine top-k within it. */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus).withColumn("bucket", lshBucket(col("embedding"))).as("c")
    val q = withNorm(queries).withColumn("bucket", lshBucket(col("embedding"))).as("q")
    val scored = c.join(broadcast(q),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding"), col("q.nrm"), col("c.nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }
}
