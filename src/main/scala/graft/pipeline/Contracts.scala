package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-bound CONTRACT gates for the approximate 100 TB paths.
  *
  * The sketch operators (GK quantiles, SpaceSaving heavy hitters,
  * percentile_approx thresholds) are oracle-gated elsewhere only in
  * their provably-exact regimes (q94/q140/q142/q152), because their
  * outputs at genuinely approximate settings are partitioning-dependent
  * by construction — no value-hash gate is possible. What IS
  * deterministic at approximate settings is the published error
  * CONTRACT: every emitted estimate must bracket the truth within the
  * advertised bound, a theorem of the algorithm independent of merge
  * order. Each operator here runs its sketch at a genuinely approximate
  * setting, re-derives the exact truth with a second (gate-scale)
  * relational pass, and emits the contract VERDICT rows; the DuckDB
  * oracle emits the same rows with TRUE verdicts, so any contract
  * violation on real data hash-mismatches the gate. This converts the
  * 100 TB knobs' error bounds from spec-time claims into per-run,
  * on-real-data regression gates (the q139 gating pattern applied to
  * error bounds).
  *
  * Scale shape: each contract pass is one conditional aggregate or one
  * small-relation join over the same keys the sketch already grouped
  * by — QA cost proportional to one extra scan, run on samples or gate
  * slices in production, never required for the sketch itself.
  */
object Contracts {

  /** Rank interval [below+1, leq] (1-based positions of the returned
    * value among the sorted data, or the gap position when the value is
    * absent) intersects the contract interval
    * [floor((p-e)·n), ceil((p+e)·n)]. Exposed package-private so the
    * spec can prove the verdict actually FAILS on out-of-bound ranks —
    * a gate that cannot go false gates nothing. */
  private[graft] def rankBoundVerdict(below: Column, leq: Column, p: Column,
      e: Double, n: Column): Column =
    ((below + lit(1L)).cast("double") <= ceil((p + lit(e)) * n.cast("double")).cast("double")) &&
      (leq.cast("double") >= floor((p - lit(e)) * n.cast("double")).cast("double"))

  private def rankOk(below: Column, leq: Column, p: Double, e: Double,
      n: Column): Column = rankBoundVerdict(below, leq, lit(p), e, n)

  /** Greenwald-Khanna sketch rank contract (the q140 knob at a REAL
    * relative error): approxQuantile at `relErr` must return, for every
    * probability p = j/nBins, a value whose exact rank lies within
    * ±relErr·n of p·n (Spark's published guarantee: floor((p-relErr)·n)
    * <= rank <= ceil((p+relErr)·n)). The exact ranks come from ONE
    * conditional-aggregate pass (2·(nBins+1) sums + the count — no sort,
    * no per-edge jobs). Emits (j, p, within_bound) for every edge. */
  def gkRankContract(df: DataFrame, x: Column, nBins: Int,
      relErr: Double): DataFrame = {
    require(nBins > 0 && relErr > 0.0, "use the exact gate (q59/q140) at relErr = 0")
    val vals = df.select(x.cast("double").as("v")).filter(col("v").isNotNull)
    val probs = (0 to nBins).map(_.toDouble / nBins).toArray
    val edges = vals.stat.approxQuantile("v", probs, relErr)
    // zero non-null rows: approxQuantile returns NO edges — degrade to an
    // empty verdict frame (same schema) instead of referencing absent cols
    if (edges.isEmpty)
      return vals.limit(0).select(lit(0).as("j"), lit(0.0).as("p"),
        lit(true).as("within_bound"))
    val aggCols = edges.zipWithIndex.flatMap { case (ev, j) =>
      Seq(sum(when(col("v") < ev, 1L).otherwise(0L)).as(s"__b$j"),
        sum(when(col("v") <= ev, 1L).otherwise(0L)).as(s"__l$j"))
    } :+ count(lit(1)).as("__n")
    val one = vals.agg(aggCols.head, aggCols.tail: _*)
    val rows = probs.indices.map { j =>
      struct(lit(j).as("j"), lit(probs(j)).as("p"),
        rankOk(col(s"__b$j"), col(s"__l$j"), probs(j), relErr, col("__n"))
          .as("within_bound"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.j").as("j"), col("__r.p").as("p"),
        col("__r.within_bound").as("within_bound"))
  }

  /** SpaceSaving contract (the q94 knob at a REAL capacity, i.e.
    * capacity << per-source vocabulary): per source, every summary entry
    * must bracket its exact term frequency (cnt - err <= tf <= cnt) and
    * every term with tf·capacity > N must be PRESENT in the summary —
    * the two Metwally guarantees, preserved across mergeable-summary
    * combines (Agarwal et al.). Emits one verdict row per source with
    * the exact total token count alongside (so the gate also pins that
    * the data actually flowed). */
  def spaceSavingContract(docs: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0)
    // the SAME term relation the q94 operator aggregates — sharing the
    // tokenizer is what keeps the contract certifying the real operator
    val terms = TextAnalysis.sourceTerms(docs)
    val summ = terms.groupBy(col("source"))
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("term"), capacity).as("__hh"),
        count(lit(1)).as("n_terms"))
    val entries = summ.select(col("source"), col("n_terms"),
        explode(col("__hh")).as("__e"))
      .select(col("source"), col("n_terms"), col("__e.term").as("term"),
        col("__e.cnt").as("cnt"), col("__e.err").as("err"))
    val tf = terms.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // every summary term was offered at least once, so the join always hits
    val bounds = entries.join(tf, Seq("source", "term"))
      .withColumn("__ok",
        col("cnt") - col("err") <= col("tf") && col("tf") <= col("cnt"))
      .groupBy(col("source"))
      .agg((sum(when(col("__ok"), 0L).otherwise(1L)) === 0L).as("all_within_bounds"))
    val heavyMissing = tf
      .join(summ.select(col("source"), col("n_terms")), Seq("source"))
      .filter(col("tf") * lit(capacity.toLong) > col("n_terms"))
      .join(entries.select(col("source"), col("term"), lit(1L).as("__present")),
        Seq("source", "term"), "left")
      .groupBy(col("source"))
      .agg((sum(when(col("__present").isNull, 1L).otherwise(0L)) === 0L)
        .as("all_heavy_present"))
    summ.select(col("source"), col("n_terms"))
      .join(bounds, Seq("source"))
      // a source could in principle have no term above N/capacity; its
      // completeness verdict is vacuously true
      .join(heavyMissing, Seq("source"), "left")
      .select(col("source"), col("n_terms"), col("all_within_bounds"),
        coalesce(col("all_heavy_present"), lit(true)).as("all_heavy_present"))
  }

  /** COUNT-MIN SKETCH point-query contract — the third sketch family
    * beside SpaceSaving (top-k) and GK (quantiles): CMS answers "how
    * often did THIS key occur?" in width·depth counters regardless of
    * key cardinality, with the two Cormode–Muthukrishnan guarantees —
    * est ≥ true ALWAYS (a key's own count is inside every one of its
    * buckets: deterministic, not probabilistic), and
    * P(est − true > εN) ≤ e^−depth at ε = e/width per key. The
    * contract materializes the sketch DECLARATIVELY — depth hashed
    * groupBys over the already-collapsed term-frequency relation, each
    * bucket table width-sized and BROADCAST back (zero extra corpus
    * shuffles; est = least over depth sums) — and emits one row:
    * exact key/token counts, the never-underestimate verdict, and the
    * exact number of keys overshooting the 2N/width bound, compared as
    * the all-integer inequality (est−true)·width > 2N (no float
    * knife-edge). Because the hashes are md5-deterministic, the oracle
    * REBUILDS the identical sketch and re-derives every verdict —
    * unlike the TRUE-literal contracts, this gate re-proves the CMS
    * arithmetic end to end. */
  def cmsContract(docs: DataFrame, width: Int = 256,
      depth: Int = 4): DataFrame = {
    require(width > 0 && depth > 0)
    // pinned: the term-frequency relation is re-read by depth+2 subtrees
    // (the joined base, each depth's bucket table, the total) — without
    // the pin each one re-ran the token explode + vocab exchange
    val tf = graft.util.RelCache.persist(TextAnalysis.sourceTerms(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("tf")))
    def h(j: Int): Column =
      conv(substring(md5(concat(lit(s"$j:"), col("term"))), 1, 8), 16, 10)
        .cast("long") % lit(width.toLong)
    var joined = tf
    for (j <- 0 until depth) {
      val buckets = tf.groupBy(h(j).as("__b"))
        .agg(sum(col("tf")).as(s"__s$j"))
      joined = joined.withColumn("__b", h(j))
        .join(broadcast(buckets), Seq("__b")).drop("__b")
    }
    val est = if (depth == 1) col("__s0")
      else least((0 until depth).map(j => col(s"__s$j")): _*)
    val total = tf.agg(coalesce(sum(col("tf")), lit(0L)).as("__n"))
    joined.select(col("tf"), est.as("__est"))
      .crossJoin(broadcast(total))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("tf")), lit(0L)).as("n_tokens"),
        coalesce(bool_and(col("__est") >= col("tf")), lit(true))
          .as("never_under"),
        coalesce(sum(when(
          (col("__est") - col("tf")) * lit(width.toLong) >
            lit(2L) * col("__n"), 1L).otherwise(0L)), lit(0L))
          .as("n_over_eps"))
  }

  /** percentile_approx threshold contract (the q142/q143 knob at a REAL
    * accuracy): per source and probability p, the GK threshold at
    * `accuracy` must have exact rank within ±n/accuracy of p·n (Spark's
    * published 1/accuracy relative rank error). The exact ranks come
    * from one source-keyed join of the corpus against the tiny
    * (source, p, threshold) relation plus one aggregate — the corpus is
    * touched once. Emits (source, p, within_bound). */
  def percentileApproxContract(docs: DataFrame, ps: Seq[Double],
      accuracy: Int, scoreCol: String = "score"): DataFrame = {
    require(ps.nonEmpty && accuracy > 0)
    val e = 1.0 / accuracy
    val s = docs.select(col("source"), col(scoreCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val thr = s.groupBy(col("source"))
      .agg(percentile_approx(col("__v"), array(ps.map(lit): _*),
        lit(accuracy)).as("__t"))
      .select(col("source"), posexplode(col("__t")).as(Seq("__i", "__thr")))
      .select(col("source"),
        element_at(array(ps.map(lit): _*), col("__i") + 1).as("p"), col("__thr"))
    s.join(thr, Seq("source"))
      .groupBy(col("source"), col("p"))
      .agg(sum(when(col("__v") < col("__thr"), 1L).otherwise(0L)).as("__b"),
        sum(when(col("__v") <= col("__thr"), 1L).otherwise(0L)).as("__l"),
        count(lit(1)).as("__n"))
      .select(col("source"), col("p"),
        rankBoundVerdict(col("__b"), col("__l"), col("p"), e, col("__n"))
          .as("within_bound"))
  }

  /** HyperLogLog++ distinct-count contract (the COUNT(DISTINCT) 100 TB
    * knob): per key, `approx_count_distinct` at `rsd` must land within
    * `bound` relative error of the exact distinct count. HLL++ registers
    * merge by element-wise max, so the estimate is a pure function of
    * the DATA — partitioning- and merge-order-independent — but it
    * cannot value-hash against another engine's HLL implementation, so
    * the gate pins the contract verdict beside the exact count (the
    * q157 convention). The approx aggregate is the scale path (fixed
    * register arrays per group, no distinct expand); the exact
    * count_distinct is the gate-scale QA pass. NULL values skip in both
    * aggregates (and in the oracle's COUNT(DISTINCT)); a key whose
    * values are all NULL yields (0, true) in both engines. */
  def hllDistinctContract(df: DataFrame, keyCol: String, value: Column,
      rsd: Double, bound: Double): DataFrame = {
    require(rsd > 0.0 && bound > 0.0, "rsd and bound must be positive")
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(approx_count_distinct(value, rsd).as("__est"),
        count_distinct(value).as("n_exact"))
      .select(col(keyCol), col("n_exact"),
        (abs(col("__est") - col("n_exact")).cast("double") <=
          lit(bound) * col("n_exact").cast("double")).as("within_bound"))
  }

  /** ANN recall contract (the q46/q52 knobs at their FIXED probe
    * budgets): micro-averaged recall of an approximate top-k against the
    * exact top-k — total hits over total expected, both exact longs, so
    * the verdict is one IEEE multiply + compare and cannot drift with
    * partitioning (a mean-of-means would sum doubles in shuffle order).
    * The candidate generators are deterministic (md5-derived hyperplanes
    * / the deterministic Lloyd quantizer), so recall is a pure function
    * of the data; the gate pins it above `bound`, converting the
    * measured recall curves (SURVEY §6d) into a regression contract.
    * Emits ONE row: (n_queries, recall_ok). */
  def annRecallContract(approx: DataFrame, exact: DataFrame,
      bound: Double): DataFrame = {
    val ap = approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    exact.select(col("query_id"), col("neighbor_id"))
      .join(ap, Seq("query_id", "neighbor_id"), "left")
      .agg(count_distinct(col("query_id")).as("n_queries"),
        sum(coalesce(col("__hit"), lit(0L))).as("__hits"),
        count(lit(1)).as("__expected"))
      .select(col("n_queries"),
        (col("__hits").cast("double") >=
          lit(bound) * col("__expected").cast("double")).as("recall_ok"))
  }

  /** Per-window GK contract (the q152 knob at a REAL accuracy): for
    * every event-time window and quantile q, the windowed
    * percentile_approx value must have exact in-window rank within
    * ±n_w/accuracy of q·n_w. The exact ranks come from one window-keyed
    * join + aggregate (each window checks only its own rows). Emits
    * (window_start, q, within_bound). */
  def windowedQuantilesContract(events: DataFrame, tsCol: String,
      value: Column, windowDuration: String, qs: Seq[Double],
      accuracy: Int): DataFrame = {
    require(qs.nonEmpty && accuracy > 0)
    val e = 1.0 / accuracy
    val wq = graft.streaming.StreamingHist.windowedQuantiles(
      events, tsCol, value, windowDuration, qs, accuracy)
    val durUs = graft.streaming.StreamingHist.fixedWindowUs(windowDuration)
    val us = unix_micros(col(tsCol))
    val ev = events.filter(col(tsCol).isNotNull)
      .select(timestamp_micros(us - pmod(us, lit(durUs))).as("window_start"),
        value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    ev.join(wq.select(col("window_start"), col("q"),
        col("quantile").as("__thr")), Seq("window_start"))
      .groupBy(col("window_start"), col("q"))
      .agg(sum(when(col("__v") < col("__thr"), 1L).otherwise(0L)).as("__b"),
        sum(when(col("__v") <= col("__thr"), 1L).otherwise(0L)).as("__l"),
        count(lit(1)).as("__n"))
      .select(col("window_start"), col("q"),
        rankBoundVerdict(col("__b"), col("__l"), col("q"), e, col("__n"))
          .as("within_bound"))
  }

  /** Deterministic CLUSTERED corpus for the ≥200k-vector scale gates —
    * the synthetic regime where ground-truth neighbors are ANALYTIC,
    * so recall contracts run at a scale where exact brute force over
    * all nodes would be quadratic and the organic test tables (≤2k
    * vectors) say nothing. Vector i belongs to cluster i div
    * clusterSize (CONTIGUOUS ids — the mate test is integer division,
    * no join); each cluster has a pseudo-random center with
    * coordinates in {±1, ±2, ±3}/3 (never 0, so the ±0.02 per-vector
    * jitter can never flip a sign — axis-sign LSH buckets mates
    * together deterministically, and the corpus is mixed-sign, i.e.
    * CENTERED, the regime the sign-LSH family requires — see the
    * graphSearch centering caveat). Within-cluster cosine ≈ 0.999;
    * cross-cluster centers are independent draws from 6^dim
    * combinations (collision odds ~3e-4 at 40k clusters, dim 64, and a
    * collision perturbs the truth of ~clusterSize nodes out of n), so
    * every vector's true top-(clusterSize−1) = its cluster mates.
    * Everything derives from Murmur3 hash(cluster, dim) / hash(id,
    * dim) — no RNG state, bit-stable across runs and partitionings. */
  def clusteredCorpus(spark: org.apache.spark.sql.SparkSession, n: Long,
      dim: Int, clusterSize: Int): DataFrame = {
    require(n > 0 && dim > 0 && clusterSize > 1,
      s"bad corpus shape: n=$n dim=$dim clusterSize=$clusterSize")
    spark.range(0, n).select(col("id").as("vec_id"))
      .withColumn("__c", expr(s"vec_id div $clusterSize"))
      .select(col("vec_id"), expr(
        s"""transform(sequence(1, $dim), i -> CAST(
           |  (CASE WHEN pmod(hash(__c, i), 6) < 3
           |        THEN pmod(hash(__c, i), 6) - 3
           |        ELSE pmod(hash(__c, i), 6) - 2 END) / 3.0D
           |  + 0.01D * (pmod(hash(vec_id, i), 5) - 2) AS FLOAT))
           |""".stripMargin.replaceAll("\n", " ")).as("embedding"))
  }

  /** Edge-recall contract of a k-NN GRAPH over [[clusteredCorpus]]:
    * the fraction of the n·k true mate edges the graph found (a node's
    * true top-k are its cluster mates whenever k < clusterSize — the
    * analytic ground truth; missing edges count against recall, so an
    * under-built graph fails). Emits ONE row (n_nodes, recall_ok) —
    * the oracle is the constant TRUE verdict, so a recall regression
    * hash-mismatches the gate (q315 discipline at 100× its scale). */
  def graphEdgeRecallContract(graph: DataFrame, clusterSize: Int, k: Int,
      nNodes: Long, bound: Double): DataFrame = {
    require(k < clusterSize, s"truth needs k < clusterSize: $k, $clusterSize")
    graph.filter(col("rank") <= k)
      .agg(sum(when(
          expr(s"query_id div $clusterSize = neighbor_id div $clusterSize"),
          1L).otherwise(0L)).as("__hits"))
      .select(lit(nNodes).as("n_nodes"),
        (coalesce(col("__hits"), lit(0L)).cast("double") >=
          lit(bound * (nNodes * k).toDouble)).as("recall_ok"))
  }

  /** MMR contract over [[clusteredCorpus]] at scale — gates the greedy
    * fold's two provable properties without depending on embedding
    * geometry beyond the corpus's designed shape:
    * (1) λ=1 EQUIVALENCE: with the similarity penalty weighted zero,
    *     MMR is relevance-ranked top-k by definition; the λ=1 picks
    *     must equal the brute-force top-k EXACTLY, rank for rank
    *     (both sides break score ties identically: cosine desc, id
    *     asc — so the equality is exact even under ties);
    * (2) DIVERSITY DIRECTION at a penalty-heavy λ: every query's
    *     rank-1 pick is still pure relevance (a mate — the corpus's
    *     clusters are pairwise-cosine≈1), and EVERY query must
    *     displace at least one mate (≤ k−1 mates among its k picks —
    *     a second same-cluster mate scores λ·≈1 − (1−λ)·≈1, deeply
    *     negative at small λ, so some non-mate candidate wins a slot)
    *     where relevance top-k carries min(k, clusterSize−1) = k of
    *     them; the MEAN mates-per-query must also fall ≤ `mateCeil`.
    *     The ceiling is NOT k−... 1: the query's nearest strangers are
    *     often one foreign CLUSTER whose members penalize each other
    *     as hard as the query's own mates do, so MMR legitimately
    *     alternates mate/foreign/mate — the honest bound is "strictly
    *     fewer than the relevance path", not "one mate only".
    *     Shape invariants ride along: exactly nQueries queries,
    *     exactly k DISTINCT picks each, ranks 1..k.
    *     One row (n_queries, mmr_ok). */
  def mmrScaleContract(mmrDiv: DataFrame, mmrLam1: DataFrame,
      brute: DataFrame, clusterSize: Int, k: Int, nQueries: Long,
      mateCeil: Double): DataFrame = {
    require(k < clusterSize, s"bad mmr-scale shape: k=$k")
    val mate =
      expr(s"query_id div $clusterSize = neighbor_id div $clusterSize") &&
        col("query_id") =!= col("neighbor_id")
    // λ=1 ≡ top-k: inner-join on (query, neighbor, rank) — full marks
    // means every (q, pick, position) triple agrees
    val lam1Agree = mmrLam1.select(col("query_id"), col("neighbor_id"),
        col("mmr_rank").as("rank"))
      .join(brute.filter(col("rank") <= k),
        Seq("query_id", "neighbor_id", "rank"))
      .agg(count(lit(1)).as("__agree"))
    val perQ = mmrDiv.groupBy(col("query_id"))
      .agg(count(lit(1)).as("__n"),
        count_distinct(col("neighbor_id")).as("__nd"),
        sum(when(mate, 1L).otherwise(0L)).as("__mates"),
        min(when(col("mmr_rank") === 1, mate)).as("__first_is_mate"))
    perQ.agg(count(lit(1)).as("n_queries"),
        sum(when(col("__n") === k && col("__nd") === k, 0L)
          .otherwise(1L)).as("__badShape"),
        sum(when(col("__first_is_mate"), 0L).otherwise(1L))
          .as("__badFirst"),
        sum(col("__mates")).as("__mateSum"),
        max(col("__mates")).as("__mateMax"))
      .crossJoin(broadcast(lam1Agree))
      .select(col("n_queries"),
        (col("n_queries") === lit(nQueries) &&
          col("__badShape") === 0L && col("__badFirst") === 0L &&
          col("__agree") === lit(nQueries * k) &&
          col("__mateMax") <= lit((k - 1).toLong) &&
          col("__mateSum").cast("double") / col("n_queries") <=
            lit(mateCeil)).as("mmr_ok"))
  }

  /** MEAN RECIPROCAL RANK contract of an ANN searcher over
    * [[clusteredCorpus]] — the rank-position-sensitive complement of
    * the recall floor (a searcher returning mates only at ranks 2..k
    * keeps recall 1.0 but halves MRR): per query, 1/rank of the FIRST
    * mate in the top-k (0 if none). Exactness without float sums: with
    * L = lcm(1..k), each query contributes the exact integer L/rank
    * (L is divisible by every rank ≤ k), the numerator is an exact
    * long sum, and MRR = num/(n·L) is ONE IEEE division — no
    * order-dependent double accumulation. One row
    * (n_queries, mrr_ok). */
  def searchMateMrrContract(approx: DataFrame, clusterSize: Int, k: Int,
      nQueries: Long, bound: Double): DataFrame = {
    require(k < clusterSize && k <= 12, s"bad mrr shape: k=$k")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmK = (1L to k.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val mate =
      expr(s"query_id div $clusterSize = neighbor_id div $clusterSize") &&
        col("query_id") =!= col("neighbor_id")
    approx.filter(col("rank") <= k)
      .groupBy(col("query_id"))
      .agg(min(when(mate, col("rank"))).as("__fr"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("__fr").isNotNull,
          expr(s"$lcmK div __fr")).otherwise(0L)).as("__num"))
      .select(col("n_queries"),
        (col("n_queries") === lit(nQueries) &&
          coalesce(col("__num"), lit(0L)).cast("double") /
            lit((nQueries * lcmK).toDouble) >= lit(bound)).as("mrr_ok"))
  }

  /** Per-query mate-recall contract of an ANN SEARCHER over
    * [[clusteredCorpus]]: of the nQueries·k expected mate hits
    * (self excluded — every searcher here excludes self by
    * construction), the fraction the approximate top-k found.
    * `nQueries` is the EXPECTED query count, asserted via the emitted
    * n_queries (a searcher silently dropping a query fails the hash,
    * not just the recall). One row (n_queries, recall_ok). */
  /** Keep/drop contract of Similarity.semDedup over [[clusteredCorpus]]
    * at scale, gating the operator's REAL promise — duplicate REMOVAL:
    * of the nNodes − nClusters removable members (every non-first mate
    * of a pairwise-cosine≈1 cluster is a true duplicate of its keeper),
    * at least `bound` must be dropped. Three exactness invariants ride
    * along unconditionally: every cluster keeps ≥ 1 member (losing all
    * would mean the threshold dropped non-duplicates), every cluster's
    * KEPT set includes its min vec_id (the documented election — a
    * cross-cluster false-positive drop of a min fails here), and every
    * member is verdicted (row count). Removal is a FLOOR, not
    * exactness, because cell-local dedup is allowed its one bounded
    * miss: a cluster straddling a Voronoi boundary splits across cells
    * and keeps one member per side (measured ~12% of clusters at 512
    * pruned cells — each contributing ≤ clusterSize−1 missed drops,
    * never a wrong drop). Emits ONE row (n_clusters, dedup_ok); the
    * oracle is the constant TRUE verdict, so a keep/drop regression
    * hash-mismatches the gate (the q340 discipline). */
  def semDedupScaleContract(verdicts: DataFrame, clusterSize: Int,
      nNodes: Long, bound: Double): DataFrame = {
    require(clusterSize > 1 && nNodes % clusterSize == 0,
      s"bad contract shape: n=$nNodes clusterSize=$clusterSize")
    val nClusters = nNodes / clusterSize
    val removable = (nNodes - nClusters).toDouble
    verdicts
      .groupBy(expr(s"vec_id div $clusterSize").as("__cl"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("__k"),
        min(col("vec_id")).as("__min"),
        min(when(col("keep"), col("vec_id"))).as("__kmin"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("__n")).as("__rows"),
        sum(col("__k")).as("__keepers"),
        sum(when(col("__k") >= 1L &&
          col("__kmin") === col("__min"), 0L).otherwise(1L)).as("__bad"))
      .select(col("n_clusters"),
        (col("n_clusters") === lit(nClusters) &&
          col("__rows") === lit(nNodes) && col("__bad") === 0L &&
          (col("__rows") - col("__keepers")).cast("double") >=
            lit(bound * removable)).as("dedup_ok"))
  }

  /** Mate-pair recall contract of Similarity.nearDup over
    * [[clusteredCorpus]]: of the (nNodes/clusterSize)·C(clusterSize,2)
    * true mate pairs (cosine ≈ 1, above any sane threshold), the
    * fraction the blocked pair join surfaced — missing pairs count
    * against recall, so a blocking regression (bucket split, probe
    * loss) fails loudly. Emits ONE row (n_true_pairs, recall_ok);
    * oracle = constant TRUE. */
  def nearDupPairRecallContract(pairs: DataFrame, clusterSize: Int,
      nNodes: Long, bound: Double): DataFrame = {
    require(clusterSize > 1 && nNodes % clusterSize == 0,
      s"bad contract shape: n=$nNodes clusterSize=$clusterSize")
    val expected = (nNodes / clusterSize) *
      (clusterSize.toLong * (clusterSize - 1) / 2)
    pairs.agg(sum(when(
        expr(s"vec_a div $clusterSize = vec_b div $clusterSize"), 1L)
        .otherwise(0L)).as("__hits"))
      .select(lit(expected).as("n_true_pairs"),
        (coalesce(col("__hits"), lit(0L)).cast("double") >=
          lit(bound) * lit(expected.toDouble)).as("recall_ok"))
  }

  def searchMateRecallContract(approx: DataFrame, clusterSize: Int, k: Int,
      nQueries: Long, bound: Double): DataFrame = {
    require(k < clusterSize, s"truth needs k < clusterSize: $k, $clusterSize")
    approx.filter(col("rank") <= k)
      .agg(count_distinct(col("query_id")).as("n_queries"),
        sum(when(
          expr(s"query_id div $clusterSize = neighbor_id div $clusterSize") &&
            col("query_id") =!= col("neighbor_id"), 1L).otherwise(0L))
          .as("__hits"))
      .select(col("n_queries"),
        (col("n_queries") === lit(nQueries) &&
          coalesce(col("__hits"), lit(0L)).cast("double") >=
            lit(bound * (nQueries * k).toDouble)).as("recall_ok"))
  }
}
