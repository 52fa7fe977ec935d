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

  // NOT the Logging trait: its `log` member would shadow functions.log
  // used by the score transforms below
  private val logger =
    org.slf4j.LoggerFactory.getLogger("graft.pipeline.Similarity")
  private def logWarning(msg: => String): Unit = logger.warn(msg)

  /** Left-to-right dot product of two float vectors, in double —
    * codegen'd native expression (see graft.functions.VecDot). */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.vec_dot(a, b)

  /** Euclidean norm (left-to-right sum of squares). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  // annLsh sign-guard memo: sampled positive-coordinate fraction per
  // (session, corpus plan hash, hashed width). Hash-keyed like
  // centroidMemo (never the plan object — LocalRelation plans embed the
  // corpus rows); LRU-bounded like Dedup.capDecisions. Accessed through
  // SingleFlight, NOT computeIfAbsent under a synchronizedMap: the guard
  // runs an eager Spark job, and building under the map's global mutex
  // would serialize concurrent annLsh calls over DIFFERENT corpora
  // through one lock (the exact pattern RelCache.memo exists to avoid) —
  // with the rendezvous only same-key callers wait.
  private val signGuardDecisions =
    new java.util.LinkedHashMap[Any, java.lang.Double](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, java.lang.Double]): Boolean =
        size() > 64
    }

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

  /** Near-duplicate pairs (cosine >= threshold), blocked by (label,
    * sign-LSH bucket) — never label-only: an all-pairs-within-label join
    * materializes sum(label_size^2) pairs, which at 100 TB is an all-pairs
    * join in disguise. Here each vector lands in `tables` buckets (one per
    * LSH table, disjoint hyperplane sets), pairs come from equi-joining on
    * (label, table, bucket), and the cosine filter only verifies
    * candidates, so candidate volume is bounded by bucket sizes.
    *
    * Recall argument (documented knob, SURVEY §6): with axis-sign
    * hyperplanes, P[bit agrees] = 1 - theta/pi (~0.61 at cosine 0.35). One
    * B-bit table catches a qualifying pair with p^B; the OR over `tables`
    * disjoint tables plus hamming<=1 multi-probe (probe side flips each
    * bucket bit once) lifts the catch rate to
    * 1 - (1 - (p^B + B*(1-p)*p^(B-1)))^tables  (~0.93 at cosine 0.35 for
    * 4 tables x 4 bits). Raising `tables`/probes trades candidate volume
    * for recall; the DuckDB oracle mirrors the same blocking exactly. */
  def nearDup(emb: DataFrame, threshold: Double, tables: Int = 4,
      bits: Int = 4, probe: Boolean = true): DataFrame = {
    val n = graft.util.RelCache.persist(withNorm(emb))
    val bk = graft.util.RelCache.persist(
      n.select(col("vec_id"), col("label"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lshTableBucket(col("embedding"), t, bits).as("bucket"))): _*)).as("tb"))
        .select(col("vec_id"), col("label"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket")))
    // multi-probe rows live on ONE side of the pair join: a.probe hits
    // b.bucket whenever the two buckets differ in <= 1 bit, regardless of
    // which doc holds the lower id
    val probes =
      if (!probe) bk.withColumnRenamed("bucket", "pb")
      else bk.select(col("vec_id"), col("label"), col("tbl"),
        explode(array(col("bucket") +: (0 until bits).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("pb"))
    val cand = probes.as("a").join(bk.as("b"),
        col("a.label") === col("b.label") && col("a.tbl") === col("b.tbl") &&
          col("a.pb") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(n.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("na")), "vec_a")
      .join(n.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosine(col("ea"), col("eb"), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Distributed k-NN GRAPH construction by NN-Descent (Dong, Moses &
    * Li 2011, "Efficient k-nearest neighbor graph construction for
    * generic similarity measures") — the all-nodes ANN structure the
    * per-query searchers (annLsh/annIvf) don't build: every vector's k
    * most-cosine-similar neighbors, the backbone relation for semantic
    * dedup sweeps, graph clustering, and hub/outlier analysis.
    *
    * Spark-first shape (no sequential graph traversal — HNSW's insert
    * loop has no distributed form; NN-Descent is the published
    * alternative built ENTIRELY from joins):
    *  - INIT: sign-LSH bucket CHAINS — within each (table, bucket) each
    *    vector links to the next `initDegree` vectors in vec_id order
    *    (a row_number + rank-offset equi-join — linear in corpus size,
    *    never the m² within-bucket pair join; a degenerate one-bucket
    *    corpus costs one hot sort partition, not a quadratic join).
    *  - ROUNDS: the NN-Descent step — candidates = current edges ∪
    *    reverse edges ∪ neighbors-of-neighbors through the UNDIRECTED
    *    graph, re-scored and re-ranked per node. Reverse edges are
    *    capped at k by cosine (the paper's reverse sampling): an
    *    in-degree hub would otherwise square its row count in the NoN
    *    join. Candidate volume per round is ≤ 4nk² by construction.
    *  - Fixed `rounds` (the q248/q124 fixed-iteration discipline); each
    *    round's graph is EAGERLY localCheckpoint-pinned and the prior
    *    round's blocks are released (the components-loop discipline) —
    *    a lazily-persisted loop re-executes every prior round once per
    *    use of the graph relation (g + rev = 2 uses/round → 2^rounds
    *    blowup, measured 13 s → 260 s from r=2 to r=4 before the pin).
    *
    * Deterministic end-to-end: LSH buckets are sign tests on fixed
    * coordinates, ranking is (cosine desc, id asc) via the bounded-heap
    * TopKByScore, chain init is vec_id-ordered — no RNG anywhere, so
    * the recall contract (q315) gates reproducibly.
    * Output: (query_id, neighbor_id, cosine, rank) — k rows per node
    * (fewer for nodes whose candidate closure is smaller).
    *
    * ROUNDS SIZING (measured in StressGraph): NN-Descent converges in
    * O(log n) rounds from a local init — on a 1000-cluster 50k-vector
    * corpus, edge recall vs exact top-k goes 0.29 → 0.85 from
    * rounds = 2 → 4; a FIXED small default silently under-converges as
    * n grows (a caller at 10M vectors would get a bad graph and no
    * error). The default is therefore AUTO (rounds < 0): the round
    * budget is max(4, ⌈log₂(n)/4⌉) — at least the measured-converged
    * 50k budget, growing with n — and each round measures its own EDGE
    * CHURN (fraction of (query, neighbor) edges that changed), the
    * NN-Descent paper's own stop rule: refinement stops early once
    * churn < 1%, so converged corpora never pay the full budget. Both
    * the derived budget and the per-round churn are logged the way the
    * LSH pair-budget guard logs (one warning line per decision), and
    * the ≥200k-vector recall gate (q340) pins the auto default's
    * quality. Passing an explicit rounds ≥ 0 keeps the fixed-iteration
    * behavior (and skips the churn counts). Determinism holds either
    * way: churn is a pure function of the data. */
  def knnGraph(emb: DataFrame, k: Int, rounds: Int = -1, tables: Int = 8,
      bits: Int = 8, initDegree: Int = 0): DataFrame = {
    require(k > 0 && rounds >= -1 && tables > 0 && bits > 0,
      s"bad knnGraph shape: k=$k rounds=$rounds tables=$tables bits=$bits")
    // memoized per (corpus, parameters): the build is the expensive
    // artifact every graph consumer (q315 contract, q317 search, q327
    // diversify+search) shares — a checkpointed result's plan hides the
    // input, so the explicit key does what plan-keyed RelCache can't
    graft.util.RelCache.memo(("knnGraph", emb.sparkSession,
      emb.queryExecution.analyzed.canonicalized,
      k, rounds, tables, bits, initDegree)) {
      knnGraphBuild(emb, k, rounds, tables, bits, initDegree)
    }
  }

  private def knnGraphBuild(emb: DataFrame, k: Int, rounds: Int,
      tables: Int, bits: Int, initDegree: Int): DataFrame = {
    val c = if (initDegree > 0) initDegree else k
    val n = graft.util.RelCache.persist(withNorm(emb)
      .select(col("vec_id"), col("embedding"), col("nrm")))
    val bk = n.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lshTableBucket(col("embedding"), t, bits).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tbl"), col("bucket")).orderBy(col("vec_id"))
    val withRn = graft.util.RelCache.persist(
      bk.withColumn("__rn", row_number().over(rn)))
    // chain edges via lead() over the SAME window the rank came from —
    // row at __rn links to the next c rows of its (tbl, bucket) chain.
    // Identical pairs to the former rank-offset self-join (__trn ∈
    // [__rn+1, __rn+c] ⇔ lead 1..c), but ONE Window over the pinned
    // ranked relation (whose cached partitioning/ordering already
    // satisfies the spec — no exchange, no sort) instead of building +
    // broadcasting a corpus·tables-row hash relation per graph build
    val fwd = withRn
      .select(col("vec_id").as("query_id"),
        array((1 to c).map(j => lead(col("vec_id"), j).over(rn)): _*).as("__nx"))
      .select(col("query_id"), explode(col("__nx")).as("neighbor_id"))
      .filter(col("neighbor_id").isNotNull)
    val initCand = fwd.union(
        fwd.select(col("neighbor_id").as("query_id"),
          col("query_id").as("neighbor_id")))
      .distinct()
    def score(cand: DataFrame): DataFrame = cand
      .join(n.select(col("vec_id").as("query_id"), col("embedding").as("__ea"),
        col("nrm").as("__na")), "query_id")
      .join(n.select(col("vec_id").as("neighbor_id"), col("embedding").as("__eb"),
        col("nrm").as("__nb")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__ea"), col("__eb"), col("__na"), col("__nb")).as("cosine"))
    def blocks(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    // AUTO budget: max(4, ceil(log2(n)/4)) — the StressGraph-measured
    // convergence scaling; the count job runs on the already-persisted
    // corpus relation (one cached scan)
    val auto = rounds < 0
    val budget =
      if (!auto) rounds
      else {
        val nRows = n.count()
        val r = math.max(4, math.ceil(
          math.log(math.max(nRows, 2L).toDouble) / math.log(2.0) / 4.0).toInt)
        logWarning(s"knnGraph auto rounds: n=$nRows -> budget=$r " +
          "(stops early at <1% edge churn)")
        r
      }
    var graph = rankTopK(score(initCand), k).localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < budget && !converged) {
      round += 1
      val g = graph.select(col("query_id"), col("neighbor_id"))
      // reverse edges capped at k by cosine — the paper's reverse
      // sampling; an uncapped in-degree hub squares in the NoN join
      val rev = rankTopK(graph.select(col("neighbor_id").as("query_id"),
          col("query_id").as("neighbor_id"), col("cosine")), k)
        .select(col("query_id"), col("neighbor_id"))
      val und = g.union(rev)
      val non = und.as("x").join(und.as("y"),
          col("x.neighbor_id") === col("y.query_id") &&
            col("x.query_id") =!= col("y.neighbor_id"))
        .select(col("x.query_id").as("query_id"),
          col("y.neighbor_id").as("neighbor_id"))
      val cand = g.union(non).distinct()
      val next = rankTopK(score(cand), k).localCheckpoint(true)
      if (auto) {
        // edge churn = fraction of the new graph's edges absent from
        // the previous graph — ONE job over two n·k-row checkpointed
        // relations (left_outer against the unique-keyed g, count +
        // count-matched in a single aggregate; was two count jobs whose
        // barriers queued separately under the bench's concurrency);
        // the NN-Descent stop rule (churn < delta) ends refinement
        val chk = next.select(col("query_id"), col("neighbor_id"))
          .join(g.withColumn("__in", lit(1)),
            Seq("query_id", "neighbor_id"), "left_outer")
          .agg(count(lit(1)).as("__t"), count(col("__in")).as("__k"))
          .collect()(0)
        val total = chk.getLong(0)
        val kept = chk.getLong(1)
        val churn =
          if (total == 0L) 0.0 else (total - kept).toDouble / total.toDouble
        logWarning(f"knnGraph round $round/$budget: edge churn $churn%.4f")
        converged = churn < 0.01
      }
      blocks(graph).foreach(_.unpersist(false))
      graph = next
    }
    graph
  }

  /** Edge DIVERSIFICATION of a k-NN graph — RobustPrune (Subramanya et
    * al. 2019, DiskANN / Vamana; the α-pruning NSG and HNSW's heuristic
    * select share): per node, walk its candidates best-first and KEEP a
    * candidate v only if no already-kept w dominates it —
    * α·d(w, v) ≤ d(u, v) with d = 1 − cosine — capping out-degree at
    * `r`. A raw k-NN graph wastes its degree budget on mutually-close
    * near-duplicates of the same direction; pruning spends it on
    * DIVERSE directions, which is what gives greedy/beam search its
    * long-range hops. α > 1 relaxes domination (keeps more, longer
    * edges).
    *
    * Distributed shape (no per-node driver loop): the k×k
    * neighbor-pair relation per node — ≤ n·k² rows, the NN-Descent
    * round budget — is scored by ONE equi-join pass against the corpus
    * relation, collapsed in-row into a pair-cosine map per node, and
    * the sequential greedy walk runs INSIDE the row as a HOF fold over
    * the (cosine desc, id) sorted candidate array (≤ k elements — the
    * bounded-state analog of the windowedGini in-row fold). Zero RNG;
    * the closest candidate is always kept (nothing can dominate it).
    * Output: (query_id, neighbor_id, cosine, rank ≤ r). */
  def diversifyGraph(emb: DataFrame, graph: DataFrame, r: Int,
      alpha: Double = 1.2): DataFrame = {
    require(r > 0 && alpha >= 1.0, s"bad diversify shape: r=$r alpha=$alpha")
    val n = graft.util.RelCache.persist(withNorm(emb)
      .select(col("vec_id"), col("embedding"), col("nrm")))
    val g = graph.select(col("query_id").as("__u"),
      col("neighbor_id").as("__v"), col("cosine").as("__cuv"))
    // all ordered neighbor pairs (v, w) per node, scored in one pass
    val pairs = g.as("a").join(g.as("b"),
        col("a.__u") === col("b.__u") && col("a.__v") =!= col("b.__v"))
      .select(col("a.__u").as("__u"), col("a.__v").as("__v"),
        col("b.__v").as("__w"))
      .join(n.select(col("vec_id").as("__v"), col("embedding").as("__ev"),
        col("nrm").as("__nv")), "__v")
      .join(n.select(col("vec_id").as("__w"), col("embedding").as("__ew"),
        col("nrm").as("__nw")), "__w")
      .select(col("__u"),
        concat_ws(":", col("__v"), col("__w")).as("__k"),
        cosine(col("__ev"), col("__ew"), col("__nv"), col("__nw")).as("__c"))
    val pm = pairs.groupBy(col("__u"))
      .agg(map_from_entries(collect_list(struct(col("__k"), col("__c"))))
        .as("__pm"))
    val cands = g.groupBy(col("__u"))
      .agg(sort_array(collect_list(struct((-col("__cuv")).as("s"),
        col("__v").as("v"), col("__cuv").as("c")))).as("__cands"))
    // the greedy walk: keep c unless some kept k dominates it. A pair
    // key absent from __pm means the graph references a vec_id the
    // corpus doesn't hold (inconsistent graph/emb inputs) — fail LOUDLY
    // instead of letting the NULL predicate silently keep the candidate
    // and skew pruning (raise_error is reached only on the missing key;
    // a kept-set member always came through the same pair relation).
    val keepExpr =
      s"""aggregate(__cands,
         |  CAST(array() AS ARRAY<STRUCT<v: BIGINT, c: DOUBLE>>),
         |  (acc, cd) -> CASE
         |    WHEN size(acc) >= $r THEN acc
         |    WHEN exists(acc, k ->
         |      $alpha * (1.0D - coalesce(element_at(__pm, concat(k.v, ':', cd.v)),
         |        CAST(raise_error('diversifyGraph: graph neighbor pair absent from emb') AS DOUBLE)))
         |        <= (1.0D - cd.c)) THEN acc
         |    ELSE array_append(acc, struct(cd.v AS v, cd.c AS c)) END)
         |""".stripMargin.replaceAll("\n", " ")
    // pinned like [[knnGraph]]'s output: the pruned graph is an INDEX
    // artifact (n·r rows) a deployment stores, and rebuilding it costs
    // the n·k² pair relation — searches over one (graph, r, alpha)
    // must not re-prune
    graft.util.RelCache.persist(
      cands.join(pm, Seq("__u"), "left")
        .withColumn("__pm", coalesce(col("__pm"),
          expr("CAST(map() AS MAP<STRING, DOUBLE>)")))
        .select(col("__u").as("query_id"),
          posexplode(expr(keepExpr)).as(Seq("__r", "__kv")))
        .select(col("query_id"), col("__kv.v").as("neighbor_id"),
          col("__kv.c").as("cosine"), (col("__r") + 1).cast("int").as("rank")))
  }

  /** Per-query ANN SEARCH over a prebuilt k-NN graph — the query side of
    * [[knnGraph]] (HNSW/NSG-style beam search, in its one distributable
    * form): ALL queries advance together through `rounds` of synchronous
    * beam expansion, each round one equi-join against the graph relation
    * plus one bounded-heap re-rank — never a per-query sequential walk
    * (a greedy walk is a driver loop per query; the level-synchronous
    * frontier is how batch engines evaluate NSG/Vamana-style search).
    *
    *  - ENTRY: each query seeds its beam from four deterministic
    *    sources — (a) the first `beam` corpus vectors per (table,
    *    bucket) of ITS OWN sign-LSH buckets (the graph's init
    *    geometry: precision), (a2) for a query that IS a corpus member,
    *    its bucket CHAIN NEIGHBORS — the ≤ beam corpus vectors on
    *    either side of its own rank position in each bucket's vec_id
    *    order, exactly the rows the graph's chain init linked it to
    *    (POSITION-LOCAL entry: on a well-separated corpus the k-NN
    *    graph is DISCONNECTED per cluster, and the position-blind
    *    first-rows seed lands every walk in a foreign component —
    *    measured 0.035 vs 1.0 search recall at 200k clustered vectors;
    *    one equi-join on vec_id + the chain-init rank explode, ≤
    *    tables·(2·beam+1) seeds per query, nothing for out-of-corpus
    *    queries), (b) every bucket's HEAD vector (first in
    *    vec_id order — at most tables·2^bits rows total, the IVF-style
    *    coarse routing that gives entry DIVERSITY: a query whose own
    *    bucket is a singleton can never walk into the right basin from
    *    a foreign entry; bucket heads guarantee one entry per populated
    *    region), and (c) the globally smallest `beam` vec_ids (so no
    *    query ever starts empty).
    *  - ROUNDS: candidates = current beam ⋈ graph edges, anti-joined
    *    against everything already scored (per-round work stays
    *    proportional to NEW candidates), scored against the broadcast
    *    query embeddings, union'd into the scored set, re-ranked per
    *    query to `beam` by the bounded-heap TopKByScore. Per-round
    *    candidate volume ≤ |Q|·beam·graph_degree; the query relation
    *    broadcasts, the corpus never shuffles more than the candidate
    *    rows joined TO it on neighbor_id.
    *  - The SEED scores are eagerly localCheckpoint-pinned (the base
    *    every round re-reads); the bounded rounds run lazily — round r
    *    references r−1 only through exchanges, which ReuseExchange
    *    collapses in the one final plan, so nothing re-executes
    *    2^rounds and no per-round blocking job serializes the search
    *    behind concurrent queries.
    *
    * Deterministic end-to-end (LSH sign tests, vec_id-ordered seeds,
    * (cosine desc, id asc) heap ranking — no RNG), so the recall
    * contract (q317) gates reproducibly. Self-hits are excluded to
    * match [[bruteForceTopK]]. Output: (query_id, neighbor_id, cosine,
    * rank) — k rows per query.
    *
    * CENTERING CAVEAT (applies to the whole sign-LSH entry family,
    * measured in StressGraph): embeddings whose coordinates are all
    * one sign — common for some encoder models — hash every vector
    * into the single all-ones bucket per table, collapsing bucket
    * heads and chains to one region; entry then degenerates to the
    * global fallback and recall craters. Center such corpora first
    * (subtract the coordinate means — one [[embedCovarianceAgg]]-style
    * pass; [[jlSearchTopK]] is the centering-free alternative, its
    * hyperplanes don't test signs of raw coordinates alone). */
  def graphSearch(emb: DataFrame, queries: DataFrame, k: Int,
      graph: DataFrame, rounds: Int = 2, beam: Int = 8,
      tables: Int = 8, bits: Int = 8): DataFrame = {
    require(k > 0 && rounds >= 0 && beam >= k && tables > 0 && bits > 0,
      s"bad graphSearch shape: k=$k rounds=$rounds beam=$beam")
    val n = graft.util.RelCache.persist(withNorm(emb)
      .select(col("vec_id"), col("embedding"), col("nrm")))
    val q = withNorm(queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qe"),
        col("nrm").as("__qn"))
    // corpus bucket relation with a per-(table, bucket) rank — the
    // knnGraph chain-init geometry reused as the entry index; only the
    // first `beam` rows per bucket survive, so the seed join is bounded
    val bk = n.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lshTableBucket(col("embedding"), t, bits).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tbl"), col("bucket")).orderBy(col("vec_id"))
    val ranked = graft.util.RelCache.persist(
      bk.withColumn("__rn", row_number().over(rn)))
    // entry index and bucket heads are beam-/corpus-keyed derivations of
    // the pinned `ranked` relation — pinned themselves so repeated
    // searches (and the q341/q317/q327 gates sharing one corpus) skip
    // the 1.6M-row re-scans
    val entryIdx = graft.util.RelCache.persist(
      ranked.filter(col("__rn") <= beam)
        .select(col("tbl"), col("bucket"), col("vec_id").as("neighbor_id")))
    val qb = q.select(col("query_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lshTableBucket(col("__qe"), t, bits).as("bucket"))): _*)).as("tb"))
      .select(col("query_id"), col("tb.tbl").as("tbl"),
        col("tb.bucket").as("bucket"))
    val lshSeeds = broadcast(qb).join(entryIdx, Seq("tbl", "bucket"))
      .select(col("query_id"), col("neighbor_id"))
    // (a2) position-local chain seeds: the query's own row in each
    // bucket (equi-join on vec_id — empty for out-of-corpus queries)
    // exploded to the chain-init rank window around its position
    // both chain joins keep the |Q|-sized side as the broadcast build and
    // stream the corpus-sized `ranked` relation from its pinned cache
    val chainPos = broadcast(qb)
      .join(ranked.withColumnRenamed("vec_id", "query_id"),
        Seq("query_id", "tbl", "bucket"))
      .select(col("query_id"), col("tbl"), col("bucket"),
        explode(expr(s"sequence(greatest(1, __rn - $beam), __rn + $beam)"))
          .as("__trn"))
    val chainSeeds = ranked.select(col("vec_id").as("neighbor_id"),
        col("tbl"), col("bucket"), col("__rn").as("__trn"))
      .join(broadcast(chainPos), Seq("tbl", "bucket", "__trn"))
      .select(col("query_id"), col("neighbor_id"))
    // bucket heads: one representative per populated (table, bucket) —
    // ≤ tables·2^bits rows, the bounded entry-diversity set
    val headSeeds = q.select(col("query_id"))
      .crossJoin(broadcast(graft.util.RelCache.persist(
        ranked.filter(col("__rn") === 1)
          .select(col("vec_id").as("neighbor_id")).distinct())))
    val globalSeeds = q.select(col("query_id"))
      .crossJoin(broadcast(n.select(col("vec_id").as("neighbor_id"))
        .orderBy(col("neighbor_id")).limit(beam)))
    // Broadcast the CANDIDATE pairs (|Q|·seeds rows of two longs — KBs to
    // a few MB), never the corpus: the corpus side streams from its
    // pinned cache map-side, so each scoring pass is one shuffle-free
    // stage. The previous shape (cand ⋈ n) let the planner pick the
    // ~200k-row embedding relation as the build side, re-collecting and
    // re-shipping a corpus-sized hash relation for every eager round.
    def score(cand: DataFrame): DataFrame = n
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__eb"), col("nrm").as("__nb"))
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(q), "query_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qe"), col("__eb"), col("__qn"), col("__nb")).as("cosine"))
    val edges = graph.select(col("query_id").as("__node"),
      col("neighbor_id").as("__next"))
    // ONE eager checkpoint — the seed scores (the only relation every
    // round re-reads, and the base of the iterative lineage); the
    // rounds themselves stay LAZY. The previous form checkpointed the
    // whole accumulated union every round, which (a) re-serialized the
    // |Q|·seeds rows per round and (b) serialized the search into ~10
    // extra blocking jobs per call — under the bench's 16-way query
    // concurrency each barrier queues behind every other query's jobs.
    // Laziness is affordable here because round r's plan references
    // round r−1 only through exchanges, and ReuseExchange collapses the
    // repeated identical subtrees in the single final physical plan;
    // with the bounded rounds (2 everywhere on the surface) the plan
    // stays small.
    //
    // The checkpointed seed scores are GRAPH-INDEPENDENT — a pure
    // function of (corpus, queries, beam, tables, bits) — so they go
    // through the keyed memo (the knnGraph discipline; the checkpoint
    // hides the inputs from plan-keyed caching): searches over one
    // corpus with different graphs (q317's raw vs q327's pruned) and
    // repeated searches skip the ~8-stage seed-scoring job entirely.
    var seen = graft.util.RelCache.memo(("graphSearchSeeds", emb.sparkSession,
        emb.queryExecution.analyzed.canonicalized,
        queries.queryExecution.analyzed.canonicalized, beam, tables, bits)) {
      score(lshSeeds.union(chainSeeds).union(headSeeds)
          .union(globalSeeds).distinct())
        .localCheckpoint(true)
    }
    for (r <- 1 to rounds) {
      val frontier = rankTopK(seen, beam)
        .select(col("query_id"), col("neighbor_id").as("__node"))
      // |Q|·beam frontier rows broadcast; the n·k edge relation streams
      val fresh = edges.join(broadcast(frontier), "__node")
        .select(col("query_id"), col("__next").as("neighbor_id"))
        .distinct()
        .join(seen.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_anti")
      seen = seen.union(score(fresh))
      // the lazy plan references the prior round's `seen` three times
      // (frontier, anti-join, union), growing ~3^rounds — fine at the
      // surface's rounds=2, but `rounds` is a public parameter. Past
      // two rounds, truncate the accumulated lineage every other round
      // (O(rounds) checkpoints — the bounded-planning fallback — only
      // where the lazy form would explode Catalyst time).
      if (rounds > 2 && r % 2 == 0 && r < rounds)
        seen = seen.localCheckpoint(true)
    }
    rankTopK(seen, k)
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

  /** Hard-negative mining for contrastive training: per query vector, the
    * k most COSINE-similar corpus vectors with a DIFFERENT label — the
    * near-misses a contrastive objective learns most from (same-label
    * vectors are positives, not negatives, and the query itself is
    * excluded by construction). Same broadcast + bounded-heap shape as
    * [[bruteForceTopK]]: the query set broadcasts, the corpus never
    * shuffles, and the label exclusion is a join predicate evaluated
    * before any scoring — not a post-filter that could leave a query
    * with fewer than k survivors while excluded rows occupied heap slots.
    * Deterministic (cosine desc, neighbor asc) ranking. At corpus scale,
    * feed the LSH/IVF candidate generators through the same exclusion
    * predicate; this exact form is the recall oracle. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus).as("c")
    val q = withNorm(queries).as("q")
    val scored = c.join(broadcast(q),
      col("q.vec_id") =!= col("c.vec_id") && col("q.label") =!= col("c.label"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding"), col("q.nrm"), col("c.nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** Bucket for LSH table `table` in a multi-table (OR-construction)
    * scheme: bit j tests the sign of element table*bits + j + 1, so every
    * table reads a DISJOINT slice of the vector (independent-ish
    * hyperplanes without any RNG — reproducible in any engine). Elements
    * past the vector's length count as sign 0, matching SQL's NULL
    * out-of-range indexing. */
  def lshTableBucket(v: Column, table: Int, bits: Int): Column =
    (0 until bits).map { j =>
      val idx = table * bits + j + 1
      when(size(v) >= idx,
        when(element_at(v, idx) > 0.0f, lit(1L << j)).otherwise(lit(0L)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic Lloyd-trained coarse quantizer for IVF: init = the
    * nCells lowest-vec_id embeddings (cent_id = rank), then `iters`
    * rounds of cosine assignment (ties -> lowest cent_id, the TopKByScore
    * order) and per-dimension DECIMAL(38,14)-exact means — every step is
    * reproducible bit-for-bit in any engine, so the DuckDB oracle can
    * re-derive the same centroids. Empty cells keep their previous
    * centroid. Per round: one broadcast-join assignment pass over the
    * corpus + one (nCells x dim)-row aggregate collected to the driver
    * (tiny, like QuantileBins' edge collect); at 100 TB you train on a
    * hash-sampled subset and the rounds are the same two jobs. */
  def kmeansCentroids(corpus: DataFrame, nCells: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    // Memoized like the derived relations (RelCache): cluster,
    // clusterBalancedSample and annIvf over one corpus share ONE
    // training run instead of re-running Lloyd per operator. Keyed by the
    // session UUID + the canonicalized plan's SEMANTIC HASH + params —
    // NOT the plan object: canonicalized LocalRelation plans embed every
    // literal row, so object keys would pin up to 16 full in-memory
    // corpora (and their sessions) in a process-global map. The hash key
    // retains only ints/strings; with the handful of live entries a
    // 32-bit semantic-hash collision is ~1e-8 — negligible against the
    // retention cost of object keys. Staleness contract (same as
    // RelCache and Spark's own table cache): an identical plan over
    // REWRITTEN underlying files returns the previously-trained
    // centroids — call clearCentroidCache() between corpus rewrites in
    // long-lived drivers.
    // "kmeans" tag: SingleFlight's in-flight table is shared across all
    // memos, so keys must be globally distinct (its own scaladoc rule —
    // an untagged 4-int tuple here could collide with a future untagged
    // key in another memo and hand a waiter the wrong cache's value)
    val key = ("kmeans", System.identityHashCode(corpus.sparkSession),
      corpus.queryExecution.analyzed.canonicalized, nCells, iters)
    graft.util.SingleFlight(centroidMemo, key)(
      trainCentroids(corpus, nCells, iters))
  }

  /** Drop memoized trained centroids (see kmeansCentroids' staleness
    * contract: identical plan over rewritten files returns stale
    * centroids until cleared). */
  def clearCentroidCache(): Unit = {
    centroidMemo.synchronized(centroidMemo.clear())
    pqMemo.synchronized(pqMemo.clear())
  }

  private val centroidMemo =
    new java.util.LinkedHashMap[Any, Seq[(Long, Array[Double])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, Seq[(Long, Array[Double])]]): Boolean =
        size() > 16 // centroid sets are tiny (nCells x dim doubles)
    }

  private def trainCentroids(corpus: DataFrame, nCells: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    import java.math.{BigDecimal => JBD, BigInteger => JBI, RoundingMode}
    // Deterministic UNBIASED training subset: the nCells*8 vectors with the
    // smallest 60-bit salted md5 of vec_id (ties by vec_id). A hash-rank
    // sample is a uniform draw regardless of how vec_id correlates with
    // content (ingest time, source, shard) — a vec_id prefix is not — and
    // it works for offset or sparse id spaces. TakeOrdered keeps it one
    // bounded top-k job (k rows per map partition to the driver, never a
    // full sort), so the same two-job shape holds at 100 TB. The sample is
    // bounded (nCells * 8 * dim floats), so it is collected ONCE and Lloyd
    // runs on the driver with every step bit-identical to the SQL the
    // oracle executes: dots and norms fold left-to-right in double,
    // assignment ties go to the lowest cent_id with NaN ordered largest
    // (Double.compare = ORDER BY ccos DESC), and per-dimension means
    // accumulate DECIMAL(38,14) unscaled integers (shortest-string image
    // of each double, Dec.toDec) with the Dec.exactDouble split at the
    // end. Init centroids = the first nCells in the same hash order.
    val trainHash = conv(substring(
      md5(concat(col("vec_id").cast("string"), lit(":ivf"))), 1, 15), 16, 10)
      .cast("long")
    val sample: Array[Array[Float]] =
      corpus.select(col("embedding"), trainHash.as("__h"), col("vec_id"))
        .orderBy(col("__h"), col("vec_id")).limit(nCells * 8)
        .collect()
        .map(_.getSeq[Float](0).toArray)
    // corpora smaller than the requested cell count (incl. empty) simply
    // train fewer cells — every vector becomes its own centroid
    if (sample.isEmpty) return Seq.empty
    def dotFD(v: Array[Float], c: Array[Double]): Double = {
      // fail loudly on mismatched lengths, like VecDot/VecDotFD — silent
      // truncation would mask corrupt embeddings during training and then
      // crash anyway in the assignCells pass
      require(v.length == c.length,
        s"kmeans: embedding length mismatch (${v.length} vs ${c.length})")
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * c(i); i += 1 }
      s
    }
    def nrm2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    def cnrm2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    val norms = sample.map(nrm2)
    var cents: Array[Array[Double]] = sample.take(nCells).map(_.map(_.toDouble))
    for (_ <- 1 to iters) {
      val cnorms = cents.map(cnrm2)
      val assign = sample.indices.map { vi =>
        var best = -1; var bestScore = 0.0
        var c = 0
        while (c < cents.length) {
          val ccos = dotFD(sample(vi), cents(c)) / (norms(vi) * cnorms(c))
          if (best == -1 || java.lang.Double.compare(ccos, bestScore) > 0) {
            best = c; bestScore = ccos
          }
          c += 1
        }
        best
      }
      cents = cents.zipWithIndex.map { case (old, cid) =>
        val members = sample.indices.filter(assign(_) == cid)
        if (members.isEmpty) old
        else {
          val dim = old.length
          Array.tabulate(dim) { i =>
            // mirror of the oracle's SUM(TRY_CAST(...)) / COUNT(*):
            // non-finite / precision-38-overflow elements are skipped by
            // the SUM but COUNT(*) still counts every member; a dimension
            // with no castable element yields a NULL mean, which COALESCEs
            // to the previous centroid value
            var acc = JBI.ZERO
            var valid = 0
            members.foreach { vi =>
              val x = sample(vi)(i).toDouble
              if (java.lang.Double.isFinite(x)) {
                val d = new JBD(java.lang.Double.toString(x))
                  .setScale(14, RoundingMode.HALF_UP)
                if (d.precision() <= 38) {
                  acc = acc.add(d.unscaledValue())
                  valid += 1
                }
              }
            }
            if (valid == 0) old(i)
            else {
              val s = new JBD(acc, 14)
              val fl = s.setScale(0, RoundingMode.FLOOR)
              val exact = fl.longValueExact().toDouble +
                s.subtract(fl).movePointRight(14).longValueExact().toDouble / 1.0e14
              exact / members.length.toDouble
            }
          }
        }
      }
    }
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toSeq
  }

  /** Centroids as a broadcastable (cent_id, cvec, cnrm) relation; the norm
    * is the same left-to-right sum-of-squares fold both engines use. */
  private def centroidsDf(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.map { case (cid, v) =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (cid, v.toSeq, math.sqrt(s))
    }.toDF("cent_id", "cvec", "cnrm")
  }

  /** Nearest `cells` centroids per vector via the bounded heap aggregate
    * (no window shuffle of the |corpus| x nCells scored relation). */
  /** `extra`: passenger columns (e.g. a label) carried through the
    * assignment untouched — they join the aggregate key, a semantic no-op
    * because vec_id already keys the relation uniquely. */
  private def assignCells(df: DataFrame, cent: DataFrame, cells: Int,
      extra: Seq[String] = Nil): DataFrame = {
    val n = withNorm(df).as("v")
    val ex = extra.map(c => col(s"v.$c").as(c))
    val exOut = extra.map(col)
    n.join(broadcast(cent))
      .select(Seq(col("v.vec_id").as("vec_id"), col("v.embedding").as("embedding"),
        col("v.nrm").as("nrm"), col("cent_id"),
        (graft.functions.VecDotFD.vec_dot_fd(col("v.embedding"), col("cvec")) /
          (col("v.nrm") * col("cnrm"))).as("ccos")) ++ ex: _*)
      .groupBy(col("vec_id") +: col("embedding") +: col("nrm") +: exOut: _*)
      .agg(graft.functions.TopKByScore.top_k(col("ccos"), col("cent_id"), cells)
        .as("__top"))
      .select(Seq(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("__top")).as("__s")) ++ exOut: _*)
      .select(Seq(col("vec_id"), col("embedding"), col("nrm"),
        col("__s.id").as("cell"), col("__s.score").as("ccos")) ++ exOut: _*)
  }

  /** Driver-side grouping of the (tiny) trained centroid set into
    * `nSuper` super-centroids: a plain-double Lloyd over nCells vectors —
    * microseconds of driver work, deterministic (fixed iteration order,
    * cosine ties to the lowest id). Returns the super-centroid vectors and
    * the cent_id -> super_id map. Not oracle-gated (the pruned assignment
    * is an explicitly approximate scale path), so no decimal mirroring. */
  private[graft] def groupCentroids(cents: Seq[(Long, Array[Double])],
      nSuper: Int): (Seq[(Long, Array[Double])], Map[Long, Long]) = {
    if (cents.isEmpty) return (Seq.empty, Map.empty)
    def nrm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s / (nrm(a) * nrm(b))
    }
    var supers = cents.take(nSuper).map(_._2)
    var assign: Seq[Int] = Seq.empty
    for (_ <- 1 to 2) {
      assign = cents.map { case (_, v) =>
        supers.indices.maxBy(si => (cos(v, supers(si)), -si))
      }
      supers = supers.indices.map { si =>
        val members = cents.indices.filter(assign(_) == si)
        if (members.isEmpty) supers(si)
        else {
          val dim = supers(si).length
          Array.tabulate(dim)(d =>
            members.map(m => cents(m)._2(d)).sum / members.length)
        }
      }
    }
    (supers.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      cents.map(_._1).zip(assign.map(_.toLong)).toMap)
  }

  /** Two-level PRUNED cell assignment — the sub-N^1.5 IVF build path.
    * The nCells centroids are grouped into ~sqrt(nCells) super-centroids
    * (driver-side, trivial); each corpus vector scores the supers first
    * (N x sqrt(nCells) mults), keeps its `superProbe` nearest, and scores
    * only those supers' member cells (~superProbe x sqrt(nCells) more).
    * Build mults drop from N*nCells to ~N*(1+superProbe)*sqrt(nCells) —
    * at nCells ~ sqrt(N) that is N^1.25, not N^1.5. Approximate: a
    * vector's true nearest cell can live under an unprobed super
    * (superProbe >= 2 makes that rare; agreement measured in StressVec). */
  private def assignCellsPruned(df: DataFrame,
      cents: Seq[(Long, Array[Double])], cells: Int, superProbe: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nSuper = math.max(1, math.round(math.sqrt(cents.size.toDouble)).toInt)
    val (allSupers, centToSuper) = groupCentroids(cents, nSuper)
    // only supers that OWN centroids: a memberless super (its seed kept by
    // the tiny Lloyd but no centroid assigned) would otherwise win a
    // vector's top-superProbe slots and the level-2 inner join would then
    // emit no rows for that vector — silent corpus loss
    val owning = centToSuper.values.toSet
    val supers = allSupers.filter { case (sid, _) => owning(sid) }
    val superDf = centroidsDf(spark, supers)
      .select(col("cent_id").as("super_id"), col("cvec").as("svec"),
        col("cnrm").as("snrm"))
    // centroid relation annotated with its super group
    val cent2 = centroidsDf(spark, cents)
      .join(broadcast(centToSuper.toSeq.toDF("cent_id", "super_id")), "cent_id")
    val n = withNorm(df).as("v")
    // level 1: nearest `superProbe` super-centroids per vector
    val withSupers = n.join(broadcast(superDf))
      .select(col("v.vec_id").as("vec_id"), col("v.embedding").as("embedding"),
        col("v.nrm").as("nrm"), col("super_id"),
        (graft.functions.VecDotFD.vec_dot_fd(col("v.embedding"), col("svec")) /
          (col("v.nrm") * col("snrm"))).as("scos"))
      .groupBy(col("vec_id"), col("embedding"), col("nrm"))
      .agg(graft.functions.TopKByScore.top_k(col("scos"), col("super_id"), superProbe)
        .as("__sup"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("__sup")).as("__s"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("__s.id").as("super_id"))
    // level 2: exact scoring against ONLY the probed supers' member cells
    withSupers.as("v").join(broadcast(cent2), "super_id")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        (graft.functions.VecDotFD.vec_dot_fd(col("embedding"), col("cvec")) /
          (col("nrm") * col("cnrm"))).as("ccos"))
      .groupBy(col("vec_id"), col("embedding"), col("nrm"))
      .agg(graft.functions.TopKByScore.top_k(col("ccos"), col("cent_id"), cells)
        .as("__top"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("__top")).as("__s"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("__s.id").as("cell"))
  }

  /** Corpus clustering for mixture balancing / stratified curation: every
    * vector with its nearest trained k-means cell (the IVF quantizer's
    * assignment exposed as a first-class operator). Training is the
    * bounded hash-rank-sampled Lloyd of [[kmeansCentroids]]; assignment is
    * one broadcast-join pass over the corpus — no corpus shuffle. Cluster
    * sizes then feed per-cluster sampling (compose with
    * Sampling.sampleBySource keyed on the cell) or drift monitoring.
    *
    * @param superProbe when set, use the two-level pruned assignment
    *   ([[assignCellsPruned]]) — the sub-N^1.5 build path for
    *   nCells ~ sqrt(N); None (default, and the gated config) scores
    *   every centroid exactly. */
  def cluster(corpus: DataFrame, nCells: Int = 8, iters: Int = 2,
      superProbe: Option[Int] = None): DataFrame = {
    val cents = kmeansCentroids(corpus, nCells, iters)
    val assigned = superProbe match {
      case Some(w) => assignCellsPruned(corpus, cents, 1, w)
      case None => assignCells(corpus, centroidsDf(corpus.sparkSession, cents), 1)
    }
    assigned.select(col("vec_id"), col("cell"))
  }

  /** Per-vector embedding outlier score (corpus QA: garbage vectors,
    * mislabeled modalities, encoder failures sit FAR from every
    * centroid): each vector's cosine to its assigned centroid,
    * z-scored against its own cell's distribution — flagged when z
    * drops below −k (low cosine = far from center). The per-vector
    * companion to [[clusterStats]]'s per-cell report.
    *
    * Cross-engine exactness: the cosine is quantized to the
    * floor(ccos·1e12) integer (the q123 convention) so the per-cell
    * moments are EXACT integer sums in DECIMAL(38,0)/HUGEINT; the z
    * tail is the q153 fixed IEEE sequence (NULL for cells with n < 2
    * or zero variance). Scale shape: assignment is the trained
    * quantizer's one pass; moments are one cell-keyed aggregate
    * broadcast back; the scoring is map-side. */
  def embedOutliers(corpus: DataFrame, nCells: Int = 8, iters: Int = 2,
      k: Double = 2.0): DataFrame = {
    require(k > 0.0, s"k must be positive: $k")
    val cents = kmeansCentroids(corpus, nCells, iters)
    val dec = "decimal(38,0)"
    val asg = assignCells(corpus, centroidsDf(corpus.sparkSession, cents), 1)
      .select(col("vec_id"), col("cell"),
        floor(col("ccos") * lit(1.0e12)).cast("long").as("qcos"))
    val stats = asg.groupBy(col("cell")).agg(
      count(lit(1)).as("__n"),
      sum(col("qcos").cast(dec)).as("__s"),
      sum(col("qcos").cast(dec) * col("qcos").cast(dec)).as("__ss"))
    val num = col("__n").cast("double") * col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double")
    val varC = greatest(lit(0.0), num) /
      (col("__n").cast("double") * (col("__n") - lit(1L)).cast("double"))
    val stdC = sqrt(varC)
    val meanC = col("__s").cast("double") / col("__n").cast("double")
    val z = when(col("__n") >= 2L && stdC > lit(0.0),
      (col("qcos").cast("double") - meanC) / stdC)
    asg.join(broadcast(stats), "cell")
      .select(col("vec_id"), col("cell"), col("qcos"), z.as("z"),
        (z < lit(-k)).as("is_outlier"))
  }

  /** Per-cell quality report for the trained quantizer (cluster QA:
    * which cells are tight, which are junk drawers): size, the weakest
    * and strongest member's cosine to the own centroid, and the mean
    * member cosine. One broadcast-assign pass over the corpus + one
    * cell-keyed map-combinable aggregate — the corpus is never shuffled
    * to be assigned, and per-cell state is five scalars.
    *
    * Exactness: min/max are pure IEEE comparisons on doubles both
    * engines compute identically. The MEAN is the q113 Dec boundary
    * (member cosines are full-precision ratios, outside DECIMAL
    * round-tripping), so the sum is quantized FIRST — floor(ccos·1e12)
    * on identical doubles is the identical integer — and accumulated in
    * DECIMAL(38,0) (order-independent, overflow-proof to 1e26 members).
    * `mean_cos` then divides the exact quantized sum once; its ~1e-12
    * quantization is the documented resolution, not engine noise. */
  def clusterStats(corpus: DataFrame, nCells: Int = 8,
      iters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(corpus, nCells, iters)
    val asg = assignCells(corpus, centroidsDf(corpus.sparkSession, cents), 1)
    asg.groupBy(col("cell")).agg(
        count(lit(1)).as("n"),
        min(col("ccos")).as("min_cos"),
        max(col("ccos")).as("max_cos"),
        sum(floor(col("ccos") * lit(1.0e12)).cast("decimal(38,0)")).as("sum_qcos"))
      .select(col("cell"), col("n"), col("min_cos"), col("max_cos"),
        // Output boundary: quantized sum <= n*1e12, int64-safe to ~9e5
        // members per cell; DECIMAL accumulation stays internal.
        col("sum_qcos").cast("long").as("sum_qcos"),
        (col("sum_qcos").cast("double") /
          (col("n").cast("double") * lit(1.0e12))).as("mean_cos"))
  }

  /** IVF ANN with a TRAINED coarse quantizer: the corpus is assigned to
    * its nearest k-means cell; each query probes its `nprobe` nearest
    * cells (the standard IVF recall knob). At scale nCells ~ sqrt(N)
    * bounds per-cell candidate volume to ~N/nCells per probe.
    *
    * @param superProbe when set, the CORPUS-side assignment (the build's
    *   N x nCells term) goes through the two-level pruned path; the
    *   query side stays exact — queries are broadcast-small, and probing
    *   exactness is what nprobe's recall curve is calibrated against. */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int = 8,
      nprobe: Int = 1, iters: Int = 2,
      superProbe: Option[Int] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCells)
    val cents = kmeansCentroids(corpus, nCells, iters)
    val cent = centroidsDf(corpus.sparkSession, cents)
    // the corpus-side assignment (the N x nCells term) is pinned: IVF
    // consumers over one corpus (recall gates, repeated bench passes,
    // hardNegativesIvf's oracle) re-probe the SAME inverted lists —
    // plan-keyed, so an identical (corpus, trained centroids) pair
    // dedupes across calls; the centroid relation is a LocalRelation of
    // the memoized training output, structurally equal across calls
    val cRaw = superProbe match {
      case Some(w) => assignCellsPruned(corpus, cents, 1, w)
      case None => assignCells(corpus, cent, 1)
    }
    val c = (if (corpus.isStreaming) cRaw
             else graft.util.RelCache.persist(cRaw)).as("c")
    val q = assignCells(queries, cent, nprobe).as("q")
    val scored = c.join(broadcast(q),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding"), col("q.nrm"), col("c.nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** The IVF-composed scale path of [[hardNegatives]]: candidates come
    * from the trained quantizer's probed cells instead of the full
    * corpus, with the SAME different-label join predicate — mining build
    * cost drops from |Q|·N scores to |Q|·(nprobe/nCells)·N expected.
    * At nprobe = nCells every cell is probed, the candidate set is
    * exactly the different-label corpus, and the output equals
    * [[hardNegatives]] by construction — the gated configuration
    * (q147, against the same oracle SQL); smaller nprobe trades recall
    * for build cost on the q52 recall curve. */
  def hardNegativesIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 8, nprobe: Int = 1, iters: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCells)
    val cents = kmeansCentroids(corpus, nCells, iters)
    val cent = centroidsDf(corpus.sparkSession, cents)
    val c = assignCells(corpus, cent, 1, extra = Seq("label")).as("c")
    val q = assignCells(queries, cent, nprobe, extra = Seq("label")).as("q")
    // a (query, neighbor) pair can surface at most once: the neighbor
    // lives in exactly one cell, matched by at most one of the query's
    // probes — no distinct needed (the annIvf argument)
    val scored = c.join(broadcast(q),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id") &&
          col("q.label") =!= col("c.label"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding"), col("q.nrm"), col("c.nrm"))
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** SEMANTIC decontamination (the embedding-space complement to the
    * n-gram Dedup.decontaminate — catches paraphrased/translated
    * benchmark leakage that shares no exact grams): flag every corpus
    * vector whose max cosine against ANY benchmark vector reaches
    * `threshold`; also returns that max for threshold tuning. The
    * benchmark set is small by nature → broadcast; the corpus is
    * scanned once, never shuffled (the verdict aggregate is map-combined
    * per vector). Scale path: the same verdict over LSH/IVF candidates
    * (compose annLsh/annIvf with the max-aggregate) when the benchmark
    * outgrows a broadcast — this exact form is their recall oracle. */
  def semanticContamination(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double): DataFrame = {
    val c = withNorm(corpus).as("c")
    val b = withNorm(benchmark).as("b")
    c.join(broadcast(b))
      .select(col("c.vec_id").as("vec_id"),
        cosine(col("c.embedding"), col("b.embedding"), col("c.nrm"), col("b.nrm"))
          .as("__cos"))
      .groupBy(col("vec_id"))
      .agg(max(col("__cos")).as("max_cos"))
      .select(col("vec_id"), col("max_cos"),
        (col("max_cos") >= lit(threshold)).as("contaminated"))
  }

  /** Label purity per trained cell (quantizer QA against ground truth —
    * does the geometry recover the labeling?): per cell, its size, the
    * majority label (ties to the LOWEST label — deterministic), that
    * label's count, and the purity fraction. Deliberately LOG-FREE
    * (majority fraction, not entropy: ln() carries no cross-engine bit
    * guarantee — the q113 drift rationale). One broadcast-assign pass +
    * one (cell, label) aggregate + one cell-keyed argmax (struct max, no
    * per-group sort); everything after assignment runs on
    * nCells·|labels| rows. */
  def clusterPurity(corpus: DataFrame, nCells: Int = 8,
      iters: Int = 2): DataFrame = {
    val asg = cluster(corpus, nCells, iters)
      .join(corpus.select(col("vec_id"), col("label")), "vec_id")
    val counts = asg.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col("cell"))
      .agg(sum(col("__c")).as("n"),
        max(struct(col("__c").as("c"), (-col("label")).cast("long").as("negl")))
          .as("__b"))
      .select(col("cell"), col("n").cast("long").as("n"),
        (-col("__b.negl")).cast("int").as("majority_label"),
        col("__b.c").as("majority_n"),
        (col("__b.c").cast("double") / col("n").cast("double")).as("purity"))
  }

  /** Symmetric int8 embedding quantization (the storage path for a
    * 100 TB embedding corpus — 4 bytes/dim down to 1, plus one scale per
    * vector): q_i = round(x_i / scale · 127) with scale = max|x_i|, the
    * standard absmax scheme; all-zero vectors quantize to zeros with
    * scale 0. ENTIRELY map-side — the per-vector scale is an array fold
    * inside the same projection, so the plan has zero exchanges and
    * quantizing N vectors is embarrassingly parallel. Emitted one row
    * per element (vec_id, i, scale, q): element rows gate exactly
    * cross-engine, where an array column's rendering would not.
    * Reconstruction error is bounded by scale/254 per element
    * (spec-pinned). Cross-engine exactness: float→double casts are
    * exact, /·· is one left-associated IEEE sequence mirrored verbatim,
    * and both engines' round() is half-away-from-zero. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val scale = aggregate(col("embedding"), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    emb.select(col("vec_id"), scale.as("scale"),
        posexplode(col("embedding")).as(Seq("__i", "__v")))
      .select(col("vec_id"), (col("__i") + 1).cast("int").as("i"),
        col("scale"),
        when(col("scale") === lit(0.0), lit(0L))
          .otherwise(round(col("__v").cast("double") / col("scale") * lit(127.0))
            .cast("long")).as("q"))
  }

  /** Unit-L2 normalization — the preprocessing step that turns every
    * cosine downstream (ANN, SemDeDup, hard negatives) into a plain dot
    * product, paid ONCE per corpus instead of per pair. Entirely
    * map-side like [[quantizeInt8]]: the norm is the codegen'd
    * vec_dot(v, v) left-to-right fold inside the projection (the same
    * fold order the dot-product oracles pin with SUM(v*v ORDER BY i)),
    * zero exchanges. Emitted per element so the gate compares exactly;
    * zero-norm vectors yield NULL components (no ±inf/NaN), norm 0
    * kept alongside for the caller's filter. */
  def normalizeL2(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), norm(col("embedding")).as("nrm"),
        posexplode(col("embedding")).as(Seq("__i", "__v")))
      .select(col("vec_id"), (col("__i") + 1).cast("int").as("i"),
        col("nrm"),
        when(col("nrm") === lit(0.0), lit(null).cast("double"))
          .otherwise(col("__v").cast("double") / col("nrm")).as("x"))

  /** SemDeDup (semantic dedup via embedding clustering, Abbas et al.
    * 2023, arXiv:2303.09540): k-means-cluster the corpus, then within
    * each cell drop every vector with a higher-priority near-twin
    * (cosine >= threshold). Priority is deterministic lowest-vec_id —
    * the paper elects low-centroid-distance representatives, but any
    * fixed total order yields the same dedup RATE, and the id order is
    * reproducible cross-engine (same deviation q61 makes for text
    * near-dups). Returns the full verdict relation (vec_id, cell, keep).
    *
    * Scale shape: quantizer train + assignment is [[cluster]]'s
    * broadcast pass (the corpus is never shuffled to be assigned); the
    * pairwise stage is an equi-join keyed by cell, so candidate volume
    * is Σ|cell|² — the paper's own design point: nCells is sized so
    * cells stay ~N/nCells small (their k ≈ 0.1%·N), cells verify in
    * parallel, and the codegen'd VecDot keeps the verify CPU-bound, not
    * allocation-bound. Verdicts come from one distinct + one
    * vec_id-keyed left join, both linear in output. */
  def semDedup(emb: DataFrame, nCells: Int, threshold: Double,
      iters: Int = 2, superProbe: Option[Int] = None): DataFrame = {
    val asg = graft.util.RelCache.persist(
      cluster(emb, nCells, iters, superProbe).join(withNorm(emb), "vec_id")
        .select(col("vec_id"), col("cell"), col("embedding"), col("nrm")))
    val dropped = asg.as("a").join(asg.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding"),
        col("a.nrm"), col("b.nrm")) >= lit(threshold))
      .select(col("b.vec_id").as("vec_id")).distinct()
    asg.select(col("vec_id"), col("cell"))
      .join(dropped.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("__dup").isNull.as("keep"))
  }

  /** Bucket xors for every flip of up to `radius` of `bits` bits (the
    * multi-probe sequence; radius 2 and bits 16 -> 137 probes). */
  private[graft] def probeFlips(bits: Int, radius: Int): Seq[Long] = {
    def combos(from: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (from until bits).flatMap(j => combos(j + 1, left - 1).map(_ | (1L << j)))
    (0 to radius).flatMap(r => combos(0, r))
  }

  /** LSH-bucketed ANN: `tables` independent sign-LSH tables of `bits`
    * hyperplanes each (OR-construction), candidates = corpus vectors
    * sharing any table bucket with a query probe (the query probes every
    * bucket within hamming `probeHamming` of its own), then exact cosine
    * top-k over the deduplicated candidates.
    *
    * Scale shape: the corpus is bucketed once (`tables` rows per vector —
    * linear), probes are expanded on the broadcast-small QUERY side only,
    * and per-(table, bucket) candidate volume is corpus/2^bits per table —
    * with bits=16 that is a 65,536-way split per table, the knob the 8-bit
    * single-table revision lacked. Recall at a given neighbor cosine:
    * per-table catch sum_{i<=probeHamming} C(bits,i) p^(bits-i) (1-p)^i
    * with p = 1 - theta/pi, OR'd over tables; measured against
    * bruteForceTopK in SURVEY §6.
    *
    * CENTERING GUARD: a single-signed corpus (all coordinates one sign
    * — some encoder models) hashes EVERY vector into the all-ones
    * bucket per table, collapsing the split and cratering recall (the
    * graphSearch centering caveat; measured 0.95 → 0.05 uncentered).
    * `signGuard` (default on) runs one tiny aggregate over a
    * deterministic ~1% corpus sample and LOGS a warning when the
    * sampled positive-coordinate fraction is outside [0.05, 0.95] —
    * log-only (results unchanged), so production pipelines get told to
    * [[centerEmbeddings]] first instead of silently losing recall. */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int, tables: Int = 4,
      bits: Int = 16, probeHamming: Int = 2,
      signGuard: Boolean = true): DataFrame = {
    // the guard is one eager sampled aggregate — memoized per
    // (session, corpus plan, hashed width) so repeated searches over one
    // corpus pay it once (the capDecisions discipline), and skipped for
    // a streaming corpus (no eager job is legal there; the batch gates
    // carry the guard for the shared geometry)
    if (signGuard && !corpus.isStreaming) {
      val d = tables * bits
      val guardKey = ("annLshGuard",
        System.identityHashCode(corpus.sparkSession),
        corpus.queryExecution.analyzed.canonicalized, d)
      graft.util.SingleFlight(signGuardDecisions, guardKey) {
        val frac = corpus
          .filter(pmod(hash(col("vec_id")), lit(101)) === 0 &&
            col("embedding").isNotNull && size(col("embedding")) > 0)
          .select(avg(expr(
            s"""aggregate(slice(embedding, 1, $d), 0.0D,
               |  (a, x) -> a + CASE WHEN x > 0.0 THEN 1.0D ELSE 0.0D END)
               |  / least(size(embedding), $d)""".stripMargin
              .replaceAll("\n", " "))).as("f"))
          .collect()(0)
        if (frac.isNullAt(0)) java.lang.Double.valueOf(0.5)
        else java.lang.Double.valueOf(frac.getDouble(0))
      } match {
        case f if f > 0.95 || f < 0.05 => logWarning(
          f"annLsh sign guard: sampled positive-coordinate fraction ${f.doubleValue()}%.3f" +
            " — a single-signed corpus collapses sign-LSH buckets and " +
            "craters recall; center the embeddings first " +
            "(Similarity.centerEmbeddings)")
        case _ => ()
      }
    }
    // buckets carry ONLY (vec_id, tbl, bucket): candidates are id pairs,
    // embeddings rejoin at scoring time — the corpus-side bucket relation
    // shrinks from embedding-sized to ~24 B/row, making it cheap to pin
    // (searchers over one corpus — q342's recall gate and q352's MRR
    // gate, or repeated bench passes — share ONE bucketing scan)
    def bucketed(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            lshTableBucket(col("embedding"), t, bits).as("bucket"))): _*)).as("tb"))
        .select(col("vec_id"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val c =
      if (corpus.isStreaming) withNorm(corpus)
      else graft.util.RelCache.persist(withNorm(corpus))
    val q = withNorm(queries)
    val cb =
      if (corpus.isStreaming) bucketed(corpus)
      else graft.util.RelCache.persist(bucketed(corpus))
    val qb = bucketed(queries)
    val qprobes = qb.select(col("vec_id"), col("tbl"),
      explode(array(probeFlips(bits, probeHamming).map(f =>
        col("bucket").bitwiseXOR(lit(f))): _*)).as("pb"))
    // distinct BEFORE scoring: a (query, neighbor) pair found by several
    // tables/probes must be scored once or top-k would emit duplicates
    val cand0 = cb.as("c").join(broadcast(qprobes.as("q")),
        col("q.tbl") === col("c.tbl") && col("q.pb") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .distinct()
    val scored0 = cand0
      .join(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"), col("nrm").as("qn"))), "query_id")
      .join(c.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("nrm").as("nn")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ne"), col("qn"), col("nn")).as("cosine"))
    // the probe join (tables·C(bits,≤h) probe buckets against the
    // corpus bucket relation) and the candidate-cosine verify are the
    // searcher's heavy passes; their output is |Q|·candidates scored
    // pairs — pinned so the gates sharing one search geometry (q342's
    // recall floor and q352's MRR floor rank the SAME scored
    // candidates) and repeated searches pay both passes once
    val scored =
      if (corpus.isStreaming || queries.isStreaming) scored0
      else graft.util.RelCache.persist(scored0)
    rankTopK(scored, k)
  }

  /** Per-label embedding centroid shift between two snapshots — the
    * embedding-space drift monitor (did re-encoding or a corpus drop
    * move class centers?): for each label present in BOTH snapshots,
    * the L2 distance between the old and new mean vectors, plus both
    * member counts. The [[graft.pipeline.Dedup.snapshotDiff]]
    * companion for the vector column. Cross-engine bit-exactness:
    * components quantize to floor(v·1e7) integers summed EXACTLY in
    * DECIMAL(38,0)/HUGEINT (the q189 convention; float→double is
    * always exact), each per-dimension centroid delta is two IEEE
    * divisions and one subtract on bit-identical operands, squares
    * fold in DIMENSION order, and the final sqrt/1e7 are two more
    * correctly-rounded ops. The DECIMAL→DOUBLE cast stays exact while
    * |Σq| < 2^53 ≈ n·|v|·1e7 at 9e15 — fine to ~1e8 unit-scale vectors
    * per (label, dim); beyond that, pre-divide the quantized sums.
    *
    * Scale shape: per-dimension explode (rows × dim, the unavoidable
    * cost of exact per-dimension sums) → ONE map-combinable
    * (label, dim) aggregate per snapshot, equi-joined label-keyed —
    * the joined relation is |labels|·dim rows, microscopic; the final
    * fold groups it by label. Corpora never join each other
    * row-to-row. */
  def centroidShift(nw: DataFrame, old: DataFrame): DataFrame = {
    def sums(df: DataFrame, s: String, n: String): DataFrame = df
      .filter(col("embedding").isNotNull)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "__v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(floor(col("__v").cast("double") * lit(1.0e7))
        .cast("decimal(38,0)")).as(s), count(lit(1)).as(n))
    val d = col(s"__sN").cast("double") / col("__nN").cast("double") -
      col(s"__sO").cast("double") / col("__nO").cast("double")
    sums(nw, "__sN", "__nN").join(sums(old, "__sO", "__nO"), Seq("label", "dim"))
      .select(col("label"), col("dim"), col("__nN"), col("__nO"), (d * d).as("__d2"))
      .groupBy(col("label"))
      .agg(max(col("__nO")).as("n_old"), max(col("__nN")).as("n_new"),
        sort_array(collect_list(struct(col("dim"), col("__d2")))).as("__a"))
      .select(col("label"), col("n_old"), col("n_new"),
        (sqrt(aggregate(col("__a"), lit(0.0),
          (acc, x) => acc + x.getField("__d2"))) / lit(1.0e7)).as("shift"))
  }

  /** Product-quantization codes (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split every embedding
    * into `m` contiguous subvectors, train an independent `k`-codeword
    * codebook per subspace (L2 Lloyd — PQ's metric is Euclidean per
    * subspace, unlike the IVF coarse quantizer's cosine), and emit each
    * vector's nearest codeword per subspace: (vec_id, subspace, code).
    * dim/m·log2(k) bits per vector instead of dim·32 — the memory-bound
    * regime where 100 TB of raw embeddings become ~1 TB of codes that
    * asymmetric-distance scans read instead of the vectors.
    *
    * Training mirrors [[kmeansCentroids]]' discipline with the ':pq'
    * hash-rank sample (k·8 vectors, bounded driver work): init = first
    * k subvectors in hash order, assignment by MIN squared L2 with ties
    * to the lowest code (ORDER BY d2 ASC, cent_id — NaN greatest in
    * both engines), per-dimension means decimal-exact (the Dec
    * accumulation), empty codes keep their previous codeword. The
    * assignment distance is the codegen'd [[graft.functions.VecL2FD]]
    * slice fold — subtract, square, add per element in j order,
    * bit-identical to SUM((v−cv)² ORDER BY j).
    *
    * Scale shape: the codebook is m·k rows and BROADCAST; encoding is a
    * map-side join + one map-combinable min(struct(d2, code)) aggregate
    * keyed by (vec_id, subspace) — partial aggregation collapses the
    * m·k scored rows per vector to m before the shuffle, and the corpus
    * itself is never shuffled. No windows. */
  def pqEncode(corpus: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = pqCodebook(corpus, m, k, iters)
    if (codebook.isEmpty)
      return Seq.empty[(Long, Int, Long)].toDF("vec_id", "subspace", "code")
    pqEncodeWith(corpus, codebook, m)
  }

  /** Encode against an already-trained codebook (shared by
    * [[pqEncode]] and [[pqSearch]] so one training run serves both). */
  private def pqEncodeWith(corpus: DataFrame,
      codebook: Seq[(Int, Long, Array[Double])], m: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sub = codebook.head._3.length
    val cb = codebook.map { case (ss, cid, c) => (ss, cid, c.toSeq) }
      .toDF("__ss", "__cid", "__cvec")
    // one scored projection per subspace (the offset is a plan constant),
    // unioned — each branch is map-side against the broadcast codebook
    val scored = (0 until m).map { ss =>
      corpus.select(col("vec_id"), col("embedding"))
        .join(broadcast(cb.filter(col("__ss") === ss)))
        .select(col("vec_id"), col("__ss"), col("__cid"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__cvec"), ss * sub).as("__d2"))
    }.reduce(_ unionAll _)
    scored.groupBy(col("vec_id"), col("__ss"))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__b"))
      .select(col("vec_id"), col("__ss").cast("int").as("subspace"),
        col("__b.__cid").as("code"))
  }

  /** Exact squared-L2 top-k (the Euclidean companion of
    * [[bruteForceTopK]]'s cosine): every query against every corpus
    * vector, ranked by d2 ASC with ties to the lowest neighbor_id. The
    * query side is SMALL and broadcast (its embedding pre-cast to
    * double once per query row); the corpus — the 100 TB side — is
    * never shuffled, and the rank-k runs through the bounded-heap
    * TopKByScore on the NEGATED distance (max-heap ↔ min distance). */
  def bruteForceL2TopK(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val q = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("__qv"))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.VecL2FD.vec_l2_fd(
          col("embedding"), col("__qv"), 0).as("__d2"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(
        -col("__d2"), col("vec_id"), k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__p", "__x")))
      .select(col("query_id"), col("__x.id").as("neighbor_id"),
        (-col("__x.score")).as("d2"),
        (col("__p") + lit(1)).cast("int").as("rank"))
  }

  /** PQ asymmetric-distance search (ADC, Jégou et al. 2011 §IV): the
    * companion of [[pqEncode]] that proves the codes are USABLE — each
    * query's approximate distance to vector v is Σ_ss LUT[ss][code(v,
    * ss)], where the lookup table holds the query subvector's exact d2
    * to every codeword. The scan reads the m-codes relation, never the
    * raw vectors: the memory-bound regime PQ exists for.
    *
    * Scale shape: codebook trains once (driver-bounded); the corpus is
    * encoded in [[pqEncodeWith]]'s broadcast pass; the |Q|·m·k LUT is
    * tiny and BROADCAST, so scoring is a map-side equi-join on
    * (subspace, code) + one map-combinable per-(query, vector) fold of
    * m terms in subspace order + the bounded-heap rank-k. The corpus
    * is never shuffled; no windows.
    *
    * Deliberately approximate (quantization error) — gate with
    * [[graft.pipeline.Contracts.annRecallContract]] against
    * [[bruteForceL2TopK]], the q163/q164 discipline.
    *
    * `rerank > 0` adds the production tail (IVFADC-R, Jégou et al.
    * 2011 §V): the ADC scan shortlists the top-`rerank` codes per
    * query, and only those shortlist rows read their RAW vectors for
    * an exact-L2 re-rank to k — recall recovers most of the
    * quantization loss while the full corpus is still scanned as
    * codes. The shortlist join touches |Q|·rerank raw vectors, not
    * the corpus. */
  def pqSearch(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 4,
      codes: Int = 16, iters: Int = 2, rerank: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(rerank == 0 || rerank >= k,
      s"rerank shortlist must be 0 (off) or >= k: $rerank < $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = pqCodebook(corpus, m, codes, iters)
    if (codebook.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("query_id", "neighbor_id", "approx_d2", "rank")
    val sub = codebook.head._3.length
    val cb = codebook.map { case (ss, cid, c) => (ss, cid, c.toSeq) }
      .toDF("__ss", "__cid", "__cvec")
    // codes packed to one array row per vector (pinned — the stored-on-
    // disk artifact; map-combinable min, so the pack is one small train-
    // time exchange) and the |Q|·m·k LUT folded to one map row per query:
    // the ADC scan is then a broadcast nested-loop over the packed codes
    // with the m-term fold MAP-SIDE in subspace order (the same
    // 0.0-seeded subspace-ascending IEEE sequence as the previous
    // sort_array fold) — no (query, vector, subspace) exchange at all,
    // only the bounded-heap rank-k merge (guide §2.3/§2.4).
    val enc = graft.util.RelCache.persist(
      pqEncodeWith(corpus, codebook, m)
        .groupBy(col("vec_id"))
        .agg(array((0 until m).map(ss =>
          min(when(col("subspace") === ss, col("code")))): _*).as("__codes")))
    val lut = (0 until m).map { ss =>
      queries.select(col("vec_id").as("query_id"), col("embedding"))
        .join(broadcast(cb.filter(col("__ss") === ss)))
        .select(col("query_id"), col("__ss").cast("int").as("subspace"),
          col("__cid").as("code"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__cvec"), ss * sub).as("__d2"))
    }.reduce(_ unionAll _)
    val lutMap = lut.groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(
        (col("subspace").cast("long") * lit(codes.toLong) + col("code"))
          .as("__mk"),
        col("__d2").as("__mv")))).as("__lm"))
    val summed = enc.crossJoin(broadcast(lutMap))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr(s"""aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE),
           |(acc, ss) -> acc + coalesce(element_at(__lm,
           |    CAST(ss AS BIGINT) * ${codes}L + element_at(__codes, ss + 1)),
           |  CAST(raise_error('ADC: code absent from LUT — partial or stale
           | codebook') AS DOUBLE)))"""
          .stripMargin.replaceAll("\n", " ")).as("__ad2"))
    val adc = summed.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(
        -col("__ad2"), col("vec_id"), if (rerank > 0) rerank else k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__p", "__x")))
      .select(col("query_id"), col("__x.id").as("neighbor_id"),
        (-col("__x.score")).as("approx_d2"),
        (col("__p") + lit(1)).cast("int").as("rank"))
    if (rerank == 0) adc
    else {
      val qv = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("__qv"))
      adc.select(col("query_id"), col("neighbor_id"))
        .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
          "neighbor_id")
        .join(broadcast(qv), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__qv"), 0).as("__d2"))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopKByScore.top_k(
          -col("__d2"), col("neighbor_id"), k).as("__t"))
        .select(col("query_id"), posexplode(col("__t")).as(Seq("__p", "__x")))
        .select(col("query_id"), col("__x.id").as("neighbor_id"),
          (-col("__x.score")).as("approx_d2"),
          (col("__p") + lit(1)).cast("int").as("rank"))
    }
  }

  /** PQ reconstruction-error report: per subspace, the vector count,
    * the mean assigned-codeword squared-L2 distance (the quantization
    * loss an ADC distance inherits — the number that tells you whether
    * m/k are sized right BEFORE you throw away the raw vectors) and
    * its max. Same broadcast-codebook scoring pass as [[pqEncode]];
    * the per-subspace mean goes through the floor(d2·1e9) integer
    * quantization summed in DECIMAL(38,0) (the q123/q189 convention —
    * full-precision d2 doubles are outside the string route's
    * round-trip window), max is order-free on raw doubles. */
  def pqError(corpus: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = pqCodebook(corpus, m, k, iters)
    if (codebook.isEmpty)
      return Seq.empty[(Int, Long, Double, Double)]
        .toDF("subspace", "n", "mean_d2", "max_d2")
    val sub = codebook.head._3.length
    val cb = codebook.map { case (ss, cid, c) => (ss, cid, c.toSeq) }
      .toDF("__ss", "__cid", "__cvec")
    val scored = (0 until m).map { ss =>
      corpus.select(col("vec_id"), col("embedding"))
        .join(broadcast(cb.filter(col("__ss") === ss)))
        .select(col("vec_id"), col("__ss"), col("__cid"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__cvec"), ss * sub).as("__d2"))
    }.reduce(_ unionAll _)
    scored.groupBy(col("vec_id"), col("__ss"))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__b"))
      .groupBy(col("__ss"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("__b.__d2") * lit(1.0e9)).cast("decimal(38,0)"))
          .cast("double") / lit(1.0e9) / count(lit(1)).cast("double"))
          .as("mean_d2"),
        max(col("__b.__d2")).as("max_d2"))
      .select(col("__ss").cast("int").as("subspace"), col("n"),
        col("mean_d2"), col("max_d2"))
  }

  /** IVF-PQ search (IVFADC, Jégou et al. 2011 §V): the coarse
    * quantizer's probed-cell pruning composed with PQ's memory-bound
    * codes — the production ANN shape for corpora where even the CODES
    * relation is too large to scan per query. The corpus is coarsely
    * assigned to [[kmeansCentroids]] cells; PQ encodes each vector's
    * RESIDUAL v − c(v) (residuals concentrate near 0, so the same m·k
    * budget quantizes them far tighter than raw vectors); a query
    * probes its `nprobe` nearest cells and ADC-scans ONLY the codes in
    * those cells — expected (nprobe/nCells)·N code rows per query
    * instead of N.
    *
    * The per-(cell, subspace, code) LUT entry is ||q_ss − (c_ss +
    * cw)||², computed against a COMBINED centroid+codeword table
    * (nCells·m·k rows, broadcast) — so both corpus encoding and query
    * LUT stay on the codegen'd [[graft.functions.VecL2FD]] slice-fold
    * and the corpus is never shuffled (broadcast coarse centroids,
    * broadcast combined table, map-combinable min-struct argmin and
    * bounded-heap rank-k; zero windows). `rerank` adds the exact-L2
    * tail over the |Q|·rerank shortlist only (IVFADC-R).
    *
    * Deliberately approximate twice over (cell pruning + quantization)
    * — gate with [[Contracts.annRecallContract]] against
    * [[bruteForceL2TopK]], the q163/q164/q222 discipline. */
  def ivfPqSearch(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 4, m: Int = 4, codes: Int = 16,
      iters: Int = 2, rerank: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(nprobe >= 1 && nprobe <= nCells, s"bad nprobe: $nprobe/$nCells")
    require(rerank == 0 || rerank >= k,
      s"rerank shortlist must be 0 (off) or >= k: $rerank < $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(corpus, nCells, iters)
    if (cents.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("query_id", "neighbor_id", "approx_d2", "rank")
    val codebook = residualPqCodebook(corpus, cents, m, codes)
    val dim = cents.head._2.length
    val sub = dim / m
    // combined centroid+codeword vectors: the ADC target for cell x
    // subspace x code — one broadcast relation serves corpus encoding
    // AND every query's LUT
    val combined = cents.flatMap { case (cell, cv) =>
      codebook.map { case (ss, code, cw) =>
        (cell, ss, code,
          Array.tabulate(sub)(j => cv(ss * sub + j) + cw(j)).toSeq)
      }
    }.toDF("cell", "__ss", "__code", "__cvec")
    val cent = centroidsDf(spark, cents)
    val asg = graft.util.RelCache.persist(
      assignCells(corpus, cent, 1).select(col("vec_id"),
        col("embedding"), col("cell")))
    // residual encoding: argmin_code ||v_ss - (c_ss + cw)||2 per
    // (vector, subspace), cell-keyed against the broadcast combined set,
    // then PACKED to one codes-array row per vector. The packed relation
    // is pinned (N rows of (cell, array<long>[m]) — the artifact a
    // production deployment stores on disk): the encode pass is the
    // search's dominant corpus scan, and repeated searches over one
    // trained (corpus, nCells, m, codes) index — recall gates, bench
    // passes, rerank consumers — must not re-encode; plan-keyed like the
    // assignment above (the combined table is a LocalRelation of
    // memoized training output, structurally equal across calls). Both
    // aggregates are map-combinable mins, so the pack costs two small
    // exchanges at TRAIN time and removes the (query, vector, subspace)
    // exchange from every SEARCH (guide §2.3: the previous form
    // re-grouped |probed|·m struct rows per query through a shuffle —
    // ~200 MB at the 200k gate — just to re-join m rows it had already
    // had side by side).
    val enc = graft.util.RelCache.persist((0 until m).map { ss =>
      asg.join(broadcast(combined.filter(col("__ss") === ss)), "cell")
        .select(col("vec_id"), col("cell"), col("__ss"), col("__code"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__cvec"), ss * sub).as("__d2"))
    }.reduce(_ unionAll _)
      .groupBy(col("vec_id"), col("cell"), col("__ss"))
      .agg(min(struct(col("__d2"), col("__code"))).as("__b"))
      .groupBy(col("vec_id"), col("cell"))
      .agg(array((0 until m).map(ss =>
        min(when(col("__ss") === ss, col("__b.__code")))): _*).as("__codes")))
    // query LUT: exact d2 from the query subvector to every combined
    // target in its nprobe probed cells — folded to ONE map row per
    // (query, probed cell), keyed subspace·codes + code, and broadcast
    val qasg = assignCells(queries, cent, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding"), col("cell"))
    val lut = (0 until m).map { ss =>
      qasg.join(broadcast(combined.filter(col("__ss") === ss)), "cell")
        .select(col("query_id"), col("cell"),
          col("__ss").as("subspace"), col("__code").as("code"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__cvec"), ss * sub).as("__d2"))
    }.reduce(_ unionAll _)
    val lutMap = lut.groupBy(col("query_id"), col("cell"))
      .agg(map_from_entries(collect_list(struct(
        (col("subspace").cast("long") * lit(codes.toLong) + col("code"))
          .as("__mk"),
        col("__d2").as("__mv")))).as("__lm"))
    // ADC: only packed rows in probed cells join a LUT map — the scan IS
    // the pruning; the m per-subspace terms fold MAP-SIDE in subspace
    // order (same 0.0-seeded subspace-ascending IEEE sequence as the
    // previous sort_array fold, term for term), so the only exchange
    // left in the search path is the bounded-heap rank-k merge
    val summed = enc.join(broadcast(lutMap), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr(s"""aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE),
           |(acc, ss) -> acc + coalesce(element_at(__lm,
           |    CAST(ss AS BIGINT) * ${codes}L + element_at(__codes, ss + 1)),
           |  CAST(raise_error('ADC: code absent from LUT — partial or stale
           | codebook') AS DOUBLE)))"""
          .stripMargin.replaceAll("\n", " ")).as("__ad2"))
    val adc = summed.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(
        -col("__ad2"), col("vec_id"), if (rerank > 0) rerank else k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__p", "__x")))
      .select(col("query_id"), col("__x.id").as("neighbor_id"),
        (-col("__x.score")).as("approx_d2"),
        (col("__p") + lit(1)).cast("int").as("rank"))
    if (rerank == 0) adc
    else {
      val qv = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding"), _.cast("double")).as("__qv"))
      adc.select(col("query_id"), col("neighbor_id"))
        .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
          "neighbor_id")
        .join(broadcast(qv), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.VecL2FD.vec_l2_fd(
            col("embedding"), col("__qv"), 0).as("__d2"))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopKByScore.top_k(
          -col("__d2"), col("neighbor_id"), k).as("__t"))
        .select(col("query_id"), posexplode(col("__t")).as(Seq("__p", "__x")))
        .select(col("query_id"), col("__x.id").as("neighbor_id"),
          (-col("__x.score")).as("approx_d2"),
          (col("__p") + lit(1)).cast("int").as("rank"))
    }
  }

  /** Truncated-dimension search with full-dimension rerank — the
    * adaptive-retrieval pattern for Matryoshka-style embeddings
    * (Kusupati et al. 2022; "funnel retrieval"): the shortlist scan
    * scores only the first `dPrefix` dimensions of every corpus vector
    * (a dPrefix/dim fraction of the memory bandwidth — with
    * dimension-sliced storage, of the BYTES READ), then the exact
    * full-dimension rerank touches the |Q|·rerank shortlist only. The
    * same cost split as [[pqSearch]]'s ADC+rerank with truncation
    * instead of quantization — no training step at all.
    *
    * Deliberately approximate (prefix dims must carry the signal — they
    * do for MRL-trained embeddings, and measurably for these synthetic
    * ones) — gate with [[Contracts.annRecallContract]] against
    * [[bruteForceL2TopK]], the q163/q164/q222/q229 discipline. */
  def truncatedSearch(corpus: DataFrame, queries: DataFrame, k: Int,
      dPrefix: Int, rerank: Int): DataFrame = {
    require(k > 0 && dPrefix > 0, s"bad shape: k=$k dPrefix=$dPrefix")
    require(rerank >= k, s"rerank shortlist must be >= k: $rerank < $k")
    def trunc(df: DataFrame): DataFrame = df.select(col("vec_id"),
      expr(s"slice(embedding, 1, $dPrefix)").as("embedding"))
    val shortlist = bruteForceL2TopK(trunc(corpus), trunc(queries), rerank)
    val qv = queries.select(col("vec_id").as("query_id"),
      transform(col("embedding"), _.cast("double")).as("__qv"))
    shortlist.select(col("query_id"), col("neighbor_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VecL2FD.vec_l2_fd(
          col("embedding"), col("__qv"), 0).as("__d2"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.top_k(
        -col("__d2"), col("neighbor_id"), k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__p", "__x")))
      .select(col("query_id"), col("__x.id").as("neighbor_id"),
        (-col("__x.score")).as("d2"),
        (col("__p") + lit(1)).cast("int").as("rank"))
  }

  /** Residual PQ codebook for [[ivfPqSearch]]: the [[pqCodebook]] Lloyd
    * run on coarse-assignment RESIDUALS of the ':ivfpq' hash-rank
    * sample. Driver-bounded (codes·8 vectors); coarse assignment
    * mirrors [[assignCells]]'s cosine rule (left-to-right double dot,
    * ties to the lowest cent_id) so sample residuals are computed
    * against exactly the cell the distributed path assigns. */
  private[graft] def residualPqCodebook(corpus: DataFrame,
      cents: Seq[(Long, Array[Double])], m: Int,
      k: Int): Seq[(Int, Long, Array[Double])] = {
    // memoized + single-flight like kmeansCentroids (shares pqMemo under
    // a distinct key prefix): the residual codebook keys on the corpus
    // plan AND the coarse-centroid CONTENT (centroids are training
    // output, so the plan alone does not determine the residuals)
    val key = ("ivfpq", System.identityHashCode(corpus.sparkSession),
      corpus.queryExecution.analyzed.canonicalized, m, k,
      cents.map { case (cid, v) => (cid, v.toSeq) })
    graft.util.SingleFlight(pqMemo, key)(
      trainResidualPqCodebook(corpus, cents, m, k))
  }

  private def trainResidualPqCodebook(corpus: DataFrame,
      cents: Seq[(Long, Array[Double])], m: Int,
      k: Int): Seq[(Int, Long, Array[Double])] = {
    val trainHash = conv(substring(
      md5(concat(col("vec_id").cast("string"), lit(":ivfpq"))), 1, 15), 16, 10)
      .cast("long")
    val sample: Array[Array[Float]] =
      corpus.select(col("embedding"), trainHash.as("__h"), col("vec_id"))
        .orderBy(col("__h"), col("vec_id")).limit(k * 8)
        .collect()
        .map(_.getSeq[Float](0).toArray)
    if (sample.isEmpty) return Seq.empty
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(cents.forall(_._2.length == dim),
      "centroid/embedding dimension mismatch")
    def nrmF(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    def nrmD(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    def dotFD(v: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * c(i); i += 1 }
      s
    }
    val sorted = cents.sortBy(_._1)
    val residuals: Array[Array[Double]] = sample.map { v =>
      val nv = nrmF(v)
      var bestCos = Double.NegativeInfinity
      var best: Array[Double] = sorted.head._2
      sorted.foreach { case (_, c) =>
        val cos = dotFD(v, c) / (nv * nrmD(c))
        if (java.lang.Double.compare(cos, bestCos) > 0) {
          bestCos = cos; best = c
        }
      }
      Array.tabulate(dim)(j => v(j).toDouble - best(j))
    }
    trainPqLloydD(residuals, m, k)
  }

  /** Per-subspace driver Lloyd over double vectors (the
    * [[trainPqCodebook]] arithmetic generalized to a residual sample):
    * decimal-exact per-dim means, ties to the lowest code, empty codes
    * keep their codeword, 2 refinement iterations. */
  private def trainPqLloydD(sample: Array[Array[Double]], m: Int,
      k: Int): Seq[(Int, Long, Array[Double])] = {
    import java.math.{BigDecimal => JBD, BigInteger => JBI, RoundingMode}
    val dim = sample.head.length
    val sub = dim / m
    def d2(v: Array[Double], lo: Int, c: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < sub) { val d = v(lo + j) - c(j); s += d * d; j += 1 }
      s
    }
    (0 until m).flatMap { ss =>
      val lo = ss * sub
      var cs: Array[Array[Double]] = sample.take(k).map(_.slice(lo, lo + sub))
      for (_ <- 1 to 2) {
        val assign = sample.indices.map { vi =>
          var best = -1; var bestD = 0.0
          var c = 0
          while (c < cs.length) {
            val d = d2(sample(vi), lo, cs(c))
            if (best == -1 || java.lang.Double.compare(d, bestD) < 0) {
              best = c; bestD = d
            }
            c += 1
          }
          best
        }
        cs = cs.zipWithIndex.map { case (old, cid) =>
          val members = sample.indices.filter(assign(_) == cid)
          if (members.isEmpty) old
          else Array.tabulate(sub) { j =>
            var acc = JBI.ZERO
            var valid = 0
            members.foreach { vi =>
              val x = sample(vi)(lo + j)
              if (java.lang.Double.isFinite(x)) {
                val d = new JBD(java.lang.Double.toString(x))
                  .setScale(14, RoundingMode.HALF_UP)
                if (d.precision() <= 38) {
                  acc = acc.add(d.unscaledValue()); valid += 1
                }
              }
            }
            if (valid == 0) old(j)
            else {
              val s = new JBD(acc, 14)
              val fl = s.setScale(0, RoundingMode.FLOOR)
              val exact = fl.longValueExact().toDouble +
                s.subtract(fl).movePointRight(14).longValueExact().toDouble / 1.0e14
              exact / members.length.toDouble
            }
          }
        }
      }
      cs.zipWithIndex.map { case (c, cid) => (ss, cid.toLong, c) }
    }
  }

  /** The trained PQ codebook alone: (subspace, code, codeword). Exposed
    * for the spec's exact argmin re-verification; [[pqEncode]] is the
    * operator surface. */
  private[graft] def pqCodebook(corpus: DataFrame, m: Int, k: Int,
      iters: Int): Seq[(Int, Long, Array[Double])] = {
    // memoized like kmeansCentroids (same key discipline and staleness
    // contract): encode, search and the error report over one corpus
    // share ONE training run
    val key = ("pq", System.identityHashCode(corpus.sparkSession),
      corpus.queryExecution.analyzed.canonicalized, m, k, iters)
    graft.util.SingleFlight(pqMemo, key)(trainPqCodebook(corpus, m, k, iters))
  }

  private val pqMemo =
    new java.util.LinkedHashMap[Any, Seq[(Int, Long, Array[Double])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, Seq[(Int, Long, Array[Double])]]): Boolean =
        size() > 16 // codebooks are tiny (m x k x sub doubles)
    }

  private def trainPqCodebook(corpus: DataFrame, m: Int, k: Int,
      iters: Int): Seq[(Int, Long, Array[Double])] = {
    import java.math.{BigDecimal => JBD, BigInteger => JBI, RoundingMode}
    require(m > 0 && k > 1, s"bad PQ shape: m=$m k=$k")
    val trainHash = conv(substring(
      md5(concat(col("vec_id").cast("string"), lit(":pq"))), 1, 15), 16, 10)
      .cast("long")
    val sample: Array[Array[Float]] =
      corpus.select(col("embedding"), trainHash.as("__h"), col("vec_id"))
        .orderBy(col("__h"), col("vec_id")).limit(k * 8)
        .collect()
        .map(_.getSeq[Float](0).toArray)
    if (sample.isEmpty) return Seq.empty
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(sample.forall(_.length == dim),
      s"pq: ragged embedding lengths in the training sample (dim $dim)")
    val sub = dim / m
    def d2(v: Array[Float], lo: Int, c: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < sub) {
        val d = v(lo + j).toDouble - c(j); s += d * d; j += 1
      }
      s
    }
    // per-subspace independent Lloyd on the shared sample
    val codebook: Seq[(Int, Long, Array[Double])] = (0 until m).flatMap { ss =>
      val lo = ss * sub
      var cents: Array[Array[Double]] =
        sample.take(k).map(_.slice(lo, lo + sub).map(_.toDouble))
      for (_ <- 1 to iters) {
        val assign = sample.indices.map { vi =>
          var best = -1; var bestD = 0.0
          var c = 0
          while (c < cents.length) {
            val d = d2(sample(vi), lo, cents(c))
            if (best == -1 || java.lang.Double.compare(d, bestD) < 0) {
              best = c; bestD = d
            }
            c += 1
          }
          best
        }
        cents = cents.zipWithIndex.map { case (old, cid) =>
          val members = sample.indices.filter(assign(_) == cid)
          if (members.isEmpty) old
          else Array.tabulate(sub) { j =>
            // the kmeansCentroids decimal-mean mirror (oracle: SUM(
            // TRY_CAST(...DECIMAL(38,14))) / COUNT(*)): skipped
            // non-castable elements, COUNT(*) denominator, NULL mean
            // COALESCEs to the previous codeword value
            var acc = JBI.ZERO
            var valid = 0
            members.foreach { vi =>
              val x = sample(vi)(lo + j).toDouble
              if (java.lang.Double.isFinite(x)) {
                val d = new JBD(java.lang.Double.toString(x))
                  .setScale(14, RoundingMode.HALF_UP)
                if (d.precision() <= 38) {
                  acc = acc.add(d.unscaledValue()); valid += 1
                }
              }
            }
            if (valid == 0) old(j)
            else {
              val s = new JBD(acc, 14)
              val fl = s.setScale(0, RoundingMode.FLOOR)
              val exact = fl.longValueExact().toDouble +
                s.subtract(fl).movePointRight(14).longValueExact().toDouble / 1.0e14
              exact / members.length.toDouble
            }
          }
        }
      }
      cents.zipWithIndex.map { case (c, cid) => (ss, cid.toLong, c) }
    }
    codebook
  }

  /** Exact d×d covariance of the embedding coordinates — the input
    * every whitening / PCA step of a SemDeDup-style pipeline needs
    * (and a drift diagnostic in its own right: a collapsing covariance
    * spectrum means the encoder is degenerating). Emits the upper
    * triangle (dim_i ≤ dim_j): vector count and the population
    * covariance of the 1e-4-quantized coordinates.
    *
    * Cross-engine bit-exactness: each coordinate is floor-quantized to
    * an exact long (the centroidShift discipline), the (i,j) product
    * sums and per-dimension marginal sums are exact DECIMAL(38,0), and
    * cov = (Σqq/n − (Σqi/n)·(Σqj/n)) / 1e8 is a fixed IEEE op
    * sequence. Exactness bound: N·(1e4·max|x|)² must stay below 2^53
    * — at |x|<1 that is N < ~9e7 vectors; beyond it, pre-center the
    * coordinates (the q210 note) or lower the quantization scale.
    *
    * Scale shape: the d(d+1)/2 pair terms are generated IN-ROW (a
    * posexplode + a per-row slice — never a corpus self-join on
    * vec_id), the (i,j) aggregate is map-combinable (d²-bounded
    * groups), and the d-row marginal relation rides a broadcast join.
    * The corpus is read once and never shuffled; the only exchange
    * carries ≤ d²·partitions partial rows. */
  def embedCovariance(emb: DataFrame): DataFrame = {
    val q = emb.filter(col("embedding").isNotNull)
      .select(transform(col("embedding"),
        v => floor(v.cast("double") * lit(1.0e4)).cast("long")).as("__q"))
    val ex = q.select(posexplode(col("__q")).as(Seq("i", "__qi")), col("__q"))
    val pairs = ex.select(col("i"), col("__qi"),
        posexplode(slice(col("__q"), col("i") + lit(1),
          size(col("__q")) - col("i"))).as(Seq("__o", "__qj")))
      .groupBy(col("i").as("dim_i"), (col("i") + col("__o")).as("dim_j"))
      .agg(count(lit(1)).as("n_vecs"),
        sum((col("__qi") * col("__qj")).cast("decimal(38,0)")).as("__sxy"))
    val marg = ex.groupBy(col("i"))
      .agg(sum(col("__qi").cast("decimal(38,0)")).as("__sx"))
    val nD = col("n_vecs").cast("double")
    pairs
      .join(broadcast(marg.select(col("i").as("dim_i"), col("__sx").as("__si"))), "dim_i")
      .join(broadcast(marg.select(col("i").as("dim_j"), col("__sx").as("__sj"))), "dim_j")
      .select(col("dim_i"), col("dim_j"), col("n_vecs"),
        ((col("__sxy").cast("double") / nD -
          (col("__si").cast("double") / nD) * (col("__sj").cast("double") / nD)) /
          lit(1.0e8)).as("cov"))
  }

  /** [[embedCovariance]]'s dense-buffer SCALE PATH: the same exact
    * quantized moments accumulated by
    * [[graft.operators.CovVectorAgg]] — one Array[Long] per map task,
    * ZERO row fan-out (the declarative path explodes d(d+1)/2 pair
    * rows per vector; at d = 64 that is a 2080× fan-out the aggregate
    * eliminates, the HistVectorAgg trade) — then the identical
    * covariance arithmetic on the identical exact integers, so the
    * output is BIT-identical to [[embedCovariance]] (spec-pinned). The
    * single moment row is bins-sized (1 + d + d(d+1)/2 longs) and the
    * d²-bounded result materializes driver-side (the pcaPower
    * precedent). */
  def embedCovarianceAgg(emb: DataFrame, d: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.filter(col("embedding").isNotNull)
      .agg(graft.operators.CovVectorAgg.cov_moments(col("embedding"), d)
        .as("__m"))
      .collect()
    val m = rows.head.getSeq[Long](0).toArray
    val n = m(0)
    if (n == 0L)
      return Seq.empty[(Int, Int, Long, Double)]
        .toDF("dim_i", "dim_j", "n_vecs", "cov")
    val nD = n.toDouble
    val marg = Array.tabulate(d)(i => m(1 + i))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Double)]
    var p = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = (m(p).toDouble / nD -
          (marg(i).toDouble / nD) * (marg(j).toDouble / nD)) / 1.0e8
        out += ((i, j, n, cov))
        p += 1
        j += 1
      }
      i += 1
    }
    out.toSeq.toDF("dim_i", "dim_j", "n_vecs", "cov")
  }

  /** Top principal component of the embedding cloud by POWER ITERATION
    * over [[embedCovariance]] — the PCA step itself (SemDeDup whitening,
    * anisotropy diagnostics: one dominant direction swallowing the
    * variance means the encoder collapsed): `iters` rounds of
    * x ← quantize(C·x / ‖C·x‖∞), emitting the final loading per
    * dimension, the eigenvalue estimate (the last pre-normalization
    * L∞ norm — exact once the iterate has ‖x‖∞ = 1, which the
    * quantizer guarantees from round 1), and the explained-variance
    * share λ/tr(C).
    *
    * Cross-engine bit-exactness: the covariance entries are already
    * gated bit-exact (q246); each matrix·vector entry folds in
    * ascending j order (Scala while-loop == SUM(... ORDER BY j), both
    * sequential left folds); the L∞ norm is an order-free MAX; the
    * normalize step floor-quantizes every loading to the 1e-6 grid
    * (floor(y/m·1e6)/1e6 — identical IEEE op sequence both engines),
    * so the iterate entering each round is exactly representable and
    * identical cross-engine; the trace folds in dim order. No
    * convergence tolerance enters the contract — both engines produce
    * the SAME iterate whether or not it has converged.
    *
    * Scale shape: the corpus-sized work is [[embedCovariance]]'s
    * single never-shuffled pass; the d×d matrix (bins-sized, d ≤ a few
    * thousand) collects to the driver and the iteration is
    * driver-bounded pure arithmetic — the kmeans-Lloyd precedent. The
    * result is d rows. */
  def pcaPower(emb: DataFrame, iters: Int = 12): DataFrame = {
    require(iters >= 1, s"iters must be positive: $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    // the moments come from the dense-buffer aggregate (bit-identical
    // to the declarative covariance, 16x faster at 1M vectors — the
    // q286 measurement); the declarative path stays the gated q246
    val covRows = probeDim(emb)
      .map(d0 => embedCovarianceAgg(emb, d0).collect())
      .getOrElse(Array.empty)
    if (covRows.isEmpty)
      return Seq.empty[(Int, Double, Double, Option[Double])]
        .toDF("dim", "loading", "eigenvalue", "explained_share")
    val d = covRows.iterator.map(_.getInt(1)).max + 1
    val a = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      a(i)(j) = c; a(j)(i) = c
    }
    var x = Array.fill(d)(1.0)
    var m = 0.0
    for (_ <- 1 to iters) {
      val y = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += a(i)(j) * x(j); j += 1 }
        s
      }
      m = y.iterator.map(math.abs).max
      x = if (m > 0.0) y.map(v => math.floor(v / m * 1.0e6) / 1.0e6)
          else Array.fill(d)(0.0)
    }
    var trace = 0.0
    var i = 0
    while (i < d) { trace += a(i)(i); i += 1 }
    val share: Option[Double] = if (trace > 0.0) Some(m / trace) else None
    (0 until d).map(i => (i, x(i), m, share))
      .toDF("dim", "loading", "eigenvalue", "explained_share")
  }

  /** TOP-TWO principal components by power iteration + DEFLATION —
    * [[pcaPower]] continued one rank down (the 2-D shadow most
    * embedding-cloud visualizations and stratified-dedup grids want):
    * extract x₁ as in pcaPower, L2-normalize it (u = x₁/‖x₁‖₂ — sqrt
    * is correctly rounded IEEE, so u is deterministic), deflate
    * C' = C − λ₁·u·uᵀ, and run the same `iters` quantized rounds on
    * C'. Emits (component ∈ {0,1}, dim, loading, eigenvalue,
    * explained_share).
    *
    * Cross-engine bit-exactness: everything [[pcaPower]] pins, plus —
    * ‖x₁‖₂² folds in dim order, each deflated entry is
    * cov − (λ·uᵢ)·uⱼ in that exact association, and the second
    * iteration quantizes every round like the first. Degenerate
    * inputs (λ₁ = 0) deflate by nothing and legitimately re-find the
    * zero vector. Scale shape: [[pcaPower]]'s — one never-shuffled
    * covariance pass, d×d driver-bounded eigen math. */
  /** First non-NULL embedding's length — one limit(1) probe job. */
  private def probeDim(emb: DataFrame): Option[Int] =
    emb.filter(col("embedding").isNotNull)
      .select(size(col("embedding")).as("__d")).limit(1).collect()
      .headOption.map(_.getInt(0))

  def pcaDeflate(emb: DataFrame, iters: Int = 12): DataFrame = {
    require(iters >= 1, s"iters must be positive: $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val covRows = probeDim(emb)
      .map(d0 => embedCovarianceAgg(emb, d0).collect())
      .getOrElse(Array.empty)
    if (covRows.isEmpty)
      return Seq.empty[(Int, Int, Double, Double, Option[Double])]
        .toDF("component", "dim", "loading", "eigenvalue", "explained_share")
    val d = covRows.iterator.map(_.getInt(1)).max + 1
    val a = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      a(i)(j) = c; a(j)(i) = c
    }
    def power(m: Array[Array[Double]]): (Array[Double], Double) = {
      var x = Array.fill(d)(1.0)
      var lam = 0.0
      for (_ <- 1 to iters) {
        val y = Array.tabulate(d) { i =>
          var s = 0.0; var j = 0
          while (j < d) { s += m(i)(j) * x(j); j += 1 }
          s
        }
        lam = y.iterator.map(math.abs).max
        x = if (lam > 0.0) y.map(v => math.floor(v / lam * 1.0e6) / 1.0e6)
            else Array.fill(d)(0.0)
      }
      (x, lam)
    }
    val (x1, l1) = power(a)
    var s2 = 0.0
    var j = 0
    while (j < d) { s2 += x1(j) * x1(j); j += 1 }
    val s = math.sqrt(s2)
    val u = if (s > 0.0) x1.map(_ / s) else Array.fill(d)(0.0)
    val a2 = Array.tabulate(d, d)((i, k) => a(i)(k) - (l1 * u(i)) * u(k))
    val (x2, l2) = power(a2)
    var trace = 0.0
    var i = 0
    while (i < d) { trace += a(i)(i); i += 1 }
    def share(l: Double): Option[Double] =
      if (trace > 0.0) Some(l / trace) else None
    ((0 until d).map(i => (0, i, x1(i), l1, share(l1))) ++
      (0 until d).map(i => (1, i, x2(i), l2, share(l2))))
      .toDF("component", "dim", "loading", "eigenvalue", "explained_share")
  }

  /** "All-but-the-top" embedding postprocess (Mu & Viswanath 2018,
    * arXiv:1702.01417): remove each vector's projection onto the TOP
    * principal direction — e′ = e − (e·u)·u with u the L2-normalized
    * [[pcaPower]] component. Published fix for anisotropic embedding
    * clouds (the dominant direction is usually frequency noise;
    * removing it measurably improves cosine-similarity tasks). Long
    * format like q178: (vec_id, i (1-based), projection, x).
    *
    * Cross-engine: u is deterministic ([[pcaDeflate]]'s ordered
    * sum-of-squares + correctly-rounded sqrt over the 1e-6-grid
    * loadings), the projection is the codegen'd VecDotFD ordered fold,
    * and each coordinate is one multiply + subtract in fixed order.
    * Scale shape: the component is a literal; the pass is map-only
    * (one generator + scalar math), no join, no shuffle. */
  def removeTopComponent(emb: DataFrame, iters: Int = 12): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val comp = pcaPower(emb, iters).collect()
    if (comp.isEmpty)
      return Seq.empty[(Long, Int, Double, Double)]
        .toDF("vec_id", "i", "projection", "x")
    val x1 = comp.sortBy(_.getInt(0)).map(_.getDouble(1))
    var s2 = 0.0
    var j = 0
    while (j < x1.length) { s2 += x1(j) * x1(j); j += 1 }
    val s = math.sqrt(s2)
    val u = if (s > 0.0) x1.map(_ / s) else x1.map(_ => 0.0)
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.VecDotFD.vec_dot_fd(col("embedding"), lit(u))
          .as("projection"),
        posexplode(col("embedding")).as(Seq("__i", "__v")))
      .select(col("vec_id"), (col("__i") + 1).cast("int").as("i"),
        col("projection"),
        (col("__v").cast("double") -
          col("projection") * element_at(lit(u), col("__i") + 1)).as("x"))
  }

  /** Every vector's 2-D coordinates in the [[pcaDeflate]] plane — the
    * scatter-plot / density-grid input itself (embedding-cloud maps,
    * 2-D stratified dedup cells): (vec_id, proj0, proj1), each
    * projection the codegen'd [[graft.functions.VecDotFD]] ordered
    * fold against the corresponding component baked in as a literal.
    * Scale shape: [[pcaProject]]'s — the eigen step costs one
    * covariance pass; the projection pass is map-only inside
    * WholeStageCodegen, no join, no shuffle. */
  def pcaProject2d(emb: DataFrame, iters: Int = 12): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val comp = pcaDeflate(emb, iters).collect()
    if (comp.isEmpty)
      return Seq.empty[(Long, Double, Double)]
        .toDF("vec_id", "proj0", "proj1")
    def loadings(c: Int): Array[Double] = comp.filter(_.getInt(0) == c)
      .sortBy(_.getInt(1)).map(_.getDouble(2))
    val (x0, x1) = (loadings(0), loadings(1))
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.VecDotFD.vec_dot_fd(col("embedding"), lit(x0)).as("proj0"),
        graft.functions.VecDotFD.vec_dot_fd(col("embedding"), lit(x1)).as("proj1"))
  }

  /** Mean-CENTERING of the embedding cloud — e′ᵢ = eᵢ − μᵢ with μ the
    * per-coordinate corpus mean: the preprocessing step the sign-LSH
    * family assumes (see the [[graphSearch]] centering caveat: a
    * single-signed coordinate hashes every vector into one bucket per
    * table and the bucketed operators degenerate), and the first stage
    * of the standard embedding postprocess chain (center →
    * [[removeTopComponent]] → [[pcaWhiten]], Mu & Viswanath 2018's
    * recipe). Long format like q264: (vec_id, i (1-based), x).
    *
    * Cross-engine: per-dim values are 1e-9-floor-quantized to exact
    * longs (the embedCovariance moment convention — tiny-magnitude
    * floats overflow the DECIMAL(38,14) string route's 14 fractional
    * digits and diverge in the last ulp), summed exactly order-free
    * (bound: 1e9·|v|·n per dim must fit int64 — |v| ≤ 1 supports 9e9
    * rows), and μᵢ is the pinned CAST(sum)/1e9/n sequence; the apply is
    * one subtract per coordinate. The ≤ 1e-9 quantization of μ is the
    * documented semantics, not an accident. Scale shape: one explode +
    * the map-combinable per-dim aggregate collapsing to d rows, means
    * baked back as a plan LITERAL, apply map-only — no join, no second
    * shuffle. */
  def centerEmbeddings(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val meanRows = emb.filter(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("__i", "__v")))
      .filter(col("__v").isNotNull)
      .groupBy(col("__i"))
      .agg(sum(floor(col("__v").cast("double") * lit(1.0e9)).cast("long"))
        .as("__s"), count(lit(1)).as("__n"))
      .select(col("__i"), (col("__s").cast("double") / lit(1.0e9) /
        col("__n").cast("double")).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    if (meanRows.isEmpty)
      return Seq.empty[(Long, Int, Double)].toDF("vec_id", "i", "x")
    // DENSE positional array up to the max observed dim: a dim with zero
    // non-null values (ragged / all-NULL coordinate) must hold a NULL
    // GAP, not be compacted away — positional element_at against a
    // compacted array would apply dim j's mean to every dim > j,
    // silently diverging from the oracle's join ON m.i = e.i (whose
    // missing-dim semantics is NULL x, mirrored here).
    val means: Seq[Column] = (0 to meanRows.keys.max).map(i =>
      meanRows.get(i).fold(lit(null).cast("double"))(lit(_)))
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("__i", "__v")))
      .select(col("vec_id"), (col("__i") + 1).cast("int").as("i"),
        (col("__v").cast("double") -
          try_element_at(array(means: _*), col("__i") + 1)).as("x"))
  }

  /** PCA-WHITENED top-2 projection (the "PCA + whitening" stage of
    * retrieval/PQ pipelines, Jégou et al.; also the standard embedding
    * isotropy fix one step past [[removeTopComponent]]): per vector and
    * component c ∈ {0,1}, y_c = (e·u_c)/√λ_c with u_c the L2-normalized
    * [[pcaDeflate]] loadings — the projected cloud has unit variance
    * along each kept direction, so downstream cosine/L2 stop being
    * dominated by the anisotropic top component. Long output
    * (vec_id, component, y); a zero-variance component (λ_c ≤ 0)
    * whitens to NULL rather than dividing by zero.
    *
    * Cross-engine bit-exactness: u_c is [[pcaDeflate]]'s 1e-6-grid
    * loadings normalized by the dim-ordered sum of squares
    * (correctly-rounded sqrt), the projection is the codegen'd
    * [[graft.functions.VecDotFD]] ordered fold, and the whitening is
    * ONE IEEE divide by the correctly-rounded √λ_c — each step
    * reproducible in SQL.
    *
    * Scale shape: both components are literals baked into the plan; the
    * pass is ONE map-only corpus scan (both projections computed per
    * row, unpivoted in-row by a 2-element generator) — no join, no
    * shuffle. The eigen step costs one covariance pass. */
  def pcaWhiten(emb: DataFrame, iters: Int = 12): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val comp = pcaDeflate(emb, iters).collect()
    if (comp.isEmpty)
      return Seq.empty[(Long, Int, Option[Double])]
        .toDF("vec_id", "component", "y")
    def arm(c: Int): (Array[Double], Double) = {
      val rows = comp.filter(_.getInt(0) == c).sortBy(_.getInt(1))
      val x = rows.map(_.getDouble(2))
      val lam = rows.head.getDouble(3)
      var s2 = 0.0
      var j = 0
      while (j < x.length) { s2 += x(j) * x(j); j += 1 }
      val s = math.sqrt(s2)
      (if (s > 0.0) x.map(_ / s) else x.map(_ => 0.0), lam)
    }
    val cols = Seq(0, 1).map { c =>
      val (u, lam) = arm(c)
      val y =
        if (lam > 0.0)
          graft.functions.VecDotFD.vec_dot_fd(col("embedding"), lit(u)) /
            lit(math.sqrt(lam))
        else lit(null).cast("double")
      struct(lit(c).as("component"), y.as("y"))
    }
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), explode(array(cols: _*)).as("cy"))
      .select(col("vec_id"), col("cy.component").as("component"),
        col("cy.y").as("y"))
  }

  /** Johnson–Lindenstrauss RANDOM projection to `k` dims — the
    * DATA-INDEPENDENT dimensionality reduction beside the trained PCA
    * family (q248/q259): y_j = (e·h_j)/√k with h_j a deterministic ±1
    * hyperplane (Achlioptas 2003's database-friendly JL: ±1 entries
    * preserve pairwise distances with the same guarantee as Gaussians).
    * The 100 TB significance is exactly that NO training pass exists —
    * no covariance scan, no eigen step, no coordination: a pure
    * map-side transform any executor can apply from day one, and the
    * standard front-end that makes brute-force/LSH/IVF distance work
    * O(k) instead of O(d).
    *
    * Determinism: h(i, j) = +1 iff the first hex char of md5("i:j") is
    * even (the hashEmbed md5 convention — reproducible in any engine,
    * no RNG). Long output (vec_id, j, y).
    *
    * Cross-engine: the dot is the codegen'd [[graft.functions
    * .VecDotFD]] ordered fold against the literal sign vector, then ONE
    * IEEE multiply by the driver-computed 1/√k literal. Scale shape:
    * all k hyperplanes are plan literals; ONE map-only corpus scan with
    * an in-row k-element unpivot — no join, no shuffle, no training. */
  def jlProject(emb: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= 256, s"k out of (0,256]: $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val d0 = probeDim(emb)
    if (d0.isEmpty)
      return Seq.empty[(Long, Int, Double)].toDF("vec_id", "j", "y")
    val d = d0.get
    val inv = 1.0 / math.sqrt(k.toDouble)
    val cols = (0 until k).map { j =>
      val hj = Array.tabulate(d)(i => jlSign(i, j))
      struct(lit(j).as("j"),
        (graft.functions.VecDotFD.vec_dot_fd(col("embedding"), lit(hj)) *
          lit(inv)).as("y"))
    }
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), explode(array(cols: _*)).as("jy"))
      .select(col("vec_id"), col("jy.j").as("j"), col("jy.y").as("y"))
  }

  /** [[jlProject]] packed as an Array[Float] embedding column — the
    * drop-in reduced-dimension corpus every downstream searcher
    * (bruteForceTopK / annLsh / IVF) consumes directly. Computed
    * entirely IN-ROW (k literal-hyperplane dots into one array
    * constructor — no explode, no re-grouping shuffle); the
    * double→float cast is correctly rounded, hence deterministic. The
    * q325 recall contract measures what the 4× compression costs
    * end-to-end. */
  def jlPack(emb: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= 256, s"k out of (0,256]: $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val d0 = probeDim(emb)
    if (d0.isEmpty) return Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    val d = d0.get
    val inv = 1.0 / math.sqrt(k.toDouble)
    val ys = (0 until k).map { j =>
      val hj = Array.tabulate(d)(i => jlSign(i, j))
      (graft.functions.VecDotFD.vec_dot_fd(col("embedding"), lit(hj)) *
        lit(inv)).cast("float")
    }
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), array(ys: _*).as("embedding"))
  }

  /** Two-stage ANN through the JL sketch — shortlist in the reduced
    * space, EXACT rerank in the original (the rerank discipline of
    * IVFADC-R / q222, with [[jlPack]] as the compressor): stage 1
    * broadcasts the JL-packed queries against the JL-packed corpus
    * (dims-wide dots — the 100 TB win is stage 1 reads dims/d of the
    * bytes and needs NO training pass), keeps `shortlist` candidates
    * per query by the bounded heap; stage 2 reads full-dim vectors for
    * the |Q|·shortlist candidate rows ONLY and exact-cosine re-ranks
    * to k. Deterministic end-to-end ([[jlSign]] hyperplanes,
    * correctly-rounded float casts, (cosine desc, id asc) heaps).
    * Output: (query_id, neighbor_id, cosine, rank) with EXACT cosines —
    * approximation only costs recall, never score fidelity. */
  def jlSearchTopK(emb: DataFrame, queries: DataFrame, k: Int, dims: Int,
      shortlist: Int): DataFrame = {
    require(k > 0 && shortlist >= k,
      s"bad jlSearchTopK shape: k=$k shortlist=$shortlist")
    // both corpus-side relations are plan-keyed-pinned: the packed
    // corpus is dims/d of the bytes (the artifact stage 1 exists to
    // read), and the full-dim norm relation is shared with every other
    // consumer of this corpus — without the pins, an LRU eviction
    // mid-session makes a repeat search re-project the whole corpus
    // (measured 1.7 s -> 38 s at 200k on a cold repeat)
    val short = bruteForceTopK(
        graft.util.RelCache.persist(jlPack(emb, dims)),
        jlPack(queries, dims), shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val n = graft.util.RelCache.persist(withNorm(emb))
    val q = withNorm(queries)
    val scored = short
      .join(n.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__eb"), col("nrm").as("__nb")), "neighbor_id")
      .join(broadcast(q.select(col("vec_id").as("query_id"),
        col("embedding").as("__ea"), col("nrm").as("__na"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__ea"), col("__eb"), col("__na"), col("__nb")).as("cosine"))
    rankTopK(scored, k)
  }

  /** The [[jlProject]] hyperplane entry: +1 iff the first hex char of
    * md5("i:j") is even — byte-identical to the SQL
    * ('0x' || substr(md5(i || ':' || j), 1, 1))::BIGINT % 2 = 0. */
  private[graft] def jlSign(i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    if ((((h(0) >> 4) & 0xF) % 2) == 0) 1.0 else -1.0
  }

  /** Every vector's score along the [[pcaPower]] top component — the
    * 1-D shadow of the embedding cloud that stratified semantic dedup /
    * curriculum bucketing actually consumes (and the cheapest "which
    * docs sit in the collapsed direction?" drill-down). One row per
    * non-NULL vector: (vec_id, projection = Σ_j e_j·x_j).
    *
    * Cross-engine bit-exactness: the loadings are the gated 1e-6-grid
    * doubles (q248), and the projection is the codegen'd
    * [[graft.functions.VecDotFD]] left fold — bit-identical to
    * SUM(CAST(e[j] AS DOUBLE)·x_j ORDER BY j) from 0.0.
    *
    * Scale shape: the component fits in a literal array (d doubles)
    * baked into the plan — the projection pass is map-only over the
    * corpus, inside WholeStageCodegen, no join, no shuffle. The eigen
    * step's cost is [[pcaPower]]'s (one covariance pass). */
  def pcaProject(emb: DataFrame, iters: Int = 12): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val comp = pcaPower(emb, iters).collect()
    if (comp.isEmpty)
      return Seq.empty[(Long, Double)].toDF("vec_id", "projection")
    val x = comp.sortBy(_.getInt(0)).map(_.getDouble(1))
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.VecDotFD.vec_dot_fd(col("embedding"),
          lit(x)).as("projection"))
  }

  /** NDCG@k of the LSH ANN ranking against exact brute-force cosine —
    * the RANK-AWARE retrieval QA beside the recall contracts
    * (q163/q164 count how many true neighbors come back; NDCG scores
    * WHERE they land — an ANN that returns all five true neighbors in
    * reverse order passes recall and fails ranking): graded relevance
    * of a returned neighbor = k+1−its exact rank (0 if outside the
    * exact top-k), DCG = Σ rel/ln(rank+1) in rank order, IDCG the same
    * sum over the ideal (exact) ordering, NDCG = DCG/IDCG per query.
    * A query the ANN returns nothing for scores 0, not absent.
    *
    * Cross-engine: relevance gains are exact longs; each ln is
    * 1e-9-quantized (natural log — the base cancels in no ratio but
    * both engines use the same one); per-query folds run in rank
    * order. Scale shape: both rankings are the existing broadcast +
    * bounded-heap operators; everything after is k-rows-per-query. */
  def ndcgAnn(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 4, bits: Int = 16, probeHamming: Int = 2): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
    val approx = annLsh(corpus, queries, k, tables, bits, probeHamming)
    def qlnDen(r: Column): Column =
      floor(log(r.cast("double") + lit(1.0)) * lit(1.0e9)) / lit(1.0e9)
    val rel = exact.select(col("query_id"), col("neighbor_id"),
      (lit(k + 1L) - col("rank").cast("long")).as("__rel"))
    val gains = approx.join(rel, Seq("query_id", "neighbor_id"), "left")
      .na.fill(0L, Seq("__rel"))
      .select(col("query_id"), col("rank"),
        (col("__rel").cast("double") / qlnDen(col("rank"))).as("__t"))
    def foldByQuery(df: DataFrame, out: String): DataFrame =
      df.groupBy(col("query_id"))
        .agg(sort_array(collect_list(struct(col("rank").as("k"),
          col("__t").as("t")))).as("__arr"))
        .select(col("query_id"),
          aggregate(col("__arr"), lit(0.0),
            (a, x) => a + x.getField("t")).as(out))
    val dcg = foldByQuery(gains, "dcg")
    val ideal = exact.select(col("query_id"), col("rank"),
      ((lit(k + 1L) - col("rank").cast("long")).cast("double") /
        qlnDen(col("rank"))).as("__t"))
    val idcg = foldByQuery(ideal, "idcg")
    idcg.join(dcg, Seq("query_id"), "left")
      .na.fill(0.0, Seq("dcg"))
      .select(col("query_id"), col("dcg"), col("idcg"),
        (col("dcg") / col("idcg")).as("ndcg"))
  }

  /** k-NN majority-vote CLASSIFICATION over the embedding space — the
    * label-quality probe beside cluster purity (q156 asks "do k-means
    * cells agree with labels?"; kNN accuracy asks the sharper local
    * question: "does a vector's neighborhood predict its label?" — the
    * standard embedding-quality eval, and the leave-one-out form since
    * [[bruteForceTopK]] excludes the query itself): per query, the
    * majority label among its k exact nearest neighbors (ties → most
    * votes, then smallest label — an argmax struct-min, NO per-group
    * sort or window), emitted beside the true label and the verdict.
    * Scale shape: the broadcast + bounded-heap top-k, one
    * neighbor-keyed label join, two k-bounded per-query aggregates. */
  def knnClassify(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val topk = bruteForceTopK(corpus.select(col("vec_id"), col("embedding")),
      queries.select(col("vec_id"), col("embedding")), k)
    val votes = topk.join(corpus.select(col("vec_id").as("neighbor_id"),
        col("label").as("__nl")), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__nl")).agg(count(lit(1)).as("__c"))
    val pred = votes.groupBy(col("query_id"))
      .agg(min(struct((-col("__c")).as("nc"), col("__nl").as("l"))).as("__m"))
      .select(col("query_id"), col("__m.l").as("predicted"))
    pred.join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("label"))), Seq("query_id"))
      .select(col("query_id"), col("label"), col("predicted"),
        (col("label") === col("predicted")).as("correct"))
  }

  /** GRID-DENSITY clustering (DBSCAN-lite) over a 2-D slice of the
    * embedding space — the corpus-map complement of k-means (q90):
    * k-means imposes k convex cells; density clustering finds however
    * many arbitrarily-shaped dense REGIONS exist and leaves sparse
    * cells unlabeled (noise), which is what "what modes does this
    * corpus have?" actually asks. Standard grid formulation (the
    * CLIQUE/STING family): auto-ranged n×n histogram over two
    * embedding coordinates, cells with count ≥ minCount are dense,
    * dense cells sharing an edge or corner connect, connected
    * components (lowest-cell-id label — the [[Dedup.components]]
    * convention) are the clusters. Emits every OCCUPIED cell:
    * (ci, cj, cnt, is_dense, cluster — NULL for sparse cells).
    *
    * Scale shape: ONE map-combinable groupBy collapses the corpus to
    * ≤ n² cells; everything after (dense filter, 8-neighbor equi-join,
    * label propagation) runs on that n²-bounded relation — the
    * histogram convention, bounded by construction, never by data.
    * Cross-engine: the auto-range bin index is the q02 formula
    * (min/max broadcast, LEAST(floor, n−1) clamp, flat range → cell
    * 0); counts exact; the component labels are deterministic min-ids
    * (oracle: recursive-CTE transitive closure over the same cells). */
  def gridDensityClusters(emb: DataFrame, dimX: Int = 1, dimY: Int = 2,
      n: Int = 16, minCount: Long = 5L): DataFrame = {
    require(n > 0 && minCount > 0)
    val x = element_at(col("embedding"), dimX).cast("double")
    val y = element_at(col("embedding"), dimY).cast("double")
    val pts = emb.filter(col("embedding").isNotNull &&
        size(col("embedding")) >= math.max(dimX, dimY))
      .select(x.as("__x"), y.as("__y"))
    val rng = pts.agg(min(col("__x")).as("__lox"), max(col("__x")).as("__hix"),
      min(col("__y")).as("__loy"), max(col("__y")).as("__hiy"))
    def idx(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        least(floor((v - lo) / (hi - lo) * lit(n.toDouble)).cast("long"),
          lit(n.toLong - 1L)))
    val cells = pts.crossJoin(broadcast(rng))
      .select(idx(col("__x"), col("__lox"), col("__hix")).as("ci"),
        idx(col("__y"), col("__loy"), col("__hiy")).as("cj"))
      .groupBy(col("ci"), col("cj")).agg(count(lit(1)).as("cnt"))
    // the dense-cell graph is <= n^2 NODES BY CONSTRUCTION (metadata-
    // sized, like a bins table — bounded by the grid, never by data):
    // label it with one driver-side union-find instead of the iterative
    // Dedup.components loop, whose log-diameter SPARK ROUNDS cost real
    // wall for a graph this small (measured 20 s -> sub-second at sf0.1)
    val denseCells = cells.filter(col("cnt") >= minCount)
      .select(col("ci"), col("cj")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val id = denseCells.map { case (ci, cj) => (ci, cj) -> (ci * n + cj) }.toMap
    val parent = scala.collection.mutable.Map(id.values.map(v => v -> v).toSeq: _*)
    def find(v: Long): Long = {
      var r = v
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    for ((ci, cj) <- denseCells; di <- -1L to 1L; dj <- -1L to 1L
         if (di, dj) != ((0L, 0L))) {
      id.get((ci + di, cj + dj)).foreach { nb =>
        val (ra, rb) = (find(id((ci, cj))), find(nb))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val spark = emb.sparkSession
    import spark.implicits._
    val labels = id.values.toSeq.map(v => (v, find(v))).toDF("__id", "cluster")
    cells.withColumn("__id",
        when(col("cnt") >= minCount, col("ci") * lit(n.toLong) + col("cj"))
          .otherwise(lit(null).cast("long")))
      .join(broadcast(labels), Seq("__id"), "left")
      .select(col("ci"), col("cj"), col("cnt"),
        col("__id").isNotNull.as("is_dense"), col("cluster"))
  }

  /** MATRYOSHKA truncation audit (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): for each prefix length d in `dims`, the
    * top-k recall of searching with only the FIRST d coordinates
    * against the full-dimension exact top-k — the "how small can I
    * truncate my embeddings?" curve a storage/latency budget decision
    * reads. Truncation is a zero-cost slice (MRL models front-load
    * information; for non-MRL models the curve IS the evidence they
    * don't). One row per d: (dims, n_queries, hits, expected, recall).
    *
    * Cross-engine exactness: both searches are [[bruteForceTopK]]
    * (codegen ordered-fold dots, (cosine desc, id) heap ranks), hits
    * and expected are exact longs, recall is ONE IEEE division.
    *
    * Scale shape: per d, the query side broadcasts against the corpus
    * (never shuffled) — the full-dim truth pass is shared across all
    * d. At 100 TB the truncated scans read d/D of the bytes when the
    * embedding column is stored dimension-sliced (the jlPack
    * argument); this exact form is the recall oracle for that path. */
  def matryoshkaRecall(emb: DataFrame, queries: DataFrame, k: Int,
      dims: Seq[Int]): DataFrame = {
    require(k > 0 && dims.nonEmpty && dims.forall(_ > 0),
      s"bad matryoshka shape: k=$k dims=$dims")
    val exact = graft.util.RelCache.persist(
      bruteForceTopK(emb, queries, k)
        .select(col("query_id"), col("neighbor_id")))
    def trunc(df: DataFrame, d: Int): DataFrame =
      df.filter(col("embedding").isNotNull)
        .select(col("vec_id"), expr(s"slice(embedding, 1, $d)").as("embedding"))
    dims.map { d =>
      val approx = bruteForceTopK(
        graft.util.RelCache.persist(trunc(emb, d)), trunc(queries, d), k)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(count_distinct(col("query_id")).as("n_queries"),
          sum(coalesce(col("__hit"), lit(0L))).as("hits"),
          count(lit(1)).as("expected"))
        .select(lit(d).as("dims"), col("n_queries"), col("hits"),
          col("expected"),
          (col("hits").cast("double") / col("expected").cast("double"))
            .as("recall"))
    }.reduce(_ unionAll _)
  }

  /** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein
    * 1998) — the diversity-aware top-k every retrieval/RAG stack puts
    * between ANN candidates and the context window: greedily select k
    * of the n candidates maximizing λ·rel(c) − (1−λ)·max_{s∈S}
    * sim(c, s) — high relevance, penalized by similarity to what's
    * already selected (λ=1 is plain top-k; λ→0 pure diversity). The
    * first pick is the most relevant candidate (the empty-set penalty
    * is zero for every candidate, so relevance alone decides — ties by
    * id).
    *
    * Distributed shape (the [[diversifyGraph]] discipline): candidates
    * come from ONE bounded search ([[bruteForceTopK]] here — swap in
    * any ANN searcher at corpus scale), the n² per-query candidate
    * pair cosines are scored in ONE equi-join pass and collapsed to an
    * in-row map, and the inherently sequential greedy loop runs as ONE
    * fixed-size runtime fold over in-row arrays (aggregate over
    * sequence(1, k−1); each step a bounded HOF fold over ≤ n elements)
    * — no per-query driver loop, no iterative join, no per-step driver
    * rounds: planning cost is constant in k, so k is bounded only by
    * the n ≥ k candidate budget. A candidate pair absent from the map
    * raises (inconsistent inputs), never silently skews.
    *
    * Cross-engine exactness: rel and pair sims are the pinned cosine
    * machinery; each score is two IEEE multiplies + one subtract on
    * literal λ both engines parse identically; argmax ties break by
    * id; the SQL mirror unrolls the same k stages. Output: (query_id,
    * neighbor_id, rel, mmr_rank ≤ k). */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int, n: Int,
      lam: Double): DataFrame = {
    require(k > 0 && n >= k && lam >= 0.0 && lam <= 1.0,
      s"bad mmr shape: k=$k n=$n lam=$lam")
    val lamS = java.lang.Double.toString(lam)
    val mumS = java.lang.Double.toString(1.0 - lam)
    // The candidate relation is λ-INDEPENDENT (|Q|·n rows — driver-sized),
    // so it is pinned in the plan-keyed RelCache: reranking one (corpus,
    // queries, n) under several λ (the tuning sweep, or a λ=1 ordering
    // check against the relevance-only ranking) pays the n-candidate
    // generation ONCE instead of per λ. Spark's CacheManager substitutes
    // the pinned relation into ANY plan whose subtree canonicalizes the
    // same, so a side-by-side bruteForceTopK over the same (corpus,
    // queries, n) — the q363 contract's oracle arm — shares it too.
    val cands = graft.util.RelCache.persist(bruteForceTopK(corpus, queries, n))
    val cg = cands.select(col("query_id"), col("neighbor_id"))
    val nw = graft.util.RelCache.persist(withNorm(corpus)
      .select(col("vec_id"), col("embedding"), col("nrm")))
    val pairs = cg.as("a").join(cg.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.neighbor_id") < col("b.neighbor_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.neighbor_id").as("__x"), col("b.neighbor_id").as("__y"))
      .join(nw.select(col("vec_id").as("__x"), col("embedding").as("__ex"),
        col("nrm").as("__nx")), "__x")
      .join(nw.select(col("vec_id").as("__y"), col("embedding").as("__ey"),
        col("nrm").as("__ny")), "__y")
      .select(col("query_id"), concat_ws(":", col("__x"), col("__y")).as("__k"),
        cosine(col("__ex"), col("__ey"), col("__nx"), col("__ny")).as("__c"))
    // λ-independent like cands (the n·(n−1)/2 candidate-pair cosine map,
    // |Q| rows): pinned so a multi-λ rerank builds the pair map once.
    val pm = graft.util.RelCache.persist(pairs.groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(col("__k"), col("__c"))))
        .as("__pm")))
    val cArr = cands.groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct((-col("cosine")).as("s"),
        col("neighbor_id").as("id"), col("cosine").as("rel")))).as("__c0"))
    // The ENTIRE k-1-step greedy runs as ONE fixed-size expression: a
    // fold over sequence(1, k-1) whose state is struct<sel, rem>. The
    // step lambda is applied ITERATIVELY at runtime, so expression size
    // (and planning time) is CONSTANT in k -- the previous unrolled form
    // re-embedded each step's expressions into the next and needed k-1
    // blocking driver rounds of eager localCheckpoints to stop the
    // exponential planning, a latency wall at k~50. Each step binds its
    // argmax pick once via an inner single-element aggregate (SQL's
    // LET), appends it to sel and filters it from rem; an exhausted
    // candidate list (size(rem)=0, i.e. n < k) carries the state
    // through unchanged -- the old loop's NULL-pick branch. State stays
    // |Q| rows at any corpus size; no checkpoints, no driver
    // synchronization at all.
    val step =
      s"""(st, stp) -> CASE WHEN size(st.rem) = 0 THEN st ELSE
         |  aggregate(
         |    array(aggregate(
         |      transform(st.rem, c -> named_struct(
         |        'score', $lamS * c.rel - $mumS * aggregate(st.sel,
         |          CAST(-2.0 AS DOUBLE),
         |          (m, s) -> greatest(m, coalesce(element_at(__pm,
         |            concat(least(c.id, s.id), ':', greatest(c.id, s.id))),
         |            CAST(raise_error(
         |              'mmrRerank: candidate pair absent from corpus')
         |              AS DOUBLE)))),
         |        'id', c.id, 'rel', c.rel)),
         |      CAST(NULL AS STRUCT<score: DOUBLE, id: BIGINT, rel: DOUBLE>),
         |      (best, c) -> CASE WHEN best IS NULL THEN c
         |        WHEN c.score > best.score
         |          OR (c.score = best.score AND c.id < best.id) THEN c
         |        ELSE best END)),
         |    st,
         |    (s2, p) -> named_struct(
         |      'sel', array_append(s2.sel,
         |        named_struct('id', p.id, 'rel', p.rel)),
         |      'rem', filter(s2.rem, x -> x.id != p.id)))
         |  END""".stripMargin.replaceAll("\n", " ")
    val init = "named_struct('sel', array(named_struct('id', __c0[0].id, " +
      "'rel', __c0[0].rel)), 'rem', slice(__c0, 2, size(__c0) - 1))"
    val greedy =
      if (k == 1) init
      else s"aggregate(sequence(1, ${k - 1}), $init, $step)"
    cArr.join(pm, Seq("query_id"), "left")
      .withColumn("__pm",
        coalesce(col("__pm"), expr("CAST(map() AS MAP<STRING, DOUBLE>)")))
      .withColumn("__sel", expr(s"($greedy).sel"))
      .select(col("query_id"), posexplode(col("__sel")).as(Seq("__r", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        col("__s.rel").as("rel"), (col("__r") + 1).cast("int").as("mmr_rank"))
  }
}
