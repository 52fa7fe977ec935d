package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for domain mixing: the step that turns a curated
  * corpus into a training mix with target per-source rates.
  *
  * A doc is kept iff the first 60 bits of md5(doc_id:source:salt) fall
  * below floor(rate(source) * 2^60). Pure map-side filter — no shuffle, no
  * RNG state, reproducible across runs, engines, cluster sizes and
  * partitionings (unlike DataFrame.sample, whose output depends on
  * partition layout). Changing the salt redraws the sample.
  */
object Sampling {

  private val Scale: Double = math.pow(2.0, 60)

  /** Threshold literal for a rate, computed once driver-side so both
    * engines compare against the identical integer. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0)
    math.floor(rate * Scale).toLong
  }

  /** 60-bit uniform hash of (doc_id, source, salt) as a Column. */
  def hash60(docId: Column, source: Column, salt: String): Column =
    conv(substring(md5(
      concat(docId.cast("string"), lit(":"), source, lit(":"), lit(salt))), 1, 15),
      16, 10).cast("long")

  /** Keep each doc with its source's rate (defaultRate for unlisted
    * sources). Returns the kept (doc_id, source) relation. */
  def sampleBySource(docs: DataFrame, rates: Map[String, Double],
      defaultRate: Double, salt: String): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldRight(lit(threshold(defaultRate))) {
      case ((s, r), els) => when(col("source") === lit(s), lit(threshold(r))).otherwise(els)
    }
    docs.select(col("doc_id"), col("source"))
      .filter(hash60(col("doc_id"), col("source"), salt) < thr)
  }

  /** Proportional token-budget sampling: derive each source's keep rate
    * from the data — rate = min(1, budget / total_tokens(source)) — then
    * apply the same deterministic hash-threshold filter as
    * [[sampleBySource]]. E[tokens kept per source] ≈ budget (exact-budget
    * trimming would need a per-source ordered cumsum — one reducer per
    * source — which is the wrong 100 TB shape; the hash filter is
    * map-side). Plan: one aggregation for the per-source totals (tiny
    * relation, broadcast back) + one map-side filter; the corpus is
    * scanned twice and shuffled never. Threshold arithmetic is plain IEEE
    * double division + floor, bit-identical cross-engine.
    *
    * @param tokenCounter per-doc token-count expression; default is the
    *   \S+ regex count. Pass `BpeCount.bpe_count(col("text"))` to budget
    *   on true-BPE counts — the counts training actually bills. */
  def sampleTokenBudget(docs: DataFrame, budgetTokens: Long, salt: String,
      tokenCounter: Option[Column] = None): DataFrame = {
    require(budgetTokens > 0)
    val tok = tokenCounter.getOrElse(
      regexp_count(col("text"), lit("\\S+")).cast("long"))
    val totals = docs.groupBy(col("source")).agg(sum(tok).as("__tot"))
    val thr = floor(
      least(lit(1.0), lit(budgetTokens.toDouble) / col("__tot").cast("double")) *
        lit(Scale)).cast("long")
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(totals), "source")
      .filter(hash60(col("doc_id"), col("source"), salt) < thr)
      .select(col("doc_id"), col("source"))
  }

  /** Temperature-based source mixing (the multilingual-corpus sampling
    * rule: p(source) ∝ n_source^alpha, alpha < 1 upweights small sources):
    * target per-source doc counts t_s = totalDocs * n_s^alpha / Σ n^alpha,
    * realized as keep rates r_s = min(1, t_s / n_s) through the same
    * deterministic hash-threshold filter as [[sampleBySource]]. E[kept
    * docs] ≈ totalDocs when no source saturates at rate 1.
    *
    * Plan: one count aggregation (sources-sized, tiny), its n^alpha sum
    * reduced decimal-exact to one broadcast row, rates broadcast back,
    * map-side filter — the corpus is never shuffled, same 100 TB shape as
    * [[sampleTokenBudget]].
    *
    * Determinism: alpha = 0.5 and 1.0 use sqrt / identity — single
    * correctly-rounded IEEE ops, bit-identical cross-engine (the gated
    * configs). Other alphas go through pow(), which is NOT guaranteed
    * correctly rounded; a last-ulp rate difference only matters if it
    * crosses a doc's 60-bit hash threshold (~2^-53 odds per doc), but the
    * gate stays on the provably-exact alphas. */
  def sampleTemperature(docs: DataFrame, totalDocs: Long, alpha: Double,
      salt: String): DataFrame = {
    require(totalDocs > 0, "totalDocs must be positive")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    def powA(n: Column): Column =
      if (alpha == 1.0) n.cast("double")
      else if (alpha == 0.5) sqrt(n.cast("double"))
      // pow() is not guaranteed correctly rounded, so the two engines may
      // disagree in the last ulp. Quantize the weight to 1e-9 (floor) so
      // every DOWNSTREAM bit (fold sum, rate, threshold) is computed from
      // identical inputs; the ~1e-9 relative mixture perturbation is far
      // below sampling noise. A last-ulp pow() difference now only
      // matters if pow(n,alpha)*1e9 sits within an ulp of an integer —
      // checked against DuckDB on the gate data (q141). n^alpha*1e9 stays
      // under 2^53 for alpha <= 0.3 up to n ~ 1e12 sources... docs.
      else floor(pow(n.cast("double"), lit(alpha)) * lit(1.0e9)) / lit(1.0e9)
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", powA(col("__n")))
    // Weight sum over the (tiny) per-source relation: full-precision
    // pow() weights are outside the DECIMAL(38,14) round-trip's
    // cross-engine safety (Java 17 Double.toString non-shortest strings
    // can flip the digit-14 rounding vs DuckDB), so sum with the pinned
    // left-to-right fold in source order — the same sequential-sum
    // contract drift and the dot-product oracles use.
    val wSum = counts
      .agg(sort_array(collect_list(struct(col("source"), col("__w")))).as("__a"))
      .select(aggregate(col("__a"), lit(0.0),
        (acc, x) => acc + x.getField("__w")).as("__ws"))
    val rate = least(lit(1.0),
      lit(totalDocs.toDouble) * col("__w") / col("__ws") / col("__n").cast("double"))
    val thr = floor(rate * lit(Scale)).cast("long").as("__thr")
    val rates = counts.crossJoin(broadcast(wSum)).select(col("source"), thr)
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .filter(hash60(col("doc_id"), col("source"), salt) < col("__thr"))
      .select(col("doc_id"), col("source"))
  }

  /** Exact deterministic reservoir: exactly min(n, |source|) docs per
    * source — the docs with the n smallest 60-bit hashes. The bounded-heap
    * aggregate (graft.functions.BottomKByKey) keeps the shuffle at n rows
    * per (source, map partition); a per-source row_number window would
    * push each source's ENTIRE volume through one reducer. */
  def sampleExactPerSource(docs: DataFrame, n: Int, salt: String): DataFrame =
    docs.select(col("source"),
        hash60(col("doc_id"), col("source"), salt).as("__h"), col("doc_id"))
      .groupBy(col("source"))
      .agg(graft.functions.BottomKByKey.bottom_k(col("__h"), col("doc_id"), n).as("__ids"))
      .select(col("source"), explode(col("__ids")).as("doc_id"))

  /** Greedy concat-and-chunk sequence packing: the step that turns a
    * sampled corpus into fixed-length training blocks. Docs are hashed
    * into `nShards` independent shards, laid head-to-tail inside each
    * shard in deterministic (hash, doc_id) order, and every doc gets the
    * block slot its first token lands in: pack = exclusive-cumsum div
    * contextLen, pack_offset = exclusive-cumsum mod contextLen
    * (concat-and-chunk: blocks are cut mid-document, never padded, so a
    * long doc simply spans onward from its slot). Plan shape: ONE shuffle
    * keyed by shard plus the in-partition sort the window cumsum needs —
    * no global sort, no single-reducer hotspot; shards pack
    * independently, so nShards is sized to the target output-file token
    * volume (total_tokens / (packs_per_file * contextLen)), exactly how
    * production packing jobs shard. Determinism: the order key
    * (hash60, doc_id) is unique and partition-layout-independent, so the
    * layout is reproducible across runs, engines and cluster sizes;
    * epoch-style reshuffles are just a new salt. The cumsum is
    * non-negative, so `div`/`%` agree cross-engine.
    *
    * @param tokenCounter per-doc token-count expression (default \S+
    *   regex count; pass `BpeCount.bpe_count(col("text"))` to lay out in
    *   the counts training actually bills). */
  def packSequences(docs: DataFrame, contextLen: Long, nShards: Int,
      salt: String, tokenCounter: Option[Column] = None): DataFrame = {
    require(contextLen > 0 && nShards > 0)
    import org.apache.spark.sql.expressions.Window
    val tok = coalesce(tokenCounter.getOrElse(
      regexp_count(col("text"), lit("\\S+")).cast("long")), lit(0L))
    val base = docs.select(col("doc_id"), col("source"), tok.as("n_tokens"),
        hash60(col("doc_id"), col("source"), salt).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        expr(s"__cum div ${contextLen}L").as("pack"),
        (col("__cum") % lit(contextLen)).as("pack_offset"))
  }

  /** Cluster-balanced exact-N sampling: train-and-assign k-means cells
    * over the embedding corpus (Similarity.cluster), then draw exactly
    * min(n, |cell|) vectors per cell with the deterministic hash
    * reservoir — the end-to-end mixture-balancing shape (equal
    * representation per semantic cluster regardless of cluster sizes).
    * Same plan pieces as its parts: broadcast assignment + bounded-heap
    * bottom-k, corpus shuffled only by the per-cell aggregate. */
  def clusterBalancedSample(emb: DataFrame, nCells: Int, n: Int,
      salt: String): DataFrame =
    sampleExactPerSource(
      Similarity.cluster(emb, nCells)
        .select(col("vec_id").as("doc_id"), col("cell").cast("string").as("source")),
      n, salt)
      .select(col("source").cast("long").as("cell"), col("doc_id").as("vec_id"))

  /** Deterministic STRATIFIED train/val/test split with exact per-source
    * counts: within each source, docs ranked by (hash60, doc_id) take
    * the first floor(fracVal·n) rows as `val`, the next
    * floor(fracTest·n) as `test`, the rest as `train`. Reproducible
    * across runs, engines and partitionings (the salt pins the
    * assignment; re-running with more data moves only rank boundaries),
    * and exact-count unlike the map-only hash-threshold form
    * ([[sampleBySource]] — the at-scale alternative when a ±√n count
    * wobble is acceptable and the per-source sort is not).
    *
    * Scale shape: one source-keyed shuffle; both windows share the
    * partitioning; per-source rank is a window sort — dashboard-to-
    * corpus source cardinalities amortize it across executors, but a
    * SINGLE giant source serializes into one partition's sort: use the
    * threshold form there. */
  def stratifiedSplit(docs: DataFrame, fracVal: Double, fracTest: Double,
      salt: String): DataFrame = {
    // strictly < 1: train is the REMAINDER class (floor'd thresholds
    // leave the leftover rows there), so a zero-train request would
    // silently still emit train rows
    require(fracVal >= 0.0 && fracTest >= 0.0 && fracVal + fracTest < 1.0,
      "fractions must be non-negative and sum to less than 1 (train is the remainder)")
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy(col("source"))
    val ranked = Window.partitionBy(col("source"))
      .orderBy(col("__h"), col("doc_id"))
    // NULL keys out: the engines disagree on NULL sort position (Spark
    // nulls-first vs DuckDB nulls-last), and a split label for an
    // unidentifiable document is meaningless anyway
    docs.filter(col("doc_id").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"),
        hash60(col("doc_id"), col("source"), salt).as("__h"))
      .withColumn("__n", count(lit(1)).over(bySource))
      .withColumn("__r", row_number().over(ranked))
      .select(col("doc_id"), col("source"),
        when(col("__r") <= floor(lit(fracVal) * col("__n").cast("double")),
          lit("val"))
          .when(col("__r") <= floor(lit(fracVal) * col("__n").cast("double")) +
            floor(lit(fracTest) * col("__n").cast("double")), lit("test"))
          .otherwise(lit("train")).as("split"))
  }

  /** Probability-proportional-to-size (PPS / Poisson) sampling: keep
    * each doc with inclusion probability min(1, k·w/Σw), where `weight`
    * is a per-doc NON-NEGATIVE INTEGER size (token count, char count) —
    * "sample an expected k docs, long docs proportionally more likely",
    * the doc-level weighting [[sampleTemperature]]'s source-level rates
    * cannot express. E[docs kept] = k when no weight saturates.
    *
    * Exactness: the keep predicate is hash60·Σw < k·w·2^60 evaluated in
    * DECIMAL(38,0) — pure integer arithmetic, no float division, no
    * rounding knife-edges; the min(1,·) cap is implicit (hash60 < 2^60
    * always). Magnitudes: hash60 < 2^60 ≈ 1.2e18, so Σw up to ~8e19
    * stays inside 38 digits — beyond that, pre-scale the weights.
    * NULL/negative weights drop the doc (no meaningful size).
    *
    * Scale shape: ONE scalar aggregate for Σw (map-combinable),
    * broadcast back as a literal-free cross join; the keep filter is
    * map-side — the corpus never shuffles. */
  /** Weighted sampling WITHOUT replacement, exactly k rows
    * (Efraimidis–Spirakis 2006): each doc draws key = u^(1/w) from its
    * deterministic hash-uniform u and the k LARGEST keys win — the
    * exact-k complement of [[sampleByWeight]]'s Poisson PPS (that op
    * returns a RANDOM NUMBER of docs near k; an eval-set builder needs
    * exactly k, still long-doc-weighted).
    *
    * Determinism: u = hash60/2^60 (the double rounding of an exact
    * integer is identical IEEE in both engines), the key is
    * floor-quantized to an exact long at 1e12 (pow discipline), ties
    * break by doc_id. Zero-weight docs draw key 0 (pow(u, ∞) = 0 —
    * both engines) and lose to any positive weight. NULL/negative
    * weights drop.
    *
    * Scale shape: map-side key computation, global top-k as
    * TakeOrdered (k rows per partition to the driver — never a rank
    * window). */
  def sampleWeightedExactK(docs: DataFrame, k: Int, weight: Column,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val w = docs.select(col("doc_id"), col("source"),
        weight.cast("long").as("w"))
      .filter(col("w").isNotNull && col("w") >= 0L)
    val u = hash60(col("doc_id"), col("source"), salt).cast("double") /
      lit(Scale.toLong).cast("double")
    w.withColumn("__key",
        floor(pow(u, lit(1.0) / col("w").cast("double")) * lit(1.0e12))
          .cast("long"))
      .orderBy(col("__key").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("source"), col("w"))
  }

  /** Poisson-BOOTSTRAP confidence interval for a corpus mean — the
    * published way to bootstrap data too big to resample (one pass, B
    * independent hash-derived Poisson(1) weights per row; classical
    * resampling needs the full dataset per replica): B replica
    * weighted means, their spread, and the ±2σ interval. Deterministic
    * end to end — the "randomness" is the per-(doc, replica) hash60
    * uniform cut by fixed Poisson(1) CDF thresholds (literal doubles
    * shared verbatim with the oracle; weights capped at 4, the
    * P>4 ≈ 0.37% tail folded into 4 — documented bias, far below
    * bootstrap noise).
    *
    * Exactness: weights and values are exact longs, replica sums are
    * DECIMAL(38,0), each replica mean is one IEEE division; the
    * across-replica moments fold in replica order (sorted-array
    * aggregate == SUM ORDER BY b) and the sd/CI tail is a fixed IEEE
    * sequence. Scale shape: the ×B explode is in-row, the (replica)
    * aggregate is map-combinable with B groups, and the final fold
    * runs on B rows. */
  def bootstrapCi(docs: DataFrame, value: Column, b: Int,
      salt: String): DataFrame = {
    require(b >= 2, s"need at least 2 replicas: $b")
    // Poisson(1) CDF thresholds: P(X<=k) for k = 0..3
    val e = math.exp(-1.0)
    val thr = Seq(e, e * 2.0, e * 2.5, e * (2.5 + 1.0 / 6.0))
    val base = docs.select(col("doc_id"), col("source"),
        value.cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    val rep = base.select(col("doc_id"), col("source"), col("__x"),
      explode(array((1 to b).map(i => lit(i)): _*)).as("__b"))
    val uCol = hash60(col("doc_id"),
      concat(col("source"), lit(":"), col("__b").cast("string")), salt)
      .cast("double") / lit(Scale.toLong).cast("double")
    val w = when(uCol < lit(thr(0)), 0L)
      .when(uCol < lit(thr(1)), 1L)
      .when(uCol < lit(thr(2)), 2L)
      .when(uCol < lit(thr(3)), 3L)
      .otherwise(4L)
    val perRep = rep.withColumn("__w", w)
      .groupBy(col("__b"))
      .agg(sum((col("__w") * col("__x")).cast("decimal(38,0)")).as("__swx"),
        sum(col("__w").cast("decimal(38,0)")).as("__sw"))
      .select(col("__b"),
        (col("__swx").cast("double") / col("__sw").cast("double")).as("__m"))
    val nTot = base.agg(count(lit(1)).as("n_docs"),
      (sum(col("__x").cast("decimal(38,0)")).cast("double") /
        count(lit(1)).cast("double")).as("point_mean"))
    val folded = perRep
      .agg(sort_array(collect_list(struct(col("__b"), col("__m")))).as("__a"))
      .select(
        aggregate(col("__a"), lit(0.0), (acc, x) => acc + x.getField("__m"))
          .as("__sm"),
        aggregate(col("__a"), lit(0.0), (acc, x) =>
          acc + x.getField("__m") * x.getField("__m")).as("__smm"))
    val bD = lit(b.toDouble)
    val bootMean = col("__sm") / bD
    val bootVar = greatest(lit(0.0),
      (col("__smm") * bD - col("__sm") * col("__sm")) / (bD * (bD - lit(1.0))))
    val sd = sqrt(bootVar)
    folded.crossJoin(broadcast(nTot))
      .select(col("n_docs"), col("point_mean"), bootMean.as("boot_mean"),
        sd.as("boot_sd"),
        (bootMean - lit(2.0) * sd).as("ci_lo"),
        (bootMean + lit(2.0) * sd).as("ci_hi"))
  }

  def sampleByWeight(docs: DataFrame, k: Long, weight: Column,
      salt: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val dec = "decimal(38,0)"
    val w = docs.select(col("doc_id"), col("source"),
      weight.cast("long").as("__w"))
      .filter(col("__w").isNotNull && col("__w") >= 0L)
    val tot = w.agg(sum(col("__w")).cast(dec).as("__tot"))
    w.crossJoin(broadcast(tot))
      .filter(hash60(col("doc_id"), col("source"), salt).cast(dec) *
        col("__tot") <
        (lit(k).cast(dec) * col("__w").cast(dec) *
          lit(Scale.toLong).cast(dec)))
      .select(col("doc_id"), col("source"), col("__w").as("w"))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token budget B across sources as
    * UNIFORMLY as possible subject to a per-source epoch cap — no
    * source is repeated more than `epochCap` times, and the budget
    * freed by small (capped) sources is re-split uniformly among the
    * rest. The published waterfilling form: sources ascending by size,
    * source i is CAPPED iff its full cap fits its fair share of the
    * budget left assuming all smaller sources capped —
    * epochCap·s_i·(n−i+1) ≤ B − epochCap·Σ_{j<i}s_j (cappedness is a
    * PREFIX of the ascending order, the standard waterfilling
    * argument); capped sources get epochCap·s_i tokens, the rest split
    * the remainder equally.
    *
    * Cross-engine exactness: sizes are exact whitespace-token longs
    * (the q49 convention), the cap predicate is pure DECIMAL(38,0)
    * integer arithmetic (epochCap·s·(n−i+1) overflows int64 around
    * 2e13 tokens × 1e5 sources — exactly the 100 TB regime), capped
    * allocations are exact longs, and the uncapped share is ONE IEEE
    * division of two exact longs shared by every uncapped row. Empty
    * sources allocate 0 with NULL epochs.
    *
    * Scale shape: one map-combinable source aggregate collapses the
    * corpus to |sources| rows; the sort + windows run on that tiny
    * relation (the q209 convention). Output: (source, tokens,
    * allocated, epochs). */
  def unimax(docs: DataFrame, budget: Long, epochCap: Int): DataFrame = {
    require(budget >= 0 && epochCap > 0,
      s"bad unimax shape: budget=$budget epochCap=$epochCap")
    val dec = "decimal(38,0)"
    val sizes = docs
      .select(col("source"),
        coalesce(regexp_count(col("text"), lit("\\S+")).cast("long"), lit(0L))
          .as("__t"))
      .groupBy(col("source"))
      .agg(sum(col("__t")).as("tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tokens"), col("source"))
    val full = org.apache.spark.sql.expressions.Window
      .orderBy(col("tokens"), col("source"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ranked = sizes
      .withColumn("__i", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(full))
      .withColumn("__cumBefore",
        // the running sum itself in DECIMAL(38,0): each per-source
        // product fits int64, but the CUMULATIVE sum crosses it around
        // 2e13 tokens x 1e5 sources — summing in BIGINT and casting
        // after would silently wrap exactly at the regime the cap
        // predicate's DECIMAL exactness is documented for
        coalesce(sum((col("tokens") * lit(epochCap.toLong)).cast(dec)).over(w) -
          (col("tokens") * lit(epochCap.toLong)).cast(dec),
          lit(0L).cast(dec)))
      .withColumn("__capped",
        (col("tokens") * lit(epochCap.toLong)).cast(dec) *
          (col("__n") - col("__i") + 1).cast(dec) <=
          lit(budget).cast(dec) - col("__cumBefore").cast(dec))
    // remainder after the capped prefix, split equally among the rest —
    // both operands exact longs, ONE shared IEEE division
    val agg = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ranked
      .withColumn("__cappedSum", coalesce(sum(when(col("__capped"),
        col("tokens") * lit(epochCap.toLong))).over(agg), lit(0L)))
      .withColumn("__nUncapped",
        sum(when(col("__capped"), 0L).otherwise(1L)).over(agg))
      .select(col("source"), col("tokens"),
        when(col("__capped"),
          (col("tokens") * lit(epochCap.toLong)).cast("double"))
          .otherwise((lit(budget) - col("__cappedSum")).cast("double") /
            col("__nUncapped").cast("double")).as("allocated"),
        when(col("tokens") > 0L,
          when(col("__capped"), lit(epochCap.toDouble))
            .otherwise((lit(budget) - col("__cappedSum")).cast("double") /
              col("__nUncapped").cast("double") /
              col("tokens").cast("double")))
          .as("epochs"))
  }
}
