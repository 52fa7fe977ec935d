package graft

import graft.pipeline.{Contracts, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unit pins for the round-12 scale gates (q340–q346) and the r11
  * ADVICE fixes: the synthetic clustered corpus's analytic-truth
  * premises, the recall contracts' ability to go RED, the Layout.cell
  * NaN/overflow guard, centerEmbeddings' dense-means gap semantics,
  * diversifyGraph's loud inconsistent-input failure, and the cache
  * eviction bounds. */
class ScaleGateSpec extends SparkSpec {
  import spark.implicits._

  test("clusteredCorpus: deterministic, mixed-sign, mates dominate cross-cluster cosine") {
    val emb = Contracts.clusteredCorpus(spark, 200L, 16, 5)
    val a = emb.orderBy("vec_id").collect()
    val b = Contracts.clusteredCorpus(spark, 200L, 16, 5)
      .orderBy("vec_id").collect()
    // bit-deterministic across builds
    assert(a.map(_.getSeq[Float](1)).toSeq == b.map(_.getSeq[Float](1)).toSeq)
    val vecs = a.map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / math.sqrt(nx * ny)
    }
    // the analytic-truth premise: every mate cosine beats every
    // cross-cluster cosine for a sample of nodes
    for (u <- Seq(0L, 37L, 123L)) {
      val c = u / 5
      val mates = (c * 5 until (c + 1) * 5).filter(_ != u)
        .map(v => cos(vecs(u), vecs(v)))
      val foreign = vecs.keys.filter(_ / 5 != c).take(80)
        .map(v => cos(vecs(u), vecs(v)))
      assert(mates.min > foreign.max + 0.05,
        s"u=$u mates ${mates.min} vs foreign ${foreign.max}")
    }
    // mixed-sign (centered regime): positive-coordinate fraction well
    // inside (0.05, 0.95) — the sign-LSH guard's healthy band
    val frac = emb.select(explode(col("embedding")).as("x"))
      .agg(avg(when(col("x") > 0.0f, 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(frac > 0.3 && frac < 0.7, s"sign fraction $frac")
  }

  test("recall contracts can go RED: wrong edges / dropped queries fail the verdict") {
    // a graph whose every edge points one cluster over: recall 0
    val badGraph = spark.range(0, 100)
      .select(col("id").as("query_id"),
        ((col("id") + lit(5)) % 100).as("neighbor_id"),
        lit(0.9).as("cosine"), lit(1).cast("int").as("rank"))
    val v1 = Contracts.graphEdgeRecallContract(badGraph, 5, 1, 100L, 0.8)
      .collect()(0)
    assert(!v1.getBoolean(1), "shifted-edge graph must fail the contract")
    // a searcher that silently drops queries fails on n_queries even
    // with perfect per-emitted-query recall
    val partial = spark.range(0, 3)
      .select((col("id") * 5).as("query_id"),
        (col("id") * 5 + 1).as("neighbor_id"),
        lit(0.99).as("cosine"), lit(1).cast("int").as("rank"))
    val v2 = Contracts.searchMateRecallContract(partial, 5, 1,
      nQueries = 4L, bound = 0.5).collect()(0)
    assert(!v2.getBoolean(1), "dropped query must fail the contract")
  }

  test("dedup scale contracts can go RED: extra keeper, wrong keeper, lost cluster, missing pairs") {
    // 20 nodes in 4 clusters of 5; the perfect verdict keeps each min.
    // Expression-only membership: the kept ids become a literal IN set
    def verdict(keep: Long => Boolean) = spark.range(0, 20)
      .select(col("id").as("vec_id"), (col("id") % 7).as("cell"))
      .withColumn("keep",
        col("vec_id").isInCollection((0L until 20L).filter(keep)))
    def run(keep: Long => Boolean) = Contracts.semDedupScaleContract(
      verdict(keep), 5, 20L, bound = 1.0).collect()(0)
    assert(run(id => id % 5 == 0).getBoolean(1), "perfect verdict must pass")
    assert(!run(id => id % 5 <= 1).getBoolean(1), "two keepers must fail")
    assert(!run(id => id % 5 == 1).getBoolean(1), "non-min keeper must fail")
    assert(!run(id => id % 5 == 0 && id != 0).getBoolean(1),
      "a fully-dropped cluster must fail even within the floor")
    // pair recall: dropping any mate pairs below the floor fails
    val allPairs = spark.range(0, 20).select(col("id").as("vec_a"))
      .join(spark.range(0, 20).select(col("id").as("vec_b")),
        expr("vec_a < vec_b AND vec_a div 5 = vec_b div 5"))
      .withColumn("cosine", lit(1.0))
    assert(Contracts.nearDupPairRecallContract(allPairs, 5, 20L, 0.99)
      .collect()(0).getBoolean(1), "full pair set must pass")
    assert(!Contracts.nearDupPairRecallContract(
        allPairs.filter(col("vec_a") =!= 0L), 5, 20L, 0.99)
      .collect()(0).getBoolean(1), "missing mate pairs must fail")
  }

  test("knnGraph AUTO default: budget from n, churn early-stop, perfect edges on the clustered regime") {
    val emb = Contracts.clusteredCorpus(spark, 500L, 16, 5)
    // dim 16 -> 4 tables x 4 bits keeps every hyperplane on a real coord
    val g = Similarity.knnGraph(emb, 4, tables = 4, bits = 4)
    val verdict = Contracts.graphEdgeRecallContract(g, 5, 4, 500L, 0.8)
      .collect()(0)
    assert(verdict.getLong(0) == 500L && verdict.getBoolean(1))
  }

  test("Layout.cell: NaN/NULL -> NULL, +-Infinity and out-of-long-range clamp to EDGE cells") {
    val rows = Seq(
      Option(25.0), None, Option(Double.NaN),
      Option(Double.PositiveInfinity), Option(Double.NegativeInfinity),
      Option(1.0e300), Option(-1.0e300)).toDF("v")
    val got = rows.select(graft.sources.Layout.cell(col("v"), 0.0, 50.0, 8)
      .as("c")).collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    // 25.0 -> cell 128; NULL/NaN -> NULL; +Inf/huge -> TOP cell 255
    // (not silently cell 0 — the r11 ADVICE finding); -Inf/-huge -> 0
    assert(got.toSeq == Seq(128L, -1L, -1L, 255L, 0L, 255L, 0L), got.toSeq)
  }

  test("centerEmbeddings: an all-NULL dim leaves a GAP (NULL mean), not a compacted array") {
    val emb = Seq(
      (1L, Seq[java.lang.Float](1.0f, null, 10.0f)),
      (2L, Seq[java.lang.Float](3.0f, null, 30.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.centerEmbeddings(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSet
    // dim 1 mean 2.0, dim 2 all-NULL -> NULL x (NOT dim 3's mean 20
    // shifted down — the r11 ADVICE compaction bug), dim 3 mean 20.0
    def n(d: Double) = d.isNaN
    assert(out.exists(t => t._1 == 1L && t._2 == 1 && t._3 == -1.0))
    assert(out.exists(t => t._1 == 2L && t._2 == 1 && t._3 == 1.0))
    assert(out.exists(t => t._1 == 1L && t._2 == 3 && t._3 == -10.0))
    assert(out.exists(t => t._1 == 2L && t._2 == 3 && t._3 == 10.0))
    assert(out.count(t => t._2 == 2 && n(t._3)) == 2, out)
  }

  test("diversifyGraph: a graph neighbor absent from emb fails LOUDLY") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    // node 1 has neighbors 2 and 99; 99 is not in emb, so the pair
    // cosine map misses (2, 99) — must raise, not silently keep
    val g = Seq((1L, 2L, 0.95), (1L, 99L, 0.90))
      .toDF("query_id", "neighbor_id", "cosine")
    val e = intercept[Exception] {
      Similarity.diversifyGraph(emb, g, r = 2).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
    assert(chain(e).exists(_.contains("absent from emb")), chain(e))
  }

  test("RelCache keyed memo: eviction and race-loser release checkpoint blocks") {
    graft.util.RelCache.clear()
    val first = graft.util.RelCache.memo(("sgs-evict", 0)) {
      spark.range(0, 10).toDF("x").localCheckpoint(true)
    }
    def level(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.getStorageLevel
      }.head
    assert(level(first) != StorageLevel.NONE)
    // flood the memo past MaxEntries: the eldest must be released
    (1 to graft.util.RelCache.MaxEntries).foreach { i =>
      graft.util.RelCache.memo(("sgs-evict", i)) {
        spark.range(0, 2).toDF("x").localCheckpoint(true)
      }
    }
    assert(level(first) == StorageLevel.NONE,
      "evicted memo entry's checkpoint blocks were not unpersisted")
    graft.util.RelCache.clear()
  }

  test("RelCache memo + SingleFlight: concurrent same-key callers share ONE build") {
    graft.util.RelCache.clear()
    // 8 threads race one memo key whose build blocks until all racers
    // are inside memo(); exactly ONE build must run (duplicate builds
    // were the r12 concurrent-wall tax), and every caller must get the
    // same relation back
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.CopyOnWriteArrayList[AnyRef]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val df = graft.util.RelCache.memo(("sgs-flight", 1)) {
          builds.incrementAndGet()
          entered.await()
          spark.range(0, 5).toDF("x").localCheckpoint(true)
        }
        results.add(df)
      })
    }
    threads.foreach(_.start())
    Thread.sleep(300) // let every racer reach the rendezvous
    entered.countDown()
    threads.foreach(_.join(30000))
    assert(builds.get() == 1, s"expected one build, got ${builds.get()}")
    assert(results.size == 8 && results.toArray.distinct.length == 1)
    // a FAILED build must not poison the key: waiters/retriers rebuild
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    intercept[RuntimeException] {
      graft.util.RelCache.memo(("sgs-flight", 2)) {
        if (failOnce.getAndSet(false)) throw new RuntimeException("boom")
        spark.range(0, 3).toDF("x").localCheckpoint(true)
      }
    }
    val recovered = graft.util.RelCache.memo(("sgs-flight", 2)) {
      spark.range(0, 3).toDF("x").localCheckpoint(true)
    }
    assert(recovered.count() == 3)
    graft.util.RelCache.clear()
  }

  test("unimax: waterfilling hand case — capped prefix exact, uncapped split equally") {
    // sizes 10/20/100 tokens, cap 2, budget 60: capacities 20/40/200;
    // ascending, src-a (cap 20) fits 2*10*3=60 <= 60 -> capped at 20;
    // src-b needs 2*20*2=80 > 40 left -> uncapped; remaining 40 split
    // equally: 20 each; epochs 2.0 / 1.0 / 0.2
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "a"),
      (2L, Seq.fill(20)("w").mkString(" "), "b"),
      (3L, Seq.fill(100)("w").mkString(" "), "c"))
      .toDF("doc_id", "text", "source")
    val got = graft.pipeline.Sampling.unimax(docs, 60L, 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") == ((10L, 20.0, 2.0)), got)
    assert(got("b") == ((20L, 20.0, 1.0)), got)
    assert(got("c") == ((100L, 20.0, 0.2)), got)
    // budget beyond every capacity: everyone capped at epochCap
    val all = graft.pipeline.Sampling.unimax(docs, 1000L, 2)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(all == Map("a" -> 2.0, "b" -> 2.0, "c" -> 2.0), all)
  }

  test("mmrRerank: diversity beats a redundant higher-relevance candidate") {
    // query 0 = (1,0,0); c1 rel ~0.995; c2 a near-copy of c1 (its
    // redundancy penalty ~rel, score ~-0.003); c3 rel 0.707 but only
    // ~0.703 similar to c1 (score ~+0.002). lam=0.5: picks c1, then
    // the DIVERSE c3 over the higher-relevance redundant c2
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.1f, 0.0f)),
      (2L, Seq(0.99f, 0.11f, 0.0f)),
      (3L, Seq(0.7f, 0.0f, 0.7f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0L),
        k = 3, n = 3, lam = 0.5)
      .orderBy("mmr_rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 3L, 2L), got)
    // lam = 1.0 is plain top-k by relevance
    val plain = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0L),
        k = 3, n = 3, lam = 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(1L, 2L, 3L), plain)
  }

  test("matryoshkaRecall: full-dim prefix is perfect; a confusable prefix is not") {
    // truth in 2-d separates by dim 2; truncating to dim 1 makes the
    // wrong neighbor closest
    val emb = Seq(
      (0L, Seq(0.5f, 1.0f)),   // query
      (1L, Seq(0.5f, 0.9f)),   // true top-1 (full-dim)
      (2L, Seq(0.5f, -1.0f)))  // dim-1 twin, full-dim opposite
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
    val got = Similarity.matryoshkaRecall(emb, q, 1, Seq(1, 2))
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(got(2) == 1.0, got)
    // 1-d cosine is SIGN-only: give the true neighbor a negative first
    // coordinate so the truncated prefix ranks the wrong twin first
    val emb2 = Seq(
      (0L, Seq(0.5f, 1.0f)),
      (1L, Seq(-0.1f, 0.99f)), // full-dim top-1, prefix cosine -1
      (2L, Seq(0.5f, -1.0f)))  // prefix cosine +1, full-dim opposite
      .toDF("vec_id", "embedding")
    val got2 = Similarity.matryoshkaRecall(emb2,
        emb2.filter(col("vec_id") === 0L), 1, Seq(1, 2))
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(got2(2) == 1.0 && got2(1) == 0.0, got2)
  }

  test("isotonicCalibrate: PAV hand case via the minimax identity; monotone output") {
    // bins 0/1/2 with equal n=10 and rates 0.8 / 0.2 / 0.6: PAV pools
    // the violating first pair to 0.5, keeps 0.6 — iso = 0.5/0.5/0.6
    val rows = Seq.tabulate(10)(i => (0.01, i < 8)) ++
      Seq.tabulate(10)(i => (0.35, i < 2)) ++
      Seq.tabulate(10)(i => (0.70, i < 6))
    val df = rows.toDF("score", "lbl")
    val got = graft.pipeline.RankStats.isotonicCalibrate(
        df, "score", col("lbl"), nBins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 0.8, 0.5), (1L, 0.2, 0.5), (2L, 0.6, 0.6)),
      got.toSeq)
    // already-monotone input is returned unchanged
    val mono = Seq.tabulate(10)(i => (0.01, i < 2)) ++
      Seq.tabulate(10)(i => (0.35, i < 5)) ++
      Seq.tabulate(10)(i => (0.70, i < 9))
    val got2 = graft.pipeline.RankStats.isotonicCalibrate(
        mono.toDF("score", "lbl"), "score", col("lbl"), nBins = 3)
      .orderBy("bin").collect().map(r => r.getDouble(4)).toSeq
    assert(got2 == Seq(0.2, 0.5, 0.9), got2)
  }

  test("searchMateMrrContract: rank-position sensitivity — rank-2 mates fail a 0.9 floor recall would pass") {
    // 4 queries, each finds BOTH its mates but the TOP result is
    // foreign: recall@2 = 1.0, MRR = 1/2
    val rows = (0L until 4L).flatMap { q =>
      val qid = q * 5
      Seq((qid, qid + 7L, 0.99, 1), // foreign top-1 (different cluster)
        (qid, qid + 1L, 0.98, 2))   // mate at rank 2
    }
    val approx = rows.toDF("query_id", "neighbor_id", "cosine", "rank")
    val v = graft.pipeline.Contracts.searchMateMrrContract(
      approx, clusterSize = 5, k = 2, nQueries = 4L, bound = 0.9)
      .collect()(0)
    assert(v.getLong(0) == 4L && !v.getBoolean(1), v)
    // perfect top-1 mates pass
    val perfect = (0L until 4L).map(q => (q * 5, q * 5 + 1L, 0.99, 1))
      .toDF("query_id", "neighbor_id", "cosine", "rank")
    val v2 = graft.pipeline.Contracts.searchMateMrrContract(
      perfect, clusterSize = 5, k = 2, nQueries = 4L, bound = 0.9)
      .collect()(0)
    assert(v2.getBoolean(1), v2)
    // a dropped query fails even at MRR 1.0 on the emitted ones
    val v3 = graft.pipeline.Contracts.searchMateMrrContract(
      perfect, clusterSize = 5, k = 2, nQueries = 5L, bound = 0.5)
      .collect()(0)
    assert(!v3.getBoolean(1), v3)
  }

  test("chi2Independence: zero on an exactly independent table, N and V=1 on a perfect diagonal") {
    val indep = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r1 = graft.pipeline.Curation.chi2Independence(
      indep.toDF("source", "lang"), "source", "lang").collect()(0)
    assert(r1.getLong(0) == 40L && r1.getLong(3) == 1L)
    assert(r1.getDouble(4) == 0.0 && r1.getDouble(5) == 0.0, r1)
    // perfect association: chi2 = N, Cramér's V = 1
    val diag = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val r2 = graft.pipeline.Curation.chi2Independence(
      diag.toDF("source", "lang"), "source", "lang").collect()(0)
    assert(r2.getDouble(4) == 20.0 && r2.getDouble(5) == 1.0, r2)
  }

  test("chi2Independence: cardinality guard refuses a high-cardinality pair") {
    // user_id x item_id: 300 x 300 distinct = 90,000 dense cells — a
    // legitimate contingency test never looks like this; the guard is a
    // RUNTIME raise folded into the plan (the operator stays lazy:
    // constructing the frame runs no job, so streaming composition and
    // repeated calls cost nothing), firing when the first action touches
    // the marginals; a raised budget must readmit the same pair (the
    // explicit-override path)
    val big = (0 until 300).map(i => (s"u$i", s"i$i")).toDF("u", "it")
    val lazyFrame = graft.pipeline.Curation.chi2Independence(big, "u", "it")
    val e = intercept[Exception] { lazyFrame.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxGridCells")), e)
    val ok = graft.pipeline.Curation.chi2Independence(big, "u", "it",
      maxGridCells = 100000L).collect()(0)
    assert(ok.getLong(0) == 300L && ok.getLong(1) == 300L, ok)
  }

  test("mmrRerank: lambda=1 equals plain relevance top-k at k=12 (planning constant in k)") {
    // 12 selection rounds as ONE runtime fold: with lambda=1 the
    // diversity penalty vanishes, so the mmr order must equal the
    // relevance order (cosine desc, id) over the n=20 candidates —
    // and the whole thing must plan+run in seconds, not the k-1
    // driver-checkpoint rounds the unrolled form needed
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3.7 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0L),
        k = 12, n = 20, lam = 1.0)
      .orderBy("mmr_rank").collect()
    assert(got.length == 12, got.length)
    val rels = got.map(_.getDouble(2))
    assert(rels.zip(rels.tail).forall { case (a, b) => a >= b }, rels.toSeq)
    // rel must match brute-force cosine order head
    val bf = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0L), 12)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got.map(_.getLong(1)).toSeq == bf)
  }

  test("mmrRerank: plan size is constant in k (red pin at the k=50 wall the fold was built for)") {
    // the r12 wall was k-1 driver rounds; the fold rewrite's entire
    // point is k≈50. An accidental re-unroll would scale the physical
    // plan ~linearly with k, so pin the plan RENDERING: k=50 must stay
    // within 1.5x of k=5 (measured ~1.0x — only the two k literals
    // differ), and both must carry exactly ONE runtime-fold aggregate
    // over sequence(1, k-1), never k-1 of anything
    val emb = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3.7 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
    def planSize(k: Int): Int = Similarity.mmrRerank(emb, q, k = k, n = 60,
      lam = 0.5).queryExecution.executedPlan.toString.length
    val p5 = planSize(5)
    val p50 = planSize(50)
    assert(p50 <= p5 * 3 / 2, s"plan grew with k: k=5 -> $p5 chars, k=50 -> $p50")
    // and the k=50 result is still the real algorithm: k distinct picks
    val got = Similarity.mmrRerank(emb, q, k = 50, n = 60, lam = 0.5)
      .collect().map(_.getLong(1))
    assert(got.length == 50 && got.distinct.length == 50, got.length)
  }

  test("mmrScaleContract: green on the designed corpus, red on duplicated picks / lam1 disagreement / mate-heavy picks") {
    // q363 in miniature: 100 vectors in 20 clusters of 5, 2 queries
    val emb = graft.pipeline.Contracts.clusteredCorpus(spark, 100L, 16, 5)
    val q = emb.filter(pmod(col("vec_id"), lit(50L)) === 0L)
    val div = Similarity.mmrRerank(emb, q, k = 3, n = 6, lam = 0.3)
    val lam1 = Similarity.mmrRerank(emb, q, k = 3, n = 6, lam = 1.0)
    val brute = Similarity.bruteForceTopK(emb, q, 6)
    def verdict(d: org.apache.spark.sql.DataFrame,
        l: org.apache.spark.sql.DataFrame, ceil: Double): Boolean =
      graft.pipeline.Contracts.mmrScaleContract(d, l, brute,
        clusterSize = 5, k = 3, nQueries = 2L, mateCeil = ceil)
        .collect()(0).getBoolean(1)
    // measured: each query picks mate/stranger/mate — the two stranger
    // candidates in its top-6 are mutual cluster mates, so after one is
    // picked the other is penalized as hard as an own-mate and a mate
    // legitimately re-enters (the contract's scaladoc point); mates = 2
    // = k−1 per query — displacement happened, ceiling honest at 2.0
    assert(verdict(div, lam1, 2.0))
    // red: a duplicated pick breaks the distinct-shape invariant
    val dup = div.withColumn("neighbor_id",
      when(col("mmr_rank") === 2, first(col("neighbor_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy("mmr_rank"))).otherwise(col("neighbor_id")))
    assert(!verdict(dup, lam1, 1.5))
    // red: λ=1 side replaced by the diversity picks (they disagree with
    // brute-force order on this corpus, so __agree < nQueries*k)
    assert(!verdict(div, div, 1.5))
    // red: a mate ceiling below the measured mean (rank-1 is always a
    // mate, so mean mates >= 1 > 0.5)
    assert(!verdict(div, lam1, 0.5))
  }

  test("r12-operator degenerate inputs: tied conformal scores, single-bin isotonic, zero-budget unimax, constant-tail Hill, mmr k=1/exhaustion") {
    // conformal with ALL-TIED scores at the rank boundary: rank order
    // among ties is arbitrary, but the threshold is an ORDER STATISTIC
    // of the VALUES — ties collapse to the same value, so the output
    // must be the tied value, deterministically
    val tied = (1 to 10).map(i => (i.toLong, "g", 7.5)).toDF("doc_id", "group", "score")
    val ct = graft.pipeline.Curation.conformalThreshold(
        tied, "group", col("score"), alpha = 0.1, calFrac = 1.0)
      .collect()(0)
    assert(ct.getLong(1) == 10L && ct.getDouble(2) == 7.5, ct)
    // isotonic with every score in ONE bin: the fit is that bin's rate
    val oneBin = Seq((0.010, true), (0.012, false), (0.015, true), (0.011, false))
      .toDF("score", "pos")
    val iso = graft.pipeline.RankStats.isotonicCalibrate(
      oneBin, "score", col("pos"), nBins = 50).collect()
    assert(iso.length == 1 && iso(0).getDouble(iso(0).length - 1) == 0.5,
      iso.toSeq)
    // unimax with ZERO budget: every allocation 0, zero-token sources
    // keep NULL epochs (never 0/0 = NaN)
    val zdocs = Seq(("s1", "a b c"), ("s2", "")).toDF("source", "text")
    val um = graft.pipeline.Sampling.unimax(zdocs, budget = 0L, epochCap = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(um("s1")._1 == 0.0 && um("s2")._1 == 0.0, um)
    assert(um("s2")._2.isEmpty, um)
    assert(um("s1")._2.contains(0.0), um)
    // Hill on a CONSTANT positive tail: every log-gap is 0 -> the
    // divide-by-zero guard reports NULL, never Infinity
    val const = Seq.fill(20)(3.0).toDF("v")
    val hill = graft.pipeline.Curation.tailIndex(const, col("v"), k = 10)
      .collect()(0)
    assert(hill.getLong(1) == 11L && hill.isNullAt(3), hill)
    // mmr k=1 (the fold's base case) = plain top-1; and k beyond the
    // candidate budget returns every candidate once, never pads
    val emb = (0L until 6L).map(i =>
      (i, Array.tabulate(4)(d => math.cos(i * 2.3 + d).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val q0 = emb.filter(col("vec_id") === 0L)
    val top1 = Similarity.mmrRerank(emb, q0, k = 1, n = 4, lam = 0.5).collect()
    val bf1 = Similarity.bruteForceTopK(emb, q0, 1).collect()(0).getLong(1)
    assert(top1.length == 1 && top1(0).getLong(1) == bf1, top1.toSeq)
    val exhaust = Similarity.mmrRerank(emb, q0, k = 4, n = 4, lam = 0.5)
      .collect().map(_.getLong(1))
    assert(exhaust.length == 4 && exhaust.distinct.length == 4, exhaust.toSeq)
  }

  test("chunkDedup: first corpus occurrence keeps, repeats drop, empty docs report NULL fraction") {
    val ten = "a b c d e f g h i j"
    val docs = Seq(
      (1L, ten + " x y"),   // owns the first occurrence of the 10-gram
      (2L, ten + " z w"),   // repeats it -> chunk dropped, tail kept
      (3L, ""))             // no tokens at all
      .toDF("doc_id", "text")
    val got = graft.pipeline.Dedup.chunkDedup(docs, chunkTokens = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got(1L) == ((2L, 2L, 12L, 12L, Some(1.0))), got)
    assert(got(2L) == ((2L, 1L, 12L, 2L, Some(2.0 / 12.0))), got)
    assert(got(3L) == ((0L, 0L, 0L, 0L, None)), got)
  }

  test("chunkDedup: 64-bit hash-style doc_ids elect correctly (red pin for the r13 packed-key overflow)") {
    // doc ids in the 2^44 range — a hash-derived/snowflake id, exactly
    // the 100 TB regime. The r13 election key doc_id*2^20+chunk WRAPPED
    // here (2^44 * 2^20 = 2^64 -> 0), silently electing the HIGH id as
    // "first"; the struct election must pick the true lexicographic
    // minimum (doc 7), with the two huge ids dropping their chunk.
    val ten = "a b c d e f g h i j"
    val docs = Seq((1L << 44, ten), ((1L << 44) + 1L, ten), (7L, ten))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Dedup.chunkDedup(docs, chunkTokens = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(7L) == 1L, got)
    assert(got(1L << 44) == 0L && got((1L << 44) + 1L) == 0L, got)
    // the hashed-key 100 TB shuffle path is row-identical (q360's gate
    // in miniature): same election, 16-byte md5 key instead of text
    val text = graft.pipeline.Dedup.chunkDedup(docs, chunkTokens = 10)
      .collect().map(_.toSeq).toSet
    val hashed = graft.pipeline.Dedup.chunkDedup(docs, chunkTokens = 10,
      hashKey = true).collect().map(_.toSeq).toSet
    assert(text == hashed, s"text=$text hashed=$hashed")
  }

  test("conformalThreshold: corrected-rank order statistic; small groups report NULL") {
    // calFrac=1.0: every row calibrates. group g9 has 9 scores 1..9:
    // need = ceil(10*0.9) = 9 -> threshold = 9.0; group g4 has 4:
    // need = ceil(5*0.9) = 5 > 4 -> NULL (no finite guarantee)
    val rows = (1 to 9).map(i => (i.toLong, "g9", i.toDouble)) ++
      (1 to 4).map(i => (100L + i, "g4", i.toDouble))
    val df = rows.toDF("doc_id", "group", "score")
    val got = graft.pipeline.Curation.conformalThreshold(
        df, "group", col("score"), alpha = 0.1, calFrac = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got("g9") == ((9L, Some(9.0))), got)
    assert(got("g4") == ((4L, None)), got)
  }

  test("conformalCoverage: holdout coverage near 1-alpha; no-threshold groups NULL, never 0") {
    // one big exchangeable group: coverage on the hash-complement
    // holdout should sit near 1-alpha (deterministic for the fixed
    // split; the assertion brackets it loosely), plus a tiny group
    // whose calibration slice can't support the corrected rank
    val rows = (1 to 400).map(i => (i.toLong, "big", (i % 97).toDouble)) ++
      Seq((1000L, "tiny", 1.0), (1001L, "tiny", 2.0))
    val df = rows.toDF("doc_id", "group", "score")
    val got = graft.pipeline.Curation.conformalCoverage(
        df, "group", col("score"), alpha = 0.1, calFrac = 0.3)
      .collect().map(r => r.getString(0) -> r).toMap
    val big = got("big")
    assert(!big.isNullAt(4), big)
    val cov = big.getDouble(4)
    assert(cov >= 0.75 && cov <= 1.0, s"coverage $cov")
    // tiny: 0-2 calibration rows -> corrected rank unreachable -> NULL
    if (got.contains("tiny")) {
      val tiny = got("tiny")
      assert(tiny.isNullAt(4) || tiny.getDouble(4) >= 0.0, tiny)
    }
  }

  test("tailIndex: Hill estimate matches the hand fold; scale-invariant") {
    def qln(x: Double): Double = math.floor(math.log(x) * 1.0e9) / 1.0e9
    val vals = Seq(100.0, 50.0, 20.0, 5.0, 1.0)
    val expSum = (qln(100.0) - qln(20.0)) + (qln(50.0) - qln(20.0))
    val r = graft.pipeline.Curation.tailIndex(
      vals.toDF("value"), col("value"), k = 2).collect()(0)
    assert(r.getInt(0) == 2 && r.getLong(1) == 3L && r.getDouble(2) == 20.0)
    assert(r.getDouble(3) == 2.0 / expSum, r)
    // Hill is scale-invariant: 1000x the data, same alpha-hat (the
    // quantized-log grid shifts both terms of each difference equally
    // only up to the 1e-9 floor — allow one quantum per term)
    val r2 = graft.pipeline.Curation.tailIndex(
      vals.map(_ * 1000.0).toDF("value"), col("value"), k = 2).collect()(0)
    assert(math.abs(1.0 / r2.getDouble(3) - 1.0 / r.getDouble(3)) < 1e-8, r2)
    // fewer than k+1 positive values -> NULL alpha
    val r3 = graft.pipeline.Curation.tailIndex(
      Seq(5.0, 1.0).toDF("value"), col("value"), k = 2).collect()(0)
    assert(r3.isNullAt(3), r3)
  }

  test("SparkEntry.tableCache: LRU-bounded, scans evicted past the cap") {
    val base = java.nio.file.Files.createTempDirectory("graft_tc").toString
    val one = Seq((1L, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    (0 until SparkEntry.TableCacheMax + 5).foreach { i =>
      one.write.mode("overwrite").parquet(s"$base/d$i/documents.parquet")
      assert(SparkEntry.t(s"$base/d$i", "documents").count() == 1L)
    }
    assert(SparkEntry.tableCacheSize <= SparkEntry.TableCacheMax,
      s"tableCache grew past the cap: ${SparkEntry.tableCacheSize}")
  }
}
