package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FULL-PIPELINE soak at 5M docs (r11 verdict #5 — 10× the StressDocs
  * scale, in ONE session): curate → auto-guarded near-dup dedup →
  * components → leakage-free split → sequence packing, recording
  * per-stage wall, PEAK heap (sampled by a daemon thread), and the auto
  * pair-budget guard's firings (visible as Dedup logWarnings at WARN
  * level). The corpus is the measured pathological shape at 10× its r11
  * size: sf0.1's 5k documents replicated 1000× — 10% verbatim copies
  * (exact-dup work) + 90% suffix-perturbed near-copies, so every
  * original's 1000 copies form one near-dup cluster and the UNCAPPED
  * band join would be quadratic per bucket (the guard's reason to
  * exist). args: [replication] [docsParquet] [mode]
  *
  * mode=zipf (r12 verdict #5 — the uniform replication above is
  * skew-FREE): ADVERSARIAL source/key skew on top of the same volume —
  * one mega-source absorbs ~50% of all docs (the Zipf head a real
  * crawl has), and the first 100 originals collapse onto ONE verbatim
  * text, a ~100k-member near-clique hot dedup key (uncapped pairs
  * ≈ 5e9 from one bucket). Recorded beyond the uniform run: whether
  * AQE's skew-join split actually ENGAGES on the pair join (a
  * QueryExecutionListener greps executed plans for skew=true) and the
  * components pointer-jumping ROUND COUNT under the giant near-clique
  * (must stay O(log n) — doubling shortcuts, never diameter). */
object SoakPipeline {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 1000
    val src = if (args.length > 1) args(1)
      else "/root/testdata/sf0.1/documents.parquet"
    val zipf = args.length > 2 && args(2) == "zipf"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    // WARN so the auto-guard / auto-rounds logWarnings land in the soak log
    spark.sparkContext.setLogLevel("WARN")
    // did AQE's skew handling fire anywhere? (skew=true appears in the
    // executed plan's SortMergeJoin/ShuffledHashJoin nodes it split)
    @volatile var skewJoins = 0
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          if (qe.executedPlan.toString.contains("skew=true")) skewJoins += 1
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val rt = Runtime.getRuntime
    @volatile var peakHeap = 0L
    val sampler = new Thread(() => {
      while (true) {
        peakHeap = math.max(peakHeap, rt.totalMemory - rt.freeMemory)
        Thread.sleep(200)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t00 = System.nanoTime()
    val base = spark.read.parquet(src)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .withColumn("__r", explode(expr(s"sequence(0, ${rep - 1})")))
      .select((col("doc_id") * rep + col("__r")).as("doc_id"),
        when(col("__r") % 10 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" v"), col("__r"))).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + when(col("__r") % 10 === 0, 0)
          .otherwise(length(concat(lit(" v"), col("__r"))))).as("n_chars"),
        col("__r"))
    val hotText = "the hot duplicate every crawl has a hundred thousand " +
      "copies of lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua"
    val docs = (if (!zipf) base else base.select(col("doc_id"),
        // first 100 originals -> ONE verbatim text: a 100·rep-member
        // near-clique on a single dedup key
        when(col("doc_id") < 100L * rep, lit(hotText))
          .otherwise(col("text")).as("text"),
        col("lang"),
        // Zipf head: half of ALL docs land in one mega-source
        when(pmod(hash(col("doc_id")), lit(2)) === 0, lit("megasource"))
          .otherwise(col("source")).as("source"),
        when(col("doc_id") < 100L * rep, lit(hotText.length))
          .otherwise(col("n_chars")).cast("int").as("n_chars"), col("__r")))
      .drop("__r")
      .persist()
    println(s"[soak] docs=${docs.count()} (rep=$rep, zipf=$zipf)")
    if (zipf) {
      val mega = docs.filter(col("source") === "megasource").count()
      val hot = docs.filter(col("text") === hotText).count()
      println(s"[soak] zipf shape: megasource=$mega hot_key_members=$hot")
    }
    def stage(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"($c rows, peak heap ${peakHeap / (1L << 30)}%d GiB)")
    }
    val bench = docs.filter(col("doc_id") % (5000L * rep / 20) === 0)
    stage("curate")(graft.pipeline.Curation.curate(docs, bench).count())
    // auto-guarded near-dup pair graph: NO manual bucketCap — the
    // Σ s(s−1)/2 budget guard must derive one itself (watch for the
    // 'skew guard' logWarning above)
    val pairs = graft.pipeline.Dedup.nearDupPairs(docs)
    stage("neardup_pairs_autoguard")(pairs.count())
    // componentsRun so the pointer-jumping ROUND COUNT is visible: under
    // the zipf near-clique it must stay O(log n) (doubling shortcuts).
    // Construction goes INSIDE the timed thunk — the label-propagation
    // rounds execute eagerly (checkpointed per round) at build time, so
    // timing only the final count under-reported the stage (r11–r13
    // tables: ~1–2 s; the rounds' wall sat unattributed in TOTAL)
    var compsRun: graft.pipeline.Dedup.ComponentsRun = null
    stage("components") {
      compsRun = graft.pipeline.Dedup.componentsRun(
        docs.select(col("doc_id")), pairs)
      compsRun.labels.filter(col("keep")).count()
    }
    println(s"[soak] components rounds=${compsRun.rounds} " +
      s"converged=${compsRun.converged}")
    stage("leak_free_split")(graft.pipeline.Dedup.leakFreeSplit(
      docs, 0.1, 0.1, "soak1").count())
    // chunk-granularity dedup under a BOILERPLATE-heavy corpus (r13
    // verdict #3): every megasource doc (~50% of the corpus in zipf
    // mode) gets the SAME exactly-10-token header prepended, so one
    // chunk key owns a ~2.5M-row group — the election min must reduce
    // map-side (it is map-combinable by construction; this measures it
    // rather than asserts it, the q52-at-sf1 lesson). Both election
    // paths run: the text-keyed gated form and the hashKey 100 TB
    // shuffle form, whose retention totals must agree exactly.
    val header = "common header tokens one two three four five six seven"
    val headered = docs.select(col("doc_id"),
      when(col("source") === "megasource",
        concat(lit(header + " "), col("text")))
        .otherwise(col("text")).as("text"))
    if (zipf) println(s"[soak] hot-chunk group size = " +
      s"${docs.filter(col("source") === "megasource").count()} " +
      "(docs sharing the header chunk)")
    // the timed thunk must AGGREGATE the report columns: a bare
    // count() on chunkDedup's output is free — Catalyst eliminates the
    // final left join under count (the rollup side is unique on
    // doc_id, distinct-key propagation), so the stage would measure an
    // empty plan while the election ran unattributed later
    val chunked = graft.pipeline.Dedup.chunkDedup(headered, chunkTokens = 10)
    var keptText: org.apache.spark.sql.Row = null
    stage("chunk_dedup_boilerplate") {
      keptText = chunked
        .agg(count(lit(1)), sum("n_chunks"), sum("kept_tokens"),
          sum("n_tokens")).head()
      keptText.getLong(0)
    }
    val chunkedHash = graft.pipeline.Dedup.chunkDedup(headered,
      chunkTokens = 10, hashKey = true)
    var keptHash: org.apache.spark.sql.Row = null
    stage("chunk_dedup_hashkey") {
      keptHash = chunkedHash
        .agg(count(lit(1)), sum("n_chunks"), sum("kept_tokens"),
          sum("n_tokens")).head()
      keptHash.getLong(0)
    }
    println(s"[soak] chunk_dedup chunks=${keptText.getLong(1)} " +
      s"kept_tokens/total: text-keyed " +
      s"${keptText.getLong(2)}/${keptText.getLong(3)}, hash-keyed " +
      s"${keptHash.getLong(2)}/${keptHash.getLong(3)} " +
      s"(must match: ${keptText == keptHash})")
    // same count-elimination trap as the chunk stages (found r14): a
    // bare count() prunes the window cumsum away entirely (ColumnPruning
    // drops a Window no one references — it cannot change cardinality),
    // so r11–r13 tables reported a scan-only 0.1 s here; aggregating the
    // pack columns forces the real shard shuffle + per-shard sort
    stage("pack_sequences")(graft.pipeline.Sampling.packSequences(
        docs, 2048L, 32, "soakpk")
      .agg(count(lit(1)), max("pack"), max("pack_offset")).head().getLong(0))
    println(f"[soak] TOTAL: ${(System.nanoTime() - t00) / 1e9}%.1f s, " +
      f"peak heap ${peakHeap / (1L << 30)}%d GiB, " +
      f"max heap ${rt.maxMemory / (1L << 30)}%d GiB, " +
      s"aqe_skew_split_queries=$skewJoins")
    spark.stop()
  }
}
