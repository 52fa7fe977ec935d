package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the document-similarity family: runs the dedup
  * pipeline operators on an enlarged corpus (dev tool; pass the parquet
  * path, e.g. a 10x-replicated documents table). */
object StressDocs {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/sfbig_documents.parquet"
    // optional second arg: comma-separated operator names to run (default all)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(path).persist()
    println(s"docs=${docs.count()}")
    val ran = scala.collection.mutable.Set[String]()
    def time(name: String)(f: => Long): Unit = {
      ran += name
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        val c = f
        println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
    }
    time("exact_dedup")(graft.pipeline.Dedup.exact(docs).count())
    time("minhash_lsh")(graft.pipeline.Dedup.minhashLsh(docs).count())
    time("neardup_pipeline")(graft.pipeline.Dedup.nearDupPairs(docs).count())
    time("neardup_capped")(
      graft.pipeline.Dedup.nearDupPairs(docs, bucketCap = Some(20)).count())
    time("simhash_pairs")(graft.pipeline.Dedup.simhashPairs(docs).count())
    time("ngram_jaccard")(graft.pipeline.Dedup.ngramJaccard(docs).count())
    time("repetition")(graft.pipeline.TextAnalysis.repetition(docs).count())
    time("bpe_tokens")(graft.pipeline.TextAnalysis.bpeTokens(docs).count())
    time("contamination_score")(graft.pipeline.Dedup.contaminationScore(
      docs, docs.filter(col("doc_id") < 20), n = 5).count())
    time("span_dedup")(graft.pipeline.Dedup.spanDedup(docs).count())
    time("pack_sequences")(graft.pipeline.Sampling.packSequences(
      docs, 2048L, 32, "pk").count())
    time("top_terms")(graft.pipeline.TextAnalysis.topTerms(docs).count())
    time("curate")(graft.pipeline.Curation.curate(
      docs, docs.filter(col("doc_id") < 20)).count())
    // bipartite hot-bucket sweep: on a replicated corpus every band bucket
    // holds all copies of a doc, so the uncapped A x B band join emits
    // |A_bucket| x |B_bucket| candidates per bucket; the cap bounds each
    // bucket's contribution at cap^2 regardless of replication factor
    time("cross_dedup_uncapped")(graft.pipeline.Dedup.crossNearDup(
      docs.filter(col("doc_id") % 20 === 0), docs).count())
    time("cross_dedup_capped")(graft.pipeline.Dedup.crossNearDup(
      docs.filter(col("doc_id") % 20 === 0), docs, bucketCap = Some(20)).count())
    // components over the replicated corpus's near-dup graph: clusters are
    // near-cliques, so rounds-to-fixpoint should stay ~2-3 regardless of
    // corpus size; the count is the surviving canonical docs
    time("components_keep")(graft.pipeline.Dedup.components(
      docs.select(col("doc_id")),
      graft.pipeline.Dedup.nearDupPairs(docs, bucketCap = Some(20)))
      .filter(col("keep")).count())
    // novelty: corpus-vs-corpus gram join — per-side distinct first, so a
    // replicated corpus's hot grams collapse to single reference rows
    time("novelty")(graft.pipeline.Dedup.novelty(
      docs.filter(col("doc_id") % 20 === 0), docs, n = 5).count())
    // distributed BPE training: the corpus pass is the word count; the 8
    // merge rounds after it run on the vocabulary-sized table only
    time("bpe_train")(graft.pipeline.TextAnalysis.bpeTrain(docs, 8).count())
    // round-9 text/LM family
    time("lm_score")(graft.pipeline.TextAnalysis.lmScore(docs).count())
    time("lm_bigram")(graft.pipeline.TextAnalysis.lmScoreBigram(docs).count())
    time("token_entropy")(graft.pipeline.TextAnalysis.tokenEntropy(docs).count())
    time("chunk_docs")(graft.pipeline.TextAnalysis.chunkDocs(docs, 64, 48).count())
    time("tfidf_topk")(graft.pipeline.TextAnalysis.tfidfTopK(docs, 5).count())
    time("pmi")(graft.pipeline.TextAnalysis.pmiCollocations(docs, 50, 5L).count())
    time("oov_rate")(graft.pipeline.TextAnalysis.oovRate(docs,
      docs.filter(col("doc_id") % 10 < 3)).count())
    time("zipf_fit")(graft.pipeline.TextAnalysis.zipfFit(docs).count())
    time("lm_filter")(graft.pipeline.Curation.lmFilter(docs, 0.3).count())
    // round-10 text/dedup family
    time("dup_ngram_rate")(graft.pipeline.Dedup.dupNgramRate(docs, n = 8).count())
    // winnowing on a replicated corpus: every fingerprint's df is >= the
    // replication factor, so the df cap is the load-bearing guard here
    time("winnowing_pairs")(graft.pipeline.Dedup.winnowingPairs(
      docs, k = 4, w = 4, dfCap = 20, minShared = 2).count())
    time("winnowing_containment")(graft.pipeline.Dedup.winnowingContainment(
      docs, k = 4, w = 4, dfCap = 20, minShared = 2).count())
    time("decontaminate_bloom")(graft.pipeline.Dedup.decontaminateBloom(
      docs, docs.filter(col("doc_id") < 20), n = 5).count())
    time("rrf_fusion")(graft.pipeline.TextAnalysis.rrfFusion(
      docs, Seq("spark", "query", "fast"), k = 25, kList = 50).count())
    time("mixed_lang")(graft.pipeline.TextAnalysis.mixedLang(docs, 16).count())
    time("curriculum_mix")(graft.pipeline.Curation.curriculumMix(
      docs, col("n_chars").cast("double"), 2.0, "cur1").count())
    time("leak_free_split")(graft.pipeline.Dedup.leakFreeSplit(
      docs, 0.1, 0.1, "lfs1").count())
    // the bucketCap guard: on this 10x-replicated corpus the uncapped
    // pair graph is quadratic per LSH bucket (911 s measured); capped,
    // the split costs what components_keep costs
    time("leak_free_split_capped")(graft.pipeline.Dedup.leakFreeSplit(
      docs, 0.1, 0.1, "lfs1", bucketCap = Some(20)).count())
    time("stream_mixed_lang")(graft.streaming.StreamingHist
      .mixedLangStream(docs, 16).count())
    time("repeated_spans")(
      graft.pipeline.Dedup.repeatedSpans(docs, 8).count())
    time("repeated_span_removal")(
      graft.pipeline.Dedup.removeRepeatedSpans(docs, 8).count())
    // a typo in the filter arg must fail loudly, not silently run nothing
    only.foreach { sel =>
      val unknown = sel -- ran
      if (unknown.nonEmpty) {
        System.err.println(s"unknown operator(s): ${unknown.mkString(", ")}; " +
          s"known: ${ran.toSeq.sorted.mkString(", ")}")
        spark.stop()
        sys.exit(1)
      }
    }
    spark.stop()
  }
}
