package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity, TextAnalysis}

/** Red pins for the round-15 optimization internals: each test locks
  * the EQUIVALENCE or isolation property an optimization depends on,
  * on inputs small enough to enumerate. */
class R15OptimizationSpec extends SparkSpec {
  import spark.implicits._

  test("RelCache.persist materializes the pin before publishing it") {
    val df = spark.range(0, 1000).select(col("id").as("r15_persist_probe"),
      (col("id") * 3).as("v"))
    val pinned = graft.util.RelCache.persist(df)
    // eager single-flight: by the time persist returns, the relation's
    // storage is populated — a concurrent consumer can never convoy on
    // partition loading locks (the r15 cold-wall finding)
    val rdd = pinned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cacheBuilder.cachedColumnBuffers
    }
    assert(rdd.isDefined, "pinned relation must plan as InMemoryTableScan")
    val cachedParts = spark.sparkContext.getPersistentRDDs.values
      .find(_.id == rdd.get.id)
    assert(cachedParts.isDefined)
    // every partition is already in the block manager
    val bm = org.apache.spark.SparkEnv.get.blockManager
    val n = rdd.get.getNumPartitions
    (0 until n).foreach { i =>
      val bid = org.apache.spark.storage.RDDBlockId(rdd.get.id, i)
      assert(bm.getStatus(bid).nonEmpty,
        s"partition $i not materialized at persist() return")
    }
  }

  test("components memo: two distinct tiny graphs never share labels") {
    // r14 verdict #6 'done' criterion — the memo key is now the
    // canonicalized plan OBJECTS, so equal-looking but different
    // graphs must resolve to different entries
    val nodesA = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairsA = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val nodesB = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairsB = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val a = Dedup.components(nodesA, pairsA).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.components(nodesB, pairsB).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(2L) == 1L && a(3L) == 3L && a(4L) == 4L)
    assert(b(2L) == 2L && b(3L) == 3L && b(4L) == 3L)
  }

  test("components memo: identical graph plans share one memoized run") {
    val nodes = Seq(10L, 11L, 12L).toDF("doc_id")
    val pairs = Seq((10L, 11L)).toDF("doc_a", "doc_b")
    val first = Dedup.components(nodes, pairs)
    val second = Dedup.components(
      Seq(10L, 11L, 12L).toDF("doc_id"), Seq((10L, 11L)).toDF("doc_a", "doc_b"))
    // same canonicalized plans -> the memo returns the SAME DataFrame
    assert(first eq second)
  }

  test("knnGraph lead-window init emits exactly the rank-offset join's edges") {
    // the r15 init rewrite's equivalence, pinned on a corpus small
    // enough to enumerate: both formulations connect each vector to
    // the next c rows of its (table, bucket) chain
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(16)(j => (if ((i + j) % 3 == 0) 1.0f else -1.0f)))
    }.toDF("vec_id", "embedding")
    val tables = 2; val bits = 4; val c = 3
    val bk = emb.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            Similarity.lshTableBucket(col("embedding"), t, bits).as("bucket"))): _*))
          .as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tbl"), col("bucket")).orderBy(col("vec_id"))
    val withRn = bk.withColumn("__rn", row_number().over(rn))
    val viaJoin = withRn
      .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"),
        explode(expr(s"sequence(__rn + 1, __rn + $c)")).as("__trn"))
      .join(withRn.select(col("vec_id").as("neighbor_id"), col("tbl"),
        col("bucket"), col("__rn").as("__trn")), Seq("tbl", "bucket", "__trn"))
      .select(col("query_id"), col("neighbor_id"))
    val viaLead = withRn
      .select(col("vec_id").as("query_id"),
        array((1 to c).map(j => lead(col("vec_id"), j).over(rn)): _*).as("__nx"))
      .select(col("query_id"), explode(col("__nx")).as("neighbor_id"))
      .filter(col("neighbor_id").isNotNull)
    assert(viaJoin.exceptAll(viaLead).count() == 0L)
    assert(viaLead.exceptAll(viaJoin).count() == 0L)
    assert(viaLead.count() > 0L)
  }

  test("rrfFusion fused single pass matches the two-pass reference") {
    // r15 rewrote the two headRanks passes into one shared fold +
    // in-row rank fusion; replay the OLD two-pass form on a corpus
    // with head disagreement and require identical output
    val docs = Seq(
      (1L, "spark fast spark query"),
      (2L, "query query query fast"),
      (3L, "spark spark spark spark fast"),
      (4L, "fast engine"),
      (5L, "spark query fast spark query fast filler filler filler")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "query", "fast")
    val out = TextAnalysis.rrfFusion(docs, terms, k = 4, kList = 4)
      .orderBy("rank").collect()
    // reference: independent bm25 / tf-idf heads, posexplode ranks,
    // full-outer fusion (the pre-r15 shape, spelled directly)
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("__len"),
        explode(expr("""regexp_extract_all(text, '\\S+', 0)""")).as("term"))
    val stats = docs.filter(col("text").isNotNull)
      .agg(count(lit(1)).as("__nd"),
        sum(regexp_count(col("text"), lit("\\S+")).cast("long")).as("__tl"))
    val tf = base.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("__len"), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val joined = tf.join(broadcast(dfRel), "term").crossJoin(broadcast(stats))
    val idfA = floor(log(lit(1.0) +
        (col("__nd").cast("double") - col("__df").cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5))) * lit(1.0e9)) / lit(1.0e9)
    val denomA = col("__tf").cast("double") + lit(1.2) * (lit(0.25) +
      lit(0.75) * (col("__len").cast("double") /
        (col("__tl").cast("double") / col("__nd").cast("double"))))
    val contribA = idfA * (col("__tf").cast("double") * lit(2.2)) / denomA
    val contribB = col("__tf").cast("double") *
      (floor(log(col("__nd").cast("double") / col("__df").cast("double")) *
        lit(1.0e9)) / lit(1.0e9))
    def headRanks(contrib: org.apache.spark.sql.Column): DataFrame = joined
      .select(col("doc_id"), col("term"), contrib.as("__c"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("__c")))).as("__a"))
      .select(col("doc_id"), aggregate(col("__a"), lit(0.0),
        (acc, x) => acc + x.getField("__c")).as("__s"))
      .agg(graft.functions.TopKByScore.top_k(col("__s"), col("doc_id"), 4)
        .as("__t"))
      .select(posexplode(col("__t")).as(Seq("__p", "__x")))
      .select(col("__x.id").as("doc_id"),
        (col("__p") + lit(1)).cast("long").as("__r"))
    val ra = headRanks(contribA).withColumnRenamed("__r", "__ra")
    val rb = headRanks(contribB).withColumnRenamed("__r", "__rb")
    val fused = ra.join(rb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(60.0) + col("__ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("__rb").cast("double")), lit(0.0)))
          .as("__rrf"))
    val ref = fused.agg(graft.functions.TopKByScore.top_k(
        col("__rrf"), col("doc_id"), 4).as("__t"))
      .select(posexplode(col("__t")).as(Seq("__p", "__x")))
      .select(col("__x.id").as("doc_id"), col("__x.score").as("rrf_score"),
        (col("__p") + lit(1)).cast("int").as("rank"))
      .orderBy("rank").collect()
    assert(out.length == ref.length && out.length == 4)
    out.zip(ref).foreach { case (o, r) => assert(o == r, s"$o != $r") }
  }

  test("cumBeforeCounts memo: same counts plan returns the same pinned relation") {
    def counts() = Seq((0.1, 2L, 1L), (0.5, 1L, 3L), (0.9, 4L, 0L))
      .toDF("__v", "__p", "__n")
    val a = graft.pipeline.RankStats.cumBeforeCounts(counts())
    val b = graft.pipeline.RankStats.cumBeforeCounts(counts())
    assert(a eq b)
    val rows = a.orderBy("__v").collect()
    assert(rows.map(r => (r.getDouble(0), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0.1, 0L, 0L), (0.5, 2L, 1L), (0.9, 3L, 4L)))
  }

  test("graphSearch seed memo: different graphs over one corpus share seeds") {
    val emb = (0L until 30L).map { i =>
      (i, Array.tabulate(16)(j =>
        (if (((i / 5) + j) % 2 == 0) 1.0f else -1.0f) + 0.01f * (i % 5)))
    }.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val g1 = Similarity.knnGraph(emb, 3, rounds = 1)
    val g2 = Similarity.diversifyGraph(emb, g1, r = 2, alpha = 1.2)
    // two searches, different graphs — results may differ, but both
    // must run green off the one memoized seed relation
    val r1 = Similarity.graphSearch(emb, queries, 2, g1, rounds = 2, beam = 4)
    val r2 = Similarity.graphSearch(emb, queries, 2, g2, rounds = 2, beam = 4)
    assert(r1.count() > 0 && r2.count() > 0)
    // and a rounds > 2 search still analyzes + runs (the lineage
    // truncation guard; plan growth would hang analysis long before 6)
    val r6 = Similarity.graphSearch(emb, queries, 2, g1, rounds = 6, beam = 4)
    assert(r6.count() > 0)
  }
}
