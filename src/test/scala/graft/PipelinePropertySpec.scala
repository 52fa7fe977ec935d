package graft

import graft.pipeline.{Curation, Funnel, TextAnalysis}
import org.apache.spark.sql.functions._

/** Randomized property tests (seeded, deterministic) for the round-9
  * text/robust-stats operator family: each operator must satisfy its
  * algebraic invariants on arbitrary corpora, not just the
  * hand-computed spec cases. */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260814L)

  private def randomCorpus(maxDocs: Int = 20, maxLen: Int = 30): Seq[(Long, String)] = {
    val nDocs = 1 + rng.nextInt(maxDocs)
    (1L to nDocs).map { i =>
      val len = rng.nextInt(maxLen + 1)
      val toks = Seq.fill(len)(s"w${rng.nextInt(8)}")
      (i, toks.mkString(" "))
    }
  }

  test("chunkDocs: stride == window reconstructs exactly; chunks always cover") {
    (1 to 8).foreach { _ =>
      val corpus = randomCorpus()
      val d = corpus.toDF("doc_id", "text")
      val w = 1 + rng.nextInt(6)
      // stride == window: chunks partition the token sequence exactly
      val whole = TextAnalysis.chunkDocs(d, w, w).collect()
        .groupBy(_.getLong(0)).map { case (id, rows) =>
          id -> rows.sortBy(_.getInt(1)).map(_.getString(4)).mkString(" ")
        }
      corpus.foreach { case (id, text) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) assert(!whole.contains(id))
        else assert(whole(id) == toks.mkString(" "), s"doc $id")
      }
      // any stride: chunk token windows cover every position
      val s = 1 + rng.nextInt(w)
      val cov = TextAnalysis.chunkDocs(d, w, s).collect()
        .groupBy(_.getLong(0)).map { case (id, rows) =>
          id -> rows.map(r => (r.getLong(2), r.getLong(2) + r.getLong(3))).toSeq
        }
      corpus.foreach { case (id, text) =>
        val n = text.trim.split("\\s+").count(_.nonEmpty)
        if (n > 0) {
          val ranges = cov(id)
          assert((0L until n).forall(p => ranges.exists(r => p >= r._1 && p < r._2)),
            s"doc $id not covered")
        }
      }
    }
  }

  test("tokenEntropy bounds: 0 <= H <= ln(n_tokens); lmScore always negative or zero") {
    (1 to 8).foreach { _ =>
      val d = randomCorpus().toDF("doc_id", "text")
      TextAnalysis.tokenEntropy(d).collect().foreach { r =>
        val (n, h) = (r.getLong(1), r.getDouble(2))
        assert(h >= -1e-9 && h <= math.log(n.toDouble) + 1e-9, s"H=$h n=$n")
      }
      TextAnalysis.lmScore(d).collect().foreach { r =>
        assert(r.getDouble(2) <= 1e-12, s"lm=${r.getDouble(2)}")
      }
      TextAnalysis.lmScoreBigram(d).collect().foreach { r =>
        assert(r.getDouble(2) <= 1e-12, s"lm2=${r.getDouble(2)}")
      }
    }
  }

  test("trimmedMean sits within [min, max]; robust rz centers around 0") {
    (1 to 8).foreach { _ =>
      val n = 2 + rng.nextInt(40)
      val docs = (1L to n).map(i =>
        (i, s"s${rng.nextInt(3)}", rng.nextInt(1000).toLong))
        .toDF("doc_id", "source", "score")
      Curation.trimmedMeanBySource(docs, p = 0.25).collect().foreach { r =>
        val src = r.getString(0)
        val vals = docs.filter(col("source") === src)
          .collect().map(_.getLong(2))
        assert(r.getDouble(3) >= vals.min.toDouble &&
          r.getDouble(3) <= vals.max.toDouble)
      }
      // robust z: at least half of each source's docs lie within 1 MAD
      // unit when MAD > 0 (the definition of the median of deviations)
      val rz = Curation.robustStandardizeBySource(docs).collect()
        .filter(r => !r.isNullAt(5)).groupBy(_.getString(1))
      rz.foreach { case (_, rows) =>
        val within = rows.count(r => math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
        assert(within * 2 >= rows.length)
      }
    }
  }

  test("keySkew shares sum to <= 1 and ranks are contiguous from 1") {
    (1 to 5).foreach { _ =>
      val n = 1 + rng.nextInt(200)
      val d = Seq.fill(n)(rng.nextInt(12).toLong).map(Tuple1(_)).toDF("user_id")
      val rows = Funnel.keySkew(d, "user_id", 5).collect()
      val shares = rows.map(_.getDouble(2))
      assert(shares.sum <= 1.0 + 1e-9)
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
      // counts are non-increasing with rank
      val byRank = rows.sortBy(_.getInt(3)).map(_.getLong(1))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("oovRate: reference == target gives all-zero rates; disjoint gives all-one") {
    (1 to 5).foreach { _ =>
      val corpus = randomCorpus()
      val d = corpus.toDF("doc_id", "text")
      TextAnalysis.oovRate(d, d).collect().foreach(r =>
        assert(r.getDouble(3) == 0.0))
      val disjoint = Seq((99L, "zzz qqq")).toDF("doc_id", "text")
      TextAnalysis.oovRate(d, disjoint).collect().foreach(r =>
        assert(r.getDouble(3) == 1.0))
    }
  }

  test("auc invariants: class-complement and score-negation flip around 0.5") {
    import graft.pipeline.RankStats
    (1 to 6).foreach { _ =>
      val rows = (1 to 60 + rng.nextInt(200)).map { _ =>
        (rng.nextInt(25).toDouble, rng.nextBoolean())
      }
      // guarantee both classes
      val d = (rows :+ ((99.0, true)) :+ ((98.0, false))).toDF("s", "y")
      val a = RankStats.auc(d, "s", col("y")).collect()(0).getDouble(2)
      // swapping the class label mirrors AUC around 1/2
      val aSwap = RankStats.auc(d, "s", !col("y")).collect()(0).getDouble(2)
      assert(math.abs(a + aSwap - 1.0) < 1e-12)
      // negating the score mirrors AUC around 1/2
      val neg = d.withColumn("s", -col("s"))
      val aNeg = RankStats.auc(neg, "s", col("y")).collect()(0).getDouble(2)
      assert(math.abs(a + aNeg - 1.0) < 1e-12)
      // MWU z flips sign under class swap (tie machinery is symmetric)
      val z = RankStats.mannWhitney(d, "s", col("y")).collect()(0)
      val zSwap = RankStats.mannWhitney(d, "s", !col("y")).collect()(0)
      if (!z.isNullAt(3))
        assert(math.abs(z.getDouble(3) + zSwap.getDouble(3)) < 1e-9)
      // best threshold's F1 is attainable: re-evaluating it agrees
      val bt = RankStats.bestThreshold(d, "s", col("y")).collect()(0)
      val ce = RankStats.classifierEval(d, "s", col("y"), bt.getDouble(0))
        .collect()(0)
      assert(math.abs(bt.getDouble(6) - ce.getDouble(7)) < 1e-12)
    }
  }
}
