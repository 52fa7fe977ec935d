package graft

import graft.pipeline.Contracts
import org.apache.spark.sql.functions._

/** Pins the approximate-contract gates (q157-q160): the verdicts hold on
  * real sketch runs at genuinely approximate settings, AND the verdict
  * predicate goes FALSE on out-of-bound ranks — a gate that cannot fail
  * gates nothing.
  */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  test("rank-bound verdict flags out-of-bound ranks and passes in-bound ones") {
    // (below, leq, p, n): rank interval [below+1, leq] vs
    // [floor((p-e)n), ceil((p+e)n)] at e = 0.05, n = 1000 => p=0.5 gives
    // [450, 550]
    val cases = Seq(
      (449L, 450L, 0.5, 1000L, true),   // rank 450 touches the lower edge
      (550L, 551L, 0.5, 1000L, false),  // rank 551: one past the upper edge
      (448L, 449L, 0.5, 1000L, false),  // entirely below
      (551L, 552L, 0.5, 1000L, false),  // entirely above
      (499L, 500L, 0.5, 1000L, true),   // dead center
      (0L, 1L, 0.0, 1000L, true)        // p=0 edge: min value rank 1
    ).toDF("below", "leq", "p", "n", "expect")
    val out = cases.withColumn("got",
      Contracts.rankBoundVerdict(col("below"), col("leq"), col("p"), 0.05, col("n")))
      .collect()
    out.foreach(r => assert(r.getBoolean(5) == r.getBoolean(4), s"case $r"))
  }

  test("GK rank contract degrades to an empty verdict frame on zero rows") {
    val allNull = Seq[(Long, Option[Double])]((1L, None), (2L, None))
      .toDF("id", "x")
    val out = Contracts.gkRankContract(allNull, col("x"), nBins = 4, relErr = 0.05)
    assert(out.columns.toSeq == Seq("j", "p", "within_bound"))
    assert(out.collect().isEmpty)
    assert(Contracts.gkRankContract(allNull.limit(0), col("x"), 4, 0.05)
      .collect().isEmpty)
  }

  test("GK rank contract holds at relErr=0.05 on a skewed column") {
    val df = (1 to 5000).map(i => (i.toLong, math.pow(i.toDouble, 2.0)))
      .toDF("id", "x")
    val out = Contracts.gkRankContract(df, col("x"), nBins = 10, relErr = 0.05)
      .collect()
    assert(out.length == 11)
    assert(out.forall(_.getAs[Boolean]("within_bound")))
  }

  test("SpaceSaving contract holds at capacity far below vocabulary") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: term t_k with frequency ~ 1/k over a 200-term vocabulary
    val docs = (1L to 300L).map { i =>
      val words = Seq.fill(40)("t" + (math.sqrt(rnd.nextInt(40000)).toInt + 1))
      (i, words.mkString(" "), "en", if (i % 2 == 0) "a" else "b")
    }.toDF("doc_id", "text", "lang", "source")
    val out = Contracts.spaceSavingContract(docs, capacity = 8).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Boolean]("all_within_bounds") &&
      r.getAs[Boolean]("all_heavy_present")))
    assert(out.forall(_.getAs[Long]("n_terms") == 150L * 40L))
    // partitioning-independent verdicts (the whole point of gating the
    // contract instead of the summary)
    val out7 = Contracts.spaceSavingContract(docs.repartition(7), capacity = 8)
      .collect()
    assert(out7.forall(r => r.getAs[Boolean]("all_within_bounds") &&
      r.getAs[Boolean]("all_heavy_present")))
  }

  test("percentile_approx contract holds at accuracy 10") {
    val docs = (1L to 2000L).map(i =>
      (i, "x", "en", "s" + (i % 3), (i * i % 997).toInt))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("score", col("n_chars").cast("long"))
    val out = Contracts.percentileApproxContract(
      docs, Seq(0.25, 0.5, 0.75), accuracy = 10).collect()
    assert(out.length == 9)
    assert(out.forall(_.getAs[Boolean]("within_bound")))
  }

  test("windowed GK contract holds per window at accuracy 10") {
    val hourUs = 3600000000L
    val ev = (1 to 4000).map { i =>
      (i.toLong, (i % 5) * hourUs * 1000L + i * 1000000L, (i * 37 % 499).toDouble)
    }.toDF("event_id", "ts", "value")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val out = Contracts.windowedQuantilesContract(
      ev, "event_time", col("value"), "1 hour", Seq(0.25, 0.5, 0.75),
      accuracy = 10).collect()
    assert(out.nonEmpty && out.length % 3 == 0)
    assert(out.forall(_.getAs[Boolean]("within_bound")))
  }

  test("HLL distinct contract: bound holds per key; all-NULL key is (0, true)") {
    val ev = ((1 to 2000).map(i => ("t" + (i % 2), Some((i % 97).toLong))) ++
      Seq(("t9", None: Option[Long]), ("t9", None: Option[Long])))
      .toDF("event_type", "user_id")
    val out = Contracts.hllDistinctContract(
        ev, "event_type", col("user_id"), rsd = 0.05, bound = 0.15)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // NULL values skip in both distinct aggregates: |0 - 0| <= 0.15*0 holds
    assert(out("t9") == ((0L, true)))
    assert(out("t0")._1 == 97L && out("t1")._1 == 97L) // exact side is exact
    assert(out.values.forall(_._2)) // rsd=0.05 estimate within the 15% bound
  }

  test("CMS contract: never-underestimate holds under forced collisions") {
    // width 1 is the degenerate total-collision sketch: est = N for every
    // key -- the never-under theorem still holds and nothing overshoots
    // the (vacuously huge) 2N bound
    val d = Seq((1L, "a a a b", "en", "s"), (2L, "b c", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val w1 = Contracts.cmsContract(d, width = 1, depth = 1).collect()(0)
    assert(w1.getLong(0) == 3L && w1.getLong(1) == 6L)
    assert(w1.getBoolean(2) && w1.getLong(3) == 0L)
    // a real squeeze: 40 keys into 4 buckets, 3 rows -- theorem holds,
    // overshoot census bounded by the key count
    val many = (1L to 40L).map(i => (i, ("k" + i + " ") * (1 + (i % 7)).toInt, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val sq = Contracts.cmsContract(many, width = 4, depth = 3).collect()(0)
    assert(sq.getLong(0) == 40L && sq.getBoolean(2))
    assert(sq.getLong(3) >= 0L && sq.getLong(3) <= 40L)
    // empty corpus: zero counts, vacuous verdicts
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val e = Contracts.cmsContract(empty).collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.getBoolean(2)
      && e.getLong(3) == 0L)
  }

  test("HLL distinct contract: tight rsd=0.01 point holds its 3x margin") {
    // the q181 knob: 16x the registers of rsd=0.05 must buy a 5x tighter
    // bound on a cardinality (10k) well past the linear-counting regime
    val ev = (1 to 40000).map(i => ("t" + (i % 2), (i % 9973).toLong))
      .toDF("event_type", "user_id")
    val out = Contracts.hllDistinctContract(
        ev, "event_type", col("user_id"), rsd = 0.01, bound = 0.03)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("t0")._1 == 9973L || out("t1")._1 == 9973L)
    assert(out.values.forall(_._2))
  }
}
