package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Full JSON string escape — backslashes, quotes and control chars
    * (exception text routinely carries regexes and tabs). */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // queries are submitted concurrently; FAIR keeps short histogram jobs
      // from queueing behind the long similarity-join stages
      .config("spark.scheduler.mode", "FAIR")
      // At bench scale the per-doc gram-set side of the similarity verify
      // joins (~100 MB) fits in memory: admitting it as a broadcast turns
      // the verify into a single shuffle-free codegen stage. At real scale
      // the same side's size estimate exceeds any threshold and Catalyst
      // falls back to sort-merge — the threshold is the right knob, not a
      // forced broadcast hint.
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/classloading + parquet footers so the first timed
    // query isn't charged session startup: exercise scan + filter +
    // aggregate + shuffle + window machinery once.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_quantity") > 0)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      w.withColumn("r", org.apache.spark.sql.functions.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy("s"))).count()
    }
    // Comparable starting state to the reference (in-memory arrays): pin
    // the input tables in executor memory once, outside the timed region.
    SparkEntry.cacheTables(spark, sfDir)
    // Queries are independent; run them through a bounded pool so Spark's
    // scheduler multiplexes jobs across the cores (individual queries on
    // sf-scale inputs don't saturate the machine; per-query latency is
    // still reported). Wall-clock total is the headline metric.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_POOL", "16").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // Longest-first submission: the iterative/similarity family dominates
    // the critical path; starting it first lets the short histogram queries
    // fill the remaining cores instead of the heavy tail extending the
    // wall. Primary source of truth is the PREVIOUS run's persisted
    // per-query times (bench_out.json) sorted descending — the static list
    // below is only the cold-start fallback (current measured tail, in
    // order: components, BPE train/encode, session paths, containment,
    // PPJoin family, IVF).
    val heavyFallback = Seq("q104_components_keep_by", "q125_bpe_encode_trained",
      "q124_bpe_train", "q115_session_paths", "q112_containment",
      "q43_ngram_jaccard", "q61_neardup_keep", "q54_neardup_pipeline",
      "q52_ann_ivf", "q41_dedup_minhash", "q42_dedup_simhash",
      "q45_ann_bruteforce", "q59_hist_qbins", "q44_embed_neardup")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    def parsePrevTimes(path: String): Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      // the file is our own single-line JSON; the per-query map is the
      // only place "qNN_name":number pairs appear
      "\"(q[0-9]+[A-Za-z0-9_]*)\":([0-9.Ee+-]+)".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    val fallbackRank: Map[String, Double] = heavyFallback.zipWithIndex
      .map { case (n, i) => n -> (heavyFallback.size - i).toDouble }.toMap
    // previous-run times rank what they know; queries ADDED since that
    // run fall back to the static heavy list, not to a flat 0.0 that
    // would schedule a new heavy query last
    def orderOf(times: Map[String, Double]): String => Double =
      name => times.getOrElse(name, fallbackRank.getOrElse(name, 0.0))
    // A failed query must be LOUD: print the stack to stderr and carry the
    // failure into the JSON — a silent -1 count would report a broken query
    // as a fast one.
    val errors = scala.collection.concurrent.TrieMap.empty[String, String]
    // (times, wall, failed-this-pass): a pass's time for a FAILED query is
    // its time-to-failure, which must never win the cross-pass min — a
    // transient crash is not a fast run.
    // Per-query [start, end] offsets (seconds from the pass's t0) ride
    // along with elapsed times: the concurrent wall's CRITICAL PATH is
    // then readable directly from BENCH_rN (which queries span the
    // window, which serialize behind shared artifact builds) instead of
    // needing forensic re-runs — the r12 66 s wall took a round to
    // attribute because only elapsed times were recorded.
    def runPass(rank: String => Double):
        (Map[String, Double], Double, Set[String], Map[String, (Double, Double)]) = {
      val failed = scala.collection.concurrent.TrieMap.empty[String, Unit]
      val t0All = System.nanoTime()
      val futures = SparkEntry.queries.toSeq
        .sortBy { case (name, _) => (-rank(name), name) }
        .map { case (name, fn) =>
          Future {
            // FAIR shares between pools; one pool per query so a long
            // similarity join cannot starve the short histogram jobs
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch {
              case e: Throwable =>
                errors(name) = jsonEscape(e.toString.take(300))
                failed(name) = ()
                System.err.println(s"[bench] QUERY FAILED: $name")
                e.printStackTrace()
            }
            val t1 = System.nanoTime()
            name -> ((t1 - t0) / 1e9, ((t0 - t0All) / 1e9, (t1 - t0All) / 1e9))
          }
        }
      val res = Await.result(Future.sequence(futures), Duration.Inf).toMap
      (res.map { case (n, (t, _)) => n -> t },
        (System.nanoTime() - t0All) / 1e9, failed.keySet.toSet,
        res.map { case (n, (_, span)) => n -> span })
    }
    // Two passes, report the per-query and wall MIN over SUCCESSFUL runs:
    // a co-tenant noise spike during one pass (the BENCH_r06
    // 96.8s-vs-17.4s incident) no longer misgrades the round; pass 2 is
    // also submitted in the exact longest-first order pass 1 just
    // measured. A query that failed in one pass takes its time from the
    // passes that succeeded (and stays in `errors` — loud either way).
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    val (r1, w1, f1, s1) = runPass(orderOf(parsePrevTimes(outPath)))
    // Wall discipline: only a pass with ZERO failures may compete in the
    // wall min — a pass whose heavy query crashed early finishes an
    // artificially short wall that would understate the round. If no pass
    // ran clean, report the WORST wall (pessimistic, and the errors map is
    // loud either way). The reported spans are the WINNING pass's (the
    // one whose wall is published), so the critical path and the
    // headline number describe the same run.
    def wallCand(w: Double, f: Set[String]): Option[Double] =
      if (f.isEmpty) Some(w) else None
    // First-pass vs warm split (r13 verdict #6): pass 1 carries every
    // cold single-flight artifact build (coarse quantizers, PQ/residual
    // codebooks, knn graphs, BPE merges — whichever query arrives first
    // pays it), so its per-query times are NOT comparable round-over-
    // round when rank ordering changes. queries_first_pass and
    // queries_warm (min over passes >= 2, builds all memoized) publish
    // the split: warm is the apples-to-apples search cost, first_pass -
    // warm approximates the build wall a query carried.
    val init = (r1, wallCand(w1, f1), w1, f1, s1, Map.empty[String, Double])
    val (results, cleanWall, worstWall, _, wallSpans, warmMin) =
      (2 to passes).foldLeft(init) {
        case ((accR, accCW, accWW, accF, accS, accWarm), _) =>
          val (r, w, f, s) = runPass(orderOf(r1))
          val merged = accR.map { case (k, v) =>
            val prevOk = !accF.contains(k)
            val curOk = r.contains(k) && !f.contains(k)
            k -> ((prevOk, curOk) match {
              case (true, true) => math.min(v, r(k))
              case (true, false) => v
              case (false, true) => r(k)
              case (false, false) => math.max(v, r.getOrElse(k, v)) // all passes failed: worst time, still in errors
            })
          }
          val warmMerged = r.foldLeft(accWarm) { case (m, (k, v)) =>
            if (f.contains(k)) m
            else m.updated(k, math.min(v, m.getOrElse(k, v)))
          }
          val thisWins = wallCand(w, f).exists(cw => accCW.forall(cw < _))
          val cw = (accCW.toSeq ++ wallCand(w, f).toSeq)
            .reduceOption(math.min(_, _))
          (merged, cw, math.max(accWW, w), accF.intersect(f),
            if (thisWins || (accCW.isEmpty && w > accWW)) s else accS,
            warmMerged)
      }
    val wall = cleanWall.getOrElse(worstWall)
    pool.shutdown()
    // SOLO passes (sequential, machine to itself): per-query times
    // without pool contention — the concurrent map above prices the
    // WALL, but 16 queries racing 32 cores inflate individual timings
    // 3-10x, which made r9->r10 per-query regression attribution
    // unreadable. Since r12 the solo capture is MEDIAN-OF-3 (r11
    // verdict #8: single captures swung 29.7-53 s with page-cache
    // state, confounding round-over-round regression lists): three
    // full sequential passes, each recorded raw alongside the
    // per-query MEDIAN, plus the page cache size read from
    // /proc/meminfo before each pass so a cold-cache capture is
    // distinguishable from a regression. SPARK_GRAFT_BENCH_SOLO sets
    // the pass count (0 skips; default 3).
    def pageCacheKb(): Long = try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("Cached:") =>
          l.split("\\s+")(1).toLong }
        .getOrElse(-1L)
    } catch { case _: Throwable => -1L }
    val soloPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_SOLO", "3").toInt
    val soloCaches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val soloRuns: Seq[Map[String, Double]] = (1 to soloPasses).map { _ =>
      soloCaches += pageCacheKb()
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors.putIfAbsent(name, jsonEscape(e.toString.take(300)))
            System.err.println(s"[bench] SOLO QUERY FAILED: $name")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val solo: Map[String, Double] =
      if (soloRuns.isEmpty) Map.empty
      else soloRuns.head.keys.map { name =>
        val ts = soloRuns.map(_(name)).sorted
        name -> ts(ts.size / 2) // median (middle of 3; lower-middle if even)
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsFirst = r1.filterNot { case (k, _) => f1.contains(k) }
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsWarm = warmMin.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsSolo = solo.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // winning concurrent pass's per-query [start, end] second offsets,
    // rounded to ms — the critical path is the chain of latest-ending
    // spans, readable without re-running anything
    val qsSpans = wallSpans.toSeq.sortBy(_._2._1)
      .map { case (k, (a, b)) =>
        "\"" + k + "\":[" + math.round(a * 1000) / 1000.0 + "," +
          math.round(b * 1000) / 1000.0 + "]" }
      .mkString("{", ",", "}")
    val qsSoloRuns = soloRuns.map(run =>
        run.map { case (k, v) => s"\"" + k + "\":" + v }
          .mkString("{", ",", "}"))
      .mkString("[", ",", "]")
    val cachesJson = soloCaches.mkString("[", ",", "]")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // Self-describing capture context: the add-opens/add-exports flags
    // this JVM actually ran with (their absence degrades the Kryo/Unsafe
    // paths ~8x — see SKILL.md) plus the clean-wall provenance, so a
    // reader can tell a flagged solo capture from a degraded one without
    // reconstructing the command line.
    val jvmFlags = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
        .asScala.filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
        .map(a => "\"" + jsonEscape(a) + "\"").mkString("[", ",", "]")
    }
    val wallKind = if (cleanWall.isDefined) "min_over_clean_passes" else "max_over_failed_passes"
    val json =
      s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"queries_first_pass":$qsFirst,"queries_warm":$qsWarm,"queries_solo":$qsSolo,"queries_solo_runs":$qsSoloRuns,"queries_concurrent_spans":$qsSpans,"page_cache_kb_before_solo":$cachesJson,"errors":$errJson,"sf":"$sfDir","wall_kind":"$wallKind","passes":$passes,"jvm_flags":$jvmFlags}"""
    println(json)
    // Also persist the JSON line: the driver's stdout tail-capture truncates
    // long lines, losing the per-query numbers every round (and the next
    // run's longest-first ordering reads this file back).
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    if (errors.nonEmpty) System.err.println(
      s"[bench] ${errors.size} queries FAILED: ${errors.keys.toSeq.sorted.mkString(", ")}")
    // long-lived drivers release the bounded relation memo explicitly
    graft.pipeline.Dedup.clearCache()
    spark.stop()
  }
}
