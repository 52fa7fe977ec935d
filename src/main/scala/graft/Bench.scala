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
    // Longest-first submission: the similarity/dedup family dominates the
    // critical path; starting it first lets the short histogram queries
    // fill the remaining cores instead of the heavy tail extending the wall.
    val heavy = Seq("q52_ann_ivf", "q54_neardup_pipeline", "q61_neardup_keep",
      "q43_ngram_jaccard", "q41_dedup_minhash", "q42_dedup_simhash",
      "q59_hist_qbins", "q44_embed_neardup", "q45_ann_bruteforce",
      "q46_ann_lsh", "q53_windowed_hist",
      "q50_fingerprint", "q27_stat_interval")
    val rank = heavy.zipWithIndex.toMap
    // A failed query must be LOUD: print the stack to stderr and carry the
    // failure into the JSON — a silent -1 count would report a broken query
    // as a fast one.
    val errors = scala.collection.concurrent.TrieMap.empty[String, String]
    val t0All = System.nanoTime()
    val futures = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (rank.getOrElse(name, heavy.size), name) }
      .map { case (name, fn) =>
      Future {
        // FAIR shares between pools; one pool per query so a long
        // similarity join cannot starve the short histogram jobs
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = jsonEscape(e.toString.take(300))
            System.err.println(s"[bench] QUERY FAILED: $name")
            e.printStackTrace()
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf).toMap
    val wall = (System.nanoTime() - t0All) / 1e9
    pool.shutdown()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(json)
    // Also persist the JSON line: the driver's stdout tail-capture truncates
    // long lines, losing the per-query numbers every round.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
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
