package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [name,name,...]")
    val sfDir = args(0)
    val outDir = args(1)
    // optional comma-separated name filter: dev-loop incremental runs
    // (the driver always passes two args = full surface)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); read as epoch-nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: the only recurring WARN is WindowExec's single-partition note
    // for global-quantile windows, which run over already-aggregated
    // histograms of <= nBins rows (bounded by construction, not by data).
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // memory pressure valve: a full-surface sweep accumulates pinned
    // RelCache relations and spent broadcast blocks across 300+ queries
    // in ONE JVM (local mode: driver == executor), which at sf1 left the
    // embedding-family queries (q44/q52/q91/q156) OOMing late in the
    // sweep yet green solo. When used heap crosses the threshold after a
    // query, drop the relation memo and GC (letting the ContextCleaner
    // reap unreferenced broadcasts) — the memo refills on demand, so
    // results are unchanged and small-sf sweeps never trigger it.
    val rt = Runtime.getRuntime
    def heapFrac: Double =
      (rt.totalMemory - rt.freeMemory).toDouble / rt.maxMemory
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      if (heapFrac > 0.6) {
        System.err.println(f"[verify] heap at ${heapFrac * 100}%.0f%% " +
          s"after $name: clearing the relation memo")
        graft.util.RelCache.clear()
        System.gc()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
