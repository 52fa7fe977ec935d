package graft.scratch
import org.apache.spark.sql.SparkSession

/** Solo per-query timer: runs the named SparkEntry queries serially on a
  * quiet session and prints seconds — the uncontended counterpart to the
  * concurrent bench (regression attribution needs both). */
object SoloTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.cacheTables(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"SOLO $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$c")
    }
    spark.stop()
  }
}
