package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a query's wall into plan-construction (fn + analysis +
  * optimization + physical planning, no jobs) vs execution (dev tool):
  * runs each named query `runs` times printing build-wall then
  * count-wall per run. */
object ProbePlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("RUNS", "3").toInt
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
    for (name <- args; r <- 1 to runs) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + physical
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[plancost] $name%-28s run$r fn=${(t1 - t0) / 1e9}%6.2f " +
        f"plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
