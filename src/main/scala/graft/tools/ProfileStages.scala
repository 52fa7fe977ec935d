package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job / per-stage wall breakdown for one bench query (dev tool):
  * runs the named query twice (cold then warm) under the bench session
  * config and prints every job's duration + description and every
  * stage's duration, task count and shuffle bytes — the empirical loop
  * of guide §1.1 without the UI. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(var name: String = "", var tasks: Int = 0,
      var ms: Long = 0, var shufR: Long = 0, var shufW: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (collect)
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (collect) {
        val st = jobs.get(j.jobId)
        if (st != null) println(f"  [job ${j.jobId}%3d] ${(System.nanoTime() - st._1) / 1e9}%6.2f s  ${st._2.take(80)}")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = if (collect) {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        stages.put(i.stageId, St(i.name.takeWhile(_ != '\n'), i.numTasks, ms,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    graft.SparkEntry.cacheTables(spark, sfDir)
    val fn = graft.SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      stages.clear(); jobs.clear()
      collect = r == runs // only report the LAST (warm) run
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[total] $name run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      if (collect) {
        import scala.jdk.CollectionConverters._
        val tot = stages.values.asScala.map(_.ms).sum
        println(f"  [stages] ${stages.size} stages, sum ${tot / 1e3}%.2f s")
        stages.asScala.toSeq.sortBy(-_._2.ms).take(25).foreach { case (id, s) =>
          println(f"    [stage $id%4d] ${s.ms / 1e3}%6.2f s ${s.tasks}%4d tasks " +
            f"shufR=${s.shufR / 1048576.0}%7.1f MB shufW=${s.shufW / 1048576.0}%7.1f MB  ${s.name.take(70)}")
        }
      }
    }
    spark.stop()
  }
}
