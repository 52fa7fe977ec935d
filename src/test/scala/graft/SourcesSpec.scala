package graft

import graft.axes.Regular
import graft.operators.HistVectorAgg
import graft.sources.Tables
import graft.streaming.StreamingHist
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class SourcesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("batch tables load with expected schemas") {
    val tables = Tables.all(spark, sfDir)
    assert(tables.keySet == Tables.tableNames.toSet)
    assert(tables("lineitem").columns.contains("l_quantity"))
    Tables.registerViews(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
  }

  test("events stream: file source -> windowed histogram end-to-end") {
    // file stream sources need a directory; stage the parquet into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = Tables.eventsStream(spark, streamDir)
    assert(stream.isStreaming)
    val hist = StreamingHist.windowedHistogram(stream, "event_time",
      col("value"), Regular("value", 8, 0.0, 512.0), "1 hour")
    val q = hist.writeStream.format("memory").queryName("src_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val n = spark.table("src_stream").count()
      assert(n > 0)
      val total = spark.table("src_stream").agg(sum("cnt")).head().getDouble(0)
      val expected = spark.read.parquet(s"$streamDir/events.parquet")
        .filter(col("value") >= 0 && col("value") < 512).count().toDouble
      assert(total == expected)
    } finally q.stop()
  }

  test("autoDense picks equivalent results across both strategies") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 200.0), ("b", 513.0)).toDF("g", "x")
    val small = Regular("x", 8, 0.0, 512.0)
    val big = Regular("x", 512, 0.0, 512.0)
    for (ax <- Seq(small, big)) {
      val got = HistVectorAgg.autoDense(df, col("x"), ax, Seq("g"))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(got.size == 2 * ax.nBins) // group b kept with all-zero histogram
      val binOf1 = ax.edges.reverse.find(_ <= 1.0).get
      assert(got(("a", binOf1)) == 1.0)
      assert(got.values.sum == 2.0) // 513.0 overflows, dropped
    }
  }
}
