package graft

import graft.axes._
import graft.operators.{HistOptions, Histogram}
import graft.oracle.Oracle
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: per-returnflag histogram of l_quantity on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    val li = t("/root/testdata/sf0.001", "lineitem")
    Histogram.histogram(li, col("l_quantity"),
      Regular("l_quantity", 25, 0.0, 50.0), dims = Seq("l_returnflag"))
  }

  // Axes reused by both the Spark queries and their oracles — one definition.
  private val axQty = Regular("l_quantity", 25, 0.0, 50.0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_hist_regular" -> { (s, dir) =>
      implicit val sp: SparkSession = s
      Histogram.histogram(t(dir, "lineitem"), col("l_quantity"), axQty)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q01_hist_regular" -> Oracle.hist("lineitem",
      Seq(Oracle.Spec("l_quantity", axQty)))
  )
}
