package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source helpers for the star schema + events stream used throughout the
  * library (TESTDATA.md layout), with explicit schemas for the streaming
  * reader (Structured Streaming requires a user-supplied schema).
  */
object Tables {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def all(spark: SparkSession, dir: String): Map[String, DataFrame] =
    tableNames.map(n => n -> table(spark, dir, n)).toMap

  /** Register every table as a temp view for spark.sql access. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all(spark, dir).foreach { case (n, df) => df.createOrReplaceTempView(n) }

  /** events schema with ts as epoch-nanos long (nanosAsLong reader). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming reader over an events parquet directory: epoch-nanos `ts`
    * converted to a real timestamp column `event_time` for watermarks and
    * windows. `maxFilesPerTrigger` bounds per-batch work. */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("event_time",
        timestamp_micros((col("ts") / lit(1000L)).cast("long")))
}
