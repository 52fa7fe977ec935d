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

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalize events.ts to epoch-nanos long regardless of how the
    * parquet stored it: TESTDATA generations have shipped both
    * TIMESTAMP(NANOS) (read as long under nanosAsLong) and TIMESTAMP(us)
    * (read as TIMESTAMP_NTZ). Every operator downstream sees ONE type.
    * The NTZ-minus-epoch diff is timezone-free, so the value does not
    * depend on the session timezone. */
  def normalizeEventsTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case _: TimestampNTZType =>
      df.withColumn("ts", expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
    case _: TimestampType =>
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    case other =>
      throw new IllegalArgumentException(s"unsupported events.ts type: $other")
  }

  def all(spark: SparkSession, dir: String): Map[String, DataFrame] =
    tableNames.map(n => n -> table(spark, dir, n)).toMap

  /** Register every table as a temp view for spark.sql access. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all(spark, dir).foreach { case (n, df) => df.createOrReplaceTempView(n) }

  /** events schema matching the current TESTDATA generation: ts stored
    * as TIMESTAMP(us), read as TIMESTAMP_NTZ (Structured Streaming
    * requires an explicit schema — keep this in sync with the driver's
    * parquet). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming reader over an events parquet directory: `ts` normalized
    * to epoch-nanos long (same convention as the batch loader) plus a
    * real timestamp column `event_time` for watermarks and windows.
    * `maxFilesPerTrigger` bounds per-batch work. */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    normalizeEventsTs(spark.readStream
        .schema(eventsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(dir))
      .withColumn("event_time",
        timestamp_micros((col("ts") / lit(1000L)).cast("long")))
}
