package graft

import org.apache.spark.sql.SparkSession

/** Entry point for library users: a SparkSession.Builder preconfigured the
  * way graft's operators expect (AQE + skew-join handling on, UTC session
  * time, nanos-as-long parquet timestamps, graft SQL functions installed).
  *
  * {{{
  * val spark = Graft.builder().master("local[*]").getOrCreate()
  * Graft.install(spark) // or: on an existing session
  * }}}
  */
object Graft {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .withExtensions(new GraftExtensions)

  /** Register graft's SQL functions on an already-built session. */
  def install(spark: SparkSession): Unit = GraftExtensions.register(spark)
}
