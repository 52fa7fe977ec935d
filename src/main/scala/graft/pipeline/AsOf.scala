package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the MOST RECENT right row of the
  * same key at or before the left row's time — the event-enrichment
  * primitive (attach the last profile update / price tick / view to each
  * purchase). Engines usually expose this as a range join (DuckDB `ASOF
  * JOIN`, Spark an inequality join); both shapes pair every left row
  * with a candidate SET before picking the latest, so a hot key with L
  * lefts and R rights costs L×R candidates.
  *
  * This implementation never builds candidates at all: tag the two
  * inputs, union them, and carry the latest right row forward with a
  * running `last(…, ignoreNulls)` window — for each key the cost is the
  * sort of its own L+R rows, period. One hash exchange keyed by the join
  * key, one sort, zero join operators (PlanShapeSpec pins it); the
  * running ROWS frame is evaluated incrementally by WindowExec, so state
  * is one row regardless of partition size.
  *
  * Determinism: the match for a left row at time t is the right row with
  * the greatest `(ts, rightId)` among rows with ts <= t (ts < t when
  * `strict`) — ties on the timestamp are broken by the right id, so the
  * result is independent of physical row order and partitioning. Rows
  * with a NULL key or NULL timestamp on either side are dropped (an
  * as-of match on an unknown time is undefined).
  *
  * @param rightId      numeric right-side column used as the
  *                     deterministic tie-break at equal timestamps
  * @param rightPayload right-side columns carried onto the match
  * @param prefix       prepended to `rightId` and each payload name in
  *                     the output (left columns pass through unchanged)
  * @param strict       require right.ts strictly before left.ts */
object AsOf {
  /** @param tolerance when set, a match further back than `tolerance`
    *   (in `tsCol`'s own units) is discarded — the bounded-staleness
    *   form (a quote older than an hour should not enrich a trade).
    *   Same plan: the window still carries ONE running candidate; the
    *   tolerance is a per-row predicate on the matched struct. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightId: String, rightPayload: Seq[String],
      prefix: String = "asof_", strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0L), "tolerance must be non-negative")
    // the tie-break must be a real integer order — a silent cast of a
    // string id to NULL would collapse determinism to physical row order
    val idType = right.schema(rightId).dataType
    require(Seq("long", "integer", "short", "byte")
        .contains(idType.typeName),
      s"rightId '$rightId' must be an integral column (got $idType)")
    val carried = rightId +: rightPayload
    val clash = left.columns.toSet.intersect(carried.map(prefix + _).toSet)
    require(clash.isEmpty, s"prefixed right columns collide with left: $clash")
    // inputs carrying the internal working names would shadow them and
    // break the union/window silently (or with a confusing analysis
    // error) — reject up front, like the prefixed-column clash above
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"input columns starting with the reserved '__' prefix: ${reserved.toSeq}")

    // at equal ts the right row must sort BEFORE the left row to be
    // matchable (<=); strict flips the side order so it sorts after
    val (lSide, rSide) = if (strict) (0, 1) else (1, 0)

    // the right ts rides along inside the struct for the tolerance test
    val rStruct = struct(carried.map(col) :+ col(tsCol).as("__rts"): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType

    val lPart = left
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(lSide).as("__side"), lit(0L).as("__oid"),
        lit(null).cast(rType).as("__r"), lStruct.as("__row"))
    val rPart = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(rSide).as("__side"), col(rightId).cast("long").as("__oid"),
        rStruct.as("__r"), lit(null).cast(lType).as("__row"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__oid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val fresh = tolerance.fold(col("__m").isNotNull)(t =>
      col("__m").isNotNull && col("__ts") - col("__m.__rts") <= lit(t))
    lPart.unionByName(rPart)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lit(lSide))
      .select(left.columns.map(n => col(s"__row.$n").as(n)) ++
        carried.map(n => when(fresh, col(s"__m.$n"))
          .otherwise(lit(null)).as(prefix + n)): _*)
  }

  /** FORWARD as-of join: attach to each left row the NEXT right row of
    * the same key at or after the left row's time — the label-joining
    * primitive ("the first purchase after this recommendation", "the
    * next error after this deploy"). The backward form enriches with
    * history; this one attaches outcomes.
    *
    * Identical plan shape to [[asOfJoin]] (tagged union, ONE key-keyed
    * exchange, running window, zero join operators): only the traversal
    * order flips — the partition sorts (ts DESC, side, rightId DESC),
    * so the running `last(…, ignoreNulls)` carries the right row with
    * the SMALLEST (ts, rightId) among those at-or-after each left row
    * (ties on the timestamp break toward the lowest right id — the
    * deterministic mirror of the backward join's greatest-id rule).
    * `strict` requires right.ts strictly after left.ts; `tolerance`
    * discards matches further AHEAD than the bound (an outcome more
    * than an hour out is not this action's outcome). */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightId: String, rightPayload: Seq[String],
      prefix: String = "next_", strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0L), "tolerance must be non-negative")
    val idType = right.schema(rightId).dataType
    require(Seq("long", "integer", "short", "byte")
        .contains(idType.typeName),
      s"rightId '$rightId' must be an integral column (got $idType)")
    val carried = rightId +: rightPayload
    val clash = left.columns.toSet.intersect(carried.map(prefix + _).toSet)
    require(clash.isEmpty, s"prefixed right columns collide with left: $clash")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"input columns starting with the reserved '__' prefix: ${reserved.toSeq}")

    // descending traversal: at equal ts the right row must still sort
    // BEFORE the left row to be matchable (<=); strict flips the order
    val (lSide, rSide) = if (strict) (0, 1) else (1, 0)

    val rStruct = struct(carried.map(col) :+ col(tsCol).as("__rts"): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType

    val lPart = left
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(lSide).as("__side"), lit(0L).as("__oid"),
        lit(null).cast(rType).as("__r"), lStruct.as("__row"))
    val rPart = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        lit(rSide).as("__side"), col(rightId).cast("long").as("__oid"),
        rStruct.as("__r"), lit(null).cast(lType).as("__row"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").desc, col("__side"), col("__oid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val fresh = tolerance.fold(col("__m").isNotNull)(t =>
      col("__m").isNotNull && col("__m.__rts") - col("__ts") <= lit(t))
    lPart.unionByName(rPart)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lit(lSide))
      .select(left.columns.map(n => col(s"__row.$n").as(n)) ++
        carried.map(n => when(fresh, col(s"__m.$n"))
          .otherwise(lit(null)).as(prefix + n)): _*)
  }
}
