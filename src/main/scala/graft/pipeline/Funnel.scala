package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis over an event stream: for each key
  * (user), the earliest time it completed step 1, then step 2 STRICTLY
  * after step 1, and so on — the standard conversion-funnel primitive,
  * complementing gap-based sessionization on the same events table.
  *
  * Day-index arithmetic (retention / active-users / rate-anomaly): epoch
  * micros floor-divide into day indices via [[epochDay]] — exact FLOOR
  * division (one `div` plus a negative-remainder correction), matching
  * the DuckDB oracle's `//` for negative epochs too. Pre-1970 timestamps
  * therefore bucket identically in both engines; no post-1970 assumption
  * remains in the day math.
  *
  * Per-step semantics: t_k = min event time of step k's type among events
  * later than t_{k-1} (strict: a tie at the same microsecond does not
  * advance the funnel). t_k is NULL once any earlier step is NULL —
  * steps_completed counts the leading non-NULL prefix.
  *
  * Scale shape: one pass per step, each a type-filtered (pushdown-able)
  * min-aggregate keyed by user joined against the shrinking
  * reached-previous-step relation; every shuffle is keyed by the user id,
  * so AQE co-partitions the chain, and per-step state is one row per
  * user — never the raw event volume. k steps = k joins, not a per-user
  * event sort. */
object Funnel {

  private val DayUs = 86400000000L

  /** Epoch-micros -> day index by exact integer FLOOR division (DuckDB's
    * `//`): Spark's `div` truncates toward zero, so a negative epoch one
    * microsecond before midnight would land in the wrong day under plain
    * `div`. The remainder correction makes both engines agree on every
    * epoch, positive or negative, with no double-precision detour. */
  private[pipeline] def epochDay(tsCol: String): org.apache.spark.sql.Column =
    expr(s"unix_micros($tsCol) div $DayUs - " +
      s"(case when unix_micros($tsCol) % $DayUs < 0 then 1 else 0 end)")

  /** @param horizonUs when set, the WINDOWED funnel product analytics
    *   actually runs: steps 2..k must land within `horizonUs`
    *   microseconds of the user's step-1 time (t_k <= t1 + horizon) —
    *   same k-join shape, one extra integer-exact upper-bound predicate
    *   (micros arithmetic, so the oracle matches bitwise). A user's t1
    *   is fixed at their EARLIEST step-1 event; later step-1 events do
    *   not re-open the window.
    *
    *   Plan-depth note: k sequential left joins on one accumulator —
    *   fine at the funnel lengths product analytics runs (k <= ~10);
    *   beyond that the plan deepens linearly and each step re-scans the
    *   (type-pruned) events relation. */
  def funnel(events: DataFrame, steps: Seq[String], tsCol: String = "event_time",
      keyCol: String = "user_id", typeCol: String = "event_type",
      horizonUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(horizonUs.forall(_ > 0), "horizonUs must be positive")
    val base = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(typeCol), col(tsCol))
    var acc = base.select(col(keyCol)).distinct()
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (s, i) =>
      val tn = s"t${i + 1}"
      val stepEv = base.filter(col(typeCol) === lit(s))
      val tk = prev match {
        case None =>
          stepEv.groupBy(col(keyCol)).agg(min(col(tsCol)).as(tn))
        case Some(p) =>
          // the windowed form also carries t1 through the join so the
          // horizon bound stays a per-row predicate
          val carry = if (horizonUs.isDefined && p != "t1") Seq(p, "t1") else Seq(p)
          val joined = stepEv
            .join(acc.filter(col(p).isNotNull)
              .select((keyCol +: carry).map(col): _*), Seq(keyCol))
            .filter(col(tsCol) > col(p))
          horizonUs.fold(joined)(h => joined.filter(
              unix_micros(col(tsCol)) <= unix_micros(col("t1")) + lit(h)))
            .groupBy(col(keyCol)).agg(min(col(tsCol)).as(tn))
      }
      acc = acc.join(tk, Seq(keyCol), "left")
      prev = Some(tn)
    }
    val completed = steps.indices.foldLeft(lit(0L)) { (els, i) =>
      when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(els)
    }
    acc.withColumn("steps_completed", completed)
  }

  /** Retention cohorts: each user joins the cohort of its first active
    * day; a (cohort_day, offset_days) cell counts the distinct users of
    * that cohort active offset days later — the standard retention
    * triangle. Day indices are exact integer floors of epoch
    * microseconds, so the oracle matches bitwise.
    *
    * Scale shape: per-user first-day is one min-aggregate; activity is
    * deduplicated to (user, day) BEFORE the cohort join (bounding the
    * join at one row per user-day, not per event); both the join and the
    * final distinct-count shuffle are keyed by user id / cohort cell.
    * Everything is map-combinable except the exact countDistinct, whose
    * two-level expansion is still bounded by user-days. */
  def retention(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id"): DataFrame = {
    val day = epochDay(tsCol)
    val act = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol), day.as("__day")).distinct()
    val first = act.groupBy(col(keyCol)).agg(min("__day").as("cohort_day"))
    act.join(first, Seq(keyCol))
      .groupBy(col("cohort_day"), (col("__day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** Top-k user-journey paths: sessionize (native session_window — the
    * same merge semantics q87 gates against the lag/cumsum identity),
    * render each session as its ordered event-type sequence, count
    * sessions per path and keep the k most frequent (ties to the
    * lexicographically first path). Events inside a session are ordered
    * by (time, type) — a total, engine-independent order; NULL types are
    * excluded.
    *
    * Scale shape: one session-keyed aggregate builds the per-session
    * path (state bounded by session length), one path-keyed count, and
    * the global top-k runs as TakeOrdered (map-side partial top-k, k
    * rows per partition to the driver — never the full path
    * distribution). */
  def sessionPaths(events: DataFrame, gap: String, k: Int,
      tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(k >= 1, "k must be positive")
    val paths = events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol).as("t"), col(typeCol).as("e")))),
        x => x.getField("e")), ">").as("path"))
    val counted = paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(k)
    counted.withColumn("rank",
      row_number().over(Window.orderBy(col("n_sessions").desc, col("path")))
        .cast("int"))
  }

  /** [[retention]] normalized to RATES: each (cohort, offset) cell as a
    * fraction of its cohort's size (the offset-0 cell — every cohort
    * member is active on their own first day, so n0 is the cohort size
    * and every rate is in (0, 1]). The form retention dashboards
    * actually plot; one extra cohort-keyed self-join of the (tiny)
    * triangle relation, one IEEE division on exact longs. */
  def retentionRates(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id"): DataFrame = {
    val r = retention(events, tsCol, keyCol)
    val base = r.filter(col("offset_days") === 0L)
      .select(col("cohort_day"), col("n_users").as("__n0"))
    r.join(base, "cohort_day")
      .select(col("cohort_day"), col("offset_days"), col("n_users"),
        (col("n_users").cast("double") / col("__n0").cast("double"))
          .as("retention_rate"))
  }

  /** Funnel WITHIN a session: did the user convert from `fromType` to
    * `toType` inside one gap-bounded visit, and how fast — the
    * session-scoped complement of [[funnel]]'s whole-history form (a
    * purchase three days after the view is a conversion there, not
    * here). One row per session: start, size, first `fromType` time,
    * first strictly-later `toType` time, conversion flag and latency.
    *
    * Scale shape: native session_window aggregation (one user-keyed
    * shuffle, state = open sessions); the conversion logic runs on each
    * session's own sorted (t, e) array — per-session memory, no second
    * shuffle, no join. Strict-after semantics and microsecond
    * arithmetic match [[funnel]]; a session with no `fromType` never
    * converts. */
  def sessionFunnel(events: DataFrame, gap: String, fromType: String,
      toType: String, tsCol: String = "event_time",
      keyCol: String = "user_id", typeCol: String = "event_type"): DataFrame = {
    require(!fromType.contains("'") && !toType.contains("'"),
      "event types must not contain quotes")
    val us = unix_micros(col(tsCol))
    events.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(array_sort(collect_list(struct(us.as("t"), col(typeCol).as("e"))))
        .as("__a"))
      .withColumn("t_from",
        expr(s"try_element_at(filter(__a, x -> x.e = '$fromType'), 1).t"))
      .withColumn("t_to",
        expr(s"try_element_at(filter(__a, x -> x.e = '$toType' AND x.t > t_from), 1).t"))
      .select(col(keyCol), expr("__a[0].t").as("session_start"),
        size(col("__a")).cast("long").as("n_events"),
        col("t_from"), col("t_to"),
        col("t_to").isNotNull.as("converted"),
        (col("t_to") - col("t_from")).as("latency_us"))
  }

  /** Rolling active users (DAU at windowDays=1, WAU at 7, MAU at 30): for
    * each day index D, the distinct users active in the trailing window
    * (D - windowDays, D]. Output is sparse — a day appears iff some
    * user-day in its window exists, so trailing days after the last event
    * still appear (their windows are genuinely non-empty); day indices
    * use the exact floor division of [[epochDay]] (oracle-identical for
    * negative epochs too), as in [[retention]].
    *
    * Scale shape: activity collapses to (user, day) FIRST (one user-keyed
    * shuffle; one row per user-day, never raw event volume), then a
    * BOUNDED explode — each user-day lands in exactly windowDays windows
    * — feeds the exact per-day distinct count. Both the dedup and the
    * count are map-combinable two-level aggregates; expansion is
    * user-days × windowDays, independent of event count. */
  def activeUsers(events: DataFrame, windowDays: Int,
      tsCol: String = "event_time", keyCol: String = "user_id"): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val day = epochDay(tsCol)
    events.filter(col(tsCol).isNotNull)
      .select(col(keyCol), day.as("__day")).distinct()
      .select(col(keyCol),
        explode(sequence(col("__day"), col("__day") + lit(windowDays - 1L))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }

  /** Schema-on-read promotion of a JSON properties field (every real
    * event stream carries a semi-structured props blob; analytics needs
    * typed columns): extract `field` as a long and aggregate per event
    * type — count, sum, min, max, mean. The extraction is ONE codegen'd
    * JSON parse per row (get_json_object; for several fields switch to a
    * single from_json into a struct — same parse count, typed once),
    * evaluated in the scan's project, so the corpus collapses to the
    * per-type aggregate in a single map-combinable pass: one shuffle of
    * |types| rows, nothing else. Rows where the field is missing or not
    * an INTEGRAL literal drop out (documented): the extracted text must
    * match `^-?[0-9]+$` before the long cast. The explicit regex guard
    * exists because the engines' bare casts DISAGREE on non-integral
    * numerics — Spark's try_cast (ANSI string-to-integral) NULLs '3.7'
    * while DuckDB's TRY_CAST(... AS BIGINT) rounds it to 4 — so the
    * semantics are pinned once, engine-independently, and the oracle
    * carries the same regex. MALFORMED JSON also drops out here
    * (get_json_object NULLs it), and the oracle mirrors that with a
    * json_valid guard — DuckDB's bare ->> would abort on it instead.
    * Values beyond int64 NULL out in both engines (try_cast / TRY_CAST).
    * Integer sums are exact; the mean is one IEEE division (the q117
    * boundary convention). */
  def jsonFieldStats(events: DataFrame, field: String,
      propsCol: String = "props", typeCol: String = "event_type"): DataFrame = {
    val raw = get_json_object(col(propsCol), s"$$.$field")
    val k = when(raw.rlike("^-?[0-9]+$"), raw.try_cast("long"))
    events.select(col(typeCol).as("event_type"), k.as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("__k")).as("k_sum"),
        min(col("__k")).as("k_min"), max(col("__k")).as("k_max"))
      .select(col("event_type"), col("n"), col("k_sum"), col("k_min"),
        col("k_max"),
        (col("k_sum").cast("double") / col("n").cast("double")).as("k_mean"))
  }

  /** Event-rate anomaly detection (pipeline monitoring: a collector
    * outage or a bot flood shows up as a day whose event count deviates
    * from its recent baseline): per (event_type, day), flag days whose
    * count deviates from the trailing `windowDays`-day mean by more than
    * `k` sample standard deviations. One corpus aggregate down to the
    * tiny (type, day) relation; the trailing window runs entirely on it.
    *
    * Cross-engine exactness: the window sums (w, Σc, Σc²) are EXACT
    * integer arithmetic over identical inputs; the z-score tail
    * (mean, the w·Σc²−(Σc)² variance numerator, clamp, sqrt, the k·std
    * compare) is ONE fixed IEEE sequence mirrored verbatim in the oracle
    * — identical doubles in, identical flag out (the q117 pearson
    * convention). Days with fewer than windowDays predecessors report
    * NULL mean/std/flag rather than a noisy partial baseline. Σc² as
    * int64 holds to ~1e9 events/type/day at windowDays=7; beyond that,
    * swap the decimal-sum variant in. Gaps (zero-event days) don't emit
    * rows — the baseline is over OBSERVED days, documented semantics. */
  def eventRateAnomaly(events: DataFrame, windowDays: Int, k: Double,
      tsCol: String = "event_time", typeCol: String = "event_type"): DataFrame = {
    require(windowDays > 1, "windowDays must be > 1 (sample std needs w-1 > 0)")
    val day = epochDay(tsCol)
    val counts = events.filter(col(tsCol).isNotNull)
      .select(col(typeCol).as("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-windowDays, -1)
    val wd = lit(windowDays.toLong)
    val agg = counts
      .withColumn("__w", count(lit(1)).over(win))
      .withColumn("__s", coalesce(sum(col("n")).over(win), lit(0L)))
      .withColumn("__ss", coalesce(sum(col("n") * col("n")).over(win), lit(0L)))
    val meanC = col("__s").cast("double") / col("__w").cast("double")
    val num = col("__w").cast("double") * col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double")
    val varC = greatest(lit(0.0), num) /
      (col("__w").cast("double") * (col("__w") - lit(1L)).cast("double"))
    val stdC = sqrt(varC)
    val full = col("__w") === wd
    agg.select(col("event_type"), col("day"), col("n"),
      when(full, meanC).as("mean"),
      when(full, stdC).as("std"),
      when(full,
        abs(col("n").cast("double") - meanC) > lit(k) * stdC).as("is_anomaly"))
  }

  /** First-order Markov transition matrix over each user's event stream
    * (journey analytics: which step follows which — the aggregate-matrix
    * complement to q115's whole-path top-k): per ordered consecutive
    * event pair within a user, count transitions (from_type, to_type)
    * and the row-conditional probability p = n / Σ_to n.
    *
    * Determinism: consecutive-ness is defined by the TOTAL order
    * (event time, event id) — the id breaks same-microsecond ties, so
    * the lag is a pure function of the data in both engines.
    *
    * Scale shape: ONE user-keyed exchange feeds the lag window (state =
    * one previous row per partition-sorted stream), then the corpus
    * collapses to the |types|² transition relation — the conditional
    * probability runs entirely on that tiny relation (unpartitioned-by-
    * necessity window over ≤ |types|² rows, never corpus rows). The
    * division is one IEEE op on exact longs (the q117 boundary
    * convention). */
  def transitionMatrix(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val ordered = events
      // idCol is the same-microsecond tie-breaker: a NULL id would sort
      // NULLS FIRST here but NULLS LAST in the oracle's LAG, so it is
      // excluded like the other key columns (the suppressRapidFire rule)
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol),
        col(typeCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(idCol))
    val pairs = ordered
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(wf).cast("double"))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  /** Per-user inter-event gaps (instrumentation QA / bot triage: a human
    * pauses between actions, a bot or a stuck collector does not): for
    * each event with a predecessor in its user's (time, id)-ordered
    * stream, the gap in microseconds, labeled with the LATER event's
    * type. Feeds the core histogram engine for the per-type gap
    * distribution (q168) — the same lag-window shape as
    * [[transitionMatrix]], ONE user-keyed exchange, map-only after. */
  def interEventGaps(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val ordered = events
      // NULL idCol excluded for the same ordering-parity reason as
      // [[transitionMatrix]]
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol),
        col(typeCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(idCol))
    ordered.withColumn("__pus", lag(col("__us"), 1).over(w))
      .filter(col("__pus").isNotNull)
      .select(col(keyCol), col(idCol), col(typeCol),
        (col("__us") - col("__pus")).as("gap_us"))
  }

  /** Rapid-fire duplicate-event suppression (instrumentation QA: double
    * fires, retry storms, bot bursts): keep an event iff it is the FIRST
    * of its (user, type) stream or arrived more than `gapSec` after its
    * raw predecessor in that stream. This is the burst-collapse rule —
    * one survivor per activity burst, exactly the session STARTS of a
    * gapSec sessionization of the (user, type) stream — so the verdict
    * is a pure per-row function of the (time, id)-ordered data: one lag
    * window, no iteration, deterministic under any partitioning. (The
    * "last KEPT event" chained variant needs stateful recursion; the
    * burst-collapse form is the one large pipelines use because it is
    * declarative and idempotent.)
    *
    * Scale shape: one (user, type)-keyed exchange feeds the lag window;
    * the filter and projection are map-side. Output is the kept subset
    * with epoch-micro timestamps — linear in survivors. */
  def suppressRapidFire(events: DataFrame, gapSec: Long,
      tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive: $gapSec")
    val w = Window.partitionBy(col(keyCol), col(typeCol))
      .orderBy(col("__us"), col(idCol))
    events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol), col(keyCol), col(typeCol),
        unix_micros(col(tsCol)).as("__us"), col("value"))
      .withColumn("__pus", lag(col("__us"), 1).over(w))
      .filter(col("__pus").isNull ||
        col("__us") - col("__pus") > lit(gapSec * 1000000L))
      .select(col(idCol), col(keyCol), col(typeCol),
        col("__us").as("us"), col("value"))
  }

  /** Value-weighted cohort triangle (the LTV complement to [[retention]]'s
    * user counts — how much VALUE each cohort generates at each age): per
    * (cohort day, offset days), event count and the exact sum of `valueCol`.
    *
    * Cross-engine exactness: the value sum goes through Dec's
    * DECIMAL(38,14) accumulation (order-independent, engine-identical;
    * NaN/overflow rows skip as NULL in both engines — the q87 sessionize
    * convention); counts are exact longs. NULL values keep their row in
    * the count but not the sum, like SQL SUM.
    *
    * Scale shape: the cohort relation is one user-keyed aggregate (one
    * row per user), joined back user-keyed — AQE co-partitions the two
    * shuffles — then the corpus collapses to the (cohorts × offsets)
    * triangle in one map-combinable aggregate. Same two-exchange shape
    * as [[retention]], carrying one decimal beside the count. */
  def cohortValue(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id", valueCol: String = "value"): DataFrame = {
    val day = epochDay(tsCol)
    val act = events.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), day.as("__d"), col(valueCol).as("__v"))
    val cohorts = act.groupBy(col(keyCol))
      .agg(min(col("__d")).as("cohort_day"))
    act.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_day"), (col("__d") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Dec.sumDec(col("__v")).as("value_sum"))
  }

  /** Coincidence (interval) join: every (left, right) event pair of the
    * same key whose times are within ±tolUs — the two-sided range-join
    * primitive [[graft.pipeline.AsOf.asOfJoin]]'s latest-only rule
    * cannot express (fraud coincidence rings, sensor cross-validation,
    * view↔click attribution BOTH ways). Spark has no range-join
    * operator; the naive form is a per-key cross join. Here: both
    * sides bucket by floor(us/tolUs) (exact FLOOR division, the
    * [[epochDay]] rule), the LEFT side probes its bucket ±1 (the
    * pigeonhole cover of |Δ| ≤ tol — the q42 chunk discipline), the
    * join is a plain (key, bucket) equi-join, and the |Δ| ≤ tol filter
    * runs map-side. Each true pair matches in EXACTLY one probe (the
    * right row's own bucket), so no dedup step exists. The oracle
    * computes the UNBLOCKED per-key form, so every gate re-proves
    * blocking completeness. NULL keys/times drop on both engines (an
    * equi-join cannot match NULL).
    *
    * Scale shape: 3× explode of the (pruned, 3-column) left side, one
    * (key, bucket) exchange each side; candidate volume is
    * Σ_buckets |L_b|·(|R_{b-1}|+|R_b|+|R_{b+1}|) — bounded by per-key
    * per-window event density, never |L|·|R|; a hostile hot
    * (key, bucket) is AQE-skew-splittable like any equi-join. */
  def intervalJoin(events: DataFrame, leftType: String, rightType: String,
      tolUs: Long, tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(tolUs > 0, s"tolUs must be positive: $tolUs")
    def side(t: String, idAs: String, usAs: String): DataFrame = events
      .filter(col(typeCol) === t && col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(idCol).as(idAs),
        unix_micros(col(tsCol)).as(usAs))
    def bucket(usName: String): org.apache.spark.sql.Column =
      expr(s"$usName div $tolUs - " +
        s"(case when $usName % $tolUs < 0 then 1 else 0 end)")
    val l = side(leftType, "left_id", "__lus")
      .withColumn("__pb", explode(array(bucket("__lus") - 1L,
        bucket("__lus"), bucket("__lus") + 1L)))
    val r = side(rightType, "right_id", "__rus")
      .withColumnRenamed(keyCol, "__rk")
      .withColumn("__rb", bucket("__rus"))
    l.join(r, col(keyCol) === col("__rk") && col("__pb") === col("__rb"))
      .filter(abs(col("__rus") - col("__lus")) <= tolUs)
      .select(col(keyCol), col("left_id"), col("right_id"),
        (col("__rus") - col("__lus")).as("dt_us"))
  }

  /** Position-based (U-shaped) multi-touch attribution: every
    * conversion collects the user's touch events in the preceding
    * `tolUs` window and splits credit 40/20/40 — first touch 0.4, last
    * touch 0.4, the middle touches share 0.2 (1 touch takes 1.0, 2
    * touches split 0.5/0.5) — the standard position-based model
    * between last-touch (the [[graft.pipeline.AsOf]] join) and linear.
    * Emits one row per (conversion, touch) with position, n_touches
    * and credit; a credit sum grouped by any touch dimension is then a
    * plain aggregate.
    *
    * Scale shape: the candidate join is the [[intervalJoin]] bucket
    * blocking specialized one-sided (touch in [conv − tol, conv)) —
    * the oracle runs the UNBLOCKED range join, so every gate re-proves
    * blocking completeness; position/count run in a conversion-keyed
    * window (bounded by one conversion's touch volume — tol × the
    * user's event rate). Credit is a CASE of double literals with ONE
    * division (0.2/(m−2)); ties order by (touch time, touch id). */
  def attribution(events: DataFrame, convType: String, touchType: String,
      tolUs: Long, tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(tolUs > 0, s"tolUs must be positive: $tolUs")
    def side(t: String, idAs: String, usAs: String): DataFrame = events
      .filter(col(typeCol) === t && col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(idCol).as(idAs),
        unix_micros(col(tsCol)).as(usAs))
    def bucket(usName: String): Column =
      expr(s"$usName div $tolUs - " +
        s"(case when $usName % $tolUs < 0 then 1 else 0 end)")
    val c = side(convType, "conv_id", "__cus")
      .withColumn("__pb", explode(array(bucket("__cus") - 1L, bucket("__cus"))))
    val t = side(touchType, "touch_id", "__tus")
      .withColumnRenamed(keyCol, "__tk")
      .withColumn("__tb", bucket("__tus"))
    val j = c.join(t, col(keyCol) === col("__tk") && col("__pb") === col("__tb"))
      .filter(col("__tus") >= col("__cus") - lit(tolUs) &&
        col("__tus") < col("__cus"))
      .select(col(keyCol), col("conv_id"), col("touch_id"), col("__tus"))
    val byConv = Window.partitionBy(col("conv_id"))
    val pos = row_number().over(byConv.orderBy(col("__tus"), col("touch_id")))
    val m = count(lit(1)).over(byConv)
    j.select(col(keyCol), col("conv_id"), col("touch_id"),
        pos.as("position"), m.as("n_touches"))
      .withColumn("credit",
        when(col("n_touches") === 1, lit(1.0))
          .when(col("n_touches") === 2, lit(0.5))
          .when(col("position") === 1 || col("position") === col("n_touches"),
            lit(0.4))
          .otherwise(lit(0.2) /
            (col("n_touches") - lit(2)).cast("double")))
  }

  /** Calendar seasonality profile — the (day-of-week × hour-of-day)
    * traffic matrix every capacity plan and anomaly baseline starts
    * from ("is Tuesday 14:00 supposed to be this quiet?"): exact event
    * counts per cell and each cell's share of total traffic. Day/hour
    * come from INTEGER microsecond arithmetic (floor days since epoch;
    * (d+4) mod 7 puts 0=Sunday — 1970-01-01 was a Thursday), identical
    * in both engines — no timezone, no calendar library. NULL
    * timestamps drop. Negative epochs are rejected (pre-1970 calendar
    * cells are not this operator's contract).
    *
    * Scale shape: one map-combinable 168-cell aggregate; the single-row
    * total broadcasts. */
  def seasonality(events: DataFrame, tsCol: String = "event_time"): DataFrame = {
    val us = unix_micros(col(tsCol))
    val cells = events.filter(col(tsCol).isNotNull && us >= 0L)
      .select(us.as("__us"))
      .select(((expr("__us div 86400000000") + lit(4L)) % lit(7L))
          .cast("int").as("dow"),
        expr("(__us % 86400000000) div 3600000000").cast("int").as("hour"))
      .groupBy(col("dow"), col("hour")).agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("__t"))
    cells.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n"),
        (col("n").cast("double") / col("__t").cast("double")).as("share"))
  }

  /** SEASONALLY-ADJUSTED rate anomaly — q144's z-score with
    * [[seasonality]]'s baseline ("traffic is low FOR A TUESDAY 2PM" —
    * a raw-rate monitor either misses seasonal dips or alarms on every
    * weekend): each hourly window's event count is z-scored against
    * the mean/std of ALL windows sharing its (day-of-week, hour-of-day)
    * cell. Emits (window_start, dow, hour, n, cell_mean, cell_std,
    * z) — z NULL when the cell has no variance (a single observation,
    * or a perfectly regular feed: nothing to standardize against).
    *
    * Only OBSERVED windows enter the baseline (an all-quiet hour is
    * absent, not zero — the [[retention]]-family convention; a
    * zero-filled calendar would need the observation span as an
    * argument). Exactness: counts are exact longs; cell mean/std come
    * from DECIMAL(38,0)-exact Σn/Σn²; the z tail is a fixed IEEE
    * sequence. Scale shape: one hourly-window count (map-combinable),
    * one 168-cell aggregate over the #windows-sized relation, a
    * broadcast join back. */
  def seasonalAnomaly(events: DataFrame,
      tsCol: String = "event_time"): DataFrame = {
    val us = unix_micros(col(tsCol))
    val wins = events.filter(col(tsCol).isNotNull && us >= 0L)
      .select(us.as("__us"))
      .select(expr("__us div 3600000000").as("__wh"))
      .groupBy(col("__wh")).agg(count(lit(1)).as("n"))
      .select(col("__wh"), col("n"),
        ((expr("(__wh div 24)") + lit(4L)) % lit(7L)).cast("int").as("dow"),
        (col("__wh") % lit(24L)).cast("int").as("hour"))
    val nd = col("n").cast("decimal(38,0)")
    val cells = wins.groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("__m"), sum(nd).as("__sn"),
        sum(nd * nd).as("__snn"))
      .select(col("dow"), col("hour"), col("__m"),
        (col("__sn").cast("double") / col("__m").cast("double")).as("cell_mean"),
        sqrt(greatest(lit(0.0),
          col("__snn").cast("double") / col("__m").cast("double") -
            (col("__sn").cast("double") / col("__m").cast("double")) *
            (col("__sn").cast("double") / col("__m").cast("double"))))
          .as("cell_std"))
    wins.join(broadcast(cells), Seq("dow", "hour"))
      .select(timestamp_micros(col("__wh") * lit(3600000000L)).as("window_start"),
        col("dow"), col("hour"), col("n"), col("cell_mean"), col("cell_std"),
        when(col("cell_std") === lit(0.0), lit(null).cast("double"))
          .otherwise((col("n").cast("double") - col("cell_mean")) / col("cell_std"))
          .as("z"))
  }

  /** Two-proportion A/B z-test — the experiment-readout operator
    * ([[graft.stats.HistStats.welchT]] is for means; conversion is a
    * PROPORTION, and the pooled two-proportion z is its standard
    * test): users are assigned by `groupExpr` (boolean — true = B),
    * a user converts if they ever emit `convType`, and
    * z = (p_b − p_a)/√(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ the pooled rate.
    * Emits one row: users/conversions/rate per arm and z (NULL when
    * either arm is empty or the pooled variance is 0 — everyone or
    * no-one converts).
    *
    * Exactness: user-level conversion is one distinct-user collapse
    * (max of a 0/1), the counts are exact longs, and the z tail is a
    * fixed IEEE sequence. Scale shape: one user-keyed map-combinable
    * collapse, one 2-row arm aggregate, a single output row. */
  def abTest(events: DataFrame, groupExpr: Column, convType: String,
      tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val users = events
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(groupExpr.cast("int")).as("__b"),
        max(when(col(typeCol) === convType, 1).otherwise(0)).as("__c"))
    val arms = users.agg(
      sum(when(col("__b") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__b") === 0 && col("__c") === 1, 1L).otherwise(0L)).as("conv_a"),
      sum(when(col("__b") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__b") === 1 && col("__c") === 1, 1L).otherwise(0L)).as("conv_b"))
    def d(name: String): Column = col(name).cast("double")
    val pa = d("conv_a") / d("n_a")
    val pb = d("conv_b") / d("n_b")
    val pp = (d("conv_a") + d("conv_b")) / (d("n_a") + d("n_b"))
    val se2 = pp * (lit(1.0) - pp) * (lit(1.0) / d("n_a") + lit(1.0) / d("n_b"))
    arms.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") === 0L, lit(null).cast("double")).otherwise(pa).as("rate_a"),
      when(col("n_b") === 0L, lit(null).cast("double")).otherwise(pb).as("rate_b"),
      when(col("n_a") === 0L || col("n_b") === 0L || se2 === lit(0.0),
          lit(null).cast("double"))
        .otherwise((pb - pa) / sqrt(se2)).as("z"))
  }

  /** A/B z TRAJECTORY — the live-experiment dashboard curve [[abTest]]
    * collapses to one number ("what would the readout have said at
    * every hour?" — the peeking/early-stopping diagnostic): per
    * observed hour, the CUMULATIVE-to-date users and conversions per
    * arm (a user joins their arm at their FIRST event; converts at
    * their first conversion event) and the pooled two-proportion z at
    * that point. Same degenerate-NULL rule as [[abTest]] per row.
    *
    * Scale shape: one user-keyed map-combinable collapse to (arm,
    * first-seen hour, first-conversion hour), four hourly delta
    * aggregates, and cumulative sums over the HOURS-sized relation
    * (the q209 convention — the one unpartitioned sort is over hours);
    * exact longs throughout, one IEEE tail per row. */
  def abTrajectory(events: DataFrame, groupExpr: Column, convType: String,
      tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val us = unix_micros(col(tsCol))
    val base = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(typeCol), us.as("__us"), groupExpr.cast("int").as("__b"))
    val users = base.groupBy(col(keyCol))
      .agg(max(col("__b")).as("__b"),
        expr("min(__us) div 3600000000").as("__h0"),
        expr(s"min(case when ${typeCol} = '${convType}' then __us end) div 3600000000")
          .as("__hc"))
    val hours = base.select(expr("__us div 3600000000").as("__h")).distinct()
    def deltas(cond: Column, hCol: String, name: String): DataFrame =
      users.filter(cond && col(hCol).isNotNull)
        .groupBy(col(hCol).as("__h")).agg(count(lit(1)).as(name))
    val d = hours
      .join(deltas(col("__b") === 0, "__h0", "__dna"), Seq("__h"), "left")
      .join(deltas(col("__b") === 0 && col("__hc").isNotNull, "__hc", "__dca"), Seq("__h"), "left")
      .join(deltas(col("__b") === 1, "__h0", "__dnb"), Seq("__h"), "left")
      .join(deltas(col("__b") === 1 && col("__hc").isNotNull, "__hc", "__dcb"), Seq("__h"), "left")
      .na.fill(0L, Seq("__dna", "__dca", "__dnb", "__dcb"))
    val cum = Window.orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = d.select(col("__h"),
      sum(col("__dna")).over(cum).as("n_a"),
      sum(col("__dca")).over(cum).as("conv_a"),
      sum(col("__dnb")).over(cum).as("n_b"),
      sum(col("__dcb")).over(cum).as("conv_b"))
    def dd(name: String): Column = col(name).cast("double")
    val pa = dd("conv_a") / dd("n_a")
    val pb = dd("conv_b") / dd("n_b")
    val pp = (dd("conv_a") + dd("conv_b")) / (dd("n_a") + dd("n_b"))
    val se2 = pp * (lit(1.0) - pp) * (lit(1.0) / dd("n_a") + lit(1.0) / dd("n_b"))
    withCum.select(
      timestamp_micros(col("__h") * lit(3600000000L)).as("window_start"),
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") === 0L || col("n_b") === 0L || se2 === lit(0.0),
          lit(null).cast("double"))
        .otherwise((pb - pa) / sqrt(se2)).as("z"))
  }

  /** RFM feature table — the classic churn/LTV feature generator
    * (recency, frequency, monetary; the per-user row every simple
    * churn model trains on): per user, days since last activity
    * (relative to the corpus' last observed day — a batch table has no
    * "now"), distinct active days, total event count, and the exact
    * DECIMAL sum of `value` cast once to double. NULL users drop;
    * NULL values contribute 0 to monetary but still count as events.
    *
    * Scale shape: ONE user-keyed map-combinable aggregate (the
    * distinct-day count is the only two-level expansion — bounded by
    * user-days); the single-row corpus max broadcasts. */
  def rfm(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id", valueCol: String = "value"): DataFrame = {
    val day = epochDay(tsCol)
    val base = events.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), day.as("__d"), col(valueCol).cast("double").as("__v"))
    val maxDay = base.agg(max(col("__d")).as("__maxd"))
    base.groupBy(col(keyCol))
      .agg(max(col("__d")).as("__last"),
        countDistinct(col("__d")).as("active_days"),
        count(lit(1)).as("n_events"),
        graft.util.Dec.exactDouble(
          sum(graft.util.Dec.toDec(col("__v")))).as("monetary"))
      .crossJoin(broadcast(maxDay))
      .select(col(keyCol), (col("__maxd") - col("__last")).as("recency_days"),
        col("active_days"), col("n_events"),
        coalesce(col("monetary"), lit(0.0)).as("monetary"))
  }

  /** PAGERANK over the event-type transition graph — "where does user
    * behavior settle?" as one score per type (the q165 transition
    * matrix's stationary view, damped): r ← (1−d)/n + d·(Mᵀr +
    * dangling/n) for `iters` rounds, M the row-stochastic transition
    * matrix from per-user consecutive-event pairs, dangling mass
    * redistributed uniformly (a type that never precedes anything is
    * a dangling node).
    *
    * Cross-engine bit-exactness (the q248 discipline): transition
    * probabilities are single IEEE divisions of exact longs; each
    * incoming-mass fold runs in ascending source-type order (Scala
    * sorted loop == SUM ORDER BY); the dangling fold likewise; every
    * iterate is floor-quantized to the 1e-9 grid, so both engines
    * carry the SAME vector whether or not it has converged; damping
    * enters as two literals ((1−d) precomputed — no subtraction-order
    * ambiguity).
    *
    * Scale shape: the corpus collapses to the |types|²-bounded
    * transition-count relation (one user-keyed lag window + a
    * map-combinable count); the iteration is driver-bounded on that
    * tiny matrix — the kmeans-Lloyd / pcaPower precedent. */
  def pagerank(events: DataFrame, damping: Double = 0.85, iters: Int = 20,
      tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1): $damping")
    require(iters >= 1, s"iters must be positive: $iters")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol),
        col(typeCol).as("__t"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(idCol))
    val trans = base.withColumn("__prev", lag(col("__t"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col("__t")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val typeRows = base.select(col("__t")).distinct()
      .collect().map(_.getString(0)).sorted
    if (typeRows.isEmpty)
      return Seq.empty[(String, Double)].toDF("event_type", "pagerank")
    val n = typeRows.length
    val nD = n.toDouble
    val out = typeRows.map(i =>
      typeRows.iterator.map(j => trans.getOrElse((i, j), 0L)).sum)
    val base1 = (1.0 - damping) / nD
    var r = Array.fill(n)(1.0 / nD)
    for (_ <- 1 to iters) {
      var dang = 0.0
      var i = 0
      while (i < n) { if (out(i) == 0L) dang += r(i); i += 1 }
      val rNew = Array.tabulate(n) { j =>
        var s = 0.0
        var i2 = 0
        while (i2 < n) {
          val c = trans.getOrElse((typeRows(i2), typeRows(j)), 0L)
          if (c > 0L) s += r(i2) * (c.toDouble / out(i2).toDouble)
          i2 += 1
        }
        val v = base1 + damping * (s + dang / nD)
        math.floor(v * 1.0e9) / 1.0e9
      }
      r = rNew
    }
    typeRows.zip(r).toSeq.toDF("event_type", "pagerank")
  }

  /** CUSUM change-point monitor over hourly event counts — the
    * SEQUENTIAL drift detector the per-window family lacks (PSI/KS/z
    * score each window in isolation; CUSUM accumulates small
    * persistent shifts until they cross a threshold — the classic
    * "slow leak" alarm): two-sided, S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ−μ−k)) and
    * S⁻ₜ = max(0, S⁻ₜ₋₁ − (xₜ−μ)−k), alarm when either exceeds `h`.
    * μ is the span's mean hourly count; `k` (allowance) and `h`
    * (threshold) are in events.
    *
    * Computed by the prefix identity S⁺ₜ = Pₜ − min₀≤ⱼ≤ₜ Pⱼ (P the
    * running sum of deviations, P₀ = 0), so the recursion becomes one
    * cumulative sum + one running extremum — window functions, not a
    * sequential loop. Cross-engine: each deviation is floor-quantized
    * to an exact long at 1e6 BEFORE accumulating (cumulative DOUBLE
    * window sums have engine-specific association; exact longs are
    * order-free), the running min/max are order-free, and the final
    * /1e6 is one IEEE division per row.
    *
    * Scale shape: the corpus collapses to the hourly-count relation
    * (map-combinable); the cumulative windows run over that
    * #windows-sized relation — the one unpartitioned sort is over
    * HOURS, never rows (the q209 |sources| convention). */
  def cusum(events: DataFrame, k: Double, h: Double,
      tsCol: String = "event_time"): DataFrame = {
    require(k >= 0.0 && h > 0.0, s"need k >= 0 and h > 0: k=$k h=$h")
    val us = unix_micros(col(tsCol))
    val wins = events.filter(col(tsCol).isNotNull && us >= 0L)
      .select(us.as("__us"))
      .select(expr("__us div 3600000000").as("__wh"))
      .groupBy(col("__wh")).agg(count(lit(1)).as("n"))
    val mu = wins.agg(
      (sum(col("n").cast("decimal(38,0)")).cast("double") /
        count(lit(1)).cast("double")).as("__mu"))
    val dev = wins.crossJoin(broadcast(mu))
      .withColumn("__dqp", floor((col("n").cast("double") - col("__mu") -
        lit(k)) * lit(1.0e6)).cast("long"))
      .withColumn("__dqm", floor((col("n").cast("double") - col("__mu") +
        lit(k)) * lit(1.0e6)).cast("long"))
    val byTime = Window.orderBy(col("__wh"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = sum(col("__dqp")).over(byTime)
    val pm = sum(col("__dqm")).over(byTime)
    val runMin = least(lit(0L), min(p).over(byTime))
    val runMax = greatest(lit(0L), max(pm).over(byTime))
    dev.select(timestamp_micros(col("__wh") * lit(3600000000L)).as("window_start"),
        col("n"),
        ((p - runMin).cast("double") / lit(1.0e6)).as("cusum_pos"),
        ((runMax - pm).cast("double") / lit(1.0e6)).as("cusum_neg"))
      .withColumn("alarm",
        col("cusum_pos") > lit(h) || col("cusum_neg") > lit(h))
  }

  /** [[cusum]] against a FIXED trained baseline mean — the
    * rolling-monitor form (psiFrom's convention): production CUSUM
    * charts run against the in-control μ estimated on a reference
    * period, not the contaminated live mean. Same prefix-identity
    * plan; `mu` enters as a literal. */
  def cusumFrom(events: DataFrame, mu: Double, k: Double, h: Double,
      tsCol: String = "event_time"): DataFrame = {
    require(k >= 0.0 && h > 0.0, s"need k >= 0 and h > 0: k=$k h=$h")
    val us = unix_micros(col(tsCol))
    val wins = events.filter(col(tsCol).isNotNull && us >= 0L)
      .select(us.as("__us"))
      .select(expr("__us div 3600000000").as("__wh"))
      .groupBy(col("__wh")).agg(count(lit(1)).as("n"))
    val dev = wins
      .withColumn("__dqp", floor((col("n").cast("double") - lit(mu) -
        lit(k)) * lit(1.0e6)).cast("long"))
      .withColumn("__dqm", floor((col("n").cast("double") - lit(mu) +
        lit(k)) * lit(1.0e6)).cast("long"))
    val byTime = Window.orderBy(col("__wh"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = sum(col("__dqp")).over(byTime)
    val pm = sum(col("__dqm")).over(byTime)
    val runMin = least(lit(0L), min(p).over(byTime))
    val runMax = greatest(lit(0L), max(pm).over(byTime))
    dev.select(timestamp_micros(col("__wh") * lit(3600000000L)).as("window_start"),
        col("n"),
        ((p - runMin).cast("double") / lit(1.0e6)).as("cusum_pos"),
        ((runMax - pm).cast("double") / lit(1.0e6)).as("cusum_neg"))
      .withColumn("alarm",
        col("cusum_pos") > lit(h) || col("cusum_neg") > lit(h))
  }

  /** TIME-DECAY multi-touch attribution — the third standard model
    * beside last-touch (as-of) and [[attribution]]'s U-shape: each
    * touch in the window earns weight 2^(−Δt/halfLife) (a touch a
    * half-life before the conversion counts half as much as one at the
    * buzzer) and credits are the weights normalized per conversion.
    * Emits (user, conv_id, touch_id, dt_us, credit).
    *
    * Cross-engine: the weight's pow is floor-quantized to an exact
    * long at 1e6 (the repo's pow discipline); the per-conversion
    * normalizer is an exact long sum; credit is one IEEE division.
    * A conversion whose every touch quantizes to weight 0 (all touches
    * ≳20 half-lives stale) yields NULL credits, not 0/0.
    *
    * Scale shape: the same bucket-blocked candidate join as
    * [[attribution]] (the oracle runs the UNBLOCKED range join — every
    * gate re-proves blocking completeness); the normalizer runs in a
    * conversion-keyed window bounded by one conversion's touch
    * volume. */
  def attributionTimeDecay(events: DataFrame, convType: String,
      touchType: String, tolUs: Long, halfLifeUs: Long,
      tsCol: String = "event_time", keyCol: String = "user_id",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    require(tolUs > 0, s"tolUs must be positive: $tolUs")
    require(halfLifeUs > 0, s"halfLifeUs must be positive: $halfLifeUs")
    def side(t: String, idAs: String, usAs: String): DataFrame = events
      .filter(col(typeCol) === t && col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(idCol).as(idAs),
        unix_micros(col(tsCol)).as(usAs))
    def bucket(usName: String): Column =
      expr(s"$usName div $tolUs - " +
        s"(case when $usName % $tolUs < 0 then 1 else 0 end)")
    val c = side(convType, "conv_id", "__cus")
      .withColumn("__pb", explode(array(bucket("__cus") - 1L, bucket("__cus"))))
    val t = side(touchType, "touch_id", "__tus")
      .withColumnRenamed(keyCol, "__tk")
      .withColumn("__tb", bucket("__tus"))
    val j = c.join(t, col(keyCol) === col("__tk") && col("__pb") === col("__tb"))
      .filter(col("__tus") >= col("__cus") - lit(tolUs) &&
        col("__tus") < col("__cus"))
      .select(col(keyCol), col("conv_id"), col("touch_id"),
        (col("__cus") - col("__tus")).as("dt_us"))
    val wq = floor(pow(lit(2.0),
      -(col("dt_us").cast("double") / lit(halfLifeUs.toDouble))) *
      lit(1.0e6)).cast("long")
    val byConv = Window.partitionBy(col("conv_id"))
    j.withColumn("__wq", wq)
      .withColumn("__sw", sum(col("__wq")).over(byConv))
      .select(col(keyCol), col("conv_id"), col("touch_id"), col("dt_us"),
        when(col("__sw") === 0L, lit(null).cast("double"))
          .otherwise(col("__wq").cast("double") / col("__sw").cast("double"))
          .as("credit"))
  }

  /** Trending-terms CHURN monitor: per tumbling window, how much the
    * top-k term set turned over vs the IMMEDIATELY PRECEDING window —
    * churn = 1 − |A∩B|/|A∪B| over the two windows' top-k sets (0 =
    * stable leaderboard, 1 = complete turnover; the "did the trending
    * topics flip this hour" alarm a per-window top-k list doesn't
    * answer by itself). Consumes
    * [[graft.streaming.StreamingHist.windowedTopTerms]] in its exact
    * regime (capacity ≥ per-window distinct terms), so the sets — and
    * therefore the churn — are exact. Windows with no immediate
    * predecessor (traffic gaps, the first window) emit nothing: churn
    * against silence is undefined, not 1.0.
    *
    * Scale shape: the top-k relation is #windows×k; consecutive windows
    * pair by an EPOCH-SHIFT EQUI-JOIN (predecessor key = window_start −
    * duration) — no global sort, no lag window, no single-partition
    * anything. Set sizes are exact ints; churn is one IEEE division. */
  def topTermsChurn(df: DataFrame, tsCol: String, term: Column,
      windowDuration: String, k: Int, capacity: Int): DataFrame = {
    val durUs = graft.streaming.StreamingHist.fixedWindowUs(windowDuration)
    val sets = graft.streaming.StreamingHist
      .windowedTopTerms(df, tsCol, term, windowDuration, k, capacity)
      .groupBy(col("window_start"))
      .agg(sort_array(collect_list(col("term"))).as("__terms"))
    val cur = sets.select(unix_micros(col("window_start")).as("__k"),
      col("window_start"), col("__terms"))
    val prev = sets.select(
      (unix_micros(col("window_start")) + lit(durUs)).as("__k"),
      col("__terms").as("__prev"))
    val shared = size(array_intersect(col("__terms"), col("__prev")))
    val union = size(array_union(col("__terms"), col("__prev")))
    cur.join(prev, "__k")
      .select(col("window_start"),
        size(col("__terms")).cast("long").as("n_terms"),
        shared.cast("long").as("n_shared"),
        (lit(1.0) - shared.cast("double") / union.cast("double")).as("churn"))
  }

  /** Rank-Biased Overlap between consecutive windows' top-term RANKINGS
    * (Webber, Moffat & Zobel 2010, "A similarity measure for indefinite
    * rankings") — [[topTermsChurn]]'s rank-aware upgrade: Jaccard churn
    * treats the top-k as a SET, so the #1 and #k terms swapping ranks
    * reads as zero churn; RBO weights agreement at depth d by
    * p^(d−1)/d, so top-rank instability dominates the score. Truncated
    * (prefix) form: RBO = (1−p)·Σ_{d=1..k} p^(d−1)·X_d/d with X_d the
    * overlap of the two depth-d prefixes — the published lower bound
    * for indefinite rankings, exact for the monitored top-k itself.
    *
    * Cross-engine: rankings are the exact-regime [[graft.streaming
    * .StreamingHist.windowedTopTerms]] rows; prefixes/intersections are
    * exact integer ops; the weights (1−p)·p^(d−1)/d are DRIVER-computed
    * literals (no pow in either engine) and the weighted sum folds in
    * fixed depth order. Scale shape: the q240 shape — per-window
    * rankings collapse to ≤ k-row lists, consecutive windows pair by
    * the epoch-shift equi-join (no lag window), RBO is in-row. Windows
    * without an immediate predecessor emit nothing. */
  def topTermsRbo(df: DataFrame, tsCol: String, term: Column,
      windowDuration: String, k: Int, capacity: Int,
      p: Double = 0.9): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p out of (0,1): $p")
    val durUs = graft.streaming.StreamingHist.fixedWindowUs(windowDuration)
    val sets = graft.streaming.StreamingHist
      .windowedTopTerms(df, tsCol, term, windowDuration, k, capacity)
      .groupBy(col("window_start"))
      .agg(sort_array(collect_list(struct(col("rank"), col("term"))))
        .as("__a"))
      .select(col("window_start"),
        expr("transform(__a, x -> x.term)").as("__terms"))
    val cur = sets.select(unix_micros(col("window_start")).as("__k"),
      col("window_start"), col("__terms"))
    val prev = sets.select(
      (unix_micros(col("window_start")) + lit(durUs)).as("__k"),
      col("__terms").as("__prev"))
    val rbo = (1 to k).map { d =>
      val w = (1.0 - p) * math.pow(p, d - 1) / d
      lit(w) * size(array_intersect(
        slice(col("__terms"), 1, d), slice(col("__prev"), 1, d)))
        .cast("double")
    }.reduceLeft(_ + _)
    cur.join(prev, "__k")
      .select(col("window_start"),
        size(col("__terms")).cast("long").as("n_cur"),
        size(col("__prev")).cast("long").as("n_prev"),
        rbo.as("rbo"))
  }

  /** Per-(key, day) rate limiting: keep each key's first `n` events of
    * every day, drop the rest — the abuse-throttle / per-user quota
    * pass a pipeline runs before event analytics so one runaway
    * instrumentation loop cannot dominate a cohort. Deterministic: the
    * kept set is defined by the (time, id) total order (the
    * [[transitionMatrix]] ordering rule, NULL ordering columns
    * excluded); day = exact floor division ([[epochDay]]).
    *
    * Scale shape: ONE (key, day)-keyed exchange, a rank window whose
    * partitions are one key-day's events, map-side filter — linear in
    * survivors, no state beyond the window sort. */
  def rateLimit(events: DataFrame, n: Int, tsCol: String = "event_time",
      keyCol: String = "user_id", idCol: String = "event_id"): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val base = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(keyCol), col(idCol),
        unix_micros(col(tsCol)).as("__us"), epochDay(tsCol).as("day"))
    val w = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col("__us"), col(idCol))
    base.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= n)
      .select(col(keyCol), col("day"), col(idCol), col("rn"))
  }

  /** Referential-integrity audit for a planned join: row count, NULL
    * key count, ORPHAN count (non-NULL keys with no parent) and the
    * match rate — the pre-flight check a 100 TB join deserves (an
    * unnoticed 3% orphan rate silently drops 3 TB on an inner join;
    * better to measure it first and choose inner/left/quarantine
    * deliberately). Exact counts, one IEEE division for the rate
    * (match = non-NULL and matched; rate = matched/rows; NULL when the
    * child is empty).
    *
    * Scale shape: the parent collapses to DISTINCT keys
    * (map-combinable); the probe is ONE key-keyed LEFT equi-join
    * (AQE broadcasts small parents), then a single map-combinable
    * aggregate. No row ever carries more than the key. */
  def fkAudit(child: DataFrame, parent: DataFrame, childKey: String,
      parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__fk").isNull, lit(1L)).otherwise(lit(0L))).as("n_null_keys"),
        sum(when(col("__fk").isNotNull && col("__pk").isNull, lit(1L))
          .otherwise(lit(0L))).as("n_orphans"))
      .select(col("n_rows"), col("n_null_keys"), col("n_orphans"),
        when(col("n_rows") > 0L,
          (col("n_rows") - col("n_null_keys") - col("n_orphans")).cast("double") /
            col("n_rows").cast("double")).as("match_rate"))
  }

  /** Top-k event-type TRIGRAMS across all keys (behavior-motif mining:
    * the common three-step paths — "view → click → purchase" — without
    * fixing a funnel up front; [[transitionMatrix]]'s order-3
    * extension): each key's (time, id)-ordered stream yields its
    * consecutive type triples, counted globally and ranked. The
    * ordering rule and NULL-column exclusions are exactly
    * [[transitionMatrix]]'s; ties rank (count DESC, t1, t2, t3).
    *
    * Scale shape: ONE key-keyed exchange (both lag windows share it),
    * a map-combinable triple-count aggregate (≤ \|types\|³ groups),
    * TakeOrdered for the rank-k — no corpus-scale sort. */
  def eventTrigrams(events: DataFrame, k: Int, tsCol: String = "event_time",
      keyCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val ordered = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol),
        col(typeCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(idCol))
    ordered
      .withColumn("__t2", lag(col(typeCol), 1).over(w))
      .withColumn("__t1", lag(col(typeCol), 2).over(w))
      .filter(col("__t1").isNotNull)
      .groupBy(col("__t1").as("t1"), col("__t2").as("t2"),
        col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Event-type co-occurrence with LIFT: for every ordered pair of
    * distinct event types, how many keys exhibit BOTH, and
    * lift = n_ab·N / (n_a·n_b) — association mining over behaviors
    * ("users who export also share", feature-bundling and cannibalization
    * analysis). lift > 1 = the types attract, < 1 = they repel. All
    * arithmetic is two IEEE multiplies and one division on exact longs —
    * no transcendental, so the doubles are bit-identical cross-engine.
    * Pairs are emitted once with type_a < type_b (string order);
    * NULL keys/types drop (a NULL key is not a behaving entity).
    *
    * Scale shape: the corpus collapses to the DISTINCT (key, type)
    * relation (map-combinable pre-aggregation); the pair generator is a
    * key-keyed self-join of that relation — per-key cost |types_k|²,
    * bounded by the TYPE vocabulary squared, never event volume² — then
    * one (a, b) aggregate over at most |types|² groups; the per-type
    * and total counts ride broadcast joins. A hostile key exhibiting
    * every type costs |types|² rows — still vocabulary-, not
    * event-bounded. */
  def typeCooccurrence(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val kt = events
      .filter(col(keyCol).isNotNull && col(typeCol).isNotNull)
      .select(col(keyCol).as("__k"), col(typeCol).as("__t")).distinct()
    val perType = kt.groupBy(col("__t")).agg(count(lit(1)).as("__n1"))
    val total = kt.select(col("__k")).distinct().agg(count(lit(1)).as("__nk"))
    val pairs = kt.join(kt.select(col("__k"), col("__t").as("__t2")), "__k")
      .filter(col("__t") < col("__t2"))
      .groupBy(col("__t").as("type_a"), col("__t2").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("__t").as("type_a"), col("__n1").as("__na"))), "type_a")
      .join(broadcast(perType.select(col("__t").as("type_b"), col("__n1").as("__nb"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        (col("n_both").cast("double") * col("__nk").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double"))).as("lift"))
  }

  /** Key-skew report: the k heaviest keys by row count with their share
    * of total volume — the pre-flight diagnostic a 100 TB join/groupBy
    * needs (any key above ~1/partitions of the total will straggle or
    * spill its reducer; the salting/AQE-skew decision wants NAMES and
    * shares, not a boolean). Exact counts — the SpaceSaving top-terms
    * family trades exactness for bounded state; a skew probe feeding a
    * physical-plan decision should not guess. share = one IEEE division
    * of exact longs; ties break by key ascending NULLS LAST in both
    * engines (NULL is a real — often THE — skew key, so it is counted,
    * not dropped). Scale shape: ONE map-combinable count aggregate
    * (key-cardinality-sized output), the single-row total broadcast
    * back; the top-k is orderBy+limit — TakeOrderedAndProject, a
    * DISTRIBUTED partial top-k per partition then a k-bounded merge
    * (the distinct-key relation is corpus-scale for high-cardinality
    * keys like user ids, so a global rank window would drag ~1e9 rows
    * through one WindowExec partition at 100 TB). Ranks then come from
    * the position in ONE sorted ≤k-element array — no WindowExec in
    * the plan (pinned by PlanShapeSpec). */
  /** Per-user inter-event burstiness index (Goh & Barabási 2008): B =
    * (σ − μ)/(σ + μ) over the user's inter-arrival gaps in
    * MICROSECONDS — B → −1 for clockwork-periodic traffic (σ ≪ μ), ~0
    * for Poisson arrivals (σ ≈ μ), → +1 for extreme burst-and-silence
    * patterns (σ ≫ μ). The bot/scraper discriminator a plain event
    * count misses: a cron scraper and a human can fire the SAME number
    * of events with opposite B.
    *
    * Exactness: gaps are exact integer microseconds from a
    * user-partitioned lag (ordered by ts, event_id — bounded by the
    * user's history, the q87 precedent); Σg and Σg² are EXACT INTEGER
    * arithmetic in DECIMAL(38,0) (g² ≈ 1e22 overflows a long and sits
    * past the 2^53 window where decimal(38,14)'s split-cast would
    * overflow ITS long too — the q123/q189 integer route, one final
    * double cast each, identical round-to-nearest in both engines);
    * the tail (two divisions, GREATEST-clamped √, one ratio) is a
    * fixed IEEE sequence. Users with < 2 events have no gaps and emit
    * no row; an all-zero-gap user (σ + μ = 0) yields NULL. */
  def burstiness(events: DataFrame): DataFrame = {
    val usExpr = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    val gaps = events.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), usExpr.as("__us"))
      .withColumn("__g", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__g").isNotNull)
    val gd = col("__g").cast("decimal(19,0)")
    val agg = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__g").cast("decimal(38,0)")).cast("double").as("__sg"),
        sum(gd * gd).cast("double").as("__sgg"))
    val mean = col("__sg") / col("__n")
    val variance = greatest(lit(0.0),
      col("__sgg") / col("__n") - mean * mean)
    val sigma = sqrt(variance)
    agg.select(col("user_id"), col("__n").cast("long").as("n_gaps"),
      mean.as("mean_gap_us"),
      when(sigma + mean > lit(0.0), (sigma - mean) / (sigma + mean))
        .otherwise(lit(null).cast("double")).as("burstiness"))
  }

  /** ROLLING (unbounded) retention — the other retention definition
    * dashboards plot beside [[retention]]'s classic form: a user counts
    * at offset t if they were active at t OR ANY LATER day ("will they
    * ever come back?"), so the curve is monotone non-increasing and
    * reads as the survival function of churn. Per (cohort, offset ≤
    * cohort's max observed offset): users whose LAST activity offset is
    * ≥ the offset.
    *
    * Scale shape: the corpus collapses to one (user → cohort, max
    * offset) row (two map-combinable aggregates over distinct
    * user-days); each user then explodes to max_offset+1 rows —
    * bounded by the observation window in DAYS, never event volume —
    * and one (cohort, offset) count finishes. Exact longs only. */
  def rollingRetention(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id"): DataFrame = {
    val day = epochDay(tsCol)
    val act = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol), day.as("__day")).distinct()
    val span = act.groupBy(col(keyCol))
      .agg(min("__day").as("__cohort"), max("__day").as("__last"))
      .select(col("__cohort"), (col("__last") - col("__cohort")).as("__maxOff"))
    span.select(col("__cohort"),
        explode(sequence(lit(0L), col("__maxOff"))).as("offset_days"))
      .groupBy(col("__cohort").as("cohort_day"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Exponential half-life fit of each cohort's retention curve — the
    * scalar a growth team actually tracks ("how many days until half
    * the cohort is gone?"): per cohort, OLS of quantized ln(rate) on
    * offset_days over the [[retentionRates]] triangle (rate decays
    * ~exp(-λ·t) ⇒ ln rate is linear in t; half-life = ln2/λ). One row
    * per cohort: point count, decay rate λ (per day, ≥ along the fit),
    * and half_life_days (NULL when the fit is degenerate — fewer than
    * 2 points, zero x-variance, or a non-decaying slope).
    *
    * Cross-engine bit-exactness: rates are one IEEE division of exact
    * longs, each ln is 1e-3-quantized to a long (the q210 Zipf
    * discipline — absorbs last-ulp ln() differences between engines),
    * the OLS moments are exact BIGINT sums, and the final slope /
    * λ / half-life are a fixed sequence of correctly-rounded IEEE
    * ops on those exact longs (ln 2 enters as a literal double, not
    * an engine's log call).
    *
    * Scale shape: everything downstream of [[retention]]'s triangle
    * (cohort×offset-bounded — tiny) is a map-combinable cohort-keyed
    * aggregate; no window, no sort, no driver state. */
  def retentionHalfLife(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id"): DataFrame = {
    val r = retentionRates(events, tsCol, keyCol)
    val q = r.select(col("cohort_day"),
      col("offset_days").cast("long").as("__x"),
      floor(log(col("retention_rate")) * lit(1.0e3)).cast("long").as("__y"))
    val m = q.groupBy(col("cohort_day")).agg(
      count(lit(1)).as("n_points"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val nD = col("n_points").cast("double")
    def d(name: String): Column = col(name).cast("double")
    val cov = nD * d("__sxy") - d("__sx") * d("__sy")
    val varX = nD * d("__sxx") - d("__sx") * d("__sx")
    // slope is in quantized-ln units (×1e3) per day; λ = −slope/1e3
    val decay = when(col("n_points") >= 2L && varX > lit(0.0),
      -(cov / varX) / lit(1.0e3))
    m.select(col("cohort_day"), col("n_points"),
      decay.as("decay_rate"),
      when(decay > lit(0.0), lit(0.6931471805599453) / decay)
        .as("half_life_days"))
  }

  /** Per-user BEHAVIORAL perplexity — the q197 bigram-LM discipline on
    * event streams: score every user's event-type sequence under the
    * first-order Markov model trained on the corpus itself (transition
    * p(tᵢ|tᵢ₋₁) = cnt(tᵢ₋₁→tᵢ)/cnt(tᵢ₋₁→·), the unigram start
    * p(t₀)), emitting (user_id, n_events, markov_score = mean token
    * log-prob). A bot replaying an impossible ORDER of individually
    * common events scores low here and normal everywhere else — the
    * behavioral-anomaly complement of q144's volume z-score.
    *
    * Event order is the engine-independent (time, event_id) total
    * order. Cross-engine: each ln 1e-9-quantized, per-user
    * contributions fold in that order (sorted-array fold == SUM would
    * not do — the mean is over per-position doubles), one IEEE
    * division. NULL user/type/time rows drop.
    *
    * Scale shape: one user-keyed lag window (partition = one user's
    * events), map-combinable transition/unigram counts equi-joined
    * back, single-row total broadcast, per-user fold with memory =
    * user's event count. No global sort. */
  def sessionPerplexity(events: DataFrame, tsCol: String = "event_time",
      keyCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val base = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol),
        col(typeCol).as("__t"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(idCol))
    // pinned: the lagged relation feeds three subtrees (bigram counts,
    // first-token scores, rest-token scores) — each re-ran the key
    // window without the pin
    val lg = graft.util.RelCache.persist(
      base.withColumn("__prev", lag(col("__t"), 1).over(w)))
    val uni = base.groupBy(col("__t")).agg(count(lit(1)).as("__c1"))
    val total = base.agg(count(lit(1)).as("__tt"))
    val big = lg.filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col("__t")).agg(count(lit(1)).as("__c2"))
    val fromTot = big.groupBy(col("__prev")).agg(sum(col("__c2")).as("__cf"))
    def qln(num: Column, den: Column): Column =
      floor(log(num.cast("double") / den.cast("double")) * lit(1.0e9)) / lit(1.0e9)
    val first = lg.filter(col("__prev").isNull)
      .join(uni, "__t").crossJoin(broadcast(total))
      .select(col(keyCol), col("__us"), col(idCol),
        qln(col("__c1"), col("__tt")).as("__lp"))
    val rest = lg.filter(col("__prev").isNotNull)
      .join(big, Seq("__prev", "__t"))
      .join(broadcast(fromTot), Seq("__prev"))
      .select(col(keyCol), col("__us"), col(idCol),
        qln(col("__c2"), col("__cf")).as("__lp"))
    first.unionByName(rest)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__us"), col(idCol),
          col("__lp")))).as("__a"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("n_events"),
        (aggregate(col("__a"), lit(0.0), (acc, x) => acc + x.getField("__lp")) /
          col("n_events").cast("double")).as("markov_score"))
  }

  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("__t"))
    val top = counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__t").cast("double")).as("share"))
      .orderBy(col("cnt").desc, col(keyCol).asc_nulls_last)
      .limit(k)
    // same total order as the TakeOrdered, replayed on the ≤k rows
    val cmp = (l: Column, r: Column) => {
      val (lk, rk) = (l.getField("k"), r.getField("k"))
      when(l.getField("c") > r.getField("c"), lit(-1))
        .when(l.getField("c") < r.getField("c"), lit(1))
        .when(lk.isNull && rk.isNull, lit(0))
        .when(lk.isNull, lit(1)).when(rk.isNull, lit(-1))
        .when(lk < rk, lit(-1)).when(lk > rk, lit(1)).otherwise(lit(0))
    }
    top.agg(collect_list(struct(col("cnt").as("c"), col(keyCol).as("k"),
        col("share").as("s"))).as("__a"))
      .select(posexplode(array_sort(col("__a"), cmp)).as(Seq("__p", "__x")))
      .select(col("__x.k").as(keyCol), col("__x.c").as("cnt"),
        col("__x.s").as("share"), (col("__p") + lit(1)).cast("int").as("rank"))
  }
}
