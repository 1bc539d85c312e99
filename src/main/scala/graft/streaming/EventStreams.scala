package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * Every transform here takes a plain DataFrame, so the identical code
  * runs in batch (for the DuckDB-oracle twins q22/q23) and under
  * `readStream` (watermarks only bind on streaming plans). Batch
  * equivalence is the test contract (SURVEY §7.2 M4): same input ⇒ same
  * aggregate as the batch query.
  *
  * Scale notes: windowed aggregates shuffle on (window, key) and keep
  * per-window state in the state store; the watermark bounds state so a
  * 100 TB/day stream doesn't accumulate unbounded windows. Session
  * windows use Spark's native `session_window` (state-store-merged
  * gap sessions).
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type (streaming twin of q22).
    * 10-minute watermark: late events beyond it are dropped, closed
    * windows are evicted from state. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** TRENDING TOP-K, batch twin (q142): the k most frequent event
    * types per tumbling window. Per-window rank partitions on the
    * window start — high-cardinality over any real time span, so the
    * window sort never funnels (the opposite regime from q97's
    * few-groups caveat). */
  def trendingTopK(events: DataFrame, k: Int,
      windowDur: String = "1 hour"): DataFrame = {
    val counts = events
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("cnt").desc, col("event_type"))
    counts.withColumn("rn", row_number().over(rw)).filter(col("rn") <= k)
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("rn"))
  }

  /** TRENDING TOP-K, streaming: ranking after a streaming aggregation
    * is unsupported in append mode, so this is the standard two-stage
    * recipe — the windowed count runs as the streaming aggregate
    * (watermark closes windows and bounds state), and each CLOSED
    * window is ranked in `foreachBatch`. Sound because append mode
    * emits a window's counts exactly once, all in the micro-batch
    * where the watermark crosses its end — the batch ALWAYS holds
    * every (window, type) row of each window it sees, so the local
    * rank is the global rank. Sink rows are immutable appends
    * (windows never re-emit), making retries at-least-once appends of
    * identical rows — dedupe on (w_start, rn) downstream if the sink
    * must be exactly-once. */
  def trendingTopKStream(events: DataFrame, k: Int, targetDir: String,
      checkpoint: String, windowDur: String = "1 hour",
      watermark: String = "0 seconds"): org.apache.spark.sql.streaming.StreamingQuery = {
    val counts = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    counts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rw = org.apache.spark.sql.expressions.Window
          .partitionBy("w").orderBy(col("cnt").desc, col("event_type"))
        batch.withColumn("rn", row_number().over(rw)).filter(col("rn") <= k)
          .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("rn"))
          .write.mode("append").parquet(targetDir)
        ()
      }
      .start()
  }

  /** Sliding windows: 1-hour span every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Native gap-based session windows per user (30-minute inactivity
    * gap — the streaming twin of q23's lag-based sessionization). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Stream-stream interval join (attribution shape): each purchase
    * joins the views of the same user within the preceding 30 minutes.
    * Watermarks on both sides bound the join state; the interval
    * condition gives Spark the eviction window. Works identically on
    * batch DataFrames (the batch-equivalence spec contract). */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(v, col("v_user") === col("p_user")
        && col("v_ts") <= col("p_ts")
        && col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** LEFT-OUTER stream-stream interval join: like
    * [[viewPurchaseAttribution]], but purchases with NO qualifying view
    * in the preceding 30 minutes still emit one row with a null
    * `view_id` — the "direct purchase" detection shape. In streaming,
    * the unmatched row for a purchase is emitted exactly once, when the
    * watermark passes the end of its join interval (until then a
    * matching view could still arrive); state stays watermark-bounded
    * exactly as in the inner variant. Works identically on batch
    * DataFrames (the batch-equivalence spec contract and the q73 batch
    * twin). */
  def viewPurchaseAttributionOuter(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(v, col("v_user") === col("p_user")
        && col("v_ts") <= col("p_ts")
        && col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** Streaming exact deduplication: drop repeated `idCols` rows, with
    * the watermark bounding the dedup state (ids older than the
    * watermark are evicted — the streaming twin of the batch exact-dedup
    * operator, and the standard shape for at-least-once ingest). */
  def streamingDedup(events: DataFrame, idCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      // dedup on the ids alone (a retried producer may re-stamp ts);
      // the watermark still bounds the dedup state
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  // ------------------------------------------------------------------
  // Custom state: mapGroupsWithState session counting
  // ------------------------------------------------------------------

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class SessState(lastTs: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Per-user session/event counters via explicit state
    * (`mapGroupsWithState`) — the "custom stateful operator" surface.
    * Equivalent to q23 when the whole input arrives in one batch. */
  def statefulSessionCounts(events: Dataset[Ev], gapSeconds: Long = 1800): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, UserSessions](GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[SessState]) =>
          val prior = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          val next = evs.toSeq.sortBy(_.ts.getTime).foldLeft(prior) { (st, e) =>
            val t = e.ts.getTime / 1000
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > gapSeconds
            SessState(t, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(next)
          UserSessions(user, next.sessions, next.events)
      }
  }

  case class ValEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp, x: Long)
  case class EwmaState(ew: Long, seeded: Boolean)
  case class EwmaOut(user_id: Long, event_id: Long, x: Long,
      ewma_prev: Option[Long], anomaly: Boolean)

  /** Streaming twin of [[graft.operators.TimeSeries.ewmaAnomalies]]:
    * the identical integer fixed-point recurrence (⌊(x+7·ew)/8⌋, flag
    * 2·x > 3·ew_prev) with the single (ew, seeded) pair per key held
    * in the state store — the smallest possible stateful-operator
    * state. Events are ordered (ts, event_id) WITHIN each micro-batch;
    * cross-batch order is arrival order, so an in-order feed
    * reproduces the batch result exactly (EwmaStreamSpec proves both
    * the one-batch and the two-micro-batch replay equal the batch
    * operator row-for-row). */
  def ewmaAnomalyStream(events: Dataset[ValEv]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (k, evs, state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0L, false))
          val out = evs.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              val p = if (st.seeded) Some(st.ew) else None
              val anomaly = p.exists(pv => 2L * e.x > 3L * pv)
              st = EwmaState(if (st.seeded) (e.x + 7L * st.ew) / 8L else e.x, seeded = true)
              EwmaOut(k, e.event_id, e.x, p, anomaly)
            }
          state.update(st)
          out.iterator
      }
  }

  case class TrEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class TrState(last_type: String)
  case class TrOut(user_id: Long, from_type: String, to_type: String)

  /** STREAMING NEXT-EVENT TRANSITIONS — the stateful twin of q161's
    * lead(1) pairing: one carried `last event type` per user in the
    * state store (the smallest possible Markov-chain state), each
    * micro-batch sorted (ts, event_id) within itself, transitions
    * emitted across the batch boundary through the carried state. An
    * in-order feed reproduces the batch window exactly
    * (TransitionStreamSpec proves one-batch and two-micro-batch
    * replay equal the batch pairing row-for-row); the transition
    * MATRIX is then an ordinary downstream aggregation in either
    * mode. */
  def transitionStream(events: Dataset[TrEv]): Dataset[TrOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TrState, TrOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (k, evs, state: GroupState[TrState]) =>
          var last = state.getOption.map(_.last_type)
          val out = evs.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .flatMap { e =>
              val o = last.map(t => TrOut(k, t, e.event_type))
              last = Some(e.event_type)
              o
            }
          last.foreach(t => state.update(TrState(t)))
          out.iterator
      }
  }

  case class PatState(residual: String, total: Long)
  case class PatMatch(user_id: Long, n_new: Long, n_total: Long)

  /** STREAMING EVENT-PATTERN MATCHING — q215's CEP twin as a stateful
    * stream (the Flink-CEP / MATCH_RECOGNIZE-on-streams shape): per
    * user, the journey string accumulates across micro-batches (batch
    * rows sorted by (ts, event_id) — the same total order as the batch
    * twin) and a row is EMITTED each time one or more NEW
    * non-overlapping completions of `pattern` appear.
    *
    * The pattern MUST use RELUCTANT quantifiers (`*?` — the default
    * does): leftmost-SHORTEST non-overlapping matches are determined
    * by the prefix alone, so appending future text never changes what
    * already matched — which is exactly the property that makes the
    * stream's incremental answer equal the batch full-string answer
    * under ANY micro-batch slicing. A greedy `[^e]*` is not
    * prefix-stable: on `vcpvcp` it swallows both completions into one
    * match, and the same stream sliced `vcp|vcp` would count two —
    * greedy CEP semantics depend on where the batch boundary fell,
    * which is not a semantics at all. Matched spans can never
    * participate in future matches, so state keeps only the RESIDUAL
    * TAIL after the last match end plus the running total, bounding
    * state by the longest unmatched suffix, not stream length (the
    * state-eviction argument a 100 TB/day event stream requires).
    *
    * PRECONDITION — in-order arrival across batches: events are
    * totally ordered by (ts, event_id) only WITHIN a micro-batch; the
    * prefix-stability argument assumes a user's later batch carries
    * later events. An event arriving in a later batch with an EARLIER
    * timestamp is appended after the residual (there is no watermark
    * or late-event reordering here), silently diverging from the
    * batch twin — feed this operator a source that preserves per-user
    * order (a keyed log like Kafka partitions-by-user does; an
    * unordered backfill does not).
    *
    * Unbounded state on the long tail of one-visit users is the cost
    * of keeping exact totals forever; when an idle-eviction policy is
    * acceptable, use [[patternMatchStreamTtl]] — the same matcher on
    * `transformWithState` with a declarative state TTL. */
  def patternMatchStream(events: Dataset[TrEv],
      pattern: String = "v[^e]*?c[^e]*?p"): Dataset[PatMatch] = {
    import events.sparkSession.implicits._
    val compiled = pattern // serialize the string, compile per executor use
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PatState, PatMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (k, evs, state: GroupState[PatState]) =>
          val st = state.getOption.getOrElse(PatState("", 0L))
          val (n, next) = PatternLogic.advance(compiled, st, evs)
          state.update(next)
          if (n > 0) Iterator.single(PatMatch(k, n, next.total)) else Iterator.empty
      }
  }

  /** Shared CEP step: fold one micro-batch of a user's events into the
    * carried [[PatState]] — used by BOTH the flatMapGroupsWithState
    * and the transformWithState spellings so their semantics can never
    * drift. */
  private[streaming] object PatternLogic {
    def advance(pattern: String, st: PatState,
        evs: Iterator[TrEv]): (Long, PatState) = {
      val appended = st.residual + evs.toSeq
        .sortBy(e => (e.ts.getTime, e.event_id))
        // take(1), not substring: an empty event_type encodes to ""
        // instead of throwing (matches the batch twin, whose SQL
        // substring returns '' on '')
        .map(e => e.event_type.take(1)).mkString
      val m = java.util.regex.Pattern.compile(pattern).matcher(appended)
      var n = 0L
      var lastEnd = 0
      while (m.find()) { n += 1; lastEnd = m.end() }
      (n, PatState(appended.substring(lastEnd), st.total + n))
    }
  }

  /** [[patternMatchStream]] with IDLE-STATE EVICTION via
    * `transformWithState` + `TTLConfig` (round-13 verdict task — the
    * [[FirstSeenProcessor]] recipe): the one unbounded-state surface
    * in the streaming family gets a declared bound. A state TTL, not
    * a group-state timer, because expiry is LAZY (the store treats a
    * stale value as absent on read and cleans it in maintenance) — no
    * timer batches, and the query drains normally under
    * Trigger.AvailableNow.
    *
    * Eviction contract (declared, not silent): an idle-past-TTL user
    * loses residual AND running total TOGETHER (they live in one
    * state value — a half-evicted state would be a third semantics
    * nobody declared). A re-appearing user's journey RESTARTS: an
    * incomplete funnel spanning the idle gap is never completed, and
    * `n_total` restarts from zero. `ttlMillis <= 0` keeps state
    * forever — exact equality with the batch twin under the in-order
    * precondition, identical to [[patternMatchStream]].
    * Requires the RocksDB state-store provider (the transformWithState
    * contract in Spark 4). */
  class PatternProcessor(pattern: String, ttlMillis: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TrEv, PatMatch] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[PatState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[PatState]("pat",
        org.apache.spark.sql.Encoders.product[PatState],
        if (ttlMillis <= 0) org.apache.spark.sql.streaming.TTLConfig.NONE
        else org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofMillis(ttlMillis)))
    override def handleInputRows(key: Long, rows: Iterator[TrEv],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[PatMatch] = {
      val prev = if (st.exists()) st.get() else PatState("", 0L)
      val (n, next) = PatternLogic.advance(pattern, prev, rows)
      st.update(next)
      if (n > 0) Iterator.single(PatMatch(key, n, next.total)) else Iterator.empty
    }
  }

  /** See [[PatternProcessor]]. */
  def patternMatchStreamTtl(events: Dataset[TrEv],
      pattern: String = "v[^e]*?c[^e]*?p",
      ttlMillis: Long = 0L): Dataset[PatMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new PatternProcessor(pattern, ttlMillis),
        if (ttlMillis <= 0) org.apache.spark.sql.streaming.TimeMode.None()
        else org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  // ---- transformWithState (the Spark 4 arbitrary-state API) ---------

  case class HashedDoc(content_hash: String, doc_id: Long)

  /** First-seen gate as a Spark 4 [[org.apache.spark.sql.streaming
    * .StatefulProcessor]]: one ValueState[Boolean] per content hash,
    * with an OPTIONAL state TTL — the state-eviction policy
    * `dropDuplicates` cannot express (its state lives and dies with
    * the event-time watermark; a crawl-dedup window of "suppress
    * re-fetches for 7 days" is processing-time TTL, not lateness).
    * Within a batch, equal-hash rows resolve to the LOWEST doc_id
    * (deterministic under any partition order). Requires the RocksDB
    * state-store provider (the transformWithState contract in Spark
    * 4) — which BENCH_STREAM_r10 shows is what you run anyway. */
  class FirstSeenProcessor(ttlMillis: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, HashedDoc, HashedDoc] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean,
        if (ttlMillis <= 0) org.apache.spark.sql.streaming.TTLConfig.NONE
        else org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofMillis(ttlMillis)))
    override def handleInputRows(key: String, rows: Iterator[HashedDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[HashedDoc] =
      if (seen.exists() || !rows.hasNext) Iterator.empty
      else { seen.update(true); Iterator.single(rows.minBy(_.doc_id)) }
  }

  /** Streaming first-seen dedup over (content_hash, doc_id) rows —
    * `ttlMillis > 0` turns on processing-time state TTL (the state
    * store forgets a hash after the window, re-admitting the next
    * occurrence); `0` keeps state forever like batch exact dedup. */
  def firstSeenStream(docs: Dataset[HashedDoc], ttlMillis: Long = 0L): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.content_hash)
      .transformWithState(new FirstSeenProcessor(ttlMillis),
        if (ttlMillis <= 0) org.apache.spark.sql.streaming.TimeMode.None()
        else org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  case class ClosedSession(user_id: Long, start_s: Long, end_s: Long, n_events: Long)
  case class OpenSession(start: Long, last: Long, n: Long)

  /** Closed-session emission via `flatMapGroupsWithState`: sessions are
    * held in state and EMITTED AS ROWS when a later event closes them
    * (gap exceeded) — zero or many output rows per invocation, which is
    * the flatMap (not map) state contract. The still-open session stays
    * in state; on a real stream a timeout would flush it, in the batch
    * twin the final open session remains unemitted by design. */
  def closedSessions(events: Dataset[Ev], gapSeconds: Long = 1800): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[OpenSession]) =>
          // null timestamps can't belong to any session — drop them like
          // window()/session_window do, instead of NPEing the job
          val sorted = evs.toSeq.iterator.filter(_.ts != null)
            .map(_.ts.getTime / 1000).toSeq.sorted
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var open = state.getOption
          sorted.foreach { t =>
            open match {
              case Some(o) if t - o.last <= gapSeconds =>
                open = Some(o.copy(last = t, n = o.n + 1))
              case Some(o) =>
                closed += ClosedSession(user, o.start, o.last, o.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** Production-shape closed-session emission: [[closedSessions]] plus
    * `GroupStateTimeout.EventTimeTimeout`. When the watermark passes a
    * session's expiry (`last + gap`), no event that could still extend
    * it can ever arrive (it would be late beyond the watermark and
    * dropped), so the open session is flushed as a row and its state
    * removed — on a live stream every session is eventually emitted,
    * where the NoTimeout variant holds the final open session of a
    * quiet user forever. State per user is one [[OpenSession]];
    * expired state is removed by the timeout, so total state is
    * bounded by concurrently-active users — the property that matters
    * on a 100 TB/day stream. */
  def closedSessionsStreaming(events: Dataset[Ev], gapSeconds: Long = 1800,
      lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user, evs, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark ≥ last + gap: the session can never be extended
            val o = state.get
            state.remove()
            Iterator.single(ClosedSession(user, o.start, o.last, o.n))
          } else {
            // Full interval-merge sessionization of (existing open
            // session ∪ this batch's events), sorted by start: exact
            // batch-twin semantics for everything in hand — in-watermark
            // out-of-order events extend the open interval on EITHER
            // side (never regress it), and stragglers older than the
            // open session sessionize among themselves instead of
            // splitting into singletons. All intervals except the
            // latest are emitted; only the latest stays open (the one
            // approximation single-interval state forces: an emitted
            // older interval could in principle still be extended by an
            // even-later straggler — the watermark bounds how late).
            val times = evs.toSeq.iterator.filter(_.ts != null)
              .map(_.ts.getTime / 1000).toSeq
            val intervals = (times.map(t => OpenSession(t, t, 1)) ++ state.getOption.toSeq)
              .sortBy(o => (o.start, o.last)) // the one sort this path needs
            // fold prepends, so the head is always the latest interval
            val merged = intervals.foldLeft(List.empty[OpenSession]) { (acc, iv) =>
              acc match {
                case head :: tail if iv.start - head.last <= gapSeconds =>
                  OpenSession(head.start, math.max(head.last, iv.last), head.n + iv.n) :: tail
                case _ => iv :: acc
              }
            }
            merged match {
              case Nil => Iterator.empty // only null-ts events, no state
              case keepOpen :: toClose =>
                state.update(keepOpen)
                // Re-arm EVERY invocation: Spark clears a group's timeout
                // on each call unless setTimeoutTimestamp is called again
                // — skipping it (e.g. on a null-ts-only batch) silently
                // disarms the flush and leaks the session + its state.
                // Clamped ahead of the current watermark: a stale or
                // gap<lateness expiry can lie at/behind the watermark,
                // which GroupState rejects; the clamp flushes next batch.
                state.setTimeoutTimestamp(math.max(
                  (keepOpen.last + gapSeconds) * 1000, state.getCurrentWatermarkMs + 1))
                toClose.reverse.iterator
                  .map(o => ClosedSession(user, o.start, o.last, o.n))
            }
          }
      }
  }

  /** Stream-static enrichment join: the streaming fact side joins a
    * static (batch) dimension — Spark broadcasts/rereads the static
    * side per micro-batch with no state. The standard shape for
    * attaching slowly-changing reference data to a 100 TB/day stream. */
  def enrichWithCustomer(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"))

  // ------------------------------------------------------------------
  // Observability: per-batch row accounting (Dataset.observe) + exact
  // watermark-drop counters from the state-store progress metrics
  // ------------------------------------------------------------------

  /** Attach a named per-micro-batch input-row counter (`Dataset
    * .observe`) ahead of a streaming transform. Observed metrics ride
    * the StreamingQueryProgress events, so a production monitor can
    * reconcile rows-fed vs rows-aggregated per batch without a second
    * count job — at 100 TB/day the counter is a side-output of work
    * already done, not a new scan. */
  def withInputCounter(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** Sum a named observed metric's `rows` across a query's recent
    * progress events (the replay harness runs few micro-batches, well
    * inside the progress retention window). */
  def observedRowCount(q: org.apache.spark.sql.streaming.StreamingQuery, name: String): Long =
    q.recentProgress.iterator.flatMap(p =>
      Option(p.observedMetrics.get(name))).map(_.getLong(0)).sum

  /** Exact count of input rows DISCARDED for arriving behind the
    * watermark, summed over the query's state operators and recent
    * micro-batches (`numRowsDroppedByWatermark`). This is the number
    * the late-data contract is stated in: fed K late rows, a correct
    * watermark pipeline reports exactly K here and leaks none into
    * closed windows. */
  def droppedByWatermark(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.iterator.flatMap(_.stateOperators.iterator)
      .map(_.numRowsDroppedByWatermark).sum

  /** Idempotent per-batch dedup-upsert — the body of an exactly-once
    * `foreachBatch` sink over an at-least-once source. Two properties
    * compose into row-level exactly-once on a plain parquet target (no
    * transactional table format needed):
    *
    *  1. **Cross-batch dedup**: the batch drops in-batch duplicates,
    *     then left-anti-joins the current snapshot on the key — rows
    *     re-delivered in a LATER batch (source replays, overlapping
    *     retention windows) insert nothing.
    *  2. **Batch idempotency**: survivors land in a batch-id-named
    *     partition directory written with `overwrite` — a RETRY of the
    *     same micro-batch (failure after a partial write) rewrites that
    *     directory in place instead of appending a second copy.
    *
    * At 100 TB/day the anti-join is the usual content-key shuffle
    * (only the key column of the snapshot participates — column
    * pruning keeps the probe narrow), and each batch writes only its
    * own partition, never rewriting the snapshot. This is the
    * streaming twin of the batch incremental dedup (q74) with the
    * same keep-first semantics. */
  def dedupUpsertBatch(spark: SparkSession, batch: DataFrame, targetDir: String,
      keys: Seq[String], batchId: Long): Unit = {
    val fresh0 = batch.dropDuplicates(keys)
    val hasData = hasBatchPartitions(spark, targetDir)
    val fresh =
      if (!hasData) fresh0
      else {
        val existingKeys = spark.read.parquet(targetDir)
          .select(keys.map(col): _*)
          // a retried batch must not anti-join against its own partial
          // output — exclude this batch id from the probe side
          .filter(col("batch") =!= batchId)
          .drop("batch")
        fresh0.join(existingKeys, keys, "left_anti")
      }
    fresh.write.mode("overwrite").parquet(s"$targetDir/batch=$batchId")
  }

  /** Start the exactly-once ingest: stream → [[dedupUpsertBatch]] per
    * micro-batch. The checkpoint pins batch-id assignment, so a
    * restarted query replays the same data under the same batch id —
    * landing in the same overwritten directory. */
  def dedupUpsertStream(events: DataFrame, targetDir: String, keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        dedupUpsertBatch(batch.sparkSession, batch.toDF(), targetDir, keys, id)
      }
      .start()

  /** STREAMING LSH NEAR-DUP GATE — the streaming twin of the batch
    * [[graft.operators.Dedup.lshDedupGate]]: each micro-batch computes
    * its docs' MinHash band keys, probes a persisted band DIRECTORY
    * (narrow (band_idx, bh, owner) rows — bytes per doc, the
    * incremental-fuzzy index shape), flags a doc dup when any of its
    * buckets was already claimed (by an earlier batch, or by a
    * smaller id within this batch), and appends only the NEWLY
    * claimed buckets. Exactly-once like [[dedupUpsertBatch]]: the
    * checkpoint pins batch ids, a retried batch excludes its own
    * partial output from the probe and overwrites its own partition.
    * Replayed in id order this equals the batch gate row-for-row
    * (spec contract); under arbitrary arrival order the semantics are
    * first-arrival-wins, the honest streaming statement. */
  def lshGateBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, stateDir: String, outDir: String, batchId: Long,
      n: Int = 2, k: Int = 12, bands: Int = 2): Unit = {
    import graft.operators.Dedup
    val b = Dedup.minhashBands(batch, idCol, textCol, n, k, bands)
      .localCheckpoint() // two consumers (claims + flags); one signature pass
    val claimed = b.groupBy("band_idx", "bh").agg(min(col("doc_id")).as("owner"))
    val hasData = hasBatchPartitions(spark, stateDir)
    val existing =
      if (!hasData) null
      else spark.read.parquet(stateDir)
        .filter(col("batch") =!= batchId)
        .select(col("band_idx"), col("bh"), col("owner").as("prev_owner"))
    val withPrev =
      if (existing == null) b.join(claimed, Seq("band_idx", "bh"))
        .withColumn("prev_owner", lit(null).cast("long"))
      else b.join(claimed, Seq("band_idx", "bh"))
        .join(existing, Seq("band_idx", "bh"), "left")
    val flags = withPrev
      .groupBy("doc_id")
      .agg(min(coalesce(col("prev_owner"), col("owner"))).as("first_owner"),
        max((col("prev_owner").isNotNull ||
          col("owner") < col("doc_id")).cast("int")).as("dup"))
      .select(col("doc_id"), col("first_owner"), (col("dup") === 1).as("is_dup"))
    val fresh =
      if (existing == null) claimed
      else claimed.join(existing.select("band_idx", "bh"),
        Seq("band_idx", "bh"), "left_anti")
    // docs with no shingles never reach the band relation: re-attach
    val all = batch.select(col(idCol).as("doc_id")).join(flags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("first_owner"), col("doc_id")).as("first_owner"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
    fresh.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    all.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  /** Start the streaming gate: stream → [[lshGateBatch]] per
    * micro-batch. */
  def lshGateStream(docs: DataFrame, idCol: String, textCol: String,
      stateDir: String, outDir: String, checkpoint: String,
      n: Int = 2, k: Int = 12, bands: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        lshGateBatch(batch.sparkSession, batch.toDF(), idCol, textCol,
          stateDir, outDir, id, n, k, bands)
      }
      .start()

  /** LSM-STYLE STREAMING LOG COMPACTION — the CDC twin of
    * [[dedupUpsertBatch]] for UPDATING streams (latest-op-wins with
    * tombstones, not insert-only): each micro-batch lands as its own
    * per-key-compacted "SSTable" under `batch=<id>`, TOMBSTONES KEPT
    * ([[graft.operators.Merge.latestPerKey]]); the queryable snapshot
    * is the read-side merge ([[compactedState]]).
    *
    * Exactly-once: the checkpoint pins batch ids, a retried batch
    * overwrites its own directory, and — unlike the anti-join ingest —
    * the write path never reads existing state at all, so re-delivery
    * and cross-batch out-of-order ops are resolved by the SAME total
    * (ordCols) order at read time, not by arrival order. */
  def compactUpsertBatch(batch: DataFrame, targetDir: String, keyCol: String,
      ordCols: Seq[String], batchId: Long): Unit =
    graft.operators.Merge.latestPerKey(batch, keyCol, ordCols)
      .write.mode("overwrite").parquet(s"$targetDir/batch=$batchId")

  /** The compacted latest-state view over every landed batch (deletes
    * applied). Read-side merge — one aggregation over the SSTables. */
  def compactedState(spark: SparkSession, targetDir: String, keyCol: String,
      opCol: String, deleteOp: String, ordCols: Seq[String]): DataFrame =
    graft.operators.Merge.compactLog(
      spark.read.parquet(targetDir).drop("batch"), keyCol, opCol, deleteOp, ordCols)

  /** Start the streaming compaction: stream → [[compactUpsertBatch]]
    * per micro-batch. */
  def compactUpsertStream(events: DataFrame, targetDir: String, keyCol: String,
      ordCols: Seq[String], checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        compactUpsertBatch(batch.toDF(), targetDir, keyCol, ordCols, id)
      }
      .start()

  /** MAJOR COMPACTION of the LSM sink: fold every `batch=<id>` SSTable
    * with id ≤ `upToBatch` into ONE base level — latest op per key
    * across the folded range, with tombstone winners DROPPED entirely
    * (legal precisely because the base is the oldest level: there is
    * no older data a tombstone still needs to mask; tombstones in
    * batches ABOVE the fold keep masking the base through the
    * read-side merge's ord order as before). Precondition (the classic
    * LSM tombstone-GC rule): the ord watermark must have passed the
    * folded range — an out-of-order op with ord BELOW a dropped
    * tombstone that arrives after the fold would resurrect the key
    * (spec-demonstrated); fold only up to the batch whose ords can no
    * longer be undercut. This is what bounds the
    * sink's read amplification: the [[compactedState]] merge then
    * scans one base + the recent tail instead of every batch ever
    * landed. The fold itself is one [[graft.operators.Merge
    * .compactLog]] aggregation over the folded range; the swap is
    * delete-then-write (a production deployment swaps a manifest
    * atomically — stated, not hidden). */
  def majorCompact(spark: SparkSession, targetDir: String, keyCol: String,
      opCol: String, deleteOp: String, ordCols: Seq[String], upToBatch: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val folded = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(_.getPath.getName.stripPrefix("batch=").toLong <= upToBatch)
    require(folded.nonEmpty, s"majorCompact: no batches <= $upToBatch under $targetDir")
    val base = graft.operators.Merge.compactLog(
        spark.read.parquet(folded.map(_.getPath.toString): _*),
        keyCol, opCol, deleteOp, ordCols)
      .filter(col(opCol) =!= deleteOp) // oldest level → tombstones drop
    val tmp = new org.apache.hadoop.fs.Path(root, ".compact_tmp")
    base.write.mode("overwrite").parquet(tmp.toString)
    // swap with the narrowest possible failure window, and LOUDLY:
    // Hadoop FS delete/rename signal failure by RETURNING FALSE (HDFS
    // rename onto an existing path, flaky object stores), not by
    // throwing — an unchecked swap here would strand the compacted
    // base in .compact_tmp AFTER the originals are gone and readers
    // would see an empty/partial log. So: (1) clear only the
    // destination dir (it is one of the folded sources), (2) rename
    // the base into place, (3) only then drop the remaining folded
    // sources — if (2) fails, every other source batch is still
    // intact and the exception says where the data sits.
    val dest = new org.apache.hadoop.fs.Path(root, s"batch=$upToBatch")
    // delete() returns false for a MISSING path too — only a present
    // destination that refuses to go is a failure (the fold target id
    // need not be a landed batch)
    if (fs.exists(dest) && !fs.delete(dest, true))
      throw new java.io.IOException(
        s"majorCompact: failed to clear destination $dest; compacted base left at $tmp")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(
        s"majorCompact: rename $tmp -> $dest returned false; compacted base left at $tmp")
    folded.filter(_.getPath.getName != dest.getName).foreach { s =>
      if (!fs.delete(s.getPath, true))
        throw new java.io.IOException(
          s"majorCompact: failed to delete folded source ${s.getPath} after swap; " +
            "the read-side merge stays correct (base masks it) but space is not reclaimed")
    }
  }

  /** Does `dir` already hold any `batch=` partition? Resolved through
    * the path's own Hadoop FileSystem — a java.io.File probe would
    * silently answer "no" on HDFS/S3 and re-ingest every key. */
  private def hasBatchPartitions(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
  }

  /** Replay a batch DataFrame's rows through a real streaming source
    * (file source over a temp parquet copy), apply `transform`, collect
    * to a memory sink. Test/demo harness for batch equivalence. */
  def replayThroughStream(spark: SparkSession, batch: DataFrame,
      transform: DataFrame => DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val dir = graft.operators.Scratch.dir(s"stream_$queryName")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val src = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val q = transform(src).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
