package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming row-pattern matching (Flink-CEP / MATCH_RECOGNIZE shape)
  * as an INCREMENTAL automaton under `flatMapGroupsWithState` — the
  * counterpart of the batch sequence-folding `q_pattern_match`
  * (reference semantics: ksqlDB has no CEP either; this is the
  * capability a Kafka-Streams user hand-rolls with a state store,
  * which is exactly what this is).
  *
  * The batch query regex-scans each user's WHOLE folded history; a
  * stream cannot re-fold on every event, so the two fixture patterns
  * are compiled to constant-space automata stepped once per event:
  *
  *  - `v+c*p` (funnel count, non-overlapping): 3-phase NFA — Idle /
  *    "in v-run" / "in v-run then c-run". A `p` arriving in either
  *    live phase completes one match and resets to Idle. This counts
  *    exactly what `Matcher.find`'s leftmost non-overlapping loop
  *    counts, because a match here is [contiguous v/c candidate]+`p`:
  *    matches can never overlap and every completing `p` ends one —
  *    the equivalence is fuzz-pinned against java.util.regex in
  *    `PatternMatchSpec`.
  *  - `p.*e` (error-after-purchase flag): two booleans.
  *
  * Per-key state is the 5-field [[PatternMatch.PatternState]] — TRULY
  * bounded, unlike the batch fold's per-key history string: a year of
  * events per user costs the same bytes as ten. That is the reason
  * streaming CEP exists.
  *
  * Ordering contract: events are sorted by (event-time, event_id)
  * WITHIN each micro-batch; across batches the automaton assumes
  * time-ordered arrival (the file/Kafka source's per-key append
  * order). Cross-batch late data would need a watermark-buffered
  * reorder stage in front — the sessionizer's open-tail buffering
  * pattern — which is deliberately out of scope for the fixture. */
object PatternMatch {

  /** `v+c*p` NFA phases. */
  private val Idle = 0
  private val InV = 1
  private val InVC = 2

  case class PatternState(phase: Int, seenP: Boolean, errAfterP: Boolean,
                          nFunnel: Long, len: Long)

  val zero: PatternState =
    PatternState(Idle, seenP = false, errAfterP = false, 0L, 0L)

  /** One automaton step; total for any char (unknown types reset the
    * funnel candidate, like the batch regex on a non-v/c/p char). */
  def step(st: PatternState, c: Char): PatternState = {
    val matched = c == 'p' && st.phase != Idle
    val phase = c match {
      case 'v' => InV
      case 'c' => if (st.phase == Idle) Idle else InVC
      case _ => Idle // p (matched or not) and every other char reset
    }
    PatternState(
      phase = phase,
      seenP = st.seenP || c == 'p',
      errAfterP = st.errAfterP || (c == 'e' && st.seenP),
      nFunnel = st.nFunnel + (if (matched) 1L else 0L),
      len = st.len + 1L)
  }

  def fold(st: PatternState, chars: Iterable[Char]): PatternState =
    chars.foldLeft(st)(step)

  case class EventIn(user_id: Long, us: Long, event_id: Long, ch: String)
  case class MatchRow(user_id: Long, seq_len: Long, n_funnel: Long,
                      err_after_purchase: Long)

  /** Session-scoped automaton state: the [[PatternState]] machinery
    * plus the session bookkeeping — the pattern resets at a gap, so a
    * match may not span sessions (MATCH_RECOGNIZE's pattern-window
    * semantics). `lastUs` detects the gap; closed-session aggregates
    * accumulate; the OPEN session's phase/flags live alongside. Still
    * constant space per key. */
  case class SessionState(phase: Int, seenP: Boolean, errAfterP: Boolean,
                          curLen: Long, lastUs: Long, nFunnel: Long,
                          nClosedSessions: Long, nClosedErr: Long,
                          nEvents: Long)

  val sessionZero: SessionState =
    SessionState(Idle, seenP = false, errAfterP = false, 0L, Long.MinValue,
      0L, 0L, 0L, 0L)

  /** One sessionized step: close the open session first when the gap
    * since the previous event exceeds `gapUs`. */
  def stepSession(st0: SessionState, c: Char, us: Long,
                  gapUs: Long): SessionState = {
    val st =
      if (st0.lastUs != Long.MinValue && us - st0.lastUs > gapUs)
        st0.copy(phase = Idle, seenP = false, errAfterP = false,
          curLen = 0L,
          nClosedSessions = st0.nClosedSessions + 1L,
          nClosedErr = st0.nClosedErr + (if (st0.errAfterP) 1L else 0L))
      else st0
    val matched = c == 'p' && st.phase != Idle
    val phase = c match {
      case 'v' => InV
      case 'c' => if (st.phase == Idle) Idle else InVC
      case _ => Idle
    }
    st.copy(
      phase = phase,
      seenP = st.seenP || c == 'p',
      errAfterP = st.errAfterP || (c == 'e' && st.seenP),
      curLen = st.curLen + 1L,
      lastUs = us,
      nFunnel = st.nFunnel + (if (matched) 1L else 0L),
      nEvents = st.nEvents + 1L)
  }

  case class SessionRow(user_id: Long, n_sessions: Long, n_funnel: Long,
                        n_err_sessions: Long, n_events: Long)

  /** The report view of a [[SessionState]]: the open session counts
    * as a session (the batch fold sees it too). */
  def sessionReport(key: Long, st: SessionState): SessionRow =
    SessionRow(key,
      st.nClosedSessions + (if (st.curLen > 0) 1L else 0L),
      st.nFunnel,
      st.nClosedErr + (if (st.errAfterP) 1L else 0L),
      st.nEvents)

  /** Sessionized twin of [[table]]: same input shape, pattern scoped
    * to ≤`gapUs` sessions. */
  def sessionTable(spark: SparkSession, events: DataFrame,
                   gapUs: Long): Dataset[SessionRow] = {
    import spark.implicits._
    events.as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, in: Iterator[EventIn], state: GroupState[SessionState]) =>
          val st0 = state.getOption.getOrElse(sessionZero)
          val st = in.toSeq.sortBy(e => (e.us, e.event_id))
            .foldLeft(st0) { (s, e) =>
              val c = if (e.ch == null || e.ch.isEmpty) ' ' else e.ch.charAt(0)
              stepSession(s, c, e.us, gapUs)
            }
          state.update(st)
          Iterator.single(sessionReport(key, st))
      }
  }

  /** events: (user_id, us, event_id, ch) → one running [[MatchRow]]
    * per key per batch (append emission; upsert by key downstream). */
  def table(spark: SparkSession, events: DataFrame): Dataset[MatchRow] = {
    import spark.implicits._
    events.as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, in: Iterator[EventIn], state: GroupState[PatternState]) =>
          val st0 = state.getOption.getOrElse(zero)
          val chars = in.toSeq.sortBy(e => (e.us, e.event_id))
            .map(e =>
              if (e.ch == null || e.ch.isEmpty) ' ' else e.ch.charAt(0))
          val st = fold(st0, chars)
          state.update(st)
          Iterator.single(MatchRow(key, st.len, st.nFunnel,
            if (st.errAfterP) 1L else 0L))
      }
  }
}
