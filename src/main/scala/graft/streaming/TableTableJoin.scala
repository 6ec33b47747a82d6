package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues}

import TableChangelog.Change

/** Materialized TABLE–TABLE joins with changelog output — the last
  * ksqlDB join family (ksqlDB 0.28, the reference's engine,
  * reference docker-compose.yml:83 — supports primary-key and
  * foreign-key table joins): two continuously-updated keyed tables
  * joined so that a change on EITHER side re-emits the revised joined
  * row(s) for the affected key(s), with retractions when a joined row
  * disappears.
  *
  * [[pkJoin]] — same-primary-key join. Spark shape: the two versioned
  * changelogs are tagged and unioned, then ONE `flatMapGroupsWithState`
  * keyed on the shared key holds (latest left, latest right, last
  * emitted joined image) per key — both sides co-shuffle on the join
  * key into the same stateful operator, exactly ksqlDB's co-partitioned
  * table-table join, with state = two rows per key. No broadcast, no
  * per-batch rescan of either table; each micro-batch does O(batch)
  * work.
  *
  * [[fkJoin]] — foreign-key join (many left rows per right key). The
  * left input is a RETRACTION-AWARE changelog ([[TableChangelog.of]]):
  * the before-image is what lets a key that changes its foreign key be
  * REMOVED from the old right-key group — an upsert-only stream cannot
  * express that move. Change rows are routed by foreign key (a move =
  * one removal event at the old group + one add at the new), unioned
  * with the right table's changelog, and a `flatMapGroupsWithState`
  * keyed on the RIGHT key holds (right row, member left rows) per
  * group. A right-side update re-emits every member's joined row — the
  * FK fan-out ksqlDB implements with its internal subscription state.
  * State per group is the group's left membership: the same O(matching
  * rows) any FK-join materialization must hold somewhere.
  *
  * Both emit [[TableChangelog.Change]] rows keyed by the LEFT primary
  * key with c/u/d ops and before/after joined images, so the output is
  * itself a table changelog — tables compose: a downstream consumer
  * (another join, [[TableChangelog.latestState]], an external cache)
  * maintains the joined table without re-reading either input.
  */
object TableTableJoin {

  /** A joined row image: present sides populated per join type. */
  case class Joined[A, B](left: Option[A], right: Option[B])

  /** Debezium op letter for a before→after image transition (the
    * not-equal case; equal images emit nothing). */
  private def changeOp[T](before: Option[T], after: Option[T]): String =
    (before, after) match {
      case (None, Some(_)) => "c"
      case (Some(_), Some(_)) => "u"
      case _ => "d"
    }

  /** Joined image of an fk member row against a right side, or None if
    * the joined row is absent — shared by both FK-join implementations. */
  private def fkImg[A, B](joinType: String, a: A,
                          r: Option[B]): Option[Joined[A, B]] =
    if (joinType == "left" || r.isDefined) Some(Joined(Some(a), r)) else None

  /** Internal: one tagged changelog record of either side. */
  case class Sided[K, A, B](key: K, offset: Long, isLeft: Boolean,
                            a: Option[A], b: Option[B])

  /** Internal per-key state: per-side LWW (offset, value) plus the
    * last emitted joined image and the per-key output seq. */
  case class PkState[A, B](lOff: Long, l: Option[A], rOff: Long,
                           r: Option[B], emitted: Option[Joined[A, B]],
                           seq: Long)

  /** Primary-key table–table join of two (key, offset, value)
    * changelogs (value None = tombstone). `joinType`: "inner" (row
    * present iff both sides present), "left" (present iff left
    * present; right side nullable) or "full" (present iff either side
    * present — ksqlDB's FULL OUTER table join). Within a micro-batch
    * the right side's rows apply before the left's (each side LWW by
    * its own offset), so same-batch races resolve to the same final
    * image the batch oracle computes. */
  def pkJoin[K: Encoder: TypeTag, A <: Product: TypeTag,
             B <: Product: TypeTag](
      left: Dataset[(K, Long, Option[A])],
      right: Dataset[(K, Long, Option[B])],
      joinType: String = "inner"): Dataset[Change[K, Joined[A, B]]] = {
    require(Set("inner", "left", "full").contains(joinType),
      s"pkJoin supports inner/left/full, got $joinType")
    implicit val sidedEnc: Encoder[Sided[K, A, B]] =
      Encoders.product[Sided[K, A, B]]
    implicit val stEnc: Encoder[PkState[A, B]] =
      Encoders.product[PkState[A, B]]
    implicit val outEnc: Encoder[Change[K, Joined[A, B]]] =
      Encoders.product[Change[K, Joined[A, B]]]
    val tagged = left
      .map { case (k, o, a) => Sided[K, A, B](k, o, isLeft = true, a, None) }
      .union(right.map { case (k, o, b) =>
        Sided[K, A, B](k, o, isLeft = false, None, b) })
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Sided[K, A, B]],
         st: GroupState[PkState[A, B]]) =>
          var cur = st.getOption.getOrElse(PkState[A, B](
            Long.MinValue, None, Long.MinValue, None, None, 0L))
          val out = Seq.newBuilder[Change[K, Joined[A, B]]]
          // rights first (false < true), then each side in offset order
          it.toSeq.sortBy(e => (e.isLeft, e.offset)).foreach { e =>
            val applied =
              if (e.isLeft && e.offset > cur.lOff)
                Some(cur.copy(lOff = e.offset, l = e.a))
              else if (!e.isLeft && e.offset > cur.rOff)
                Some(cur.copy(rOff = e.offset, r = e.b))
              else None // stale offset: replay/out-of-order duplicate
            applied.foreach { next =>
              val present = joinType match {
                case "inner" => next.l.isDefined && next.r.isDefined
                case "left" => next.l.isDefined
                case _ => next.l.isDefined || next.r.isDefined
              }
              val now =
                if (present) Some(Joined(next.l, next.r)) else None
              if (now != cur.emitted) {
                out += Change(key, changeOp(cur.emitted, now),
                  cur.emitted, now, next.seq)
                cur = next.copy(emitted = now, seq = next.seq + 1)
              } else cur = next
            }
          }
          st.update(cur)
          out.result().iterator
      }
  }

  /** Internal: one routed FK-group event. Left adds/removals carry the
    * member primary key and the stage-1 change seq; right records carry
    * their own offset. */
  case class FkEvent[KF, KP, A, B](fk: KF, isLeft: Boolean, add: Boolean,
                                   pk: Option[KP], a: Option[A], s1: Long,
                                   rOff: Long, b: Option[B])

  /** Internal: one member left row inside an FK group. `s1` is the
    * member's latest stage-1 changelog seq — the cross-group ordering
    * major for the composite output seq; `ctr` is the member's OWN
    * next minor, rebased to 0 at every left-side change of the member
    * (so the minor space is renewable, not a lifetime budget). */
  case class Member[KP, A](pk: KP, s1: Long, a: A, ctr: Long)

  /** Internal per-FK-group state: right-side LWW + member left rows. */
  case class FkState[KP, A, B](members: Seq[Member[KP, A]], rOff: Long,
                               r: Option[B])

  /** Composite output seq for FK-join changes: a key's changes must be
    * orderable ACROSS fk groups (a foreign-key move emits its `d` in
    * the old group and its `c` in the new one). Major = 2·s1 + (1 if
    * the event leaves the key a member) — so the move's removal
    * (major 2s) always precedes its add (2s+1). Same-major emissions
    * for an output key are exactly the right-side fan-outs to one
    * member between its left-side changes (per key, s1 is strictly
    * increasing otherwise), so the minor is the MEMBER's own counter,
    * rebased at every left-side change of that member. 20 bits of
    * minor bounds a member at ~1M fan-out emissions between its
    * left-side changes — a renewable per-member budget, not a group
    * lifetime cap; past it, shard the right key. A group-global
    * counter rebased on "major advance" would be unsound here: majors
    * are NOT monotone across members (each member carries its own s1),
    * so a reset triggered by a high-s1 member would hand a low-s1
    * member minors below ones it already emitted — a seq inversion
    * that makes latestState reconstruct a stale image. */
  private def fkSeq(s1: Long, inGroup: Boolean, minor: Long): Long = {
    // loud failure, not silent seq inversion: a wrapped minor would
    // make latestState's max_by reconstruct a STALE joined image
    require(minor < (1L << 20),
      s"fk member exceeded ${1L << 20} fan-out emissions between " +
        "left-side changes — shard the right key")
    ((2L * s1 + (if (inGroup) 1L else 0L)) << 20) | minor
  }

  /** Per-group scalar state of the FK-join core: right-side LWW. */
  case class FkMeta[B](rOff: Long, r: Option[B])

  /** The membership-store primitives the FK-join core writes through —
    * backed by an in-`GroupState` Seq in [[fkJoin]] and by a per-key
    * RocksDB `MapState` in [[FkProcessor]]. Only the storage differs;
    * the event semantics live once in [[processFkGroup]]. */
  private trait Membership[KP, A] {
    def get(pk: KP): Option[Member[KP, A]]
    def put(m: Member[KP, A]): Unit
    def remove(pk: KP): Unit
    /** All members ascending by (stage-1 seq, pk string) — ties broken
      * deterministically so both storages fan out in the same order
      * and the two implementations' changelogs stay byte-identical. */
    def allByS1: Seq[Member[KP, A]]
  }

  /** The shared FK-join event-processing core: apply one group's batch
    * of events against the membership store and scalar meta, returning
    * the updated meta and the emitted changes. Rights first, batch-
    * compressed to the winning value (one fan-out emission per batch,
    * like ksql's state-store caching); then member events in stage-1
    * order (removal-before-add for a same-seq fk move is per-GROUP
    * here; cross-group ordering is the composite seq's job). Both
    * FK-join implementations defer here, so their changelogs cannot
    * fork. */
  private def processFkGroup[KF, KP, A, B](joinType: String,
      events: Seq[FkEvent[KF, KP, A, B]], members: Membership[KP, A],
      meta0: FkMeta[B]): (FkMeta[B], Seq[Change[KP, Joined[A, B]]]) = {
    var cur = meta0
    val out = Seq.newBuilder[Change[KP, Joined[A, B]]]
    def img(a: A, r: Option[B]): Option[Joined[A, B]] =
      fkImg(joinType, a, r)
    val (lefts, rights) = events.partition(_.isLeft)
    rights.sortBy(_.rOff).lastOption.foreach { e =>
      if (e.rOff > cur.rOff) {
        val oldR = cur.r
        cur = cur.copy(rOff = e.rOff, r = e.b)
        if (oldR != e.b) {
          members.allByS1.foreach { m =>
            val before = img(m.a, oldR)
            val after = img(m.a, e.b)
            if (before != after) {
              out += Change(m.pk, changeOp(before, after), before,
                after, fkSeq(m.s1, inGroup = true, m.ctr))
              // spend one unit of the member's minor budget — the
              // write is O(1) against the membership store, same cost
              // class as the emission it accounts for
              members.put(m.copy(ctr = m.ctr + 1))
            }
          }
        }
      }
    }
    lefts.sortBy(e => (e.s1, e.add)).foreach { e =>
      val pk = e.pk.get
      val old = members.get(pk)
      if (e.add) {
        val a = e.a.get
        val before = old.flatMap(o => img(o.a, cur.r))
        val after = img(a, cur.r)
        // a left-side change advances the member's s1 (a fresh major),
        // so its minor space rebases to 0
        val emit = before != after
        members.put(Member(pk, e.s1, a, if (emit) 1L else 0L))
        if (emit)
          out += Change(pk, changeOp(before, after), before, after,
            fkSeq(e.s1, inGroup = true, minor = 0L))
      } else {
        members.remove(pk)
        val before = old.flatMap(o => img(o.a, cur.r))
        if (before.isDefined)
          // a removal's major (2·s1) occurs once per pk — s1 is the
          // move's fresh stage-1 seq — so minor 0 suffices
          out += Change(pk, "d", before, None,
            fkSeq(e.s1, inGroup = false, minor = 0L))
      }
    }
    (cur, out.result())
  }

  /** Route each stage-1 left change by foreign key (an fk move = one
    * removal event at the old group + one add at the new, SHARING the
    * stage-1 seq — the composite seq's in-group bit orders them), tag
    * the right changelog, and union into one event stream — shared by
    * both FK-join implementations. */
  private def fkEvents[KF, KP, A, B](
      leftChanges: Dataset[Change[KP, A]], fkOf: A => KF,
      right: Dataset[(KF, Long, Option[B])])(
      implicit evEnc: Encoder[FkEvent[KF, KP, A, B]])
      : Dataset[FkEvent[KF, KP, A, B]] = {
    val routedLeft = leftChanges.flatMap { ch =>
      val removal = for {
        b <- ch.before
        if ch.after.forall(a => fkOf(a) != fkOf(b))
      } yield FkEvent[KF, KP, A, B](fkOf(b), isLeft = true, add = false,
        Some(ch.key), None, ch.seq, 0L, None)
      val add = ch.after.map(a =>
        FkEvent[KF, KP, A, B](fkOf(a), isLeft = true, add = true,
          Some(ch.key), Some(a), ch.seq, 0L, None))
      removal.toSeq ++ add.toSeq
    }
    val taggedRight = right.map { case (k, o, b) =>
      FkEvent[KF, KP, A, B](k, isLeft = false, add = false,
        None, None, 0L, o, b)
    }
    routedLeft.union(taggedRight)
  }

  /** Foreign-key table–table join. `leftChanges` is the left table's
    * retraction-aware changelog ([[TableChangelog.of]] output);
    * `fkOf` extracts the foreign key from a left payload; `right` is
    * the right table's (key, offset, value) changelog. Output is keyed
    * by the LEFT primary key. `joinType` "inner" or "left". */
  def fkJoin[KF: Encoder: TypeTag, KP: TypeTag, A <: Product: TypeTag,
             B <: Product: TypeTag](
      leftChanges: Dataset[Change[KP, A]], fkOf: A => KF,
      right: Dataset[(KF, Long, Option[B])],
      joinType: String = "inner"): Dataset[Change[KP, Joined[A, B]]] = {
    require(joinType == "inner" || joinType == "left",
      s"fkJoin supports inner/left, got $joinType")
    implicit val evEnc: Encoder[FkEvent[KF, KP, A, B]] =
      Encoders.product[FkEvent[KF, KP, A, B]]
    implicit val stEnc: Encoder[FkState[KP, A, B]] =
      Encoders.product[FkState[KP, A, B]]
    implicit val outEnc: Encoder[Change[KP, Joined[A, B]]] =
      Encoders.product[Change[KP, Joined[A, B]]]
    fkEvents(leftChanges, fkOf, right).groupByKey(_.fk)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: KF, it: Iterator[FkEvent[KF, KP, A, B]],
         st: GroupState[FkState[KP, A, B]]) =>
          val st0 = st.getOption.getOrElse(
            FkState[KP, A, B](Seq.empty, Long.MinValue, None))
          var seq = st0.members
          val mem = new Membership[KP, A] {
            def get(pk: KP): Option[Member[KP, A]] = seq.find(_.pk == pk)
            def put(m: Member[KP, A]): Unit =
              seq = seq.filterNot(_.pk == m.pk) :+ m
            def remove(pk: KP): Unit = seq = seq.filterNot(_.pk == pk)
            def allByS1: Seq[Member[KP, A]] =
              seq.sortBy(m => (m.s1, m.pk.toString))
          }
          val (meta, out) = processFkGroup(joinType, it.toSeq, mem,
            FkMeta(st0.rOff, st0.r))
          st.update(FkState(seq, meta.rOff, meta.r))
          out.iterator
      }
  }

  /** [[fkJoin]] on the `transformWithState` API — the 100 TB shape for
    * HOT foreign keys: [[fkJoin]] keeps one `Seq` of members per fk
    * group inside a single `GroupState` value, so every left-side
    * update rewrites O(group) state; this processor keeps the
    * membership in a per-key `MapState[KP, Member]`, making a member
    * add/remove an O(1) point write against RocksDB (the same
    * (fk, pk)-composite layout ksqlDB's FK-join subscription store
    * uses). The right-side fan-out still iterates the members — that
    * read is inherent to FK-join semantics. Same events in, same
    * changelog out, same composite seq as [[fkJoin]].
    *
    * Requires the RocksDB state store provider (Spark's
    * transformWithState constraint) — the [[fkJoin]] form remains the
    * any-provider default. */
  private class FkProcessor[KF, KP, A, B](
      joinType: String,
      memberKeyEnc: Encoder[KP], memberEnc: Encoder[Member[KP, A]],
      metaEnc: Encoder[FkMeta[B]])
      extends StatefulProcessor[KF, FkEvent[KF, KP, A, B],
        Change[KP, Joined[A, B]]] {
    @transient private var members
        : org.apache.spark.sql.streaming.MapState[KP, Member[KP, A]] = _
    @transient private var meta
        : org.apache.spark.sql.streaming.ValueState[FkMeta[B]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getMapState[KP, Member[KP, A]]("members",
        memberKeyEnc, memberEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      meta = getHandle.getValueState[FkMeta[B]]("meta", metaEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: KF,
        rows: Iterator[FkEvent[KF, KP, A, B]],
        timerValues: TimerValues): Iterator[Change[KP, Joined[A, B]]] = {
      val mem = new Membership[KP, A] {
        def get(pk: KP): Option[Member[KP, A]] =
          Option(members.getValue(pk))
        // O(1) point write/delete against RocksDB
        def put(m: Member[KP, A]): Unit = members.updateValue(m.pk, m)
        def remove(pk: KP): Unit = members.removeKey(pk)
        // the fan-out read: one pass over the member map (a RocksDB
        // range scan of this group's prefix, not a value rewrite)
        def allByS1: Seq[Member[KP, A]] =
          members.iterator().toSeq.map(_._2)
            .sortBy(m => (m.s1, m.pk.toString))
      }
      val (cur, out) = processFkGroup(joinType, rows.toSeq, mem,
        Option(meta.get()).getOrElse(FkMeta[B](Long.MinValue, None)))
      meta.update(cur)
      out.iterator
    }
  }

  /** The `transformWithState` spelling of [[fkJoin]] — identical
    * semantics, per-member point writes. RocksDB provider required. */
  def fkJoinTws[KF: Encoder: TypeTag, KP: Encoder: TypeTag,
                A <: Product: TypeTag, B <: Product: TypeTag](
      leftChanges: Dataset[Change[KP, A]], fkOf: A => KF,
      right: Dataset[(KF, Long, Option[B])],
      joinType: String = "inner"): Dataset[Change[KP, Joined[A, B]]] = {
    require(joinType == "inner" || joinType == "left",
      s"fkJoinTws supports inner/left, got $joinType")
    implicit val evEnc: Encoder[FkEvent[KF, KP, A, B]] =
      Encoders.product[FkEvent[KF, KP, A, B]]
    implicit val outEnc: Encoder[Change[KP, Joined[A, B]]] =
      Encoders.product[Change[KP, Joined[A, B]]]
    val memberEnc: Encoder[Member[KP, A]] = Encoders.product[Member[KP, A]]
    val metaEnc: Encoder[FkMeta[B]] = Encoders.product[FkMeta[B]]
    fkEvents(leftChanges, fkOf, right).groupByKey(_.fk)
      .transformWithState(
        new FkProcessor[KF, KP, A, B](joinType,
          implicitly[Encoder[KP]], memberEnc, metaEnc),
        TimeMode.None(), OutputMode.Append())
  }
}
