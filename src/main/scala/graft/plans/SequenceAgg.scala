package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Shared machinery for ClickHouse's sequence-over-time aggregates
  * (`windowFunnel`, `sequenceMatch`). The buffer holds one `(ts µs,
  * condition bitmask)` pair per input row that matches at least one
  * condition — events matching none are dropped at update time unless
  * the pattern/mode needs them (`.` atoms, windowFunnel strict_order),
  * so buffer size is bounded by the per-group count of *relevant*
  * events, exactly the memory envelope ClickHouse's own
  * implementations have. Merge is buffer concatenation (order restored
  * by the single sort in `eval`), so partial aggregation across 1000
  * executors behaves like any other map-side-combined agg: no shuffle
  * of raw events, only of the per-group relevant pairs.
  *
  * Whale-user guard: with `spark.conf.set("graft.sequence.
  * maxGroupEvents", n)` the per-group buffer is capped at the n
  * EARLIEST events by (ts, mask) — deterministic regardless of
  * arrival order (each partial keeps its own earliest-n; the union of
  * partial survivors always contains the global earliest-n), with a
  * warning logged when truncation occurs. Off by default: ClickHouse
  * itself has no cap and errors at its memory limit instead.
  *
  * Determinism: events are evaluated sorted by `(ts, mask)` and both
  * subclasses require strictly increasing timestamps between matched
  * steps (ClickHouse's `strict_increase` mode). The default CH mode
  * leaves equal-timestamp order undefined — unacceptable here because
  * every registry query must hash-match a SQL oracle.
  *
  * Reference behavior: windowFunnel/sequenceMatch families in
  * /root/reference — the migration's target dialect; semantics follow
  * the public ClickHouse docs for these combinators.
  */
abstract class SequenceAggBase
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]] with Logging {

  /** Leading parameter ((window) or (pattern)), then the timestamp. */
  def paramExpr: Expression
  def tsExpr: Expression
  def conds: Seq[Expression]
  /** Per-group event cap captured from SQLConf at plan time
    * (Int.MaxValue = uncapped). */
  def maxGroupEvents: Int

  /** Retain events matching NO condition (patterns with `.` atoms,
    * windowFunnel strict_order need the full stream). */
  protected def keepAllEvents: Boolean = false

  override def children: Seq[Expression] = paramExpr +: tsExpr +: conds
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!paramExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName parameter must be a literal")
    else if (tsExpr.dataType != TimestampType && tsExpr.dataType != TimestampNTZType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName timestamp must be TIMESTAMP, got ${tsExpr.dataType.sql}")
    else if (conds.isEmpty || conds.length > 30)
      TypeCheckResult.TypeCheckFailure(s"$prettyName takes 1..30 conditions, got ${conds.length}")
    else if (!conds.forall(_.dataType == BooleanType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName conditions must all be BOOLEAN")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Int)] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[(Long, Int)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Int)] = {
    val ts = tsExpr.eval(input)
    if (ts != null) {
      var mask = 0
      var i = 0
      while (i < conds.length) {
        if (conds(i).eval(input) == true) mask |= 1 << i
        i += 1
      }
      if (mask != 0 || keepAllEvents) {
        buffer += ((ts.asInstanceOf[Long], mask))
        capped(buffer)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[(Long, Int)],
      other: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    buffer ++= other
    capped(buffer)
    buffer
  }

  /** Amortized earliest-n truncation: let the buffer grow to 2×cap,
    * then sort and keep the cap smallest (ts, mask) pairs — O(log cap)
    * amortized per event. Keeping each partial's earliest-cap is
    * exact: any globally-earliest event is also earliest within its
    * own partial, so no survivor of the final merge is ever missing. */
  private def capped(buffer: mutable.ArrayBuffer[(Long, Int)]): Unit =
    if (maxGroupEvents != Int.MaxValue && buffer.length > 2L * maxGroupEvents) {
      val arr = sorted(buffer)
      logWarning(s"$prettyName: per-group events exceed graft.sequence.maxGroupEvents=" +
        s"$maxGroupEvents; keeping the earliest $maxGroupEvents by (ts, mask)")
      buffer.clear()
      buffer ++= arr.iterator.take(maxGroupEvents)
    }

  /** Buffer sorted by (ts, mask) — the deterministic event order every
    * subclass evaluates over — truncated to the configured cap. */
  protected def sorted(buffer: mutable.ArrayBuffer[(Long, Int)]): Array[(Long, Int)] = {
    val arr = buffer.toArray
    java.util.Arrays.sort(arr, (a: (Long, Int), b: (Long, Int)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else Integer.compare(a._2, b._2)
    })
    if (arr.length > maxGroupEvents) {
      logWarning(s"$prettyName: group truncated to its earliest $maxGroupEvents events " +
        "(graft.sequence.maxGroupEvents)")
      arr.take(maxGroupEvents)
    } else arr
  }

  override def serialize(buffer: mutable.ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeInt(buffer.length)
      buffer.foreach { case (ts, mask) => out.writeLong(ts); out.writeInt(mask) }
      out.flush()
      bos.toByteArray
    } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Int)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val n = in.readInt()
      val buffer = new mutable.ArrayBuffer[(Long, Int)](n)
      var i = 0
      while (i < n) { buffer += ((in.readLong(), in.readInt())); i += 1 }
      buffer
    } finally in.close()
  }
}

object SequenceAggBase {
  /** How a pattern step relates to the one before it. */
  sealed trait SeqGap
  /** No separator: this step must match the IMMEDIATELY next event
    * (with a strictly greater timestamp). */
  case object Adjacent extends SeqGap
  /** `.*`: any number of events may intervene. */
  case object AnyGap extends SeqGap
  /** `(?t op N)`: any number of events may intervene AND the time
    * between the two matched steps must satisfy `dt op N` seconds. */
  final case class TimeGap(op: String, micros: Long) extends SeqGap {
    def holds(dtMicros: Long): Boolean = op match {
      case "<"  => dtMicros < micros
      case "<=" => dtMicros <= micros
      case ">"  => dtMicros > micros
      case ">=" => dtMicros >= micros
      case _    => dtMicros == micros // "=="
    }
  }

  /** One parsed step: `condIdx` is the 0-based condition index, or −1
    * for `.` (matches ANY event — ClickHouse's any-event atom). */
  final case class SeqStep(condIdx: Int, gap: SeqGap)

  /** Parse the sequence-pattern grammar into steps: `(?N)` condition
    * atoms and `.` any-event atoms, separated by nothing (adjacent),
    * `.*` (any gap) or `(?t op N)` (time-bounded gap; op one of
    * <, <=, >, >=, ==; N integral seconds). Unknown atoms are
    * rejected loudly, never mis-matched. */
  def parseSteps(paramExpr: Expression, nConds: Int, name: String): Array[SeqStep] = {
    val pattern = paramExpr.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(s"$name pattern must be a string literal, got $other")
    }
    val StepRe = """\(\?(\d+)\)""".r
    val TimeRe = """\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)""".r
    val out = mutable.ArrayBuffer.empty[SeqStep]
    var rest = pattern
    var gap: SeqGap = Adjacent
    while (rest.nonEmpty) {
      if (rest.startsWith(".*")) {
        // .* after a (?t…) separator adds nothing the time gap
        // doesn't already allow
        if (gap == Adjacent) gap = AnyGap
        rest = rest.drop(2)
      } else if (rest.startsWith(".")) {
        out += SeqStep(-1, gap); gap = Adjacent; rest = rest.drop(1)
      } else TimeRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          require(out.nonEmpty, s"$name: (?t…) cannot precede the first step")
          gap = TimeGap(m.group(1), m.group(2).toLong * 1000000L)
          rest = rest.drop(m.matched.length)
        case None => StepRe.findPrefixMatchOf(rest) match {
          case Some(m) =>
            val idx = m.group(1).toInt - 1
            require(idx >= 0 && idx < nConds,
              s"$name pattern step (?${idx + 1}) exceeds $nConds conditions")
            out += SeqStep(idx, gap); gap = Adjacent; rest = rest.drop(m.matched.length)
          case None =>
            throw new IllegalArgumentException(
              s"$name: unsupported pattern atom at '$rest' (supported: (?N), ., .*, (?t op N))")
        }
      }
    }
    require(out.exists(_.condIdx >= 0), s"$name pattern must contain at least one (?N) step")
    out.toArray
  }

  /** `.` atoms match events with an all-zero mask, which the buffer
    * must then retain. */
  def needsAllEvents(steps: Array[SeqStep]): Boolean = steps.exists(_.condIdx < 0)

  /** Backward feasibility DP shared by sequenceMatch and
    * sequenceMatchEvents: ok(s)(i) = steps s.. can match with step s
    * placed on event i (strict-increase timestamps between steps,
    * gap kinds honored). */
  def feasibility(evs: Array[(Long, Int)], steps: Array[SeqStep]): Array[Array[Boolean]] = {
    val m = evs.length
    val k = steps.length
    def condAt(s: Int, i: Int): Boolean =
      steps(s).condIdx < 0 || (evs(i)._2 & (1 << steps(s).condIdx)) != 0
    val ok = Array.ofDim[Boolean](k, m)
    var s = k - 1
    var next: Array[Boolean] = null
    while (s >= 0) {
      val cur = ok(s)
      val gapAfter: SeqGap = if (s + 1 < k) steps(s + 1).gap else null
      var i = m - 1
      while (i >= 0) {
        if (condAt(s, i)) {
          if (s == k - 1) cur(i) = true
          else gapAfter match {
            case Adjacent =>
              cur(i) = i + 1 < m && evs(i + 1)._1 > evs(i)._1 && next(i + 1)
            case AnyGap =>
              var j = i + 1
              var found = false
              while (j < m && !found) {
                if (evs(j)._1 > evs(i)._1 && next(j)) found = true
                j += 1
              }
              cur(i) = found
            case tg: TimeGap =>
              var j = i + 1
              var found = false
              while (j < m && !found) {
                if (evs(j)._1 > evs(i)._1 && tg.holds(evs(j)._1 - evs(i)._1) && next(j))
                  found = true
                j += 1
              }
              cur(i) = found
          }
        }
        i -= 1
      }
      next = cur
      s -= 1
    }
    ok
  }

  /** Per-group event cap from the session conf, captured at plan time
    * so it ships to executors inside the aggregate itself. */
  def configuredCap(): Int =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.sequence.maxGroupEvents", Int.MaxValue.toString).toInt
    catch { case _: NumberFormatException => Int.MaxValue }
}

/** ClickHouse `windowFunnel(window[, 'mode'…])(ts, cond1, …, condN)`:
  * the deepest funnel level reached by a chain of events cond1 →
  * cond2 → … whose LAST event falls within `window` seconds of the
  * chain's FIRST event. `strict_increase` (matched steps strictly
  * increase in time) is ALWAYS on — it is what makes the result
  * deterministic and oracle-able; the flag is accepted and ignored.
  *
  * Default mode — algorithm (single pass over the sorted events):
  * `firstTs(l)` holds the latest chain-start timestamp among chains
  * that reached level l+1. A later start weakly dominates an earlier
  * one — it satisfies every window check an earlier start would — so
  * one slot per level is complete, and a chain of length L exists iff
  * the pass records level L. Equal-timestamp events are batched so
  * extensions only see state from strictly earlier timestamps.
  *
  * `strict_order` / `strict_dedup` (ClickHouse's documented modes)
  * switch to the literal one-slot-per-level scan the docs describe,
  * over per-condition entries sorted by (ts, condIdx) — strict_order
  * additionally retains non-matching events (they break a started
  * chain), strict_dedup interrupts when a condition whose level is
  * already reached fires again. Under these modes the scan is
  * order-sensitive by definition; the (ts, condIdx) sort makes it
  * deterministic where ClickHouse leaves equal-ts order undefined.
  */
case class GraftWindowFunnel(
    paramExpr: Expression,
    modes: Seq[String],
    tsExpr: Expression,
    conds: Seq[Expression],
    maxGroupEvents: Int = Int.MaxValue,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  require(modes.forall(Set("strict_order", "strict_dedup", "strict_increase")),
    s"windowFunnel: unknown mode in $modes")
  private val strictOrder = modes.contains("strict_order")
  private val strictDedup = modes.contains("strict_dedup")

  override protected def keepAllEvents: Boolean = strictOrder

  private lazy val windowMicros: Long = paramExpr.eval() match {
    case i: Int  => i * 1000000L
    case l: Long => l * 1000000L
    case other   => throw new IllegalArgumentException(s"windowFunnel window must be integral seconds, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "windowFunnel"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any =
    if (strictOrder || strictDedup) evalStrict(buffer) else evalDefault(buffer)

  private def evalDefault(buffer: mutable.ArrayBuffer[(Long, Int)]): Int = {
    val evs = sorted(buffer)
    val n = conds.length
    val unset = Long.MinValue
    val firstTs = Array.fill(n)(unset)
    val updates = Array.fill(n)(unset)
    var i = 0
    while (i < evs.length) {
      val t = evs(i)._1
      // batch the equal-timestamp run [i, j): extensions read only
      // pre-batch state, so matched steps strictly increase in time
      var j = i
      java.util.Arrays.fill(updates, unset)
      while (j < evs.length && evs(j)._1 == t) {
        val mask = evs(j)._2
        var lvl = n - 1
        while (lvl >= 1) {
          if ((mask & (1 << lvl)) != 0 && firstTs(lvl - 1) != unset &&
              t - firstTs(lvl - 1) <= windowMicros && firstTs(lvl - 1) > updates(lvl))
            updates(lvl) = firstTs(lvl - 1)
          lvl -= 1
        }
        if ((mask & 1) != 0 && t > updates(0)) updates(0) = t
        j += 1
      }
      var l = 0
      while (l < n) {
        // unset == Long.MinValue, so a plain max-merge covers first-set too
        if (updates(l) > firstTs(l)) firstTs(l) = updates(l)
        l += 1
      }
      i = j
    }
    var level = n
    while (level > 0 && firstTs(level - 1) == unset) level -= 1
    level
  }

  /** The mode-aware scan. Events expand to (ts, condIdx) entries (one
    * per set mask bit; mask-0 events contribute a −1 entry under
    * strict_order), sorted by (ts, condIdx). One pass: a cond-1 entry
    * (re)starts the chain; entry for level l+1 extends when level l is
    * reached, inside the window, strictly after the chain's previous
    * event. strict_dedup: an entry whose own level is already reached
    * interrupts, returning that level. strict_order: a −1 entry after
    * the chain started stops the scan; an entry whose PREDECESSOR
    * level is unreached (after the chain started) returns the first
    * gap. */
  private def evalStrict(buffer: mutable.ArrayBuffer[(Long, Int)]): Int = {
    val evs = sorted(buffer)
    val n = conds.length
    // expand to per-condition entries, order preserved within (ts, idx)
    val entries = mutable.ArrayBuffer.empty[(Long, Int)]
    var e = 0
    while (e < evs.length) {
      val (t, mask) = evs(e)
      if (mask == 0) { if (strictOrder) entries += ((t, -1)) }
      else {
        var c = 0
        while (c < n) { if ((mask & (1 << c)) != 0) entries += ((t, c)); c += 1 }
      }
      e += 1
    }
    val arr = entries.toArray
    java.util.Arrays.sort(arr, (a: (Long, Int), b: (Long, Int)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else Integer.compare(a._2, b._2)
    })
    val unset = Long.MinValue
    val firstTs = Array.fill(n)(unset)
    val prevTs  = Array.fill(n)(unset)
    var started = false
    def deepest: Int = {
      var level = n
      while (level > 0 && firstTs(level - 1) == unset) level -= 1
      level
    }
    def firstGap: Int = {
      var l = 0
      while (l < n && firstTs(l) != unset) l += 1
      l
    }
    var i = 0
    while (i < arr.length) {
      val (t, idx) = arr(i)
      if (idx == -1) {
        if (started) return deepest // strict_order: foreign event breaks
      } else if (idx == 0) {
        firstTs(0) = t; prevTs(0) = t; started = true
      } else if (strictDedup && firstTs(idx) != unset) {
        return idx + 1 // repeat of a reached level interrupts
      } else if (firstTs(idx - 1) != unset) {
        if (t - firstTs(idx - 1) <= windowMicros && prevTs(idx - 1) < t) {
          firstTs(idx) = firstTs(idx - 1); prevTs(idx) = t
          if (idx == n - 1) return n
        }
      } else if (strictOrder && started) {
        return firstGap // out-of-order condition breaks the chain
      }
      i += 1
    }
    deepest
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftWindowFunnel =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftWindowFunnel =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GraftWindowFunnel =
    copy(paramExpr = newChildren.head, tsExpr = newChildren(1), conds = newChildren.drop(2))
}

/** ClickHouse `sequenceMatch('(?1).*(?2)')(ts, cond1, …)`: true iff the
  * group's events contain a match of the pattern.
  *
  * Pattern grammar ([[SequenceAggBase.parseSteps]]): `(?N)` condition
  * steps and `.` any-event steps, joined by adjacency (consecutive
  * events in the (ts, mask)-sorted stream), `.*` (any number of events
  * between) or `(?t op N)` (any number of events between, time delta
  * between the matched steps satisfying the bound). Matched steps must
  * strictly increase in timestamp. Patterns with `.` retain the full
  * event stream (any event can fill the slot).
  *
  * Exact O(events × steps²) dynamic program, evaluated per group —
  * no cross-row state, so partial aggregation parallelizes freely.
  */
case class GraftSequenceMatch(
    paramExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    maxGroupEvents: Int = Int.MaxValue,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {
  import SequenceAggBase._

  private lazy val steps: Array[SeqStep] =
    SequenceAggBase.parseSteps(paramExpr, conds.length, prettyName)

  override protected lazy val keepAllEvents: Boolean = needsAllEvents(steps)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sequenceMatch"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val evs = sorted(buffer)
    if (evs.isEmpty) return false
    val ok = SequenceAggBase.feasibility(evs, steps)
    // leading events before the first step are always allowed
    var i = 0
    while (i < evs.length) {
      if (ok(0)(i)) return true
      i += 1
    }
    false
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftSequenceMatch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftSequenceMatch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GraftSequenceMatch =
    copy(paramExpr = newChildren.head, tsExpr = newChildren(1), conds = newChildren.drop(2))
}

/** ClickHouse `sequenceCount('(?1).*(?2)')(ts, cond1, …)`: number of
  * NON-OVERLAPPING pattern matches, scanning left to right — after a
  * match completes, the search resumes strictly after its last event
  * (ClickHouse's documented greedy semantics). Same pattern grammar
  * and strict_increase discipline as [[GraftSequenceMatch]].
  *
  * The scan extends each candidate match with the EARLIEST feasible
  * event per step; for adjacency/`.*` gaps earliest-extension is
  * exchange-optimal, so the greedy count equals the maximum number of
  * disjoint matches; `(?t…)` gaps keep ClickHouse's greedy-scan
  * semantics (a lower-bounded gap can make greedy sub-maximal — so
  * can ClickHouse's own scan).
  */
case class GraftSequenceCount(
    paramExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    maxGroupEvents: Int = Int.MaxValue,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {
  import SequenceAggBase._

  private lazy val steps: Array[SeqStep] =
    SequenceAggBase.parseSteps(paramExpr, conds.length, prettyName)

  override protected lazy val keepAllEvents: Boolean = needsAllEvents(steps)

  override def dataType: DataType = LongType
  override def prettyName: String = "sequenceCount"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val evs = sorted(buffer)
    val m = evs.length
    def condAt(s: Int, i: Int): Boolean =
      steps(s).condIdx < 0 || (evs(i)._2 & (1 << steps(s).condIdx)) != 0
    var count = 0L
    var pos = 0
    while (pos < m) {
      // attempt the earliest match starting at pos or later
      var start = pos
      var matched = -1
      while (start < m && matched < 0) {
        if (condAt(0, start)) {
          // greedy earliest extension from this start
          var last = start
          var s = 1
          var dead = false
          while (s < steps.length && !dead) {
            steps(s).gap match {
              case Adjacent =>
                if (last + 1 < m && evs(last + 1)._1 > evs(last)._1 && condAt(s, last + 1)) last += 1
                else dead = true
              case AnyGap =>
                var j = last + 1
                var found = -1
                while (j < m && found < 0) {
                  if (evs(j)._1 > evs(last)._1 && condAt(s, j)) found = j
                  j += 1
                }
                if (found < 0) dead = true else last = found
              case tg: TimeGap =>
                var j = last + 1
                var found = -1
                while (j < m && found < 0) {
                  if (evs(j)._1 > evs(last)._1 && tg.holds(evs(j)._1 - evs(last)._1) &&
                      condAt(s, j)) found = j
                  j += 1
                }
                if (found < 0) dead = true else last = found
            }
            s += 1
          }
          if (!dead) matched = last
        }
        if (matched < 0) start += 1
      }
      if (matched < 0) return count
      count += 1
      pos = matched + 1
    }
    count
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftSequenceCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftSequenceCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GraftSequenceCount =
    copy(paramExpr = newChildren.head, tsExpr = newChildren(1), conds = newChildren.drop(2))
}

/** `sequenceNextNode(direction, base)(ts, event, base_cond, cond1,
  * …, condN)` — the value of the event immediately AFTER a matched
  * consecutive chain. Supported modes: ('forward', 'head') — the
  * chain must start at the group's first base-qualifying event;
  * ('forward', 'first_match') — the chain may start at the first
  * position where it matches (base_cond holding at the start);
  * ('backward', 'tail' / 'last_match') — the mirror image over the
  * reversed stream. Other spellings are refused loudly. Events sort
  * by (ts, value) — the deterministic reading that makes the result
  * oracle-able with window leads. The buffer is whale-capped by the
  * same `graft.sequence.maxGroupEvents` conf as the other sequence
  * aggregates (earliest-n exact truncation). */
case class GraftSequenceNextNode(
    dirExpr: Expression,
    baseExpr: Expression,
    tsExpr: Expression,
    valueExpr: Expression,
    conds: Seq[Expression],
    maxGroupEvents: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int, String)]] with Logging {

  private lazy val forward: Boolean = dirExpr.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String if s.toString == "forward"  => true
    case s: org.apache.spark.unsafe.types.UTF8String if s.toString == "backward" => false
    case other => throw new IllegalArgumentException(
      s"sequenceNextNode direction must be 'forward' or 'backward', got $other")
  }

  private lazy val firstMatch: Boolean = baseExpr.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String =>
      s.toString match {
        case "head" | "tail"                 => false
        case "first_match" | "last_match"    => true
        case other => throw new IllegalArgumentException(
          s"sequenceNextNode base must be head/tail/first_match/last_match, got '$other'")
      }
    case other => throw new IllegalArgumentException(s"sequenceNextNode base must be a string literal, got $other")
  }

  override def children: Seq[Expression] = dirExpr +: baseExpr +: tsExpr +: valueExpr +: conds
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "sequenceNextNode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!dirExpr.foldable || !baseExpr.foldable)
      TypeCheckResult.TypeCheckFailure("sequenceNextNode direction/base must be literals")
    else if (tsExpr.dataType != TimestampType && tsExpr.dataType != TimestampNTZType)
      TypeCheckResult.TypeCheckFailure(s"sequenceNextNode timestamp must be TIMESTAMP, got ${tsExpr.dataType.sql}")
    else if (valueExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"sequenceNextNode event column must be STRING, got ${valueExpr.dataType.sql}")
    else if (conds.isEmpty || conds.length > 31)
      TypeCheckResult.TypeCheckFailure(s"sequenceNextNode takes 1..31 conditions, got ${conds.length}")
    else if (!conds.forall(_.dataType == BooleanType))
      TypeCheckResult.TypeCheckFailure("sequenceNextNode conditions must all be BOOLEAN")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Int, String)] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[(Long, Int, String)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Int, String)] = {
    val ts = tsExpr.eval(input)
    val v  = valueExpr.eval(input)
    if (ts != null && v != null) {
      var mask = 0
      var i = 0
      while (i < conds.length) {
        if (conds(i).eval(input) == true) mask |= 1 << i
        i += 1
      }
      buffer += ((ts.asInstanceOf[Long], mask, v.toString))
      capped(buffer)
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[(Long, Int, String)],
      other: mutable.ArrayBuffer[(Long, Int, String)]): mutable.ArrayBuffer[(Long, Int, String)] = {
    buffer ++= other
    capped(buffer)
    buffer
  }

  private def ordered(buffer: mutable.ArrayBuffer[(Long, Int, String)]): Array[(Long, Int, String)] = {
    val arr = buffer.toArray
    java.util.Arrays.sort(arr, (a: (Long, Int, String), b: (Long, Int, String)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else a._3.compareTo(b._3)
    })
    if (arr.length > maxGroupEvents) {
      logWarning(s"sequenceNextNode: group truncated to its earliest $maxGroupEvents events " +
        "(graft.sequence.maxGroupEvents)")
      arr.take(maxGroupEvents)
    } else arr
  }

  private def capped(buffer: mutable.ArrayBuffer[(Long, Int, String)]): Unit =
    if (maxGroupEvents != Int.MaxValue && buffer.length > 2L * maxGroupEvents) {
      val arr = ordered(buffer)
      buffer.clear()
      buffer ++= arr.iterator.take(maxGroupEvents)
    }

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int, String)]): Any = {
    if (buffer.isEmpty) return null
    var events = ordered(buffer)
    if (!forward) events = events.reverse
    val nChain   = conds.length - 1 // cond 0 is the base condition
    val baseBit  = 1
    def chainAt(i: Int): Boolean =
      (0 until nChain).forall { k =>
        i + k < events.length && (events(i + k)._2 & (1 << (k + 1))) != 0
      }
    val start =
      if (firstMatch) (0 until events.length).find(i => (events(i)._2 & baseBit) != 0 && chainAt(i))
      else (0 until events.length).find(i => (events(i)._2 & baseBit) != 0)
        .filter(chainAt) // head/tail: the chain must start AT the base event
    start match {
      case Some(i) if i + nChain < events.length =>
        org.apache.spark.unsafe.types.UTF8String.fromString(events(i + nChain)._3)
      case _ => null
    }
  }

  override def serialize(buffer: mutable.ArrayBuffer[(Long, Int, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeInt(buffer.length)
      buffer.foreach { case (ts, mask, v) =>
        out.writeLong(ts); out.writeInt(mask); out.writeUTF(v)
      }
      out.flush(); bos.toByteArray
    } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Int, String)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val n = in.readInt()
      val buffer = new mutable.ArrayBuffer[(Long, Int, String)](n)
      var i = 0
      while (i < n) { buffer += ((in.readLong(), in.readInt(), in.readUTF())); i += 1 }
      buffer
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftSequenceNextNode =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftSequenceNextNode =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GraftSequenceNextNode =
    copy(dirExpr = newChildren(0), baseExpr = newChildren(1), tsExpr = newChildren(2),
      valueExpr = newChildren(3), conds = newChildren.drop(4))
}

/** `sequenceMatchEvents('pattern')(ts, cond1, …)` — the timestamps
  * of the (?N) condition steps of the LEFTMOST pattern match (the
  * deterministic reading: the match is reconstructed forward from
  * the shared feasibility DP by always taking the earliest feasible
  * event per step). Empty array when the pattern doesn't match.
  * Same grammar ((?N), ., .*, (?t op N)), strict-increase and
  * whale-cap discipline as [[GraftSequenceMatch]]. */
case class GraftSequenceMatchEvents(
    paramExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    maxGroupEvents: Int = Int.MaxValue,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {
  import SequenceAggBase._

  private lazy val steps: Array[SeqStep] =
    SequenceAggBase.parseSteps(paramExpr, conds.length, prettyName)

  override protected lazy val keepAllEvents: Boolean = needsAllEvents(steps)

  override def dataType: DataType = ArrayType(tsExpr.dataType, containsNull = false)
  override def prettyName: String = "sequenceMatchEvents"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val evs = sorted(buffer)
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    if (evs.isEmpty) return empty
    val ok = SequenceAggBase.feasibility(evs, steps)
    val k = steps.length
    val start = evs.indices.find(ok(0))
    if (start.isEmpty) return empty
    val picked = new Array[Int](k)
    picked(0) = start.get
    var s = 1
    while (s < k) {
      val prev = picked(s - 1)
      val j = steps(s).gap match {
        case Adjacent => prev + 1 // DP guarantees validity
        case AnyGap =>
          (prev + 1 until evs.length)
            .find(j => evs(j)._1 > evs(prev)._1 && ok(s)(j)).get
        case tg: TimeGap =>
          (prev + 1 until evs.length)
            .find(j => evs(j)._1 > evs(prev)._1 && tg.holds(evs(j)._1 - evs(prev)._1) && ok(s)(j)).get
      }
      picked(s) = j
      s += 1
    }
    val ts = picked.indices.collect {
      case i if steps(i).condIdx >= 0 => java.lang.Long.valueOf(evs(picked(i))._1)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(ts.toArray[Any])
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftSequenceMatchEvents =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftSequenceMatchEvents =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GraftSequenceMatchEvents =
    copy(paramExpr = newChildren.head, tsExpr = newChildren(1), conds = newChildren.drop(2))
}
