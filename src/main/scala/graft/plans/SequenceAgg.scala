package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Shared machinery for ClickHouse's sequence-over-time aggregates
  * (`windowFunnel`, `sequenceMatch`). The buffer holds one `(ts µs,
  * condition bitmask)` pair per input row that matches at least one
  * condition — events matching none are dropped at update time, so
  * buffer size is bounded by the per-group count of *relevant* events,
  * exactly the memory envelope ClickHouse's own implementations have.
  * Merge is buffer concatenation (order restored by the single sort in
  * `eval`), so partial aggregation across 1000 executors behaves like
  * any other map-side-combined agg: no shuffle of raw events, only of
  * the per-group relevant pairs.
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
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]] {

  /** Leading parameter ((window) or (pattern)), then the timestamp. */
  def paramExpr: Expression
  def tsExpr: Expression
  def conds: Seq[Expression]

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
      if (mask != 0) buffer += ((ts.asInstanceOf[Long], mask))
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[(Long, Int)],
      other: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    buffer ++= other
    buffer
  }

  /** Buffer sorted by (ts, mask) — the deterministic event order every
    * subclass evaluates over. */
  protected def sorted(buffer: mutable.ArrayBuffer[(Long, Int)]): Array[(Long, Int)] = {
    val arr = buffer.toArray
    java.util.Arrays.sort(arr, (a: (Long, Int), b: (Long, Int)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else Integer.compare(a._2, b._2)
    })
    arr
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
  /** Parse the supported sequence-pattern subset into (condIndex,
    * gapBefore) steps: `(?N)` atoms, optionally separated by `.*`.
    * Time-constraint atoms and bare `.`/`.+` are rejected loudly. */
  def parseSteps(paramExpr: Expression, nConds: Int, name: String): Array[(Int, Boolean)] = {
    val pattern = paramExpr.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(s"$name pattern must be a string literal, got $other")
    }
    val StepRe = """\(\?(\d+)\)""".r
    val out = mutable.ArrayBuffer.empty[(Int, Boolean)]
    var rest = pattern
    var gap = false
    while (rest.nonEmpty) {
      if (rest.startsWith(".*")) { gap = true; rest = rest.drop(2) }
      else StepRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          val idx = m.group(1).toInt - 1
          require(idx >= 0 && idx < nConds,
            s"$name pattern step (?${idx + 1}) exceeds $nConds conditions")
          out += ((idx, gap)); gap = false; rest = rest.drop(m.matched.length)
        case None =>
          throw new IllegalArgumentException(
            s"$name: unsupported pattern atom at '$rest' (supported: (?N) and .*)")
      }
    }
    require(out.nonEmpty, s"$name pattern must contain at least one (?N) step")
    out.toArray
  }
}

/** ClickHouse `windowFunnel(window)(ts, cond1, …, condN)`: the deepest
  * funnel level reached by a chain of strictly-time-increasing events
  * cond1 → cond2 → … whose LAST event falls within `window` seconds of
  * the chain's FIRST event.
  *
  * Algorithm (single pass over the sorted events): `firstTs(l)` holds
  * the latest chain-start timestamp among chains that reached level
  * l+1. A later start weakly dominates an earlier one — it satisfies
  * every window check an earlier start would — so one slot per level is
  * complete, and a chain of length L exists iff the pass records level
  * L. Equal-timestamp events are batched so extensions only see state
  * from strictly earlier timestamps (strict_increase).
  */
case class GraftWindowFunnel(
    paramExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  private lazy val windowMicros: Long = paramExpr.eval() match {
    case i: Int  => i * 1000000L
    case l: Long => l * 1000000L
    case other   => throw new IllegalArgumentException(s"windowFunnel window must be integral seconds, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "windowFunnel"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any = {
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
  * Supported pattern subset: `(?N)` condition steps, optionally
  * separated by `.*`. Adjacent steps must match consecutive events in
  * the (ts, mask)-sorted sequence of condition-matching events; a `.*`
  * gap allows any number of events between. Matched steps must strictly
  * increase in timestamp. Time-constraint atoms (`(?t<=3600)`) and bare
  * `.`/`.+` are rejected with an error rather than mis-matched.
  *
  * Exact O(events × steps²) dynamic program, evaluated per group —
  * no cross-row state, so partial aggregation parallelizes freely.
  */
case class GraftSequenceMatch(
    paramExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  /** (condIndex, gapBefore): gapBefore = a `.*` precedes this step. */
  private lazy val steps: Array[(Int, Boolean)] =
    SequenceAggBase.parseSteps(paramExpr, conds.length, prettyName)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sequenceMatch"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val evs = sorted(buffer)
    val m = evs.length
    val k = steps.length
    if (m == 0) return false
    // ok(s)(i) = steps s.. can match with step s placed on event i
    val ok = Array.ofDim[Boolean](k + 1, m + 1)
    var s = k - 1
    var first = true
    var next: Array[Boolean] = null
    while (s >= 0) {
      val (condIdx, _) = steps(s)
      val gapAfter = if (s + 1 < k) steps(s + 1)._2 else false
      val cur = ok(s)
      var i = m - 1
      while (i >= 0) {
        if ((evs(i)._2 & (1 << condIdx)) != 0) {
          if (first) cur(i) = true
          else if (gapAfter) {
            // any later event with strictly greater ts
            var j = i + 1
            var found = false
            while (j < m && !found) {
              if (evs(j)._1 > evs(i)._1 && next(j)) found = true
              j += 1
            }
            cur(i) = found
          } else {
            cur(i) = i + 1 < m && evs(i + 1)._1 > evs(i)._1 && next(i + 1)
          }
        }
        i -= 1
      }
      next = cur
      first = false
      s -= 1
    }
    // leading events before the first step are always allowed
    var i = 0
    while (i < m) {
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
  * (ClickHouse's documented greedy semantics). Same pattern subset and
  * strict_increase discipline as [[GraftSequenceMatch]].
  *
  * The scan extends each candidate match with the EARLIEST feasible
  * event per step; for this pattern subset (steps joined by adjacency
  * or `.*`) earliest-extension is exchange-optimal, so the greedy
  * count equals the maximum number of disjoint matches.
  */
case class GraftSequenceCount(
    paramExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  /** (condIndex, gapBefore) steps — same pattern grammar as
    * sequenceMatch (kept in sync via the shared parser). */
  private lazy val steps: Array[(Int, Boolean)] =
    SequenceAggBase.parseSteps(paramExpr, conds.length, prettyName)

  override def dataType: DataType = LongType
  override def prettyName: String = "sequenceCount"

  override def eval(buffer: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val evs = sorted(buffer)
    val m = evs.length
    var count = 0L
    var pos = 0
    while (pos < m) {
      // attempt the earliest match starting at pos or later
      var start = pos
      var matched = -1
      while (start < m && matched < 0) {
        if ((evs(start)._2 & (1 << steps(0)._1)) != 0) {
          // greedy earliest extension from this start
          var last = start
          var s = 1
          var dead = false
          while (s < steps.length && !dead) {
            val (condIdx, gapBefore) = steps(s)
            if (gapBefore) {
              var j = last + 1
              var found = -1
              while (j < m && found < 0) {
                if (evs(j)._1 > evs(last)._1 && (evs(j)._2 & (1 << condIdx)) != 0) found = j
                j += 1
              }
              if (found < 0) dead = true else last = found
            } else {
              if (last + 1 < m && evs(last + 1)._1 > evs(last)._1 &&
                  (evs(last + 1)._2 & (1 << condIdx)) != 0) last += 1
              else dead = true
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
