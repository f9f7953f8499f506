package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, LessThan, LessThanOrEqual, Literal, Remainder, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Automatic range-join binning: the optimizer-rule form of
  * [[graft.operators.RangeJoin.pointInInterval]].
  *
  * A bare `lo <= p AND p < hi` inner join plans as
  * BroadcastNestedLoopJoin or a cartesian product — the pair space is
  * |points| × |intervals| and dies at scale. Users of the manual
  * operator opt in per call site; this rule makes the SAME rewrite
  * transparent for plain SQL/DataFrame joins, the way a warehouse
  * engine's range-join optimization does:
  *
  *  - the point side gains its single bucket `floorDiv(p, W)`;
  *  - the interval side explodes to every bucket in
  *    `[floorDiv(lo, W), floorDiv(hi, W)]` (a superset for strict/open
  *    bounds — at most one extra bucket, always correct because the
  *    exact predicate is re-applied);
  *  - the join becomes an equi-join on the bucket plus the original
  *    predicate, so the planner picks a hash shuffle join.
  *
  * Each matching (point, interval) pair meets in exactly ONE bucket (the
  * point's), so no dedup is needed; results are identical to the naive
  * join. Intervals with `hi < lo` are filtered — they satisfy no
  * bound combination — which also guards `sequence()` against its
  * descending mode.
  *
  * Fires only when `spark.graft.rangeJoin.binWidth` is a positive long
  * (in the point column's units) and the join condition is EXACTLY the
  * two range conjuncts over LongType attributes with the point column on
  * one side and both bounds on the other. Anything else — extra
  * conjuncts, casts, non-long types, outer joins — is left untouched:
  * a rewrite that is not provably the whole condition is not attempted.
  * The bucket width is a session knob, not statistics-derived; pick it
  * near the median interval length (cost = avg-span/W replication).
  */
object RangeBinRule extends Rule[LogicalPlan] {
  val WidthConf = "spark.graft.rangeJoin.binWidth"

  private def width: Long =
    try SQLConf.get.getConfString(WidthConf, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private case class RangePred(p: Attribute, lo: Attribute, hi: Attribute)

  /** Normalize a comparison to (small, big): small is bounded above by big. */
  private def asOrdered(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(a, b) => Some((a, b))
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThan(a, b) => Some((b, a))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _ => None
  }

  private def longAttr(e: Expression): Option[Attribute] = e match {
    case a: AttributeReference if a.dataType == LongType => Some(a)
    case _ => None
  }

  /** cond must be exactly (lo ≤/< p) AND (p ≤/< hi) with p entirely on
    * one join side and lo, hi both on the other.
    */
  private def matchRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(RangePred, Boolean)] = cond match {
    case And(c1, c2) =>
      (for {
        (s1, b1) <- asOrdered(c1).toSeq
        (s2, b2) <- asOrdered(c2).toSeq
        // orient: one conjunct bounds p from below, the other from above
        (lo, p1, p2, hi) <- Seq((s1, b1, s2, b2), (s2, b2, s1, b1))
        loA <- longAttr(lo).toSeq; pA <- longAttr(p1).toSeq
        pB <- longAttr(p2).toSeq; hiA <- longAttr(hi).toSeq
        if pA.semanticEquals(pB)
        pointOnLeft <-
          if (left.outputSet.contains(pA) &&
            right.outputSet.contains(loA) && right.outputSet.contains(hiA))
            Seq(true)
          else if (right.outputSet.contains(pA) &&
            left.outputSet.contains(loA) && left.outputSet.contains(hiA))
            Seq(false)
          else Seq.empty
      } yield (RangePred(pA, loA, hiA), pointOnLeft)).headOption
    case _ => None
  }

  /** Exact floor division for longs of either sign, overflow-safe across
    * the whole long domain: truncating `div` then decrement when the
    * remainder is negative (a plain `div` truncates toward zero and
    * mis-buckets negatives). The previous `(a − pmod(a, w)) div w` form
    * underflowed for a within w of Long.MinValue — pmod ≥ 0 pushes the
    * subtraction past the domain edge (ANSI: ARITHMETIC_OVERFLOW;
    * non-ANSI: silent wrap → the point lands in a far-away bucket and
    * the row is LOST). Here the decrement only happens when rem < 0,
    * which requires w ≥ 2, so q ≥ MinValue/2 and q − 1 cannot overflow.
    */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    val q = IntegralDivide(a, wl)
    If(LessThan(Remainder(a, wl), Literal(0L, LongType)),
      Subtract(q, Literal(1L, LongType)), q)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond, left, right) match {
          case Some((r, pointOnLeft)) =>
            val (pointPlan, ivPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            val pBucket = Alias(floorDiv(r.p, w), "__graft_p_bucket")()
            val pProj = Project(pointPlan.output :+ pBucket, pointPlan)
            // hi < lo satisfies no bound combination; dropping it also
            // keeps sequence() ascending
            val ivKept = Filter(GreaterThanOrEqual(r.hi, r.lo), ivPlan)
            // Sequence is TimeZoneAwareExpression: a None zone id keeps
            // it unresolved post-analysis (ResolveTimeZone has already
            // run), so set the session zone explicitly even though long
            // sequences never consult it
            val seq = Sequence(floorDiv(r.lo, w), floorDiv(r.hi, w),
              Some(Literal(1L, LongType)),
              Some(SQLConf.get.sessionLocalTimeZone))
            val ivBucket =
              AttributeReference("__graft_iv_bucket", LongType, nullable = false)()
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(ivBucket), child = ivKept)
            val binned = Join(pProj, gen, Inner,
              Some(And(EqualTo(pBucket.toAttribute, ivBucket), cond)), hint)
            // restore the original output order and drop the bucket cols
            Project(j.output, binned)
          case None => j
        }
    }
  }
}
