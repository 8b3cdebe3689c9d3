package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Rewrites a naive bounded-interval join — an INNER join whose only
  * usable predicate is `abs(lt - rt) <= B` over integral columns —
  * into the time-bucketized equi-join the library's `q_range_join`
  * writes by hand:
  *
  *   left  + bucket  floor(lt / B)
  *   right + explode [floor(rt / B) − 1, floor(rt / B), floor(rt / B) + 1]
  *   join on bucket equality AND the original exact predicate
  *
  * Without an equi conjunct Spark can only plan such a join as a
  * BroadcastNestedLoopJoin / cartesian — O(n·m) comparisons. The
  * rewrite gives the planner a shuffle key: any qualifying pair's
  * bucket indices differ by at most one, and the left bucket is a
  * single value, so each pair matches exactly once (no dedup needed)
  * at the cost of a 3× right-side duplication — the standard
  * interval-join trade at scale.
  *
  * The rule fires ONLY when the join has no equi conjunct at all (if
  * one exists, hash/sort-merge join on it is already available and the
  * 3× duplication would be pure overhead) and leaves every original
  * conjunct in place, so the rewritten join is semantically identical
  * by construction. After the rewrite the join HAS an equality —
  * the rule cannot fire twice (fixpoint-safe).
  *
  * Registered by [[GraftExtensions]]; a user writes the obvious
  * predicate and gets the scalable plan.
  */
object IntervalJoinBucketize extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  /** `(lt, rt, bound)` when `c` is `abs(lt - rt) <= bound` (or the
    * mirrored `bound >= abs(..)`) with lt from `left`, rt from
    * `right` (either subtraction order), over integral types. */
  private def matchAbsRange(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def bound(lit: Literal): Option[Long] = lit.value match {
      case v: Long if v > 0                   => Some(v)
      case v: Int if v > 0                    => Some(v.toLong)
      case _                                  => None
    }
    def sides(sub: Expression): Option[(Expression, Expression)] = sub match {
      case Subtract(a, b, _) if isIntegral(a) && isIntegral(b) =>
        if (canEvaluate(a, left) && canEvaluate(b, right)) Some((a, b))
        else if (canEvaluate(b, left) && canEvaluate(a, right)) Some((b, a))
        else None
      case _ => None
    }
    c match {
      case LessThanOrEqual(Abs(sub, _), l: Literal) =>
        for (b <- bound(l); (lt, rt) <- sides(sub)) yield (lt, rt, b)
      case GreaterThanOrEqual(l: Literal, Abs(sub, _)) =>
        for (b <- bound(l); (lt, rt) <- sides(sub)) yield (lt, rt, b)
      case _ => None
    }
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(b, left) && canEvaluate(a, right))
      case EqualNullSafe(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(b, left) && canEvaluate(a, right))
      case _ => false
    }

  /** Exact integer floor(e / b): `(e - pmod(e, b)) div b`. A
    * double-division floor would silently round values above 2^53
    * (e.g. nanosecond epochs ~1.7e18), letting qualifying pairs land
    * in buckets 2+ apart and DROP from the rewritten join; the
    * integer form is exact over the full long range, negatives
    * included (pmod keeps the remainder non-negative, so this is true
    * floor division, not truncation). */
  private def bucketOf(e: Expression, b: Long): Expression = {
    val el = Cast(e, LongType)
    IntegralDivide(Subtract(el, Pmod(el, Literal(b))), Literal(b))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && {
          val cs = splitConjunctivePredicates(cond)
          !hasEquiConjunct(cs, left, right) &&
            cs.exists(matchAbsRange(_, left, right).isDefined)
        } =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (lt, rt, b) = conjuncts
        .flatMap(matchAbsRange(_, left, right)).head
      val lbkt = Alias(bucketOf(lt, b), "graft_bkt_l")()
      val newLeft = Project(left.output :+ lbkt, left)
      val rbkt = bucketOf(rt, b)
      val arr = CreateArray(Seq(
        Subtract(rbkt, Literal(1L)), rbkt, Add(rbkt, Literal(1L))))
      val genOut = AttributeReference("graft_bkt_r", LongType)()
      val newRight = Generate(Explode(arr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(genOut), child = right)
      val newCond = And(cond, EqualTo(lbkt.toAttribute, genOut))
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
