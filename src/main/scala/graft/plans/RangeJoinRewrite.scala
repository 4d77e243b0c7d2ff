package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, LongType}

/** Optimizer rule: an inner join whose condition is a point-in-interval
  * date predicate — `p BETWEEN s AND e` (or the strict variants), with
  * the point on one side and both bounds on the other — has no equi
  * pair for the planner to hash on beyond any key columns, so Spark
  * either nest-loops the whole input or evaluates the range as a
  * post-probe filter inside each key group (quadratic in the group —
  * fatal on a hot key). This rule injects the bucketization of
  * [[graft.operators.RangeJoin]] at the LOGICAL level, so a user who
  * writes the NATURAL join syntax still gets the linear plan:
  *
  *   - the point side gains `__graft_bkt = days(p) div bucketDays`
  *     (default 7; see the `spark.graft.rangeJoinRewrite.*` knobs);
  *   - the interval side explodes to every bucket in
  *     `[days(s) div bucketDays, days(e) div bucketDays]`;
  *   - the join gains the `__graft_bkt` equality (the original range
  *     conjuncts stay in place — they re-check the exact predicate on
  *     the bucket survivors);
  *   - a final projection restores the original output.
  *
  * Truncating division is monotone, so an in-range point's bucket
  * always lies inside the interval's exploded bucket span, and a point
  * owns exactly ONE bucket, so no pair is emitted twice. The rule skips
  * streaming plans (stream-stream interval joins manage watermark state
  * through the raw time-bound condition) and any join whose inputs
  * already carry the `__graft_bkt` marker (idempotency; also lets
  * [[graft.operators.RangeJoin]]'s explicit form pass through
  * untouched). RangeJoinRewriteSpec pins natural-syntax equality to the
  * naive result and the nested-loop-free plan.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  private val Marker = "__graft_bkt"

  /** Session-level tuning knobs (plain SQLConf strings, settable via
    * `spark.conf.set`). The rule fires on ANY inner join carrying a
    * point-in-interval date pair, so plans outside the curated queries
    * need an off switch and a bucket-width dial: each interval row
    * explodes into `span/bucketDays + 1` rows, so a corpus of month- or
    * year-long intervals should widen the bucket (or disable the rule)
    * rather than inflate its build side 5–50×. `skipEquiJoins` (opt-in)
    * leaves joins that already carry an equi-key pair to the hash
    * planner — the range conjunct then runs as a post-probe filter
    * inside each key group, which is the better trade when keys are
    * selective and the worse one when a key is hot; default keeps the
    * round-6 behavior (rewrite, pinned by RangeJoinRewriteSpec). */
  val EnabledKey = "spark.graft.rangeJoinRewrite.enabled"
  val BucketDaysKey = "spark.graft.rangeJoinRewrite.bucketDays"
  val SkipEquiKey = "spark.graft.rangeJoinRewrite.skipEquiJoins"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean
  private def bucketDays: Long =
    conf.getConfString(BucketDaysKey, "7").toLong.max(1L)
  private def skipEquiJoins: Boolean =
    conf.getConfString(SkipEquiKey, "false").toBoolean

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** days-since-epoch div BucketDays, as a long. (Casts carry the
    * session timezone: several datetime expressions are
    * TimeZoneAwareExpression and stay UNRESOLVED without one — the
    * optimizer's plan validator rejects the rewrite otherwise.) */
  private def bucket(d: Expression, bucketLen: Long): Expression =
    IntegralDivide(
      Cast(DateDiff(d, Literal(0, DateType)), LongType,
        Option(conf.sessionLocalTimeZone)),
      Literal(bucketLen))

  /** Normalize one inequality conjunct into "point ≥/> bound" and
    * "point ≤/< bound" readings: (point, bound, isLowerBound). */
  private def readings(c: Expression): Seq[(Expression, Expression, Boolean)] =
    c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming &&
            !left.output.exists(_.name == Marker) &&
            !right.output.exists(_.name == Marker) =>
        rewrite(left, right, cond, hint).getOrElse(j)
    }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      cond: Expression,
                      hint: JoinHint): Option[LogicalPlan] = {
    val all = conjuncts(cond)
    def onLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def onRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    // Opt-in: a join that already gives the planner an equi pair to
    // hash on is left alone (the range predicate becomes a post-probe
    // filter inside each key group).
    if (skipEquiJoins && all.exists {
          case EqualTo(a, b) =>
            (onLeft(a) && onRight(b)) || (onRight(a) && onLeft(b))
          case _ => false
        }) return None
    // A usable bound: point is a DateType expr wholly on one side, the
    // bound wholly on the other.
    def usable(p: Expression, b: Expression) =
      p.dataType == DateType && b.dataType == DateType &&
        ((onLeft(p) && onRight(b)) || (onRight(p) && onLeft(b)))
    val lowers = all.flatMap(readings).collect {
      case (p, b, true) if usable(p, b) => (p, b)
    }
    val uppers = all.flatMap(readings).collect {
      case (p, b, false) if usable(p, b) => (p, b)
    }
    val pair = (for {
      (p, s) <- lowers
      (p2, e) <- uppers
      if p.semanticEquals(p2)
      // both bounds must live on the SAME (interval) side
      if (onLeft(s) && onLeft(e)) || (onRight(s) && onRight(e))
    } yield (p, s, e)).headOption
    pair.map { case (p, s, e) =>
      val bkt = bucketDays
      val pointOnLeft = onLeft(p)
      val (pointPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)
      val bktAlias = Alias(bucket(p, bkt), Marker)()
      val pointProj = Project(pointPlan.output :+ bktAlias, pointPlan)
      val genOut = AttributeReference(Marker, LongType)()
      // A reversed (e < s) or null-bounded interval must stay a
      // NO-MATCH, not a runtime error: Sequence with step 1 THROWS on
      // descending boundaries, so guard it behind an empty array (the
      // null predicate also routes to the empty branch).
      val seqExpr = If(
        LessThanOrEqual(bucket(s, bkt), bucket(e, bkt)),
        new Sequence(bucket(s, bkt), bucket(e, bkt), Literal(1L))
          .withTimeZone(conf.sessionLocalTimeZone)
          .asInstanceOf[Expression],
        Literal.create(Array.empty[Long],
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
      val ivGen = Generate(Explode(seqExpr),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(genOut), child = ivPlan)
      val newCond = (all :+ EqualTo(bktAlias.toAttribute, genOut)).reduce(And)
      val (nl, nr) = if (pointOnLeft) (pointProj, ivGen) else (ivGen, pointProj)
      Project(left.output ++ right.output,
        Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}
