package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-time cartesian guard: REFUSES any cross join (or conditionless
  * inner join) where neither side is provably ≤1 row and neither side
  * carries an explicit join-strategy hint. At 100 TB an accidental
  * cartesian doesn't fail — it runs for days and then OOMs a shuffle;
  * this rule turns that class of bug into an immediate plan-time error
  * with a pointed message. The engine's own discipline is the opt-in
  * contract: every legitimate cross site either crosses a scalar
  * (1-row aggregate — `maxRows ≤ 1` proves it structurally) or wraps
  * the small side in `broadcast(...)`, which records intent in the
  * JoinHint. The rule is injected via [[graft.GraftExtensions]] and is
  * live in the Verify/Bench/test sessions, so the whole declared query
  * surface is certified guard-clean every round.
  *
  * Read-only: returns the plan unchanged (assertion rule, not a
  * rewrite), so idempotence across optimizer batches is trivial.
  */
case class CartesianGuardRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      // conditionless OUTER joins execute as BroadcastNestedLoopJoin with
      // the same runaway-cartesian cost as a bare cross (ADVICE r10) —
      // same refusal, same exemptions
      case j @ Join(left, right,
          Cross | Inner | LeftOuter | RightOuter | FullOuter, None, hint) =>
        val scalarSide = left.maxRows.exists(_ <= 1) || right.maxRows.exists(_ <= 1)
        val hinted = hint.leftHint.exists(_.strategy.isDefined) ||
          hint.rightHint.exists(_.strategy.isDefined)
        if (!scalarSide && !hinted) {
          throw new IllegalStateException(
            "graft CartesianGuard: unguarded cross join — neither side is a " +
              "1-row frame (maxRows<=1) and neither carries a join-strategy " +
              "hint. Wrap the provably-small side in broadcast(...) to record " +
              "intent, or restructure to a keyed join. Offending join:\n" +
              j.simpleString(3))
        }
      case _ =>
    }
    plan
  }
}
