package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DeflateSizeExpr, DoubleDotProduct, Murmur64Expr}

/** Session-extension packaging: makes the engine's custom expressions
  * first-class SQL functions in any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`), so pure-SQL users get
  * `graft_murmur64` / `graft_dot` with full codegen — no Scala API
  * required — and injects the plan-time
  * [[graft.plans.CartesianGuardRule]], which refuses unguarded cross
  * joins before they can run (the 100 TB guardrail; every legitimate
  * cross in the engine is a scalar frame or an explicit broadcast).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(graft.plans.CartesianGuardRule.apply)
    ext.injectFunction((
      FunctionIdentifier("graft_murmur64"),
      new ExpressionInfo(classOf[Murmur64Expr].getName, "graft_murmur64"),
      (children: Seq[Expression]) =>
        Murmur64Expr(graft.functions.GraftFunctions.stringInput(children.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DoubleDotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_size"),
      new ExpressionInfo(classOf[DeflateSizeExpr].getName, "graft_deflate_size"),
      (children: Seq[Expression]) =>
        DeflateSizeExpr(graft.functions.GraftFunctions.stringInput(children.head))))
  }
}
