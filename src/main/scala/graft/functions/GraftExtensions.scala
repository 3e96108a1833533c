package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions into the SQL function registry, so
  * `spark.sql("... float_vector_dot(a, b) ...")` plans the codegen'd
  * kernel. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the as-of join planner strategy and
    // its filter-pushdown optimizer rule
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinPlan.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPlan.AsOfJoinFilterPushdown)
    ext.injectFunction((
      FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"float_vector_dot expects 2 arguments, got ${exprs.length}")
        FloatVectorDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"damerau_levenshtein expects 2 arguments, got ${exprs.length}")
        DamerauLevenshtein(exprs.head, exprs(1))
      }))
  }
}
