package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Engine extensions, injected via the standard
  * `spark.sql.extensions=graft.GraftExtensions` mechanism (GraftSession
  * sets it): custom expressions for SQL users
  * (`SELECT cosine_similarity(a, b)`) and the planner strategy for the
  * bounded-memory per-key top-k operator (graft.plans.TopK).
  *
  * The reference's own semantics need no custom Rule/Strategy (SURVEY.md
  * §4) — the extension points here serve the engine's scale additions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => plans.TopKStrategy)
    ext.injectOptimizerRule(_ => plans.RewriteWindowTopK)
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
