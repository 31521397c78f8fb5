package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Engine extensions, injected via the standard
  * `spark.sql.extensions=graft.GraftExtensions` mechanism (GraftSession
  * sets it), so SQL users get the custom expressions without touching the
  * Scala API: `SELECT cosine_similarity(a, b)`.
  *
  * No custom Rule/Strategy is injected: SURVEY.md §4 records that the
  * reference's semantics need none — Catalyst's built-ins cover every
  * rewrite, and the one non-relational kernel (NPORT extraction) composes
  * as a flatMap, not a plan node. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
