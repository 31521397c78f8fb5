package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The typed Aggregator must be an API change only: row-for-row equality
  * with the SQL formulation, including the derived doubles (same exact
  * integer sums, same single-division IEEE order), plus partitioning
  * invariance of the case-class buffer merge. */
class MomentsAggSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("typed Aggregator ≡ the SQL stats kernel, bit for bit") {
    val sqlForm = graft.operators.Relational.statsKernel(s, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    val typedForm = graft.operators.Relational.statsTyped(s, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(typedForm == sqlForm, "typed Aggregator diverged from the SQL kernel")
  }

  test("buffer merge is partitioning-invariant") {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def run(parts: Int) = graft.Tables.lineitem(s, TestSpark.sf)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long"), col("l_linenumber").cast("long"))
      .as[(String, Long, Long)]
      .repartition(parts)
      .groupByKey(_._1)
      .agg(MomentsAgg.toColumn)
      .collect().sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }
}
