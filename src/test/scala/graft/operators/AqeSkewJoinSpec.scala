package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join contract: the runtime split must actually fire (the
  * operator itself REQUIREs `skew=true` on the executed sort-merge join,
  * so a plain pass here certifies it), results must equal a plain
  * unsplit recompute row-for-row (skew mitigation never changes
  * answers), and the scoped conf overrides must not leak. */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("skew split fires and agrees with the plain unsplit computation") {
    import org.apache.spark.sql.functions._
    val aqe = Skew.aqeSkewJoin(s, sf).collect().map(_.toSeq)
    assert(aqe.nonEmpty)
    // unsplit recompute: plain join, no merge hint, default confs
    val fact = graft.Tables.lineitem(s, sf)
      .select(when(col("l_orderkey") % 10 < 8, lit(0L))
          .otherwise(col("l_orderkey") % 10).as("skew_key"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val dim = graft.Tables.nation(s, sf)
      .select(col("n_nationkey").cast("long").as("dkey"), col("n_name"))
    val plain = fact.join(dim, fact("skew_key") === dim("dkey"))
      .groupBy("skew_key", "n_name")
      .agg(count(lit(1)).as("n_lines"), graft.QueryDsl.dsum(col("rev")).as("revenue"))
      .orderBy("skew_key")
      .collect().map(_.toSeq)
    assert(aqe.toSeq == plain.toSeq,
      "AQE-split join must produce identical rows to the unsplit recompute")
  }

  test("AQE coalesce: answers equal the plain aggregate; confs restored") {
    import org.apache.spark.sql.functions._
    val keys = Seq("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val before = keys.map(k => s.conf.getOption(k))
    val got = Skew.aqeCoalesce(s, sf).collect().map(_.toSeq)
    assert(keys.map(k => s.conf.getOption(k)) == before, "scoped confs leaked")
    val plain = graft.Tables.orders(s, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), graft.QueryDsl.dsum(col("o_totalprice")).as("r"))
      .orderBy("o_orderpriority").collect().map(_.toSeq)
    assert(got.toSeq == plain.toSeq, "coalescing changed the answer")
  }

  test("scoped skew confs are restored after the query") {
    val keys = Seq(
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val before = keys.map(k => s.conf.getOption(k))
    Skew.aqeSkewJoin(s, sf).collect()
    assert(keys.map(k => s.conf.getOption(k)) == before,
      "conf overrides leaked out of the scoped block")
  }
}
