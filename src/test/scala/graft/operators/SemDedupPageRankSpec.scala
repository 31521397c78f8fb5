package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic-dedup and PageRank invariants that the hash oracle can't
  * express: coverage, flag soundness, and the integer-mass conservation
  * bounds. */
class SemDedupPageRankSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private lazy val sf = TestSpark.sf

  test("semDedup covers every vector exactly once and flags are sound") {
    val out = Dedup.semDedup(s, sf).cache()
    val nVecs = graft.Tables.embeddings(s, sf).count()
    assert(out.count() == nVecs)
    assert(out.select("vec_id").distinct().count() == nVecs)
    // every flagged dup must have a lower-id same-cluster witness at or
    // above the threshold; every unflagged vector must have none
    val x = out.select(col("cluster_id").as("cl"), col("vec_id").as("a"))
    val y = out.select(col("cluster_id").as("cl2"), col("vec_id").as("b"),
      col("is_dup").as("b_dup"))
    val e = graft.Tables.embeddings(s, sf)
    val witnessed = x.join(y, col("cl") === col("cl2") && col("a") < col("b"))
      .join(e.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .filter(graft.functions.GraftFunctions.cosine_sim(col("ea"), col("eb")) >= 0.4)
      .select(col("b")).distinct().collect().map(_.getLong(0)).toSet
    val flagged = out.filter(col("is_dup") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(flagged == witnessed)
    out.unpersist(): Unit
  }

  test("semDedup scores pairs only within clusters, never all-pairs") {
    val out = Dedup.semDedup(s, sf)
    val sizes = out.groupBy("cluster_id").count().collect().map(_.getLong(1))
    val withinPairs = sizes.map(n => n * (n - 1) / 2).sum
    val n = sizes.sum
    assert(withinPairs < n * (n - 1) / 2,
      "clusters must partition the corpus so the pairwise step is blocked")
  }

  test("pageRank: isolated nodes hold the base mass; totals are bounded") {
    val mass = Dedup.pageRank(s, sf).cache()
    val nd = Dedup.neardupPairs(s, sf).select("a", "b")
    val connected = nd.select(col("a").as("id"))
      .union(nd.select(col("b").as("id"))).distinct()
    // isolated nodes receive no contributions in any iteration
    val isolatedMasses = mass.join(connected, mass("doc_id") === connected("id"), "left_anti")
      .select("mass").distinct().collect().map(_.getLong(0)).toSeq
    assert(isolatedMasses == Seq(150000L))
    // flooring only leaks mass: total ≤ initial total; every node ≥ base
    val n = mass.count()
    val total = mass.agg(sum("mass")).collect().head.getLong(0)
    assert(total <= n * 1000000L)
    assert(mass.filter(col("mass") < 150000L).count() == 0)
    // the graph is non-empty at this sf, so some node received contributions
    assert(mass.agg(max("mass")).collect().head.getLong(0) > 150000L)
    mass.unpersist(): Unit
  }

  test("communities: round LpaRounds+1 is a fixpoint and labels refine components") {
    val out = Dedup.communities(s, sf).cache()
    val labels = out.select(col("doc_id"), col("community").as("lbl"))
    // convergence pin: one MORE synchronous round changes no label —
    // the fixed round bound is an observed fixpoint, not a truncation
    val next = Dedup.lpaRoundOnce(s, sf, labels)
    val changed = labels.withColumnRenamed("lbl", "before")
      .join(next.withColumnRenamed("lbl", "after"), "doc_id")
      .filter(col("before") =!= col("after")).count()
    assert(changed == 0, s"$changed labels still moving after LpaRounds rounds")
    // a community never spans two connected components (LPA labels only
    // travel along edges, so communities REFINE the CC partition)
    val cc = Dedup.dupClusters(s, sf)
      .select(col("doc_id"), col("cluster_id").as("component_id"))
    val split = out.join(cc, "doc_id")
      .groupBy(col("community"))
      .agg(countDistinct(col("component_id")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(split == 0, "a community spans multiple connected components")
    // membership accounting: n_members is the true community size and
    // sums back to the node count
    val sizes = out.groupBy(col("community"), col("n_members")).count()
      .filter(col("n_members") =!= col("count")).count()
    assert(sizes == 0, "n_members disagrees with actual membership")
    assert(out.count() > 0)
    out.unpersist(): Unit
  }
}
