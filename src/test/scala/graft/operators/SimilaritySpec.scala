package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality + shape checks: the IVF path must return full result sets
  * and recover a meaningful fraction of the exact top-k (it probes 2 of
  * 10 label partitions, so recall < 1 is expected — that's the
  * accuracy/cost dial; exactness is the oracle's job). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("exact top-k returns k rows per query with descending cosine") {
    val rows = Similarity.cosineTopK(s, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF recall@5 vs exact is substantial despite probing 2/10 partitions") {
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
    val exact = sets(Similarity.cosineTopK(s, sf))
    val ivf = sets(Similarity.annIvf(s, sf))
    val recalls = exact.map { case (q, ex) =>
      ivf.get(q).map(iv => (ex & iv).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.2f")
    assert(mean >= 0.2, f"IVF recall collapsed: $mean%.2f")
  }

  test("native SRP band keys == declarative HOF fold, bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import graft.Tables
    val both = Tables.embeddings(s, sf).select(
      Similarity.lshBandKeysNative(col("embedding")).as("native"),
      Similarity.lshBandKeysFold(col("embedding")).as("fold"))
    // null-safe inequality: `=!=` yields NULL (row dropped) when either
    // side is NULL, which would hide a native-NULL vs fold-zero divergence
    assert(both.filter(!(col("native") <=> col("fold"))).count() == 0)
  }

  test("LSH ANN recovers a meaningful fraction of exact top-k from bucketed candidates") {
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
    val exact = sets(Similarity.cosineTopK(s, sf))
    val lsh = sets(Similarity.annLsh(s, sf))
    val recalls = exact.map { case (q, ex) =>
      lsh.get(q).map(iv => (ex & iv).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"mean LSH recall@5 = $mean%.2f")
    assert(mean >= 0.2, f"LSH recall collapsed: $mean%.2f")
  }

  test("LSH candidate set is a small fraction of the query-corpus cross product") {
    import graft.Tables
    val nCorpus = Tables.embeddings(s, sf).count()
    val nQueries = 8L
    val candidates = Similarity.lshCandidateCount(s, sf)
    info(s"candidates=$candidates of ${nQueries * (nCorpus - 1)} pairs")
    assert(candidates.toDouble / (nQueries * (nCorpus - 1)) < 0.5,
      "LSH banding prunes nothing — bucket scheme degenerate")
  }

  test("all-pairs LSH candidate generation prunes the quadratic pair space") {
    import graft.Tables
    val n = Tables.embeddings(s, sf).count()
    val cand = Similarity.embedLshCandidates(s, sf).count()
    val frac = cand.toDouble / (n * (n - 1) / 2)
    info(f"candidates=$cand of ${n * (n - 1) / 2} pairs (${frac * 100}%.1f%%)")
    assert(frac < 0.1, f"blocking degenerate: $frac%.3f of all pairs are candidates")
  }

  test("IVF plan buffers no per-vector collections (no collect_list anywhere)") {
    val optimized = Similarity.annIvf(s, sf).queryExecution.optimizedPlan.toString
    assert(!optimized.contains("collect_list"),
      s"centroid build must not buffer whole groups:\n$optimized")
    assert(!optimized.contains("sort_array"))
  }
}
