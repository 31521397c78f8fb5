package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors) —
  * the north-star ANN family (BASELINE.md).
  *
  * Scale design:
  *   - The query set is small and BROADCAST; the corpus is scanned once.
  *     No shuffle of the corpus for scoring.
  *   - Exact top-k uses a two-phase window (per-salt partial top-k, then
  *     global top-k over ≤ salts×k survivors) so no single reducer ever
  *     sees the whole corpus — the window-partition skew a naive
  *     `row_number over (partition by q_id)` would create at 100 TB.
  *   - The ANN path is IVF: per-label centroids (the label column is the
  *     coarse quantizer), probe the 2 nearest centroids, exact re-rank
  *     only within probed partitions — corpus touched ∝ nprobe/nlist.
  *
  * Cross-engine determinism: every dot product is a sequential left fold
  * over index-ordered double products (Spark `aggregate`, DuckDB
  * `list_reduce` — identical IEEE op order); centroids accumulate exact
  * integers (`floor(v*1e6)` longs, order-independent) divided once, never
  * engine-native AVG of doubles (whose accumulation order is unspecified).
  */
object Similarity {

  private val K = 5
  private val NProbe = 2
  private val Salts = 32

  /** Sequential-fold dot product of two (castable-to-double) arrays —
    * kept for double-typed inputs (centroids), where the float-specialized
    * native expression doesn't apply. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** float×float cosine: the codegen'd native expression (bit-identical
    * to the fold — see CosineSimilaritySpec). */
  private def cosineF(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    emb(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Exact cosine top-k per query: broadcast queries, one corpus scan,
    * two-phase windowed top-k. */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val scored = emb(s, d)
      .crossJoin(broadcast(queriesDf(s, d)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineF(col("embedding"), col("q_emb")).as("cosine"))
    val w1 = Window.partitionBy(col("q_id"), pmod(col("vec_id"), lit(Salts)))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val w2 = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= K)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  private val Dim = 64
  private val CentroidScale = 1e6

  /** Per-label centroids via exact integer accumulation: each component
    * maps to `floor(v * 1e6)` (a long), longs SUM exactly and
    * order-independently (partial aggregation, constant buffer), one final
    * division — and DuckDB computes the identical longs, so the oracle
    * stays hash-exact without any ordering contract.
    *
    * Replaces the round-2 `sort_array(collect_list(struct(vec_id, v)))`
    * order-exact fold, which buffered one struct PER corpus VECTOR inside
    * a single aggregation buffer — at 100 TB a popular label is a
    * driver-sized-memory problem relocated to an executor. The ≤1e-6
    * absolute truncation per component only nudges probe *selection*;
    * output cosines are computed on raw embeddings, never on centroids.
    *
    * One hash aggregate, 65 fixed-width buffers per label, no explode:
    * the 64-row-per-vector expansion the posexplode formulation shuffled
    * is gone too. */
  def centroidArrays(s: SparkSession, d: String): DataFrame = {
    val sums = (0 until Dim).map(i =>
      sum(floor(col("embedding").getItem(i).cast("double") * lit(CentroidScale))).as(s"s$i"))
    emb(s, d)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("label").as("c_label"),
        array((0 until Dim).map(i =>
          col(s"s$i").cast("double") / (col("n").cast("double") * lit(CentroidScale))): _*)
          .as("centroid"))
  }

  /** IVF ANN: probe the NProbe nearest centroids per query, exact re-rank
    * within probed labels only. Approximate by construction; recall vs the
    * exact path is asserted in SimilaritySpec. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_label").asc)
    val probed = queriesDf(s, d)
      .crossJoin(broadcast(centroidArrays(s, d)))
      .select(col("q_id"), col("q_emb"), col("c_label"),
        cosine(col("q_emb"), col("centroid")).as("c_cos"))
      .withColumn("pr", row_number().over(probeW)).filter(col("pr") <= NProbe)
      .select(col("q_id"), col("q_emb"), col("c_label"))
    val rankW = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    probed
      .join(emb(s, d), col("label") === col("c_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineF(col("embedding"), col("q_emb")).as("cosine"))
      .withColumn("rank", row_number().over(rankW)).filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_cosine_topk" -> (cosineTopK _),
    "v_ann_ivf" -> (annIvf _),
  )

  private val sqlCos = {
    def dotSql(a: String, b: String) =
      s"""list_reduce(list_transform(range(0, 64),
         |  i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)), (x,y) -> x+y)""".stripMargin
    (a: String, b: String) =>
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
  }

  val oracle: Map[String, String] = Map(
    "v_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.q_id, e.vec_id, ${sqlCos("e.embedding", "q.q_emb")} AS cosine
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |                ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
    "v_ann_ivf" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
         |expl AS (
         |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         |         unnest(embedding) AS v
         |  FROM embeddings),
         |cent AS (
         |  SELECT label, pos,
         |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         |           / (COUNT(*) * 1000000.0) AS c
         |  FROM expl GROUP BY label, pos),
         |carr AS (
         |  SELECT label AS c_label, list(c ORDER BY pos) AS centroid
         |  FROM cent GROUP BY label),
         |probed AS (
         |  SELECT q_id, q_emb, c_label,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY ${sqlCos("q_emb", "centroid")} DESC, c_label ASC) AS pr
         |  FROM q, carr),
         |scored AS (
         |  SELECT p.q_id, e.vec_id, ${sqlCos("e.embedding", "p.q_emb")} AS cosine
         |  FROM probed p JOIN embeddings e ON e.label = p.c_label AND e.vec_id <> p.q_id
         |  WHERE p.pr <= 2),
         |ranked AS (
         |  SELECT q_id, vec_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |                ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
  )
}
