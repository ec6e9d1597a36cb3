package graft.operators

import graft.Tables._
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.parquet` (array<float>, dim 64).
  *
  * - `ann_topk`: brute-force cosine top-k — the exactness baseline. The
  *   (small) query set is broadcast against the full vector table, cosine
  *   runs inside codegen, and ranking is a row_number window partitioned
  *   by query — at cluster scale each partition ranks its own slice and
  *   only k rows per (query, partition) survive to the final shuffle
  *   thanks to the window's rank filter pushdown (LimitPushDownThroughWindow).
  * - `ann_ivf`: the scale path — an IVF (inverted-file) index: vectors are
  *   assigned to their nearest coarse centroid once, a query probes only
  *   `nprobe` cells, and top-k runs per probed cell then merges. Probing
  *   all cells degenerates to exact brute force — AnnSpec asserts that
  *   equivalence and reports recall at partial probes. No SQL oracle.
  * - `dedup_embedding`: exact cosine near-dup pairs (θ ≥ 0.45). Exact
  *   pair generation is inherently O(n²); it is expressed as a broadcast
  *   self-join so partitions stream independently. At 100 TB the exact
  *   path is what you run WITHIN an IVF/LSH cell (see `ann_ivf`), never
  *   globally — the oracle checks the global answer at test SF.
  */
object Ann {

  val K = 10

  /** Deterministic small query workload: every 100th vector. */
  private def queriesOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))

  def annTopk(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("v"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("c").desc, col("neighbor_id"))
    broadcast(queriesOf(embeddings(s, d)))
      .join(emb, col("qid") =!= col("neighbor_id"))
      .withColumn("c", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  def annTopkOracle: String = s"""
    WITH q AS (
      SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS c
      FROM q JOIN embeddings e ON e.vec_id <> q.qid),
    ranked AS (
      SELECT qid, neighbor_id,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
    SELECT qid AS query_id, rank, neighbor_id
    FROM ranked WHERE rank <= $K"""

  // ------------------------------------------------------------------ IVF

  val Cells = 16

  /** Coarse quantizer: deterministic seed cells (vec_id mod Cells) refined
    * by one averaging step — a single k-means iteration. Computed as a
    * per-dimension avg after posexplode, so the shuffle carries partial
    * (cell, dim) sums — never whole vectors — and only Cells centroid rows
    * leave the aggregation (they return to the executors broadcast). */
  def centroids(emb: DataFrame): DataFrame =
    emb.select((col("vec_id") % Cells).as("cell"),
        posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
      .select(col("cell"),
        normalize(transform(col("dims"), _.getField("m"))).as("centroid"))

  /** Assign every vector to its argmax-cosine centroid; the assignment
    * join is a broadcast of Cells rows. */
  def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .join(broadcast(cents))
      .withColumn("score", cosine(col("v"), col("centroid")))
      .groupBy(col("vec_id"), col("v"))
      .agg(max_by(col("cell"), struct(col("score"), -col("cell"))).as("cell"))

  /** IVF search: probe the `nprobe` best cells per query, exact top-k
    * inside the probed cells only. nprobe = Cells ⇒ identical to brute
    * force (AnnSpec asserts this). */
  def ivfTopk(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb   = embeddings(s, d)
    val cents = centroids(emb)
    val index = assign(emb, cents) // (vec_id, v, cell)
    val probe = Window.partitionBy(col("qid")).orderBy(col("cscore").desc, col("cell"))
    val probed = queriesOf(emb)
      .join(broadcast(cents))
      .withColumn("cscore", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(probe))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("neighbor_id"))
    probed
      .join(index.withColumnRenamed("vec_id", "neighbor_id"), Seq("cell"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("c", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** Registered `ann_ivf` runs a partial probe (the honest scale config). */
  def annIvf(s: SparkSession, d: String): DataFrame = ivfTopk(s, d, nprobe = 4)

  // ----------------------------------------------------- embedding dedup

  val DupThreshold = 0.45

  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val a = emb.select(col("vec_id").as("id_a"), toDouble(col("embedding")).as("va"))
    val b = emb.select(col("vec_id").as("id_b"), toDouble(col("embedding")).as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= DupThreshold)
      .select(col("id_a"), col("id_b"))
  }

  def dedupEmbeddingOracle: String = s"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
            list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
            list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= $DupThreshold"""
}
