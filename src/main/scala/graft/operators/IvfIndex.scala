package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, search many — the production shape of
  * `ann_ivf` (which rebuilds per query for the oracle contract).
  *
  * The index parquet is PARTITIONED BY cell, so a probe of `nprobe` cells
  * scans only those partitions — at 100 TB the search cost is
  * nprobe/Cells of the corpus, enforced by partition pruning in the scan
  * (IvfIndexSpec pins the PartitionFilters in the plan). Centroids
  * persist alongside as a Cells-row parquet; search collects the probed
  * cell ids (bounded by Cells, metadata-sized) so the index filter is a
  * literal IN that the datasource prunes on.
  */
final class IvfIndex private (spark: SparkSession, dir: String) {

  lazy val centroids: Array[(Int, Array[Double])] =
    spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  def index: DataFrame = spark.read.parquet(s"$dir/index")

  /** Incremental maintenance: assign NEW vectors with the EXISTING
    * quantizer and append their rows to the cell partitions. The
    * centroids — and therefore partition pruning — are unchanged, so
    * searches immediately see old ∪ new; standard IVF practice retrains
    * the quantizer only on a full rebuild (cell balance drifts as the
    * distribution does, recall does not break). */
  def append(newEmb: DataFrame): Unit =
    IvfIndex.writeAssignments(newEmb, centroids, dir,
      org.apache.spark.sql.SaveMode.Append)

  /** Top-k neighbors for (qid, qv double-array) queries over the probed
    * cells only. */
  def search(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = queries
      .select(col("qid"), col("qv"),
        explode(IvfIndex.probeCellsExpr(col("qv"), centroids, nprobe)).as("cell"))
      .localCheckpoint() // evaluated by the cells collect AND the join — once
    // bounded by Cells — metadata, like the centroids themselves
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val pruned = index.filter(col("cell").isin(cells: _*))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("neighbor_id"))
    broadcast(probed)
      .join(pruned, Seq("cell"))
      .filter(col("qid") =!= col("neighbor_id"))
      .withColumn("c", dot(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }
}

object IvfIndex {

  private[operators] def probeCellsExpr(
      v: org.apache.spark.sql.Column,
      cents: Array[(Int, Array[Double])], nprobe: Int) =
    Ann.probeCells(v, cents, nprobe)

  /** Normalize + assign a (vec_id, embedding) frame and write the rows
    * into the cell-partitioned index parquet. */
  private[operators] def writeAssignments(
      emb: DataFrame, cents: Array[(Int, Array[Double])],
      indexDir: String, mode: SaveMode): Unit =
    emb
      .select(col("vec_id"), normalize(toDouble(col("embedding"))).as("nv"))
      .repartition(col("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("nv"),
        Ann.assignCell(col("nv"), cents).as("cell"))
      .write.mode(mode).partitionBy("cell").parquet(s"$indexDir/index")

  /** Build the index from the testdata embeddings table. */
  def build(s: SparkSession, sfDir: String, indexDir: String): IvfIndex =
    buildFrom(graft.Tables.embeddings(s, sfDir), indexDir,
      Ann.cachedCentroids(s, sfDir))

  /** Build from an ARBITRARY (vec_id, embedding) frame: train the
    * quantizer (bounded strided subsample), assign every vector, write
    * the assignment partitioned by cell + the centroid table. */
  def buildFrom(emb: DataFrame, indexDir: String): IvfIndex =
    buildFrom(emb, indexDir, Ann.trainCentroids(emb))

  def buildFrom(emb: DataFrame, indexDir: String,
                cents: Array[(Int, Array[Double])]): IvfIndex = {
    val s = emb.sparkSession
    writeAssignments(emb, cents, indexDir, SaveMode.Overwrite)
    import s.implicits._
    cents.map { case (c, v) => (c, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centroids")
    load(s, indexDir)
  }

  def load(s: SparkSession, indexDir: String): IvfIndex = new IvfIndex(s, indexDir)
}
