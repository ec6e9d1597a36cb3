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

  /** Build the index from an embeddings table: train the quantizer
    * (strided subsample), assign every vector, write the assignment
    * partitioned by cell + the centroid table. */
  def build(s: SparkSession, sfDir: String, indexDir: String): IvfIndex = {
    val cents = Ann.cachedCentroids(s, sfDir)
    import graft.Tables
    val nemb = Tables.embeddings(s, sfDir)
      .select(col("vec_id"), normalize(toDouble(col("embedding"))).as("nv"))
      .repartition(col("vec_id"))
    nemb
      .select(col("vec_id").as("neighbor_id"), col("nv"),
        Ann.assignCell(col("nv"), cents).as("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$indexDir/index")
    import s.implicits._
    cents.map { case (c, v) => (c, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/centroids")
    load(s, indexDir)
  }

  def load(s: SparkSession, indexDir: String): IvfIndex = new IvfIndex(s, indexDir)
}
