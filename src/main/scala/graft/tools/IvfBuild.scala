package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sim.Similarity

/** Offline IVF index lifecycle — build ONCE, probe MANY:
  *
  *  - `build`: Lloyd-train centroids over the embeddings table, persist
  *    the matrix (parquet rows — bit-exact doubles, see
  *    `Similarity.saveCentroids`) and the assigned index as a
  *    CELL-BUCKETED parquet table at `<outDir>/index`. The bucketing is
  *    the scale contract: probes bucket-prune to their nprobe cells
  *    (`SelectedBucketsCount n out of B` in the scan) and any cell-keyed
  *    join/agg consumes the hash distribution with no index-side
  *    exchange — SimilaritySpec asserts both plan properties.
  *  - `probe`: a NEW session reopens the persisted files by re-issuing
  *    the bucketed-table DDL (`CLUSTERED BY (cell) INTO n BUCKETS` +
  *    LOCATION — the bucket spec lives in the catalog, not the files, so
  *    re-registration is what restores pruning), reloads the centroids,
  *    and serves top-k with ZERO assignment work at query time.
  *
  * Cost model (PLANS.md): the build pays `iterations + 1` corpus scans +
  * one bucketed write, all amortized; each probe then reads only
  * `nprobe / C` of the corpus. Recomputing assignment per query session —
  * what `ivfTopKWith` does for the oracle-checked q43 — costs a full scan
  * per session, which is the right trade only for one-shot queries.
  *
  * Usage:
  *   runMain graft.tools.IvfBuild build <sfDir> <outDir> [C=16] [iters=2] [buckets=8]
  *   runMain graft.tools.IvfBuild probe <sfDir> <outDir> [nprobe=2] [k=3] [buckets=8]
  */
object IvfBuild {

  /** Catalog name for the index at `outDir` — path-derived (see
    * [[Catalog.pathTable]]) so two indexes built/opened in one session or
    * metastore register as DISTINCT tables instead of the second
    * `DROP TABLE IF EXISTS` clobbering the first's registration.
    */
  def tableName(outDir: String): String = Catalog.pathTable("graft_ivf", outDir)

  /** Train + persist centroids and the cell-bucketed index table.
    * Returns the trained matrix (the spec asserts round-trip fidelity).
    */
  def build(spark: SparkSession, sfDir: String, outDir: String,
            centroids: Int = 16, iterations: Int = 2,
            buckets: Int = 8): Array[Array[Double]] = {
    val emb = Tables.embeddings(spark, sfDir)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    // engine-exact trainer (VERDICT r12 #1): snapped Lloyd steps are
    // bit-identical across runs/partitionings, so rebuilding an index
    // reproduces the SAME quantizer — the retired fp-mean trainer could
    // flip argmax cells between builds in the last ulps
    val cents = Similarity.trainCentroidsExactMatrix(emb, "vec_id",
      "embedding", dims, centroids, iterations)
    Similarity.saveCentroids(spark, cents, s"$outDir/centroids.parquet")
    val table = tableName(outDir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
      .write.bucketBy(buckets, "cell").sortBy("cell")
      .option("path", s"$outDir/index")
      .format("parquet").mode("overwrite").saveAsTable(table)
    cents
  }

  /** Re-register the persisted index files as an external bucketed table
    * and return the reopened frame. Safe to call in a fresh session: the
    * DDL (not the parquet footers) is what carries the bucket spec.
    */
  def openIndex(spark: SparkSession, outDir: String,
                buckets: Int = 8): DataFrame = {
    val table = tableName(outDir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""
      CREATE TABLE $table
        (vec_id BIGINT, v ARRAY<DOUBLE>, vn DOUBLE,
         ccos ARRAY<DOUBLE>, cell INT)
      USING parquet
      CLUSTERED BY (cell) SORTED BY (cell) INTO $buckets BUCKETS
      LOCATION '$outDir/index'""")
    spark.table(table)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: IvfBuild build|probe <sfDir> <outDir> ...")
    val (mode, sfDir, outDir) = (args(0), args(1), args(2))
    def arg(i: Int, dflt: Int) = if (args.length > i) args(i).toInt else dflt
    val spark = ToolSession.local()
    mode match {
      case "build" =>
        val t0 = System.nanoTime()
        val cents = build(spark, sfDir, outDir,
          centroids = arg(3, 16), iterations = arg(4, 2), buckets = arg(5, 8))
        println(f"[ivf] built ${cents.length} centroids x ${cents.head.length} dims " +
          f"+ bucketed index at $outDir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "probe" =>
        val t0 = System.nanoTime()
        val index = openIndex(spark, outDir, buckets = arg(5, 8))
        val hits = Similarity.ivfProbe(index, nprobe = arg(3, 2), k = arg(4, 3),
          queryPred = col("vec_id") % 10 === 0)
        val n = hits.count()
        println(f"[ivf] probe served $n top-k rows from the reopened index " +
          f"in ${(System.nanoTime() - t0) / 1e9}%.1f s (zero assignment work)")
        hits.orderBy(col("query_id"), col("rank")).show(9, truncate = false)
      case other => sys.error(s"unknown mode $other (build|probe)")
    }
    spark.stop()
  }
}
