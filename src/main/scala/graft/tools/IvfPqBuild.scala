package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sim.Similarity

/** Offline IVF-PQ index lifecycle — the [[IvfBuild]] analog for the
  * IVFADC serving path (VERDICT r11 #2). The r11 scale study measured
  * WHY this tool exists: the one-shot `ivfPqTopK` is build-dominated
  * (the N·K assignment + PQ encode is 32.0 s of the 35.8 s ×100 run),
  * while serving 80 queries on a PREBUILT index is 0.62/0.70/1.05 s
  * across ×1/×10/×100 — near-flat over 100× corpus growth (SCALE.md
  * §4). What a deployment therefore persists is exactly this split:
  *
  *  - `build`: materialize [[Similarity.ivfPqIndex]] — (vec_id, cell,
  *    subspace, code), m·log2(ksub) bits + a cell id per vector — as a
  *    CELL-BUCKETED parquet table (probes bucket-prune to their nprobe
  *    cells; cell-keyed work consumes the hash distribution with no
  *    index-side exchange), plus BOTH codebooks (coarse centroids and
  *    the m×ksub PQ sub-codebooks) and a params row, so the artifact is
  *    self-describing.
  *  - `probe`: a NEW session re-registers the bucketed DDL (the bucket
  *    spec lives in the catalog, not the files — the IvfBuild lesson),
  *    loads BOTH codebooks from the artifact, and serves external
  *    raw-vector queries through [[Similarity.ivfPqProbe]] with zero
  *    corpus-side assignment or encode work at query time.
  *
  * SimilaritySpec pins: reopened-probe parity against the one-shot
  * `ivfPqTopK` (same micro-snapped ADC sums, same tie-breaks), bucket
  * pruning on the reopened table (`SelectedBucketsCount`), exchange-free
  * cell aggregation, and codebook round-trip bit-exactness.
  *
  * Usage:
  *   runMain graft.tools.IvfPqBuild build <sfDir> <outDir> [m=8] [ksub=16] [C=16] [buckets=8]
  *   runMain graft.tools.IvfPqBuild probe <sfDir> <outDir> [nprobe=2] [k=3] [reps=1]
  *   runMain graft.tools.IvfPqBuild serve <reqDir> <outDir> [nprobe=2] [k=3]
  *
  * Measured at ×100 (200k vectors, C=512, m=8 — SCALE.md §10): build
  * 27.8 s one-off; fresh-session first serve 10.3 s (SparkSession +
  * kernel codegen + artifact open — the F4 compile term, paid once per
  * serving process); steady-state 2.2–2.6 s per 80-query batch, each
  * rep re-opening the artifact end to end — 12× under even the
  * fixed-workload exhaustive ADC scan (29.3 s, §4), 160× under the
  * registered q158 shape.
  */
object IvfPqBuild {

  def tableName(outDir: String): String =
    Catalog.pathTable("graft_ivfpq", outDir)

  /** PQ sub-codebook rows (subspace, code, vector) from the shared
    * formula quantizer — persisted so the artifact carries its own
    * codebooks; [[loadPqCodebook]] is the read side.
    */
  private def pqCodebookRows(m: Int, ksub: Int, dsub: Int): Seq[(Int, Int, Seq[Double])] =
    for (s <- 0 until m; c <- 0 until ksub)
      yield (s, c, Similarity.pqCentroidVec(s, c, dsub).toSeq)

  def loadPqCodebook(spark: SparkSession, outDir: String): Map[(Int, Int), Array[Double]] =
    spark.read.parquet(s"$outDir/pq_codebook.parquet")
      .select(col("subspace"), col("code"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
      .toMap

  case class Params(dims: Int, m: Int, ksub: Int, centroids: Int, buckets: Int)

  def loadParams(spark: SparkSession, outDir: String): Params = {
    val r = spark.read.parquet(s"$outDir/params.parquet").head()
    Params(r.getAs[Int]("dims"), r.getAs[Int]("m"), r.getAs[Int]("ksub"),
      r.getAs[Int]("centroids"), r.getAs[Int]("buckets"))
  }

  /** Encode + persist: bucketed code table, coarse centroids, PQ
    * codebooks, params. Returns the row count written.
    */
  def build(spark: SparkSession, sfDir: String, outDir: String,
            m: Int = 8, ksub: Int = 16, centroids: Int = 16,
            buckets: Int = 8): Long = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val table = tableName(outDir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.ivfPqIndex(emb, "vec_id", "embedding", dims, m, ksub, centroids)
      .write.bucketBy(buckets, "cell").sortBy("cell")
      .option("path", s"$outDir/index")
      .format("parquet").mode("overwrite").saveAsTable(table)
    val cents = (0 until centroids)
      .map(c => Similarity.centroidVec(c, dims)).toArray
    Similarity.saveCentroids(spark, cents, s"$outDir/centroids.parquet")
    pqCodebookRows(m, ksub, dims / m).toDF("subspace", "code", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/pq_codebook.parquet")
    Seq((dims, m, ksub, centroids, buckets))
      .toDF("dims", "m", "ksub", "centroids", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/params.parquet")
    spark.table(table).count()
  }

  /** Re-register the persisted code files as an external bucketed table
    * (fresh-session safe; DDL carries the bucket spec).
    */
  def openIndex(spark: SparkSession, outDir: String): DataFrame = {
    val p = loadParams(spark, outDir)
    val table = tableName(outDir)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""
      CREATE TABLE $table
        (vec_id BIGINT, cell INT, subspace INT, code INT)
      USING parquet
      CLUSTERED BY (cell) SORTED BY (cell) INTO ${p.buckets} BUCKETS
      LOCATION '$outDir/index'""")
    spark.table(table)
  }

  /** Serve top-k for `queries` from the persisted artifact: reopened
    * bucketed codes + loaded codebooks, through [[Similarity.ivfPqProbe]].
    */
  def probe(spark: SparkSession, outDir: String, queries: DataFrame,
            idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    val p = loadParams(spark, outDir)
    val index = openIndex(spark, outDir)
    val cents = Similarity.loadCentroids(spark, s"$outDir/centroids.parquet")
    val pqCb = loadPqCodebook(spark, outDir)
    Similarity.ivfPqProbe(index, queries, idCol, vecCol,
      p.dims, p.m, p.ksub, p.centroids, nprobe, k,
      coarseCodebook = Some(cents),
      pqCodebook = Some((s, c) => pqCb((s, c))))
  }

  /** WARM PROBE SERVER (VERDICT r12 #4 — §10's own lesson applied: the
    * cold/steady split showed a probe server must be a warm process,
    * so here is the warm process). Opens the artifact ONCE — bucketed
    * DDL, both codebooks, params — then answers query batches in a
    * loop: a request is a parquet directory of (idCol, vecCol) rows
    * dropped under `reqDir/in/<name>`, its answer lands at
    * `reqDir/out/<name>` (top-k rows, the [[probe]] schema). A request
    * is only picked up once its `_SUCCESS` marker exists (writers drop
    * atomically-finished parquet dirs, the file-source staging rule),
    * and is considered answered when the output's `_SUCCESS` exists —
    * so a killed server resumes by re-answering only the unanswered.
    * The loop exits once `reqDir/stop` exists AND nothing is pending.
    * Returns the number of batches served.
    *
    * Per batch the work is query-side only (cell ranking + m·ksub
    * distance tables) plus the bucket-pruned ADC join — the artifact
    * is NOT re-opened per batch, which is exactly the §10 delta: the
    * 2.1–3.0 s steady-state there included a full re-open each rep.
    */
  def serve(spark: SparkSession, outDir: String, reqDir: String,
            idCol: String, vecCol: String, nprobe: Int, k: Int,
            pollMs: Long = 200L): Int = {
    val p = loadParams(spark, outDir)
    // the warm server PINS the code table in executor memory (m·log2
    // (ksub) bits + a cell id per vector — ~30 MB at ×100; a cluster
    // serving tier holds it partitioned the same way) and materializes
    // it BEFORE the loop, so steady batches scan memory, not parquet.
    // The cache preserves the sortBy(cell) clustering, so the probed-
    // cell filter still prunes at cached-batch granularity.
    val index = openIndex(spark, outDir).persist()
    index.count()
    val cents = Similarity.loadCentroids(spark, s"$outDir/centroids.parquet")
    val pqCb = loadPqCodebook(spark, outDir)
    val fs = new org.apache.hadoop.fs.Path(reqDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val inDir = new org.apache.hadoop.fs.Path(s"$reqDir/in")
    def done(name: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$reqDir/out/$name/_SUCCESS"))
    def ready(d: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS"))
    var served = 0
    var stop = false
    while (!stop) {
      val pending =
        if (!fs.exists(inDir)) Array.empty[org.apache.hadoop.fs.Path]
        else fs.listStatus(inDir).filter(_.isDirectory).map(_.getPath)
          .filter(d => ready(d) && !done(d.getName)).sortBy(_.getName)
      pending.foreach { d =>
        val t0 = System.nanoTime()
        val queries = spark.read.parquet(d.toString)
        Similarity.ivfPqProbe(index, queries, idCol, vecCol,
            p.dims, p.m, p.ksub, p.centroids, nprobe, k,
            coarseCodebook = Some(cents),
            pqCodebook = Some((s, c) => pqCb((s, c))))
          .write.mode("overwrite").parquet(s"$reqDir/out/${d.getName}")
        served += 1
        println(f"[ivfpq] served batch '${d.getName}' in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (warm, no re-open)")
      }
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$reqDir/stop"))
          && pending.isEmpty) stop = true
      else if (pending.isEmpty) Thread.sleep(pollMs)
    }
    served
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: IvfPqBuild build|probe <sfDir> <outDir> ... | serve <reqDir> <outDir> [nprobe] [k]")
    val (mode, sfDir, outDir) = (args(0), args(1), args(2))
    def arg(i: Int, dflt: Int) = if (args.length > i) args(i).toInt else dflt
    val spark = ToolSession.local()
    mode match {
      case "build" =>
        val t0 = System.nanoTime()
        val n = build(spark, sfDir, outDir, m = arg(3, 8), ksub = arg(4, 16),
          centroids = arg(5, 16), buckets = arg(6, 8))
        println(f"[ivfpq] built $n code rows + codebooks at $outDir " +
          f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "probe" =>
        // reps > 1 separates the one-off session costs (DDL, codebook
        // load, kernel codegen — the F4 compile term, paid once per
        // serving process) from steady-state serve latency: a deployed
        // probe server is a warm JVM, not a fresh one per query batch
        val reps = arg(5, 1)
        val queries = Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 25 === 0 &&
            col("vec_id") < graft.tools.ScaleGen.IdStride)
        for (r <- 1 to reps) {
          val t0 = System.nanoTime()
          val hits = probe(spark, outDir, queries, "vec_id", "embedding",
            nprobe = arg(3, 2), k = arg(4, 3))
          val n = hits.count()
          println(f"[ivfpq] serve $r/$reps: $n top-k rows from the reopened " +
            f"index in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
            "(zero assignment/encode work)")
        }
      case "serve" =>
        // args: serve <reqDir> <outDir> [nprobe=2] [k=3] — sfDir slot
        // carries the request dir (the artifact is self-describing, no
        // source table is read)
        val n = serve(spark, outDir, reqDir = sfDir, idCol = "vec_id",
          vecCol = "embedding", nprobe = arg(3, 2), k = arg(4, 3))
        println(s"[ivfpq] serve loop drained: $n batches answered")
      case "servespot" =>
        // measurement harness for the warm loop (SCALE.md §10): carve
        // [batches] disjoint 80-query request batches out of sfDir's
        // ORIGINAL vectors (the probe-mode query rule per remainder),
        // drop them with a stop marker, and run ONE warm serve loop —
        // per-batch wall prints from serve(); the first batch carries
        // the one-off codegen, the rest are the steady-state number
        val reqDir = s"$outDir/servespot_req"
        val nb = arg(3, 6)
        val queries = Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") < graft.tools.ScaleGen.IdStride)
        val fs = new org.apache.hadoop.fs.Path(reqDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(reqDir), true)
        for (i <- 0 until nb)
          queries.filter(col("vec_id") % 25 === i)
            .write.mode("overwrite").parquet(s"$reqDir/in/b$i")
        fs.create(new org.apache.hadoop.fs.Path(s"$reqDir/stop")).close()
        val t0 = System.nanoTime()
        val n = serve(spark, outDir, reqDir, "vec_id", "embedding",
          nprobe = arg(4, 2), k = arg(5, 3))
        println(f"[ivfpq] servespot: $n batches, total wall " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (first batch carries codegen)")
      case other => sys.error(s"unknown mode $other (build|probe|serve|servespot)")
    }
    spark.stop()
  }
}
