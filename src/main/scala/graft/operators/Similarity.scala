package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteTopK]] — exact cosine top-k; the query side is broadcast, so
  *    the scan side streams once with no shuffle until the per-query
  *    top-k aggregation. Correctness baseline at any scale where
  *    |queries| is broadcastable.
  *  - [[lshTopK]] — random-hyperplane LSH: both sides bucketed by sign
  *    bands; the join touches only same-band candidates, trading recall for
  *    a large constant-factor scan reduction. The 100 TB path (an IVF
  *    variant would replace the hash with k-means cells; same join shape).
  */
object Similarity {

  /** Exact top-k neighbors per query vector (queries ⊂ corpus, given as a
    * DataFrame of (query_id, query_vec)). Ranking uses the decimal-snapped
    * cosine with doc-id tie-break, so results are totally ordered. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.withColumn("nrm", norm(col("embedding")))
    val q = queries.withColumn("qnrm", norm(col("query_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSnappedPre(
        col("query_vec"), col("embedding"), col("qnrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Majority-label kNN classification over ANY neighbor frame — the
    * standard downstream consumer of a similarity index (label propagation
    * / weak annotation over an embedded corpus). `neighbors` is the output
    * contract of [[bruteTopK]]/[[lshTopK]]/[[ivfTopK]]/[[ivfTopKFromIndex]]
    * (query_id, rank, vec_id, cos), so the exact baseline and every
    * approximate index compose with the same vote: join each neighbor's
    * label, count votes per (query, label), keep the plurality winner —
    * ties broken toward the SMALLEST label id so the result is total. One
    * equi-join (neighbor set is k·|queries| rows — tiny next to the corpus)
    * plus one aggregation; the per-query vote never shuffles the corpus. */
  def knnClassify(neighbors: DataFrame, labels: DataFrame): DataFrame = {
    val votes = neighbors
      .join(labels.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Sign of dot(v, hyperplane_j) for nBits seeded random hyperplanes,
    * packed into band keys of `bandBits` bits each — one fused codegen
    * expression ([[graft.functions.HyperplaneBands]]; the per-plane
    * literal-array composition it replaces bloated the generated class
    * past janino's JIT at the ~500-bit tight-threshold band plans). Plane
    * values come from the same seeded Gaussian stream, so signatures are
    * bit-identical to the composed form. */
  private def hyperplaneBands(v: Column, dim: Int, nBits: Int, bandBits: Int,
      seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits * dim)(rnd.nextGaussian())
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HyperplaneBands(
        org.apache.spark.sql.graft.ColumnBridge.expression(v),
        planes, dim, bandBits))
  }

  /** LSH-bucketed ANN: candidates share ≥1 sign-band; exact cosine + top-k
    * on candidates only. Recall < 1 by design; verify against
    * [[bruteTopK]] on a sample. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 24, bandBits: Int = 3, seed: Long = 7L): DataFrame = {
    // band rows carry IDS ONLY: the candidate join and its distinct then
    // shuffle (id, band, key) tuples, not dim-wide vectors — the vectors
    // join back once per SURVIVING candidate (the embeddingNearDupsBanded
    // convention; distinct-ing rows that carry both embeddings multiplied
    // candidate-shuffle bytes by the vector width)
    val cB = corpus.select(col("vec_id"),
      posexplode(hyperplaneBands(col("embedding"), dim, nBits, bandBits,
        seed)).as(Seq("band", "key")))
    val qB = queries.select(col("query_id"),
      posexplode(hyperplaneBands(col("query_vec"), dim, nBits, bandBits,
        seed)).as(Seq("band", "key")))
    val cands = cB.join(qB, Seq("band", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
      .distinct()
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("query_vec"))),
        "query_id")
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("qnrm", norm(col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands
      .withColumn("cos", cosineSnappedPre(
        col("query_vec"), col("embedding"), col("qnrm"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  private def litVec(v: Array[Double]): Column = array(v.map(lit(_)): _*)

  /** cell-scored struct array: (dot, cellId) — array_max picks best cell. */
  private def cellStructs(v: Column, cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(dot(v, litVec(c)).as("s"), lit(i).as("c"))
    }: _*)

  /** cell-scored struct array under MIN-L2 assignment: argmin ‖v − c‖²
    * restated as argmax dot(v, c) − ‖c‖²/2 (the ‖v‖² term is
    * per-row-constant, so it cannot move the argmax). */
  private def cellStructsL2(v: Column, cents: Array[Array[Double]]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct((dot(v, litVec(c)) - lit(0.5 * c.map(x => x * x).sum)).as("s"),
        lit(i).as("c"))
    }: _*)

  /** Shared distributed Lloyd loop: `l2 = false` assigns by max dot
    * (spherical, the IVF metric), `l2 = true` by min L2 (the PQ
    * reconstruction metric). Mean update and deterministic first-k init
    * are common.
    *
    * The mean update accumulates in EXACT INTEGERS — each component is
    * snapped once to 1e-10 units with `floor(x · 1e10)` (one IEEE double
    * product + floor, bit-identical on any engine) and summed as LONG —
    * so training is BIT-DETERMINISTIC under any partitioning — a plain
    * `avg(double)` varies in the last ulp with partition order, and one
    * flipped ulp can flip a boundary vector's cell, cascading into
    * different centroids, assignments, and served neighbors on identical
    * data. Every derived artifact (IVF cells, PQ codebooks, diversity
    * strata) inherits layout-invariance from this, and the integer units
    * make the training loop RESTATABLE IN ORACLE SQL (the earlier
    * DECIMAL(28,10) accumulator was not: a float component can terminate
    * exactly at the scale-10 tie digit — e.g. -0.27392578125, observed in
    * the gate corpus — where Spark's HALF_UP and DuckDB's rounding
    * disagree; floor has no tie boundary). Overflow margin: |x| ≤ 8 →
    * ≤ 8e10 units/component; 2^63 admits > 10^8 rows per (cell, dim)
    * partial — and the LONG sum is exact as a double up to 2^53 units
    * (9e5 rows at this magnitude); cells larger than that need a
    * pre-aggregated sample anyway (see [[trainIvfCentroids]]). Measured
    * cost on the gate corpus: ~0.4-1.0 s per inline-training query (3-run
    * medians) — bit-determinism of a persisted index is worth more than
    * the ulp. */
  private def lloyd(corpus: DataFrame, k: Int, iterations: Int,
      l2: Boolean): Array[Array[Double]] = {
    // element-type tolerant: every vector path accepts float OR double
    // arrays (the codegen expressions validate both); hard-coding
    // getSeq[Float] would CCE on array<double> embeddings at init only
    var centroids: Array[Array[Double]] = corpus
      .orderBy("vec_id").limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)

    for (_ <- 1 to iterations) {
      val structs =
        if (l2) cellStructsL2(col("embedding"), centroids)
        else cellStructs(col("embedding"), centroids)
      val assigned = corpus.withColumn("cell",
        array_max(structs).getField("c"))
      val updated = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(((sum(floor(col("x").cast("double") * 1e10)).cast("double") /
          count(lit(1))) / 1e10).as("m"))
        .collect().groupBy(_.getAs[Int]("cell"))
      centroids = centroids.indices.map { c =>
        updated.get(c) match {
          case Some(rows) =>
            rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m")).toArray
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  /** Distributed spherical-k-means training (Lloyd iterations). Centroids
    * are the only driver-side state (nCells × dim doubles, broadcast back
    * each iteration — the standard distributed k-means shape); assignment
    * and mean updates are DataFrame ops. Init is the first nCells vectors
    * by vec_id (deterministic). Train on a SAMPLE at scale — centroid
    * quality converges long before the full corpus is seen; assignment of
    * the full corpus happens once, in [[writeIvfIndex]]. */
  def trainIvfCentroids(corpus: DataFrame, nCells: Int = 16,
      iterations: Int = 3): Array[Array[Double]] =
    lloyd(corpus, nCells, iterations, l2 = false)

  /** Diversity-aware subsample: a UNIFORM per-cell quota over IVF cells —
    * the embedding-space stratified draw training pipelines use to keep
    * rare content regions represented (a plain Bernoulli/hash sample is
    * proportional, so a 0.1% region contributes 0.1% of the sample; this
    * draw gives every populated cell the same budget). Quota =
    * ⌈n / nCells⌉ rows per cell, picked in content-hash order so the
    * result is deterministic and append-stable like
    * [[Sampling.stratifiedQuota]] (and gets the same WindowGroupLimit
    * rank pushdown — no full per-cell sort materializes). Returns
    * (vec_id, cell, rn). Approximate in size: ≤ nCells·⌈n/nCells⌉, less
    * when cells are thin. */
  def diversitySample(corpus: DataFrame, n: Int, nCells: Int = 16,
      iterations: Int = 3): DataFrame = {
    val cents = trainIvfCentroids(corpus, nCells, iterations)
    val quota = (n + nCells - 1) / nCells
    val w = Window.partitionBy(col("cell"))
      .orderBy(graft.operators.Sampling.hashHex(col("vec_id")), col("vec_id"))
    assignCells(corpus, cents)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .select(col("vec_id"), col("cell"), col("rn"))
  }

  /** Corpus with its max-dot cell assignment and precomputed norm — the
    * row shape stored by [[writeIvfIndex]] and probed by the top-k join. */
  private def assignCells(corpus: DataFrame,
      centroids: Array[Array[Double]]): DataFrame =
    corpus.withColumn("cell",
        array_max(cellStructs(col("embedding"), centroids)).getField("c"))
      .withColumn("nrm", norm(col("embedding")))

  /** Queries exploded to their top-nProbe cells by centroid dot. */
  private def queryProbes(queries: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame =
    queries
      .withColumn("probes", slice(sort_array(
        cellStructs(col("query_vec"), centroids), asc = false), 1, nProbe))
      .select(col("query_id"), col("query_vec"),
        explode(col("probes")).as("p"))
      .select(col("query_id"), col("query_vec"), col("p.c").as("cell"))
      .withColumn("qnrm", norm(col("query_vec")))

  /** Exact cosine + per-query top-k over cell-equi-join candidates. */
  private def probeTopK(corpusCells: DataFrame, queryCells: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpusCells.join(queryCells, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineSnappedPre(
        col("query_vec"), col("embedding"), col("qnrm"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** IVF probe against an in-memory corpus with caller-supplied centroids —
    * the shared core of [[ivfTopK]] (inline) and the persisted-index path
    * ([[ivfTopKFromIndex]]); identical output for identical centroids. */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
      centroids: Array[Array[Double]], k: Int, nProbe: Int = 4): DataFrame =
    probeTopK(assignCells(corpus, centroids),
      queryProbes(queries, centroids, nProbe), k)

  /** IVF (inverted-file) ANN — train + assign + probe in one call: a query
    * probes only its `nProbe` best of `nCells` k-means cells, so the
    * exact-cosine work drops to ~nProbe/nCells of the corpus. This inline
    * form re-trains and re-assigns per call — fine as a query shape at
    * test scale; at 100 TB build the index ONCE with [[writeIvfIndex]]
    * (train on a sample, persist centroids + cell-partitioned assignments)
    * and serve queries with [[ivfTopKFromIndex]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, iterations: Int = 3): DataFrame =
    ivfTopKWithCentroids(corpus, queries,
      trainIvfCentroids(corpus, nCells, iterations), k, nProbe)

  /** Build and persist the IVF index — the once-per-corpus pass of the
    * 100 TB ANN pipeline (mirror of [[Dedup.writeMinhashSignatures]]):
    * `path/centroids` holds the nCells × dim model; `path/assignments`
    * holds (vec_id, embedding, nrm) PARTITIONED BY cell, so a probe reads
    * only the nProbe probed cell partitions from storage — the IVF scan
    * reduction happens at the parquet-pruning layer, not post-scan.
    * Training runs on a `trainFraction` sample (centroid quality needs a
    * sample, full-corpus assignment happens exactly once here); pass
    * `centroids` to skip training and index under an existing model. */
  def writeIvfIndex(corpus: DataFrame, path: String, nCells: Int = 16,
      iterations: Int = 3, trainFraction: Double = 1.0, seed: Long = 42L,
      centroids: Option[Array[Array[Double]]] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // train FIRST: Lloyd is the failure-prone phase, and an interrupted
    // rebuild must leave the standing index serveable. The destructive
    // phase (model overwrite + assignments truncation + rewrite) cannot
    // be atomic across two subtrees, and a crash inside it would pair a
    // new model with stale rows — a SILENTLY-wrong index. The rebuild
    // marker converts that window to a loud failure: readers and appends
    // refuse while it exists, and only the completed rebuild removes it.
    val cents = centroids.getOrElse {
      val trainSet =
        if (trainFraction >= 1.0) corpus
        else corpus.sample(withReplacement = false, trainFraction, seed)
      trainIvfCentroids(trainSet, nCells, iterations)
    }
    withRebuildMarker(spark, path) {
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      deleteSubtree(spark, s"$path/assignments")
      writeIvfAssignments(corpus, path, cents, batchId = 0L)
    }
  }

  private def writeIvfAssignments(corpus: DataFrame, path: String,
      cents: Array[Array[Double]], batchId: Long): Unit =
    assignCells(corpus, cents)
      .select(col("cell"), col("vec_id"), col("embedding"), col("nrm"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assignments/batch_id=$batchId")

  private val RebuildMarker = "_REBUILD_IN_PROGRESS"

  /** Run the destructive phase of an index rebuild under a marker file:
    * present ⇒ the model and the row artifact may be from DIFFERENT
    * builds, so [[requireNotRebuilding]] fails serving/appends loud
    * instead of letting a crash window serve silently-wrong neighbors.
    * The marker is removed only when the phase completes. */
  private def withRebuildMarker(spark: org.apache.spark.sql.SparkSession,
      path: String)(body: => Unit): Unit = {
    val m = new org.apache.hadoop.fs.Path(path, RebuildMarker)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(m, true).close()
    body
    fs.delete(m, false)
  }

  /** Loud-failure guard for a crashed rebuild (see [[withRebuildMarker]]). */
  private def requireNotRebuilding(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val m = new org.apache.hadoop.fs.Path(path, RebuildMarker)
    if (m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m))
      throw new IllegalStateException(
        s"index at $path has an interrupted rebuild (marker $RebuildMarker)" +
          " — its model and rows may disagree; rerun the rebuild")
  }

  /** Delete an artifact subtree, FAILING when the filesystem declines —
    * a swallowed false return would leave stale batch dirs serving next
    * to the fresh rebuild. */
  private def deleteSubtree(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      require(fs.delete(p, true), s"failed to delete $path during rebuild")
  }

  /** The persisted centroid model, driver-side (nCells × dim — tiny). */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    requireNotRebuilding(spark, path)
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell").select("centroid").collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** Fold a corpus batch into an EXISTING IVF index — the
    * [[graft.operators.TextScoring.appendTextIndex]] lifecycle for ANN:
    * new rows are assigned under the index's FROZEN centroid model and
    * land in their own `batch_id=N` dir (cell partitions nested inside,
    * so probed-cell pruning spans every batch), overwritten on replay.
    * Per-append cost is O(|batch|), never O(|corpus|) — no retraining, no
    * re-assignment of standing rows, and the serve path
    * ([[ivfTopKFromIndex]]) is unchanged.
    *
    * The price of the frozen model is DRIFT: as appended data moves away
    * from the trained distribution, cells get lopsided and probed-cell
    * candidate quality decays — the index still returns exact cosines
    * over the candidates it reads, but recall vs the true top-k sags.
    * Probe it with [[ivfRecallProbe]] on a query sample after appending;
    * when recall drops below your floor, REBUILD ([[writeIvfIndex]]
    * retrains and re-assigns — this append refuses to run against a
    * legacy flat layout for the same reason the text index does). */
  def appendIvfIndex(corpus: DataFrame, path: String, batchId: Long): Unit = {
    val spark = corpus.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val aPath = new org.apache.hadoop.fs.Path(s"$path/assignments")
    val fs = aPath.getFileSystem(conf)
    if (fs.exists(aPath) &&
      fs.listStatus(aPath).exists(_.getPath.getName.startsWith("cell=")))
      throw new IllegalStateException(
        s"$path/assignments has a flat cell= layout (no batch_id level); " +
          "rebuild with writeIvfIndex before appending")
    writeIvfAssignments(corpus, path, loadIvfCentroids(spark, path), batchId)
  }

  /** Fold an appended ANN index's accumulated `batch_id=` dirs into one —
    * [[graft.operators.TextScoring.compactTextIndex]]'s maintenance
    * discipline for [[appendIvfIndex]]/[[appendPqIndex]] artifacts: at
    * scale the DIR COUNT, not bytes, becomes the listing cost of every
    * probe. Unlike the text index there is no stats subtree, so ONE
    * atomic rename is the whole commit — the manifest (at the index root,
    * `_compact_<sub>_manifest`) exists to make the post-rename original
    * deletes recoverable. `sub` is `"assignments"` (re-partitioned by
    * cell, preserving probe pruning) or `"codes"` (flat). Serving is
    * row-identical by construction. Prior compactions (id ≥
    * [[Retention.CompactIdBase]]) never re-fold; the newest small dir is
    * spared unless `assumeQuiesced`. Returns the new batch id, or None
    * when fewer than `minBatchDirs` foldable dirs exist. Run
    * [[recoverAnnCompaction]] (or this, which runs it first) before
    * serving after a crash. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      sub: String, minBatchDirs: Int = 2,
      assumeQuiesced: Boolean = false): Option[Long] = {
    require(sub == "assignments" || sub == "codes",
      s"sub must be 'assignments' or 'codes', got '$sub'")
    require(minBatchDirs >= 2, s"minBatchDirs must be >= 2, got $minBatchDirs")
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$path/$sub")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    recoverAnnCompaction(spark, path, sub)
    val allSt = fs.globStatus(new Path(root, "batch_id=*")).toSeq
      .flatMap(st => st.getPath.getName.stripPrefix("batch_id=")
        .toLongOption.map(_ -> st.getModificationTime))
      .sortBy(_._1)
    val all = allSt.map(_._1)
    val small0 = allSt.filter(_._1 < Retention.CompactIdBase)
    // spare the most recently MODIFIED small dir, not the max id — batch
    // ids are caller-assigned and need not be time-ordered (same
    // convention as Retention.compactRaw / compactTextIndex)
    val small =
      (if (assumeQuiesced || small0.isEmpty) small0
       else {
         val spare = small0.filter(_._2 == small0.map(_._2).max).maxBy(_._1)
         small0.filterNot(_._1 == spare._1)
       }).map(_._1)
    if (small.size < minBatchDirs) return None
    val newId = math.max(Retention.CompactIdBase, all.max + 1)
    val manifest = new Path(path, s"_compact_${sub}_manifest")
    val out = fs.create(manifest, true)
    out.write((newId +: small.map(id => s"batch_id=$id"))
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    val tmp = new Path(root, s".compact_tmp_$newId")
    val folded = spark.read.option("basePath", root.toString)
      .parquet(small.map(id => s"$root/batch_id=$id"): _*)
      .drop("batch_id")
    val w =
      if (sub == "assignments")
        folded.repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell")
      else folded.write.mode("overwrite")
    w.parquet(tmp.toString)
    // COMMIT POINT — one rename, atomic on a real filesystem
    require(fs.rename(tmp, new Path(root, s"batch_id=$newId")),
      s"compaction rename failed: $tmp")
    small.foreach(id => fs.delete(new Path(root, s"batch_id=$id"), true))
    fs.delete(manifest, false)
    Some(newId)
  }

  /** Finish or undo a crashed [[compactAnnIndex]]: the new dir having
    * landed means committed (→ delete the listed originals); otherwise
    * drop the temp. Manifest consumed either way; no-op without one. */
  def recoverAnnCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String, sub: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(path, s"_compact_${sub}_manifest")
    if (!fs.exists(manifest)) return
    val in = fs.open(manifest)
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    in.close()
    lines match {
      case idLine :: oldDirs if idLine.toLongOption.isDefined =>
        val newId = idLine.toLong
        if (fs.exists(new Path(s"$path/$sub/batch_id=$newId")))
          oldDirs.foreach(d => fs.delete(new Path(s"$path/$sub/$d"), true))
        else fs.delete(new Path(s"$path/$sub/.compact_tmp_$newId"), true)
      case _ => // unreadable manifest: nothing destructive without a plan
    }
    fs.delete(manifest, false)
  }

  /** Sampled recall-drift probe for a persisted IVF index: the fraction of
    * the EXACT top-k (computed over the index's own stored embeddings — no
    * external corpus needed) that the probed serve path reproduces,
    * averaged over `queries`. This is the rebuild signal for the
    * append-under-frozen-centroids lifecycle: run it on a query sample
    * after appends and rebuild when it crosses below your floor. Cost: one
    * exact pass over the assignments for |queries| broadcast rows — size
    * the sample, not the corpus. */
  def ivfRecallProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int = 10, nProbe: Int = 4): Double = {
    val corpus = spark.read.parquet(s"$path/assignments")
      .select("vec_id", "embedding")
    recallOverlap(bruteTopK(corpus, queries, k),
      ivfTopKFromIndex(spark, path, queries, k, nProbe))
  }

  /** Mean overlap of `served` with `exact` on (query_id, vec_id) — the
    * shared recall metric of the drift probes and the recall-floor specs. */
  private def recallOverlap(exact: DataFrame, served: DataFrame): Double = {
    val e = exact.select("query_id", "vec_id")
    val hit = e.join(served.select("query_id", "vec_id"),
      Seq("query_id", "vec_id")).count()
    val tot = e.count()
    if (tot == 0) 1.0 else hit.toDouble / tot
  }

  /** Serve ANN top-k from a persisted IVF index: centroids load
    * driver-side (nCells × dim — tiny), the probed-cell set is collected
    * (bounded by nCells, never by |queries|) and pushed into the
    * assignments scan as a static partition filter, so parquet reads only
    * the probed cells — across every appended batch. Identical output to
    * [[ivfTopKWithCentroids]] over the same corpus and centroids. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val centroids = loadIvfCentroids(spark, path)
    // materialize-once (r14 opt, the materialize-once-for-expensive-lineage
    // discipline): the probe table is consumed TWICE — the distinct-cell
    // collect below and the top-k join — and each consumer would otherwise
    // re-run the whole query pipeline (scan + nCells×dim centroid dots +
    // explode) as separate actions AQE cannot share. It is query-sized
    // (|queries|·nProbe rows), never corpus-scale, so the checkpoint is the
    // NARROW/TINY intermediate the discipline allows.
    val queryCells = queryProbes(queries, centroids, nProbe).localCheckpoint()
    // distinct probed cells ⊆ {0..nCells-1}: O(nCells) driver rows
    val probed = queryCells.select("cell").distinct().collect()
      .map(_.getInt(0))
    val assignments = spark.read.parquet(s"$path/assignments")
      .filter(col("cell").isin(probed.toSeq: _*))
    probeTopK(assignments, queryCells, k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold — brute
    * all-pairs baseline (broadcast-nested-loop on vec_id ordering). Exact
    * by construction; the spec yardstick for [[embeddingNearDups]]. NOT a
    * scale path: the nested loop broadcasts one full side. */
  def embeddingNearDupsBrute(corpus: DataFrame, threshold: Double): DataFrame = {
    val withNorm = corpus.withColumn("nrm", norm(col("embedding")))
    val a = withNorm.select(col("vec_id").as("vec_id_1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val b = withNorm.select(col("vec_id").as("vec_id_2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, col("vec_id_1") < col("vec_id_2"))
      .withColumn("cos", cosineSnappedPre(col("e1"), col("e2"), col("n1"), col("n2")))
      .filter(col("cos") >= threshold)
      .select("vec_id_1", "vec_id_2", "cos")
  }

  /** Exact all-pairs via BLOCK-partitioned self-join — the scale-correct
    * exhaustive shape: vectors hash into `blocks` blocks; the
    * blocks·(blocks+1)/2 unordered block pairs become equi-join keys, so
    * the n²/2 comparisons shard evenly across that many shuffle tasks and
    * an executor only ever materializes two blocks (~2·n/blocks rows) — no
    * broadcast of the corpus, no nested loop over the whole table, unlike
    * [[embeddingNearDupsBrute]]. Compute is still Ω(n²) (it is exact);
    * `blocks` sizes a block to executor memory: blocks ≈ n·rowBytes /
    * targetBlockBytes. Each cross-block pair materializes exactly once
    * (each vector sits on the side of its own block), so no distinct is
    * needed; same-block cells dedup by id order. */
  def embeddingNearDupsBlocked(corpus: DataFrame, threshold: Double,
      blocks: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val e = corpus.withColumn("nrm", norm(col("embedding")))
      .withColumn("blk", pmod(hash(col("vec_id")), lit(blocks)))
    val blockPairs = (for (i <- 0 until blocks; j <- i until blocks) yield (i, j))
      .toDF("b1", "b2")
    val left = e.join(broadcast(blockPairs), col("blk") === col("b1"))
      .select(col("b1"), col("b2"), col("vec_id").as("vec_id_1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
    val right = e.join(broadcast(blockPairs), col("blk") === col("b2"))
      .select(col("b1"), col("b2"), col("vec_id").as("vec_id_2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
    left.join(right, Seq("b1", "b2"))
      // same-block cells would emit both orders: keep one; cross-block
      // cells emit each pair exactly once (possibly id-reversed)
      .filter(col("b1") =!= col("b2") || col("vec_id_1") < col("vec_id_2"))
      .withColumn("cos", cosineSnappedPre(col("e1"), col("e2"), col("n1"), col("n2")))
      .filter(col("cos") >= threshold)
      .select(least(col("vec_id_1"), col("vec_id_2")).as("vec_id_1"),
        greatest(col("vec_id_1"), col("vec_id_2")).as("vec_id_2"), col("cos"))
  }

  /** Band count making the per-pair miss probability at `threshold` at most
    * `targetMiss` for `bandBits`-bit sign bands: a pair at cosine t collides
    * on one hyperplane bit with p1 = 1 - acos(t)/π, on a band with p1^bits,
    * and escapes all n bands with (1 - p1^bits)^n. */
  def bandCountFor(threshold: Double, bandBits: Int, targetMiss: Double = 1e-9): Int = {
    val p1 = 1.0 - math.acos(threshold) / math.Pi
    val pBand = math.pow(p1, bandBits)
    math.ceil(math.log(targetMiss) / math.log1p(-pBand)).toInt.max(1)
  }

  /** Probability that an ORTHOGONAL (pure-noise, cos ≈ 0) pair still lands
    * in some band under (bandBits, nBands): 1 − (1 − 2^−bits)^bands. This
    * is the banding plan's pruning power — near 1 means candidate
    * generation degenerates to all-pairs WITH band-multiplicity overhead
    * on top. */
  def noiseCandidateFraction(bandBits: Int, nBands: Int): Double =
    1.0 - math.pow(1.0 - math.pow(0.5, bandBits), nBands)

  /** Hyperplane-band candidate generation + exact-cosine verify — same
    * candidates→verify shape as [[Dedup.minhashNearDups]]. Band parameters
    * derive from the threshold so per-pair miss ≤ targetMiss (deterministic
    * given the seed); false candidates die in the exact verify, so band
    * tuning affects cost, never survivors. Prunes hard at tight thresholds
    * (t ≥ ~0.8); see [[embeddingNearDups]] for why it cannot prune at
    * loose ones. */
  def embeddingNearDupsBanded(corpus: DataFrame, threshold: Double, dim: Int = 64,
      bandBits: Int = 2, seed: Long = 7L): DataFrame = {
    val nBands = bandCountFor(threshold, bandBits)
    val banded = corpus.select(col("vec_id"),
      posexplode(hyperplaneBands(col("embedding"), dim, nBands * bandBits,
        bandBits, seed)).as(Seq("band", "key")))
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"))
      .distinct()
    val e = corpus.withColumn("nrm", norm(col("embedding")))
    cands
      .join(e.select(col("vec_id").as("vec_id_1"),
        col("embedding").as("e1"), col("nrm").as("n1")), "vec_id_1")
      .join(e.select(col("vec_id").as("vec_id_2"),
        col("embedding").as("e2"), col("nrm").as("n2")), "vec_id_2")
      .withColumn("cos", cosineSnappedPre(col("e1"), col("e2"), col("n1"), col("n2")))
      .filter(col("cos") >= threshold)
      .select("vec_id_1", "vec_id_2", "cos")
  }

  /** The cheapest (bandBits, nBands) sign-band plan whose per-pair miss at
    * `threshold` is ≤ targetMiss AND whose noise-pair candidate fraction is
    * ≤ maxNoiseFraction — i.e. a plan that actually PRUNES. None when no
    * such plan exists below the bits cap (the cap bounds hyperplane count:
    * bits × bands dot products per vector, all codegen'd literal arrays —
    * unbounded bits would bloat the generated code faster than it buys
    * selectivity). */
  def bandPlanFor(threshold: Double, targetMiss: Double = 1e-9,
      maxNoiseFraction: Double = 0.5, maxBits: Int = 8): Option[(Int, Int)] =
    (1 to maxBits).iterator
      .map(bits => (bits, bandCountFor(threshold, bits, targetMiss)))
      .find { case (bits, bands) =>
        noiseCandidateFraction(bits, bands) <= maxNoiseFraction
      }

  /** Embedding near-dup pairs above a cosine threshold — threshold-adaptive
    * candidate generation, exact verified output either way.
    *
    * Sign-LSH pruning power is the gap between the bit-agreement
    * probability at the threshold, p1(t) = 1 − acos(t)/π, and at
    * orthogonality (0.5). MEASURED on the synthetic embeddings at sf0.1
    * (2000 vecs, 2M pairs, 144 ≥ 0.45): at t = 0.45, p1 = 0.649, and every
    * feasible (bits, bands) family meeting miss ≤ 1e-9 leaves
    * [[noiseCandidateFraction]] ≈ 1 — all 2M pairs become candidates with
    * ~9.6 duplicate band rows each, making the banded plan 2.3× SLOWER
    * than exact all-pairs (9.4s vs 4.1s at sf0.1). The LSH exponent
    * ρ = ln p1(t) / ln 0.5 ≈ 0.62 says this is fundamental to the metric,
    * not a tuning problem. At t ≥ ~0.8 (the real near-dup regime,
    * p1 ≥ 0.795) the same family prunes the noise mass away.
    *
    * So: route by the derived plan's predicted pruning power
    * ([[bandPlanFor]]) — banded candidates when a pruning plan exists, the
    * block-partitioned exact join ([[embeddingNearDupsBlocked]]:
    * shuffle-sharded, broadcast-free, the scale-correct exhaustive shape)
    * when it does not. Both paths produce identical verified output. */
  def embeddingNearDups(corpus: DataFrame, threshold: Double, dim: Int = 64,
      seed: Long = 7L, blocks: Int = 16): DataFrame =
    bandPlanFor(threshold) match {
      case Some((bits, _)) =>
        embeddingNearDupsBanded(corpus, threshold, dim, bits, seed)
      case None =>
        embeddingNearDupsBlocked(corpus, threshold, blocks)
    }

  /** SemDeDup candidate pairs (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): k-means the
    * embeddings into `nCells` clusters, then compare pairs ONLY within a
    * cluster — semantic near-dups land in the same cell with overwhelming
    * probability, so the n² comparison mass drops to Σ|cell|² ≈ n²/nCells
    * while staying exact-cosine-verified on everything it does compare.
    * Next to [[embeddingNearDups]] this trades the banded path's per-pair
    * recall GUARANTEE for a fixed compute budget that holds at ANY
    * threshold (sign-LSH cannot prune below t ≈ 0.8 — see that scaladoc;
    * cells prune at every t). The paper's own recall argument applies:
    * duplicates are near-identical vectors, and near-identical vectors
    * share an argmax cell unless they straddle a Voronoi boundary.
    *
    * Same deterministic training as the IVF path ([[trainIvfCentroids]] —
    * init by vec_id, fixed iterations), so output is reproducible and
    * layout-invariant. Within-cell pairing reuses the block-partitioned
    * exact join restricted per cell: the join key is (cell, block-pair),
    * so one hot cell shards across `blocks`² tasks instead of serializing
    * on a single executor. Returns (vec_id_1, vec_id_2, cos ≥ threshold),
    * id-ordered. */
  def semanticNearDups(corpus: DataFrame, threshold: Double, nCells: Int = 16,
      iterations: Int = 3, blocks: Int = 4): DataFrame =
    semanticNearDupsWithCentroids(corpus,
      trainIvfCentroids(corpus, nCells, iterations), threshold, blocks)

  /** [[semanticNearDups]] under caller-supplied centroids — the shared core
    * that lets [[semDedupDecisions]] train once for both the pair pass and
    * the centroid-cosine goodness pass. */
  def semanticNearDupsWithCentroids(corpus: DataFrame,
      cents: Array[Array[Double]], threshold: Double,
      blocks: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val e = assignCells(corpus, cents)
      .withColumn("blk", pmod(hash(col("vec_id")), lit(blocks)))
    val blockPairs = (for (i <- 0 until blocks; j <- i until blocks) yield (i, j))
      .toDF("b1", "b2")
    val left = e.join(broadcast(blockPairs), col("blk") === col("b1"))
      .select(col("cell"), col("b1"), col("b2"), col("vec_id").as("vec_id_1"),
        col("embedding").as("e1"), col("nrm").as("n1"))
    val right = e.join(broadcast(blockPairs), col("blk") === col("b2"))
      .select(col("cell"), col("b1"), col("b2"), col("vec_id").as("vec_id_2"),
        col("embedding").as("e2"), col("nrm").as("n2"))
    left.join(right, Seq("cell", "b1", "b2"))
      .filter(col("b1") =!= col("b2") || col("vec_id_1") < col("vec_id_2"))
      .withColumn("cos", cosineSnappedPre(col("e1"), col("e2"), col("n1"), col("n2")))
      .filter(col("cos") >= threshold)
      .select(least(col("vec_id_1"), col("vec_id_2")).as("vec_id_1"),
        greatest(col("vec_id_1"), col("vec_id_2")).as("vec_id_2"), col("cos"))
  }

  /** Full SemDeDup keep/drop decisions: [[semanticNearDups]] pairs →
    * transitive closure ([[Dedup.connectedComponents]]) → keep ONE member
    * per duplicate group — the paper's §3 policy: retain the example with
    * the LOWEST cosine to its cluster centroid (the least prototypical
    * copy preserves the most diversity), restated as
    * [[Dedup.keepBestPerCluster]] with goodness = −centroid_cos (ties to
    * lowest vec_id). Returns (vec_id, cluster_id, keep) over the whole
    * corpus — singletons keep themselves.
    *
    * The centroid cosine is a free byproduct of assignment (the argmax
    * dot, normalized), so the decision pass adds one aggregate + one
    * broadcast-scale join over the pair-participant subgraph — the corpus
    * itself is touched exactly twice (train sample + assignment). */
  def semDedupDecisions(corpus: DataFrame, threshold: Double, nCells: Int = 16,
      iterations: Int = 3, blocks: Int = 4): DataFrame = {
    val cents = trainIvfCentroids(corpus, nCells, iterations)
    val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val scored = corpus
      .withColumn("best", array_max(cellStructs(col("embedding"), cents)))
      .select(col("vec_id").as("doc_id"),
        (col("best.s") / (norm(col("embedding")) *
          element_at(litVec(centNorms), col("best.c") + 1)))
          .as("centroid_cos"))
    val pairs = semanticNearDupsWithCentroids(corpus, cents, threshold, blocks)
      .select(col("vec_id_1").as("doc_id_1"), col("vec_id_2").as("doc_id_2"))
    val clusters = Dedup.connectedComponents(
      pairs, corpus.select(col("vec_id").as("doc_id")))
    Dedup.keepBestPerCluster(
        clusters.join(scored, "doc_id"), -col("centroid_cos"))
      .select(col("doc_id").as("vec_id"), col("cluster_id"), col("keep"))
  }

  // ---- Product quantization (Jégou et al. 2011) ---------------------------

  /** Per-subspace PQ codebooks: the embedding splits into `m` contiguous
    * dsub = dim/m subvectors; each subspace gets its own `ksub`-codeword
    * min-L2 k-means (the reconstruction metric — spherical assignment
    * would bias toward large-norm codewords). Returns [m][ksub][dsub].
    * Deterministic (first-ksub init per subspace); train on a SAMPLE at
    * 100 TB, exactly like [[trainIvfCentroids]]. */
  def trainPqCodebooks(corpus: DataFrame, dim: Int = 64, m: Int = 8,
      ksub: Int = 16, iterations: Int = 3): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    (0 until m).map { j =>
      lloyd(corpus.select(col("vec_id"),
          slice(col("embedding"), j * dsub + 1, dsub).as("embedding")),
        ksub, iterations, l2 = true)
    }.toArray
  }

  private def pqCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def pqExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** Vector → m codeword indices under `cb` ([[graft.functions.PqEncode]]). */
  def pqEncode(v: Column, cb: Array[Array[Array[Double]]]): Column = {
    val (m, ksub, dsub) = (cb.length, cb(0).length, cb(0)(0).length)
    pqCol(graft.functions.PqEncode(pqExpr(v), cb.flatten.flatten,
      cb.flatten.map(cw => 0.5 * cw.map(x => x * x).sum), m, ksub, dsub))
  }

  /** Query → flattened m·ksub ADC lookup table ([[graft.functions.PqLut]]). */
  def pqLut(v: Column, cb: Array[Array[Array[Double]]]): Column = {
    val (m, ksub, dsub) = (cb.length, cb(0).length, cb(0)(0).length)
    pqCol(graft.functions.PqLut(pqExpr(v), cb.flatten.flatten, m, ksub, dsub))
  }

  /** PQ-compressed ANN: encode the corpus once (dim floats → m codes —
    * 64-dim float32 at m=8 is a 32× scan-payload reduction), score every
    * (row, query) with the m-lookup ADC kernel ([[graft.functions.PqAdc]]),
    * keep the top rerank·k approximate candidates per query, then
    * exact-rerank ONLY that shortlist against the true embeddings. The
    * decisive 100 TB property: the corpus-wide stage touches codes+norm
    * only — full vectors are fetched for |queries|·rerank·k rows, never
    * scanned. Approximate ranking snaps to DECIMAL(18,9) with vec_id
    * tie-break (deterministic shortlist); output is the shared ANN
    * contract (query_id, rank, vec_id, cos), so [[knnClassify]] and the
    * recall specs compose unchanged. */
  def pqTopKWithCodebooks(corpus: DataFrame, queries: DataFrame,
      cb: Array[Array[Array[Double]]], k: Int, rerank: Int = 4): DataFrame =
    pqScan(corpus
        .select(col("vec_id"), pqEncode(col("embedding"), cb).as("codes"),
          norm(col("embedding")).as("nrm")),
      corpus, queries, cb, k, rerank)

  /** Shared ADC-scan + exact-rerank core: `enc` is the compressed
    * (vec_id, codes, nrm) relation — inline-encoded or read from a
    * persisted index; `corpus` supplies true embeddings for the shortlist
    * rerank only. */
  private def pqScan(enc: DataFrame, corpus: DataFrame, queries: DataFrame,
      cb: Array[Array[Array[Double]]], k: Int, rerank: Int): DataFrame = {
    val q = queries
      .select(col("query_id"), pqLut(col("query_vec"), cb).as("lut"),
        norm(col("query_vec")).as("qnrm"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("vec_id").asc)
    val shortlist = enc.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx_cos",
        (pqCol(graft.functions.PqAdc(pqExpr(col("codes")), pqExpr(col("lut")))) /
          (col("qnrm") * col("nrm")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).cast("double"))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * rerank)
      .select("query_id", "vec_id")
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    shortlist
      .join(corpus.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("query_vec"),
        norm(col("query_vec")).as("qnrm"))), "query_id")
      .withColumn("cos", cosineSnappedPre(
        col("query_vec"), col("embedding"), col("qnrm"), col("nrm")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Train + encode + scan in one call — the inline query shape (mirror of
    * [[ivfTopK]]). At scale, persist with [[writePqIndex]] and serve with
    * [[pqTopKFromIndex]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int = 64,
      m: Int = 8, ksub: Int = 16, rerank: Int = 4,
      iterations: Int = 3): DataFrame =
    pqTopKWithCodebooks(corpus, queries,
      trainPqCodebooks(corpus, dim, m, ksub, iterations), k, rerank)

  /** Persist the PQ index: `path/codebooks` = the m·ksub codewords,
    * `path/codes` = (vec_id, codes, nrm) — the compressed corpus the ADC
    * scan reads INSTEAD of the embeddings table (the artifact is ~m·4 B +
    * 8 B per vector vs dim·4 B raw). Codebook training on a
    * `trainFraction` sample, full-corpus encoding exactly once — the
    * [[writeIvfIndex]] lifecycle. */
  def writePqIndex(corpus: DataFrame, path: String, dim: Int = 64, m: Int = 8,
      ksub: Int = 16, iterations: Int = 3, trainFraction: Double = 1.0,
      seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // train-first / marker-guarded destructive phase, the writeIvfIndex
    // rebuild discipline (a new-codebooks/stale-codes pairing decodes to
    // outright wrong distances — the marker makes the window loud)
    val trainSet =
      if (trainFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, trainFraction, seed)
    val cb = trainPqCodebooks(trainSet, dim, m, ksub, iterations)
    withRebuildMarker(spark, path) {
      cb.zipWithIndex.flatMap { case (sub, j) =>
        sub.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
      }.toSeq.toDF("sub", "code", "codeword")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      deleteSubtree(spark, s"$path/codes")
      writePqCodes(corpus, path, cb, batchId = 0L)
    }
  }

  private def writePqCodes(corpus: DataFrame, path: String,
      cb: Array[Array[Array[Double]]], batchId: Long): Unit =
    corpus
      .select(col("vec_id"), pqEncode(col("embedding"), cb).as("codes"),
        norm(col("embedding")).as("nrm"))
      .write.mode("overwrite").parquet(s"$path/codes/batch_id=$batchId")

  /** The persisted codebooks, driver-side ([m][ksub][dsub] — tiny). */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    requireNotRebuilding(spark, path)
    spark.read.parquet(s"$path/codebooks")
      .orderBy("sub", "code").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray)
      .toArray
  }

  /** Fold a corpus batch into an EXISTING PQ index — encode under the
    * FROZEN codebooks into the batch's own `codes/batch_id=N` dir
    * (replay-overwritten), the [[appendIvfIndex]] lifecycle. Same drift
    * contract: quantization error grows as appended data leaves the
    * trained distribution; probe with [[pqRecallProbe]] and rebuild
    * ([[writePqIndex]]) below your floor. Refuses a legacy flat `codes`
    * layout for the partition-discovery reason the text index documents. */
  def appendPqIndex(corpus: DataFrame, path: String, batchId: Long): Unit = {
    val spark = corpus.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val cPath = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = cPath.getFileSystem(conf)
    if (fs.exists(cPath) && fs.listStatus(cPath).exists(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")))
      throw new IllegalStateException(
        s"$path/codes has a flat pre-batch layout (no batch_id level); " +
          "rebuild with writePqIndex before appending")
    writePqCodes(corpus, path, loadPqCodebooks(spark, path), batchId)
  }

  /** Sampled recall-drift probe for a persisted PQ index (vs the exact
    * top-k over `corpus`, which must be the indexed rows) — the rebuild
    * signal for [[appendPqIndex]]'s frozen-codebook lifecycle. */
  def pqRecallProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, queries: DataFrame, k: Int = 10,
      rerank: Int = 4): Double =
    recallOverlap(bruteTopK(corpus, queries, k),
      pqTopKFromIndex(spark, path, corpus, queries, k, rerank))

  /** Serve PQ ANN from a persisted index: codebooks load driver-side
    * (m·ksub·dsub doubles — tiny), the corpus-wide stage scans the
    * compressed `codes` artifact (all appended batches), and `corpus`
    * (the raw embeddings) is touched only by the rerank join on the
    * shortlist. Identical output to [[pqTopKWithCodebooks]] under the
    * same codebooks. */
  def pqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, queries: DataFrame, k: Int,
      rerank: Int = 4): DataFrame =
    pqScan(spark.read.parquet(s"$path/codes").drop("batch_id"),
      corpus, queries, loadPqCodebooks(spark, path), k, rerank)
}
