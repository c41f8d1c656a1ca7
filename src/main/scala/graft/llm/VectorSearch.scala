package graft.llm

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Parameterized similarity-search operators over any embedding corpus
  * — the library API behind q31/q32/q33/q47. Vectors are
  * `array<float>`; all cosines come from the exact scaled-long dot
  * product ([[graft.functions.VectorDotScaled]]), so results are
  * deterministic and engine-portable.
  */
object VectorSearch {

  private def dot(c1: String, c2: String): String =
    s"cast(vector_dot_scaled($c1, $c2) as double) / 1e12"

  /** Spreads a narrow source across the full shuffle parallelism. A
    * small parquet file scans as ONE partition, and AQE coalesces
    * shuffles by *bytes* — so anything quadratic downstream (the
    * brute-force join, the per-bucket self-join) would otherwise run
    * single-threaded no matter how many cores exist. The O(n) shuffle
    * is always worth it ahead of an O(n²) operator; the explicit
    * partition count is honored (not re-coalesced) by AQE.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Adds an exact L2 norm column. */
  def withNorm(df: DataFrame, vecCol: String, normCol: String = "nrm"): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(normCol, sqrt(expr(dot(vecCol, vecCol))))
  }

  /** Exact brute-force cosine top-k per vector via the bounded-heap
    * native aggregate. Output: va, rn, vb, cos. Quadratic by
    * definition — the baseline; use [[annTopK]] at scale.
    *
    * cos(a,b) = cos(b,a), so the join emits only `va < vb` pairs —
    * half the dot products — and an inline two-row explode mirrors
    * each pair into both orientations before the per-vector top-k
    * (one pass; no recompute and no persist of the pair stream).
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val e = withNorm(df, vecCol)
    // streamed side spread across cores; build side stays narrow for
    // the broadcast
    val a = spread(e)
      .select(col(idCol).as("va"), col(vecCol).as("ea"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("vb"), col(vecCol).as("eb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("va") < col("vb"))
      .withColumn("cos", expr(dot("ea", "eb")) / (col("na") * col("nb")))
      .select(explode(array(
        struct(col("va"), col("vb"), col("cos")),
        struct(col("vb").as("va"), col("va").as("vb"), col("cos")))).as("p"))
      .select(col("p.va").as("va"), col("p.vb").as("vb"), col("p.cos").as("cos"))
      .groupBy(col("va"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("va"), (col("pos") + 1).cast("int").as("rn"),
        col("n.vb").as("vb"), col("n.cos").as("cos"))
  }

  /** Deterministic pseudo-random hyperplane coefficient for plane `j`,
    * dimension `i`. The stream index is `j * dim + i` so planes stay
    * linearly independent at any dimension (a fixed stride would make
    * (j, i) pairs collide for dim > stride); for the default dim = 64
    * this matches the oracle fragment in
    * [[graft.queries.Similarity]] exactly.
    */
  /** Johnson–Lindenstrauss random-sign projection (Achlioptas,
    * "Database-friendly random projections", PODS'01): reduces `dim`
    * to `outDims` by multiplying with a ±1 sign matrix derived
    * deterministically from a quadratic congruential hash of the flat
    * k = j·dim + i index (bit 30 of a·k² + c·k mod 2³¹) — no stored
    * matrix, no randomness, so any engine reproduces it bit-for-bit
    * over the 1e-6 quantized lattice. The hash must be NONLINEAR in
    * k: a separable hash (i·a + j·b mod 2) collapses to a rank-1
    * checkerboard, and even an affine LCG's top bit nearly alternates
    * over consecutive k, which for even `dim` makes every row the
    * same checkerboard again — the k² term is what scatters the
    * signs. Validated element-wise: all rows distinct (incl.
    * negations), row sums and pairwise row dot products at the
    * ±O(√dim) scale a random sign matrix gives. The standard pre-ANN shrink: at 100 TB,
    * projecting 64→16 dims cuts every downstream shuffle, bucket key
    * and distance computation by 4× while JL preserves pairwise
    * distances within (1±ε).
    *
    * Output: (idCol, dim int, val long) — one row per reduced
    * coordinate. Execution: one in-row pass (nested higher-order
    * aggregate over codegen'd integer arithmetic), then a posexplode;
    * no shuffle at all.
    */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                outDims: Int = 16): DataFrame = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val sv = KMeans.quantize(col(vecCol))
    val proj = expr(
      s"""transform(sequence(0, ${outDims - 1}), j ->
         |  aggregate(sequence(0, ${dim - 1}), 0L,
         |    (acc, i) -> acc + element_at(sv, i + 1)
         |      * (case when (cast(1103515245 as bigint) * (j * $dim + i) * (j * $dim + i)
         |               + 12345 * (j * $dim + i))
         |               % 2147483648 >= 1073741824 then 1 else -1 end)))""".stripMargin)
    df.select(col(idCol), sv.as("sv"))
      .select(col(idCol), posexplode(proj).as(Seq("dim", "val")))
      .select(col(idCol), col("dim").cast("int").as("dim"), col("val"))
  }

  /** Product-quantization encode + asymmetric-distance (ADC) search
    * (Jégou, Douze, Schmid, "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): the vector is split into `m`
    * subspaces, each quantized against its own small codebook
    * (trained by the shared quantized-Lloyd path,
    * [[KMeans.train]] per slice), so a 64-dim float vector compresses
    * to `m` small code ids; a query's distance to any corpus vector
    * is then approximated as the sum of its exact subspace distances
    * to the CENTROIDS the codes name — computed in-row against
    * codebook literals, never touching the original corpus vectors.
    *
    * Output: one row per query — (query_id, nn_id, adc_d2): the
    * ADC-nearest corpus vector (self excluded), ties broken by id.
    *
    * Scale shape: training = m tiny codebook collects (k×subdim longs
    * each); encode = ONE in-row pass over the corpus (m argmins
    * against literals, no join/shuffle); search = broadcast of the
    * (small) query set against the (m×small-int) code table — the
    * whole corpus participates as codes, which is the point: at 100 TB
    * the codes fit where the raw vectors never could, and the only
    * per-query work is an integer table lookup + sum. All arithmetic
    * on the exact 1e-6 lattice → deterministic, oracle-checkable.
    */
  def pqSearch(df: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, m: Int = 4, k: Int = 4,
               passes: Int = 2): DataFrame = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    // per-subspace codebooks via the shared Lloyd trainer (slice is
    // 1-based); the corpus is scanned once per training pass per
    // subspace — m×passes cheap scans at codebook-train time
    val books: Seq[Seq[(Int, Array[Long])]] = (0 until m).map { s =>
      KMeans.train(
        df.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as("subv")),
        idCol, "subv", k, passes)
    }
    // encode: one in-row pass, m argmins against codebook literals
    val codeCols = (0 until m).map { s =>
      val cents = books(s)
      val centArr = array(cents.map { case (_, c) =>
        array(c.map(lit).toIndexedSeq: _*) }: _*)
      val sv = KMeans.quantize(slice(col(vecCol), s * sub + 1, sub))
      val d2s = transform(centArr, c =>
        aggregate(zip_with(sv, c, (a, b) => (a - b) * (a - b)), lit(0L), _ + _))
      array_position(d2s, array_min(d2s)).cast("int").as(s"code_$s")
    }
    val codes = df.select((col(idCol) +: codeCols): _*)
    // ADC: per (query, corpus-code) row, distance = Σ_s ||q_s − C_s[code_s]||²
    // — the codebook lookup is element_at into the same literals
    val q = queries.select(col(idCol).as("query_id"),
      KMeans.quantize(col(vecCol)).as("qv"))
    val adc = (0 until m).map { s =>
      val cents = books(s)
      val centArr = array(cents.map { case (_, c) =>
        array(c.map(lit).toIndexedSeq: _*) }: _*)
      val qSub = slice(col("qv"), s * sub + 1, sub)
      aggregate(
        zip_with(qSub, element_at(centArr, col(s"code_$s")),
          (a, b) => (a - b) * (a - b)),
        lit(0L), _ + _)
    }.reduce(_ + _)
    codes.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol), adc.as("adc_d2"))
      .groupBy(col("query_id"))
      .agg(min(struct(col("adc_d2"), col(idCol))).as("best"))
      .select(col("query_id"), col(s"best.$idCol").as("nn_id"),
        col("best.adc_d2").as("adc_d2"))
  }

  private def planeVal(dim: Int): String =
    s"(((CAST(1103515245 AS BIGINT) * (j * $dim + i) + 12345) % 2147483648) / 1073741824.0 - 1.0)"

  /** Random-hyperplane LSH bucket ids: sign pattern of `planes`
    * projections (scaled-long exact folds). Output: idCol, vecCol,
    * nrm, bucket.
    *
    * `probe` selects a disjoint plane set (global plane indices
    * `probe*planes ... probe*planes+planes-1`), so unioning runs at
    * probe = 0..L-1 is multi-probe ANN: every probe is an independent
    * partition of the space, and a pair missed by one probe's buckets
    * can collide in another's — recall grows with L at L× candidate
    * cost, with no change to the per-probe plan shape.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 planes: Int = 4, dim: Int = 64, probe: Int = 0): DataFrame = {
    val e = spread(withNorm(df, vecCol))
    val j0 = probe * planes
    e.select(col(idCol), col(vecCol), col("nrm"),
        explode(expr(s"sequence($j0, ${j0 + planes - 1})")).as("j"))
      .withColumn("s", expr(
        s"""aggregate(sequence(0, ${dim - 1}), cast(0 as bigint), (acc, i) ->
           |  acc + cast(round(cast($vecCol[i] as double) * ${planeVal(dim)} * 1e12) as bigint))""".stripMargin))
      .groupBy(col(idCol))
      .agg(sum(expr(s"if(s > 0, cast(1 as bigint) << (j - $j0), 0)")).as("bucket"),
        first(col(vecCol)).as(vecCol), first(col("nrm")).as("nrm"))
  }

  /** All probes' bucket ids in ONE corpus scan: projections for every
    * global plane index `0 ... probes*planes-1` are exploded together
    * and folded by (id, probe) in a single shuffle. Identical bucket
    * keys to per-probe [[lshBuckets]] (same plane stream, bit position
    * `j % planes`), but the scan count and downstream join count stay
    * 1 regardless of the probe count — the multi-probe recall knob
    * must not multiply passes over a 100 TB corpus.
    * Output: idCol, vecCol, nrm, probe, bucket.
    */
  def lshBucketsMulti(df: DataFrame, idCol: String, vecCol: String,
                      planes: Int = 4, dim: Int = 64,
                      probes: Int = 1): DataFrame = {
    val e = spread(withNorm(df, vecCol))
    e.select(col(idCol), col(vecCol), col("nrm"),
        explode(expr(s"sequence(0, ${probes * planes - 1})")).as("j"))
      .withColumn("s", expr(
        s"""aggregate(sequence(0, ${dim - 1}), cast(0 as bigint), (acc, i) ->
           |  acc + cast(round(cast($vecCol[i] as double) * ${planeVal(dim)} * 1e12) as bigint))""".stripMargin))
      .groupBy(col(idCol), expr(s"j div $planes").as("probe"))
      .agg(sum(expr(s"if(s > 0, cast(1 as bigint) << (j % $planes), 0)")).as("bucket"),
        first(col(vecCol)).as(vecCol), first(col("nrm")).as("nrm"))
  }

  /** Within-bucket pairs with cosine, the shared core of ANN top-k and
    * threshold search. `pairFilter` narrows the raw (va, vb) pair set;
    * `keys` is the blocking key set (bucket, or probe+bucket).
    */
  private def bucketPairs(bucketed: DataFrame, idCol: String, vecCol: String,
                          pairFilter: Column,
                          keys: Seq[String] = Seq("bucket")): DataFrame = {
    val a = bucketed.select((keys.map(col) :+ col(idCol).as("va") :+
      col(vecCol).as("ea") :+ col("nrm").as("na")): _*)
    val b = bucketed.select((keys.map(col) :+ col(idCol).as("vb") :+
      col(vecCol).as("eb") :+ col("nrm").as("nb")): _*)
    a.join(b, keys).where(pairFilter)
      .withColumn("cos", expr(dot("ea", "eb")) / (col("na") * col("nb")))
  }

  /** Approximate top-k: exact search within each LSH bucket.
    * Output: va, bucket, rn, nn, cos. Singleton-bucket vectors yield
    * no rows (recall trade-off; multi-probe = union over plane sets).
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              planes: Int = 4, dim: Int = 64): DataFrame =
    bucketPairs(lshBuckets(df, idCol, vecCol, planes, dim), idCol, vecCol,
      col("va") =!= col("vb"))
      .groupBy(col("va"), col("bucket"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), col("bucket").cast("long").as("bucket"),
        posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("va"), col("bucket"), (col("pos") + 1).cast("int").as("rn"),
        col("n.vb").as("nn"), col("n.cos").as("cos"))

  /** Multi-probe approximate top-k: candidates are the union of
    * within-bucket pairs over `probes` disjoint plane sets, deduped on
    * (va, vb) (the cosine is probe-independent, so the dedup keeps a
    * deterministic value), then ranked per vector. Output: va, rn, nn,
    * cos. Recall is strictly non-decreasing in `probes` (each probe
    * only adds candidates) — asserted against single-probe in
    * `LlmApiSpec`.
    */
  def annTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String, k: Int,
                        planes: Int = 4, dim: Int = 64, probes: Int = 2): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    // top-k WITHIN each probe first: a pair in the global top-k ranks
    // ≤ k inside every probe that generated it, so per-probe bounded
    // heaps (map-side reduction to ≤ k rows) are lossless — the
    // cross-probe dedup then shuffles k rows per (vector, probe)
    // instead of every within-bucket pair
    val perProbe = bucketPairs(
        lshBucketsMulti(df, idCol, vecCol, planes, dim, probes), idCol, vecCol,
        col("va") =!= col("vb"), keys = Seq("probe", "bucket"))
      .groupBy(col("va"), col("probe"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), explode(col("top")).as("n"))
      .select(col("va"), col("n.vb").as("vb"), col("n.cos").as("cos"))
      .dropDuplicates("va", "vb")
    perProbe.groupBy(col("va"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("va"), (col("pos") + 1).cast("int").as("rn"),
        col("n.vb").as("nn"), col("n.cos").as("cos"))
  }

  /** Embedding near-dup pairs: within-bucket pairs over a cosine
    * threshold, unioned over `probes` disjoint plane sets (deduped —
    * see [[annTopKMultiProbe]]). Output: va, vb, cos (va < vb).
    */
  def thresholdPairs(df: DataFrame, idCol: String, vecCol: String,
                     minCos: Double, planes: Int = 4, dim: Int = 64,
                     probes: Int = 1): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    bucketPairs(lshBucketsMulti(df, idCol, vecCol, planes, dim, probes),
        idCol, vecCol, col("va") < col("vb"), keys = Seq("probe", "bucket"))
      .where(col("cos") >= minCos)
      .select(col("va"), col("vb"), col("cos"))
      .dropDuplicates("va", "vb")
  }

  /** SemDeDup — semantic deduplication ("SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", Abbas et
    * al., arXiv:2303.09540). The paper's scaling trick is the whole
    * design: k-means clusters ([[KMeans.assign]], exact lattice
    * arithmetic) bound the pairwise cosine search, so the join is
    * per-cluster quadratic, never corpus². Within each cluster, every
    * pair with cosine ≥ `minCos` is a semantic-duplicate pair, and
    * the member FARTHER from its centroid survives — the paper's
    * keep-low-centroid-similarity rule (retain the less-typical
    * example); exact-tie d2 breaks toward the smaller id.
    *
    * Output: one verdict row per vector — (idCol, cid, d2, kept).
    *
    * Scale shape: assignment is the k-means scan (broadcast centroid
    * literals, no join); the pair join shuffles once on cid and its
    * cost is Σ|cluster|² — k is the knob that caps it (the paper runs
    * k=50k on web scale); the removal set joins back by id (a
    * broadcast in practice: |removed| ≤ pairs ≪ corpus).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int = 8, passes: Int = 2,
               minCos: Double = 0.4): DataFrame = {
    val a = KMeans.assign(df, idCol, vecCol, k, passes)
    val e = withNorm(spread(df).select(col(idCol), col(vecCol)), vecCol)
      .join(a, idCol)
    val ea = e.select(col(idCol).as("ida"), col(vecCol).as("va"),
      col("nrm").as("na"), col("cid"), col("d2").as("da"))
    val eb = e.select(col(idCol).as("idb"), col(vecCol).as("vb"),
      col("nrm").as("nb"), col("cid"), col("d2").as("db"))
    val removed = ea.join(eb, Seq("cid"))
      .where(col("ida") < col("idb"))
      .withColumn("cos", expr(dot("va", "vb")) / (col("na") * col("nb")))
      .where(col("cos") >= minCos)
      .select(when(col("db") > col("da") ||
          (col("db") === col("da") && col("idb") < col("ida")),
        col("ida")).otherwise(col("idb")).as("rid"))
      .distinct()
    a.join(removed, col(idCol) === col("rid"), "left")
      .select(col(idCol), col("cid"), col("d2"), col("rid").isNull.as("kept"))
  }

  /** k-center greedy (farthest-point traversal) — the classic
    * 2-approximation coreset / diversity-selection pass (Gonzalez,
    * "Clustering to minimize the maximum intercluster distance",
    * 1985; the core-set active-learning selector of Sener & Savarese,
    * arXiv:1708.00489): start from the smallest id, repeatedly add
    * the point FARTHEST from the current selection (max over points
    * of min over selected of d2), ties toward the smaller id. All
    * distances are exact longs on [[KMeans.quantize]]'s 1e-6 lattice,
    * so the traversal is deterministic and engine-portable.
    *
    * Output: (round int, idCol, radius long) — the picked point per
    * round and its distance to the selection at pick time (round r's
    * radius is the exact covering radius of the first r centers; the
    * seed's is 0).
    *
    * Scale shape: identical to [[KMeans.train]] — each round is one
    * in-row scan against selected-center literals plus a 1-row
    * argmax collect; k rounds, no joins, no pairwise blow-up.
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    val sv = df.select(col(idCol), KMeans.quantize(col(vecCol)).as("sv"))
    val seed = sv.orderBy(col(idCol)).limit(1).collect()(0)
    var picks = List((0, seed.getLong(0), 0L))
    var cents = List(seed.getSeq[Long](1).toArray)
    for (r <- 1 until k) {
      val centArr = array(cents.map(m =>
        array(m.map(lit).toIndexedSeq: _*)): _*)
      val minD2 = array_min(transform(centArr, m =>
        aggregate(zip_with(col("sv"), m, (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _)))
      val p = sv.where(!col(idCol).isin(picks.map(_._2): _*))
        .select(col(idCol), minD2.as("d2"), col("sv"))
        .orderBy(col("d2").desc, col(idCol)).limit(1).collect()(0)
      picks = picks :+ ((r, p.getLong(0), p.getLong(1)))
      cents = cents :+ p.getSeq[Long](2).toArray
    }
    import spark.implicits._
    picks.toDF("round", idCol, "radius")
  }

  /** Per-dimension centroid table — the IVF coarse quantizer's
    * codebook: (labelCol, i, c). Exact decimal sums make the centroid
    * doubles order-independent and engine-portable; one shuffle keyed
    * on (label, dim), output is tiny (lists × dims) and broadcastable.
    */
  private def centroidDims(df: DataFrame, vecCol: String,
                           labelCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy(col(labelCol), col("i"))
      .agg((sum(col("x").cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as("c"))

  /** Per-label centroids + cohesion (the IVF coarse quantizer).
    * Output: label, n_vectors, avg_dist.
    */
  def labelCentroids(df: DataFrame, idCol: String, vecCol: String,
                     labelCol: String): DataFrame = {
    val dims = df.select(col(idCol), col(labelCol),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
    val dist = dims.join(centroidDims(df, vecCol, labelCol), Seq(labelCol, "i"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sqrt(sum(expr("cast((x - c) * (x - c) as decimal(38,12))"))
        .cast("double")).as("d"))
    dist.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vectors"),
        (sum(col("d").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("avg_dist"))
  }

  /** Ranks every vector against every centroid by exact squared L2
    * distance (label tie-break) and keeps the `nprobe` nearest lists.
    * Output: idCol, list_id, rn (1 = the vector's home list).
    *
    * Scale shape: the codebook is broadcast (lists × dims rows), so
    * assignment is one map-side fan-out of dims × lists plus a single
    * (id, list) aggregation — no all-pairs anything. The per-vector
    * window runs after reduction to n × lists narrow rows.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                labelCol: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val dims = spread(df)
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
    val d2 = dims.join(broadcast(centroidDims(df, vecCol, labelCol)), Seq("i"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(expr("cast((x - c) * (x - c) as decimal(38,12))"))
        .cast("double").as("d2"))
    d2.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("d2"), col(labelCol))))
      .where(col("rn") <= nprobe)
      .select(col(idCol), col(labelCol).as("list_id"), col("rn"))
  }

  /** IVF search: each query probes its `nprobe` nearest inverted lists
    * and exact-searches the vectors whose HOME list (rank-1
    * assignment) is one of them — the standard coarse-quantizer ANN.
    * Every pair appears at most once (home lists are unique), so no
    * candidate dedup is needed. Output: va, rn, nn, cos.
    *
    * Recall grows with `nprobe` at linearly growing candidate cost;
    * candidates per query ≈ nprobe × corpus/lists, versus the corpus
    * itself for [[cosineTopK]]. All distances and cosines are exact
    * scaled-long/decimal arithmetic, so results are deterministic and
    * oracle-checkable.
    */
  def ivfSearch(df: DataFrame, idCol: String, vecCol: String,
                labelCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val assign = ivfAssign(df, idCol, vecCol, labelCol, nprobe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assign.count() // materialize once; home + probed both read it
    val e = withNorm(df, vecCol)
    val a = e.select(col(idCol).as("va"), col(vecCol).as("ea"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("vb"), col(vecCol).as("eb"), col("nrm").as("nb"))
    val probed = assign.select(col(idCol).as("va"), col("list_id"))
    val home = assign.where(col("rn") === 1)
      .select(col(idCol).as("vb"), col("list_id"))
    probed.join(home, "list_id").where(col("va") =!= col("vb"))
      .join(a, "va").join(b, "vb")
      .withColumn("cos", expr(dot("ea", "eb")) / (col("na") * col("nb")))
      .groupBy(col("va"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("va"), (col("pos") + 1).cast("int").as("rn"),
        col("n.vb").as("nn"), col("n.cos").as("cos"))
  }

  /** Per-label centroid drift between two embedding snapshots —
    * distribution-shift monitoring for an embedding pipeline: when a
    * re-embedding run (new model, new corpus slice) moves a label's
    * centroid, downstream ANN indexes and k-means codebooks built on
    * the old geometry degrade silently; this measures the move.
    * drift² = Σ_dims (cA_d − cB_d)², with centroid means computed
    * from exact decimal sums and the squared terms decimal-summed
    * (order-independent — the q33 arithmetic discipline), so the
    * number is engine-portable. Labels present in only one snapshot
    * drop (inner join) — a disappearing label is schema drift, not
    * centroid drift.
    *
    * Scale shape: each snapshot reduces to a (labels × dims)-row
    * centroid table in one partially-aggregated shuffle; the
    * comparison join and final per-label sum are codebook-sized.
    * Output: labelCol, n_a, n_b, drift2 (rounded 6).
    */
  def centroidDrift(a: DataFrame, b: DataFrame, vecCol: String,
                    labelCol: String): DataFrame = {
    def cents(df: DataFrame) = df
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy(col(labelCol), col("i"))
      .agg((sum(col("x").cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as("c"), count(lit(1)).as("n"))
    val ca = cents(a).select(col(labelCol), col("i"),
      col("c").as("ca"), col("n").as("na"))
    val cb = cents(b).select(col(labelCol).as("__lb"), col("i").as("__ib"),
      col("c").as("cb"), col("n").as("nb"))
    ca.join(cb, ca(labelCol) === col("__lb") && col("i") === col("__ib"))
      .groupBy(col(labelCol))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round(sum(expr("cast((ca - cb) * (ca - cb) as decimal(38,12))"))
          .cast("double"), 6).as("drift2"))
  }

  /** Hard-triplet mining for contrastive/metric training (the
    * batch-hard strategy of Hermans et al. arXiv:1703.07737 §3, run
    * corpus-wide): for every anchor, the *hardest positive* is its
    * least-similar same-label vector and the *hardest negative* its
    * most-similar different-label vector; the margin between them is
    * what a triplet loss would push on. Anchors missing either side
    * (singleton label, or only one label in the corpus) are dropped.
    *
    * Ties break toward the smaller neighbor id via lexicographic
    * struct min/max — no window, one conditional aggregation over the
    * pair stream. Like [[cosineTopK]] this scans all pairs
    * (declared-quadratic baseline); at scale, mine from an ANN
    * candidate set instead ([[annTopK]] output joined to labels) —
    * same aggregation, bucketed fan-out.
    * Output: va, pos_id, pos_cos, neg_id, neg_cos, margin (= neg −
    * pos cosine, rounded 6).
    */
  def hardTriplets(df: DataFrame, idCol: String, vecCol: String,
                   labelCol: String): DataFrame = {
    val e = withNorm(df, vecCol)
    val a = spread(e).select(col(idCol).as("va"), col(vecCol).as("ea"),
      col("nrm").as("na"), col(labelCol).as("la"))
    val b = e.select(col(idCol).as("vb"), col(vecCol).as("eb"),
      col("nrm").as("nb"), col(labelCol).as("lb"))
    a.join(broadcast(b), col("va") =!= col("vb"))
      .withColumn("cos", expr(dot("ea", "eb")) / (col("na") * col("nb")))
      .groupBy(col("va"))
      .agg(
        min(when(col("la") === col("lb"),
          struct(col("cos").as("cos"), col("vb").as("vb")))).as("pos"),
        max(when(col("la") =!= col("lb"),
          struct(col("cos").as("cos"), (col("vb") * -1).as("nvb")))).as("neg"))
      .where(col("pos").isNotNull && col("neg").isNotNull)
      .select(col("va"),
        col("pos.vb").as("pos_id"), round(col("pos.cos"), 6).as("pos_cos"),
        (col("neg.nvb") * -1).as("neg_id"), round(col("neg.cos"), 6).as("neg_cos"),
        round(col("neg.cos") - col("pos.cos"), 6).as("margin"))
  }

  /** Per-query recall@k of an approximate ranked-neighbor list against
    * the exact one — the evaluation harness that closes the ANN loop:
    * every index here ([[annTopK]], [[annTopKMultiProbe]],
    * [[ivfSearch]], [[adcSearch]]) trades recall for candidate cost,
    * and this operator measures the trade on the index's own output.
    *
    * Both inputs are ranked lists with columns (`queryCol`, `rn`,
    * neighbor); rows with `rn > k` are ignored, so passing lists built
    * at a larger k evaluates a shallower cut. The base set is the
    * EXACT side's query points: a query the index dropped entirely
    * (e.g. a singleton LSH bucket) scores recall 0 rather than
    * disappearing from the average.
    *
    * Scale shape: both inputs are top-k lists — k·n rows, not corpus-
    * sized — so the overlap join and the per-query count shuffle k·n
    * rows on (query, neighbor). The corpus itself is never touched;
    * evaluation cost is independent of vector dimensionality.
    * Output: va, n_hits, recall (= n_hits / k, rounded to 6 decimals).
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int,
                queryCol: String = "va", exactNnCol: String = "vb",
                approxNnCol: String = "nn"): DataFrame = {
    val e = exact.where(col("rn") <= k)
      .select(col(queryCol).as("va"), col(exactNnCol).as("nn"))
    val a = approx.where(col("rn") <= k)
      .select(col(queryCol).as("va"), col(approxNnCol).as("nn"))
    val hits = e.join(a, Seq("va", "nn"), "left_semi")
      .groupBy(col("va")).agg(count(lit(1)).as("__h"))
    e.groupBy(col("va")).agg(count(lit(1)).as("__n"))
      .join(hits, Seq("va"), "left")
      .select(col("va"),
        coalesce(col("__h"), lit(0L)).cast("int").as("n_hits"),
        round(coalesce(col("__h"), lit(0L)) / lit(k.toDouble), 6).as("recall"))
  }
}
