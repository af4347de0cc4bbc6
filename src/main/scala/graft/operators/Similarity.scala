package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Similarity search over an embedding column (`Array[Float]`): exact
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH-bucketed variant as the 100 TB scale path.
  * Extended surface (no analog in the reference).
  */
object Similarity {

  /** Embedding table prepared for similarity search: the raw (float)
    * vector as `v` plus its precomputed L2 norm as `nv`. The vector is
    * NOT widened to double — [[graft.functions.VectorDot]] reads float
    * arrays natively with exact per-element widening, so keeping the
    * float representation halves the bytes every broadcast / cache /
    * shuffle of the corpus moves, and the norm column turns every
    * per-pair cosine downstream into ONE dot product instead of three
    * (the two norm dots are per-row, computed here exactly once).
    */
  def prepared(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors.select(
      col(idCol), col(vecCol).as("v"), l2norm(col(vecCol)).as("nv"))

  /** Cosine from a precomputed-norm pair: dot(a,b)/(na*nb) — identical
    * operand values and order as `cosine(a, b)`, so results stay
    * bit-equal to the unfactored form (and the DuckDB oracle).
    */
  private def cosPre(a: Column, na: Column, b: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  /** Exact pairwise cosine for every (query × corpus) pair above
    * `minCos`. Brute force — O(|Q|·|C|) — correct at any scale only when
    * one side is small (it is broadcast). Use [[annLsh]] when both sides
    * are large.
    *
    * Input contract (also [[lshBuckets]]/[[ivfAssign]]/[[ivfTopK]]/
    * [[annLsh]]): both sides must come from [[prepared]] — columns `v`
    * (float vector) and `nv` (precomputed L2 norm) are required; a frame
    * with only a raw vector column fails analysis with an
    * unresolved-column error on `nv`.
    */
  def bruteForcePairs(
      queries: DataFrame, corpus: DataFrame, idCol: String, minCos: Double): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col("v").as("qv"), col("nv").as("qn"))
    val c = corpus.select(
      col(idCol).as("cand_id"), col("v").as("cv"), col("nv").as("cn"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosPre(col("qv"), col("qn"), col("cv"), col("cn")))
      .filter(col("cos") >= minCos)
      .select("query_id", "cand_id", "cos")
  }

  /** Bounded top-k per query via [[graft.functions.TopKAgg]]: map-side
    * partial top-k, so only k rows per query per partition cross the
    * shuffle — identical results to the
    * `row_number().over(window) <= k` formulation, which would shuffle
    * and sort EVERY candidate row.
    */
  private def topKPerQuery(pairs: DataFrame, k: Int): DataFrame = {
    val topk = udaf(graft.functions.TopKAgg(k))
    pairs
      .groupBy("query_id")
      .agg(topk(col("cos"), col("cand_id")).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("t._2").as("cand_id"),
        col("t._1").as("cos"))
  }

  /** Exact top-k neighbors per query by (cosine desc, cand_id asc).
    * Ranking uses the 6dp-rounded cosine so the order is stable across
    * engines computing the same value to within 1e-12.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, k: Int): DataFrame =
    topKPerQuery(bruteForcePairs(queries, corpus, idCol, minCos = -1.0), k)

  /** Hard-negative mining for embedding-model training: per query, the
    * top-k MOST similar candidates whose cosine stays BELOW `maxCos` —
    * similar enough to be informative negatives, but excluded from the
    * near-duplicate band that would make them false negatives (the
    * standard contrastive-training recipe; `maxCos` is the same
    * threshold the near-dup queries q34/q89 treat as duplicate).
    *
    * Plan shape = [[bruteForceTopK]] with one extra codegen'd filter
    * BEFORE the bounded [[graft.functions.TopKAgg]], so only candidates
    * that can appear in the answer cross the shuffle. Same
    * [[prepared]]-input and broadcast-query-side contract.
    */
  def hardNegatives(
      queries: DataFrame, corpus: DataFrame, idCol: String,
      k: Int, maxCos: Double): DataFrame =
    topKPerQuery(
      bruteForcePairs(queries, corpus, idCol, minCos = -1.0)
        .filter(col("cos") < maxCos),
      k)

  /** Maximal-Marginal-Relevance diversified re-rank: per query, greedily
    * select `selectK` results from the top-`poolK` relevance pool, each
    * step maximizing `0.5·rel − 0.5·max-cosine-to-already-selected`
    * (λ = 1/2 — two exact binary halvings and one subtraction on the
    * 6dp-rounded cosines, so the score arithmetic reproduces bit-for-bit
    * across engines). Step 1 has an empty selected set, so its score is
    * `0.5·rel`; ties at every step break by cand_id asc. Output:
    * (query_id, step, cand_id, mmr) — selectK rows per query in
    * selection order.
    *
    * Plan contract (the q292 serving discipline): stage 1 is the bounded
    * [[bruteForceTopK]] — only poolK rows per query per partition cross
    * the shuffle. The |Q|·poolK pool is then BROADCAST back against one
    * corpus scan to fetch candidate vectors (no corpus-side shuffle),
    * and the pairwise similarity matrix is |Q|·poolK² rows —
    * candidate-sized, never corpus-sized. The selectK−1 greedy steps are
    * unrolled joins over these bounded frames (the q199 fixed-round
    * shape), with every per-step window partitioned by query_id. At
    * catalog scale the corpus appears ONLY in the stage-1 scan and the
    * vector-fetch scan; the candidate frames and per-step picks are
    * localCheckpoint-ed (lineage-cut — see the inline note; blocks freed
    * by the runner's persisted-RDD sweep), so the per-step cost is a
    * CONSTANT handful of candidate-sized jobs regardless of corpus size.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
                poolK: Int, selectK: Int): DataFrame = {
    val pool = bruteForceTopK(queries, corpus, idCol, poolK)
      .select(col("query_id"), col("cand_id"), col("cos").as("rel"))
    // localCheckpoint, not persist: the |Q|·poolK pool is the root of
    // 3·selectK downstream join/window plans — an uncut lineage would
    // re-embed the corpus scan + TopKAgg subtree in every one of them
    // (MB-scale task binaries, one codegen compile each; measured ~10 s
    // of pure planning at sf0.1). Checkpointed, every step plans against
    // a short in-memory root. Blocks are freed by the runner's
    // persisted-RDD sweep, same as the BPE learner's symbol table.
    val cand = corpus
      .select(col(idCol).as("cand_id"), col("v"), col("nv"))
      .join(broadcast(pool), Seq("cand_id"))
      .localCheckpoint()
    val sims = cand.select(col("query_id"), col("cand_id"), col("v"), col("nv"))
      .join(
        cand.select(col("query_id"), col("cand_id").as("other"),
          col("v").as("ov"), col("nv").as("onv")),
        Seq("query_id"))
      .filter(col("cand_id") =!= col("other"))
      .select(col("query_id"), col("cand_id"), col("other"),
        cosPre(col("v"), col("nv"), col("ov"), col("onv")).as("sim"))
      .localCheckpoint()
    val base = cand.select("query_id", "cand_id", "rel")
    val first = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rel").desc, col("cand_id"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), lit(1).as("step"), col("cand_id"),
        round(col("rel") * lit(0.5), 6).as("mmr"))
      // each pick is ≤|Q| rows but feeds BOTH the anti- and semi-join of
      // every later step — uncut, step s would re-embed (and re-run)
      // every earlier step's plan twice (2^selectK window jobs);
      // checkpointed, each step plans against the materialized rows
      .localCheckpoint()
    val picks = (2 to selectK).foldLeft(Vector(first)) { (acc, s) =>
      val prev = acc.map(_.select(col("query_id"), col("cand_id")))
        .reduce(_ unionByName _)
      val pick = base
        .join(broadcast(prev), Seq("query_id", "cand_id"), "left_anti")
        .join(sims, Seq("query_id", "cand_id"))
        .join(broadcast(prev.withColumnRenamed("cand_id", "other")),
          Seq("query_id", "other"), "left_semi")
        .groupBy("query_id", "cand_id", "rel")
        .agg(max(col("sim")).as("msim"))
        .withColumn("mmr",
          round(col("rel") * lit(0.5) - col("msim") * lit(0.5), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("mmr").desc, col("cand_id"))))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(s).as("step"), col("cand_id"), col("mmr"))
        .localCheckpoint()
      acc :+ pick
    }
    picks.reduce(_ unionByName _)
  }

  /** Facility-location greedy coreset selection — the submodular
    * "pick k documents that best COVER the corpus in embedding space"
    * primitive of training-data selection (the corpus-scope sibling of
    * [[mmrRerank]]'s per-query diversity): maximize
    * f(S) = Σ_x max(0, max_{c∈S} cos(x, c)) by the classic greedy, each
    * step admitting the candidate with the largest marginal coverage
    * gain. Candidates come from a BOUNDED deterministic pool (`poolN`
    * by md5-of-id order — the reproducible uniform sample; a production
    * variant widens it to per-IVF-cell representatives, same plan), so
    * the score table is |corpus|·poolN rows built ONCE by a broadcast
    * pool join — never all-pairs — and each of the `selectK` steps is
    * one corpus-keyed join + one candidate-keyed hash agg + a 1-row
    * TakeOrdered + one corpus-keyed coverage merge. DETERMINISM: the
    * 6dp cosine is 1e6-quantized to a long at the score table, so every
    * gain sum and coverage max is exact integer arithmetic; winners tie
    * by id. The score table, the per-step winner and the coverage
    * vector are localCheckpoint-ed (coverage is read by the gain pass
    * AND the merge of every later step — the q311 lineage lesson);
    * blocks freed by the runner's sweep. Output: (step, idCol, gain,
    * total_coverage) — selection order with the coverage curve, the
    * diminishing-returns read-out a curation pipeline uses to choose k.
    */
  def facilityLocationSelect(
      corpus: DataFrame, idCol: String, poolN: Int, selectK: Int): DataFrame = {
    val pool = corpus
      .select(col(idCol).as("c"), col("v").as("cv"), col("nv").as("cn"),
        md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col("c")).limit(poolN)
      .select("c", "cv", "cn")
    val scores = corpus.select(col(idCol).as("x"), col("v"), col("nv"))
      .crossJoin(broadcast(pool))
      .select(col("x"), col("c"),
        round(cosPre(col("v"), col("nv"), col("cv"), col("cn")) * 1e6)
          .cast("long").as("s"))
      .localCheckpoint()
    var cov = corpus.select(col(idCol).as("x"))
      .withColumn("cov", lit(0L)).localCheckpoint()
    var selected: DataFrame = null
    val out = scala.collection.mutable.Buffer.empty[DataFrame]
    for (s <- 1 to selectK) {
      val remaining =
        if (selected == null) scores
        else scores.join(broadcast(selected), Seq("c"), "left_anti")
      val gains = remaining.join(cov, Seq("x"))
        .groupBy("c")
        .agg(sum(greatest(col("s") - col("cov"), lit(0L))).as("gain_fp"))
      val win = gains.orderBy(col("gain_fp").desc, col("c").asc)
        .limit(1).localCheckpoint()
      selected =
        if (selected == null) win.select("c")
        else selected.unionByName(win.select("c")).localCheckpoint()
      cov = cov
        .join(scores.join(broadcast(win.select("c")), Seq("c"), "left_semi")
          .select(col("x"), col("s")), Seq("x"))
        .select(col("x"), greatest(col("cov"), col("s")).as("cov"))
        .localCheckpoint()
      val covTot = cov.agg(sum(col("cov")).as("cov_fp"))
      out += win.crossJoin(broadcast(covTot))
        .select(lit(s).as("step"), col("c").as(idCol),
          round(col("gain_fp") / 1e6, 6).as("gain"),
          round(col("cov_fp") / 1e6, 6).as("total_coverage"))
    }
    out.reduce(_ unionByName _)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-0.5, 0.5), derived from md5 — no RNG state, so the
    * signature of a vector is reproducible across runs and engines.
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-plane-$plane-$dim".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
  }

  /** Random-hyperplane LSH bucketing: `numPlanes`-bit signature per vector
    * (bit p = sign of dot(v, plane_p)). Vectors sharing a bucket are
    * near-duplicates with high probability; search joins on the bucket id —
    * an equality join on a 2^numPlanes-ary key, the scale path for ANN.
    */
  def lshBuckets(vectors: DataFrame, idCol: String, dim: Int, numPlanes: Int): DataFrame = {
    val planes: Seq[Seq[Double]] =
      (0 until numPlanes).map(p => (0 until dim).map(d => planeComponent(p, d)))
    val sigBits = (0 until numPlanes).map { p =>
      val planeArr = array(planes(p).map(lit): _*)
      when(dot(col("v"), planeArr) > 0, 1L << p).otherwise(0L)
    }
    vectors.withColumn("bucket", sigBits.reduce(_ + _))
  }

  /** IVF (inverted-file) cell assignment: each vector goes to its nearest
    * of `k` deterministic seed centroids (the k lowest-id vectors — no RNG,
    * no iterative training, so assignment is reproducible). The seed
    * centroids are collected to the driver (k × dim doubles — broadcast-
    * sized at any corpus scale) and inlined as literals, making the
    * assignment a narrow codegen-able projection with no join.
    */
  def ivfAssign(vectors: DataFrame, idCol: String, k: Int): DataFrame = {
    val seeds = collectSeeds(vectors, idCol, k)
    // argmin over (negated cosine, cell id) structs — array_min orders
    // lexicographically, so ties resolve to the lowest cell id
    vectors.withColumn("cell", array_min(seedScores(seeds)).getField("cell"))
  }

  /** The k lowest-id vectors as driver-side double arrays (k × dim
    * doubles — broadcast-sized at any corpus scale), float-widened
    * exactly when the stored embedding is float.
    */
  private[graft] def collectSeeds(
      vectors: DataFrame, idCol: String, k: Int): Array[Array[Double]] =
    vectors.orderBy(col(idCol).asc).limit(k)
      .select(col("v").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Per-cell (negcos, cell) structs for the current row's vector. The
    * seed norm `l2norm(c)` is a literal-only subtree — VectorDot is
    * foldable — so Catalyst constant-folds it once per plan; the row
    * norm comes from the precomputed `nv` column. Net per-row cost is
    * exactly one dot product per cell, operand-order-identical to the
    * unfactored `cosine(v, c)`.
    */
  private[graft] def seedScores(seeds: Array[Array[Double]]): Column =
    array(seeds.indices.map { i =>
      val c = array(seeds(i).toIndexedSeq.map(lit): _*)
      struct(
        (lit(0.0) - dot(col("v"), c) / (col("nv") * l2norm(c))).as("negcos"),
        lit(i).as("cell"))
    }: _*)

  /** IVF ANN top-k: probe the `nProbe` nearest cells per query, exact
    * cosine re-rank within the probed cells. The search join is an
    * equality join on the cell id — the 100 TB path: cost scales with
    * cell occupancy × probes, not corpus size.
    *
    * The per-row centroid scoring (`cells` cosines per vector — the
    * dominant compute) runs ONCE, inside the fused native
    * [[graft.functions.IvfProbes]] expression (bit-identical to the
    * composed `array_sort(array(struct...))` formulation — differential
    * spec — but a primitive loop instead of a `cells`-struct expression
    * tree, which at `cells ≈ √N` dominated the whole query). Its probe
    * array yields both the home cell (element 1 — identical to
    * [[ivfAssign]]'s `array_min`, same tie rule) and the probe list, and
    * the scored table is persisted so the self-join's two sides don't
    * re-score. Cache lifecycle is owned by the caller/runner (clearCache
    * per query).
    */
  def ivfTopK(
      vectors: DataFrame, idCol: String, k: Int,
      cells: Int, nProbe: Int): DataFrame = {
    val seeds = collectSeeds(vectors, idCol, cells)
    // empty corpus (cells clamps to 0 seeds): the answer is an empty
    // result with the usual schema, not an IvfProbes construction error
    if (seeds.isEmpty)
      return vectors.select(
        col(idCol).as("query_id"), lit(1).as("rank"),
        col(idCol).as("cand_id"), lit(0.0).as("cos")).limit(0)
    val base = vectors
      .withColumn("probes", graft.functions.IvfProbes(col("v"), col("nv"), seeds, nProbe))
      .persist()
    val cands = base.select(
      col(idCol).as("cand_id"), col("v").as("cv"), col("nv").as("cn"),
      element_at(col("probes"), 1).as("probe"))
    val probes = base.select(
      col(idCol).as("query_id"), col("v").as("qv"), col("nv").as("qn"),
      explode(col("probes")).as("probe"))
    topKPerQuery(
      probes.join(cands, Seq("probe"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          cosPre(col("qv"), col("qn"), col("cv"), col("cn")).as("cos")),
      k)
  }

  /** Per-group centroid of an embedding column with DETERMINISTIC
    * distributed summation: each component is quantized to fixed-point
    * (round(x * 1e6) as a long) before the sum, so the aggregation is
    * exact integer arithmetic — partition- and order-invariant, unlike a
    * raw double sum — and the centroid is the quantized mean rounded to
    * 6dp. Scale: posexplode + one hash aggregation on (group, dim);
    * map-side combine collapses to |groups| × dim rows before the
    * shuffle regardless of corpus size.
    */
  def labelCentroids(vectors: DataFrame, groupCol: String): DataFrame =
    vectors
      .select(col(groupCol), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col(groupCol), col("dim"))
      .agg(
        sum(round(col("x") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(
        col(groupCol), col("dim"),
        round(col("s") / 1e6 / col("n"), 6).as("centroid"),
        col("n"))

  /** Deterministic distributed k-means (Lloyd's algorithm, cosine
    * assignment) — the corpus-clustering step of curation pipelines
    * (topic balancing, SemDeDup cluster formation, diversity sampling).
    * `passes` assignment passes run in total: seeds are the k lowest-id
    * vectors ([[collectSeeds]] — no RNG), each pass assigns every vector
    * to its nearest centroid (argmin over (-cosine, cluster), ties to
    * the lowest cluster — exactly [[ivfAssign]]'s rule), and between
    * passes centroids are recomputed as the FIXED-POINT mean of their
    * members: components quantize to `round(x·1e6)` longs before the
    * sum (the [[labelCentroids]] trick), so the distributed aggregation
    * is exact integer arithmetic and the updated centroid
    * `(sum/1e6)/n` is bit-identical on any engine / partitioning. A
    * cluster that loses all members keeps its previous centroid.
    *
    * Scale shape per pass: assignment is a narrow shuffle-free
    * projection (centroids are plan literals — k×dim doubles, broadcast-
    * sized at any corpus scale); the update is ONE hash aggregation
    * whose map-side output is at most k×dim rows per partition. Driver
    * state is the k×dim centroid matrix — same bound as the IVF seed
    * path. Returns `(id, cluster)` under the final centroids.
    */
  def kmeans(vectors: DataFrame, idCol: String, k: Int, passes: Int): DataFrame = {
    require(k >= 1, "kmeans requires k >= 1")
    require(passes >= 1, "kmeans requires at least one assignment pass")
    var centroids = collectSeeds(vectors, idCol, k)
    // home cell through the fused native scorer — bit-identical to
    // array_min(seedScores(...)) (same dots, same (negcos, cell) tie
    // rule — differential spec on IvfProbes), one primitive loop per
    // row instead of a k-struct expression tree
    def assign: DataFrame = vectors.withColumn(
      "cluster",
      element_at(graft.functions.IvfProbes(col("v"), col("nv"), centroids, 1), 1))
    for (_ <- 1 until passes) {
      val sums = assign
        .select(col("cluster"),
          posexplode(graft.functions.TextFunctions.toDouble(col("v")))
            .as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(
          sum(round(col("x") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect() // bounded: at most k × dim rows
      val next = centroids.map(_.clone) // empty cluster keeps its centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / 1e6 / r.getLong(3)
      }
      centroids = next
    }
    assign.select(col(idCol), col("cluster"))
  }

  /** Product-quantization codebook: `m` subspaces × `k` centroids, where
    * centroid `(s, j)` is subspace `s` of the j-th lowest-id vector —
    * the deterministic sampled-codebook rule ([[collectSeeds]] applied
    * per subspace; no RNG, no iterative training, reproducible on any
    * engine). Driver state is m·k·(dim/m) = k·dim doubles — the same
    * broadcast-sized bound as the IVF seed path at any corpus scale.
    */
  def pqCodebook(
      vectors: DataFrame, idCol: String, m: Int, k: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && k >= 1, "pqCodebook requires m >= 1 and k >= 1")
    val seeds = collectSeeds(vectors, idCol, k)
    require(seeds.nonEmpty, "pqCodebook requires a non-empty corpus")
    val dim = seeds.head.length
    require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m $m")
    val sub = dim / m
    Array.tabulate(m)(s => seeds.map(_.slice(s * sub, (s + 1) * sub)))
  }

  /** PQ-encode a corpus: `(id, codes, err)` where `codes(s)` is the
    * nearest centroid of subspace `s` (squared-L2 argmin, ties to the
    * lowest id) and `err` is the total quantization error — the audit
    * statistic read before committing to a compressed index. Narrow
    * shuffle-free projection (the codebook is a plan constant inside the
    * fused native [[graft.functions.PqEncode]]); output is m small ints
    * per vector — the 64× compression that makes a 100 TB embedding
    * corpus searchable from memory.
    */
  def pqEncode(
      vectors: DataFrame, idCol: String,
      codebook: Array[Array[Array[Double]]]): DataFrame =
    vectors
      .select(col(idCol), graft.functions.PqEncode(col("v"), codebook).as("pq"))
      .select(col(idCol), col("pq.codes").as("codes"), col("pq.err").as("err"))

  /** PQ asymmetric-distance (ADC) top-k: each query builds its m×k
    * distance table ONCE (native [[graft.functions.PqDistTable]]), the
    * tiny query side broadcasts, and scoring a candidate is `m` table
    * lookups over its code — never touching the candidate's raw vector.
    * This is the scan shape of a compressed 100 TB index: the big side
    * streams code rows (m ints, not dim floats), per-candidate cost is
    * O(m), and the bounded [[graft.functions.TopKAgg]] keeps only k rows
    * per query per partition crossing the shuffle. Ranking is
    * (6dp-rounded ADC asc, cand_id asc); approximation vs the exact kNN
    * is measured in SimilaritySpec — determinism is exact.
    */
  def pqAdcTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String,
      codebook: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebook.length
    val codes = pqEncode(corpus, idCol, codebook)
      .select(col(idCol).as("cand_id"), col("codes"))
    val q = queries.select(
      col(idCol).as("query_id"),
      graft.functions.PqDistTable(col("v"), codebook).as("dtab"))
    // ascending-s left-to-right adds — the order the oracle's list fold replays
    val adc = (0 until m)
      .map(s => element_at(
        element_at(col("dtab"), s + 1), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val scored = codes
      .join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), round(adc, 6).as("adc"))
    val topk = udaf(graft.functions.TopKAgg(k))
    scored
      .groupBy("query_id")
      // TopKAgg orders (score desc, id asc); negating the distance makes
      // that (adc asc, cand_id asc)
      .agg(topk(lit(0.0) - col("adc"), col("cand_id")).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("t._2").as("cand_id"),
        (lit(0.0) - col("t._1")).as("adc"))
  }

  /** IVF+PQ top-k (the FAISS-style IVFADC layout): candidates carry
    * their home IVF cell and PQ codes; queries probe their `nProbe`
    * nearest cells and score probed candidates by ADC table lookups.
    * This composes the two scale mechanisms — the cell partition bounds
    * WHICH candidates a query touches (per-cell occupancy × probes, not
    * corpus size) and PQ bounds WHAT each touch costs (m lookups over m
    * small ints, never a raw vector) — and the search join is a plain
    * equality join on the cell id, so the compressed index shards by
    * cell across executors with no broadcast of either side. The plan
    * you'd run at 100 TB; q42/q80 (IVF, exact re-rank) and q110 (PQ,
    * full scan) verify its two halves in isolation.
    */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String,
      cells: Int, nProbe: Int,
      codebook: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebook.length
    val seeds = collectSeeds(corpus, idCol, cells)
    val cands = corpus.select(
      col(idCol).as("cand_id"),
      element_at(graft.functions.IvfProbes(col("v"), col("nv"), seeds, 1), 1)
        .as("probe"),
      graft.functions.PqEncode(col("v"), codebook).getField("codes").as("codes"))
    val qs = queries.select(
      col(idCol).as("query_id"),
      explode(graft.functions.IvfProbes(col("v"), col("nv"), seeds, nProbe))
        .as("probe"),
      graft.functions.PqDistTable(col("v"), codebook).as("dtab"))
    val adc = (0 until m)
      .map(s => element_at(
        element_at(col("dtab"), s + 1), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val topk = udaf(graft.functions.TopKAgg(k))
    qs.join(cands, Seq("probe"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), round(adc, 6).as("adc"))
      .groupBy("query_id")
      .agg(topk(lit(0.0) - col("adc"), col("cand_id")).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("t._2").as("cand_id"),
        (lit(0.0) - col("t._1")).as("adc"))
  }

  /** ANN top-k: candidates share an LSH bucket; exact cosine re-rank within
    * the bucket. Recall < 1 by construction (measured in the spec against
    * [[bruteForceTopK]]); cost drops from |Q|·|C| to the bucket co-occurrence
    * size. Multi-probe: vectors are also matched on buckets differing in one
    * bit to lift recall.
    */
  def annLsh(
      vectors: DataFrame, idCol: String, dim: Int, numPlanes: Int, k: Int): DataFrame = {
    // persisted: the probe/candidate self-join would otherwise evaluate
    // the numPlanes signature dots twice per vector; runner owns the cache
    val bucketed = lshBuckets(vectors, idCol, dim, numPlanes).persist()
    // probe buckets: own bucket + each one-bit flip
    val probes = bucketed.select(
      col(idCol).as("query_id"), col("v").as("qv"), col("nv").as("qn"),
      explode(array((lit(col("bucket")) +:
        (0 until numPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p)))): _*))
        .as("probe"))
    val cands = bucketed.select(
      col(idCol).as("cand_id"), col("v").as("cv"), col("nv").as("cn"),
      col("bucket").as("probe"))
    topKPerQuery(
      probes.join(cands, Seq("probe"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          cosPre(col("qv"), col("qn"), col("cv"), col("cn")).as("cos")),
      k)
  }
}
