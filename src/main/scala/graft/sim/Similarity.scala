package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.VectorFunctions

/**
 * Similarity search over embedding columns (Array[Float]).
 *
 * Baseline: brute-force cosine top-k (exact, O(|Q|*|C|) — fine when the
 * query set is small and broadcastable). Scale path: random-hyperplane LSH
 * bucketing, which turns the quadratic all-pairs problem into per-bucket
 * joins; bucket width (nbits) trades recall for fan-out.
 *
 * Vector math runs through graft's native codegen expressions
 * (functions/VectorExprs.scala): the same sequential left-to-right double
 * fold as the declarative `aggregate(zip_with(...))` formulation — bit-
 * identical, oracle-reproducible results — without the per-row interpreted
 * closure cost that multiplies quadratically on pair-expanded verify joins.
 */
object Similarity {

  /** Sequential left-to-right double fold of elementwise products (native
    * codegen expression; see VectorExprs scaladoc). */
  def dot(a: Column, b: Column): Column = VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalize once so downstream similarity is a single dot product —
    * at 100 TB you normalize at ingest, not per comparison. */
  def withUnitVector(df: DataFrame, vec: String, out: String = "unit_vec"): DataFrame =
    // norm into a temp column first: referencing norm(col(vec)) inside the
    // transform lambda would re-evaluate the O(dim) fold once PER ELEMENT
    df.withColumn("__graft_norm", norm(col(vec)))
      .withColumn(out,
        transform(col(vec), x => x.cast(DoubleType) / col("__graft_norm")))
      .drop("__graft_norm")

  /** Exact brute-force top-k cosine neighbors of each query vector.
    * The query side is broadcast (small by contract); the corpus streams
    * through one pass — no corpus shuffle. Ties break on neighbor id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                     cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    // Precompute each side's norm once per ROW before the join; computing
    // cosine() inside the join would redo both norms once per PAIR (3x the
    // flops at |Q|*|C| pairs). Same op order as cosine(), bit-identical.
    val qn = queries.withColumn("__qn", norm(col(qVec)))
    val cn = corpus.withColumn("__cn", norm(col(cVec)))
    val joined = cn.crossJoin(broadcast(qn))
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine_sim",
        dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine_sim").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"),
        col("cosine_sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: nbits x dim doubles in
    * [-1, 1), from a fixed seed. */
  private def hyperplanes(nbits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** SRP bucket id as a Column: bit b = sign of dot(vec, plane_b), packed
    * into a long. One native expression node (VectorExprs.SrpBuckets)
    * regardless of nbits. */
  private def bucketColumn(vec: String, dim: Int, nbits: Int,
                           seed: Long): Column =
    VectorFunctions.srpBuckets(col(vec), hyperplanes(nbits, dim, seed), nbits)
      .getItem(0)

  /** Random-hyperplane (SRP) LSH bucket id per vector: vectors in the same
    * bucket are near-duplicate candidates. */
  def withLshBucket(df: DataFrame, vec: String, dim: Int, nbits: Int = 16,
                    seed: Long = 42L, out: String = "lsh_bucket"): DataFrame =
    df.withColumn(out, bucketColumn(vec, dim, nbits, seed))

  /** ANN near-dup pairs via LSH: exact cosine verified inside buckets only.
    * Recall is tunable via nbits (fewer bits = bigger buckets = higher
    * recall, more compute).
    *
    * maxBucket: the self-join is O(bucket²); with few bits or degenerate
    * embeddings (all-zero vectors all hash to one bucket) a single mega
    * bucket is a shuffle bomb at corpus scale. Buckets holding more than
    * maxBucket vectors are excluded from candidate generation — same guard
    * as FuzzyDedup.jaccardPairs' maxDf. Audit what was dropped with
    * [[lshOverflowBuckets]] (same params → the excluded buckets + sizes);
    * None disables the cap. */
  def lshNearDupPairs(df: DataFrame, id: String, vec: String, dim: Int,
                      minCosine: Double, nbits: Int = 12,
                      seed: Long = 42L,
                      maxBucket: Option[Int] = Some(10000)): DataFrame = {
    val b0 = withLshBucket(df, vec, dim, nbits, seed).withColumn("__n", norm(col(vec)))
    // Column pruning means the size probe recomputes only the bucket
    // expression, not the norms; keeping this uncached trades one extra
    // scan for not caching a corpus-sized frame.
    val b = maxBucket match {
      case Some(cap) =>
        val ok = b0.groupBy("lsh_bucket").agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= cap).select("lsh_bucket")
        b0.join(ok, Seq("lsh_bucket"))
      case None => b0
    }
    val l = b.as("a")
    val r = b.as("b")
    l.join(r, col("a.lsh_bucket") === col("b.lsh_bucket") &&
        col(s"a.$id") < col(s"b.$id"))
      .withColumn("cosine_sim",
        dot(col(s"a.$vec"), col(s"b.$vec")) / (col("a.__n") * col("b.__n")))
      .filter(col("cosine_sim") >= minCosine)
      .select(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"), col("cosine_sim"))
  }

  /** Multi-table SRP-LSH near-dup pairs: `nTables` independent hyperplane
    * sets, candidate pairs unioned across tables, then exact cosine verify.
    *
    * This is the standard LSH amplification: a pair whose single-table
    * collision probability is q = (1 - theta/pi)^nbits is recalled with
    * probability 1 - (1-q)^nTables. Single-table SRP recall collapses at
    * moderate angles — at cosine 0.4, an 8-bit table catches ~2.5% of true
    * pairs; 24 tables lift that to ~45% while per-table bucket fan-out (and
    * the maxBucket cap) is unchanged. Cost is one corpus pass (all tables'
    * buckets computed in a single projection, then posexplode) plus
    * nTables× the per-table candidate join — linear amplification for
    * exponential recall gain, the knob you turn at 100 TB.
    *
    * Output pairs are distinct across tables (id1 < id2); cosine is
    * verified exactly, so precision is 1 regardless of table count. */
  def lshNearDupPairsMulti(df: DataFrame, id: String, vec: String, dim: Int,
                           minCosine: Double, nbits: Int = 8,
                           nTables: Int = 24, seed: Long = 42L,
                           maxBucket: Option[Int] = Some(10000)): DataFrame = {
    val base = df.select(col(id), col(vec)).withColumn("__n", norm(col(vec)))
    // all tables' planes in ONE SrpBuckets node: per-table seeds match the
    // single-table bucketColumn exactly, so table t's buckets here equal
    // lshNearDupPairs(seed + t)'s
    val allPlanes = (0 until nTables).flatMap(t =>
      hyperplanes(nbits, dim, seed + t))
    val tb = base.select(col(id),
      posexplode(VectorFunctions.srpBuckets(col(vec), allPlanes, nbits))
        .as(Seq("table_idx", "bucket")))
    val capped = maxBucket match {
      case Some(cap) =>
        val ok = tb.groupBy("table_idx", "bucket")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= cap).select("table_idx", "bucket")
        tb.join(ok, Seq("table_idx", "bucket"))
      case None => tb
    }
    val cand = capped.as("a").join(capped.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"))
      .distinct()
    cand
      .join(base.select(col(id).as("id1"), col(vec).as("__v1"),
        col("__n").as("__n1")), "id1")
      .join(base.select(col(id).as("id2"), col(vec).as("__v2"),
        col("__n").as("__n2")), "id2")
      .withColumn("cosine_sim",
        dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2")))
      .filter(col("cosine_sim") >= minCosine)
      .select("id1", "id2", "cosine_sim")
  }

  /** Side output for [[lshNearDupPairs]]' maxBucket cap: the buckets that
    * exceeded the cap (and were therefore dropped from candidate
    * generation), with their sizes — truncation stays visible instead of
    * silently shrinking recall. */
  def lshOverflowBuckets(df: DataFrame, vec: String, dim: Int,
                         maxBucket: Int, nbits: Int = 12,
                         seed: Long = 42L): DataFrame =
    withLshBucket(df, vec, dim, nbits, seed)
      .groupBy("lsh_bucket").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** IVF coarse quantizer: `nlist` deterministic seed centroids (every
    * corpus-size/nlist-th vector by id — cheap, reproducible; swap in
    * k-means centroids without changing the query path). Returns the
    * centroid table (cell, centroid vector). */
  def ivfCentroids(corpus: DataFrame, id: String, vec: String,
                   nlist: Int): DataFrame = {
    // TakeOrdered top-nlist by id: no corpus-wide sort/shuffle, and the
    // single-partition window below only ever sees nlist rows.
    val seeds = corpus.select(col(id), col(vec)).orderBy(col(id)).limit(nlist)
    seeds.withColumn("cell", row_number().over(Window.orderBy(col(id))) - 1)
      .select(col("cell"), col(vec).as("centroid"))
  }

  /** K-means-refined IVF centroids: Lloyd's iterations on top of the
    * deterministic seed centroids — assignment is a broadcast scan, the
    * update step averages member vectors elementwise. Deterministic
    * (seeded init, fixed iteration count) and expressed entirely in
    * DataFrame ops; localCheckpoint per round keeps the plan flat. */
  def ivfCentroidsKMeans(corpus: DataFrame, id: String, vec: String,
                         nlist: Int, iters: Int = 3): DataFrame = {
    var centroids = ivfCentroids(corpus, id, vec, nlist).localCheckpoint()
    var i = 0
    while (i < iters) {
      val assigned = ivfAssign(corpus.select(col(id), col(vec)), id, vec,
        centroids, nProbe = 1)
      // elementwise mean with CONSTANT-WIDTH partial states: posexplode each
      // member vector to (cell, pos, component) and sum/count per (cell, pos)
      // — partial aggregation (map-side combine) applies, and no per-group
      // state ever holds more than one double. The second aggregate
      // reassembles dim rows per cell (nlist x dim rows total — trivial)
      // ordered by pos. A collect_list-of-vectors update would hold
      // O(|cell| x dim) per group and OOM at corpus scale.
      centroids = assigned
        .select(col("cell"), posexplode(col(vec)).as(Seq("pos", "cmp")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("cmp").cast("double")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("s") / col("n")).cast("float").as("m")))).as("sm"))
        .select(col("cell"),
          transform(col("sm"), x => x.getField("m")).as("centroid"))
        .localCheckpoint()
      i += 1
    }
    centroids
  }

  /** Assign each vector to its nProbe nearest (max-cosine) centroid cells.
    *
    * The centroid table is nlist × dim — small BY CONTRACT (it is the
    * coarse quantizer) — so it is collected to the driver and inlined as
    * literals: assignment becomes ONE shuffle-free projection. The
    * alternative (crossJoin(broadcast) + row_number over a per-id window)
    * expands the corpus nlist× and then shuffles AND sorts the expansion
    * just to take an argmax — a corpus-wide exchange that this formulation
    * never pays, at any scale. Per-centroid norms are precomputed driver-
    * side with the same left-to-right double fold as [[norm]]
    * (bit-identical csim to the joined formulation).
    *
    * Ranking: csim desc, cell asc — encoded as natural struct ordering on
    * (csim, -cell) sorted descending, so no comparator lambda and no
    * negated float (no -0.0 edge) is involved. */
  def ivfAssign(df: DataFrame, id: String, vec: String, centroids: DataFrame,
                nProbe: Int = 1): DataFrame = {
    val cents: Array[(Int, Seq[Float], Double)] = centroids
      .select(col("cell").cast("int"), col("centroid")).collect()
      .map { r =>
        val cv = r.getSeq[Float](1)
        var acc = 0.0
        cv.foreach(x => acc += x.toDouble * x.toDouble)
        (r.getInt(0), cv, math.sqrt(acc))
      }
    val scored = array(cents.map { case (cell, cv, cn) =>
      struct(
        (dot(col(vec), typedlit(cv)) / (col("__vn") * lit(cn))).as("csim"),
        lit(-cell).as("negcell"), lit(cell).as("cell"))
    }.toIndexedSeq: _*)
    df.withColumn("__vn", norm(col(vec)))
      .withColumn("cell",
        explode(transform(slice(sort_array(scored, asc = false), 1, nProbe),
          x => x.getField("cell"))))
      .drop("__vn")
  }

  /** IVF top-k: probe the query's nProbe nearest cells and rank only the
    * corpus vectors in those cells. Recall is tunable via nlist/nProbe; the
    * corpus is scanned once to build cells and the per-query search space
    * shrinks by ~nlist/nProbe versus brute force. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
              qVec: String, cVec: String, k: Int, nlist: Int = 16,
              nProbe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val centroids =
      if (kmeansIters > 0) ivfCentroidsKMeans(corpus, cId, cVec, nlist, kmeansIters)
      else ivfCentroids(corpus, cId, cVec, nlist)
    val cells = ivfAssign(corpus, cId, cVec, centroids, nProbe = 1)
      .withColumn("__cn2", norm(col(cVec)))
    val probes = ivfAssign(queries, qId, qVec, centroids, nProbe = nProbe)
      .withColumn("__qn2", norm(col(qVec)))
    val joined = probes.join(cells, "cell")
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine_sim",
        dot(col(qVec), col(cVec)) / (col("__qn2") * col("__cn2")))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine_sim").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"),
        col("cosine_sim"), col("rank"))
  }

  /** Exact near-dup pairs within a blocking key (e.g. a cluster label or
    * LSH bucket already materialized): the oracle-checkable exact variant.
    *
    * `grid` > 1 parallelizes a SKEWED block: a block holding k rows emits
    * its k²/2 pairs from ONE join key, so a dominant block serializes on
    * a single task no matter how many executors exist (AQE's skew-join
    * split cannot help — the output, not the input, is what's quadratic).
    * The grid self-join splits each block into `grid` id-hashed groups
    * and joins on the UNORDERED group pair (min,max): a row in group g
    * replicates to the `grid` keys {(min(g,t), max(g,t))}, so every pair
    * (x, y) meets at exactly one key — (min(gx,gy), max(gx,gy)) — and a
    * hot block's quadratic spreads over grid·(grid+1)/2 independent
    * join keys. Cost: grid× row replication (vectors are small by
    * construction); identical output, any ordering. */
  def blockedNearDupPairs(df: DataFrame, id: String, vec: String,
                          block: String, minCosine: Double,
                          grid: Int = 1): DataFrame = {
    require(grid >= 1, s"grid must be >= 1: $grid")
    // zero-norm (or NaN) vectors have no defined cosine: they can never
    // satisfy a threshold, and under ANSI mode the divide would ERROR
    // rather than produce the NaN the filter would reject — drop them
    // from pairing up front (NaN > 0 is false, so NaN norms drop too)
    val withNorm = df.withColumn("__n", norm(col(vec)))
      .filter(col("__n") > lit(0d))
    val sides =
      if (grid <= 1) withNorm
      else withNorm
        .withColumn("__g", pmod(xxhash64(col(id)), lit(grid)).cast("int"))
        .withColumn("__t", explode(expr(s"sequence(0, ${grid - 1})")))
        .withColumn("__kl", least(col("__g"), col("__t")))
        .withColumn("__kr", greatest(col("__g"), col("__t")))
        .drop("__t")
    val l = sides.as("a")
    val r = sides.as("b")
    val joinCond =
      if (grid <= 1)
        col(s"a.$block") === col(s"b.$block") && col(s"a.$id") < col(s"b.$id")
      else
        // the key must BE the pair's group set: a same-group pair's two
        // rows carry identical key sets (every {g, t}), so without this
        // guard it would meet — and duplicate — at all `grid` keys
        // instead of only the diagonal (g, g); a cross-group pair meets
        // exactly at (min(gx,gy), max(gx,gy))
        col("a.__kl") === col("b.__kl") && col("a.__kr") === col("b.__kr") &&
          ((col("a.__g") === col("a.__kl") &&
            col("b.__g") === col("a.__kr")) ||
           (col("a.__g") === col("a.__kr") &&
            col("b.__g") === col("a.__kl"))) &&
          col(s"a.$block") === col(s"b.$block") && col(s"a.$id") < col(s"b.$id")
    l.join(r, joinCond)
      .withColumn("cosine_sim",
        dot(col(s"a.$vec"), col(s"b.$vec")) / (col("a.__n") * col("b.__n")))
      .filter(col("cosine_sim") >= minCosine)
      .select(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"), col("cosine_sim"))
  }
}
