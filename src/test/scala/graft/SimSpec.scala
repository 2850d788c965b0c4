package graft

import org.apache.spark.sql.functions._

import graft.sim.{Quantize, Similarity}

class SimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f), 0),
    (1L, Seq(0.9f, 0.1f, 0.0f), 0),
    (2L, Seq(0.0f, 1.0f, 0.0f), 0),
    (3L, Seq(0.0f, 0.0f, 1.0f), 1),
    (4L, Seq(0.0f, 0.1f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("dot / cosine basics") {
    val r = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("d"),
        Similarity.cosine($"a", $"a").as("self"))
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("withUnitVector normalizes to unit length") {
    val n = Similarity.withUnitVector(vecs, "embedding")
      .select(Similarity.norm($"unit_vec").as("n")).as[Double].collect()
    n.foreach(x => assert(math.abs(x - 1.0) < 1e-12))
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val q = vecs.filter($"vec_id" === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val out = Similarity.bruteForceTopK(q, vecs, "q_id", "vec_id",
      "q_vec", "embedding", k = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Int]("rank") == 1)
  }

  test("LSH bucket is deterministic and groups near duplicates") {
    val b1 = Similarity.withLshBucket(vecs, "embedding", dim = 3, nbits = 4)
      .select("vec_id", "lsh_bucket").as[(Long, Long)].collect().toMap
    val b2 = Similarity.withLshBucket(vecs, "embedding", dim = 3, nbits = 4)
      .select("vec_id", "lsh_bucket").as[(Long, Long)].collect().toMap
    assert(b1 == b2) // seeded hyperplanes -> stable
    assert(b1(0L) == b1(1L)) // near-identical vectors share a bucket
  }

  test("blockedNearDupPairs: only within-block, above threshold") {
    val out = Similarity.blockedNearDupPairs(vecs, "vec_id", "embedding",
      "label", minCosine = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((0L, 1L)) && out.contains((3L, 4L)))
    // cross-block pair (1,3) impossible even if similar
    assert(out.forall { case (a, b) => !(a == 2L && b == 3L) })
  }

  test("blockedNearDupPairs grid: identical pair set to the plain " +
      "self-join — same-group pairs meet only at the diagonal key, " +
      "cross-group pairs exactly once") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 300)
      .withColumn("b", ($"vec_id" % lit(2)).cast("int"))
    def pairs(grid: Int) = Similarity.blockedNearDupPairs(emb, "vec_id",
        "embedding", "b", minCosine = 0.2, grid = grid)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    val base = pairs(1)
    Seq(2, 4, 7).foreach { g =>
      val got = pairs(g)
      assert(got.length == got.toSet.size,
        s"grid=$g emitted duplicate pairs")
      assert(got.toSet == base.toSet,
        s"grid=$g pair set differs: ${got.size} vs ${base.size}")
    }
  }

  test("lshNearDupPairsMulti: exact precision, recall >= single table") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 200)
    val exact = Similarity.blockedNearDupPairs(
        emb.withColumn("b", lit(1)), "vec_id", "embedding", "b",
        minCosine = 0.2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshNearDupPairsMulti(emb, "vec_id", "embedding",
        dim = 64, minCosine = 0.2, nbits = 8, nTables = 24)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val single = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        dim = 64, minCosine = 0.2, nbits = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // precision 1: every emitted pair is a true pair (exact verify step)
    assert(multi.subsetOf(exact))
    // amplification: 24 tables recall at least as much as one, and
    // strictly more on this corpus
    assert(multi.size > single.size)
    assert(multi.size.toDouble / exact.size >= 0.1,
      s"multi-table recall ${multi.size}/${exact.size} below floor")
  }

  test("lshNearDupPairs maxBucket drops a mega bucket, audit sees it") {
    // 30 identical vectors all land in one bucket; cap 5 must exclude it
    // (0 pairs instead of 435) and the overflow audit must report it.
    val mega = (1L to 30L).map(i => (i, Seq(0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.lshNearDupPairs(mega, "vec_id", "embedding", dim = 3,
      minCosine = 0.9, nbits = 4, maxBucket = Some(5)).isEmpty)
    val over = Similarity.lshOverflowBuckets(mega, "embedding", dim = 3,
      maxBucket = 5, nbits = 4).collect()
    assert(over.length == 1 && over(0).getAs[Long]("bucket_size") == 30L)
    // default cap leaves the small corpus untouched
    assert(Similarity.lshNearDupPairs(mega, "vec_id", "embedding", dim = 3,
      minCosine = 0.9, nbits = 4).count() == 435L)
  }

  test("IVF top-k recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def top1(df: org.apache.spark.sql.DataFrame) = df.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = top1(Similarity.bruteForceTopK(q, emb, "q_id", "vec_id",
      "q_vec", "embedding", k = 1))
    val ivf = top1(Similarity.ivfTopK(q, emb, "q_id", "vec_id", "q_vec",
      "embedding", k = 1, nlist = 8, nProbe = 4))
    // probing half the cells must recover at least half the true top-1s
    assert((exact & ivf).size >= exact.size / 2,
      s"IVF recall too low: ${(exact & ivf).size}/${exact.size}")
    assert(ivf.size == exact.size) // every query answered
    // k-means-refined centroids: same contract, recall at least as usable
    val ivfKm = top1(Similarity.ivfTopK(q, emb, "q_id", "vec_id", "q_vec",
      "embedding", k = 1, nlist = 8, nProbe = 4, kmeansIters = 3))
    assert((exact & ivfKm).size >= exact.size / 2,
      s"kmeans-IVF recall too low: ${(exact & ivfKm).size}/${exact.size}")
    assert(ivfKm.size == exact.size)
  }

  test("k-means IVF centroids: nlist rows, dim preserved, deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c1 = Similarity.ivfCentroidsKMeans(emb, "vec_id", "embedding",
      nlist = 8, iters = 2).orderBy("cell").collect()
    val c2 = Similarity.ivfCentroidsKMeans(emb, "vec_id", "embedding",
      nlist = 8, iters = 2).orderBy("cell").collect()
    assert(c1.length <= 8 && c1.nonEmpty)
    assert(c1.forall(_.getSeq[Float](1).length == 64))
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq)
  }

  test("int8 quantize: values in range, reconstruction error <= scale/2") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
    val q = Quantize.quantizeInt8(emb, "embedding")
    val rows = Quantize.dequantize(q, "q_vec", "q_scale", "deq")
      .select($"embedding", $"q_vec", $"q_scale", $"deq").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val orig = r.getSeq[Float](0)
      val qv = r.getSeq[Int](1)
      val scale = r.getDouble(2)
      val deq = r.getSeq[Float](3)
      assert(qv.forall(v => v >= -127 && v <= 127))
      // half-up rounding puts the reconstruction within scale/2 + float eps
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= scale / 2 + 1e-4,
          s"err ${math.abs(o - d)} vs scale $scale")
      }
    }
    // zero vector: scale 0, all-zero codes, no NaN
    val z = Quantize.quantizeInt8(
      Seq((1L, Seq(0.0f, 0.0f))).toDF("id", "embedding"), "embedding")
      .select($"q_scale", $"q_vec").collect().head
    assert(z.getDouble(0) == 0.0 && z.getSeq[Int](1).forall(_ == 0))
  }

  test("DotProduct runs inside WholeStageCodegen (no fallback)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(Similarity.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // codegen stages are starred; the HOF formulation this replaced was
    // CodegenFallback and would not appear inside a *(n) Project
    assert(plan.contains("*(1) Project") && plan.contains("vec_dot"), plan)
  }

  test("DotProduct matches the HOF fold incl. null / mismatch semantics") {
    import org.apache.spark.sql.types.DoubleType
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)),   // mixed float/double
      (Seq(0.5f, -1.5f, 2.5f), Seq(2.0, 2.0, 2.0)))
      .toDF("a", "b")
    val hof = df.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x).as("d")).as[Double].collect().toSeq
    val native = df.select(Similarity.dot($"a", $"b").as("d"))
      .as[Double].collect().toSeq
    assert(native == hof) // bit-identical sequential fold
    // null element and length mismatch -> null, like the HOF formulation
    val edge = Seq(
      (Seq[java.lang.Float](1.0f, null), Seq(1.0, 1.0)),
      (Seq[java.lang.Float](1.0f), Seq(1.0, 1.0)))
      .toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("d")).collect()
    assert(edge.forall(_.isNullAt(0)))
    // SQL surface
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("vec_dot_t")
    val sql = spark.sql("SELECT vec_dot(a, b) AS d FROM vec_dot_t")
      .as[Double].collect().toSeq
    assert(sql == hof)
  }

  test("SemDedup: sign cells bound the verify; min-id survives its cluster") {
    // ids 1,2: same direction (cosine 1) in cell 0b01; id 3: same cell,
    // near-orthogonal; id 4: opposite signs -> different cell, never
    // compared even though it duplicates id 1's direction after abs()
    val df = Seq(
      (1L, Seq(1.0f, -1.0f)),
      (2L, Seq(2.0f, -2.0f)),
      (3L, Seq(1.0f, -0.001f)),
      (4L, Seq(-1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cells = graft.sim.SemDedup.withSignCell(df, "embedding", signBits = 2)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(cells(1L) == 1 && cells(2L) == 1 && cells(3L) == 1)
    assert(cells(4L) == 2)
    val kept = graft.sim.SemDedup
      .semanticDedup(df, "vec_id", "embedding", minCosine = 0.95, signBits = 2)
      .select("vec_id").as[Long].collect().toSet
    // 2 collapses into 1 (same cell, cosine 1); 3 and 4 survive
    assert(kept == Set(1L, 3L, 4L))
  }

  test("SemDedup: identical ZERO vectors never collapse (undefined cosine)") {
    // cosine(0⃗, 0⃗) = 0/0 = NaN, which the verify never accepts — the
    // exact-copy collapse must not merge what the verify would keep apart
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // identical zero vector
      (3L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f))) // identical NON-zero: collapses
      .toDF("vec_id", "embedding")
    val kept = graft.sim.SemDedup
      .semanticDedup(df, "vec_id", "embedding", minCosine = 0.9, signBits = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("Spectral: planted dominant direction recovered; projection exact") {
    // axis 0 carries 10x the variance of axis 1: pc1 must align with e1
    val rows = Seq(
      (1L, Seq(10.0f, 1.0f, 0.0f)), (2L, Seq(-10.0f, 1.0f, 0.0f)),
      (3L, Seq(8.0f, -1.0f, 0.0f)), (4L, Seq(-8.0f, -1.0f, 0.0f)),
      (5L, Seq(6.0f, 0.5f, 0.0f)), (6L, Seq(-6.0f, -0.5f, 0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val gram = graft.sim.Spectral.gramFixedPoint(df, "embedding").collect()
    // diagonal (0,0) in fixed point: sum(x0²)·(2^12)² exactly
    val g00 = gram.find(r => r.getAs[Int]("i") == 0 && r.getAs[Int]("j") == 0)
      .get.getAs[Long]("g")
    val exp00 = rows.map(r => math.round(r._2.head * 4096.0)).map(q => q * q).sum
    assert(g00 == exp00)
    val pc = graft.sim.Spectral.topComponent(gram.toSeq, dim = 3)
    assert(math.abs(pc(0)) > 0.99, s"pc1 must align with axis 0: ${pc.toSeq}")
    assert(pc(0) > 0, "sign convention: largest coordinate positive")
    val proj = graft.sim.Spectral.principalProjection(df, "embedding", dim = 3)
      .select("vec_id", "pc1_score").as[(Long, Double)].collect().toMap
    // scores order by the axis-0 coordinate and split by its sign
    assert(proj(1L) > proj(3L) && proj(3L) > proj(5L))
    assert(proj(2L) < proj(4L) && proj(4L) < proj(6L))
    assert(proj(1L) > 0 && proj(2L) < 0)
  }

  test("AnnIndex: CDC-maintained IVF index — frozen centroids, " +
      "incremental refresh, erase, exact at nProbe=nlist, rebuild cap") {
    import graft.ops.VersionedTable
    import graft.sim.AnnIndex
    val base = java.nio.file.Files.createTempDirectory("graft_annidx")
    val (src, idx) = (s"$base/src", s"$base/idx")
    val rnd = new scala.util.Random(7)
    def v(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(8)(r.nextFloat() - 0.5f)
    }
    val corpus = (0L until 40L).map(i =>
      (i, v(i.toInt), (i % 4).toInt)).toSeq
    VersionedTable.upsert(spark, src,
      corpus.toDF("vec_id", "embedding", "grp"),
      Seq("vec_id", "grp"), Seq("grp"))
    AnnIndex.create(spark, idx, src, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2)
    assert(AnnIndex.lastRefreshRebuild &&
      AnnIndex.lastRefreshVectors == 40)
    def queries = Seq((100L, v(1000))).toDF("q_id", "q_vec")
    // nProbe = nlist: the persisted-index answer IS brute force
    def indexed(k: Int) = AnnIndex.topK(spark, idx, queries, "q_id",
        "q_vec", k, nProbe = 4)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    def brute(k: Int) = Similarity.bruteForceTopK(queries,
        VersionedTable.read(spark, src), "q_id", "vec_id", "q_vec",
        "embedding", k)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    assert(indexed(5) == brute(5))
    // incremental refresh: 2 new vectors + 1 update + 1 delete = 4
    // changed ids, feed-sized work
    VersionedTable.upsert(spark, src,
      Seq((50L, v(50), 0), (51L, v(51), 1), (3L, v(9999), 3))
        .toDF("vec_id", "embedding", "grp"),
      Seq("vec_id", "grp"), Seq("grp"))
    VersionedTable.deleteMatching(spark, src, $"vec_id" === 7L)
    AnnIndex.refresh(spark, idx)
    assert(!AnnIndex.lastRefreshRebuild &&
      AnnIndex.lastRefreshVectors == 4,
      s"refresh processed ${AnnIndex.lastRefreshVectors}")
    assert(indexed(8) == brute(8)) // still exact: erase + reassign held
    assert(!indexed(40).map(_._1).contains(7L))
    // partition pruning: probing 1 of 4 cells reads fewer index files
    // than probing all 4 (the cell IN-set reaches the dir selection)
    val f1 = VersionedTable.physicalInputFiles(
      AnnIndex.topK(spark, idx, queries, "q_id", "q_vec", 3, nProbe = 1))
    val f4 = VersionedTable.physicalInputFiles(
      AnnIndex.topK(spark, idx, queries, "q_id", "q_vec", 3, nProbe = 4))
    assert(f1 < f4, s"cell pruning did not bite: $f1 vs $f4")
    // idempotent no-op replay
    val ver = AnnIndex.refresh(spark, idx)
    assert(AnnIndex.refresh(spark, idx) == ver)
    // mass-change fallback: cap 2, touch 3 -> rebuild (centroids retrain)
    spark.conf.set("spark.graft.annindex.idCap", "2")
    try {
      VersionedTable.upsert(spark, src,
        Seq((60L, v(60), 0), (61L, v(61), 1), (62L, v(62), 2))
          .toDF("vec_id", "embedding", "grp"),
        Seq("vec_id", "grp"), Seq("grp"))
      AnnIndex.refresh(spark, idx)
      assert(AnnIndex.lastRefreshRebuild)
      assert(indexed(10) == brute(10))
    } finally spark.conf.unset("spark.graft.annindex.idCap")
  }

  test("AnnIndex quantized: int8 rows + float re-rank — exact sims, " +
      "smaller storage, incremental refresh, spec roundtrip") {
    import graft.ops.VersionedTable
    import graft.sim.AnnIndex
    val base = java.nio.file.Files.createTempDirectory("graft_annq")
    val (src, idxQ, idxF) = (s"$base/src", s"$base/q", s"$base/f")
    def v(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(32)(r.nextFloat() - 0.5f)
    }
    // enough rows that DATA bytes dominate parquet footer overhead —
    // the storage assertion below is about the data, not tiny-file tax
    VersionedTable.upsert(spark, src,
      (0L until 2000L).map(i => (i, v(i.toInt), (i % 2).toInt))
        .toDF("vec_id", "embedding", "grp"),
      Seq("vec_id", "grp"), Seq("grp"))
    AnnIndex.create(spark, idxQ, src, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2, quantized = true)
    AnnIndex.create(spark, idxF, src, "vec_id", "embedding",
      nlist = 4, kmeansIters = 2)
    assert(AnnIndex.readSpec(spark, idxQ).quantized)
    assert(!AnnIndex.readSpec(spark, idxF).quantized)
    // the index table stores codes, never the float vector
    val qCols = VersionedTable.read(spark, idxQ).columns.toSet
    assert(qCols.contains("__qv") && qCols.contains("__qs") &&
      !qCols.contains("embedding"), qCols.toString)
    def queries = Seq((100L, v(1000)), (101L, v(2000)))
      .toDF("q_id", "q_vec")
    def top(idx: String, k: Int) = AnnIndex.topK(spark, idx, queries,
        "q_id", "q_vec", k, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"cosine_sim", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // nProbe = nlist + float re-rank: same answers AND the IDENTICAL
    // float-exact cosines as the float index (deterministic corpus)
    assert(top(idxQ, 5) == top(idxF, 5))
    // storage: quantized table bytes under half the float table's
    def bytes(root: String) = VersionedTable.partitionsMeta(spark, root)
      .agg(sum($"bytes")).first.getLong(0)
    assert(bytes(idxQ) * 2 < bytes(idxF),
      s"quantized ${bytes(idxQ)} vs float ${bytes(idxF)}")
    // incremental refresh stays feed-sized and exact in quantized mode
    VersionedTable.upsert(spark, src,
      Seq((7000L, v(70), 0), (5L, v(5555), 1))
        .toDF("vec_id", "embedding", "grp"),
      Seq("vec_id", "grp"), Seq("grp"))
    VersionedTable.deleteMatching(spark, src, $"vec_id" === 9L)
    AnnIndex.refresh(spark, idxQ)
    assert(!AnnIndex.lastRefreshRebuild &&
      AnnIndex.lastRefreshVectors == 3)
    AnnIndex.refresh(spark, idxF)
    assert(top(idxQ, 8) == top(idxF, 8))
    assert(!top(idxQ, 40).exists(_._2 == 9L))
  }
}