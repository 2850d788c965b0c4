package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.dedup.FuzzyDedup
import graft.ops.Merge
import graft.sim.Similarity

/** Seeded randomized invariants: each case runs against a reference
  * implementation (driver-side brute force or an independent formulation)
  * over several seeds. Deterministic — seeds are fixed — but the inputs are
  * adversarially shaped (random graphs, random vectors, random upserts)
  * rather than hand-picked. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("intervalOverlapPairs matches brute force on random keyed intervals") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new Random(seed)
      // duplicates, touching endpoints, zero-length intervals — and
      // INVERTED intervals (end < start, ~1/4 of rows): the synthetic
      // fulfillment data carries o_orderdate > l_shipdate on ~half its
      // rows, and the declared (C − n)/2 self-join semantics over
      // inverted rows is exactly what a sorted-rank rewrite got wrong
      // in round 12 (see intervalOverlapPairs' scaladoc) — this
      // generator keeps that trap pinned
      val rows = Seq.fill(300) {
        val k = s"k${rnd.nextInt(8)}"
        val s = rnd.nextInt(40).toLong
        val span = rnd.nextInt(6).toLong
        if (rnd.nextInt(4) == 0) (k, s + span, s) else (k, s, s + span)
      }
      val got = graft.ops.RangeJoin
        .intervalOverlapPairs(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
        .collect().map(r => r.getAs[String]("k") ->
          (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_overlap_pairs")))
        .toMap
      val brute = rows.groupBy(_._1).flatMap { case (k, iv) =>
        // mirror the DECLARED arithmetic exactly: (C − n)/2 over ordered
        // row pairs INCLUDING self-pairs. For well-formed inputs this is
        // the unordered overlap-pair count; for inverted rows (whose
        // self-pair fails the predicate) it is NOT — the truncated
        // (C − n)/2 is the operator's (and its oracle's) contract
        val c = (for (a <- iv; b <- iv
            if a._2 <= b._3 && b._2 <= a._3) yield 1).size
        val pairs = (c - iv.size) / 2
        if (pairs > 0) Some(k -> (iv.size.toLong, pairs.toLong)) else None
      }
      assert(got == brute, s"seed $seed")
    }
    // independent check on the WELL-FORMED-ONLY subset: there (C − n)/2
    // IS the true unordered overlap-pair count, counted here directly
    // over pairs — this assertion does not mirror the implementation's
    // arithmetic, so a shared misconception in the formula itself (not
    // just a divergence from it) would fail this leg
    for (seed <- Seq(7, 41)) {
      val rnd = new Random(seed)
      val rows = Seq.fill(300) {
        val k = s"k${rnd.nextInt(8)}"
        val s = rnd.nextInt(40).toLong
        (k, s, s + rnd.nextInt(6).toLong)
      }
      val got = graft.ops.RangeJoin
        .intervalOverlapPairs(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
        .collect().map(r => r.getAs[String]("k") ->
          r.getAs[Long]("n_overlap_pairs")).toMap
      val truePairs = rows.groupBy(_._1).flatMap { case (k, iv) =>
        val n = (for {
          i <- iv.indices; j <- (i + 1) until iv.size
          if iv(i)._2 <= iv(j)._3 && iv(j)._2 <= iv(i)._3
        } yield 1).size
        if (n > 0) Some(k -> n.toLong) else None
      }
      assert(got == truePairs, s"well-formed seed $seed")
    }
  }

  test("upsertParquetPruned equals the logical upsert on random composite layouts") {
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_merge$seed").toString
      val tbl = s"$dir/tbl"
      // non-canonical string partition values on BOTH levels — the class
      // partition-type inference corrupts ('01' -> 1, '1.50' -> 1.5)
      val srcs = Seq("01", "1.50", "s3")
      val days = (1 to 9).map(d => f"0$d")
      def randRows(n: Int) = Seq.fill(n)((rnd.nextInt(40),
        srcs(rnd.nextInt(srcs.size)), days(rnd.nextInt(days.size)),
        rnd.nextInt(1000)))
      val target = randRows(120).distinctBy(r => (r._1, r._2, r._3))
      val updates = randRows(60).distinctBy(r => (r._1, r._2, r._3))
      val keys = Seq("id", "src", "day")
      target.toDF("id", "src", "day", "v")
        .write.partitionBy("src", "day").parquet(tbl)
      Merge.upsertParquetPruned(spark, tbl,
        updates.toDF("id", "src", "day", "v"), keys, Seq("src", "day"))
      // read back with partition-type inference OFF: the on-disk dirs are
      // day=05 etc., and inference would lossily parse them to int 5 —
      // exactly the corruption the operator guards against; the check here
      // is that the TABLE is exact, so the observer must be exact too
      val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prevInfer = spark.conf.get(inferKey)
      val got =
        try {
          spark.conf.set(inferKey, "false")
          spark.read.parquet(tbl)
            .select($"id", $"src", $"day", $"v")
            .as[(Int, String, String, Int)].collect().toSet
        } finally spark.conf.set(inferKey, prevInfer)
      // no stray sibling dirs from a lossy rewrite (e.g. day=5 next to
      // day=05): every leaf dir name must render an expected value
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(tbl), spark.sparkContext.hadoopConfiguration)
      val dayDirs = fs.listStatus(new org.apache.hadoop.fs.Path(tbl))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("src="))
        .flatMap(s => fs.listStatus(s.getPath))
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      assert(dayDirs.forall(d => days.contains(d.stripPrefix("day="))),
        s"stray partition dirs: $dayDirs seed $seed")
      val updKeys = updates.map(r => (r._1, r._2, r._3)).toSet
      val logical = updates.toSet ++
        target.filterNot(r => updKeys.contains((r._1, r._2, r._3)))
      assert(got == logical, s"seed $seed")
    }
  }

  test("prefixJaccardPairs equals driver brute force on random shingle sets") {
    for ((seed, t) <- Seq((17, 0.5), (41, 0.7))) {
      val rnd = new Random(seed)
      // 60 docs over a small hash universe -> plenty of overlapping pairs,
      // adversarial sizes (tiny docs, near-identical docs, df-heavy keys)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
      for (i <- 0 until 60) {
        val base = Seq.fill(3 + rnd.nextInt(25))(rnd.nextInt(80).toLong)
        val set = if (i % 7 == 0 && i > 0)
          // near-copy of the previous doc with light edits
          (buf(i - 1)._2 ++ Seq.fill(2)(rnd.nextInt(80).toLong)).distinct
        else base.distinct
        buf += ((i.toLong, set))
      }
      val docs = buf.toSeq
      val sh = docs.flatMap { case (id, hs) => hs.map(h => (id, h)) }
        .toDF("id", "h64")
      val got = FuzzyDedup.prefixJaccardPairs(sh, None, minJaccard = t,
          maxDf = None)
        .select($"id1", $"id2", $"n_common", $"jaccard")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2, r._3)).toSet
      val sets = docs.map { case (id, hs) => id -> hs.toSet }.toMap
      val brute = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        inter = (sets(a) & sets(b)).size
        if inter > 0 &&
          inter.toDouble / (sets(a).size + sets(b).size - inter) >= t
      } yield (a, b, inter.toLong)).toSet
      assert(got == brute, s"seed $seed t $t")
    }
  }

  test("zIntervalsForBox covers exactly the box z-set on random boxes") {
    // 6-bit grid: every z-value enumerable, so the claim is checked
    // exhaustively — unlimited budget decomposes EXACTLY; a tight budget
    // still covers (superset) within the interval cap
    def z(x: Long, y: Long): Long = {
      var r = 0L
      for (i <- 0 until 6) {
        r |= ((x >> i) & 1L) << (2 * i)
        r |= ((y >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    for (seed <- Seq(2, 19, 57)) {
      val rnd = new Random(seed)
      for (_ <- 0 until 25) {
        val (a, b) = (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong)
        val (c, d) = (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong)
        val (xlo, xhi) = (math.min(a, b), math.max(a, b))
        val (ylo, yhi) = (math.min(c, d), math.max(c, d))
        val boxZ = (for (x <- xlo to xhi; y <- ylo to yhi) yield z(x, y)).toSet
        val exact = graft.ops.ZOrder.zIntervalsForBox(xlo, xhi, ylo, yhi,
          bits = 6, maxIntervals = Int.MaxValue)
        val exactSet = exact.flatMap { case (lo, hi) => lo to hi }.toSet
        assert(exactSet == boxZ, s"exact decomposition seed $seed " +
          s"box ($xlo,$xhi,$ylo,$yhi)")
        // sorted, disjoint, non-adjacent (merged)
        exact.sliding(2).foreach {
          case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2)
          case _ =>
        }
        val budgeted = graft.ops.ZOrder.zIntervalsForBox(xlo, xhi, ylo, yhi,
          bits = 6, maxIntervals = 8)
        assert(budgeted.size <= 8)
        val budgetSet = budgeted.flatMap { case (lo, hi) => lo to hi }.toSet
        assert(boxZ.subsetOf(budgetSet),
          s"budgeted cover lost z-values seed $seed")
      }
    }
  }

  test("zIntervalsForBoxN covers exactly the N-D box z-set (3-D and " +
      "4-D exhaustive small-bit grids)") {
    // independent reimplementation of the N-D interleave: z bit
    // i*N + j = bit i of key j (zValueN's layout)
    def z(cs: Seq[Long], bits: Int): Long = {
      val n = cs.length
      var r = 0L
      for (i <- 0 until bits; j <- 0 until n)
        r |= ((cs(j) >> i) & 1L) << (i * n + j)
      r
    }
    for (seed <- Seq(5, 23); n <- Seq(3, 4)) {
      val bits = if (n == 3) 4 else 3 // 16^3 / 8^4 grids, enumerable
      val side = 1 << bits
      val rnd = new Random(seed * 10 + n)
      for (_ <- 0 until 15) {
        val box = Seq.fill(n) {
          val (a, b) = (rnd.nextInt(side).toLong, rnd.nextInt(side).toLong)
          (math.min(a, b), math.max(a, b))
        }
        def cells(dims: Seq[(Long, Long)]): Seq[Seq[Long]] = dims match {
          case Nil => Seq(Nil)
          case (lo, hi) +: rest =>
            for (v <- lo to hi; t <- cells(rest)) yield v +: t
        }
        val boxZ = cells(box).map(z(_, bits)).toSet
        val exact = graft.ops.ZOrder.zIntervalsForBoxN(box, bits,
          maxIntervals = Int.MaxValue)
        assert(exact.flatMap { case (lo, hi) => lo to hi }.toSet == boxZ,
          s"exact N-D decomposition seed $seed n $n box $box")
        exact.sliding(2).foreach { // sorted, disjoint, merged
          case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2)
          case _ =>
        }
        val budgeted = graft.ops.ZOrder.zIntervalsForBoxN(box, bits,
          maxIntervals = 16)
        assert(budgeted.size <= 16)
        assert(boxZ.subsetOf(
          budgeted.flatMap { case (lo, hi) => lo to hi }.toSet),
          s"budgeted N-D cover lost z-values seed $seed n $n")
      }
    }
  }

  test("pruned reads equal the full filter on random tables and predicates") {
    import graft.ops.VersionedTable
    for (seed <- Seq(9, 61)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_prune$seed").toString
      val root = s"$dir/table"
      // random rows incl. nulls in the stats column; random file split
      val rows = (0 until 300).map { i =>
        (i, s"g${rnd.nextInt(3)}",
          if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(1000)),
          s"k${rnd.nextInt(500)}")
      }
      VersionedTable.upsert(spark, root,
        rows.toDF("id", "grp", "v", "k"), Seq("id", "grp"), Seq("grp"),
        statsCols = Seq("v"), fileRows = Some(10 + rnd.nextInt(40)),
        bloomCols = Seq("k"))
      val full = VersionedTable.read(spark, root)
      for (_ <- 0 until 12) {
        val a = rnd.nextInt(1100) - 50
        val b = a + rnd.nextInt(300)
        val got = VersionedTable.readWhere(spark, root, "v", a, b)
          .select($"id").as[Int].collect().toSet
        val want = full.filter($"v" >= a && $"v" <= b)
          .select($"id").as[Int].collect().toSet
        assert(got == want, s"range [$a,$b] seed $seed")
        val needle = s"k${rnd.nextInt(600)}" // sometimes absent
        val gotEq = VersionedTable.readWhereEq(spark, root, "k", needle)
          .select($"id").as[Int].collect().toSet
        val wantEq = rows.filter(_._4 == needle).map(_._1).toSet
        assert(gotEq == wantEq, s"eq $needle seed $seed")
        // the optimizer-rule path with a random cross-column conjunction
        val viaRule = graft.plans.VersionedScan.table(spark, root)
          .filter($"v" >= a && $"v" <= b && $"k" === needle)
          .select($"id").as[Int].collect().toSet
        assert(viaRule == (want intersect wantEq),
          s"rule conjunction [$a,$b] x $needle seed $seed")
      }
    }
  }

  test("deleteWhere equals a driver-side filter over random delete sequences") {
    import graft.ops.VersionedTable
    for (seed <- Seq(7, 43)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_del$seed").toString
      val root = s"$dir/table"
      var live: Map[Int, (String, Option[Int])] = (0 until 250).map { i =>
        i -> (s"g${rnd.nextInt(4)}",
          if (rnd.nextInt(15) == 0) None else Some(rnd.nextInt(500)))
      }.toMap
      VersionedTable.upsert(spark, root,
        live.toSeq.map { case (id, (g, v)) => (id, g, v) }
          .toDF("id", "grp", "v"),
        Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"),
        fileRows = Some(15 + rnd.nextInt(30)))
      // a chain of random deletes, including empty-overlap and wide ones
      for (_ <- 0 until 5) {
        val a = rnd.nextInt(700) - 100
        val b = a + rnd.nextInt(250)
        VersionedTable.deleteWhere(spark, root, "v", a, b,
          fileRows = Some(20))
        live = live.filter { case (_, (_, v)) =>
          v.forall(x => x < a || x > b) } // NULLs always survive
        val got = VersionedTable.read(spark, root)
          .select($"id", $"grp", $"v")
          .as[(Int, String, Option[Int])].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        assert(got == live, s"delete [$a,$b] seed $seed")
      }
      // every intermediate version still reproduces under time travel
      val versions = VersionedTable.history(spark, root)
      assert(VersionedTable.read(spark, root, Some(versions.head))
        .count() == 250)
    }
  }

  test("changeFeed matches a driver-side map diff on random version pairs") {
    for (seed <- Seq(13, 31)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_prop_cdf$seed").toString
      val root = s"$dir/table"
      val keys = Seq("id", "day")
      def randRows(n: Int) = Seq.fill(n)((rnd.nextInt(30),
        s"d${rnd.nextInt(5)}", rnd.nextInt(4)))
        .distinctBy(r => (r._1, r._2))
      val v0 = randRows(40)
      val upd = randRows(25)
      graft.ops.VersionedTable.upsert(spark, root,
        v0.toDF("id", "day", "v"), keys, "day")
      graft.ops.VersionedTable.upsert(spark, root,
        upd.toDF("id", "day", "v"), keys, "day")
      val got = graft.ops.VersionedTable.changeFeed(spark, root, keys, 0, 1)
        .select($"op", $"id", $"day", $"v")
        .as[(String, Int, String, Int)].collect().toSet
      val m0 = v0.map(r => (r._1, r._2) -> r._3).toMap
      // v1 = upd wins on key, v0 survivors otherwise; upsert never deletes
      val m1 = m0 ++ upd.map(r => (r._1, r._2) -> r._3).toMap
      val expected = m1.flatMap { case ((id, day), v) =>
        m0.get((id, day)) match {
          case None => Some(("insert", id, day, v))
          case Some(old) if old != v => Some(("update", id, day, v))
          case _ => None
        }
      }.toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("connectedComponents: driver and distributed paths match brute force") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val n = 120
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // driver-side brute force union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      val pairs = edges.toDF("id1", "id2")
      val viaDriver = FuzzyDedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      val viaDistributed = FuzzyDedup.connectedComponents(pairs,
          driverThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(viaDriver == expected, s"driver path diverged at seed $seed")
      assert(viaDistributed == expected,
        s"distributed path diverged at seed $seed")
    }
  }

  test("VoteArgMax matches brute force under any partitioning (merge path)") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new Random(seed)
      // (group, votes, label): duplicate (votes) values force the ASC
      // label tie-break; multiple partitionings force different
      // partial/merge shapes — the result must not depend on either
      val rows = Seq.fill(400)(
        (rnd.nextInt(12).toLong, rnd.nextInt(5).toLong + 1L,
          rnd.nextInt(40).toLong))
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map { case (_, n, l) => (n, l) }
          .maxBy { case (n, l) => (n, -l) }._2
      }
      for (parts <- Seq(1, 3, 17)) {
        val got = rows.toDF("g", "n", "l").repartition(parts)
          .groupBy("g")
          .agg(graft.functions.VoteArgMax.voteArgMax(col("n"), col("l"))
            .as("top"))
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"seed=$seed parts=$parts")
      }
    }
    // NULL handling: null votes/labels are skipped; all-null group -> NULL
    val df = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(5L), Some(10L)), (1L, None, Some(3L)), (1L, Some(5L), None),
      (2L, None, None))
      .toDF("g", "n", "l")
      .groupBy("g")
      .agg(graft.functions.VoteArgMax.voteArgMax(col("n"), col("l"))
        .as("top"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(df == Map(1L -> Some(10L), 2L -> None))
  }

  test("SrpBuckets equals the declarative when(dot >= 0) formulation") {
    val dim = 8; val nbits = 6; val nTables = 3
    for (seed <- Seq(2, 13)) {
      val rnd = new Random(seed)
      val vecs = Seq.fill(25)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
      val planes = {
        val r2 = new Random(seed + 100)
        Seq.fill(nTables * nbits)(Seq.fill(dim)(r2.nextDouble() * 2 - 1))
      }
      val native = vecs.select($"id",
          graft.functions.VectorFunctions.srpBuckets($"vec", planes, nbits)
            .as("b"))
        .as[(Long, Seq[Long])].collect().toMap
      // independent formulation: per-bit HOF dot + when/otherwise OR-fold
      def hofDot(v: org.apache.spark.sql.Column, p: Seq[Double]) =
        aggregate(zip_with(v, typedlit(p),
            (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x)
      val declarative = vecs.select($"id", array((0 until nTables).map { t =>
          (0 until nbits).map { b =>
            when(hofDot($"vec", planes(t * nbits + b)) >= 0, lit(1L << b))
              .otherwise(lit(0L))
          }.reduce((a, b) => a.bitwiseOR(b))
        }: _*).as("b"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == declarative, s"bucket mismatch at seed $seed")
    }
  }

  test("Merge.upsert is idempotent and a second apply is a no-op") {
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      val target = (0 until 40).map(i => (i.toLong, rnd.nextDouble()))
        .toDF("k", "v")
      val updates = (0 until 30).map(_ =>
          (rnd.nextInt(60).toLong, rnd.nextDouble()))
        .groupBy(_._1).map(_._2.head).toSeq  // unique keys
        .toDF("k", "v")
      val once = Merge.upsert(target, updates, Seq("k"))
      val twice = Merge.upsert(once, updates, Seq("k"))
      val a = once.as[(Long, Double)].collect().toSet
      val b = twice.as[(Long, Double)].collect().toSet
      assert(a == b, s"upsert not idempotent at seed $seed")
      // every update key carries the update's value; untouched keys remain
      val updMap = updates.as[(Long, Double)].collect().toMap
      val tgtMap = target.as[(Long, Double)].collect().toMap
      assert(a == (tgtMap ++ updMap).toSet)
    }
  }

  test("editDistancePairs matches a brute-force driver computation") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val alphabet = "abcd"
      val docs = (0 until 30).map { i =>
        val len = 4 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(4))).mkString, "x")
      }
      val maxDist = 4
      val expected = (for {
        (i1, t1, _) <- docs; (i2, t2, _) <- docs
        if i1 < i2 && lev(t1, t2) <= maxDist
      } yield (i1, i2, lev(t1, t2))).toSet
      val got = FuzzyDedup.editDistancePairs(
          docs.toDF("doc_id", "text", "blk"), "doc_id", "text", "blk",
          maxDist)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected, s"editdist mismatch at seed $seed")
    }
  }

  test("tokenPack + chunkByTokens: offsets match a driver-side fold") {
    import graft.ops.Curate
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val docs = (1L to 400L).map(i =>
        (i, s"p${rnd.nextInt(3)}", rnd.nextInt(900).toLong + 1))
      val df = docs.toDF("doc_id", "part", "n_tokens").repartition(7)
      val budget = 512L
      // driver reference: running-sum fold per partition in doc_id order
      val expected = docs.groupBy(_._2).flatMap { case (_, group) =>
        group.sortBy(_._1).scanLeft((0L, 0L, 0L)) {
          case ((_, _, acc), (id, _, n)) => (id, acc, acc + n)
        }.drop(1).map { case (id, start, _) => id -> (start, start / budget) }
      }.toMap
      val got = Curate.tokenPack(df, Seq("part"), Seq($"doc_id"),
          "n_tokens", budget)
        .select("doc_id", "start_offset", "pack_id")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == expected, s"pack mismatch at seed $seed")
      // chunking invariants on the same docs: full coverage, correct stride
      val chunks = Curate.chunkByTokens(
          df.select($"doc_id", $"n_tokens"), "n_tokens", 128, 32)
        .select("doc_id", "chunk_id", "tok_start", "tok_end")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
      docs.foreach { case (id, _, n) =>
        val cs = chunks(id)
        assert(cs.head._3 == 0L && cs.last._4 == n, s"doc $id coverage")
        cs.foreach { case (_, cid, s, e) =>
          assert(s == cid * 96 && e == math.min(s + 128, n))
        }
        // every token position is inside at least one chunk
        assert(cs.sliding(2).forall {
          case Seq(a, b) => b._3 < a._4
          case _ => true
        }, s"doc $id gap")
      }
    }
  }

  test("snapshotDiff: random overlapping snapshots match a map-based diff") {
    for (seed <- Seq(9, 31)) {
      val rnd = new Random(seed)
      def snap(): Map[Long, String] =
        (1L to 200L).filter(_ => rnd.nextDouble() < 0.7)
          .map(k => k -> s"v${rnd.nextInt(4)}").toMap
      val oldM = snap(); val newM = snap()
      val expected =
        (newM.keySet -- oldM.keySet).map(_ -> "added") ++
        (oldM.keySet -- newM.keySet).map(_ -> "removed") ++
        (oldM.keySet & newM.keySet).filter(k => oldM(k) != newM(k))
          .map(_ -> "changed")
      val got = Merge.snapshotDiff(
          oldM.toSeq.toDF("id", "payload").repartition(5),
          newM.toSeq.toDF("id", "payload").repartition(3),
          Seq("id"), Seq("payload"))
        .as[(Long, String)].collect().toSet
      assert(got == expected.toSet, s"diff mismatch at seed $seed")
    }
  }

  test("heavyHitters: MG recall guarantee vs exact counts, any ordering") {
    import graft.ops.Frequency
    for (seed <- Seq(3, 11, 77)) {
      val rnd = new Random(seed)
      // zipf-ish: a few hot keys in a sea of 5000 singletons-ish keys —
      // cardinality far above k, so eviction churns constantly
      val hot = Seq.fill(4000)(s"hot${rnd.nextInt(6)}")
      val cold = Seq.fill(6000)(s"cold${rnd.nextInt(5000)}")
      // adversarial order: all cold traffic first, hot keys last (worst
      // case for counter eviction), then the reverse via random shuffle
      for (stream <- Seq(cold ++ hot, rnd.shuffle(cold ++ hot))) {
        val df = stream.toDF("k").repartition(13) // many partials to merge
        val n = stream.size
        val k = 50
        val minFrac = 0.03 // > 1/50
        val expected = stream.groupBy(identity).view.mapValues(_.size.toLong)
          .filter(_._2 > n * minFrac).toMap
        val got = Frequency.heavyHitters(df, "k", k, minFrac)
          .as[(String, Long)].collect().toMap
        assert(got == expected, s"hh mismatch at seed $seed")
      }
    }
  }

  test("globalSortIndex: a contiguous permutation matching a driver md5 sort") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    for (seed <- Seq(2, 13)) {
      val rnd = new Random(seed)
      // adversarial: sparse, duplicated-free random ids incl. negatives
      val ids = Seq.fill(400)(rnd.nextLong() % 100000L).distinct
      val got = graft.ops.Curate.globalSortIndex(ids.toDF("id"), $"id",
          seed = s"s$seed")
        .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
      val expected = ids.sortBy(i => md5hex(s"${i}s$seed")).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      assert(got == expected, s"permutation mismatch at seed $seed")
      assert(got.values.toSeq.sorted == (1L to ids.size))
    }
  }

  test("histogram: bin mass sums to non-null row count, bounds consistent") {
    for (seed <- Seq(3, 11)) {
      val rnd = new Random(seed)
      val rows = Seq.fill(500)(
        (if (rnd.nextBoolean()) "a" else "b",
          rnd.nextDouble() * 200.0 - 50.0)) // spills both clamp edges
      val out = graft.ops.Stats.histogram(rows.toDF("k", "value"),
          Seq("k"), "value", lo = 0.0, hi = 100.0, nbins = 8)
        .select("k", "bin", "n", "bin_lo", "bin_hi")
        .as[(String, Int, Long, Double, Double)].collect()
      assert(out.map(_._3).sum == rows.size) // every row lands somewhere
      assert(out.forall(r => r._2 >= 0 && r._2 < 8))
      assert(out.forall(r => r._5 - r._4 == 12.5)) // width = 100/8
      // per-key counts match a driver-side binning
      val expected = rows.groupBy { case (k, v) =>
        (k, math.min(7, math.max(0, math.floor(v / 12.5).toInt)))
      }.view.mapValues(_.size.toLong).toMap
      assert(out.map(r => (r._1, r._2) -> r._3).toMap == expected)
    }
  }

  test("setCompare: legs partition the union, multiset counts add up") {
    for (seed <- Seq(5, 17)) {
      val rnd = new Random(seed)
      def mk() = Seq.fill(300)(rnd.nextInt(20)).map(i => s"v$i")
      val (la, lb) = (mk(), mk())
      val legs = graft.ops.Combine.setCompare(la.toDF("v"), lb.toDF("v"))
        .as[(String, String)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
      val (ca, cb) = (la.groupBy(identity).view.mapValues(_.size).toMap,
        lb.groupBy(identity).view.mapValues(_.size).toMap)
      // set legs (a leg absent from the output means it was empty)
      def leg(n: String) = legs.getOrElse(n, Nil)
      assert(leg("intersect").toSet == (ca.keySet & cb.keySet))
      assert(leg("only_a").toSet == (ca.keySet -- cb.keySet))
      assert(leg("only_b").toSet == (cb.keySet -- ca.keySet))
      // multiset legs: min / truncated difference multiplicities
      def counts(s: Seq[String]) =
        s.groupBy(identity).view.mapValues(_.size).toMap
      assert(counts(legs.getOrElse("intersect_all", Nil)) ==
        (ca.keySet & cb.keySet).map(k => k -> math.min(ca(k), cb(k))).toMap)
      assert(counts(legs.getOrElse("only_a_all", Nil)) ==
        ca.collect { case (k, n) if n > cb.getOrElse(k, 0) =>
          k -> (n - cb.getOrElse(k, 0)) }.toMap)
      assert(counts(legs.getOrElse("only_b_all", Nil)) ==
        cb.collect { case (k, n) if n > ca.getOrElse(k, 0) =>
          k -> (n - ca.getOrElse(k, 0)) }.toMap)
    }
  }

  test("semanticDedup: idempotent, and survivors are min ids of their clusters") {
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      // clustered corpus: 12 base directions, members = base * positive
      // scale (cosine 1 within a family), plus random noise vectors
      val bases = Seq.fill(12)(Seq.fill(6)(rnd.nextFloat() * 2 - 1))
      val members = (0 until 40).map { i =>
        val bi = rnd.nextInt(bases.size)
        val k = (1 + rnd.nextInt(3)).toFloat  // ONE positive scale per member
        (i.toLong, bi, bases(bi).map(x => x * k))
      }
      val noise = (40 until 60).map(i =>
        (i.toLong, -1 - i, Seq.fill(6)(rnd.nextFloat() * 2 - 1)))
      val df = (members ++ noise).map(t => (t._1, t._3))
        .toDF("vec_id", "embedding")
      val once = graft.sim.SemDedup.semanticDedup(df, "vec_id", "embedding",
        minCosine = 0.9999, signBits = 3)
      val twice = graft.sim.SemDedup.semanticDedup(once, "vec_id",
        "embedding", minCosine = 0.9999, signBits = 3)
      val keptOnce = once.select("vec_id").as[Long].collect().toSet
      val keptTwice = twice.select("vec_id").as[Long].collect().toSet
      assert(keptOnce == keptTwice, s"not idempotent at seed $seed")
      // reference: members of a base family are positive scalings of one
      // direction (cosine ~1, same sign cell) -> one cluster; the min id
      // of each family must be the family's sole survivor
      members.groupBy(_._2).values.foreach { fam =>
        val ids = fam.map(_._1)
        assert(ids.toSet.intersect(keptOnce) == Set(ids.min),
          s"family survivors wrong at seed $seed")
      }
    }
  }

  test("applyCdc equals a driver-side fold of the ordered change log") {
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val target = (0L until 30L).map(i => (i, s"t$i")).toMap
      val changes = Seq.tabulate(80) { s =>
        (rnd.nextInt(40).toLong, s"c$s",
          if (rnd.nextInt(4) == 0) "D" else "U", s.toLong)
      }
      // reference: replay the log in sequence order over the target map
      val expected = changes.sortBy(_._4).foldLeft(target) {
        case (acc, (id, v, "D", _)) => acc - id
        case (acc, (id, v, _, _)) => acc + (id -> v)
      }
      val out = Merge.applyCdc(
          target.toSeq.toDF("id", "val"),
          changes.toDF("id", "val", "op", "seq"),
          Seq("id"), Seq("seq"))
        .as[(Long, String)].collect().toMap
      assert(out == expected, s"CDC fold diverged at seed $seed")
    }
  }

  test("entropy: ln(k) on uniform, 0 on point mass, norm in [0,1]") {
    // uniform over 4 categories: H = ln 4, norm = 1
    val uniform = (1 to 4).flatMap(c => Seq.fill(25)(("g", s"c$c")))
      .toDF("k", "cat")
    val u = graft.ops.Stats.entropy(uniform, Seq("k"), "cat")
      .select("n_cats", "n_rows", "entropy", "entropy_norm")
      .as[(Long, Long, Double, Double)].collect()(0)
    assert(u._1 == 4L && u._2 == 100L)
    assert(math.abs(u._3 - math.log(4.0)) < 1e-6 && u._4 == 1.0)
    // point mass: H = 0, norm defined as 0
    val point = Seq.fill(50)(("p", "only")).toDF("k", "cat")
    val p = graft.ops.Stats.entropy(point, Seq("k"), "cat")
      .select("entropy", "entropy_norm").as[(Double, Double)].collect()(0)
    assert(p == ((0.0, 0.0)))
    // skewed: 0 < norm < 1 and entropy below ln(k)
    val skew = (Seq.fill(90)(("s", "big")) ++ Seq.fill(10)(("s", "small")))
      .toDF("k", "cat")
    val sk = graft.ops.Stats.entropy(skew, Seq("k"), "cat")
      .select("entropy", "entropy_norm").as[(Double, Double)].collect()(0)
    assert(sk._1 > 0.0 && sk._1 < math.log(2.0) && sk._2 > 0.0 && sk._2 < 1.0)
  }

  test("psi: zero on identical snapshots, symmetric, positive under shift") {
    for (seed <- Seq(7, 19)) {
      val rnd = new Random(seed)
      val a = Seq.fill(400)(("g", rnd.nextDouble() * 100))
        .toDF("k", "v")
      val b = Seq.fill(400)(("g", rnd.nextDouble() * 100 + 30)) // shifted
        .toDF("k", "v")
      def psi(x: org.apache.spark.sql.DataFrame,
              y: org.apache.spark.sql.DataFrame): Double =
        graft.ops.Stats.psi(x, y, Seq("k"), "v", 0.0, 130.0, 13)
          .select("psi").as[Double].collect()(0)
      assert(psi(a, a) == 0.0, "identical snapshots must score 0")
      assert(psi(a, b) == psi(b, a), "(p-q)ln(p/q) is swap-symmetric")
      assert(psi(a, b) > 0.1, s"a 30% range shift must register as drift")
    }
    // unequal totals, all mass in ONE bin: the smoothed formula must sum
    // over the FULL grid — the 12 both-empty bins still contribute when
    // Na != Nb (a truncated join would report near-0 here)
    val a1 = Seq.fill(100)(("g", 5.0)).toDF("k", "v")
    val b1 = Seq.fill(1000)(("g", 5.0)).toDF("k", "v")
    val got = graft.ops.Stats.psi(a1, b1, Seq("k"), "v", 0.0, 130.0, 13)
      .select("psi").as[Double].collect()(0)
    val p0 = 101.0 / 113.0; val q0 = 1001.0 / 1013.0
    val pe = 1.0 / 113.0; val qe = 1.0 / 1013.0
    val expected = BigDecimal(
        (p0 - q0) * math.log(p0 / q0)
          + 12.0 * ((pe - qe) * math.log(pe / qe)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got - expected) <= 1e-6,
      s"full-grid smoothed PSI: got $got, want $expected")
  }

  test("jsd/ks: zero on identical, bounded, maximal on disjoint support") {
    for (seed <- Seq(7, 19)) {
      val rnd = new Random(seed)
      val a = Seq.fill(400)(("g", rnd.nextDouble() * 50)).toDF("k", "v")
      val b = Seq.fill(300)(("g", rnd.nextDouble() * 50 + 80)).toDF("k", "v")
      def jsd(x: org.apache.spark.sql.DataFrame,
              y: org.apache.spark.sql.DataFrame): (Double, Double) =
        graft.ops.Stats.jsDivergence(x, y, Seq("k"), "v", 0.0, 130.0, 13)
          .select("jsd", "jsd_norm").as[(Double, Double)].collect()(0)
      def ks(x: org.apache.spark.sql.DataFrame,
             y: org.apache.spark.sql.DataFrame): Double =
        graft.ops.Stats.ksStatistic(x, y, Seq("k"), "v", 0.0, 130.0, 13)
          .select("ks").as[Double].collect()(0)
      assert(jsd(a, a)._1 == 0.0 && ks(a, a) == 0.0,
        "identical snapshots must score 0")
      assert(jsd(a, b) == jsd(b, a), "JSD is swap-symmetric")
      val (j, jn) = jsd(a, b)
      assert(j > 0.0 && j <= math.log(2.0) + 1e-9 && jn <= 1.0,
        s"JSD must stay in (0, ln 2]: $j / $jn")
      // Laplace smoothing leaks 1/(N+nbins) mass into every bin, so the
      // disjoint-support score lands near — not at — the ln 2 pole
      assert(jn > 0.8, "disjoint supports must approach the ln 2 bound")
      assert(ks(a, b) == 1.0,
        "disjoint binned supports have a full CDF gap")
    }
  }

  test("triangleStats: matches brute-force enumeration on random graphs") {
    for (seed <- Seq(3, 11, 42)) {
      val rnd = new Random(seed)
      val n = 40
      val edges = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val adj = canon.toSet
      def has(a: Long, b: Long) = adj((math.min(a, b), math.max(a, b)))
      val ids = canon.flatMap { case (a, b) => Seq(a, b) }.distinct
      val bruteTri = ids.map { v =>
        val nbrs = ids.filter(u => u != v && has(u, v))
        v -> nbrs.combinations(2).count { case Seq(x, y) => has(x, y) }
      }.toMap
      val bruteDeg = ids.map(v => v -> ids.count(u => u != v && has(u, v))).toMap
      // feed RAW edges (dups + both orders) — the op must canonicalize
      val got = graft.ops.Graph.triangleStats(edges.toDF("id1", "id2"))
        .collect().map(r => (r.getAs[Long]("id"),
          (r.getAs[Long]("degree"), r.getAs[Long]("triangles")))).toMap
      assert(got.keySet == ids.toSet)
      ids.foreach { v =>
        assert(got(v) == ((bruteDeg(v).toLong, bruteTri(v).toLong)),
          s"vertex $v: got ${got(v)}, want (${bruteDeg(v)}, ${bruteTri(v)})")
      }
    }
  }

  test("kll sketches: merged quantiles track exact within the rank bound") {
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val xs = Seq.fill(4000)(rnd.nextDouble() * 1000.0)
      val df = xs.zipWithIndex.map { case (x, i) => (i % 7, x) }
        .toDF("seg", "v")
      val daily = graft.ops.Frequency.kllSketches(df, Seq("seg"), "v")
      assert(daily.count() == 7)
      val ranks = Seq(0.1, 0.5, 0.9)
      val est = graft.ops.Frequency.kllMergedQuantiles(daily, ranks)
        .orderBy("q").select("q", "value_est").as[(Double, Double)]
        .collect()
      val sorted = xs.sorted
      est.foreach { case (q, v) =>
        // 3x the k=200 normalized rank error (~1.65%), merge-preserved
        val loIdx = math.max(0, ((q - 0.05) * xs.size).toInt)
        val hiIdx = math.min(xs.size - 1, ((q + 0.05) * xs.size).toInt)
        assert(v >= sorted(loIdx) && v <= sorted(hiIdx),
          s"q=$q est=$v outside [${sorted(loIdx)}, ${sorted(hiIdx)}]")
      }
      assert(est.map(_._2).toSeq == est.map(_._2).sorted.toSeq,
        "quantile estimates must be monotone in q")
    }
  }

  test("cms sketches: merged estimates never undercount, bounded over") {
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      val rows = Seq.fill(3000)((rnd.nextInt(5), s"it${rnd.nextInt(40)}"))
        .toDF("seg", "item")
      val exact = rows.groupBy("item").count().as[(String, Long)]
        .collect().toMap
      val daily = graft.ops.Frequency.cmsSketches(rows, Seq("seg"), "item")
      val items = (0 until 40).map(i => s"it$i")
      val est = graft.ops.Frequency
        .cmsMergedCounts(daily, items)
        .select("item", "count_est").as[(String, Long)].collect().toMap
      items.foreach { it =>
        val ex = exact.getOrElse(it, 0L)
        assert(est(it) >= ex, s"$it undercounted: ${est(it)} < $ex")
        assert(est(it) <= ex + math.ceil(0.001 * 3000).toLong,
          s"$it over the eps*N bound: ${est(it)} vs $ex")
      }
    }
  }

  test("collocations: a planted adjacent phrase dominates PMI") {
    // "zqx yvw" always adjacent; fillers are shuffled high-frequency noise
    val rnd = new Random(5)
    val fillers = Seq("the", "of", "and", "data")
    val docs = (1L to 60L).map { i =>
      val noise = Seq.fill(6)(fillers(rnd.nextInt(fillers.size)))
      val (pre, post) = noise.splitAt(3)
      (i, (pre ++ Seq("zqx", "yvw") ++ post).mkString(" "))
    }.toDF("doc_id", "text")
    val top = graft.text.TfIdf.collocations(docs, "doc_id", "text",
      minCount = 5L, topK = 5).collect()
    assert(top.head.getAs[String]("w1") == "zqx" &&
      top.head.getAs[String]("w2") == "yvw",
      s"planted phrase must rank first: ${top.toSeq}")
    assert(top.head.getAs[Long]("n_ab") == 60L)
    // planted pair occurs always-adjacent: npmi must sit near the +1 pole
    assert(top.head.getAs[Double]("npmi") > 0.8)
  }

  test("funnelCounts: stage counts are monotone non-increasing") {
    for (seed <- Seq(13, 37)) {
      val rnd = new Random(seed)
      val stages = Seq("s1", "s2", "s3")
      val events = Seq.fill(600)((
        s"u${rnd.nextInt(50)}",
        rnd.nextInt(100000).toLong,
        stages(rnd.nextInt(3))))
        .toDF("user_id", "t", "stage")
      val counts = graft.ops.Funnel.funnelCounts(events, "user_id", "t",
          "stage", stages)
        .orderBy("stage_idx").select("n_users").as[Long].collect()
      assert(counts.sliding(2).forall {
        case Array(x, y) => y <= x
        case _ => true
      }, s"funnel not monotone at seed $seed: ${counts.toSeq}")
    }
  }

  test("cappedSortedSet: matches sort_array(collect_set) below cap, " +
      "NULL above — regardless of partitioning") {
    import graft.functions.CappedSetAgg.cappedSortedSet
    for (seed <- Seq(5, 23)) {
      val rnd = new Random(seed)
      val rows = Seq.fill(800)((rnd.nextInt(40).toLong,
        rnd.nextInt(30).toLong))
      for (nPart <- Seq(1, 7)) {
        val df = rows.toDF("g", "i").repartition(nPart)
        val got = df.groupBy("g").agg(cappedSortedSet(col("i"), 12).as("arr"))
          .as[(Long, Option[Seq[Long]])].collect().toMap
        val exact = rows.groupBy(_._1).map { case (g, vs) =>
          (g, vs.map(_._2).distinct.sorted)
        }
        exact.foreach { case (g, vs) =>
          if (vs.size > 12) assert(got(g).isEmpty, s"g=$g should overflow")
          else assert(got(g).contains(vs), s"g=$g mismatch at seed $seed")
        }
      }
    }
    // strings sort in UTF8 binary order, matching sort_array
    val sdf = Seq(("a", "b"), ("a", "é"), ("a", "Z"), ("a", "b"))
      .toDF("g", "i")
    val sa = sdf.groupBy("g")
      .agg(cappedSortedSet(col("i"), 10).as("x"),
        sort_array(collect_set(col("i"))).as("y"))
      .select(col("x") === col("y")).as[Boolean].head()
    assert(sa, "string order diverges from sort_array")
  }

  test("keySkew: hand-computed gini on counts {1,2,3,4}; uniform ~ 0; " +
      "dominant key ~ 1; percentile ordering") {
    // counts 1,2,3,4 -> Σ i·c = 30, G = 60/40 - 5/4 = 0.25 exactly
    val rows = (1 to 1).map(_ => "a") ++ (1 to 2).map(_ => "b") ++
      (1 to 3).map(_ => "c") ++ (1 to 4).map(_ => "d")
    val r = graft.ops.Stats.keySkew(
        rows.map(("g", _)).toDF("g", "k"), Seq("g"), "k")
      .collect().head
    assert(r.getAs[Long]("n_keys") == 4L && r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Double]("gini") == 0.25)
    assert(r.getAs[Long]("p50_rows") == 2L) // rank >= ceil(4/2)=2 -> c=2
    assert(r.getAs[Long]("p90_rows") == 4L) // rank >= ceil(3.6)=4 -> c=4
    assert(r.getAs[Long]("max_key_rows") == 4L)
    // uniform: every key identical count -> gini exactly... (n-1)/(2n)·0
    val uni = (1 to 50).flatMap(i => Seq.fill(7)(i.toLong))
      .map(("g", _)).toDF("g", "k")
    val ru = graft.ops.Stats.keySkew(uni, Seq("g"), "k").collect().head
    assert(math.abs(ru.getAs[Double]("gini")) < 1e-12)
    // one key with 10_000 rows among 50 singletons -> gini near 1
    val dom = ((1 to 10000).map(_ => 0L) ++ (1L to 50L))
      .map(("g", _)).toDF("g", "k")
    val rd = graft.ops.Stats.keySkew(dom, Seq("g"), "k").collect().head
    assert(rd.getAs[Double]("gini") > 0.9)
    assert(rd.getAs[Double]("top1_share") > 0.99)
    assert(rd.getAs[Long]("p50_rows") <= rd.getAs[Long]("p90_rows") &&
      rd.getAs[Long]("p90_rows") <= rd.getAs[Long]("p99_rows"))
  }

  test("quantileNormalize: equal-size shifted corpus maps rank-to-rank; " +
      "outliers clamp into edge bands correctly") {
    // df values 1..100, ref values 1000..1099: n = m so rank r -> j = r,
    // and the normalized value is exactly value + 999
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val ref = (1 to 100).map(i => (999 + i).toDouble).toDF("rv")
    val out = graft.ops.Curate.quantileNormalize(df, "v", "id", ref, "rv",
        lo = 0.0, hi = 50.0, nbands = 8, out = "nv") // hi < max: clamps
      .select("v", "nv").as[(Double, Double)].collect()
    assert(out.length == 100)
    assert(out.forall { case (v, nv) => nv == v + 999.0 })
    // ref multiset is reproduced exactly when sizes match
    assert(out.map(_._2).sorted.toSeq == (1000 to 1099).map(_.toDouble))
  }

  test("withEwm: mean stays inside the running [min, max]; var non-negative") {
    for (seed <- Seq(11, 29)) {
      val rnd = new Random(seed)
      val xs = Seq.fill(60)(rnd.nextDouble() * 200 - 100)
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
        .toDF("k", "id", "value")
      val out = graft.ops.Indicators.withEwm(df, "k", Seq("id"), "value")
        .orderBy("id").select("value", "ewm_mean", "ewm_var")
        .as[(Double, Double, Double)].collect()
      var lo = Double.MaxValue; var hi = Double.MinValue
      out.foreach { case (x, m, v) =>
        lo = math.min(lo, x); hi = math.max(hi, x)
        assert(m >= lo - 1e-9 && m <= hi + 1e-9, s"mean escaped [min,max]")
        assert(v >= 0.0, "negative variance")
      }
    }
  }

  test("weightedQuantiles matches driver brute force over random weights") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new Random(seed)
      val rows = Seq.fill(300)(("g" + rnd.nextInt(3),
        rnd.nextInt(40).toLong, (rnd.nextInt(9) + 1).toLong))
      val pms = Seq(100, 250, 500, 750, 900, 1000)
      val got = graft.ops.Stats.weightedQuantiles(
          rows.toDF("k", "v", "w"), Seq("k"), col("v"), col("w"), pms)
        .collect()
        .map(r => ((r.getAs[String]("k"), r.getAs[Int]("permille")),
          r.getAs[Long]("value_q"))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val tot = byV.map(_._2).sum
        pms.foreach { pm =>
          var cum = 0L
          val want = byV.collectFirst {
            case (v, w) if { cum += w; cum * 1000 >= pm * tot } => v
          }.get
          assert(got((g, pm)) == want, s"group $g pm $pm seed $seed")
        }
      }
    }
  }

  test("rollingActive never exceeds the cumulative distinct count") {
    val rnd = new Random(17)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq.fill(400)(("k", rnd.nextInt(30).toLong,
      new java.sql.Timestamp(base + rnd.nextInt(20) * 86400000L +
        rnd.nextInt(86400) * 1000L)))
    val df = rows.toDF("g", "u", "ts")
    val out = graft.ops.Funnel.rollingActive(df, Seq("g"), "ts", "u", 7)
      .collect().map(r => (r.getAs[java.sql.Date]("day"),
        r.getAs[Long]("n_active")))
    val daily = rows.map { case (_, u, t) => (t.toLocalDateTime.toLocalDate, u) }
    out.foreach { case (day, n) =>
      val d = day.toLocalDate
      val want = daily.filter { case (dd, _) =>
        !dd.isAfter(d) && dd.isAfter(d.minusDays(7)) }.map(_._2).distinct.size
      assert(n == want, s"day $day")
    }
  }

  test("metadata folds equal scans over randomized versioned tables") {
    import graft.ops.VersionedTable
    val rnd = new Random(2026)
    for (trial <- 1 to 4) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_prop_md")
        .toString + s"/t$trial"
      val n = 60 + rnd.nextInt(140)
      val rows = (0 until n).map { i =>
        val v: java.lang.Double =
          if (rnd.nextInt(10) == 0) null
          else if (rnd.nextInt(20) == 0) Double.NaN
          else rnd.nextDouble() * 200 - 100
        (i, s"p${rnd.nextInt(4)}", v,
          if (rnd.nextInt(8) == 0) null else f"s${rnd.nextInt(1000)}%04d")
      }.toDF("id", "part", "v", "s")
      VersionedTable.upsert(spark, root, rows, Seq("id", "part"),
        Seq("part"), statsCols = Seq("v", "s"),
        fileRows = Some(5 + rnd.nextInt(20)))
      if (rnd.nextBoolean()) // random maintenance between checks
        VersionedTable.deleteWhere(spark, root, "v",
          rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 100)
      val t = VersionedTable.read(spark, root)
      // COUNT
      assert(VersionedTable.fastCount(spark, root)
        .contains(t.count()), s"trial $trial fastCount")
      // non-null counts
      val nnV = t.filter(col("v").isNotNull).count()
      // MIN/MAX vs the aggregate (NaN compares via java equality below)
      val agg = t.agg(min("v"), max("v"), min("s"), max("s")).collect()(0)
      val Some((vLo, vHi)) = VersionedTable.fastMinMax(spark, root, "v")
      def same(a: Any, b: Any): Boolean = (a, b) match {
        case (null, null) => true
        case (x: Double, y: Double) => x == y || (x.isNaN && y.isNaN)
        case (x, y) => x == y
      }
      assert(same(vLo, if (agg.isNullAt(0)) null else agg.getDouble(0)),
        s"trial $trial min(v): $vLo vs $agg")
      assert(same(vHi, if (agg.isNullAt(1)) null else agg.getDouble(1)),
        s"trial $trial max(v): $vHi vs $agg")
      val Some((sLo, sHi)) = VersionedTable.fastMinMax(spark, root, "s")
      assert(same(sLo, agg.getString(2)) && same(sHi, agg.getString(3)),
        s"trial $trial s bounds")
      // count(v) fold path (total - nulls)
      import graft.plans.VersionedScan
      graft.GraftExtensions.register(spark)
      assert(VersionedScan.table(spark, root).agg(count(col("v")))
        .collect()(0).getLong(0) == nnV, s"trial $trial count(v)")
      // grouped fold equals the scanned group-by
      val folded = VersionedScan.table(spark, root)
        .groupBy("part").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val scanned = t.groupBy("part").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(folded == scanned, s"trial $trial grouped")
      // partition-filtered folds: random value subsets, counts AND
      // min/max, always equal to the scan — and actually folded
      val someParts = (0 until 4).filter(_ => rnd.nextBoolean())
        .map(i => s"p$i")
      val pred =
        if (someParts.isEmpty) col("part").isNull
        else col("part").isin(someParts: _*)
      val ff = VersionedScan.table(spark, root).filter(pred)
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
          max(col("v")).as("hi"))
      assert(ff.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        s"trial $trial filtered fold did not fold:\n${ff.queryExecution}")
      val sc = t.filter(pred)
        .agg(count(lit(1)), min(col("v")), max(col("v"))).collect()(0)
      val fr = ff.collect()(0)
      assert(fr.getLong(0) == sc.getLong(0), s"trial $trial filtered n")
      def sameD(a: Any, b: Any): Boolean = (a, b) match {
        case (null, null) => true
        case (x: Double, y: Double) => x == y || (x.isNaN && y.isNaN)
        case (x, y) => x == y
      }
      assert(sameD(fr.get(1), sc.get(1)) && sameD(fr.get(2), sc.get(2)),
        s"trial $trial filtered min/max: $fr vs $sc")
    }
  }

  test("DV deletes equal rewrite deletes under randomized op sequences") {
    import graft.ops.VersionedTable
    val rnd = new Random(77)
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_prop_dv$trial").toString
      val rootA = s"$base/dv" // deletes via deletion vectors
      val rootB = s"$base/rw" // deletes via file rewrite
      val n = 100 + rnd.nextInt(100)
      def mkRows(seed: Int, count: Int): Seq[(Int, String, Long)] =
        (0 until count).map { i =>
          (seed * 100000 + i, s"p${rnd.nextInt(3)}", rnd.nextInt(500).toLong)
        }
      val init = mkRows(0, n).toDF("id", "part", "v")
      Seq(rootA, rootB).foreach(r => VersionedTable.upsert(spark, r, init,
        Seq("id", "part"), Seq("part"), statsCols = Seq("v"),
        fileRows = Some(20)))
      def readSet(r: String): Set[(Int, String, Long)] =
        VersionedTable.read(spark, r).select($"id", $"part", $"v")
          .as[(Int, String, Long)].collect().toSet
      for (step <- 1 to 5) {
        rnd.nextInt(3) match {
          case 0 if rnd.nextBoolean() => // the SAME range delete
            val lo = rnd.nextInt(450).toLong
            val hi = lo + rnd.nextInt(120)
            VersionedTable.deleteWhereDV(spark, rootA, "v", lo, hi)
            VersionedTable.deleteWhere(spark, rootB, "v", lo, hi)
          case 0 => // the SAME key-list delete (exercises the sorted
            // binary-search candidate bounds incl. misses and nulls)
            val vals: Seq[Any] = (0 until 8).map(_ =>
              (rnd.nextInt(1700) - 50).toLong: Any) :+ null
            VersionedTable.deleteWhereInDV(spark, rootA, "v", vals)
            VersionedTable.deleteWhereIn(spark, rootB, "v", vals)
          case 1 => // the same upsert on both (touches DV'd partitions)
            val up = mkRows(step, 10 + rnd.nextInt(20))
              .toDF("id", "part", "v")
            Seq(rootA, rootB).foreach(r => VersionedTable.upsert(spark, r,
              up, Seq("id", "part"), Seq("part"), statsCols = Seq("v"),
              fileRows = Some(20)))
          case 2 => // the same update on both (rewrites through DVs)
            val lo = rnd.nextInt(450).toLong
            val hi = lo + rnd.nextInt(120)
            Seq(rootA, rootB).foreach(r => VersionedTable.updateWhere(
              spark, r, "v", lo, hi,
              Map("v" -> (col("v") + lit(1000L))), fileRows = Some(20)))
        }
        val a = readSet(rootA)
        assert(a == readSet(rootB), s"trial $trial step $step diverged")
        assert(VersionedTable.fastCount(spark, rootA)
          .contains(a.size.toLong), s"trial $trial step $step fastCount A")
      }
      // compaction materializes A's DVs: still identical, refs gone
      VersionedTable.compact(spark, rootA, statsCols = Seq("v"))
      assert(readSet(rootA) == readSet(rootB), s"trial $trial post-compact")
      assert(VersionedTable.dvStats(spark, rootA).isEmpty)
    }
  }

  test("concurrent disjoint upserts all commit under real claim races") {
    import graft.ops.VersionedTable
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark0 = spark
    val saved = sys.props.getOrElse("graft.versioned.claimWaitMs", "500")
    sys.props("graft.versioned.claimWaitMs") = "30000"
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_prop_occ")
        .toString + "/table"
      VersionedTable.upsert(spark, root,
        Seq((0, "seed", 0L)).toDF("id", "part", "v"),
        Seq("id", "part"), Seq("part"))
      // 4 writers, each to its OWN partition, genuinely racing the claim
      val writers = (1 to 4).map { w =>
        Future {
          VersionedTable.upsert(spark, root,
            (0 until 10).map(i => (w * 100 + i, s"w$w", i.toLong))
              .toDF("id", "part", "v"),
            Seq("id", "part"), Seq("part"))
        }
      }
      writers.foreach(Await.result(_, 120.seconds))
      // serialized into SOME order: 5 commits, every writer's rows present
      assert(VersionedTable.history(spark, root) == (0 to 4))
      assert(VersionedTable.read(spark, root).count() == 1 + 4 * 10)
      (1 to 4).foreach { w =>
        assert(VersionedTable.read(spark, root)
          .filter(col("part") === s"w$w").count() == 10, s"writer $w")
      }
    } finally sys.props("graft.versioned.claimWaitMs") = saved
  }
}
