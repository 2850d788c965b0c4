package graft

import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Zero-copy branches on the versioned table: `root@name` handles,
  * createBranch / listBranches / dropBranch / fastForward, branch-scoped
  * vacuum, and the three-way fast-forward merge anchored on the fork
  * version. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_br_$tag")
    s"$dir/table"
  }

  private def rows(root: String, asOf: Option[Int] = None): Set[(Int, String, Long)] =
    VersionedTable.read(spark, root, asOf)
      .select($"id", $"grp", $"v").as[(Int, String, Long)].collect().toSet

  private val keys = Seq("id", "grp")

  private def seed(root: String): Set[(Int, String, Long)] = {
    val data = (0 until 40).map(i => (i, s"g${i % 4}", i.toLong))
    VersionedTable.upsert(spark, root, data.toDF("id", "grp", "v"),
      keys, Seq("grp"), fileRows = Some(5))
    data.toSet
  }

  test("branch reads equal the fork point; writes diverge both ways") {
    val root = freshRoot("diverge")
    val base = seed(root) // main v0
    val dev = VersionedTable.createBranch(spark, root, "dev")
    assert(dev == s"$root@dev")
    assert(VersionedTable.listBranches(spark, root) == Seq("dev"))
    assert(rows(dev) == base)
    // write to the branch: a new group + an update of g1
    VersionedTable.upsert(spark, dev,
      Seq((100, "g9", 100L), (1, "g1", 999L)).toDF("id", "grp", "v"), keys,
      Seq("grp"))
    assert(rows(dev) == base - ((1, "g1", 1L)) + ((100, "g9", 100L)) +
      ((1, "g1", 999L)))
    // main is untouched, then diverges on its own
    assert(rows(root) == base)
    VersionedTable.upsert(spark, root,
      Seq((2, "g2", 222L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    assert(rows(root) == base - ((2, "g2", 2L)) + ((2, "g2", 222L)))
    assert(rows(dev).contains((1, "g1", 999L)) && !rows(dev).contains((2, "g2", 222L)))
    // branch time travel: v0 is the fork snapshot
    assert(rows(dev, Some(0)) == base)
    // full DML works on the branch handle
    VersionedTable.deleteWhere(spark, dev, "v", 100L, 100L)
    assert(!rows(dev).contains((100, "g9", 100L)))
  }

  test("fastForward publishes branch changes onto main (clean + disjoint)") {
    val root = freshRoot("ff")
    val base = seed(root) // main v0
    VersionedTable.createBranch(spark, root, "wap")
    val wap = s"$root@wap"
    VersionedTable.upsert(spark, wap,
      Seq((200, "g0", 200L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    // clean fast-forward: main unchanged since fork
    val v1 = VersionedTable.fastForward(spark, root, "wap")
    assert(v1 == 1)
    assert(rows(root) == base + ((200, "g0", 200L)))
    // time travel on main still sees pre-publish state
    assert(rows(root, Some(0)) == base)
    // DISJOINT merge: main touches g3, a fresh branch touches g1
    VersionedTable.createBranch(spark, root, "dj")
    VersionedTable.upsert(spark, root,
      Seq((3, "g3", 333L)).toDF("id", "grp", "v"), keys, Seq("grp")) // main v2
    VersionedTable.upsert(spark, s"$root@dj",
      Seq((5, "g1", 555L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    val v3 = VersionedTable.fastForward(spark, root, "dj")
    assert(v3 == 3)
    val expect = base + ((200, "g0", 200L)) - ((3, "g3", 3L)) +
      ((3, "g3", 333L)) - ((5, "g1", 5L)) + ((5, "g1", 555L))
    assert(rows(root) == expect)
    // a change feed across the publish names exactly the branch's dirs
    val feed = VersionedTable.changeFeed(spark, root, keys, 2, 3)
    assert(feed.select($"id").as[Int].collect().toSet == Set(5))
  }

  test("fastForward conflicts when both sides touched a partition") {
    val root = freshRoot("conflict")
    seed(root)
    VersionedTable.createBranch(spark, root, "cf")
    VersionedTable.upsert(spark, root,
      Seq((7, "g3", 777L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.upsert(spark, s"$root@cf",
      Seq((11, "g3", 111L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    val e = intercept[VersionedTable.ConcurrentWriteConflictException] {
      VersionedTable.fastForward(spark, root, "cf")
    }
    assert(e.getMessage.contains("g3"))
    // branch deletes count as changes too: DV-delete g2 rows on a fresh
    // branch while main touches g0 — still disjoint, merge carries the
    // delete through its deletion vectors
    VersionedTable.createBranch(spark, root, "del")
    VersionedTable.deleteMatchingDV(spark, s"$root@del", col("grp") === "g2")
    VersionedTable.upsert(spark, root,
      Seq((400, "g0", 400L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.fastForward(spark, root, "del")
    val got = rows(root)
    assert(!got.exists(_._2 == "g2"), s"g2 rows survived the merged DV delete")
    assert(got.contains((400, "g0", 400L)) && got.contains((7, "g3", 777L)))
  }

  test("vacuum on main keeps branch-referenced gens; branch vacuum is scoped") {
    val root = freshRoot("vac")
    val base = seed(root) // main v0
    VersionedTable.createBranch(spark, root, "keep")
    val keep = s"$root@keep"
    // advance main twice so keepVersions=1 drops v0 (the fork point's
    // manifest on MAIN goes away, but the GENS must survive: the branch
    // still references them)
    VersionedTable.upsert(spark, root,
      Seq((0, "g0", 1000L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.upsert(spark, root,
      Seq((0, "g0", 2000L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.vacuum(spark, root, keepVersions = 1)
    assert(rows(keep) == base, "branch broke after main vacuum")
    // branch writes + branch vacuum: retires branch history only
    VersionedTable.upsert(spark, keep,
      Seq((300, "g1", 300L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.upsert(spark, keep,
      Seq((301, "g1", 301L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.vacuum(spark, keep, keepVersions = 1)
    // v0 (the fork anchor) is always retained on a branch
    assert(VersionedTable.history(spark, keep) == Seq(0, 2))
    assert(rows(keep).contains((301, "g1", 301L)))
    assert(rows(root).contains((0, "g0", 2000L)), "main broke after branch vacuum")
    // the fork anchor survives branch vacuum (carried on every commit)
    VersionedTable.upsert(spark, keep,
      Seq((302, "g2", 302L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.fastForward(spark, root, "keep")
    assert(rows(root).contains((302, "g2", 302L)))
  }

  test("dropBranch collects branch gens unless main references them") {
    val root = freshRoot("drop")
    seed(root)
    VersionedTable.createBranch(spark, root, "tmp")
    VersionedTable.upsert(spark, s"$root@tmp",
      Seq((500, "g0", 500L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    def genDirs = new java.io.File(root).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("gen.tmp."))
    assert(genDirs.nonEmpty)
    VersionedTable.dropBranch(spark, root, "tmp")
    assert(VersionedTable.listBranches(spark, root).isEmpty)
    assert(genDirs.isEmpty, "dropped branch's gens were not collected")
    intercept[Exception](rows(s"$root@tmp"))
    // after a fastForward, main references the branch's gens: drop must
    // NOT delete those
    VersionedTable.createBranch(spark, root, "pub")
    VersionedTable.upsert(spark, s"$root@pub",
      Seq((600, "g1", 600L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.fastForward(spark, root, "pub")
    VersionedTable.dropBranch(spark, root, "pub")
    assert(rows(root).contains((600, "g1", 600L)),
      "main lost rows when its source branch was dropped")
    // and a re-created branch name starts fresh
    VersionedTable.createBranch(spark, root, "pub")
    assert(rows(s"$root@pub") == rows(root))
    VersionedTable.dropBranch(spark, root, "pub")
  }

  test("branch handles flow through SQL and the scan rule") {
    val root = freshRoot("sql")
    seed(root)
    VersionedTable.createBranch(spark, root, "q")
    spark.sql(s"DELETE FROM graft.`$root@q` WHERE grp = 'g0'")
    val cnt = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root@q')")
      .collect().head.getLong(0)
    assert(cnt == 30)
    assert(rows(root).count(_._2 == "g0") == 10, "SQL DELETE leaked to main")
    // pruned read through the optimizer rule on a branch handle
    val pruned = graft.plans.VersionedScan.table(spark, s"$root@q")
      .filter($"grp" === "g1")
    assert(pruned.count() == 10)
  }

  test("fastForward enforces CHECK constraints on the published result") {
    val root = freshRoot("gate")
    seed(root)
    VersionedTable.createBranch(spark, root, "wap")
    // the TARGET tightens governance after the fork; the branch writes
    // data (into an untouched partition) that violates it — publishing
    // must fail the constraint gate, not silently void the audit
    VersionedTable.addConstraint(spark, root, "v_small", "v < 500")
    VersionedTable.upsert(spark, s"$root@wap",
      Seq((800, "g9", 999L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    val e = intercept[Exception](VersionedTable.fastForward(spark, root, "wap"))
    assert(e.getMessage.contains("v_small"), e.getMessage)
    assert(!rows(root).contains((800, "g9", 999L)))
    // a compliant branch write publishes through the same gate
    VersionedTable.createBranch(spark, root, "ok")
    VersionedTable.upsert(spark, s"$root@ok",
      Seq((801, "g8", 42L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.fastForward(spark, root, "ok")
    assert(rows(root).contains((801, "g8", 42L)))
    // constraints ADDED ON THE BRANCH re-validate the target's kept
    // dirs at publish: main's data (v up to 39) fails a branch-added
    // v < 10 gate even though the branch's own dirs pass
    VersionedTable.createBranch(spark, root, "law")
    VersionedTable.addConstraint(spark, s"$root@law", "id_pos", "id >= 0")
    VersionedTable.fastForward(spark, root, "law") // id >= 0 holds: ok
    assert(VersionedTable.constraintsOf(spark, root).contains("id_pos"))
  }

  test("fastForward after a branch dropColumn strips the column's index") {
    val root = freshRoot("dropcol")
    val data = (0 until 40).map(i => (i, s"g${i % 4}", i.toLong, i * 2))
    VersionedTable.upsert(spark, root, data.toDF("id", "grp", "v", "w"),
      keys, Seq("grp"), statsCols = Seq("w"), fileRows = Some(5))
    VersionedTable.createBranch(spark, root, "slim")
    VersionedTable.dropColumn(spark, s"$root@slim", "w")
    VersionedTable.fastForward(spark, root, "slim")
    assert(VersionedTable.read(spark, root).columns.toSeq ==
      Seq("id", "grp", "v"))
    // re-adding a same-typed column must NOT resurrect stale stats
    // even though (metadata-only drop, per dropColumn's contract) the
    // old files' VALUES do resurface until the next rewrite — the probe
    // must see no usable index rather than skip on pre-drop ranges
    VersionedTable.addColumn(spark, root,
      "w", org.apache.spark.sql.types.IntegerType)
    val (k, t) = VersionedTable.skipStats(spark, root, "w", 0, 1000000)
    assert(k == t, s"stale stats resurfaced for re-added column: $k/$t")
    assert(VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Int)].collect().toMap ==
      (0 until 40).map(i => i -> i * 2).toMap)
  }

  test("createBranch on a never-written root says so") {
    val root = freshRoot("nocommit") // dir may not even exist
    val e = intercept[java.io.FileNotFoundException] {
      VersionedTable.createBranch(spark, root, "dev")
    }
    assert(e.getMessage.contains("no committed version"))
  }

  test("writes never implicitly create branches") {
    val root = freshRoot("typo")
    seed(root)
    VersionedTable.createBranch(spark, root, "dev")
    val e = intercept[java.io.FileNotFoundException] {
      VersionedTable.upsert(spark, s"$root@dve", // typo
        Seq((1, "g0", 1L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    }
    assert(e.getMessage.contains("createBranch first"))
    assert(VersionedTable.listBranches(spark, root) == Seq("dev"))
  }

  test("branch-of-branch: fork from a branch, fast-forward into it") {
    val root = freshRoot("nested")
    val base = seed(root)
    VersionedTable.createBranch(spark, root, "dev")
    val dev = s"$root@dev"
    VersionedTable.upsert(spark, dev,
      Seq((700, "g0", 700L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    // fork a feature branch OFF dev, write, publish back INTO dev
    VersionedTable.createBranch(spark, dev, "feat")
    val feat = s"$root@feat"
    assert(rows(feat) == rows(dev))
    assert(VersionedTable.forkOf(spark, feat) == Some(("dev", 1)))
    VersionedTable.upsert(spark, feat,
      Seq((701, "g1", 701L)).toDF("id", "grp", "v"), keys, Seq("grp"))
    VersionedTable.fastForward(spark, root, "feat") // target = dev
    assert(rows(dev).contains((701, "g1", 701L)))
    assert(!rows(root).contains((701, "g1", 701L)), "skipped a level")
    // then dev publishes into main
    VersionedTable.fastForward(spark, root, "dev")
    assert(rows(root) == base + ((700, "g0", 700L)) + ((701, "g1", 701L)))
  }

  test("randomized disjoint main/branch interleaving == serialized apply") {
    // property: any interleaving of main writes and branch writes over
    // DISJOINT partitions, closed by a fastForward, equals applying all
    // the writes serially to one table
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { round =>
      val root = freshRoot(s"prop$round")
      val twin = freshRoot(s"proptwin$round")
      val base = (0 until 40).map(i => (i, s"g${i % 4}", i.toLong))
      VersionedTable.upsert(spark, root, base.toDF("id", "grp", "v"),
        keys, Seq("grp"), fileRows = Some(5))
      VersionedTable.upsert(spark, twin, base.toDF("id", "grp", "v"),
        keys, Seq("grp"), fileRows = Some(5))
      VersionedTable.createBranch(spark, root, "b")
      // main owns g0/g1, branch owns g2/g3 — disjoint by construction
      val serialized = scala.collection.mutable.Buffer.empty[Seq[(Int, String, Long)]]
      (1 to 6).foreach { step =>
        val toBranch = rnd.nextBoolean()
        val g = if (toBranch) 2 + rnd.nextInt(2) else rnd.nextInt(2)
        val batch = (0 until 5).map { _ =>
          val id = g + 4 * rnd.nextInt(15)
          (id, s"g$g", (step * 1000 + id).toLong)
        }.distinct
        val target = if (toBranch) s"$root@b" else root
        VersionedTable.upsert(spark, target,
          batch.toDF("id", "grp", "v"), keys, Seq("grp"))
        serialized += batch
      }
      VersionedTable.fastForward(spark, root, "b")
      serialized.foreach { batch =>
        VersionedTable.upsert(spark, twin,
          batch.toDF("id", "grp", "v"), keys, Seq("grp"))
      }
      assert(rows(root) == rows(twin),
        s"round $round: interleaved+FF != serialized")
    }
  }

  test("SQL branch statements: CREATE/SHOW/FAST FORWARD/DROP BRANCH") {
    val root = freshRoot("sqlbr")
    val base = seed(root)
    val h = spark.sql(s"ALTER TABLE graft.`$root` CREATE BRANCH wap")
      .collect().head.getString(0)
    assert(h == s"$root@wap")
    spark.sql(
      s"""MERGE INTO graft.`$root@wap` AS t USING
         |(SELECT 900 AS id, 'g0' AS grp, CAST(900 AS BIGINT) AS v) AS s
         |ON t.id = s.id AND t.grp = s.grp
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val sb = spark.sql(s"SHOW BRANCHES IN graft.`$root`").collect()
    assert(sb.length == 1 && sb.head.getString(0) == "wap" &&
      sb.head.getInt(1) == 1 && sb.head.getString(2) == "main" &&
      sb.head.getInt(3) == 0)
    assert(rows(root) == base, "MERGE into branch leaked to main")
    val v = spark.sql(s"ALTER TABLE graft.`$root` FAST FORWARD BRANCH wap")
      .collect().head.getInt(0)
    assert(v == 1)
    assert(rows(root) == base + ((900, "g0", 900L)))
    spark.sql(s"ALTER TABLE graft.`$root` DROP BRANCH wap")
    assert(VersionedTable.listBranches(spark, root).isEmpty)
    assert(rows(root).contains((900, "g0", 900L)))
    // a branch created AS OF VERSION 0 sees the pre-merge snapshot
    spark.sql(s"ALTER TABLE graft.`$root` CREATE BRANCH old AS OF VERSION 0")
    assert(rows(s"$root@old") == base)
    spark.sql(s"ALTER TABLE graft.`$root` DROP BRANCH old")
  }
}
