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
