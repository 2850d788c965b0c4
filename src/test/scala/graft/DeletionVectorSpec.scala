package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/**
 * Merge-on-read deletes (deletion vectors): deleteWhereDV records
 * per-file deleted positions in a `_dvx.*` sidecar instead of rewriting
 * data files; every read path must apply them, every rewrite must
 * materialize them, and the metadata folds must account for them.
 */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(root: String): FileSystem = FileSystem.get(
    java.net.URI.create(root), spark.sparkContext.hadoopConfiguration)

  /** Fixture: 400 rows over 4 partitions, v clustered per partition so
    * the delete window [60,110] hits g1/g2 only (same shape as the
    * rewrite-delete spec — results must be interchangeable). */
  private def freshTable(tag: String): (String, Seq[(Int, String, Int)]) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_dv_$tag").toString
    val root = s"$dir/table"
    val rows = (0 until 400).map { i =>
      val g = i / 100
      (i, s"g$g", g * 50 + (i % 100) / 4)
    }
    VersionedTable.upsert(spark, root, rows.toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    (root, rows)
  }

  test("deleteWhereDV: rows vanish from read() with ZERO data files written") {
    val (root, rows) = freshTable("basic")
    val fs = fsOf(root)
    def dataFiles(): Set[String] = {
      val it = fs.listFiles(new Path(root), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath.toString
        if (f.endsWith(".parquet")) b += f
      }
      b.result()
    }
    val before = dataFiles()
    val v1 = VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    assert(v1 == 1)
    // merge-on-read: the data-file set is BYTE-FOR-BYTE the same
    assert(dataFiles() == before, "DV delete must not write data files")
    assert(fs.exists(new Path(root, "_dvx.1")), "DV sidecar missing")
    val after = VersionedTable.read(spark, root)
      .select($"id", $"v").as[(Int, Int)].collect().toMap
    val expect = rows.filter(r => r._3 < 60 || r._3 > 110)
      .map(r => r._1 -> r._3).toMap
    assert(after == expect)
    // time travel: the pre-delete version still reads all 400 rows
    assert(VersionedTable.read(spark, root, Some(0)).count() == 400)
    // pruned reads honor the DV too (scanUnion path)
    val w = VersionedTable.readWhere(spark, root, "v", 100, 120)
      .select($"id").as[Int].collect().toSet
    assert(w == rows.filter(r => r._3 > 110 && r._3 <= 120).map(_._1).toSet)
    // dvStats reports the deleted cardinality
    assert(VersionedTable.dvStats(spark, root).map(_._2).sum ==
      rows.count(r => r._3 >= 60 && r._3 <= 110))
  }

  test("deleteWhereDV twice: positions union, no-op commits nothing") {
    val (root, rows) = freshTable("union")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 80)
    val v2 = VersionedTable.deleteWhereDV(spark, root, "v", 70, 110)
    assert(v2 == 2)
    val got = VersionedTable.read(spark, root)
      .select($"id").as[Int].collect().toSet
    assert(got == rows.filter(r => r._3 < 60 || r._3 > 110).map(_._1).toSet)
    // exact count: no double-deleted positions
    assert(VersionedTable.read(spark, root).count() ==
      rows.count(r => r._3 < 60 || r._3 > 110))
    // re-deleting an already-deleted range is a provable no-op: the
    // current version is returned and NO version is committed
    assert(VersionedTable.deleteWhereDV(spark, root, "v", 60, 110) == 2)
    assert(VersionedTable.history(spark, root) == (0 to 2))
    // time travel between DV commits: v1 shows exactly the FIRST
    // delete's state (each manifest pins its own DV refs)
    assert(VersionedTable.read(spark, root, Some(1))
      .select($"id").as[Int].collect().toSet ==
      rows.filter(r => r._3 < 60 || r._3 > 80).map(_._1).toSet)
    assert(VersionedTable.read(spark, root, Some(0)).count() == 400)
    // out-of-domain range: index-proven no-op
    assert(VersionedTable.deleteWhereDV(spark, root, "v", 5000, 6000) == 2)
  }

  test("deleteWhereDV equals deleteWhere row-for-row") {
    val (rootDv, _) = freshTable("eqa")
    val (rootRw, _) = freshTable("eqb")
    VersionedTable.deleteWhereDV(spark, rootDv, "v", 60, 110)
    VersionedTable.deleteWhere(spark, rootRw, "v", 60, 110)
    val a = VersionedTable.read(spark, rootDv)
      .select($"id", $"grp", $"v").as[(Int, String, Int)].collect().toSet
    val b = VersionedTable.read(spark, rootRw)
      .select($"id", $"grp", $"v").as[(Int, String, Int)].collect().toSet
    assert(a == b)
  }

  test("upsert after DV delete: deleted rows stay dead, refs carry/drop") {
    val (root, rows) = freshTable("merge")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    // touch g1 (which has DV'd files) with ONE new row: the merge's
    // survivor side must not resurrect deleted g1 rows
    VersionedTable.upsert(spark, root,
      Seq((1000, "g1", 777)).toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    val got = VersionedTable.read(spark, root)
      .select($"id", $"v").as[(Int, Int)].collect().toMap
    val expect = rows.filter(r => r._3 < 60 || r._3 > 110)
      .map(r => r._1 -> r._3).toMap + (1000 -> 777)
    assert(got == expect)
    // g1 was rewritten -> its DVs materialized and dropped; g2 untouched
    // -> its DV refs carried
    val remaining = VersionedTable.dvStats(spark, root)
    assert(remaining.nonEmpty, "untouched g2 DVs should carry")
    assert(remaining.forall(_._1.contains("grp=g2")),
      s"only g2 refs should remain, got: ${remaining.map(_._1)}")
    // counts stay exact through carry
    assert(VersionedTable.read(spark, root).count() == expect.size)
  }

  test("compact materializes DVs; vacuum then drops the sidecar") {
    val (root, rows) = freshTable("compact")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    val live = rows.filter(r => r._3 < 60 || r._3 > 110)
    VersionedTable.compact(spark, root, statsCols = Seq("v"))
    assert(VersionedTable.dvStats(spark, root).isEmpty,
      "compact must materialize deletes and drop DV refs")
    assert(VersionedTable.read(spark, root)
      .select($"id").as[Int].collect().toSet == live.map(_._1).toSet)
    val fs = fsOf(root)
    assert(fs.exists(new Path(root, "_dvx.1")),
      "sidecar retained while v1 is time-travel readable")
    VersionedTable.vacuum(spark, root, keepVersions = 1)
    assert(!fs.exists(new Path(root, "_dvx.1")),
      "vacuum must retire a sidecar no retained manifest references")
    assert(VersionedTable.read(spark, root).count() == live.size)
  }

  test("compactSmallFiles on a DV'd hot dir materializes; cold dirs carry") {
    val (root, rows) = freshTable("csf")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    // make g1 hot (4 files from fileRows=25 -> qualifies at >=4)
    val v = VersionedTable.compactSmallFiles(spark, root, minFilesPerDir = 4,
      fileRows = None)
    assert(v == 2)
    val got = VersionedTable.read(spark, root)
      .select($"id").as[Int].collect().toSet
    assert(got == rows.filter(r => r._3 < 60 || r._3 > 110).map(_._1).toSet)
  }

  test("metadata folds: fastCount subtracts, fastMinMax falls back") {
    val (root, rows) = freshTable("folds")
    assert(VersionedTable.fastCount(spark, root).contains(400L))
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    val liveN = rows.count(r => r._3 < 60 || r._3 > 110)
    assert(VersionedTable.fastCount(spark, root).contains(liveN.toLong),
      "fastCount must subtract DV cardinalities")
    // v's true max (174, in g3) is not deleted, but the fold cannot
    // prove that — it must decline, not guess
    assert(VersionedTable.fastMinMax(spark, root, "v").isEmpty,
      "fastMinMax over a DV'd table must fall back to a scan")
    // the optimizer COUNT(*) fold over graft_table agrees with the scan
    val dfCount = graft.plans.VersionedScan.table(spark, root).count()
    assert(dfCount == liveN.toLong)
    // grouped partition-count fold subtracts per dir
    val byGrp = graft.plans.VersionedScan.table(spark, root)
      .groupBy($"grp").count().as[(String, Long)].collect().toMap
    val expect = rows.filter(r => r._3 < 60 || r._3 > 110)
      .groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
    assert(byGrp == expect)
  }

  test("changeFeed across a DV delete emits op=delete rows") {
    val (root, rows) = freshTable("cdf")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    val feed = VersionedTable.changeFeed(spark, root, Seq("id", "grp"), 0, 1)
      .select($"op", $"id").as[(String, Int)].collect()
    val dead = rows.filter(r => r._3 >= 60 && r._3 <= 110).map(_._1).toSet
    assert(feed.filter(_._1 == "delete").map(_._2).toSet == dead)
    assert(!feed.exists(_._1 != "delete"))
  }

  test("SQL over graft_table sees through DVs; plain filter prunes AND applies") {
    val (root, rows) = freshTable("sql")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 110)
    val got = graft.plans.VersionedScan.table(spark, root)
      .filter($"v" >= 50 && $"v" <= 130)
      .select($"id").as[Int].collect().toSet
    assert(got == rows.filter(r =>
      r._3 >= 50 && r._3 <= 130 && !(r._3 >= 60 && r._3 <= 110))
      .map(_._1).toSet)
  }

  test("maxDeleteRows guard refuses dense deletes with a rewrite hint") {
    val (root, _) = freshTable("guard")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.deleteWhereDV(spark, root, "v", 0, 1000, maxDeleteRows = 10)
    }
    assert(e.getMessage.contains("deleteWhere"))
    // nothing committed by the refused attempt
    assert(VersionedTable.history(spark, root) == Seq(0))
  }

  test("deleteWhereInDV: key-list erasure touches only the needles' files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_in").toString
    val root = s"$dir/table"
    // bloom-indexed high-cardinality id, 2 partitions, small files
    val rows = (0 until 400).map(i => (i.toLong * 7 + 1, s"g${i % 2}", i))
    VersionedTable.upsert(spark, root, rows.toDF("uid", "grp", "n"),
      Seq("uid", "grp"), Seq("grp"), statsCols = Seq("uid"),
      fileRows = Some(25), bloomCols = Seq("uid"))
    val victims = Seq(rows(3)._1, rows(77)._1, rows(250)._1, null)
    val fs = fsOf(root)
    def dataFiles(): Int = {
      val it = fs.listFiles(new Path(root), true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val before = dataFiles()
    val v1 = VersionedTable.deleteWhereInDV(spark, root, "uid", victims)
    assert(v1 == 1)
    assert(dataFiles() == before, "merge-on-read: no data files written")
    val got = VersionedTable.read(spark, root)
      .select($"uid").as[Long].collect().toSet
    assert(got == rows.map(_._1).toSet -- victims.filter(_ != null)
      .map(_.asInstanceOf[Long]))
    assert(VersionedTable.dvStats(spark, root).map(_._2).sum == 3)
    // empty / all-null / miss lists are no-ops: nothing committed
    assert(VersionedTable.deleteWhereInDV(spark, root, "uid", Nil) == 1)
    assert(VersionedTable.deleteWhereInDV(spark, root, "uid",
      Seq(null)) == 1)
    assert(VersionedTable.deleteWhereInDV(spark, root, "uid",
      Seq(-999L)) == 1)
    assert(VersionedTable.history(spark, root) == (0 to 1))
  }

  test("deleteWhereIn (rewrite) equals the DV flavor; untouched dirs intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rw_in").toString
    val rootA = s"$dir/a"
    val rootB = s"$dir/b"
    // uid clustered per partition so victim ids living in g0 leave g1's
    // candidate files provably clear
    val rows = (0 until 400).map(i => (i.toLong, s"g${i / 200}", i))
    Seq(rootA, rootB).foreach(r => VersionedTable.upsert(spark, r,
      rows.toDF("uid", "grp", "n"), Seq("uid", "grp"), Seq("grp"),
      statsCols = Seq("uid"), fileRows = Some(25)))
    val victims: Seq[Any] = Seq(5L, 17L, 130L) // all in g0
    VersionedTable.deleteWhereIn(spark, rootA, "uid", victims,
      fileRows = Some(25))
    VersionedTable.deleteWhereInDV(spark, rootB, "uid", victims)
    val a = VersionedTable.read(spark, rootA)
      .select($"uid", $"n").as[(Long, Int)].collect().toSet
    val b = VersionedTable.read(spark, rootB)
      .select($"uid", $"n").as[(Long, Int)].collect().toSet
    assert(a == b)
    assert(a.size == 397)
    // g1 holds no victims: still mapped to gen0 (gen dirs are immutable,
    // so "still gen0" — not a gen0 file listing — proves no rewrite);
    // g0 DID rewrite
    val mapping = VersionedTable.resolveManifest(spark, rootA, None).mapping
    assert(mapping("grp=g1") == "gen0")
    assert(mapping("grp=g0") != "gen0")
  }

  test("deleteMatching: compound predicate, index-pruned both flavors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_match").toString
    val rootA = s"$dir/dv"
    val rootB = s"$dir/rw"
    // v clustered per partition; w independent second condition
    val rows = (0 until 400).map { i =>
      val g = i / 100
      (i, s"g$g", g * 50 + (i % 100) / 4, i % 3)
    }
    Seq(rootA, rootB).foreach(r => VersionedTable.upsert(spark, r,
      rows.toDF("id", "grp", "v", "w"), Seq("id", "grp"), Seq("grp"),
      statsCols = Seq("v"), fileRows = Some(25)))
    // compound: v-range (file stats prune) AND partition fact (dir
    // prune) AND a residual on w the index can't express
    val pred = col("v").between(60, 110) && col("grp") =!= "g2" &&
      col("w") === 1
    // generations are immutable: a rewrite repoints the MAPPING to a new
    // gen dir, so "still gen0" is the byte-identity proof
    def genOf(root: String, rel: String): String =
      VersionedTable.resolveManifest(spark, root, None).mapping(rel)
    val dvFilesBefore = {
      val it = fsOf(rootA).listFiles(new Path(rootA), true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val vA = VersionedTable.deleteMatchingDV(spark, rootA, pred)
    val vB = VersionedTable.deleteMatching(spark, rootB, pred,
      fileRows = Some(25))
    assert(vA == 1 && vB == 1)
    val expect = rows.filterNot(r =>
      r._3 >= 60 && r._3 <= 110 && r._2 != "g2" && r._4 == 1)
      .map(r => (r._1, r._4)).toSet
    def got(root: String) = VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Int)].collect().toSet
    assert(got(rootA) == expect)
    assert(got(rootB) == expect)
    // DV flavor: zero data files written
    val dvFilesAfter = {
      val it = fsOf(rootA).listFiles(new Path(rootA), true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    assert(dvFilesAfter == dvFilesBefore)
    // rewrite flavor: the partition fact proves g2 clear -> still gen0;
    // the v-range proves g0 clear (v in [0,24]) and g3 (v in [150,174]);
    // g1 (v in [50,74] overlapping [60,110]) DID rewrite
    assert(genOf(rootB, "grp=g2") == "gen0")
    assert(genOf(rootB, "grp=g0") == "gen0")
    assert(genOf(rootB, "grp=g3") == "gen0")
    assert(genOf(rootB, "grp=g1") != "gen0")
    // guards: nondeterministic and subquery predicates refuse loudly
    intercept[IllegalArgumentException] {
      VersionedTable.deleteMatching(spark, rootB,
        org.apache.spark.sql.functions.rand() < 0.5)
    }
  }

  test("unrenderable stats types (Boolean) never prune — no silent misses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_boolstat").toString
    val root = s"$dir/t"
    val rows = (0 until 100).map(i => (i.toLong, "g0", i % 2 == 0))
    // statsCols on a BOOLEAN column: renderStat has no case for the
    // type, so every file records ColStat(None, None, ...) even though
    // no value is null — the probes must treat that as "unknown", not
    // "all-null", or key-list erasure silently misses every row
    VersionedTable.upsert(spark, root, rows.toDF("id", "grp", "flag"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("flag"),
      fileRows = Some(25))
    VersionedTable.deleteWhereIn(spark, root, "flag", Seq(true),
      fileRows = Some(25))
    assert(VersionedTable.read(spark, root)
      .select($"id").as[Long].collect().toSet ==
      rows.filterNot(_._3).map(_._1).toSet)
    // the optimizer-rule constraint path must keep the files too
    val viaRule = VersionedTable.readConstrained(spark, root,
      Seq(VersionedTable.ColConstraint("flag", None, None, Some(false))),
      None).count()
    assert(viaRule == 50)
  }

  test("DV serialization round-trips arbitrary sorted position sets") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val n = rnd.nextInt(200)
      val ps = Array.fill(n)(rnd.nextLong().abs % 3000000L).sorted.distinct
      val got = VersionedTable.deserializeDv(VersionedTable.serializeDv(ps))
      assert(got.toSeq == ps.toSeq)
    }
    assert(VersionedTable.deserializeDv(
      VersionedTable.serializeDv(Array.empty[Long])).isEmpty)
  }
}
