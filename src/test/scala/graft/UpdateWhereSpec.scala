package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Index-targeted UPDATE: the third leg of the DML triangle. */
class UpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(root: String): FileSystem = FileSystem.get(
    java.net.URI.create(root), spark.sparkContext.hadoopConfiguration)

  private def fileIds(root: String, rel: String): Set[(String, Long, Long)] =
    fsOf(root).listStatus(new Path(s"$root/gen0/$rel")).toSeq
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen)).toSet

  /** 400 rows over 4 partitions; v clustered so [60,110] hits g1/g2. */
  private def freshTable(tag: String): (String, Seq[(Int, String, Int, Long)]) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_upd_$tag").toString
    val root = s"$dir/table"
    val rows = (0 until 400).map { i =>
      val g = i / 100
      (i, s"g$g", g * 50 + (i % 100) / 4, i.toLong * 10)
    }
    VersionedTable.upsert(spark, root, rows.toDF("id", "grp", "v", "w"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    (root, rows)
  }

  test("updateWhere: window rows updated, untouched dirs byte-identical") {
    val (root, rows) = freshTable("basic")
    val g0Before = fileIds(root, "grp=g0")
    val g3Before = fileIds(root, "grp=g3")
    val v1 = VersionedTable.updateWhere(spark, root, "v", 60, 110,
      Map("w" -> (col("w") + 1000000L)), fileRows = Some(25))
    assert(v1 == 1)
    val got = VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Long)].collect().toMap
    val expect = rows.map { r =>
      r._1 -> (if (r._3 >= 60 && r._3 <= 110) r._4 + 1000000L else r._4)
    }.toMap
    assert(got == expect)
    // v (the predicate column) untouched everywhere
    assert(VersionedTable.read(spark, root)
      .select($"id", $"v").as[(Int, Int)].collect().toMap ==
      rows.map(r => r._1 -> r._3).toMap)
    // the index proves g0/g3 cannot match: byte-identity
    assert(fileIds(root, "grp=g0") == g0Before)
    assert(fileIds(root, "grp=g3") == g3Before)
    // time travel sees the original values
    assert(VersionedTable.read(spark, root, Some(0))
      .filter($"w" >= 1000000L).count() == 0)
    // rewritten dirs keep index coverage
    val (kept, total) = VersionedTable.skipStats(spark, root, "v", 0, 10)
    assert(kept < total, s"post-update stats missing: $kept/$total")
    // a window no file can hold is a provable no-op
    assert(VersionedTable.updateWhere(spark, root, "v", 5000, 6000,
      Map("w" -> lit(0L))) == 1)
  }

  test("updateWhere: SET right-hand sides see the OLD row (swap works)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upd_swap").toString
    val root = s"$dir/table"
    VersionedTable.upsert(spark, root,
      Seq((1, "a", 10L, 20L), (2, "a", 30L, 40L)).toDF("id", "p", "x", "y"),
      Seq("id", "p"), Seq("p"))
    VersionedTable.updateWhere(spark, root, "id", 1, 1,
      Map("x" -> col("y"), "y" -> col("x")))
    val got = VersionedTable.read(spark, root)
      .select($"id", $"x", $"y").as[(Int, Long, Long)].collect().toSet
    assert(got == Set((1, 20L, 10L), (2, 30L, 40L)))
  }

  test("updateWhere on a PARTITION-column predicate touches exactly that dir") {
    val (root, rows) = freshTable("partpred")
    val g0Before = fileIds(root, "grp=g0")
    val g2Before = fileIds(root, "grp=g2")
    VersionedTable.updateWhere(spark, root, "grp", "g1", "g1",
      Map("w" -> lit(-1L)), fileRows = Some(25))
    val got = VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Long)].collect().toMap
    val expect = rows.map { r =>
      r._1 -> (if (r._2 == "g1") -1L else r._4) }.toMap
    assert(got == expect)
    assert(fileIds(root, "grp=g0") == g0Before)
    assert(fileIds(root, "grp=g2") == g2Before)
  }

  test("updateWhere after a DV delete: dead rows stay dead and materialize") {
    val (root, rows) = freshTable("dv")
    VersionedTable.deleteWhereDV(spark, root, "v", 60, 80)
    VersionedTable.updateWhere(spark, root, "v", 60, 110,
      Map("w" -> lit(7L)), fileRows = Some(25))
    val got = VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Long)].collect().toMap
    val expect = rows.filter(r => r._3 < 60 || r._3 > 80).map { r =>
      r._1 -> (if (r._3 >= 60 && r._3 <= 110) 7L else r._4) }.toMap
    assert(got == expect)
    // the rewrite materialized the touched dirs' DVs
    assert(VersionedTable.dvStats(spark, root).isEmpty)
  }

  test("updateWhere guards: partition SET and unknown columns rejected") {
    val (root, _) = freshTable("guards")
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, "v", 0, 10,
        Map("grp" -> lit("gX")))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, "v", 0, 10,
        Map("nope" -> lit(1)))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, "v", 0, 10, Map.empty)
    }
    assert(VersionedTable.history(spark, root) == Seq(0))
  }
}
