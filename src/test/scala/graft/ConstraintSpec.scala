package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable
import graft.ops.VersionedTable.ConstraintViolationException

/** CHECK constraints on the versioned table: registration validates the
  * backlog, enforcement gates every upsert delta and UPDATE result, the
  * rules carry through every commit kind. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_chk_$tag").toString
    val root = s"$dir/table"
    VersionedTable.upsert(spark, root,
      (0 until 100).map(i => (i, s"g${i % 2}", i.toLong))
        .toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"))
    root
  }

  test("addConstraint is metadata-only; violating upsert aborts unstaged") {
    val root = fresh("basic")
    val fs = FileSystem.get(java.net.URI.create(root),
      spark.sparkContext.hadoopConfiguration)
    val v1 = VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    assert(v1 == 1)
    assert(!fs.exists(new Path(root, "gen1")),
      "constraint registration must not write data")
    assert(VersionedTable.constraintsOf(spark, root) ==
      Map("v_nonneg" -> "v >= 0"))
    // a violating delta aborts with NOTHING staged or committed
    intercept[ConstraintViolationException] {
      VersionedTable.upsert(spark, root,
        Seq((500, "g0", -1L)).toDF("id", "grp", "v"),
        Seq("id", "grp"), Seq("grp"))
    }
    assert(VersionedTable.history(spark, root) == (0 to 1))
    assert(!fs.exists(new Path(root, "_manifest.2")),
      "aborted write left a claim behind")
    assert(VersionedTable.read(spark, root).count() == 100)
    // a passing delta commits
    VersionedTable.upsert(spark, root,
      Seq((500, "g0", 7L)).toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"))
    assert(VersionedTable.read(spark, root).count() == 101)
  }

  test("ANSI semantics: NULL predicate passes, only definite FALSE rejects") {
    val root = fresh("ansi")
    VersionedTable.addConstraint(spark, root, "v_pos", "v >= 0")
    // NULL v: predicate UNKNOWN -> passes (the ANSI CHECK rule)
    VersionedTable.upsert(spark, root,
      Seq((600, "g0", null.asInstanceOf[java.lang.Long]))
        .toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"))
    assert(VersionedTable.read(spark, root)
      .filter($"id" === 600 && $"v".isNull).count() == 1)
  }

  test("addConstraint refuses a table already in violation") {
    val root = fresh("backlog")
    intercept[ConstraintViolationException] {
      VersionedTable.addConstraint(spark, root, "v_big", "v >= 50")
    }
    assert(VersionedTable.history(spark, root) == Seq(0))
    assert(VersionedTable.constraintsOf(spark, root).isEmpty)
  }

  test("updateWhere results are gated; dropConstraint lifts the gate") {
    val root = fresh("update")
    VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    intercept[ConstraintViolationException] {
      VersionedTable.updateWhere(spark, root, "id", 0, 10,
        Map("v" -> lit(-5L)))
    }
    // nothing committed by the refused update
    assert(VersionedTable.history(spark, root) == (0 to 1))
    assert(VersionedTable.read(spark, root).filter($"v" < 0).count() == 0)
    VersionedTable.dropConstraint(spark, root, "v_nonneg")
    VersionedTable.updateWhere(spark, root, "id", 0, 10,
      Map("v" -> lit(-5L)))
    assert(VersionedTable.read(spark, root).filter($"v" === -5L).count() == 11)
  }

  test("MERGE matched-rewrite results are gated like UPDATE") {
    val root = fresh("merge")
    VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    val vBefore = VersionedTable.currentVersion(spark, root).get
    // an UPDATE SET clause driving v negative must refuse, commit nothing
    val src = Seq((0, "g0", -100L)).toDF("id", "grp", "v")
    intercept[ConstraintViolationException] {
      VersionedTable.mergeClauses(spark, root, src, Seq("id", "grp"),
        matched = Seq(VersionedTable.MergeClause(None,
          Some(Map("v" -> lit(-100L))))),
        insertWhen = None)
    }
    assert(VersionedTable.currentVersion(spark, root).get == vBefore,
      "violating MERGE committed a version")
    assert(VersionedTable.read(spark, root).filter(col("v") < 0)
      .count() == 0)
    // a passing MERGE update commits
    VersionedTable.mergeClauses(spark, root, src, Seq("id", "grp"),
      matched = Seq(VersionedTable.MergeClause(None,
        Some(Map("v" -> lit(777L))))),
      insertWhen = None)
    assert(VersionedTable.read(spark, root).filter(col("v") === 777L)
      .count() == 1)
  }

  test("MERGE gate is not retroactive: an old violating row never " +
      "blocks a merge that does not rewrite it") {
    val root = fresh("merge_retro")
    // plant a violating row BEFORE the expectation exists (expectations
    // are documented as non-retroactive)
    VersionedTable.upsert(spark, root,
      Seq((500, "g0", -99L)).toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"))
    graft.ops.Expectations.add(spark, root, "v_nonneg", "v >= 0",
      graft.ops.Expectations.DropRows)
    // merge touching the SAME partition but a DIFFERENT row must pass
    VersionedTable.mergeClauses(spark, root,
      Seq((0, "g0", 123L)).toDF("id", "grp", "v"), Seq("id", "grp"),
      matched = Seq(VersionedTable.MergeClause(None,
        Some(Map("v" -> lit(123L))))),
      insertWhen = None)
    assert(VersionedTable.read(spark, root).filter(col("v") === 123L)
      .count() == 1)
    assert(VersionedTable.read(spark, root).filter(col("v") === -99L)
      .count() == 1, "the old violating row must survive untouched")
    // a clause REWRITING a row into violation is DROPPED under the
    // uniform MERGE semantic: the change is discarded and the OLD row
    // survives (counted) — only CHECK constraints FAIL a MERGE
    VersionedTable.mergeClauses(spark, root,
      Seq((0, "g0", 0L)).toDF("id", "grp", "v"), Seq("id", "grp"),
      matched = Seq(VersionedTable.MergeClause(None,
        Some(Map("v" -> lit(-1L))))),
      insertWhen = None)
    assert(graft.ops.Expectations.lastGateCounts == Map("v_nonneg" -> 1L))
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 0).select("v").as[Long].head() == 123L,
      "a violating rewrite must revert to the old row")
  }

  test("schema-evolving delta omitting a constrained column passes (NULL)") {
    val root = fresh("evolve")
    VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    // the delta has NO v column: its rows land v=NULL, which PASSES the
    // ANSI CHECK — previously this aborted with an unresolved-column
    // error before the write could commit
    VersionedTable.upsert(spark, root,
      Seq((900, "g0")).toDF("id", "grp"), Seq("id", "grp"), Seq("grp"))
    assert(VersionedTable.read(spark, root)
      .filter($"id" === 900 && $"v".isNull).count() == 1)
  }

  test("restore refuses a target version violating current constraints") {
    val dir = java.nio.file.Files.createTempDirectory("graft_chk_rst").toString
    val root = s"$dir/table"
    // v0 holds a negative row; v1 deletes it; v2 registers the rule
    VersionedTable.upsert(spark, root,
      (Seq((999, "g0", -7L)) ++ (0 until 50).map(i => (i, "g0", i.toLong)))
        .toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"))
    VersionedTable.deleteWhere(spark, root, "v", -100L, -1L)
    VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    // rolling back to v0 would make the table constrained AND in
    // violation — refused, nothing committed
    intercept[ConstraintViolationException] {
      VersionedTable.restore(spark, root, 0)
    }
    assert(VersionedTable.history(spark, root) == (0 to 2))
    // a clean target restores fine and keeps the rule
    VersionedTable.restore(spark, root, 1)
    assert(VersionedTable.constraintsOf(spark, root).contains("v_nonneg"))
  }

  test("constraints carry through compact/delete/restore; dropColumn guarded") {
    val root = fresh("carry")
    VersionedTable.addConstraint(spark, root, "v_nonneg", "v >= 0")
    VersionedTable.compact(spark, root)
    assert(VersionedTable.constraintsOf(spark, root).contains("v_nonneg"))
    VersionedTable.deleteWhere(spark, root, "v", 90, 99)
    assert(VersionedTable.constraintsOf(spark, root).contains("v_nonneg"))
    // restore keeps the CURRENT rules (governance, like txn watermarks)
    VersionedTable.restore(spark, root, 1)
    assert(VersionedTable.constraintsOf(spark, root).contains("v_nonneg"))
    // the gate still bites after all those commits
    intercept[ConstraintViolationException] {
      VersionedTable.upsert(spark, root,
        Seq((700, "g1", -3L)).toDF("id", "grp", "v"),
        Seq("id", "grp"), Seq("grp"))
    }
    // a referenced column cannot be dropped
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "v")
    }
    VersionedTable.dropConstraint(spark, root, "v_nonneg")
    VersionedTable.dropColumn(spark, root, "v")
    assert(!VersionedTable.read(spark, root).columns.contains("v"))
  }
}
