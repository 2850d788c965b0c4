package graft

import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** The pure-SQL DML/maintenance surface (GraftSqlParser): every lake
  * lifecycle statement through `spark.sql(...)` alone, equal to its
  * Scala-API twin, with the same index pruning engaged. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  /** 400 rows over 4 partitions; v clustered per partition. */
  private def freshTable(tag: String): (String, Seq[(Int, String, Int, Long)]) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_sql_$tag").toString
    val root = s"$dir/table"
    val rows = (0 until 400).map { i =>
      val g = i / 100
      (i, s"g$g", g * 50 + (i % 100) / 4, i.toLong * 10)
    }
    VersionedTable.upsert(spark, root, rows.toDF("id", "grp", "v", "w"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    (root, rows)
  }

  private def genOf(root: String, rel: String): String =
    VersionedTable.resolveManifest(spark, root, None).mapping(rel)

  test("SQL DELETE: compound predicate, index pruning engaged") {
    val (root, rows) = freshTable("del")
    val res = spark.sql(
      s"DELETE FROM graft.`$root` WHERE v BETWEEN 60 AND 110 " +
        "AND grp != 'g2' AND w % 20 = 0")
    assert(res.columns.toSeq == Seq("version"))
    assert(res.collect().map(_.getInt(0)).toSeq == Seq(1))
    val expect = rows.filterNot(r =>
      r._3 >= 60 && r._3 <= 110 && r._2 != "g2" && r._4 % 20 == 0)
      .map(r => (r._1, r._4)).toSet
    assert(VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Long)].collect().toSet == expect)
    // same pruning as the Scala twin: range clears g0/g3, the =!=
    // partition fact clears g2 — only g1 rewrote
    assert(genOf(root, "grp=g0") == "gen0")
    assert(genOf(root, "grp=g2") == "gen0")
    assert(genOf(root, "grp=g3") == "gen0")
    assert(genOf(root, "grp=g1") != "gen0")
  }

  test("SQL DELETE with table alias; WHERE-less clears the whole table") {
    val (root, rows) = freshTable("delalias")
    spark.sql(s"DELETE FROM graft.`$root` AS t WHERE t.v < 10")
    assert(VersionedTable.read(spark, root).count() ==
      rows.count(_._3 >= 10))
    // a bare DELETE (parsed condition = TRUE) commits a valid 0-row
    // version: schema survives, reads return empty, history lists it,
    // and a later upsert repopulates the cleared table
    spark.sql(s"DELETE FROM graft.`$root`")
    val cleared = VersionedTable.read(spark, root)
    assert(cleared.columns.toSeq == Seq("id", "grp", "v", "w"))
    assert(cleared.count() == 0)
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$root`")
      .collect().last.getLong(3) == 0L)
    VersionedTable.upsert(spark, root,
      Seq((1, "g0", 3, 7L)).toDF("id", "grp", "v", "w"),
      Seq("id", "grp"), Seq("grp"))
    assert(VersionedTable.read(spark, root).count() == 1)
  }

  test("SQL UPDATE: SET sees the OLD row; WHERE prunes; version returned") {
    val (root, rows) = freshTable("upd")
    val res = spark.sql(
      s"UPDATE graft.`$root` SET w = w + 1000000 WHERE v BETWEEN 60 AND 110")
    assert(res.collect().map(_.getInt(0)).toSeq == Seq(1))
    val expect = rows.map { r =>
      r._1 -> (if (r._3 >= 60 && r._3 <= 110) r._4 + 1000000L else r._4)
    }.toMap
    assert(VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Long)].collect().toMap == expect)
    assert(genOf(root, "grp=g0") == "gen0")
    assert(genOf(root, "grp=g3") == "gen0")
    // swap through one statement: both right-hand sides see OLD values
    val swapDir = java.nio.file.Files.createTempDirectory("graft_sql_swap")
    val swapRoot = s"$swapDir/t"
    VersionedTable.upsert(spark, swapRoot,
      Seq((1, "a", 10L, 20L)).toDF("id", "p", "x", "y"), Seq("id", "p"),
      Seq("p"))
    spark.sql(s"UPDATE graft.`$swapRoot` SET x = y, y = x WHERE id = 1")
    assert(VersionedTable.read(spark, swapRoot)
      .select($"x", $"y").as[(Long, Long)].collect().toSeq ==
      Seq((20L, 10L)))
  }

  test("SQL MERGE: upsert semantics, index coverage survives") {
    val (root, rows) = freshTable("merge")
    // ids 390-399 match (10 updates, w := -1) + 400-439 are new (40 inserts)
    val src = ((390 until 440).map(i => (i, s"g${i / 100 min 3}", 1, -1L)))
      .toDF("id", "grp", "v", "w")
    src.createOrReplaceTempView("sql_merge_src")
    val res = spark.sql(
      s"""MERGE INTO graft.`$root` t USING sql_merge_src s
         |ON t.id = s.id AND t.grp = s.grp
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(res.collect().map(_.getInt(0)).toSeq == Seq(1))
    val got = VersionedTable.read(spark, root)
      .select($"id", $"w").as[(Int, Long)].collect().toMap
    assert(got.size == 440)
    assert((390 until 440).forall(got(_) == -1L))
    assert(got(0) == 0L)
    // the stats index survived the SQL-driven ingest: skipStats still
    // prunes on v
    val (kept, total) = VersionedTable.skipStats(spark, root, "v", 0, 5)
    assert(kept < total, s"stats lost through SQL MERGE: $kept/$total")
    // the clause matrix still guards the partitioned-merge contract:
    // ON keys that do not cover the partition columns refuse loudly (a
    // match could otherwise live outside the pruned partitions)
    val bad = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_merge_src s
           |ON t.id = s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(bad.getMessage.contains("partition column"))
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION admits new source columns") {
    val (root, rows) = freshTable("evolve")
    // source covers the table plus a NEW column `score`
    (Seq((1, "g0", 999, 5L, 0.5), (400, "g3", 1, 6L, 0.9)))
      .toDF("id", "grp", "v", "w", "score")
      .createOrReplaceTempView("sql_evolve_src")
    // plain MERGE refuses the extra column loudly
    val bad = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_evolve_src s
           |ON t.id = s.id AND t.grp = s.grp
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(bad.getMessage.contains("SCHEMA EVOLUTION"))
    // WITH SCHEMA EVOLUTION adds it: old rows surface NULL, no rewrite
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$root` t
         |USING sql_evolve_src s
         |ON t.id = s.id AND t.grp = s.grp
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = VersionedTable.read(spark, root)
    assert(got.columns.toSeq ==
      Seq("id", "grp", "v", "w", "score")) // table order + appended
    assert(got.count() == 401)
    val scores = got.select($"id", $"score").as[(Int, Option[Double])]
      .collect().toMap
    assert(scores(1) == Some(0.5) && scores(400) == Some(0.9))
    assert(scores(2).isEmpty) // untouched generation null-fills
    // a source missing a table column refuses in BOTH modes
    Seq((2, "g0", 1)).toDF("id", "grp", "v")
      .createOrReplaceTempView("sql_evolve_narrow")
    val bad2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$root` t
           |USING sql_evolve_narrow s
           |ON t.id = s.id AND t.grp = s.grp
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(bad2.getMessage.contains("lacks table columns"))
  }

  test("SQL OPTIMIZE / VACUUM / RESTORE / DESCRIBE HISTORY") {
    val (root, rows) = freshTable("maint")
    spark.sql(s"DELETE FROM graft.`$root` WHERE v < 10") // v1
    // OPTIMIZE with ZORDER re-clusters and preserves the index family
    val v2 = spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (v)")
      .collect().head.getInt(0)
    assert(v2 == 2)
    val (kept, total) = VersionedTable.skipStats(spark, root, "v", 150, 160)
    assert(kept < total, s"post-OPTIMIZE stats missing: $kept/$total")
    // history: three versions, ascending commit times, live row counts
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$root`").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    // operation names: the commit kind rides in each manifest
    assert(hist.map(_.getString(1)).toSeq ==
      Seq("merge", "delete", "compact"))
    assert(hist.map(_.getTimestamp(2).getTime).toSeq.sorted ==
      hist.map(_.getTimestamp(2).getTime).toSeq)
    assert(hist.last.getLong(3) == rows.count(_._3 >= 10))
    // RESTORE to v0 commits v3 with the original content
    val v3 = spark.sql(s"RESTORE graft.`$root` TO VERSION AS OF 0")
      .collect().head.getInt(0)
    assert(v3 == 3)
    assert(VersionedTable.read(spark, root).count() == 400)
    // VACUUM RETAIN 1: only the current version stays readable
    val keptN = spark.sql(s"VACUUM graft.`$root` RETAIN 1 VERSIONS")
      .collect().head.getInt(0)
    assert(keptN == 1)
    assert(VersionedTable.history(spark, root) == Seq(3))
    assert(VersionedTable.read(spark, root).count() == 400)
    // graft_table('...') target spelling parses too
    assert(spark.sql(s"DESCRIBE HISTORY graft_table('$root')")
      .collect().map(_.getInt(0)).toSeq == Seq(3))
    // age-based retention from SQL: a wide window keeps everything, a
    // zero-hour window retires all but the current version
    VersionedTable.upsert(spark, root,
      Seq((900, "g0", 1, 1L)).toDF("id", "grp", "v", "w"),
      Seq("id", "grp"), Seq("grp")) // v4
    assert(spark.sql(s"VACUUM graft.`$root` RETAIN 1000 HOURS")
      .collect().head.getInt(0) == 2)
    assert(spark.sql(s"VACUUM graft.`$root` RETAIN 0 DAYS")
      .collect().head.getInt(0) == 1)
    assert(VersionedTable.read(spark, root).count() == 401)
  }

  test("non-graft SQL passes through untouched") {
    assert(spark.sql("SELECT 1 AS x").collect().head.getInt(0) == 1)
    // DELETE on a non-graft target falls through to Spark's own
    // resolution (and fails there as a missing table, not in our code)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM no_such_table WHERE 1 = 1")
    }
    // a query merely MENTIONING the word graft is untouched
    assert(spark.sql("SELECT 'graft' AS s").collect().head.getString(0)
      == "graft")
    // a two-part identifier under a CATALOG database named graft is not
    // hijacked: only path-shaped roots (containing '/') are ours, so
    // this fails in Spark's resolution, not with our FileNotFound
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM graft.sales WHERE 1 = 1")
    }
  }

  test("SQL DML rejects mis-qualified targets instead of guessing") {
    val (root, _) = freshTable("misq")
    // UPDATE SET with a qualifier that is not the table alias: the
    // last-name-part would silently hit column w — must error instead
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE graft.`$root` AS t SET u.w = 1 WHERE t.v < 5")
    }
    assert(e1.getMessage.contains("top-level columns"))
    // struct-field-shaped SET target errors the same way
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"UPDATE graft.`$root` AS t SET t.w.q = 1")
    }
    assert(e2.getMessage.contains("top-level columns"))
    // MERGE ON t.id = t.id (both sides target): standard MERGE means
    // every-source-row-matches, never a keyed upsert — loud error
    Seq((1, "g0", 1, 1L)).toDF("id", "grp", "v", "w")
      .createOrReplaceTempView("sql_misq_src")
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_misq_src s
           |ON t.id = t.id AND t.grp = s.grp
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e3.getMessage.contains("same table on both sides"))
    // unknown qualifier in the ON clause errors too
    val e4 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_misq_src s
           |ON t.id = x.id AND t.grp = s.grp
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e4.getMessage.contains("neither the target nor the source"))
    // ON id = id with BOTH sides unqualified: the same degenerate
    // self-comparison in disguise — ambiguous, never an upsert key
    val e5 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_misq_src s
           |ON id = id AND t.grp = s.grp
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e5.getMessage.contains("ambiguous"))
    // one side qualified + one unqualified stays accepted
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING sql_misq_src s
         |ON t.id = id AND t.grp = s.grp
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
  }

  test("SQL MERGE clause matrix: conditional matched UPDATE/DELETE, " +
      "NOT MATCHED BY SOURCE, first-match-wins, one commit") {
    val (root, rows) = freshTable("matrix")
    val srcRows = (50 to 149).map(i => (i, s"g${i / 100}", i, 7L)) ++
      Seq((1000, "g0", 1, 2L), (1001, "g0", 1, 2L))
    srcRows.toDF("id", "grp", "v", "w")
      .createOrReplaceTempView("sql_matrix_src")
    val before = VersionedTable.currentVersion(spark, root).get
    val res = spark.sql(
      s"""MERGE INTO graft.`$root` t USING sql_matrix_src s
         |ON t.id = s.id AND t.grp = s.grp
         |WHEN MATCHED AND s.v > 100 THEN DELETE
         |WHEN MATCHED AND t.w < 700 THEN UPDATE SET w = t.w + s.w,
         |  v = s.v
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND v < 5 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND w > 3900 THEN UPDATE SET v = -1
         |""".stripMargin)
    // ONE commit for the whole matrix
    assert(res.collect().map(_.getInt(0)).toSeq == Seq(before + 1))
    val srcByKey = srcRows.map(r => (r._1, r._2) -> r).toMap
    val expected = (rows.flatMap { case r @ (id, grp, v, w) =>
      srcByKey.get((id, grp)) match {
        case Some(sr) =>
          if (sr._3 > 100) None // matched DELETE
          else if (w < 700) Some((id, grp, sr._3, w + sr._4))
          else Some(sr) // SET *
        case None =>
          if (v < 5) None // by-source DELETE
          else if (w > 3900) Some((id, grp, -1, w))
          else Some(r)
      }
    } ++ Seq((1000, "g0", 1, 2L), (1001, "g0", 1, 2L))).toSet
    assert(VersionedTable.read(spark, root)
      .as[(Int, String, Int, Long)].collect().toSet == expected)

    // refusals stay loud
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$root` t
           |USING sql_matrix_src s ON t.id = s.id AND t.grp = s.grp
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("canonical"))
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_matrix_src s
           |ON t.id = s.id AND t.grp = s.grp
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)""".stripMargin)
    }
    assert(e2.getMessage.contains("INSERT *"))
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_matrix_src s
           |ON t.id = s.id AND t.grp = s.grp
           |WHEN MATCHED THEN UPDATE SET grp = 'g9'""".stripMargin)
    }
    assert(e3.getMessage.contains("partition column"))
    // a BY SOURCE clause referencing the source refuses
    val e4 = intercept[IllegalArgumentException] {
      spark.sql(
        s"""MERGE INTO graft.`$root` t USING sql_matrix_src s
           |ON t.id = s.id AND t.grp = s.grp
           |WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE""".stripMargin)
    }
    assert(e4.getMessage.contains("BY SOURCE"))
  }

  test("SQL MERGE matrix: matched-only prunes; insert-only on no-match " +
      "partitions still lands") {
    val (root, rows) = freshTable("matrix2")
    // source confined to g1: only that partition may rewrite
    Seq((101, "g1", 999, 1L)).toDF("id", "grp", "v", "w")
      .createOrReplaceTempView("sql_matrix2_src")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING sql_matrix2_src s
         |ON t.id = s.id AND t.grp = s.grp
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(genOf(root, "grp=g0") == "gen0")
    assert(genOf(root, "grp=g2") == "gen0")
    assert(genOf(root, "grp=g3") == "gen0")
    assert(genOf(root, "grp=g1") != "gen0")
    assert(VersionedTable.read(spark, root)
      .filter($"id" === 101).select($"v").head.getInt(0) == 999)
    // source in a BRAND-NEW partition with only an INSERT clause
    Seq((9000, "g7", 1, 1L)).toDF("id", "grp", "v", "w")
      .createOrReplaceTempView("sql_matrix2_new")
    spark.sql(
      s"""MERGE INTO graft.`$root` t USING sql_matrix2_new s
         |ON t.id = s.id AND t.grp = s.grp
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(VersionedTable.read(spark, root).filter($"grp" === "g7")
      .count() == 1)
    assert(VersionedTable.read(spark, root).count() == rows.size + 1)
  }

  test("SQL derived partitions and materialized views") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sql_dp").toString
    val (src, view) = (s"$dir/src", s"$dir/view")
    val rows = (0 until 200).map { i =>
      (i, java.sql.Timestamp.valueOf(
        f"2024-03-${1 + i % 9}%02d ${i % 24}%02d:00:00"), s"s${i % 4}",
        i.toLong) }
    val df = rows.toDF("id", "ts", "source", "n")
      .withColumn("day", VersionedTable.derivedPartitionColumn("day", "ts"))
    VersionedTable.upsert(spark, src, df, Seq("id", "day"), Seq("day"))
    // ALTER TABLE ... ADD DERIVED PARTITION through SQL
    val v1 = spark.sql(
      s"ALTER TABLE graft.`$src` ADD DERIVED PARTITION day = day(ts)")
      .collect().head.getInt(0)
    assert(v1 == 1)
    assert(VersionedTable.derivedPartitionsOf(spark, src) ==
      Map("day" -> (("day", "ts"))))
    // CREATE MATERIALIZED VIEW ... AS SELECT through SQL
    val mv = spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`$view` KEYED BY (id, day)
         |AS SELECT source, sum(n) AS n_sum, count(*) AS cnt
         |FROM graft_table('$src') GROUP BY source""".stripMargin)
    assert(mv.collect().head.getInt(0) == 0)
    // source advances; REFRESH brings the view current incrementally
    VersionedTable.deleteMatching(spark, src, col("id") % 3 === 0)
    spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`")
    val want = rows.filterNot(_._1 % 3 == 0).groupBy(_._3)
      .map { case (s, rs) => (s, rs.map(_._4).sum, rs.size.toLong) }.toSet
    val got = graft.ops.MatView.read(spark, view)
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    // unsupported MV shapes refuse loudly (avg/approx_count_distinct
    // are maintainable and supported; stddev is not)
    val bad = intercept[IllegalArgumentException] {
      spark.sql(
        s"""CREATE MATERIALIZED VIEW graft.`$dir/v2` KEYED BY (id)
           |AS SELECT source, stddev(n) AS m
           |FROM graft_table('$src') GROUP BY source""".stripMargin)
    }
    assert(bad.getMessage.contains("sum|avg|min|max"))
    // the served view from pure SQL, via the graft_view table function
    val sqlGot = spark.sql(
      s"SELECT source, n_sum, cnt FROM graft_view('$view') ORDER BY source")
      .as[(String, Long, Long)].collect().toSet
    assert(sqlGot == got)
    // DROP DERIVED PARTITION deregisters
    spark.sql(s"ALTER TABLE graft.`$src` DROP DERIVED PARTITION day")
    assert(VersionedTable.derivedPartitionsOf(spark, src).isEmpty)
  }

  test("DESCRIBE DETAIL and graft_partitions expose manifest metadata") {
    val (root, rows) = freshTable("detail")
    spark.sql(s"DELETE FROM graft.`$root` WHERE v < 10") // v1: g0 shrinks
    val d = spark.sql(s"DESCRIBE DETAIL graft.`$root`").collect().head
    assert(d.getInt(0) == 1) // version
    assert(d.getString(1) == "grp") // partition_cols
    assert(d.getString(2).isEmpty && d.getString(3).isEmpty)
    assert(d.getString(4).isEmpty) // expectations
    assert(d.getString(5) == "id, grp") // merge_keys (recorded at upsert)
    assert(d.getInt(6) == 4) // num_partitions
    assert(d.getLong(7) == rows.count(_._3 >= 10)) // live rows
    assert(d.getLong(9) == 0L) // no DVs
    // per-partition drilldown: rows per dir from the manifest, and the
    // CONTENT token distinguishes the rewritten dir from carried ones
    val byDir = spark.sql(
      s"SELECT partition, content, rows FROM graft_partitions('$root')")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(byDir.keySet == Set("grp=g0", "grp=g1", "grp=g2", "grp=g3"))
    assert(byDir("grp=g0")._1 == "gen1") // the delete rewrote g0
    assert(byDir("grp=g1")._1 == "gen0") // carried content token
    assert(byDir.values.map(_._2).sum == rows.count(_._3 >= 10))
    // as-of drilldown sees v0's full counts
    assert(spark.sql(s"SELECT sum(rows) FROM graft_partitions('$root', 0)")
      .collect().head.getLong(0) == 400L)
  }

  test("graft_files exposes per-file stats/bloom/DV index metadata") {
    val (root, rows) = freshTable("files")
    // freshTable writes statsCols=v (no blooms); every indexed live file
    // appears with its dir and rendered v-range
    val f = spark.sql(
      s"""SELECT file, partition, stats['v'].min AS vmin,
         |  stats['v'].max AS vmax, stats['v'].nulls AS vnulls,
         |  bloom_cols, dv_deleted
         |FROM graft_files('$root')""".stripMargin).collect()
    assert(f.nonEmpty)
    assert(f.forall(r => r.getString(0).startsWith("gen0/") &&
      r.getString(0).contains(r.getString(1))))
    // rendered min/max parse back and jointly cover the value domain
    val lo = f.map(_.getString(2).toLong).min
    val hi = f.map(_.getString(3).toLong).max
    assert(lo == rows.map(_._3).min && hi == rows.map(_._3).max)
    assert(f.forall(_.getLong(4) == 0L)) // no null v values in fixture
    assert(f.forall(_.getSeq[String](5).isEmpty))
    assert(f.forall(_.getLong(6) == 0L))
    // a DV delete shows up on exactly the hit files
    VersionedTable.deleteWhereDV(spark, root, "v", 0, 4)
    val dv = spark.sql(
      s"SELECT sum(dv_deleted) FROM graft_files('$root')")
      .collect().head.getLong(0)
    assert(dv == rows.count(_._3 < 5))
    // SQL-only change feed: the recorded #keys make graft_changes need
    // no out-of-band key knowledge; the DV delete shows as op='delete'
    val ch = spark.sql(
      s"SELECT op, id FROM graft_changes('$root', 0, 1)").collect()
    assert(ch.nonEmpty && ch.forall(_.getString(0) == "delete"))
    assert(ch.map(_.getInt(1)).toSet ==
      rows.filter(_._3 < 5).map(_._1).toSet)
    // CDF flavor serves the same transition with pre-images
    assert(spark.sql(
      s"SELECT count(*) FROM graft_changes_cdf('$root', 0, 1)")
      .collect().head.getLong(0) == ch.length)
  }

  test("TBLPROPERTIES: set/unset/show, retention policy, VACUUM DRY RUN") {
    val (root, _) = freshTable("props")
    val v1 = spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES(" +
      "'graft.retain.versions' = '3', 'owner' = 'data-eng')")
      .collect().head.getInt(0)
    assert(v1 == 1)
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$root`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown == Map("graft.retain.versions" -> "3",
      "owner" -> "data-eng"))
    // properties survive data commits and appear in DESCRIBE HISTORY ops
    spark.sql(s"DELETE FROM graft.`$root` WHERE v < 5") // v2
    assert(VersionedTable.propertiesOf(spark, root)("owner") == "data-eng")
    val ops = spark.sql(s"DESCRIBE HISTORY graft.`$root`").collect()
      .map(_.getString(1)).toSeq
    assert(ops == Seq("merge", "set-properties", "delete"))
    // DRY RUN lists what RETAIN 1 would delete, touches nothing
    val would = spark.sql(
      s"VACUUM graft.`$root` RETAIN 1 VERSIONS DRY RUN").collect()
      .map(_.getString(0)).toSet
    assert(would.exists(_.startsWith("_manifest.0")) &&
      would.exists(_.startsWith("_commit.1")))
    assert(VersionedTable.history(spark, root) == Seq(0, 1, 2))
    // age-based DRY RUN: zero-hour window names everything non-current,
    // a wide window names nothing — still touching nothing
    val wouldAge = spark.sql(
      s"VACUUM graft.`$root` RETAIN 0 HOURS DRY RUN").collect()
      .map(_.getString(0)).toSet
    assert(wouldAge.exists(_.startsWith("_manifest.0")))
    assert(spark.sql(s"VACUUM graft.`$root` RETAIN 7 DAYS DRY RUN")
      .collect().isEmpty)
    assert(VersionedTable.history(spark, root) == Seq(0, 1, 2))
    // RESTORE TO TIMESTAMP: a far-future instant restores the version
    // current now — committed as a NEW version
    val vr = spark.sql(
      s"RESTORE graft.`$root` TO TIMESTAMP AS OF '2099-01-01'")
      .head.getInt(0)
    assert(vr == 3)
    // maintain() honors the declared retention (3) over its default
    VersionedTable.upsert(spark, root,
      Seq((900, "g0", 1, 9L)).toDF("id", "grp", "v", "w"),
      Seq("id", "grp"), Seq("grp")) // v3
    VersionedTable.maintain(spark, root, keepVersions = 1)
    assert(VersionedTable.history(spark, root).size == 3,
      s"policy ignored: ${VersionedTable.history(spark, root)}")
    spark.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES(" +
      "'graft.retain.versions')")
    assert(VersionedTable.propertiesOf(spark, root) ==
      Map("owner" -> "data-eng"))
    // bare SQL VACUUM honors the declared policy (not keep-1)
    spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES(" +
      "'graft.retain.versions' = '3')")
    spark.sql(s"VACUUM graft.`$root`")
    assert(VersionedTable.history(spark, root).size == 3,
      s"bare VACUUM ignored the declared policy")
    // quote-aware parsing: commas inside values are data
    spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES(" +
      "'comment' = 'ids: a, b')")
    assert(VersionedTable.propertiesOf(spark, root)("comment") ==
      "ids: a, b")
    // a bad reserved value is rejected AT SET time, loudly
    val bad = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$root` SET TBLPROPERTIES(" +
        "'graft.retain.versions' = '7 days')"))
    assert(bad.getMessage.contains("graft.retain.versions"))
  }

  test("SQL OPTIMIZE ZORDER BY an unindexed column starts skipping on it") {
    val (root, _) = freshTable("zidx")
    // w carries NO stats before OPTIMIZE; z-ordering by it must both
    // cluster and RECORD min/max, so readWhere prunes afterwards
    spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (w)")
    val (kept, total) = VersionedTable.skipStats(spark, root, "w", 0L, 90L)
    assert(total > 0 && kept < total,
      s"no skipping on the fresh z-dimension: $kept/$total")
  }

  test("SQL multi-table transaction: BEGIN / deferred INSERTs / COMMIT " +
      "publishes atomically; ROLLBACK discards; guards refuse the rest") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sql_txn").toString
    val (ra, rb) = (s"$dir/a", s"$dir/b")
    Seq(("dml_txna", ra), ("dml_txnb", rb)).foreach { case (n, r) =>
      spark.sql(s"CREATE TABLE $n (id INT, g STRING, v INT) " +
        s"USING graft LOCATION '$r' PARTITIONED BY (g) " +
        "TBLPROPERTIES('graft.keys'='id,g')")
      spark.sql(s"INSERT INTO $n VALUES (1,'a',100)") // v0 outside txn
    }
    spark.sql("BEGIN GRAFT TRANSACTION")
    // nested BEGIN refuses
    intercept[Exception](spark.sql("BEGIN GRAFT TRANSACTION"))
    assert(spark.sql("INSERT INTO dml_txna VALUES (10,'a',1)")
      .first.getInt(0) == -1, "deferred INSERT must return -1")
    // a second INSERT into the SAME table refuses (order-dependence)
    intercept[Exception](
      spark.sql("INSERT INTO dml_txna VALUES (11,'a',1)"))
    // non-deferrable DML refuses loudly instead of running outside
    intercept[Exception](
      spark.sql("UPDATE dml_txna SET v = 0 WHERE id = 1"))
    intercept[Exception](spark.sql("DELETE FROM dml_txnb WHERE id = 1"))
    intercept[Exception](
      spark.sql("INSERT OVERWRITE dml_txnb VALUES (9,'b',9)"))
    assert(spark.sql("INSERT INTO dml_txnb VALUES (20,'b',2)")
      .first.getInt(0) == -1)
    // nothing visible (or even staged-published) before COMMIT
    assert(spark.sql("SELECT count(*) FROM dml_txna").first.getLong(0)
      == 1L)
    val committed = spark.sql("COMMIT GRAFT TRANSACTION").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(committed == Map("dml_txna" -> 1, "dml_txnb" -> 1),
      s"COMMIT must report registered NAMES at v1: $committed")
    assert(spark.sql("SELECT v FROM dml_txna WHERE id = 10")
      .first.getInt(0) == 1)
    assert(spark.sql("SELECT v FROM dml_txnb WHERE id = 20")
      .first.getInt(0) == 2)
    // ROLLBACK discards; versions do not move
    spark.sql("BEGIN GRAFT TRANSACTION")
    spark.sql("INSERT INTO dml_txna VALUES (12,'a',9)")
    assert(spark.sql("ROLLBACK GRAFT TRANSACTION").first.getInt(0) == 1)
    assert(spark.sql("SELECT count(*) FROM dml_txna WHERE id = 12")
      .first.getLong(0) == 0L)
    assert(graft.ops.VersionedTable.currentVersion(spark, ra)
      .contains(1))
    // statements without an open transaction refuse
    intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
    intercept[Exception](spark.sql("ROLLBACK GRAFT TRANSACTION"))
    // an in-process COMMIT failure (CHECK violation in one member)
    // aborts CLEANLY: nothing stays staged/locked, both tables keep
    // accepting plain writes
    spark.sql(s"ALTER TABLE dml_txnb ADD CONSTRAINT v_pos CHECK (v > 0)")
    spark.sql("BEGIN GRAFT TRANSACTION")
    spark.sql("INSERT INTO dml_txna VALUES (13,'a',5)")
    spark.sql("INSERT INTO dml_txnb VALUES (21,'b',-5)")
    intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
    // the abort retracted member A's stage: a direct write proceeds
    spark.sql("INSERT INTO dml_txna VALUES (14,'a',7)")
    assert(spark.sql("SELECT count(*) FROM dml_txna WHERE id = 13")
      .first.getLong(0) == 0L, "aborted member must not have landed")
    assert(spark.sql("SELECT v FROM dml_txna WHERE id = 14")
      .first.getInt(0) == 7)
    spark.sql("DROP TABLE dml_txna")
    spark.sql("DROP TABLE dml_txnb")
  }

  test("SQL transaction COMMIT: a retryable conflict keeps the " +
      "transaction OPEN (deferred INSERTs survive a COMMIT retry); " +
      "empty COMMIT closes as a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sql_rtxn").toString
    val (ra, rb) = (s"$dir/a", s"$dir/b")
    Seq(("dml_rtxa", ra), ("dml_rtxb", rb)).foreach { case (n, r) =>
      spark.sql(s"CREATE TABLE $n (id INT, g STRING, v INT) " +
        s"USING graft LOCATION '$r' PARTITIONED BY (g) " +
        "TBLPROPERTIES('graft.keys'='id,g')")
      spark.sql(s"INSERT INTO $n VALUES (1,'a',100)")
    }
    spark.conf.set("spark.graft.txn.intentGraceMs", "60000")
    try {
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql("INSERT INTO dml_rtxa VALUES (10,'a',1)")
      spark.sql("INSERT INTO dml_rtxb VALUES (20,'b',2)")
      // block the group's marker path with a FRESH foreign intent: the
      // first COMMIT conflicts (retryable) — the round-10 commit
      // discarded the deferred INSERTs here, forcing a full replay
      val roots = Seq(ra, rb).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(roots.mkString("\u0000")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val intent = new org.apache.hadoop.fs.Path(
        graft.plans.GraftCatalog.catalogDir(spark), s"_txn/$md.intent")
      val fs = intent.getFileSystem(
        spark.sessionState.newHadoopConf())
      val out = fs.create(intent, false)
      out.write("#graft-txnintent\t2\tforeign\n".getBytes("UTF-8"))
      out.close()
      val e = intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
      assert(e.getMessage.contains("holds"), e.getMessage)
      // release the foreign claim; the RETRIED COMMIT publishes both
      // deferred writes — they survived the conflict
      fs.delete(intent, false)
      val committed = spark.sql("COMMIT GRAFT TRANSACTION").collect()
        .map(r => (r.getString(0), r.getInt(1))).toMap
      assert(committed == Map("dml_rtxa" -> 1, "dml_rtxb" -> 1),
        s"retried COMMIT must publish the surviving writes: $committed")
      assert(spark.sql("SELECT v FROM dml_rtxa WHERE id = 10")
        .first.getInt(0) == 1)
      assert(spark.sql("SELECT v FROM dml_rtxb WHERE id = 20")
        .first.getInt(0) == 2)
      // empty COMMIT: zero rows, transaction closed (a new BEGIN works)
      spark.sql("BEGIN GRAFT TRANSACTION")
      assert(spark.sql("COMMIT GRAFT TRANSACTION").collect().isEmpty)
      spark.sql("BEGIN GRAFT TRANSACTION")
      assert(spark.sql("ROLLBACK GRAFT TRANSACTION").first.getInt(0) == 0)
    } finally {
      spark.conf.unset("spark.graft.txn.intentGraceMs")
      spark.sql("DROP TABLE IF EXISTS dml_rtxa")
      spark.sql("DROP TABLE IF EXISTS dml_rtxb")
    }
  }

  test("SQL transaction: a crashed COMMIT is surfaced by graft_txn_log " +
      "and completed by the NEXT BEGIN — no same-table-set COMMIT " +
      "needed; pre-decision crashes roll back past the grace") {
    import graft.ops.MultiSync
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sql_otxn").toString
    val (ra, rb) = (s"$dir/a", s"$dir/b")
    Seq(("dml_otxa", ra), ("dml_otxb", rb)).foreach { case (n, r) =>
      spark.sql(s"CREATE TABLE $n (id INT, g STRING, v INT) " +
        s"USING graft LOCATION '$r' PARTITIONED BY (g) " +
        "TBLPROPERTIES('graft.keys'='id,g')")
      spark.sql(s"INSERT INTO $n VALUES (1,'a',100)") // v0
    }
    try {
      // crash AT the decision point: the commit is durable, both
      // publishes pending
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql("INSERT INTO dml_otxa VALUES (10,'a',1)")
      spark.sql("INSERT INTO dml_otxb VALUES (20,'b',2)")
      MultiSync.crashHook = p =>
        // the decision point carries its marker path (injections must
        // scope to their own transaction); this test owns the session,
        // so matching the point NAME is enough
        if (p.startsWith("decision:"))
          throw new MultiSync.SimulatedCrash(s"boom@$p")
      try intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
      finally MultiSync.crashHook = _ => ()
      val log = spark.sql("SELECT state, table_root, version, published " +
        "FROM graft_txn_log() ORDER BY table_root").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getBoolean(3))).toSeq
      assert(log == Seq(("decision", ra, 1, false),
        ("decision", rb, 1, false)), s"pending group not surfaced: $log")
      assert(spark.sql("SELECT count(*) FROM dml_otxa").first.getLong(0)
        == 1L, "nothing visible before recovery")
      // BEGIN completes the crashed group — decision rolls FORWARD
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql("ROLLBACK GRAFT TRANSACTION")
      assert(spark.sql("SELECT count(*) FROM graft_txn_log()")
        .first.getLong(0) == 0L, "recovered group must leave the log")
      assert(spark.sql("SELECT v FROM dml_otxa WHERE id = 10")
        .first.getInt(0) == 1)
      assert(spark.sql("SELECT v FROM dml_otxb WHERE id = 20")
        .first.getInt(0) == 2)
      // crash BEFORE the decision (member a staged+recorded, b never):
      // the group surfaces as 'intent' with the recorded version
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql("INSERT INTO dml_otxa VALUES (11,'a',3)")
      spark.sql("INSERT INTO dml_otxb VALUES (21,'b',4)")
      MultiSync.crashHook = p =>
        if (p == s"staged:$ra")
          throw new MultiSync.SimulatedCrash(s"boom@$p")
      try intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
      finally MultiSync.crashHook = _ => ()
      val log2 = spark.sql("SELECT state, table_root, version " +
        "FROM graft_txn_log() ORDER BY table_root").collect()
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
      assert(log2 == Seq(("intent", ra, 2), ("intent", rb, -1)),
        s"crashed staging not surfaced: $log2")
      // inside the grace the group is presumed LIVE: BEGIN leaves it
      spark.conf.set("spark.graft.txn.intentGraceMs", "60000")
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql("ROLLBACK GRAFT TRANSACTION")
      assert(spark.sql("SELECT count(*) FROM graft_txn_log()")
        .first.getLong(0) == 2L, "in-grace group must be left alone")
      // past the grace BEGIN rolls it back and releases the claims
      spark.conf.set("spark.graft.txn.intentGraceMs", "0")
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql("ROLLBACK GRAFT TRANSACTION")
      assert(spark.sql("SELECT count(*) FROM graft_txn_log()")
        .first.getLong(0) == 0L)
      assert(spark.sql("SELECT count(*) FROM dml_otxa WHERE id = 11")
        .first.getLong(0) == 0L, "rolled-back stage must not land")
      // the released claim admits a plain write again
      spark.sql("INSERT INTO dml_otxa VALUES (12,'a',5)")
      assert(spark.sql("SELECT v FROM dml_otxa WHERE id = 12")
        .first.getInt(0) == 5)
    } finally {
      spark.conf.unset("spark.graft.txn.intentGraceMs")
      spark.sql("DROP TABLE IF EXISTS dml_otxa")
      spark.sql("DROP TABLE IF EXISTS dml_otxb")
    }
  }

  test("SQL transaction: canonical MERGE defers into the atomic group " +
      "— two-table MERGE pair commits all-or-nothing (abort retracts " +
      "both); the clause-matrix MERGE still refuses") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sql_mtxn").toString
    val (ra, rb) = (s"$dir/a", s"$dir/b")
    Seq(("dml_mtxa", ra), ("dml_mtxb", rb)).foreach { case (n, r) =>
      spark.sql(s"CREATE TABLE $n (id INT, g STRING, v INT) " +
        s"USING graft LOCATION '$r' PARTITIONED BY (g) " +
        "TBLPROPERTIES('graft.keys'='id,g')")
      spark.sql(s"INSERT INTO $n VALUES (1,'a',100)") // v0
    }
    try {
      spark.sql("BEGIN GRAFT TRANSACTION")
      // canonical MERGE defers: update id=1 in a, insert id=2 in b
      assert(spark.sql(
        """MERGE INTO dml_mtxa t
          |USING (SELECT 1 AS id, 'a' AS g, 111 AS v) s
          |ON t.id = s.id AND t.g = s.g
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        .first.getInt(0) == -1, "canonical MERGE must defer")
      assert(spark.sql(
        """MERGE INTO dml_mtxb t
          |USING (SELECT 2 AS id, 'b' AS g, 222 AS v) s
          |ON t.id = s.id AND t.g = s.g
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        .first.getInt(0) == -1)
      // the clause matrix is NOT a stageable keyed upsert: refuse
      val bad = intercept[Exception](spark.sql(
        """MERGE INTO dml_mtxa t
          |USING (SELECT 1 AS id, 'a' AS g, 0 AS v) s
          |ON t.id = s.id AND t.g = s.g
          |WHEN MATCHED THEN DELETE""".stripMargin))
      assert(bad.getMessage.contains("graft transaction"), bad.getMessage)
      // nothing visible before COMMIT
      assert(spark.sql("SELECT v FROM dml_mtxa WHERE id = 1")
        .first.getInt(0) == 100)
      val committed = spark.sql("COMMIT GRAFT TRANSACTION").collect()
        .map(r => (r.getString(0), r.getInt(1))).toMap
      assert(committed == Map("dml_mtxa" -> 1, "dml_mtxb" -> 1),
        s"MERGE pair must publish together at v1: $committed")
      assert(spark.sql("SELECT v FROM dml_mtxa WHERE id = 1")
        .first.getInt(0) == 111, "matched UPDATE SET * must apply")
      assert(spark.sql("SELECT v FROM dml_mtxb WHERE id = 2")
        .first.getInt(0) == 222, "not-matched INSERT * must apply")
      // in-process abort (CHECK violation in member b) retracts BOTH
      // members — the pair can never land half-applied
      spark.sql("ALTER TABLE dml_mtxb ADD CONSTRAINT v_pos CHECK (v > 0)")
      spark.sql("BEGIN GRAFT TRANSACTION")
      spark.sql(
        """MERGE INTO dml_mtxa t
          |USING (SELECT 1 AS id, 'a' AS g, 333 AS v) s
          |ON t.id = s.id AND t.g = s.g
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql(
        """MERGE INTO dml_mtxb t
          |USING (SELECT 2 AS id, 'b' AS g, -9 AS v) s
          |ON t.id = s.id AND t.g = s.g
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      intercept[Exception](spark.sql("COMMIT GRAFT TRANSACTION"))
      assert(spark.sql("SELECT v FROM dml_mtxa WHERE id = 1")
        .first.getInt(0) == 111, "aborted member must not land")
      // nothing stays staged/locked: a plain MERGE proceeds
      assert(spark.sql(
        """MERGE INTO dml_mtxa t
          |USING (SELECT 3 AS id, 'a' AS g, 444 AS v) s
          |ON t.id = s.id AND t.g = s.g
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        .first.getInt(0) == 2, "plain MERGE outside txn returns version")
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_mtxa")
      spark.sql("DROP TABLE IF EXISTS dml_mtxb")
    }
  }

  test("expectation event log: per-commit violation counts persist in " +
      "the manifest and read back via graft_expect_log + DESCRIBE " +
      "HISTORY across commits") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sql_elog").toString
    val root = s"$dir/t"
    spark.sql(s"CREATE TABLE dml_elog (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$root' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO dml_elog VALUES (1,'a',10)") // v0: no gate yet
    spark.sql("CREATE EXPECTATION v_nonneg ON dml_elog " +
      "CHECK (v >= 0) ON VIOLATION DROP")               // v1: metadata
    spark.sql("INSERT INTO dml_elog VALUES (2,'a',-5), (3,'b',7)") // v2: 1
    spark.sql("INSERT INTO dml_elog VALUES (4,'b',1)")  // v3: ran clean, 0
    // the MERGE leg logs too: a violating matched rewrite reverts AND
    // counts (the uniform per-statement semantic)
    spark.sql("MERGE INTO dml_elog t USING " +
      "(SELECT 3 AS id, 'b' AS g, -9 AS v) s " +
      "ON t.id = s.id AND t.g = s.g " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")           // v4: 1, reverted
    val log = spark.sql("SELECT version, expectation, mode, violations " +
      s"FROM graft_expect_log('dml_elog') ORDER BY version").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(log == Seq(
      (2, "v_nonneg", "drop", 1L),
      (3, "v_nonneg", "drop", 0L),
      (4, "v_nonneg", "drop", 1L)), s"event log wrong: $log")
    // DESCRIBE HISTORY carries the compact per-commit string; ungated
    // commits show null
    val hist = spark.sql("DESCRIBE HISTORY dml_elog").collect()
      .map(r => r.getInt(0) -> r.getString(4)).toMap
    assert(hist(0) == null && hist(1) == null)
    assert(hist(2) == "v_nonneg=1" && hist(3) == "v_nonneg=0" &&
      hist(4) == "v_nonneg=1", s"history wrong: $hist")
    // and the data outcomes the counts describe
    assert(spark.sql("SELECT v FROM dml_elog WHERE id = 3")
      .first.getInt(0) == 7, "violating rewrite must have reverted")
    assert(spark.sql("SELECT count(*) FROM dml_elog WHERE id = 2")
      .first.getLong(0) == 0L, "violating insert must have dropped")
    spark.sql("DROP TABLE dml_elog")
  }
}
