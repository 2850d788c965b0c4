package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native functions callable from plain SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("a b c d", 1), ("x1 y2", 2)).toDF("t", "id")
      .createOrReplaceTempView("ext_docs")
    val counts = spark.sql(
      "SELECT regexp_count_fast(t, '[a-z]+') AS c FROM ext_docs ORDER BY id")
      .as[Int].collect()
    assert(counts.toSeq == Seq(4, 2))
    val grams = spark.sql(
      "SELECT size(ngram_hashes(split(t, ' '), 2)) AS g FROM ext_docs ORDER BY id")
      .as[Int].collect()
    assert(grams.toSeq == Seq(3, 1))
  }

  test("sketch aggregates callable from GROUP BY SQL") {
    GraftExtensions.register(spark)
    ((1 to 50).map(i => ("a", s"tok${i % 7}"))
      ++ (1 to 20).map(i => ("b", s"tok${i % 3}")))
      .toDF("g", "item").createOrReplaceTempView("ext_sketch")
    // Misra-Gries candidates per group via SQL — the hot item must survive
    val mg = spark.sql(
      """SELECT g, freq_items_mg(item, 2) AS cands FROM ext_sketch
        |GROUP BY g ORDER BY g""".stripMargin)
      .as[(String, Seq[String])].collect().toMap
    assert(mg("a").nonEmpty && mg("b").contains("tok1"))
    // minhash + simhash consume 64-bit hashes; equality of identical
    // groups' sketches pins determinism through the SQL surface
    val sk = spark.sql(
      """SELECT g, minhash_sketch(xxhash64(item), 16, 42) AS mh,
        |  simhash64(xxhash64(item)) AS sh
        |FROM ext_sketch GROUP BY g""".stripMargin).collect()
    assert(sk.length == 2 && sk.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("optimizer rule rewrites size(regexp_extract_all) to native count") {
    GraftExtensions.register(spark)
    // parquet-backed (a literal local relation would be constant-folded
    // away before user-provided optimizer rules run)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5).createOrReplaceTempView("ext_rw")
    val df = spark.sql(
      "SELECT size(regexp_extract_all(text, '(the)')) AS c FROM ext_rw")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("regexp_count_fast"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("regexp_extract_all"))
    // result equivalence vs the unrewritten form (expr evaluated manually)
    val manual = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5).selectExpr("size(split(text, 'the')) - 1 AS c")
      .as[Int].collect().sorted
    assert(df.as[Int].collect().sorted.toSeq == manual.toSeq)
    // spark's own regexp_count desugars to the same shape -> also rewritten
    val viaBuiltin = spark.sql("SELECT regexp_count(text, 'the') AS c FROM ext_rw")
    assert(viaBuiltin.queryExecution.optimizedPlan.toString
      .contains("regexp_count_fast"))
  }

  test("rewrite preserves invalid-group-index errors (no silent rewrite)") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5).createOrReplaceTempView("ext_rw_idx")
    // '(the)' has 1 group; idx=7 must NOT be rewritten — vanilla Spark
    // raises an invalid-group-index error and so must the extended session
    val bad = spark.sql(
      "SELECT size(regexp_extract_all(text, '(the)', 7)) AS c FROM ext_rw_idx")
    assert(!bad.queryExecution.optimizedPlan.toString
      .contains("regexp_count_fast"))
    intercept[Exception] { bad.collect() }
    // valid explicit idx=1 still rewrites
    val ok = spark.sql(
      "SELECT size(regexp_extract_all(text, '(the)', 1)) AS c FROM ext_rw_idx")
    assert(ok.queryExecution.optimizedPlan.toString
      .contains("regexp_count_fast"))
  }

  test("regexp_count_fast counts correctly on multibyte (non-ASCII) text") {
    // the ASCII zero-copy view must not be used for multibyte strings —
    // byte index != char index there; fall back path must stay correct
    import graft.functions.GraftFunctions
    val df = Seq("héllo héllo hé", "héllo", "abc abc", "")
      .toDF("t")
    val out = df.select(GraftFunctions.regexpCount($"t", "hé").as("c"))
      .as[Int].collect().toSeq
    assert(out == Seq(3, 1, 0, 0))
    val ascii = df.select(GraftFunctions.regexpCount($"t", "abc").as("c"))
      .as[Int].collect().toSeq
    assert(ascii == Seq(0, 0, 2, 0))
  }

  test("ngram_hashes rejects a non-literal n") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT ngram_hashes(split('a b', ' '), id) FROM range(1) AS t(id)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
  test("PruneVersionedScan: plain filter syntax gets manifest file skipping") {
    GraftExtensions.register(spark)
    import graft.ops.VersionedTable
    import graft.plans.VersionedScan
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_vtrule").toString
    val root = s"$dir/table"
    val rows = (0 until 400).map { i =>
      (i, s"g${i % 2}", i / 2, f"doc-${(i * 2654435761L) % 100000}%05d")
    }
    VersionedTable.upsert(spark, root,
      rows.toDF("id", "grp", "v", "doc"), Seq("id", "grp"), Seq("grp"),
      statsCols = Seq("v"), fileRows = Some(25), bloomCols = Seq("doc"))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      VersionedTable.physicalInputFiles(df)
    val all = VersionedScan.table(spark, root)
    val total = scannedFiles(all)
    assert(all.count() == 400 && total >= 16)
    // range filter on the clustered column: pruned physical scan, exact rows
    val ranged = VersionedScan.table(spark, root)
      .filter(col("v") >= 40 && col("v") <= 59)
    assert(scannedFiles(ranged) < total / 2,
      s"range skipping did not bite: ${scannedFiles(ranged)} of $total")
    assert(ranged.select(col("id")).as[Int].collect().toSet ==
      rows.filter(r => r._3 >= 40 && r._3 <= 59).map(_._1).toSet)
    // bloom equality on the unclustered column, through plain SQL
    val needle = rows(137)._4
    VersionedScan.table(spark, root).createOrReplaceTempView("vt_rule")
    val eq = spark.sql(s"SELECT id FROM vt_rule WHERE doc = '$needle'")
    assert(scannedFiles(eq) <= total / 2,
      s"bloom skipping did not bite: ${scannedFiles(eq)} of $total")
    assert(eq.as[Int].collect().toSet ==
      rows.filter(_._4 == needle).map(_._1).toSet)
    // conjunction across BOTH indexed columns intersects the selections
    val both = VersionedScan.table(spark, root)
      .filter(col("v") <= 59 && col("doc") === needle)
    assert(scannedFiles(both) <= scannedFiles(eq))
    assert(both.count() == rows.count(r => r._3 <= 59 && r._4 == needle))
    // unsupported predicate shapes (disjunction) stay correct: full scan
    val or = VersionedScan.table(spark, root)
      .filter(col("v") === 0 || col("doc") === needle)
    assert(or.count() == rows.count(r => r._3 == 0 || r._4 == needle))
    // projection + aggregate over the relation behave like a normal scan
    assert(VersionedScan.table(spark, root)
      .filter(col("v") < 10).agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) ==
      rows.filter(_._3 < 10).map(_._1.toLong).sum)
  }

  test("PruneVersionedScan: IN lists, prefixes, partition + null facts prune") {
    GraftExtensions.register(spark)
    import graft.ops.VersionedTable
    import graft.plans.VersionedScan
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_vtrule2").toString
    val root = s"$dir/table"
    val rows = (0 until 400).map { i =>
      (i, s"g${i % 4}", i / 2, f"doc-${(i * 2654435761L) % 100000}%05d")
    }
    VersionedTable.upsert(spark, root,
      rows.toDF("id", "grp", "v", "doc"), Seq("id", "grp"), Seq("grp"),
      statsCols = Seq("v"), fileRows = Some(25), bloomCols = Seq("doc"))
    def files(df: org.apache.spark.sql.DataFrame): Int =
      VersionedTable.physicalInputFiles(df)
    val total = files(VersionedScan.table(spark, root))
    VersionedScan.table(spark, root).createOrReplaceTempView("vt_rule2")
    // IN over the bloom-indexed column: per-value probe union (short list
    // stays Catalyst `In`)
    val needles = Seq(rows(11)._4, rows(222)._4)
    val in = spark.sql(s"SELECT id FROM vt_rule2 WHERE doc IN " +
      s"('${needles(0)}','${needles(1)}')")
    assert(files(in) < total, s"IN bloom skipping did not bite: ${files(in)}")
    assert(in.as[Int].collect().toSet ==
      rows.filter(r => needles.contains(r._4)).map(_._1).toSet)
    // a 12-value IN converts to Catalyst InSet past the threshold — both
    // forms must extract; values cluster in two v-bands so stats skip
    val vSet = Set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 190)
    val inV = spark.sql(
      s"SELECT id FROM vt_rule2 WHERE v IN (${vSet.mkString(",")})")
    // the 12 values span exactly two v-bands per partition: 2 of 4 files
    // survive in each of the 4 partitions
    assert(files(inV) <= total / 2,
      s"InSet stats skipping did not bite: ${files(inV)} of $total")
    assert(inV.as[Int].collect().toSet ==
      rows.filter(r => vSet(r._3)).map(_._1).toSet)
    // partition-column predicate: whole directories pruned before any
    // file stats (1 of 4 partitions survives)
    val part = VersionedScan.table(spark, root).filter(col("grp") === "g1")
    assert(files(part) <= total / 3,
      s"partition pruning did not bite: ${files(part)} of $total")
    assert(part.count() == 100)
    val partRange = spark.sql("SELECT id FROM vt_rule2 WHERE grp >= 'g2'")
    assert(files(partRange) <= total / 2 + 1)
    assert(partRange.as[Int].collect().toSet ==
      rows.filter(_._2 >= "g2").map(_._1).toSet)
    // string-prefix pruning (LIKE 'k00%') over a string-clustered table
    val root2 = s"$dir/table2"
    VersionedTable.upsert(spark, root2,
      (0 until 200).map(i => (i, "g0", f"k$i%03d")).toDF("id", "grp", "s"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("s"), fileRows = Some(25))
    val total2 = files(VersionedScan.table(spark, root2))
    val pf = VersionedScan.table(spark, root2).filter(col("s").startsWith("k00"))
    assert(files(pf) < total2,
      s"prefix skipping did not bite: ${files(pf)} of $total2")
    assert(pf.select(col("id")).as[Int].collect().toSet == (0 until 10).toSet)
    // null facts: IS NOT NULL skips all-null files, IS NULL skips
    // files recording zero nulls
    val root3 = s"$dir/table3"
    val nrows: Seq[(Int, String, Option[Int])] =
      (0 until 100).map(i =>
        (i, if (i < 50) "gn" else "gv", if (i < 50) None else Some(i)))
    VersionedTable.upsert(spark, root3, nrows.toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(10))
    val total3 = files(VersionedScan.table(spark, root3))
    val nn = VersionedScan.table(spark, root3).filter(col("v").isNotNull)
    assert(files(nn) <= total3 / 2, s"IsNotNull did not skip: ${files(nn)}")
    assert(nn.count() == 50)
    val isn = VersionedScan.table(spark, root3).filter(col("v").isNull)
    assert(files(isn) <= total3 / 2, s"IsNull did not skip: ${files(isn)}")
    assert(isn.count() == 50)
  }

  test("graft_table SQL function: time travel, pruning, and folding from pure SQL") {
    GraftExtensions.register(spark)
    import graft.ops.VersionedTable
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    val root = s"$dir/table"
    VersionedTable.upsert(spark, root,
      (0 until 200).map(i => (i, s"g${i % 2}", i.toLong))
        .toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    VersionedTable.upsert(spark, root,
      Seq((500, "g0", 999L)).toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    // plain SQL over the table function — no temp view, no DataFrame code
    assert(spark.sql(s"SELECT count(*) FROM graft_table('$root')")
      .collect()(0).getLong(0) == 201)
    // the count came from the manifest, not a scan
    assert(spark.sql(s"SELECT count(*) FROM graft_table('$root')")
      .queryExecution.optimizedPlan.isInstanceOf[LocalRelation])
    // time travel through the second argument
    assert(spark.sql(s"SELECT count(*) FROM graft_table('$root', 0)")
      .collect()(0).getLong(0) == 200)
    // WHERE gets manifest file skipping exactly like the DataFrame path
    val pruned = spark.sql(
      s"SELECT id FROM graft_table('$root') WHERE v >= 40 AND v <= 59")
    val total = VersionedTable.physicalInputFiles(
      spark.sql(s"SELECT * FROM graft_table('$root')"))
    assert(VersionedTable.physicalInputFiles(pruned) < total,
      "SQL WHERE over graft_table did not prune files")
    assert(pruned.count() == 20)
    // non-literal root fails loudly, never guesses
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_table(CAST(rand() AS STRING))").collect()
    }
  }

  test("PruneVersionedScan: GROUP BY partition column folds to dir counts") {
    GraftExtensions.register(spark)
    import graft.ops.VersionedTable
    import graft.plans.VersionedScan
    import org.apache.spark.sql.functions.{col, count, lit}
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("graft_gbfold").toString
    val root = s"$dir/table"
    // composite layout (grp, sub): grouping by grp must SUM across sub
    // dirs; one null grp row lands in the default partition
    val rows = (0 until 120).map(i =>
      (i, if (i == 0) null else s"g${i % 3}", s"s${i % 2}", i.toLong))
      .toDF("id", "grp", "sub", "v")
    VersionedTable.upsert(spark, root, rows, Seq("id", "grp", "sub"),
      Seq("grp", "sub"), fileRows = Some(10))
    def folds(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]
    val byGrp = VersionedScan.table(spark, root)
      .groupBy("grp").agg(count(lit(1)).as("n"))
    assert(folds(byGrp), s"not folded:\n${byGrp.queryExecution}")
    val got = byGrp.collect().map(r =>
      Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(got == Map("g1" -> 40, "g2" -> 40, "g0" -> 39, "NULL" -> 1))
    // two-level grouping folds too
    val byBoth = VersionedScan.table(spark, root)
      .groupBy("grp", "sub").agg(count(lit(1)).as("n"))
    assert(folds(byBoth))
    assert(byBoth.collect().map(_.getLong(2)).sum == 120)
    // SQL path
    VersionedScan.table(spark, root).createOrReplaceTempView("vt_gb")
    val sqlGb = spark.sql(
      "SELECT grp, count(*) AS n FROM vt_gb GROUP BY grp")
    assert(folds(sqlGb))
    assert(sqlGb.collect().map(_.getLong(1)).sum == 120)
    // negatives keep the scan: non-partition grouping, filters, count(col)
    val byData = VersionedScan.table(spark, root)
      .groupBy("v").agg(count(lit(1)))
    assert(!folds(byData))
    val filtered = VersionedScan.table(spark, root)
      .filter(col("v") < 60).groupBy("grp").agg(count(lit(1)).as("n"))
    assert(!folds(filtered))
    assert(filtered.collect().map(_.getLong(1)).sum == 60)
  }

  test("PruneVersionedScan: COUNT(*) folds to manifest metadata, no scan") {
    GraftExtensions.register(spark)
    import graft.ops.VersionedTable
    import graft.plans.VersionedScan
    import org.apache.spark.sql.functions.{col, count}
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("graft_vtcount").toString
    val root = s"$dir/table"
    // v is NULLABLE with real nulls (multiples of 10) and stats-indexed:
    // count(v) folds as total - recorded nulls. w is nullable WITHOUT
    // stats: count(w) must keep the scan. (For non-nullable columns
    // Catalyst itself soundly rewrites count(c) to count(1).)
    VersionedTable.upsert(spark, root,
      (0 until 300).map(i =>
          (i, s"g${i % 3}", if (i % 10 == 0) None else Some(i.toLong),
            if (i % 3 == 0) None else Some(i.toLong)))
        .toDF("id", "grp", "v", "w"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    def foldsToLocal(df: org.apache.spark.sql.DataFrame): Boolean =
      // the WHOLE optimized plan collapses to the metadata row — no scan,
      // no aggregate, nothing else survives
      df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]
    // DataFrame count(), SQL count(*), and multi-count all fold
    val dfCount = VersionedScan.table(spark, root).groupBy().count()
    assert(foldsToLocal(dfCount), s"not folded:\n${dfCount.queryExecution}")
    assert(dfCount.collect()(0).getLong(0) == 300)
    assert(VersionedScan.table(spark, root).count() == 300)
    VersionedScan.table(spark, root).createOrReplaceTempView("vt_cnt")
    val sqlCount = spark.sql("SELECT count(*) AS n, count(1) AS m FROM vt_cnt")
    assert(foldsToLocal(sqlCount))
    assert(sqlCount.collect()(0) ==
      org.apache.spark.sql.Row(300L, 300L))
    // a Filter keeps the scan path (row counts change): correct, not folded
    val filtered = VersionedScan.table(spark, root)
      .filter(col("v") < 100).groupBy().count()
    assert(!foldsToLocal(filtered))
    assert(filtered.collect()(0).getLong(0) == 90) // nulls drop too
    // count(nullable stats-indexed col) folds: total - recorded nulls
    val colCount = VersionedScan.table(spark, root).agg(count(col("v")))
    assert(foldsToLocal(colCount))
    assert(colCount.collect()(0).getLong(0) == 270)
    // count(nullable col WITHOUT stats) keeps the scan, still right
    val noCov = VersionedScan.table(spark, root).agg(count(col("w")))
    assert(!foldsToLocal(noCov))
    assert(noCov.collect()(0).getLong(0) == 200)
    // min/max over the stats-indexed column fold too (nulls ignored,
    // exactly the aggregate's semantics), including mixed with count
    import org.apache.spark.sql.functions.{max, min}
    val mm = VersionedScan.table(spark, root)
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
    assert(foldsToLocal(mm), s"min/max not folded:\n${mm.queryExecution}")
    assert(mm.collect()(0) == org.apache.spark.sql.Row(300L, 1L, 299L))
    VersionedScan.table(spark, root).createOrReplaceTempView("vt_cnt")
    val sqlMm = spark.sql("SELECT min(v) AS lo, max(v) AS hi FROM vt_cnt")
    assert(foldsToLocal(sqlMm))
    assert(sqlMm.collect()(0) == org.apache.spark.sql.Row(1L, 299L))
    // a column with NO stats coverage keeps the scan path, still correct
    val noStats = VersionedScan.table(spark, root).agg(min(col("id")))
    assert(!foldsToLocal(noStats))
    assert(noStats.collect()(0).getInt(0) == 0)
    // a Project COMPUTING a column under a relation column's NAME must
    // not fold from the underlying column's stats (exprId identity, not
    // name matching) — this was a silent-wrong-result bug
    val doubled = VersionedScan.table(spark, root)
      .select((col("v") * 2).as("v")).agg(max(col("v")).as("m"))
    assert(!foldsToLocal(doubled), "computed column folded from raw stats")
    assert(doubled.collect()(0).getLong(0) == 598L)
    // ...same for a rename of ANOTHER real column onto the name
    val renamed = VersionedScan.table(spark, root)
      .select(col("id").as("v")).agg(max(col("v")).as("m"))
    assert(!foldsToLocal(renamed))
    assert(renamed.collect()(0).getInt(0) == 299)
    // pure pass-through projection still folds (same exprIds)
    val pruned = VersionedScan.table(spark, root)
      .select(col("v")).agg(max(col("v")).as("m"))
    assert(foldsToLocal(pruned), "pass-through projection should fold")
    assert(pruned.collect()(0).getLong(0) == 299L)
    // delete + upsert keep the metadata answers exact through carry/rewrite
    VersionedTable.deleteWhere(spark, root, "v", 10L, 19L) // 9 rows (10=null)
    VersionedTable.upsert(spark, root,
      Seq((1000, "g0", 0L)).toDF("id", "grp", "v"), Seq("id", "grp"),
      Seq("grp"), statsCols = Seq("v"), fileRows = Some(25))
    val after = VersionedScan.table(spark, root)
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
    assert(foldsToLocal(after))
    assert(after.collect()(0) ==
      org.apache.spark.sql.Row(300L - 9 + 1, 0L, 299L))
  }

  test("PruneVersionedScan: partition-filtered COUNT folds exactly") {
    GraftExtensions.register(spark)
    import graft.ops.VersionedTable
    import graft.plans.VersionedScan
    import org.apache.spark.sql.functions.{col, count, lit, upper}
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("graft_vtfcnt").toString
    val root = s"$dir/table"
    val rows = (0 until 300).map(i => (i, s"g${i % 3}", i.toLong))
    VersionedTable.upsert(spark, root, rows.toDF("id", "grp", "v"),
      Seq("id", "grp"), Seq("grp"), statsCols = Seq("v"),
      fileRows = Some(25))
    def foldsToLocal(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]
    def t() = VersionedScan.table(spark, root)
    // equality on the partition column: zero-I/O exact count
    val eq = t().filter(col("grp") === "g1").groupBy().count()
    assert(foldsToLocal(eq), s"not folded:\n${eq.queryExecution}")
    assert(eq.collect()(0).getLong(0) == 100)
    // arbitrary deterministic shapes work — the ORIGINAL expression is
    // evaluated per dir, not re-derived facts
    val fancy = t().filter(upper(col("grp")).isin("G0", "G2")).count()
    assert(fancy == 200)
    assert(foldsToLocal(
      t().filter(upper(col("grp")).isin("G0", "G2")).groupBy().count()))
    // zero-surviving-dirs: ungrouped count folds to 0
    val none = t().filter(col("grp") === "nope").groupBy().count()
    assert(foldsToLocal(none))
    assert(none.collect()(0).getLong(0) == 0)
    // grouped + filtered folds and matches the scan's answer
    val grouped = t().filter(col("grp") =!= "g0")
      .groupBy("grp").agg(count(lit(1)).as("n"))
    assert(foldsToLocal(grouped), s"not folded:\n${grouped.queryExecution}")
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("g1" -> 100L, "g2" -> 100L))
    // a data-column conjunct keeps the scan path, still correct
    val mixed = t().filter(col("grp") === "g1" && col("v") > 150)
      .groupBy().count()
    assert(!foldsToLocal(mixed))
    assert(mixed.collect()(0).getLong(0) ==
      rows.count(r => r._2 == "g1" && r._3 > 150))
    // SQL WHERE over graft_table folds the same way
    val sql = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$root') WHERE grp = 'g2'")
    assert(foldsToLocal(sql), s"not folded:\n${sql.queryExecution}")
    assert(sql.collect()(0).getLong(0) == 100)
    // filtered MIN/MAX/count(col) fold from the SURVIVING dirs' stats
    import org.apache.spark.sql.functions.{max, min}
    val fmm = t().filter(col("grp") === "g1")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(col("v")).as("nv"))
    assert(foldsToLocal(fmm), s"not folded:\n${fmm.queryExecution}")
    val g1v = rows.filter(_._2 == "g1").map(_._3)
    assert(fmm.collect()(0) ==
      org.apache.spark.sql.Row(g1v.min, g1v.max, g1v.size.toLong))
    // grouped filtered min/max too
    val gmm = t().filter(col("grp") =!= "g0").groupBy("grp")
      .agg(max(col("v")).as("hi"))
    assert(foldsToLocal(gmm))
    assert(gmm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      rows.filter(_._2 != "g0").groupBy(_._2)
        .map { case (g, xs) => g -> xs.map(_._3).max })
    // zero surviving dirs: min/max fold to NULL, the aggregate's answer
    val z = t().filter(col("grp") === "nope")
      .agg(min(col("v")).as("lo"), count(lit(1)).as("n"))
    assert(foldsToLocal(z))
    assert(z.collect()(0) == org.apache.spark.sql.Row(null, 0L))
    // merge-on-read deletes subtract exactly, per dir
    VersionedTable.deleteWhereDV(spark, root, "v", 0L, 9L) // 10 rows
    val afterDv = t().filter(col("grp") === "g0").groupBy().count()
    assert(foldsToLocal(afterDv))
    assert(afterDv.collect()(0).getLong(0) ==
      rows.count(r => r._2 == "g0" && r._3 >= 10))
    // ...but a DV'd surviving dir blocks the min/max fold (the deleted
    // row may be the extremum): scan path, still right
    val dvMm = t().filter(col("grp") === "g0").agg(min(col("v")).as("lo"))
    assert(!foldsToLocal(dvMm))
    assert(dvMm.collect()(0).getLong(0) ==
      rows.filter(r => r._2 == "g0" && r._3 >= 10).map(_._3).min)
  }
}
