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
}
