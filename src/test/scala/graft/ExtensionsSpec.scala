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

  test("ngram_hashes rejects a non-literal n") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT ngram_hashes(split('a b', ' '), id) FROM range(1) AS t(id)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
