package graft

import scala.util.Random

import graft.ops._

/** Property-based invariants (SURVEY §5.3) over seeded random inputs.
  * (Hand-rolled generation: scalatest+scalacheck bridge isn't in the
  * offline dependency cache; a fixed seed keeps failures reproducible.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("MA over a constant series is the constant; stddev is 0 or null") {
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(30)
      val c = 1.0 + rnd.nextDouble() * 500
      val df = (1 to n).map(i => ("K", c, i.toLong)).toDF("k", "v", "ord")
      val out = WindowAnalytics.rollingVolatility(
        WindowAnalytics.movingAverages(df, "k", Seq("ord"), "v", Seq(5)),
        "k", Seq("ord"), "v", Seq(5))
        .select("ma_5", "volatility_5").collect()
      out.foreach { r =>
        assert(math.abs(r.getDouble(0) - c) < 1e-9)
        assert(r.isNullAt(1) || math.abs(r.getDouble(1)) < 1e-9)
      }
    }
  }

  test("keepLast returns one row per distinct key") {
    for (_ <- 1 to 5) {
      val rows = List.fill(1 + rnd.nextInt(50))(
        (1 + rnd.nextInt(10), rnd.nextInt(100)))
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "ord")
      assert(Dedup.keepLast(df, Seq("k"), Seq("ord")).count()
        == rows.map(_._1).distinct.size)
    }
  }

  test("union conserves row counts") {
    for (_ <- 1 to 3) {
      val a = List.fill(1 + rnd.nextInt(20))(rnd.nextDouble())
      val b = List.fill(1 + rnd.nextInt(20))(rnd.nextDouble())
      assert(Combine.unionLong(Seq("a" -> a.toDF("v"), "b" -> b.toDF("v")))
        .count() == a.size + b.size)
    }
  }

  test("upsert twice with same updates equals upsert once") {
    for (_ <- 1 to 3) {
      val t = List.fill(rnd.nextInt(20))((1 + rnd.nextInt(20), rnd.nextInt(100)))
      val u = List.fill(rnd.nextInt(20))((1 + rnd.nextInt(20), rnd.nextInt(100)))
      val target = t.toDF("id", "v").dropDuplicates("id")
      val updates = u.toDF("id", "v").dropDuplicates("id")
      val once = Merge.upsert(target, updates, Seq("id"))
      val twice = Merge.upsert(once, updates, Seq("id"))
      assert(once.orderBy("id", "v").collect().toSeq ==
        twice.orderBy("id", "v").collect().toSeq)
    }
  }

  test("sliding window multiplicity: width/slide windows per row") {
    for (_ <- 1 to 3) {
      val n = 1 + rnd.nextInt(40)
      val rows = (1 to n).map { i =>
        ("K", 1.0, 1L,
          java.sql.Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
      }
      val df = rows.toDF("k", "v", "vol", "ts")
      val total = TimeWindows.metricWindow(df, "k", "ts", "v", $"vol",
        "15 minutes", Some("5 minutes"))
        .agg(org.apache.spark.sql.functions.sum("n_events"))
        .collect()(0).getLong(0)
      assert(total == 3L * n) // every row belongs to exactly 3 windows
    }
  }
}
