package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the banded skyline: a CONTINUOUS x (every row a
  * distinct value, the worst case for the old distinct-x global window
  * — |distinct x| = |rows| in one task, broadcast unbounded) at 1×, 8×,
  * and 64×. The claim under test: per-row cost stays flat (near-linear
  * total wall) because the only unpartitioned window runs over ≤nbands
  * band minima and the join back stops broadcasting past the cap.
  * Print-and-judge probe (results recorded in BASELINE.md).
  *
  * Usage: Test/runMain graft.SkylineScaleProbe [baseRows]
  */
object SkylineScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .appName("skyline-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    def t[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-30s $s%.3f s"); s
    }
    def run(mult: Int): (Double, Long) = {
      // continuous x: a distinct double per row (hash-derived, dense);
      // y anti-correlated with noise so the frontier is non-trivial
      val n = base.toLong * mult
      val df = spark.range(n).select(
        (xxhash64(col("id")).cast("double") / lit(1e12)).as("x"),
        (-xxhash64(col("id")).cast("double") / lit(1e12) +
          pmod(xxhash64(col("id"), lit(7)), lit(1000)).cast("double"))
          .as("y"))
      var rows = 0L
      val w = t(s"skyline ${mult}x (${n} rows)") {
        rows = graft.ops.Skyline.skyline2D(df, "x", "y").count()
      }
      println(s"[probe]   frontier rows: $rows")
      (w, n)
    }
    run(1) // warm
    val (w1, n1) = run(1)
    val (w8, _) = run(8)
    val (w64, n64) = run(64)
    println(f"[probe] per-row cost ratio 64x/1x: " +
      f"${(w64 / n64.toDouble) / (w1 / n1.toDouble)}%.2f " +
      "(1.0 = perfectly flat; the old global window is single-task " +
      "input-sorted here)")
    println(f"[probe] walls 1x/8x/64x: $w1%.2f / $w8%.2f / $w64%.2f s")
    spark.stop()
  }
}
