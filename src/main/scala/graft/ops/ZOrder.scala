package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering for multi-dimensional data layout — the
 * file-skipping lever when queries filter on TWO dimensions: a sort on
 * (a, b) gives perfect locality on `a` and none on `b`; interleaving the
 * bits of both gives every file a small bounding box in BOTH, so min/max
 * stats prune scans for either predicate. At 100 TB the write-side sort is
 * paid once; every two-dimensional range scan after that reads a fraction
 * of the files.
 *
 * The z-value is pure codegen'd bit arithmetic (range-normalize each key
 * to 16 bits, spread with the classic Morton masks, interleave) — fully
 * deterministic and reproducible in any engine with integer bit ops,
 * hence oracle-checkable (unlike, say, a hilbert curve via lookup
 * tables).
 */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions (Morton
    * magic-mask sequence). */
  private def spread16(c0: Column): Column = {
    def step(x: Column, sh: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    val a = c0.bitwiseAND(lit(0xFFFFL))
    val b = step(a, 8, 0x00FF00FFL)
    val c = step(b, 4, 0x0F0F0F0FL)
    val d = step(c, 2, 0x33333333L)
    step(d, 1, 0x55555555L)
  }

  /** Range-normalize `c` to [0, 65535] given closed bounds. Constant
    * column (hi == lo) maps to 0. The product (c - lo) * 65535 stays
    * exact in double for any |c - lo| < 2^37, far beyond a 16-bit grid's
    * useful input range. */
  def normalize16(c: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L))
      .otherwise(floor((c - lo).cast("double") * 65535.0 /
        (hi - lo).cast("double")))

  /** Interleave two 16-bit normalized keys into a 32-bit z-value:
    * x occupies even bits, y odd. */
  def zValue2(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** Add a z-value column for (xCol, yCol), bounds derived from the data
    * in one constant-width aggregate (broadcast to every row — no second
    * scan dependency chain beyond the tiny agg). */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
                 out: String = "zval"): DataFrame = {
    val b = df.agg(min(col(xCol)).as("__xlo"), max(col(xCol)).as("__xhi"),
      min(col(yCol)).as("__ylo"), max(col(yCol)).as("__yhi"))
    df.crossJoin(broadcast(b))
      .withColumn(out, zValue2(
        normalize16(col(xCol), col("__xlo"), col("__xhi")),
        normalize16(col(yCol), col("__ylo"), col("__yhi"))))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Cluster the frame for a two-dimensional layout: range-partition on
    * the z-value (contiguous z-ranges per output file) and sort within
    * partitions, so each written file carries tight min/max bounds on
    * BOTH source dimensions. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 numPartitions: Int): DataFrame =
    withZValue(df, xCol, yCol)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))

  /** Driver-side twin of [[zValue2]] for interval arithmetic. */
  private def interleave(x: Long, y: Long, bits: Int): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((x >> i) & 1L) << (2 * i)
      r |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  /** Decompose the z-values of a closed 2-D box [xlo,xhi]×[ylo,yhi] (in
    * the normalized `bits`-bit grid) into at most `maxIntervals` sorted,
    * disjoint z-intervals — the query-side half of z-order clustering
    * (Tropf–Herzog style, via aligned-quad recursion). A z-aligned quad
    * is a CONTIGUOUS z-range, so the box decomposes exactly into
    * O(perimeter) quad ranges; under the interval budget, remaining
    * partial quads coarsen to their covering range (a sound superset —
    * the residual row filter removes the overshoot, pruning just skips
    * less). Feed the result to a stats-pruned multi-range read
    * (VersionedTable.readWhereIn over a z-clustered table): without this
    * decomposition a box whose corners straddle a high-order quad
    * boundary degenerates to one wide z-range that prunes nothing. */
  def zIntervalsForBox(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                       bits: Int = 16,
                       maxIntervals: Int = 64): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    require(xlo <= xhi && ylo <= yhi, "empty box")
    val lim = (1L << bits) - 1
    require(xlo >= 0 && xhi <= lim && ylo >= 0 && yhi <= lim,
      s"box exceeds the $bits-bit grid")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // work stack holds quads in REVERSE z order so we pop in z order;
    // each quad is (x0, y0, size) with size a power of two, z-aligned
    var stack = List((0L, 0L, 1L << bits))
    def quadRange(x0: Long, y0: Long, size: Long): (Long, Long) = {
      val zmin = interleave(x0, y0, bits)
      (zmin, zmin + size * size - 1)
    }
    while (stack.nonEmpty) {
      val (x0, y0, size) = stack.head
      stack = stack.tail
      val (x1, y1) = (x0 + size - 1, y0 + size - 1)
      val disjoint = x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi
      val contained = x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi
      if (!disjoint) {
        if (contained || size == 1L ||
            out.size + stack.size + 4 > maxIntervals) {
          // exact quad, atomic cell, or budget reached: emit the quad's
          // covering z-range (exact when contained/atomic)
          val (a, b) = quadRange(x0, y0, size)
          // quads arrive in z order: merge with the previous interval
          // when adjacent or overlapping
          if (out.nonEmpty && a <= out.last._2 + 1)
            out(out.size - 1) = (out.last._1, math.max(out.last._2, b))
          else out += ((a, b))
        } else {
          val h = size / 2
          // children consed z-smallest first (z prefix = ybit<<1 | xbit:
          // 00, x+h=01, y+h=10, 11) so pops proceed in z order
          stack = (x0, y0, h) :: (x0 + h, y0, h) :: (x0, y0 + h, h) ::
            (x0 + h, y0 + h, h) :: stack
        }
      }
    }
    out.toSeq
  }

  /** General N-dimensional interleave: z bit (i·N + j) = bit i of key j.
    * The 2-D magic-mask path (zValue2) is the fast special case; this
    * generic form is N·bits shift/or terms — a constant-size expression
    * tree per row, still codegen'd, for layouts clustered on 3-4 query
    * dimensions. bits·N must fit a signed long. */
  def zValueN(keys: Seq[Column], bits: Int = 16): Column = {
    require(keys.nonEmpty && bits > 0 && bits * keys.size <= 63,
      s"need 0 < bits*${keys.size} <= 63")
    val n = keys.size
    val terms = for {
      (k, j) <- keys.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(k, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** N-dimensional z-value with data-derived bounds (one constant-width
    * aggregate broadcast to every row, as in withZValue). */
  def withZValueN(df: DataFrame, cols: Seq[String],
                  out: String = "zval"): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__${c}_lo"), max(col(c)).as(s"__${c}_hi")))
    val b = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(b))
      .withColumn(out, zValueN(cols.map(c =>
        normalize16(col(c), col(s"__${c}_lo"), col(s"__${c}_hi")))))
      .drop(cols.flatMap(c => Seq(s"__${c}_lo", s"__${c}_hi")): _*)
  }
}
