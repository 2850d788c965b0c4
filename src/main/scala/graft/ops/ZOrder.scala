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
    normalizeBits(c, lo, hi, 16)

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

  /** Driver-side twin of [[zValueN]] (and of [[zValue2]] at N = 2 —
    * both put bit i of key j at z bit i·N + j) for interval
    * arithmetic. */
  private def interleaveN(coords: IndexedSeq[Long], bits: Int): Long = {
    val n = coords.length
    var r = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        r |= ((coords(j) >> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    r
  }

  /** Decompose the z-values of a closed 2-D box [xlo,xhi]×[ylo,yhi] (in
    * the normalized `bits`-bit grid) into at most `maxIntervals` sorted,
    * disjoint z-intervals — the 2-D case of [[zIntervalsForBoxN]]
    * (identical output; zValue2's bit layout equals zValueN's at
    * N = 2). */
  def zIntervalsForBox(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                       bits: Int = 16,
                       maxIntervals: Int = 64): Seq[(Long, Long)] =
    zIntervalsForBoxN(Seq((xlo, xhi), (ylo, yhi)), bits, maxIntervals)

  /** Decompose the z-values of a closed N-D box (one [lo, hi] per
    * dimension, in the normalized `bits`-bit grid, dimension order =
    * the key order given to [[zValueN]]) into at most `maxIntervals`
    * sorted, disjoint z-intervals — the query-side half of z-order
    * clustering (Tropf–Herzog style, via aligned-orthant recursion). A
    * z-aligned orthant (origin multiple of its size, size a power of
    * two) is a CONTIGUOUS z-range of size^N values, so the box
    * decomposes exactly into O(surface) orthant ranges; under the
    * interval budget, remaining partial orthants coarsen to their
    * covering range (a sound superset — the residual row filter removes
    * the overshoot, pruning just skips less). Feed the result to a
    * stats-pruned multi-range read (VersionedTable.readWhereIn over a
    * z-clustered table): without this decomposition a box straddling a
    * high-order orthant boundary degenerates to one wide z-range that
    * prunes nothing. */
  def zIntervalsForBoxN(box: Seq[(Long, Long)], bits: Int = 16,
                        maxIntervals: Int = 64): Seq[(Long, Long)] = {
    val n = box.length
    // n capped well below the Int-shift wrap at 31: the recursion
    // spawns 2^n children per split, useless far earlier than that
    require(n >= 1 && n <= 16 && bits >= 1 && bits * n <= 63,
      s"need 1 <= dims <= 16 and 0 < bits*$n <= 63")
    val lim = (1L << bits) - 1
    box.foreach { case (lo, hi) =>
      require(lo <= hi, "empty box")
      require(lo >= 0 && hi <= lim, s"box exceeds the $bits-bit grid")
    }
    val nChild = 1 << n
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // work stack holds orthants in z order (head = z-smallest); each is
    // (origin, size) with size a power of two, z-aligned
    var stack = List((Vector.fill(n)(0L), 1L << bits))
    while (stack.nonEmpty) {
      val (o, size) = stack.head
      stack = stack.tail
      val disjoint = (0 until n).exists(j =>
        o(j) + size - 1 < box(j)._1 || o(j) > box(j)._2)
      val contained = (0 until n).forall(j =>
        o(j) >= box(j)._1 && o(j) + size - 1 <= box(j)._2)
      if (!disjoint) {
        if (contained || size == 1L ||
            out.size + stack.size + nChild > maxIntervals) {
          // exact orthant, atomic cell, or budget reached: emit the
          // orthant's covering z-range (exact when contained/atomic)
          val a = interleaveN(o, bits)
          val b = a +
            (1L << (java.lang.Long.numberOfTrailingZeros(size) * n)) - 1
          // orthants arrive in z order: merge with the previous
          // interval when adjacent or overlapping
          if (out.nonEmpty && a <= out.last._2 + 1)
            out(out.size - 1) = (out.last._1, math.max(out.last._2, b))
          else out += ((a, b))
        } else {
          val h = size / 2
          // 2^N children prepended in ascending child index c, where
          // bit j of c selects dim j's high half — exactly c's rank in
          // z order (the level's z bits are (bit of dim j) at slot j)
          val kids = (0 until nChild).map(c =>
            (Vector.tabulate(n)(j => o(j) + ((c >> j) & 1) * h), h)).toList
          stack = kids ::: stack
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

  /** Range-normalize `c` to [0, 2^bits - 1] given closed bounds —
    * [[normalize16]] generalized so 4+ dimensions can fit a 63-bit
    * z-value at a narrower per-key grid. */
  def normalizeBits(c: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi === lo, lit(0L))
      .otherwise(floor((c - lo).cast("double") * ((1L << bits) - 1) /
        (hi - lo).cast("double")))

  /** N-dimensional z-value with data-derived bounds (one constant-width
    * aggregate broadcast to every row, as in withZValue). The per-key
    * grid auto-narrows so bits·N fits a long: 16 bits up to 3 keys,
    * 63/N bits beyond (4 keys → 15 bits — resolution barely drops
    * while the layout gains a whole dimension). */
  def withZValueN(df: DataFrame, cols: Seq[String],
                  out: String = "zval"): DataFrame = {
    val bits = math.min(16, 63 / cols.size)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__${c}_lo"), max(col(c)).as(s"__${c}_hi")))
    val b = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(b))
      .withColumn(out, zValueN(cols.map(c =>
        normalizeBits(col(c), col(s"__${c}_lo"), col(s"__${c}_hi"), bits)),
        bits))
      .drop(cols.flatMap(c => Seq(s"__${c}_lo", s"__${c}_hi")): _*)
  }
}
