package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-centroid evaluation of an embedding column against its labels
  * — the "are these embeddings any good" smoke test a training pipeline
  * runs on every new encoder drop: classify each vector by the closest
  * label centroid (by mean dot product) and emit the label×label
  * confusion matrix. A diagonal-heavy matrix means linearly separable
  * classes; systematic off-diagonal mass names the confusable pairs.
  *
  * Determinism: coordinates are quantized ONCE, globally, to
  * q = ⌊x·2^bits + ½⌋ (the [[Spectral]] convention — global scale keeps
  * cross-row additivity), so centroid sums S_l[pos] and every dot
  * product Σ q·S_l are EXACT int64s; the per-label score is one IEEE
  * divide dot/cnt_l of exact longs and ties break to the smaller label.
  * Resubstitution semantics: a vector's own label centroid includes it.
  *
  * Scale shape: centroid table is |labels|·dim rows (broadcast); the
  * score join expands each exploded coordinate by |labels| and
  * partial-aggregates map-side onto a |rows|·|labels| key space — never
  * a vector-vector pair join. Int64 envelope: |q| ≤ 2^bits·|x|max, so a
  * dot term ≤ 2^2bits·|x|²max·rows-per-label·dim — at 12 bits and
  * unit-scale floats, safe past 10¹⁰ rows per label. */
object CentroidEval {

  /** Confusion matrix rows (true_label, pred_label, n) of the
    * nearest-centroid classifier over `vec` (array&lt;float&gt;). */
  def nearestCentroidConfusion(df: DataFrame, id: String, vec: String,
                               label: String,
                               scaleBits: Int = 12): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 20, s"bad scaleBits: $scaleBits")
    val scale = (1L << scaleBits).toDouble
    val q = df
      .filter(col(vec).isNotNull)
      .select(col(id), col(label),
        posexplode(col(vec)).as(Seq("pos", "__x")))
      .withColumn("__q",
        floor(col("__x").cast("double") * lit(scale) + lit(0.5))
          .cast("long"))
    val cent = q.groupBy(col(label).as("__cl"), col("pos"))
      .agg(sum(col("__q")).as("__s"))
    val cnt = df.filter(col(vec).isNotNull)
      .groupBy(col(label).as("__cl")).agg(count(lit(1)).as("__cnt"))
    val dots = q
      .join(broadcast(cent), "pos")
      .groupBy(col(id), col(label), col("__cl"))
      .agg(sum(col("__q") * col("__s")).as("__dot"))
      .join(broadcast(cnt), "__cl")
      .withColumn("__score", col("__dot").cast("double") / col("__cnt"))
    val rk = Window.partitionBy(col(id))
      .orderBy(col("__score").desc, col("__cl").asc)
    dots.withColumn("__rk", row_number().over(rk))
      .filter(col("__rk") === 1)
      .groupBy(col(label).as("true_label"), col("__cl").as("pred_label"))
      .agg(count(lit(1)).as("n"))
  }
}
