package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi-Sunter-style record-linkage scoring — the entity-resolution
  * primitive a corpus pipeline needs when two ingests describe the same
  * real-world entities without a shared key (author/site/product
  * records): score candidate pairs by which fields agree, weighting
  * each field by how SURPRISING agreement on it is.
  *
  * Weights use data-derived u-probabilities: u_f = P(two random records
  * agree on f) = Σ_v nA_v·nB_v / (NA·NB), an exact-int64 ratio computed
  * per field from the value-frequency tables (one tiny aggregate per
  * field — never a pass over the pair space). A field agreeing despite
  * a low u (many distinct values) contributes a large positive
  * ln(m/u_f); disagreement contributes ln((1−m)/(1−u_f)) < 0. The
  * match probability m is a caller constant (default 0.9) — the
  * classical EM fit needs labeled pairs this operator does not assume.
  *
  * Determinism: the score is a FIXED-ORDER sum of k per-field terms
  * (k = |fields|, a compile-time list, not data), each term one ln of
  * deterministic doubles — bit-identical cross-engine, so raw `score`
  * sorts portably; display is r6.
  *
  * Scale shape: candidate pairs come only from equi-joins on the block
  * keys; `maxBlockSize` drops oversized blocks on BOTH sides before the
  * join (the cap-the-quadratic discipline of coOccurrenceEdges — one
  * degenerate block value would otherwise dominate the join at 100 TB).
  * Int64 envelope: Σ nA_v·nB_v overflows past ~3·10⁹ rows per side
  * sharing one value — shard the field or pre-bucket above that. */
object Linkage {

  /** Score all same-block (a, b) candidate pairs by field agreement.
    * Output: idA, idB, one `agree_<field>` flag per field, `score`
    * (r6) and `n_agree`. Self-pairs are NOT excluded (a and b are
    * different snapshots by contract; filter idA =!= idB downstream if
    * they overlap). */
  def scorePairs(a: DataFrame, b: DataFrame, idA: String, idB: String,
                 blocks: Seq[String], fields: Seq[String],
                 m: Double = 0.9, maxBlockSize: Int = 10000): DataFrame = {
    require(blocks.nonEmpty, "need at least one block key")
    require(fields.nonEmpty, "need at least one comparison field")
    require(idA != idB,
      s"id columns must have distinct names (both sides survive the " +
        s"pair row): $idA")
    require(m > 0 && m < 1, s"m must be in (0,1): $m")
    val aSel = a.select((idA +: (blocks ++ fields).distinct).map(col): _*)
    val bSel = b.select((idB +: (blocks ++ fields).distinct).map(col): _*)
    def capped(df: DataFrame): DataFrame = {
      val sizes = df.groupBy(blocks.map(col): _*)
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlockSize)
        .drop("__bn")
      df.join(broadcast(sizes), blocks)
    }
    val na = aSel.agg(count(lit(1)).as("__na"))
    val nb = bSel.agg(count(lit(1)).as("__nb"))
    // u_f = Σ_v nA_v·nB_v / (NA·NB): join the two per-field frequency
    // tables (value-cardinality-sized), never the pair space
    val uCols = fields.map { f =>
      val fa = aSel.groupBy(col(f).as("__v")).agg(count(lit(1)).as("__ca"))
      val fb = bSel.groupBy(col(f).as("__v")).agg(count(lit(1)).as("__cb"))
      val num = fa.join(fb, "__v")
        .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("__num"))
      num.crossJoin(na).crossJoin(nb)
        .select((col("__num").cast("double")
          / (col("__na") * col("__nb")).cast("double")).as(s"__u_$f"))
    }
    val u = broadcast(uCols.reduce(_.crossJoin(_)))
    val bRenamed = fields.foldLeft(capped(bSel)) { (df, f) =>
      df.withColumnRenamed(f, s"__b_$f")
    }
    val pairs = capped(aSel).join(bRenamed, blocks).crossJoin(u)
    val withAgree = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"agree_$f", col(f) <=> col(s"__b_$f"))
    }
    val terms = fields.map { f =>
      when(col(s"agree_$f"), log(lit(m) / col(s"__u_$f")))
        .otherwise(log(lit(1.0 - m) / (lit(1.0) - col(s"__u_$f"))))
    }
    val nAgree = fields.map(f =>
      when(col(s"agree_$f"), 1L).otherwise(0L)).reduce(_ + _)
    withAgree
      .withColumn("score", round(terms.reduce(_ + _), 6))
      .withColumn("n_agree", nAgree)
      .select((Seq(col(idA), col(idB)) ++
        fields.map(f => col(s"agree_$f")) ++
        Seq(col("score"), col("n_agree"))): _*)
  }
}
