package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd match counter: `regexp_count` without materializing the
 * match array.
 *
 * Spark's built-in `regexp_count` is RuntimeReplaceable sugar for
 * `size(regexp_extract_all(...))`, which allocates a GenericArrayData of
 * every match per row just to take its length. On a 100 TB text corpus that
 * allocation is pure garbage-collector pressure in the hottest loop of
 * token counting. This expression compiles the pattern ONCE per plan (when
 * the pattern is foldable, the overwhelmingly common case), and its
 * generated code is a bare `while (m.find()) cnt++` loop that stays inside
 * whole-stage codegen.
 */
case class RegexpCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "regexp_count_fast"

  /** Compiled once when the pattern is a literal/foldable expression. */
  @transient private lazy val cachedPattern: Pattern = right match {
    case e if e.foldable =>
      val v = e.eval(null)
      if (v != null) Pattern.compile(v.toString) else null
    case _ => null
  }

  override protected def nullSafeEval(subject: Any, regex: Any): Any = {
    val p =
      if (cachedPattern != null) cachedPattern
      else Pattern.compile(regex.asInstanceOf[UTF8String].toString)
    RegexpCountExpr.countMatches(p, subject.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (cachedPattern != null) {
      val patternRef =
        ctx.addReferenceObj("regexpCountPattern", cachedPattern,
          classOf[Pattern].getName)
      defineCodeGen(ctx, ev, (subject, _) =>
        s"""graft.functions.RegexpCountExpr.countMatches(
           |  $patternRef, $subject)""".stripMargin)
    } else {
      // non-foldable pattern: inherently per-row compile; callers should
      // pass a literal pattern for the cached fast path
      defineCodeGen(ctx, ev, (subject, regex) =>
        s"""graft.functions.RegexpCountExpr.countMatches(
           |  java.util.regex.Pattern.compile($regex.toString()),
           |  $subject)""".stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RegexpCountExpr {

  /** Zero-copy CharSequence view over an all-ASCII UTF8String: when
    * numBytes == numChars every byte is one char, so the regex matcher can
    * index the UTF8String's bytes in place and the subject is never copied
    * into a java.lang.String. Multibyte strings (where byte index != char
    * index) fall back to the one-copy toString — correctness first, and the
    * dominant text-corpus case (ASCII) stays allocation-free. */
  private final class AsciiView(u: UTF8String, n: Int) extends CharSequence {
    override def length(): Int = n
    override def charAt(i: Int): Char = (u.getByte(i) & 0xFF).toChar
    // only reached via Matcher group extraction, which countMatches never
    // does; substring-copy is fine on this cold path
    override def subSequence(s: Int, e: Int): CharSequence =
      u.substring(s, e).toString
    override def toString: String = u.toString
  }

  private def charSeq(u: UTF8String): CharSequence = {
    val n = u.numBytes()
    if (u.numChars() == n) new AsciiView(u, n) else u.toString
  }

  /** Called from generated code. */
  def countMatches(p: Pattern, subject: UTF8String): Int = {
    val m = p.matcher(charSeq(subject))
    var c = 0
    while (m.find()) c += 1
    c
  }
}

/** Column-level wrappers for graft's native expressions. */
object GraftFunctions {
  /** Count non-overlapping regex matches; codegen'd, zero allocation. */
  def regexpCount(subject: Column, pattern: String): Column =
    ColumnBridge.column(RegexpCountExpr(
      ColumnBridge.expression(subject),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(pattern), StringType)))
}
