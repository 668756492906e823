package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token counting: `[ws_tokens, re_tokens]` in one character walk.
  *
  * Semantically identical to
  * `size(split(text, " "))` and
  * `size(regexp_extract_all(text, "[a-z]+|[0-9]+|[^a-z0-9 ]", 0))`
  * (ExprSpec pins both): ws_tokens = spaces + 1 (split keeps empty
  * tokens), re_tokens = leftmost-greedy token count, i.e. one per
  * lowercase-letter run, one per digit run, one per any other non-space
  * char. Why native: the regex alternation walks each row with the
  * java.util.regex machinery and materializes every match just to take
  * the array's size; the counter needs no allocation at all.
  */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_counts"

  def compute(input: UTF8String): ArrayData = {
    val text = input.toString
    var ws = 1
    var re = 0
    // 0 = none, 1 = letter run, 2 = digit run
    var run = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') { ws += 1; run = 0 }
      else if (c >= 'a' && c <= 'z') { if (run != 1) { re += 1; run = 1 } }
      else if (c >= '0' && c <= '9') { if (run != 2) { re += 1; run = 2 } }
      else {
        re += 1; run = 0
        // count per CODE POINT, not UTF-16 unit: both regex engines (Java
        // in the pinned declarative twin, RE2 in the DuckDB oracle) match
        // [^a-z0-9 ] against one code point, so a surrogate pair is ONE
        // token — consuming only the high half would count it as two
        if (Character.isHighSurrogate(c) && i + 1 < n &&
            Character.isLowSurrogate(text.charAt(i + 1))) i += 1
      }
      i += 1
    }
    new GenericArrayData(Array(ws, re))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenCounts", this, classOf[TokenCountsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCountsExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: `[ws_tokens, re_tokens]` for a text column. */
  def tokenCounts(text: Column): Column =
    GraftSqlBridge.column(TokenCountsExpr(GraftSqlBridge.expression(text)))
}
