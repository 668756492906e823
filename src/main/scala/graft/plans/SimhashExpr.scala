package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over the whitespace word multiset.
  *
  * Bit j (0..63) of the signature is set iff the majority of words have bit
  * j set in the first 8 bytes of their md5 digest (ties -> 0). One compiled
  * loop, one md5 per word; the DuckDB oracle reproduces the same bits via
  * hex-digit arithmetic.
  *
  * Codegen: `doGenCode` emits a direct `compute(value)` call on the
  * expression object — unlike CodegenFallback this needs no materialized
  * input row, so the expression stays inside the surrounding
  * WholeStageCodegen span with its inputs in locals.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // per-deserialized-instance (= per task) digest: thread-confined reuse
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  def compute(input: UTF8String): Long = {
    val words = Tokenize.words(input.toString)
    val votes = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      md.reset()
      val digest = md.digest(words(w).getBytes("UTF-8"))
      var j = 0
      while (j < 64) {
        // bit j = bit (7 - j%8) of byte j/8 (hex-string bit order)
        val bit = (digest(j / 8) >> (7 - (j % 8))) & 1
        votes(j) += (if (bit == 1) 1 else -1)
        j += 1
      }
      w += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimhashExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpr {
  import org.apache.spark.sql.GraftSqlBridge

  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimhashExpr(GraftSqlBridge.expression(text)))

  /** DuckDB oracle expression over a word-list expression `ws`: per bit j,
    * the hex digit at position j/4 of md5(word) holds bits (msb-first), so
    * bit j = (digit_value >> (3 - j%4)) & 1.
    */
  def simhash64Sql(ws: String): String = {
    val terms = (0 until 64).map { j =>
      val digitPos = j / 4 + 1
      val shift = 3 - (j % 4)
      s"""CASE WHEN 2 * len(list_filter($ws, s ->
         |    (((strpos('0123456789abcdef', substring(md5(s), $digitPos, 1)) - 1) >> $shift) & 1) = 1))
         |  > len($ws) THEN ${1L << j} ELSE 0 END""".stripMargin
    }
    terms.mkString("CAST((", " + ", ") AS BIGINT)")
  }
}
