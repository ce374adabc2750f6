package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd BM25 tokenization stats: one pass over the
  * lowercased UTF-8 bytes yielding `[dl, tf(term0), tf(term1), …]` —
  * the r06 replacement for `size(split(lower(text)," "))` plus one
  * interpreted `size(filter(toks, _ === term))` higher-order function
  * per query term in [[graft.ops.Search.bm25Scores]].
  *
  * Tokenization is EXACTLY `split(lower(text), " ")` (limit −1):
  * single-0x20 separators, interior/leading/trailing empty tokens all
  * counted in `dl` (0x20 never occurs inside a multi-byte UTF-8
  * sequence, so byte-level splitting is exact — the [[SimHash64]]
  * argument); term comparison is raw byte equality against the
  * lowercased term, which equals string equality on UTF-8. Pinned
  * against the composed form by SearchSpec/OpsSpec and by the
  * q_bm25_topk DuckDB twin.
  */
case class TermFreqs(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "TermFreqs requires at least one term")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_term_freqs"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override protected def nullSafeEval(input: Any): Any =
    TermFreqs.compute(input.asInstanceOf[UTF8String], termBytes)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TermFreqs.compute($c, $termsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression)
      : TermFreqs = copy(child = newChild)
}

object TermFreqs {

  def compute(s0: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val s = s0.toLowerCase
    val n = s.numBytes()
    val out = new Array[Int](terms.length + 1)
    var tokenStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        out(0) += 1 // dl counts every field, empties included
        val len = i - tokenStart
        var t = 0
        while (t < terms.length) {
          val tb = terms(t)
          if (tb.length == len) {
            var k = 0
            var eq = true
            while (eq && k < len) {
              if (s.getByte(tokenStart + k) != tb(k)) eq = false
              k += 1
            }
            if (eq) out(t + 1) += 1
          }
          t += 1
        }
        tokenStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def termFreqs(text: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(TermFreqs(GraftExprBridge.expression(text), terms))
  }
}
