package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd URL canonicalization — the r06 replacement for the
  * composed five-regexp Catalyst pipeline in
  * [[graft.ops.TextOps.canonicalUrl]] (which evaluated a regex filter
  * lambda per query parameter interpreted: the q_url_canonical scan was
  * a 0.4 s single task at sf0.1). The transformation is replicated
  * OP-FOR-OP with the same java.util.regex engine Spark's regexp
  * functions use, so outputs are byte-identical:
  *
  *   1. strip `#fragment` (`#.*$` → "");
  *   2. lowercase the `scheme://authority` prefix
  *      (`^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)`) via
  *      UTF8String.toLowerCase (Spark's `lower`);
  *   3. drop default ports `:80` (http) / `:443` (https);
  *   4. drop tracking query params (utm_*, gclid, fbclid, mc_cid,
  *      mc_eid, ref), keeping parameter order (split on `&` with
  *      trailing empties, like Spark's `split`);
  *   5. strip one trailing `/`.
  *
  * The independent oracle twin stays
  * [[graft.oracle.PlainOracles.canonicalUrlPlain]] (a single-pass char
  * walk — a different mechanism entirely).
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canonical_url"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  override protected def nullSafeEval(input: Any): Any =
    CanonicalUrl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CanonicalUrl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : CanonicalUrl = copy(child = newChild)
}

object CanonicalUrl {
  // the same pattern strings as the composed form, compiled once
  private val Frag = java.util.regex.Pattern.compile("#.*$")
  private val Prefix =
    java.util.regex.Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
  private val Http80 =
    java.util.regex.Pattern.compile("^(http://[^/?#]*):80([/?#]|$)")
  private val Https443 =
    java.util.regex.Pattern.compile("^(https://[^/?#]*):443([/?#]|$)")
  private val Tracking = java.util.regex.Pattern.compile(
    "^(utm_[a-z0-9_]*|gclid|fbclid|mc_cid|mc_eid|ref)=")
  private val TrailSlash = java.util.regex.Pattern.compile("/$")

  def compute(url: UTF8String): UTF8String = {
    val noFrag = Frag.matcher(url.toString).replaceAll("")
    val pm = Prefix.matcher(noFrag)
    val prefix = if (pm.find()) pm.group(1) else ""
    val lowered =
      if (prefix.isEmpty) noFrag
      else UTF8String.fromString(prefix).toLowerCase.toString +
        noFrag.substring(prefix.length)
    val noPort = Https443.matcher(
      Http80.matcher(lowered).replaceAll("$1$2")).replaceAll("$1$2")
    val qpos = noPort.indexOf('?') + 1 // 1-based, 0 when absent (instr)
    val base = if (qpos == 0) noPort else noPort.substring(0, qpos - 1)
    val rebuilt =
      if (qpos == 0) base
      else {
        // split keeps trailing empties (Spark split limit -1)
        val params = noPort.substring(qpos).split("&", -1)
        val kept = params.filter(p => !Tracking.matcher(p).find())
        val joined = kept.mkString("&")
        if (joined.isEmpty) base else base + "?" + joined
      }
    UTF8String.fromString(TrailSlash.matcher(rebuilt).replaceAll(""))
  }

  def canonicalUrl(c: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(CanonicalUrl(GraftExprBridge.expression(c)))
  }
}
