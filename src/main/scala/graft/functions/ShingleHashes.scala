package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every w-word shingle as a native codegen'd expression —
  * BIT-IDENTICAL to `transform(Dedup.wordShingles(text, w), s =>
  * xxhash64(s))` (parity-pinned in OpsSpec) because a shingle joined
  * with " " is exactly the original text's byte span between its first
  * token's first byte and its last token's last byte, and
  * `XXH64.hashUnsafeBytes` over that span equals Spark's
  * `xxhash64(concat_ws(" ", …))` over the materialized string.
  *
  * Exists because the substring-dedup family (duplicated windows,
  * contamination, n-gram Jaccard) only ever consumes the HASHES: the
  * composed form allocates one string per window (O(w · tokens) bytes
  * copied per row) just to hash and discard it — the dominant
  * allocation of substring dedup at corpus scale. Returns an EMPTY
  * array when tokens < w (mirroring wordShingles' `otherwise(array())`,
  * so `explode`/`posexplode` drop the row identically). Tier-(b) custom
  * Expression per SURVEY.md §4, same justification as [[MinHashSig]].
  */
case class ShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, "ShingleHashes requires w >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L // spark.sql.functions.xxhash64 default seed
  private val Empty = new GenericArrayData(Array.emptyLongArray)

  def compute(s: UTF8String, w: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var spaces = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val tokenCount = spaces + 1
    if (tokenCount < w) return Empty
    val starts = new Array[Int](tokenCount)
    val ends = new Array[Int](tokenCount)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val m = tokenCount - w + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      val st = starts(i)
      hs(i) = XXH64.hashUnsafeBytes(base, offset + st,
                                    ends(i + w - 1) - st, Seed)
      i += 1
    }
    new GenericArrayData(hs)
  }

  /** Column wrapper. */
  def shingleHashes(c: Column, w: Int): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(ShingleHashes(GraftExprBridge.expression(c), w))
  }
}
