package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_fingerprint(text, k, keep)` — the `keep` smallest xxhash64
  * values over all char `k`-grams of a document, ascending: a min-sketch
  * document fingerprint (two docs sharing a fingerprint share rare
  * k-grams with high probability).
  *
  * Bit-identical to the declarative form
  * `slice(array_sort(transform(sequence(…), i → xxhash64(substr(i, k)))), 1, keep)`
  * (same `substringSQL` gram extraction, same seed-42 hash), but ONE
  * codegen'd pass with a `keep`-slot insertion buffer instead of an
  * interpreted lambda per gram plus an O(g log g) sort of every gram hash
  * per document — the sketch needs 4 minima, not 500 sorted hashes. */
case class RollingFingerprint(child: Expression, k: Int, keep: Int)
  extends UnaryExpression {

  require(k > 0 && keep > 0, "k and keep must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects string, got $other")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val grams = math.max(s.numChars() - (k - 1), 1)
    val mins = Array.fill(math.min(grams, keep))(Long.MaxValue)
    var filled = 0
    var i = 1
    while (i <= grams) {
      val h = XXH64.hashUTF8String(s.substringSQL(i, k), 42L)
      if (filled < mins.length || h < mins(filled - 1)) {
        // insertion into the sorted keep-slot buffer (keep is tiny)
        var p = math.min(filled, mins.length - 1)
        while (p > 0 && mins(p - 1) > h) { mins(p) = mins(p - 1); p -= 1 }
        mins(p) = h
        if (filled < mins.length) filled += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val grams = ctx.freshName("grams")
      val mins = ctx.freshName("mins")
      val filled = ctx.freshName("filled")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      s"""
         |int $grams = java.lang.Math.max($a.numChars() - ${k - 1}, 1);
         |long[] $mins = new long[java.lang.Math.min($grams, $keep)];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $filled = 0;
         |for (int $i = 1; $i <= $grams; $i++) {
         |  long $h = $xxh.hashUTF8String($a.substringSQL($i, $k), 42L);
         |  if ($filled < $mins.length || $h < $mins[$filled - 1]) {
         |    int $p = java.lang.Math.min($filled, $mins.length - 1);
         |    while ($p > 0 && $mins[$p - 1] > $h) { $mins[$p] = $mins[$p - 1]; $p--; }
         |    $mins[$p] = $h;
         |    if ($filled < $mins.length) $filled++;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  def apply(text: Column, k: Int, keep: Int): Column =
    ColumnBridge.column(RollingFingerprint(
      ColumnBridge.expression(text), k, keep))
}
