package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `minhash_signature(tokens, n)` — all `n` MinHash values of a token
  * array in ONE codegen'd pass: per token one xxhash64, then `n` cheap
  * seed-mixed re-hashes kept as running minima in a local array.
  *
  * Bit-identical to the declarative form
  * `min(xxhash64(lit(i), xxhash64(tok)))` grouped per document (the
  * per-band seed is `XXH64.hashInt(i, 42)` — exactly Spark's `xxhash64`
  * child-chaining with its default seed), but with no explode, no
  * 96-column hash aggregate, and no shuffle: the signature computation is
  * a pure map stage that pipelines into LSH banding. At 100 TB the former
  * explode shape shuffles (docs × tokens) rows; this shuffles nothing.
  *
  * Duplicate tokens need no dedup — a duplicate can never change a min.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got $other")
  }

  // per-band seeds: xxhash64(i, h) == hashLong(h, hashInt(i, seed=42))
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, 42L)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  UTF8String $s = $a.getUTF8String($j);
         |  if ($s != null) {
         |    long $h = $xxh.hashUTF8String($s, 42L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $v = $xxh.hashLong($h, $seedsRef[$i]);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
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

object MinHashSignature {
  def apply(tokens: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(tokens), numHashes))
}
