package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `md5_affine_minhash(tokens, n)` — all `n` MinHash values of a token
  * array in ONE codegen'd pass, in the ORACLE-REPLAYABLE md5-affine hash
  * family: per token one md5 whose low 8 digest bytes little-endian are
  * the uint64 `m` (DuckDB's `md5_number_lower`), then `n` affine
  * permutations `(a_p·x + b_p) mod (2⁶¹−1)` over the Mersenne fold
  * `x` of `m`, kept as running minima.
  *
  * Bit-identical to the declarative layered form
  * ([[graft.operators.TextDedup.md5MinhashBandKeysDeclarative]], the
  * shape the q26 DuckDB oracle replays hash for hash) — the affine
  * arithmetic below is the same overflow-free split-product chain, every
  * intermediate in [0, 2⁶²). The declarative form exists so a spec can
  * pin this kernel against it; this kernel exists because a 96-column
  * projection chain exceeds `spark.sql.codegen.maxFields` and falls out
  * of whole-stage codegen (measured 7× slower than this single pass).
  *
  * `a_p/b_p` derive from md5 of `"a|p"`/`"b|p"` — the same constants the
  * oracle computes in SQL, never a shared hardcoded table. Duplicate
  * tokens need no dedup: a duplicate can never change a min.
  */
case class Md5AffineMinHash(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_affine_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_affine_minhash expects array<string>, got $other")
  }

  private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(p =>
      (Md5AffineMinHash.md5NumberLower(s"a|$p") & ((1L << 31) - 1)) | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(p =>
      Md5AffineMinHash.md5NumberLower(s"b|$p") & ((1L << 60) - 1))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        val m = Md5AffineMinHash.lowerLE(d)
        val x = Md5AffineMinHash.fold61(m)
        var p = 0
        while (p < numHashes) {
          val v = Md5AffineMinHash.affine(x, as(p), bs(p))
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = Md5AffineMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val asRef = ctx.addReferenceObj("md5mhA", as, "long[]")
      val bsRef = ctx.addReferenceObj("md5mhB", bs, "long[]")
      val md = ctx.addMutableState("java.security.MessageDigest", "md5mhDigest",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e); }""".stripMargin)
      val mins = ctx.freshName("mins")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  UTF8String $s = $a.getUTF8String($j);
         |  if ($s != null) {
         |    $md.reset();
         |    byte[] $d = $md.digest($s.getBytes());
         |    long $x = $cls.fold61($cls.lowerLE($d));
         |    for (int $p = 0; $p < $numHashes; $p++) {
         |      long $v = $cls.affine($x, $asRef[$p], $bsRef[$p]);
         |      if ($v < $mins[$p]) $mins[$p] = $v;
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

object Md5AffineMinHash {
  private val P61 = (1L << 61) - 1

  /** Digest bytes 9..16 as a little-endian uint64 — DuckDB's
    * `md5_number_lower`, and byte-for-byte what
    * [[graft.operators.TextDedup.md5TokenHash]] reassembles from the hex
    * digest. */
  def lowerLE(d: Array[Byte]): Long = {
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }

  def md5NumberLower(s: String): Long =
    lowerLE(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))

  /** Mersenne fold of the raw uint64 bits into [0, 2⁶¹−1). */
  def fold61(m: Long): Long = {
    val r = (m & P61) + (m >>> 61)
    if (r >= P61) r - P61 else r
  }

  /** `(a·x + b) mod (2⁶¹−1)` with `x ∈ [0, P)`, `a ∈ [1, 2³¹)`,
    * `b ∈ [0, 2⁶⁰)` — the split-product chain of the declarative form,
    * all intermediates in [0, 2⁶²). */
  def affine(x: Long, a: Long, b: Long): Long = {
    val u = a * (x >>> 31)
    val t0 = ((u & ((1L << 30) - 1)) << 31) + (u >>> 30)
    val t = if (t0 >= P61) t0 - P61 else t0
    val w = a * (x & ((1L << 31) - 1))
    val v0 = (w & P61) + (w >>> 61)
    val v = if (v0 >= P61) v0 - P61 else v0
    var s = t + v + b
    if (s >= P61) s -= P61
    if (s >= P61) s -= P61
    s
  }

  def apply(tokens: Column, numHashes: Int): Column =
    ColumnBridge.column(Md5AffineMinHash(
      ColumnBridge.expression(tokens), numHashes))
}
