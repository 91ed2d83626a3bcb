package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `sign_signature(vec)` — the random-hyperplane LSH signature of an
  * embedding against a fixed plane matrix: bit j is set iff
  * `dot(vec, planes(j)) >= 0`, dots summed in ascending element order.
  *
  * Replaces the `zip_with`+`aggregate` lambda formulation: higher-order
  * functions are CodegenFallback, so 10 tables × 12 planes × 64 dims cost
  * ~1.5 ms of interpreted, boxing-heavy evaluation PER ROW — the per-core
  * throughput ceiling that dominates `cosineNearDupPairs`/`lshTopK` long
  * before any shuffle does. Here the whole matrix multiply is one
  * whole-stage-codegen'd loop over a plane matrix held as a task-shared
  * reference object, so the plan carries O(1) literals (the q42 12-MiB
  * task-binary lesson) and evaluation is ~µs per row.
  *
  * Semantics match the lambda version bit for bit: ascending-index left
  * fold, and a null array element poisons that plane's dot (bit stays 0),
  * exactly like `zip_with`'s null propagation through `aggregate`.
  */
case class SignSignature(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_signature"

  require(planes.nonEmpty && planes.length <= 64,
    s"sign_signature packs plane bits into one long, got ${planes.length} planes")

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    elementType match {
      case FloatType | DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_signature expects array<float|double>, got ${child.dataType}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isFloat = elementType == FloatType
    val n = arr.numElements()
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val plane = planes(j)
      val dim = math.min(n, plane.length)
      var dot = 0.0
      var poisoned = false
      var i = 0
      while (i < dim && !poisoned) {
        if (arr.isNullAt(i)) poisoned = true
        else {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * plane(i)
        }
        i += 1
      }
      if (!poisoned && dot >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("planes", planes, "double[][]")
      val getter = if (elementType == FloatType) "getFloat" else "getDouble"
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val dim = ctx.freshName("dim")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $m.length; $j++) {
         |  int $dim = java.lang.Math.min($a.numElements(), $m[$j].length);
         |  double $dot = 0.0;
         |  boolean $poisoned = false;
         |  for (int $i = 0; $i < $dim && !$poisoned; $i++) {
         |    if ($a.isNullAt($i)) { $poisoned = true; }
         |    else { $dot += ((double) $a.$getter($i)) * $m[$j][$i]; }
         |  }
         |  if (!$poisoned && $dot >= 0) { ${ev.value} |= 1L << $j; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignSignature {
  def apply(vec: Column, planes: Seq[Array[Double]]): Column =
    ColumnBridge.column(SignSignature(ColumnBridge.expression(vec),
      planes.toArray))
}
