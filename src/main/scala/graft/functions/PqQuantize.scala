package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernel: L2-normalize the input vector, then per
  * subspace `j` compute squared distances to every codebook centroid.
  * `emitCodes = true` → `array<int>` of 1-based argmin codes (corpus
  * side); `false` → `array<array<double>>` of full distance tables
  * (query side, consumed by the ADC lookup join).
  *
  * Exists for the same reason as [[SignSignature]]: the nested
  * `transform`/`aggregate`/`zip_with` formulation is interpreted
  * (higher-order functions are CodegenFallback) and costs ~35 ms PER ROW
  * at m=8, ksub=32, dim=64 — measured 72 s to encode a 2 000-vector
  * corpus. Here the whole quantization is one codegen'd loop nest over a
  * task-shared codebook reference (~µs per row), and the plan carries
  * O(1) literals instead of an inlined m×ksub×sub matrix.
  *
  * Distance arithmetic matches the lambda version exactly: ascending-index
  * IEEE summation for the norm and each subspace distance, `x/‖v‖` in
  * double precision. A null vector or null element yields NULL (the HOF
  * chain's null propagation).
  */
case class PqQuantize(child: Expression,
    codebooks: Array[Array[Array[Double]]], emitCodes: Boolean)
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))

  override def prettyName: String = "pq_quantize"

  // returns NULL for undersized vectors and null elements even when the
  // child is non-nullable — without this override nullSafeCodeGen pins
  // ev.isNull to a FalseLiteral and the generated `false = true;` branch
  // fails to compile (silent per-batch interpreted fallback)
  override def nullable: Boolean = true

  override def dataType: DataType =
    if (emitCodes) ArrayType(IntegerType, containsNull = false)
    else ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)

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
          s"pq_quantize expects array<float|double>, got ${child.dataType}")
    }

  private val m = codebooks.length
  private val sub = codebooks(0)(0).length

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isFloat = elementType == FloatType
    val n = arr.numElements()
    if (n < m * sub) return null
    val x = new Array[Double](m * sub)
    var i = 0
    var norm = 0.0
    while (i < m * sub) {
      if (arr.isNullAt(i)) return null
      val xi = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      x(i) = xi
      norm += xi * xi
      i += 1
    }
    val inv = 1.0 / math.sqrt(norm)
    if (emitCodes) {
      val codes = new Array[Any](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          val cent = cb(c)
          var d = 0.0
          var k = 0
          while (k < sub) {
            val t = x(j * sub + k) * inv - cent(k)
            d += t * t
            k += 1
          }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        codes(j) = best + 1 // 1-based, matches element_at in the ADC join
        j += 1
      }
      new GenericArrayData(codes)
    } else {
      val tabs = new Array[Any](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        val row = new Array[Any](cb.length)
        var c = 0
        while (c < cb.length) {
          val cent = cb(c)
          var d = 0.0
          var k = 0
          while (k < sub) {
            val t = x(j * sub + k) * inv - cent(k)
            d += t * t
            k += 1
          }
          row(c) = d
          c += 1
        }
        tabs(j) = new GenericArrayData(row)
        j += 1
      }
      new GenericArrayData(tabs)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val getter = if (elementType == FloatType) "getFloat" else "getDouble"
      val x = ctx.freshName("x")
      val norm = ctx.freshName("norm")
      val inv = ctx.freshName("inv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bad = ctx.freshName("bad")
      val nn = ctx.freshName("nn")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      val common =
        s"""
           |int $nn = $m * $sub;
           |boolean $bad = $a.numElements() < $nn;
           |double[] $x = new double[$nn];
           |double $norm = 0.0;
           |for (int $i = 0; $i < $nn && !$bad; $i++) {
           |  if ($a.isNullAt($i)) { $bad = true; }
           |  else {
           |    $x[$i] = (double) $a.$getter($i);
           |    $norm += $x[$i] * $x[$i];
           |  }
           |}
           |if ($bad) { ${ev.isNull} = true; } else {
           |  double $inv = 1.0 / java.lang.Math.sqrt($norm);
         """.stripMargin
      val body = if (emitCodes)
        s"""
           |  Object[] $out = new Object[$m];
           |  for (int $j = 0; $j < $m; $j++) {
           |    int $best = 0; double $bd = Double.MAX_VALUE;
           |    for (int $c = 0; $c < $cb[$j].length; $c++) {
           |      double $d = 0.0;
           |      for (int $k = 0; $k < $sub; $k++) {
           |        double $t = $x[$j * $sub + $k] * $inv - $cb[$j][$c][$k];
           |        $d += $t * $t;
           |      }
           |      if ($d < $bd) { $bd = $d; $best = $c; }
           |    }
           |    $out[$j] = (Object) java.lang.Integer.valueOf($best + 1);
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      else
        s"""
           |  Object[] $out = new Object[$m];
           |  for (int $j = 0; $j < $m; $j++) {
           |    Object[] $row = new Object[$cb[$j].length];
           |    for (int $c = 0; $c < $cb[$j].length; $c++) {
           |      double $d = 0.0;
           |      for (int $k = 0; $k < $sub; $k++) {
           |        double $t = $x[$j * $sub + $k] * $inv - $cb[$j][$c][$k];
           |        $d += $t * $t;
           |      }
           |      $row[$c] = (Object) java.lang.Double.valueOf($d);
           |    }
           |    $out[$j] =
           |      new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      common + body
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqQuantize {
  def codes(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqQuantize(ColumnBridge.expression(vec),
      codebooks, emitCodes = true))
  def distTables(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqQuantize(ColumnBridge.expression(vec),
      codebooks, emitCodes = false))
}
