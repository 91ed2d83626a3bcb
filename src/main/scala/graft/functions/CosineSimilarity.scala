package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `cosine_similarity(a, b)` over the first `dim` elements — dot product and
  * both norms in ONE whole-stage-codegen'd pass per pair.
  *
  * Replaces the explicit per-index fold (`Σ element_at(a,i)·element_at(b,i)`
  * …), which inlines ~3·dim expression nodes per pair: at dim=64 that is a
  * ~600-node subtree Janino must compile per containing stage and a
  * tree-walk per row wherever codegen falls back — the same plan-size
  * lesson as [[SignSignature]].
  *
  * Bit-compatibility contract (the DuckDB oracle replays the fold): terms
  * accumulate in ascending element order — `dot += x·y`, `na += x²`,
  * `nb += y²` — exactly the left fold's IEEE sequence, then one
  * `dot / (√na · √nb)`. NULL semantics likewise match the fold: an array
  * shorter than `dim` or a null element makes the whole result NULL (the
  * fold's `element_at` null poisons its sum chain).
  */
case class CosineSimilarity(left: Expression, right: Expression, dim: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects two array<float|double> args, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() < dim || b.numElements() < dim) return null
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() < $dim || $b.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else {
         |      double $x = (double) $a.$getA($i);
         |      double $y = (double) $b.$getB($i);
         |      $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def apply(a: Column, b: Column, dim: Int): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b), dim))
}
