package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two double-array
  * columns — the hot scalar of ANN search, similarity-edge generation, and
  * link scoring.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions evaluate an
  * interpreted lambda per element per row (no whole-stage codegen, boxed
  * Doubles, a NamedLambdaVariable write per element). This expression
  * generates a single fused primitive loop via `doGenCode` — one pass
  * computing dot, |a|², |b|² — and stays inside WholeStageCodegen.
  *
  * Semantics (must stay bit-identical to VectorOps.cosine / the reference's
  * numpy cosine, entity_dedup.py:215-224): sequential accumulation in array
  * order, `dot / (sqrt(na) * sqrt(nb))`, zero-norm → 0.0, null input → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // a null ELEMENT yields a null result, so nullability also depends on the
  // arrays' containsNull — without this, non-nullable children would make
  // codegen emit an assignment to the FalseLiteral isNull slot
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // a null ELEMENT poisons the whole similarity → null result, matching the
    // HOF formulation (zip_with/aggregate propagate element nulls to the sum)
    var k = 0
    while (k < x.numElements()) { if (x.isNullAt(k)) return null; k += 1 }
    k = 0
    while (k < y.numElements()) { if (y.isNullAt(k)) return null; k += 1 }
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    // tail elements still count toward the norms (matches VectorOps, whose
    // norms are per-array regardless of the other side's length)
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); nb += v * v; j += 1 }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // when neither array can hold null elements, `nullable` is false and
    // nullSafeCodeGen binds ev.isNull to FalseLiteral — emitting an
    // assignment to it would generate `false = true;` (Janino error, forcing
    // interpreted fallback). Emit the element-null branch only when needed.
    val checkElems = elemNullable(left) || elemNullable(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val bad = ctx.freshName("hasNullElem")
      val body =
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i);
           |  double $yi = $b.getDouble($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |for (int $i = $n; $i < $a.numElements(); $i++) {
           |  double $xi = $a.getDouble($i); $na += $xi * $xi;
           |}
           |for (int $i = $n; $i < $b.numElements(); $i++) {
           |  double $yi = $b.getDouble($i); $nb += $yi * $yi;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 :
           |  $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      if (checkElems)
        s"""
           |boolean $bad = false;
           |for (int $i = 0; $i < $a.numElements() && !$bad; $i++) {
           |  if ($a.isNullAt($i)) $bad = true;
           |}
           |for (int $i = 0; $i < $b.numElements() && !$bad; $i++) {
           |  if ($b.isNullAt($i)) $bad = true;
           |}
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |$body
           |}
         """.stripMargin
      else body
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  /** Column wrapper; casts inputs to array<double> so float embeddings work. */
  def apply(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(ad), ColumnBridge.expression(bd)))
  }
}
