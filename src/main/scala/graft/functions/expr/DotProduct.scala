package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two double-array
  * columns — the hot scalar of retrieval scoring: `Embed` vectors are
  * L2-normalized at creation, so their cosine IS the dot product and the two
  * norm accumulators of [[CosineSimilarity]] are pure waste on that path.
  *
  * Semantics are bit-identical to the higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` on equal-length arrays:
  * sequential accumulation in array order, null input OR null element → null.
  * (Length mismatch truncates to the shorter side, where zip_with would
  * null-pad and poison the sum — embeddings here are fixed-dim.)
  * Unlike the HOF (interpreted lambda per element per row), this generates one
  * fused primitive loop via `doGenCode` and stays inside WholeStageCodegen.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

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
      s"dot_product needs array<double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    var dot = 0.0
    i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
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
      val i = ctx.freshName("i")
      val bad = ctx.freshName("hasNullElem")
      val plainLoop =
        s"""
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      if (checkElems)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |boolean $bad = false;
           |for (int $i = 0; $i < $n && !$bad; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) $bad = true;
           |}
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |$plainLoop
           |}
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |$plainLoop
         """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column wrapper; casts inputs to array<double> so float embeddings work. */
  def apply(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(ad), ColumnBridge.expression(bd)))
  }
}
