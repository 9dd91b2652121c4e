package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product of two double-array columns.
  *
  * The DataFrame-level formulation `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * is semantically identical but runs the lambda interpreter per element —
  * higher-order functions are not part of whole-stage codegen, and the
  * zip_with materializes an intermediate array per row. This expression
  * compiles to a tight primitive `for` loop inside the generated code
  * (`doGenCode`), no allocation, no virtual calls — the preferred Catalyst
  * extension tier for a hot scalar kernel (SURVEY §7.3). Registered as SQL
  * function `vec_dot` via [[graft.core.GraftExtensions]].
  *
  * Determinism: strictly sequential left-to-right accumulation — the same
  * fold order as the higher-order formulation and DuckDB's `list_sum`, so
  * results stay bit-identical across all three.
  */
object VecDot {
  /** THE cast-and-call Column helper for the `vec_dot` kernel: the
    * expression does no implicit casts (see below), so every call site
    * must pair it with explicit array<double> casts — one shared helper
    * instead of per-file copies that could drift (a site dropping the
    * cast would hit the type check only at runtime). */
  def dotCol(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("vec_dot",
      a.cast("array<double>"), b.cast("array<double>"))
}

case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // No ExpectsInputTypes (its AbstractDataType is private[sql] in Spark 4)
  // → no implicit casts: callers pass array<double> explicitly.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  // always nullable: length mismatch yields null even for non-null inputs
  // (also keeps codegen's isNull slot alive for the branch below)
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  // Length mismatch → null, matching the aggregate(zip_with) formulation
  // it replaces (zip_with pads the shorter array with null, which poisons
  // the fold) — a silent min-length truncation would return a plausible
  // but wrong number on ragged data.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
