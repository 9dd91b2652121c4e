package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen intersection of two SORTED long arrays — a two-pointer
  * merge, O(n+m) primitive comparisons, zero allocation beyond the result.
  *
  * Replaces `array_intersect` in the triangle closing step, where both
  * inputs are `sort_array(collect_list(...))` adjacency lists: Spark's
  * generic ArrayIntersect builds a per-ROW hash set of one side (boxed
  * longs, OpenHashSet inserts and probes) — paid once per oriented edge,
  * the operator's hottest loop. The merge emits the common elements in
  * ascending order with duplicates collapsed, which on sorted inputs is
  * exactly array_intersect's result (first-array order + dedup).
  *
  * CONTRACT: both arrays sorted ascending with NO null elements (the
  * adjacency builder guarantees both — collect_list skips nulls,
  * sort_array orders). Unsorted input returns the merge's subset, not the
  * full intersection — callers outside that contract must keep
  * array_intersect. Null ARRAYS yield null (same as array_intersect).
  */
object SortedIntersect

case class SortedIntersect(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sorted_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val out = new Array[Long](if (n < m) n else m)
    var i = 0
    var j = 0
    var k = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        out(k) = xv
        k += 1
        // collapse duplicates on both sides (array_intersect dedups)
        i += 1; while (i < n && x.getLong(i) == xv) i += 1
        j += 1; while (j < m && y.getLong(j) == yv) j += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |final long[] $out = new long[$n < $m ? $n : $m];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $out[$k++] = $xv;
         |    $i++; while ($i < $n && $a.getLong($i) == $xv) $i++;
         |    $j++; while ($j < $m && $b.getLong($j) == $yv) $j++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}
