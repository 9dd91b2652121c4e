package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AdcScore, ArrayMaxCount, BpeClassCounts, PortableHash60Expr, PortableMinhash60, PortableSimhash60, PqEncode, SigAgree, SortedIntersect, TokenizeWs, VecDot, WinnowFps, WordShingles, XxMinhash64, XxWinnowFps}

/** Engine extension point (the `SparkSessionExtensions` registration path
  * for custom Catalyst surface): native functions injected into the
  * session's FunctionRegistry so both SQL text and `call_function` resolve
  * them. Install with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` — done by [[GraftSession.local]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot expects exactly 2 arguments")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("adc_score"),
      new ExpressionInfo(classOf[AdcScore].getName, "adc_score"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "adc_score expects exactly 2 arguments: (lut, codes)")
        AdcScore(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "pq_encode expects exactly 2 arguments: (ne, cbs)")
        PqEncode(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName, "sorted_intersect"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "sorted_intersect expects exactly 2 arguments: (a, b)")
        SortedIntersect(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("portable_hash60"),
      new ExpressionInfo(classOf[PortableHash60Expr].getName, "portable_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "portable_hash60 expects exactly 2 arguments: (s, prefix)")
        PortableHash60Expr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("tokenize_ws"),
      new ExpressionInfo(classOf[TokenizeWs].getName, "tokenize_ws"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "tokenize_ws expects exactly 1 argument")
        TokenizeWs(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "word_shingles expects exactly 2 arguments: (tokens, n)")
        WordShingles(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_class_counts"),
      new ExpressionInfo(classOf[BpeClassCounts].getName, "bpe_class_counts"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "bpe_class_counts expects exactly 1 argument: (text)")
        BpeClassCounts(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("array_max_count"),
      new ExpressionInfo(classOf[ArrayMaxCount].getName, "array_max_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "array_max_count expects exactly 1 argument: (array)")
        ArrayMaxCount(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sig_agree"),
      new ExpressionInfo(classOf[SigAgree].getName, "sig_agree"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "sig_agree expects exactly 2 arguments: (sig_a, sig_b)")
        SigAgree(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("xx_minhash64"),
      new ExpressionInfo(classOf[XxMinhash64].getName, "xx_minhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "xx_minhash64 expects exactly 2 arguments: (shingles, k)")
        XxMinhash64(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("portable_simhash60"),
      new ExpressionInfo(classOf[PortableSimhash60].getName, "portable_simhash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "portable_simhash60 expects exactly 1 argument: (tokens)")
        PortableSimhash60(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "winnow_fps expects exactly 2 arguments: (shingles, w)")
        WinnowFps(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("xx_winnow_fps"),
      new ExpressionInfo(classOf[XxWinnowFps].getName, "xx_winnow_fps"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "xx_winnow_fps expects exactly 2 arguments: (shingles, w)")
        XxWinnowFps(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("portable_minhash60"),
      new ExpressionInfo(classOf[PortableMinhash60].getName, "portable_minhash60"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "portable_minhash60 expects exactly 2 arguments: (shingles, k)")
        PortableMinhash60(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bounded_min_set"),
      new ExpressionInfo(
        classOf[graft.functions.BoundedMinSetAgg].getName, "bounded_min_set"),
      graft.functions.BoundedMinSetAgg.fromChildren))
  }
}
