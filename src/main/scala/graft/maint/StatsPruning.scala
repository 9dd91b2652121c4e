package graft.maint

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, expr, lit}

/** Predicate → file-survival condition over per-file min/max statistics —
  * the general data-skipping mapper (the shape of Delta's
  * DataSkippingReader, reference performance_optimization.py:107-166's
  * "file pruning" discussion; re-derived here over [[VersionedTable]]'s
  * `_stats` table).
  *
  * A row predicate `P` is compiled to a predicate over a stats row
  * `(mins.*, maxs.*)` that answers "could ANY row of this file satisfy
  * P?". Interval arithmetic per node:
  *
  *   - `c <  L` → `mins.c <  L`      - `c >  L` → `maxs.c >  L`
  *   - `c <= L` → `mins.c <= L`      - `c >= L` → `maxs.c >= L`
  *   - `c =  L` → `mins.c <= L && maxs.c >= L`
  *   - `c IN (…)` → OR of the equality mappings
  *   - `A AND B` → map(A) && map(B);  `A OR B` → map(A) || map(B)
  *   - anything else (NOT, IS NULL, functions, col-vs-col, non-stat
  *     columns) → `true` — the file is conservatively kept and the
  *     residual row filter decides. Correctness never depends on the
  *     mapping, only scan cost does.
  *
  * Three-valued logic does the right thing for free: a file whose column
  * is entirely NULL has NULL min/max, every comparison maps to NULL, and
  * a NULL survival verdict drops the file — correct, because no NULL row
  * can satisfy a comparison predicate either. An OR branch that must keep
  * the file yields TRUE, and `NULL OR TRUE = TRUE` keeps it.
  *
  * Literals are compared through the stats columns' own parquet types
  * (Spark inserts casts), so date/timestamp/decimal predicates prune the
  * same way they filter.
  */
object StatsPruning {

  /** Compile `predicate` (Spark SQL syntax, single-quoted strings) to a
    * survival [[Column]] over a stats row. `statCols` = the columns that
    * actually have min/max stats; anything else is conservatively kept. */
  def survives(spark: SparkSession, predicate: String,
      statCols: Set[String]): Column =
    map(spark.sessionState.sqlParser.parseExpression(predicate), statCols)

  private def mins(c: String): Column = col(s"mins.`$c`")
  private def maxs(c: String): Column = col(s"maxs.`$c`")

  private val keep: Column = lit(true)

  /** (column name, literal-as-Column) if this is a col-vs-literal compare
    * on a stats column. Literals are re-expressed through their SQL text
    * (`Literal.sql` round-trips types exactly: quoted strings,
    * TIMESTAMP '…', typed numerics) — no internal-representation
    * conversion. */
  private def colLit(a: Expression, b: Expression, statCols: Set[String])
      : Option[(String, Column)] = (a, b) match {
    case (u: UnresolvedAttribute, l: Literal) if statCols(u.name) =>
      Some((u.name, expr(l.sql)))
    case _ => None
  }

  private def map(e: Expression, statCols: Set[String]): Column = e match {
    case And(l, r) => map(l, statCols) && map(r, statCols)
    case Or(l, r)  => map(l, statCols) || map(r, statCols)

    // the parser leaves `x BETWEEN a AND b` as unresolved sugar
    case f: UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("between") &&
          f.arguments.length == 3 =>
      map(And(GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
        LessThanOrEqual(f.arguments(0), f.arguments(2))), statCols)

    case LessThan(a, b) =>
      colLit(a, b, statCols).map { case (c, v) => mins(c) < v }
        .orElse(colLit(b, a, statCols).map { case (c, v) => maxs(c) > v })
        .getOrElse(keep)
    case LessThanOrEqual(a, b) =>
      colLit(a, b, statCols).map { case (c, v) => mins(c) <= v }
        .orElse(colLit(b, a, statCols).map { case (c, v) => maxs(c) >= v })
        .getOrElse(keep)
    case GreaterThan(a, b) =>
      colLit(a, b, statCols).map { case (c, v) => maxs(c) > v }
        .orElse(colLit(b, a, statCols).map { case (c, v) => mins(c) < v })
        .getOrElse(keep)
    case GreaterThanOrEqual(a, b) =>
      colLit(a, b, statCols).map { case (c, v) => maxs(c) >= v }
        .orElse(colLit(b, a, statCols).map { case (c, v) => mins(c) <= v })
        .getOrElse(keep)
    case EqualTo(a, b) =>
      colLit(a, b, statCols).orElse(colLit(b, a, statCols))
        .map { case (c, v) => mins(c) <= v && maxs(c) >= v }
        .getOrElse(keep)
    case In(u: UnresolvedAttribute, vs)
        if statCols(u.name) && vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.map { v =>
        val lv = expr(v.asInstanceOf[Literal].sql)
        mins(u.name) <= lv && maxs(u.name) >= lv
      }.reduce(_ || _)

    case _ => keep
  }
}
