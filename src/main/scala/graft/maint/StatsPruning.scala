package graft.maint

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{array_contains, col, expr, lit, pmod, xxhash64}

/** Predicate → file-survival condition over per-file min/max statistics
  * and optional per-file bloom indexes — the general data-skipping mapper
  * (the shape of Delta's DataSkippingReader + bloom filter index;
  * reference performance_optimization.py:107-166's "file pruning"
  * discussion, re-derived here over [[VersionedTable]]'s `_stats` and
  * `_bloom` tables).
  *
  * A row predicate `P` is compiled to a predicate over a stats row
  * `(mins.*, maxs.*, __bloom_<c>…)` that answers "could ANY row of this
  * file satisfy P?". Interval arithmetic per node:
  *
  *   - `c <  L` → `mins.c <  L`      - `c >  L` → `maxs.c >  L`
  *   - `c <= L` → `mins.c <= L`      - `c >= L` → `maxs.c >= L`
  *   - `c =  L` → `mins.c <= L && maxs.c >= L`, AND, if `c` carries a
  *     bloom index, all k probe positions of L present in the file's
  *     position set (NULL index column = unindexed file = keep)
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
  * Bloom probes hash the literal CAST TO THE INDEXED COLUMN'S TYPE
  * (recorded in the index at build time) — xxhash64 of an int literal and
  * of the same value as bigint differ, and a type-mismatched probe would
  * wrongly prune. Literals are otherwise compared through the stats
  * columns' own parquet types (Spark inserts casts), so
  * date/timestamp/decimal predicates prune the same way they filter.
  */
object StatsPruning {

  /** Per-column bloom-index metadata: (m bits, k probes, column type as
    * catalogString). The stats row must carry the file's position set in
    * `__bloom_<column>` (array<int>, NULL when the file is unindexed). */
  type BloomMeta = Map[String, (Int, Int, String)]

  /** Compile `predicate` (Spark SQL syntax, single-quoted strings) to a
    * survival [[Column]] over a stats row. `statCols` = the columns that
    * actually have min/max stats; anything else is conservatively kept. */
  def survives(spark: SparkSession, predicate: String,
      statCols: Set[String], blooms: BloomMeta = Map.empty): Column =
    map(spark.sessionState.sqlParser.parseExpression(predicate),
      statCols, blooms)

  private def mins(c: String): Column = col(s"mins.`$c`")
  private def maxs(c: String): Column = col(s"maxs.`$c`")

  private val keep: Column = lit(true)

  /** (column name, literal-as-Column) if this is an attr-vs-literal pair.
    * Literals are re-expressed through their SQL text (`Literal.sql`
    * round-trips types exactly: quoted strings, TIMESTAMP '…', typed
    * numerics) — no internal-representation conversion. */
  private def colLit(a: Expression, b: Expression): Option[(String, Column)] =
    (a, b) match {
      case (u: UnresolvedAttribute, l: Literal) => Some((u.name, expr(l.sql)))
      case _ => None
    }

  /** Equality survival for `c = v`: min/max interval check (when stats
    * exist) AND bloom-probe check (when an index exists) — either alone
    * is sound, together they compose. */
  private def equality(c: String, v: Column, statCols: Set[String],
      blooms: BloomMeta): Column = {
    val interval =
      if (statCols(c)) mins(c) <= v && maxs(c) >= v else keep
    val bloom = blooms.get(c).map { case (m, k, tpe) =>
      val probes = (0 until k).map(i =>
        array_contains(col(s"__bloom_$c"),
          pmod(xxhash64(v.cast(tpe), lit(i)), lit(m)).cast("int")))
        .reduce(_ && _)
      col(s"__bloom_$c").isNull || probes
    }.getOrElse(keep)
    interval && bloom
  }

  private def map(e: Expression, statCols: Set[String],
      blooms: BloomMeta): Column = e match {
    case And(l, r) => map(l, statCols, blooms) && map(r, statCols, blooms)
    case Or(l, r)  => map(l, statCols, blooms) || map(r, statCols, blooms)

    // the parser leaves `x BETWEEN a AND b` as unresolved sugar
    case f: UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("between") &&
          f.arguments.length == 3 =>
      map(And(GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
        LessThanOrEqual(f.arguments(0), f.arguments(2))), statCols, blooms)

    case LessThan(a, b) =>
      colLit(a, b).filter(x => statCols(x._1)).map { case (c, v) => mins(c) < v }
        .orElse(colLit(b, a).filter(x => statCols(x._1)).map { case (c, v) => maxs(c) > v })
        .getOrElse(keep)
    case LessThanOrEqual(a, b) =>
      colLit(a, b).filter(x => statCols(x._1)).map { case (c, v) => mins(c) <= v }
        .orElse(colLit(b, a).filter(x => statCols(x._1)).map { case (c, v) => maxs(c) >= v })
        .getOrElse(keep)
    case GreaterThan(a, b) =>
      colLit(a, b).filter(x => statCols(x._1)).map { case (c, v) => maxs(c) > v }
        .orElse(colLit(b, a).filter(x => statCols(x._1)).map { case (c, v) => mins(c) < v })
        .getOrElse(keep)
    case GreaterThanOrEqual(a, b) =>
      colLit(a, b).filter(x => statCols(x._1)).map { case (c, v) => maxs(c) >= v }
        .orElse(colLit(b, a).filter(x => statCols(x._1)).map { case (c, v) => mins(c) <= v })
        .getOrElse(keep)

    case EqualTo(a, b) =>
      colLit(a, b).orElse(colLit(b, a))
        .map { case (c, v) => equality(c, v, statCols, blooms) }
        .getOrElse(keep)
    case In(u: UnresolvedAttribute, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.map(v => equality(
          u.name, expr(v.asInstanceOf[Literal].sql), statCols, blooms))
        .reduce(_ || _)

    case _ => keep
  }
}
