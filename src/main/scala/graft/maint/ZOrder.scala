package graft.maint

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True multi-dimensional Z-ordering (the algorithm behind Delta's
  * OPTIMIZE ZORDER BY, reference delta_lake_features.py:214-231): map each
  * clustering column to a rank-normalized bucket index, bit-interleave the
  * indexes into a single z-value, and lay the data out in z order. Unlike
  * a lexical multi-column sort — which concentrates all selectivity in the
  * LEADING column — the z-curve preserves locality in EVERY dimension, so
  * min/max file stats prune on any clustered column alone.
  *
  * Bucketing uses per-column quantile boundaries from one approx_percentile
  * pass (the sampled-range-partition trick Delta uses via
  * range_partition_id): rank-based, so skewed columns still spread across
  * the full bucket range — never a global ntile sort (which would funnel
  * 100 TB through one partition).
  */
object ZOrder {

  /** SQL fragment casting a column to double for quantile bucketing —
    * timestamp family goes through CAST(.. AS TIMESTAMP) first (NTZ has
    * no direct double cast; ordering is what matters, not the epoch). */
  private def asDoubleSql(df: DataFrame, c: String): String = {
    import org.apache.spark.sql.types._
    // backtick-quoted: a reserved-word or dashed column name would
    // otherwise break (or silently re-parse as arithmetic) in the
    // approx_percentile expr text
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType | DateType =>
        s"CAST(CAST(`$c` AS TIMESTAMP) AS DOUBLE)"
      case _: NumericType => s"CAST(`$c` AS DOUBLE)"
      case other => sys.error(s"z-order column $c has un-orderable type $other")
    }
  }

  /** Add a `_z` column interleaving `bits` bits per clustering column.
    * Columns must be numeric/date/timestamp (cast-able to double for
    * quantile bucketing). `bits * cols.size` must fit in a long. `_z` is
    * a reserved name: an input that already carries one would be
    * silently overwritten here and dropped by [[layout]] — a silent
    * schema change on a maintenance rewrite — so it is rejected loudly.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits * cols.size <= 62, s"z-value overflow: $bits bits x ${cols.size} cols")
    require(!df.columns.contains("_z"),
      "input already has a _z column (reserved by ZOrder) — rename it first")
    val n = 1 << bits
    val qs = (1 until n).map(i => i.toDouble / n)
    // one pass: n-1 quantile boundaries per column (mergeable sketch)
    val boundsRow = df.agg(
      expr(s"approx_percentile(${asDoubleSql(df, cols.head)}, array(${qs.mkString(",")}), 10000)")
        .as(s"_q_${cols.head}"),
      cols.tail.map(c =>
        expr(s"approx_percentile(${asDoubleSql(df, c)}, array(${qs.mkString(",")}), 10000)")
          .as(s"_q_$c")): _*).collect()(0)
    val withBuckets = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      // approx_percentile yields NULL over an empty table or an all-NULL
      // column — degrade to a single bucket rather than NPE
      val bounds = Option(boundsRow.getSeq[Double](i))
        .getOrElse(Seq.empty).distinct.sorted
      // bucket = #boundaries <= value, as a COMPILED comparison chain
      // against literal boundaries (a null value fails every comparison
      // and sorts to bucket 0). The previous aggregate() HOF was
      // interpreted — it broke whole-stage codegen for the layout job
      // and re-evaluated the CAST subtree once per boundary element, the
      // exact pathology TextKernels exists to kill; here the cast binds
      // once to a temp column and each term is a codegen'd when().
      if (bounds.isEmpty) d.withColumn(s"_zb_$c", lit(0L))
      else d
        .withColumn(s"_zv_$c", expr(asDoubleSql(df, c)))
        .withColumn(s"_zb_$c",
          bounds.map(b => when(col(s"`_zv_$c`") >= lit(b), 1L).otherwise(0L))
            .reduce(_ + _))
        .drop(s"_zv_$c")
    }
    // interleave: bit j of column i's bucket -> z bit j*ncols + i
    val z: Column = cols.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(col(s"_zb_$c"), b).bitwiseAND(lit(1L)),
          b * cols.size + ci)
      }
    }.reduce[Column](_ + _)
    withBuckets
      .withColumn("_z", z)
      .drop(cols.map(c => s"_zb_$c"): _*)
  }

  /** Rewrite `df` in z-order across `numFiles` range partitions of the
    * z-value (each file covers a compact z-range => tight min/max stats on
    * every clustered dimension). `partitionPrefix` lists the table's Hive
    * partition columns: prepending them to the range/sort keys z-orders
    * WITHIN each partition value (Delta OPTIMIZE ZORDER semantics — the
    * z-curve never crosses a partition boundary inside one file). */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8, partitionPrefix: Seq[String] = Seq.empty): DataFrame = {
    val keys = (partitionPrefix :+ "_z").map(col)
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("_z")
  }
}
