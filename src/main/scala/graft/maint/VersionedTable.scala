package graft.maint

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table — the engine's stand-in for the reference's
  * Delta maintenance surface (SURVEY.md §2.11: DESCRIBE HISTORY M2,
  * time-travel S6, RESTORE M3, VACUUM M4, OPTIMIZE compaction M5,
  * Z-ORDER clustering M6, DESCRIBE DETAIL M12) in an environment without
  * a transactional table format on the classpath.
  *
  * Layout: `<root>/v=<N>/part-*.parquet` + `<root>/_manifest` (one JSON
  * line per committed version, append-only). Writers stage into the new
  * version dir and commit by appending the manifest line LAST — readers
  * resolve versions only through the manifest, so a torn write is
  * invisible (the parquet stand-in for a log-ordered commit). At cluster
  * scale the manifest append would be a conditional put; everything else
  * is unchanged.
  */
final class VersionedTable(spark: SparkSession, root: String) {

  private def manifestPath: Path = Paths.get(root, "_manifest")

  private def manifestLines: Seq[String] =
    if (Files.exists(manifestPath))
      Files.readAllLines(manifestPath, StandardCharsets.UTF_8).asScala.toSeq
    else Seq.empty

  private def parse(line: String): (Long, String, Long) = {
    // {"version":N,"operation":"...","rows":N}
    val v = """"version":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
    val op = """"operation":"([^"]*)"""".r.findFirstMatchIn(line).get.group(1)
    val rows = """"rows":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
    (v, op, rows)
  }

  def versions: Seq[Long] = manifestLines.map(parse(_)._1)

  def latestVersion: Option[Long] = versions.maxOption

  /** Commit a new version; returns its number. */
  def write(df: DataFrame, operation: String = "write"): Long =
    commit(df, operation, stageFeed = None)

  /** Single commit path. Order: clear any orphaned `_changes/v=next`
    * (left by a writeWithChangeFeed that died pre-manifest — a later
    * plain write() must not adopt a stale feed), write the data files,
    * stage this commit's feed (if any), and ONLY THEN append the
    * manifest line. The manifest append is the commit point, so data and
    * feed become visible together or not at all. */
  private def commit(df: DataFrame, operation: String,
      stageFeed: Option[Long => Unit]): Long = {
    val next = latestVersion.map(_ + 1).getOrElse(0L)
    val staleFeed = Paths.get(s"$root/_changes/v=$next")
    if (Files.exists(staleFeed))
      Files.walk(staleFeed).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    val dir = s"$root/v=$next"
    df.write.mode("overwrite").parquet(dir)
    stageFeed.foreach(f => f(next))
    val rows = spark.read.parquet(dir).count()
    Files.createDirectories(Paths.get(root))
    Files.writeString(
      manifestPath,
      s"""{"version":$next,"operation":"$operation","rows":$rows}""" + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    next
  }

  /** Commit a new version AND its change feed (S4/M13 structural parity —
    * Delta CDF rows with `_change_type`, `_commit_version`,
    * `_commit_timestamp`). The feed for version N is derived as the
    * keyed diff against version N-1 (one key shuffle; v0 is all-insert)
    * and staged under `_changes/v=N` BEFORE the manifest line commits,
    * so feed and data become visible atomically.
    *
    * @param commitTs injected commit timestamp (deterministic pipelines
    *                 pass a fixed clock, like `Tables.OrdersAsOf`)
    */
  def writeWithChangeFeed(
      df: DataFrame, keyCols: Seq[String],
      operation: String = "write",
      commitTs: String = "2001-09-01 00:00:00"): Long = {
    commit(df, operation, stageFeed = Some { next =>
      val feed =
        if (next == 0L) graft.ops.ChangeFeed.allInserts(df)
        else graft.ops.ChangeFeed.diff(read(Some(next - 1)), df, keyCols)
      feed
        .withColumn(graft.ops.ChangeFeed.CommitVersionCol, lit(next))
        .withColumn(graft.ops.ChangeFeed.CommitTimestampCol,
          to_timestamp(lit(commitTs)))
        .write.mode("overwrite").parquet(s"$root/_changes/v=$next")
    })
  }

  /** Read the change feed from `fromVersion` to head (M13 / S4:
    * `table_changes(...)` equivalent; also consumable as a file stream for
    * the streaming-CDC path). */
  def changeFeed(fromVersion: Long = 0L): DataFrame = {
    val vs = versions.filter(_ >= fromVersion)
      .filter(v => Files.exists(Paths.get(s"$root/_changes/v=$v")))
    require(vs.nonEmpty, s"no change-feed versions >= $fromVersion at $root")
    spark.read.parquet(vs.map(v => s"$root/_changes/v=$v"): _*)
  }

  /** Time-travel read (S6): latest version, or `VERSION AS OF v`. */
  def read(versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.getOrElse(
      latestVersion.getOrElse(sys.error(s"empty table at $root")))
    require(versions.contains(v), s"version $v not in ${versions.mkString(",")}")
    // a vacuumed version stays in the manifest (audit trail) but its data
    // is gone — fail with the actual cause, not a parquet path error
    require(Files.isDirectory(Paths.get(s"$root/v=$v")),
      s"version $v of $root was vacuumed; earliest readable version is " +
        s"${versions.filter(x => Files.isDirectory(Paths.get(s"$root/v=$x"))).minOption.getOrElse("none")}")
    spark.read.parquet(s"$root/v=$v")
  }

  /** DESCRIBE HISTORY (M2). */
  def history(): DataFrame = {
    import spark.implicits._
    manifestLines.map(parse).toDF("version", "operation", "rows")
  }

  /** RESTORE TABLE ... TO VERSION AS OF (M3): re-commits an old version
    * as the new head (history preserved, like Delta RESTORE). */
  def restore(version: Long): Long = write(read(Some(version)), s"restore_v$version")

  /** OPTIMIZE small-file compaction (M5): rewrite head into ~targetFiles
    * files. */
  def compact(targetFiles: Int = 1): Long =
    write(read().coalesce(targetFiles), "compact")

  /** Z-ORDER substitute (M6): range-partition + sort the head by the
    * clustering keys so min/max file stats become selective for them. */
  def cluster(cols: Seq[String], numFiles: Int = 4): Long = {
    val df = read()
    val clustered = df
      .repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
    write(clustered, s"cluster_${cols.mkString("_")}")
  }

  /** VACUUM (M4): physically delete version dirs older than the last
    * `keepLast` commits (manifest keeps the audit trail). */
  def vacuum(keepLast: Int = 1): Seq[Long] = {
    val keep = versions.takeRight(keepLast).toSet
    val removed = versions.filterNot(keep)
    removed.foreach { v =>
      val dir = Paths.get(s"$root/v=$v")
      if (Files.exists(dir)) {
        Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    removed
  }

  /** DESCRIBE DETAIL (M12): file/byte statistics of the head version. */
  def detail(): DataFrame = {
    import spark.implicits._
    val v = latestVersion.getOrElse(sys.error("empty table"))
    val files = Files.list(Paths.get(s"$root/v=$v")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    Seq((root, v, files.size.toLong, files.map(Files.size).sum))
      .toDF("location", "version", "num_files", "size_bytes")
  }
}
