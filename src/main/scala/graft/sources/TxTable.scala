package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table: versioned parquet directories behind an
  * atomically-swapped pointer file — the W9/W10 ACID upgrade the
  * SURVEY promised over the reference's `supportsTransaction = false`
  * (TikvFeatures.java:109-111: a killed mutation batch there can leave
  * half its keys applied; a killed Spark overwrite of a plain parquet
  * table is worse — a half-deleted table).
  *
  * Layout:
  * {{{
  *   <root>/v_000001/…parquet…   committed or in-flight version data
  *   <root>/v_000002/…
  *   <root>/_CURRENT             one line: the committed version name
  * }}}
  *
  * Invariants:
  *  - readers resolve `_CURRENT` once and scan only that directory, so
  *    every read sees exactly one fully-written version;
  *  - a commit writes its FULL new version directory first and swaps
  *    the pointer only after the write job succeeds — the swap is a
  *    single `ATOMIC_MOVE` rename, the primitive every pointer-table
  *    format (Hive-style, Iceberg's metadata pointer) reduces to. A
  *    kill anywhere before the swap leaves `_CURRENT` — and therefore
  *    every reader — on the old version, with only an orphan directory
  *    to vacuum;
  *  - commits are optimistic-CAS on the version they were computed
  *    from: a concurrent commit that advanced the pointer first makes
  *    the second swap refuse loudly (ConcurrentModificationException)
  *    instead of silently dropping its predecessor's rows — the
  *    version-level form of the w15 CAS batch-refusal contract.
  *
  * Scale note: data volume is untouched by the mechanism — versions
  * are plain parquet directories written by ordinary distributed jobs;
  * the transactional surface area is one tiny marker file. Copy-on-
  * write (a full new version per commit) is the right trade for batch
  * curation pipelines (the reference's workload): commits are rare and
  * bulk-sized, readers are many. The atomic-rename contract holds on
  * POSIX and HDFS; object stores without atomic rename need a pointer
  * service in front (the standard Iceberg/Delta caveat).
  */
object TxTable {

  private def marker(root: String): Path = Paths.get(root, "_CURRENT")

  /** the committed version name, if any */
  def currentVersion(root: String): Option[String] =
    if (Files.exists(marker(root)))
      Some(Files.readString(marker(root)).trim).filter(_.nonEmpty)
    else None

  /** read the committed version — never an in-flight one */
  def read(spark: SparkSession, root: String): DataFrame =
    currentVersion(root) match {
      case Some(v) => spark.read.parquet(s"$root/$v")
      case None => throw new IllegalStateException(
        s"TxTable at $root has no committed version")
    }

  /** Write `df` as the NEXT version directory WITHOUT committing it —
    * the crash window made explicit (StorageSpec kills a simulated
    * writer exactly here). mode=overwrite so a retry of a crashed
    * attempt reclaims the orphan directory instead of failing on it.
    */
  private[graft] def writeVersion(spark: SparkSession, root: String,
                                  df: DataFrame): String = {
    val n = currentVersion(root)
      .map(_.stripPrefix("v_").toLong).getOrElse(0L) + 1
    val v = f"v_$n%06d"
    df.write.mode("overwrite").parquet(s"$root/$v")
    v
  }

  /** Atomic pointer swap, CAS-guarded on the version the commit was
    * computed from.
    */
  private def swap(root: String, v: String, expected: Option[String]): Unit = {
    val now = currentVersion(root)
    if (now != expected)
      throw new java.util.ConcurrentModificationException(
        s"TxTable $root advanced to ${now.orNull} since this commit read " +
          s"${expected.orNull} — refusing to drop the concurrent commit")
    val tmp = Paths.get(root, s"_CURRENT.tmp.$v")
    Files.writeString(tmp, v)
    Files.move(tmp, marker(root), StandardCopyOption.ATOMIC_MOVE)
  }

  /** create the table with an initial committed version */
  def init(spark: SparkSession, root: String, df: DataFrame): String = {
    Files.createDirectories(Paths.get(root))
    require(currentVersion(root).isEmpty,
      s"TxTable $root already initialized")
    val v = writeVersion(spark, root, df)
    swap(root, v, None)
    v
  }

  /** transform-and-commit: read the current version, apply `f`, write
    * the result as a new version, swap the pointer. Returns the new
    * version name. A kill before the swap leaves readers on the old
    * version; a concurrent commit in the window makes the swap refuse.
    */
  def commit(spark: SparkSession, root: String,
             f: DataFrame => DataFrame): String = {
    val base = currentVersion(root)
    val v = writeVersion(spark, root, f(read(spark, root)))
    swap(root, v, base)
    v
  }

  /** transactional MERGE — Writer.upsert under commit() */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
             keys: Seq[String]): String =
    commit(spark, root, base => graft.operators.Writer.upsert(base, updates, keys))

  /** transactional CDC apply — Writer.applyCdc under commit() */
  def applyCdc(spark: SparkSession, root: String, changes: DataFrame,
               keys: Seq[String], ordCol: String): String =
    commit(spark, root,
      base => graft.operators.Writer.applyCdc(base, changes, keys, ordCol))

  /** drop every version directory except the committed one (orphans
    * from crashed commits, superseded versions) and stale tmp markers;
    * returns how many directories were removed.
    */
  def vacuum(root: String): Int = {
    val cur = currentVersion(root)
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return 0
    var removed = 0
    val entries = Files.list(dir)
    try entries.forEach { p =>
      val name = p.getFileName.toString
      val isOldVersion = name.startsWith("v_") && !cur.contains(name)
      val isTmp = name.startsWith("_CURRENT.tmp.")
      if (isOldVersion || isTmp) {
        deleteRecursively(p)
        removed += 1
      }
    } finally entries.close()
    removed
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val entries = Files.list(p)
      try entries.forEach(deleteRecursively) finally entries.close()
    }
    Files.deleteIfExists(p)
  }

  /** remove the whole table (test/gate hygiene) */
  private[graft] def drop(root: String): Unit =
    deleteRecursively(Paths.get(root))
}
