package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transaction-log [[VersionStorage]] — the Delta-shaped adapter the
  * storage seam was built for (seam doc above [[VersionStorage]];
  * SURVEY.md §1.3 names the mapping). Same physical data layout as
  * [[Storage]] (period-partitioned, entity-sorted parquet under
  * `<name>/v=<k>/`), plus a per-table COMMIT LOG under
  * `<name>/_txn/<k>.commit`:
  *
  *   - [[write]] makes a version visible in two steps — data files
  *     first, then the commit marker via atomic tmp+rename (the Delta
  *     commit-protocol shape: `_delta_log/<v>.json` appearing is what
  *     makes version v exist). A crash between the two leaves an
  *     UNCOMMITTED data directory that reads refuse and
  *     [[FeatureStore.vacuum]] reclaims as stranded after its grace
  *     window — data never half-appears.
  *   - [[read]]/[[readSegments]] are `versionAsOf`-shaped: a segment
  *     resolves through its commit marker or the read fails with the
  *     not-found error, exactly like `VERSION AS OF` on a vacuumed or
  *     never-committed Delta version. The marker carries the committed
  *     row count, so a read can never see a torn directory.
  *   - retention is the store's RETIRE LEDGER: pruning/delete retire
  *     paths logically, vacuum deletes data AND its commit marker after
  *     the grace window ([[deleteVersion]]) — the VACUUM + log-cleanup
  *     discipline of the table formats, driven by the same ledger as
  *     the default storage.
  *
  * What a real Delta/Iceberg binding would still add — multi-writer
  * commit arbitration via the log (optimistic concurrency on the next
  * version number) and column-level stats in the log — is out of scope
  * here by the reference's zero-infrastructure stance; the store's
  * foreign-writer detection covers the single-writer-per-table
  * contract this repo ships.
  */
final class TxnLogStorage(
    spark: SparkSession,
    root: String,
    granularity: String = "month") extends VersionStorage {

  private val inner = new Storage(spark, root, granularity)

  private def logDir(name: String): Path =
    new Path(s"$root/$name/_txn")
  private def commitFile(name: String, version: Int): Path =
    new Path(logDir(name), f"$version%010d.commit")

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def write(
      name: String,
      version: Int,
      df: DataFrame,
      entityCol: String,
      tsCol: String): Long = {
    val rows = inner.write(name, version, df, entityCol, tsCol)
    // commit AFTER the data is fully on disk: the marker's atomic
    // rename is the commit point
    val target = commitFile(name, version)
    val f = fs(target)
    f.mkdirs(target.getParent)
    val tmp = new Path(
      target.getParent, s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(
      s"rows=$rows\tcommittedAt=${System.currentTimeMillis()}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // OVERWRITE semantics, matching the data write's mode("overwrite"):
    // a delete + re-register legitimately restarts the lineage at v1
    // while the retired lineage's marker still awaits vacuum — the new
    // commit replaces it. Concurrent writers of one table are arbitrated
    // at the catalog level (foreign-writer detection), not here.
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw new FeatureConcurrencyError(
        s"commit of '$name' version $version lost a rename race " +
          "(another writer committed this version first)")
    }
    rows
  }

  private def requireCommitted(name: String, version: Int): Unit = {
    val c = commitFile(name, version)
    if (!fs(c).exists(c))
      throw new FeatureTableNotFoundError(
        s"Version $version of table '$name' has no commit in the " +
          "transaction log (never committed, or vacuumed past retention)")
  }

  def read(
      name: String,
      version: Int,
      columns: Seq[String],
      asOf: Option[java.sql.Timestamp]): DataFrame = {
    requireCommitted(name, version)
    inner.read(name, version, columns, asOf)
  }

  def readSegments(
      name: String,
      segments: Seq[Int],
      columns: Seq[String],
      asOf: Option[java.sql.Timestamp]): DataFrame = {
    segments.foreach(requireCommitted(name, _))
    inner.readSegments(name, segments, columns, asOf)
  }

  /** Vacuum-time reclamation: data dir AND its log entry go together
    * (Delta's VACUUM + log cleanup, in one step, under the retire
    * ledger's grace window).
    */
  def deleteVersion(name: String, version: Int): Unit = {
    inner.deleteVersion(name, version)
    val c = commitFile(name, version)
    val f = fs(c)
    if (f.exists(c)) { f.delete(c, false); () }
    // also reclaim tmp markers a crashed commit of THIS version left
    // behind (create succeeded, rename never ran) — otherwise they
    // accumulate until deleteTable
    val d = logDir(name)
    if (f.exists(d)) {
      val tmpPrefix = s".${c.getName}.tmp-"
      f.listStatus(d).toSeq
        .filter(_.getPath.getName.startsWith(tmpPrefix))
        .foreach(s => { f.delete(s.getPath, false); () })
    }
  }

  def deleteTable(name: String): Unit = inner.deleteTable(name)

  /** Physical truth for vacuum: ALL data dirs, committed or not — an
    * uncommitted directory (crash between data and marker) is exactly
    * the stranded-path class vacuum exists to reclaim.
    */
  def listVersionDirs(name: String): Seq[Int] = inner.listVersionDirs(name)

  def listTableDirs(): Seq[String] = inner.listTableDirs()

  /** Committed versions present in the log — the `DESCRIBE HISTORY`
    * surface (exposed for tests and operators; the store's catalog
    * remains the authority on which versions are retained).
    */
  def committedVersions(name: String): Seq[Int] = {
    val d = logDir(name)
    val f = fs(d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq
      .map(_.getPath.getName)
      .collect {
        case s if s.endsWith(".commit") =>
          s.stripSuffix(".commit").toIntOption
      }
      .flatten
      .sorted
  }
}
