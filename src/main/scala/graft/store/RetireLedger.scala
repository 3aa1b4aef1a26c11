package graft.store

/** A path scheduled for physical deletion: `version = None` retires the
  * whole table directory, `Some(v)` one version segment directory.
  */
final case class RetiredPath(name: String, version: Option[Int], retiredAt: Long)

/** The RETIRE LEDGER behind the store's two-phase deletes: logical
  * removal (catalog) is immediate, physical removal is deferred until a
  * grace window has passed — so a reader holding a DataFrame over a
  * deleted table or pruned version keeps its parquet files until its
  * query finishes (snapshot isolation the reference gets for free from
  * pandas copies, store.py:393-396; a 100 TB deployment gets it from a
  * Delta/Iceberg VACUUM retention window — this is the same discipline
  * over the zero-dependency layout).
  *
  * One `_retired.tsv` file beside `_catalog.tsv`, rewritten atomically
  * (unique temp + atomic rename), one record per line:
  *
  *   R <retiredAtMillis> <name> <version | ->
  *
  * Entries are deduplicated on (name, version) keeping the LATEST
  * retire time: re-retiring a path restarts its grace clock, which only
  * ever delays deletion — safe by construction.
  */
object RetireLedger {
  import java.net.{URLDecoder, URLEncoder}
  import java.nio.charset.StandardCharsets.UTF_8
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)
  private def dec(s: String): String = URLDecoder.decode(s, UTF_8)

  def ledgerFile(root: String): Path = Paths.get(root, "_retired.tsv")

  def load(root: String): Seq[RetiredPath] = {
    val path = ledgerFile(root)
    if (!Files.exists(path)) return Seq.empty
    Files.readString(path).split("\n").toSeq.filter(_.nonEmpty).collect {
      case l if l.startsWith("R\t") =>
        val f = l.split("\t")
        RetiredPath(
          dec(f(2)),
          if (f(3) == "-") None else Some(f(3).toInt),
          f(1).toLong)
    }
  }

  /** Append `entries`, merging with the existing ledger (dedup on path,
    * latest retire time wins).
    */
  def record(root: String, entries: Seq[RetiredPath]): Unit =
    if (entries.nonEmpty) save(root, load(root) ++ entries)

  def save(root: String, entries: Seq[RetiredPath]): Unit = {
    val deduped = entries
      .groupBy(e => (e.name, e.version))
      .values.map(_.maxBy(_.retiredAt))
      .toSeq.sortBy(e => (e.name, e.version.getOrElse(-1)))
    val lines = deduped.map(e =>
      s"R\t${e.retiredAt}\t${enc(e.name)}\t${e.version.fold("-")(_.toString)}")
    val path = ledgerFile(root)
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(
      s"_retired.tsv.tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(
      tmp, path,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
