package graft.store

import scala.collection.concurrent.TrieMap
import scala.collection.immutable.SortedMap

/** Public per-table metadata (reference: src/ml_feature_store/store.py:30-48
  * `FeatureTableInfo`). `registeredAt`/`updatedAt` are epoch millis (the
  * reference stores float epoch seconds from `time.time()`, store.py:152).
  */
final case class FeatureTableInfo(
    name: String,
    columns: Seq[String],
    version: Int,
    rowCount: Long,
    registeredAt: Long,
    updatedAt: Long)

/** Internal catalog entry — the Spark analog of `_VersionedTable`
  * (reference: store.py:51-69): current version pointer plus the retained
  * versions (each with its own column list — schema drift across versions
  * is allowed, reference README.md:144), over on-disk parquet snapshots.
  */
final case class TableMeta(
    name: String,
    version: Int,
    rowCount: Long,
    registeredAt: Long,
    updatedAt: Long,
    versions: SortedMap[Int, Seq[String]]) {
  def columns: Seq[String] = versions(version)
  def info: FeatureTableInfo =
    FeatureTableInfo(name, columns, version, rowCount, registeredAt, updatedAt)
}

/** Driver-local, thread-safe catalog — the Spark analog of the reference's
  * `Dict[str, _VersionedTable]` (store.py:112). No Hive metastore needed:
  * table state is tiny (one entry per table) and versions live as parquet
  * dirs managed by [[Storage]].
  */
final class Catalog {
  private val tables = TrieMap.empty[String, TableMeta]

  def names: Seq[String] = tables.keys.toSeq.sorted

  def get(name: String): Option[TableMeta] = tables.get(name)

  /** Lookup-or-raise with the available-tables message
    * (reference: store.py:403-420).
    */
  def getOrThrow(name: String): TableMeta =
    tables.getOrElse(
      name, {
        val available =
          if (tables.isEmpty) "none" else names.mkString(", ")
        throw new FeatureTableNotFoundError(
          s"Feature table '$name' not found. Available tables: $available")
      })

  def put(meta: TableMeta): Unit = tables.put(meta.name, meta)

  def remove(name: String): Option[TableMeta] = tables.remove(name)

  /** Atomic snapshot — safe against concurrent removals. */
  def all: Seq[TableMeta] =
    tables.readOnlySnapshot().values.toSeq.sortBy(_.name)
}

/** Durable catalog state: a tiny line-based metadata file under the
  * storage root, rewritten atomically on every mutation, so a new
  * session can reopen a store from disk (the reference is ephemeral by
  * design; persistence is what makes versioned parquet storage usable
  * across processes). Format, one record per line, tab-separated with
  * URL-encoded fields:
  *
  *   T <name> <version> <rowCount> <registeredAt> <updatedAt>
  *   V <name> <version> <col1> <col2> ...
  */
object CatalogPersistence {
  import java.net.{URLDecoder, URLEncoder}
  import java.nio.charset.StandardCharsets.UTF_8
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)
  private def dec(s: String): String = URLDecoder.decode(s, UTF_8)

  def catalogFile(root: String): Path = Paths.get(root, "_catalog.tsv")

  def save(root: String, metas: Seq[TableMeta]): Unit = {
    val lines = metas.flatMap { m =>
      val head =
        s"T\t${enc(m.name)}\t${m.version}\t${m.rowCount}\t${m.registeredAt}\t${m.updatedAt}"
      val versions = m.versions.toSeq.map { case (v, cols) =>
        (s"V\t${enc(m.name)}\t$v" +: cols.map(enc)).mkString("\t")
      }
      head +: versions
    }
    val path = catalogFile(root)
    Files.createDirectories(path.getParent)
    // unique tmp name: concurrent saves must not interleave on one file
    val tmp = path.resolveSibling(
      s"_catalog.tsv.tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(
      tmp, path,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def load(root: String): Seq[TableMeta] = {
    val path = catalogFile(root)
    if (!Files.exists(path)) return Seq.empty
    val lines = Files.readString(path).split("\n").toSeq.filter(_.nonEmpty)
    val heads = lines.collect {
      case l if l.startsWith("T\t") =>
        val f = l.split("\t")
        dec(f(1)) -> (f(2).toInt, f(3).toLong, f(4).toLong, f(5).toLong)
    }.toMap
    val versions = lines
      .collect {
        case l if l.startsWith("V\t") =>
          val f = l.split("\t")
          (dec(f(1)), f(2).toInt, f.drop(3).toSeq.map(dec))
      }
      .groupBy(_._1)
    heads.toSeq.map { case (name, (version, rowCount, reg, upd)) =>
      val vs = scala.collection.immutable.SortedMap(
        versions.getOrElse(name, Seq.empty).map(v => v._2 -> v._3): _*)
      TableMeta(name, version, rowCount, reg, upd, vs)
    }
  }
}
