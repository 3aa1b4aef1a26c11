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

  def all: Seq[TableMeta] = names.map(tables(_))
}
