package graft.store

/** An active read lease: while it exists, [[FeatureStore.vacuum]] will
  * not physically delete any retired path belonging to `name`.
  * `acquiredAt` is the last HEARTBEAT time — acquisition, or the most
  * recent [[ReadLeases.renew]] — which is what vacuum ages against its
  * TTL.
  */
final case class ReadLease(id: String, name: String, acquiredAt: Long)

/** READER LEASES — the opt-in protection for reads longer than the
  * vacuum grace window. The grace window alone bounds how long a
  * reader may safely hold a DataFrame over deleted/pruned data
  * (Delta/Iceberg retention has the same contract); a leased reader is
  * protected for as long as it holds the lease, regardless of query
  * duration.
  *
  * Layout: ONE FILE PER LEASE under `<root>/_leases/<uuid>.lease`
  * (contents: `<acquiredAtMillis>\t<url-encoded table name>`). File
  * create and delete are atomic, so concurrent acquire/release across
  * processes cannot clobber each other — unlike a shared TSV, there is
  * no read-modify-write window. A crashed reader leaves its lease file
  * behind; [[FeatureStore.vacuum]] ignores (and purges) leases older
  * than its TTL parameter, so storage reclamation cannot be wedged
  * forever by a dead process.
  */
object ReadLeases {
  import java.net.{URLDecoder, URLEncoder}
  import java.nio.charset.StandardCharsets.UTF_8
  import java.nio.file.{Files, Path, Paths}

  private def dir(root: String): Path = Paths.get(root, "_leases")

  /** Acquire a lease on `name`; returns the lease id for [[release]].
    * The lease file appears ATOMICALLY (tmp + rename): a concurrent
    * vacuum either sees the complete lease or no file — never a
    * half-written entry it would skip, which would silently void the
    * lease's protection for that pass.
    */
  def acquire(root: String, name: String): String = {
    val id = java.util.UUID.randomUUID().toString
    val d = dir(root)
    Files.createDirectories(d)
    val tmp = d.resolve(s".$id.tmp")
    try {
      Files.writeString(
        tmp, s"${System.currentTimeMillis()}\t${URLEncoder.encode(name, UTF_8)}")
      Files.move(
        tmp, d.resolve(s"$id.lease"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
    id
  }

  /** Release a lease; releasing an unknown/expired id is a no-op. */
  def release(root: String, id: String): Unit = {
    Files.deleteIfExists(dir(root).resolve(s"$id.lease"))
    ()
  }

  /** HEARTBEAT: rewrite the lease's timestamp to now (same tmp + atomic
    * rename as [[acquire]]), so a legitimately slow reader stays inside
    * vacuum's TTL without the TTL giving up crash recovery — a reader
    * renewing every TTL/2 is protected indefinitely, a dead one stops
    * renewing and ages out.
    *
    * Returns false when the lease file no longer exists (released, or
    * already purged as expired) — the caller's protection is GONE and
    * it should re-acquire or abort rather than assume its files
    * survive. A renew racing the purge itself is benign: whichever
    * lands second either resurrects the lease (protection continues) or
    * deletes it (the next renew reports false).
    */
  def renew(root: String, id: String): Boolean = {
    val d = dir(root)
    val f = d.resolve(s"$id.lease")
    if (!Files.exists(f)) return false
    try {
      val fields = Files.readString(f).split("\t")
      val tmp = d.resolve(s".$id.tmp")
      Files.writeString(tmp, s"${System.currentTimeMillis()}\t${fields(1)}")
      Files.move(
        tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      true
    } catch { case _: Exception => false }
  }

  def load(root: String): Seq[ReadLease] = {
    val d = dir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".lease"))
        .flatMap { p =>
          val id = p.getFileName.toString.stripSuffix(".lease")
          // lease files appear atomically ([[acquire]]), so a malformed
          // entry means external corruption, not a write in flight —
          // skipped defensively rather than failing the vacuum pass
          try {
            val f = Files.readString(p).split("\t")
            Some(ReadLease(id, URLDecoder.decode(f(1), UTF_8), f(0).toLong))
          } catch { case _: Exception => None }
        }
        .toList
    } finally s.close()
  }

  /** Drop the given lease ids (vacuum's stale-lease purge). */
  def purge(root: String, ids: Seq[String]): Unit =
    ids.foreach(release(root, _))

  /** Reclaim `.tmp` files a crashed [[acquire]] left behind (write
    * succeeded, rename never ran). They are invisible to [[load]] by
    * design, so the TTL purge cannot see them — this sweep, run by
    * vacuum with the same TTL, is their only cleanup path. Age gates on
    * file mtime: an in-flight acquire's tmp (microseconds old) is never
    * touched.
    */
  def sweepTmp(root: String, olderThanMillis: Long): Unit = {
    val d = dir(root)
    if (!Files.isDirectory(d)) return
    val cutoff = System.currentTimeMillis() - olderThanMillis
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".tmp"))
        .filter { p =>
          try Files.getLastModifiedTime(p).toMillis <= cutoff
          catch { case _: Exception => false } // deleted by a racing sweep
        }
        .foreach(p => { Files.deleteIfExists(p); () })
    } finally s.close()
  }
}
