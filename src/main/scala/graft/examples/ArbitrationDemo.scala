package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{FeatureStore, TxnLogStorage}

/** Multi-writer arbitration at bench scale: two independent
  * [[FeatureStore]] instances on one transaction-log root race
  * interleaved APPENDS of real sf0.1 lineitem slices (~75k rows per
  * delta) from two threads. Measures what the reservation/commit
  * protocol costs under genuine contention — every lost reservation is
  * a re-read + retry — and verifies exactly-once version allocation
  * and zero lost rows at the end, the invariants ArbitrationSpec locks
  * at unit scale.
  *
  * The interesting number is the per-append overhead vs the
  * single-writer baseline: arbitration work is O(1) small files per
  * claim (one reserve create, one marker read pass, one catalog
  * reload per retry), so contention cost must stay flat in DATA size —
  * at 100 TB the data write dominates by orders of magnitude more.
  */
object ArbitrationDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val feat = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_suppkey").as("entity_id"),
      col("l_shipdate").as("timestamp"),
      col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val slices = (0 until 8).map(i => feat.filter(col("l_orderkey") % 8 === i))
    val sliceRows = slices.map(_.count())
    println(s"[arb] 8 slices of ${sliceRows.sum} total rows")

    def run(label: String, writers: Int): (Double, String) = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_arb_demo_$label").toString
      def open() = new FeatureStore(spark, root, maxVersions = 100,
        storageFactory = new TxnLogStorage(_, _, _))
      val stores = Vector.fill(writers)(open())
      stores.head.register("t", slices.head)
      val t0 = System.nanoTime()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (0 until writers).map { w =>
        val mine = (1 until 8).filter(_ % writers == w % writers)
        val t = new Thread(() =>
          try mine.foreach(i =>
            stores(w).registerAppend("t", slices(i), maxSegments = 100))
          catch { case e: Throwable => errs.add(e); () })
        t.start(); t
      }
      threads.foreach(_.join(300000))
      val secs = (System.nanoTime() - t0) / 1e9
      require(errs.isEmpty, s"racing appends failed: ${errs.peek()}")
      val fresh = open()
      val info = fresh.getTableInfo("t")
      require(info.version == 8, s"expected 8 versions, got ${info.version}")
      require(info.rowCount == sliceRows.sum,
        s"lost rows: ${info.rowCount} vs ${sliceRows.sum}")
      val readBack = fresh.getVersion("t", 8).count()
      require(readBack == sliceRows.sum, s"read-back mismatch: $readBack")
      (secs, s"8 versions, ${info.rowCount} rows, read-back exact")
    }

    val (solo, soloMsg) = run("solo", 1)
    println(f"[arb] single writer, 7 appends    $solo%8.2fs   ($soloMsg)")
    val (duo, duoMsg) = run("duo", 2)
    println(f"[arb] TWO writers racing, 7 appends $duo%6.2fs   ($duoMsg)")
    println(f"[arb] contention overhead ${duo / solo}%.2fx — arbitration cost is " +
      "O(1) files per claim; appends serialize on the version chain by design " +
      "(each delta builds on its absorbed predecessor), so wall-clock parity " +
      "with the single writer is the CORRECT outcome, not a missed speedup")
    spark.stop()
  }
}
