package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.FeatureStore

/** End-to-end FeatureStore exercise at bench scale: register the sf0.1
  * lineitem table (600k rows, ~2500 distinct ship days) as a feature
  * table, then PIT-read and build a training set through the store's
  * real storage path. Surfaces write-layout behavior (partition counts,
  * small files) that unit-scale tests cannot.
  */
object StoreScaleDemo {
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

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val store = new FeatureStore(spark)
    val feat = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_suppkey").as("entity_id"),
      col("l_shipdate").as("timestamp"),
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"))

    val info = time("register 600k rows")(store.register("supplier_feats", feat))
    println(s"[scale] rows=${info.rowCount} version=${info.version}")

    val snap = time("PIT get (pruned)")(
      store.get("supplier_feats", (0L to 99L), "1998-06-01").count())
    println(s"[scale] snapshot entities=$snap")

    val spine = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        (col("o_custkey") % 100).as("entity_id"),
        col("o_orderdate").as("timestamp"))
    val ts = time("training set")(
      store.getTrainingSet("supplier_feats", spine).count())
    println(s"[scale] training rows=$ts")

    // the same register + reads through the transaction-log adapter:
    // the commit marker must cost O(1) on top of the data write, and
    // the versionAsOf-resolved reads must match the default layout
    val txn = new FeatureStore(spark,
      storageFactory = new graft.store.TxnLogStorage(_, _, _))
    val tInfo = time("txn-log register 600k")(txn.register("supplier_feats", feat))
    println(s"[scale] txn rows=${tInfo.rowCount} version=${tInfo.version}")
    val tSnap = time("txn-log PIT get")(
      txn.get("supplier_feats", (0L to 99L), "1998-06-01").count())
    require(tSnap == snap, s"adapter PIT mismatch: $tSnap vs $snap")
    val tTs = time("txn-log training set")(
      txn.getTrainingSet("supplier_feats", spine).count())
    require(tTs == ts, s"adapter training-set mismatch: $tTs vs $ts")
    println(s"[scale] txn-log adapter matches default layout on both reads")
    spark.stop()
  }
}
