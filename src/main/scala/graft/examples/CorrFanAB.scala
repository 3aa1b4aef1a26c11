package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: same-JVM A/B of correlationMatrix's tier-1 aggregate with
  * and without the hash-keyed narrow-scan fan-out (single-split input
  * otherwise runs the whole ~40-agg pass in one task).
  * Usage: runMain graft.examples.CorrFanAB [sfDir] [reps]
  */
object CorrFanAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = Seq("qty", "price_cents", "disc_pct", "tax_pct")
    def prepared = graft.Tables.parquet(spark, s"$dir/lineitem.parquet")
      .select(
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        round(col("l_tax") * 100).cast("long").as("tax_pct"))
    val idx = cols.indices
    val spairs = for { i <- idx; j <- idx if i <= j } yield (i, j)
    def hiOf(c: org.apache.spark.sql.Column) = shiftright(c, 16)
    def loOf(c: org.apache.spark.sql.Column) = c.bitwiseAND(lit(0xFFFFL))
    def aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("_n") +:
        (idx.flatMap(i => Seq(
          min(col(cols(i))).as(s"_lo_$i"),
          max(col(cols(i))).as(s"_hi_$i"),
          sum(col(cols(i))).as(s"_s_$i"))) ++
          spairs.flatMap { case (i, j) =>
            val x = col(cols(i)); val y = col(cols(j))
            Seq(
              sum(hiOf(x) * hiOf(y)).as(s"_p_${i}_${j}_hh"),
              sum(hiOf(x) * loOf(y) + hiOf(y) * loOf(x)).as(s"_p_${i}_${j}_hl"),
              sum(loOf(x) * loOf(y)).as(s"_p_${i}_${j}_ll"))
          })
    val qFlat = prepared.agg(aggs.head, aggs.tail: _*)
    val qFan = prepared
      .repartition(cpus.toInt, xxhash64(cols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*)
    val qRR = prepared.repartition(cpus.toInt).agg(aggs.head, aggs.tail: _*)
    qFlat.head(); qFan.head(); qRR.head() // warm
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var bFlat = Double.MaxValue; var bFan = Double.MaxValue; var bRR = Double.MaxValue
    (1 to reps).foreach { _ =>
      bFlat = math.min(bFlat, time(qFlat.head()))
      bFan = math.min(bFan, time(qFan.head()))
      bRR = math.min(bRR, time(qRR.head()))
    }
    println(f"[ab] corr tier1 flat=$bFlat%.3fs hashFan=$bFan%.3fs roundRobin=$bRR%.3fs")
    println(s"[check] flat==fan: ${qFlat.head() == qFan.head()}")
    spark.stop()
  }
}
