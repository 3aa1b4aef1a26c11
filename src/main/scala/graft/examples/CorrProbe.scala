package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is correlationMatrix's tier-1 wide aggregate inside
  * WholeStageCodegen, and what do try_* vs plain long arithmetic cost?
  * Usage: runMain graft.examples.CorrProbe [sfDir] [reps]
  */
object CorrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
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
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("CORR_MAX_FIELDS", "100"))
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

    def aggsTry: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("_n") +:
        (idx.flatMap(i => Seq(
          min(col(cols(i))).as(s"_lo_$i"),
          max(col(cols(i))).as(s"_hi_$i"),
          try_sum(col(cols(i))).as(s"_s_$i"))) ++
          spairs.flatMap { case (i, j) =>
            val x = col(cols(i)); val y = col(cols(j))
            Seq(
              try_sum(try_multiply(hiOf(x), hiOf(y))).as(s"_p_${i}_${j}_hh"),
              try_sum(try_add(
                try_multiply(hiOf(x), loOf(y)),
                try_multiply(hiOf(y), loOf(x)))).as(s"_p_${i}_${j}_hl"),
              try_sum(try_multiply(loOf(x), loOf(y))).as(s"_p_${i}_${j}_ll"))
          })
    def aggsPlain: Seq[org.apache.spark.sql.Column] =
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

    val qTry = prepared.agg(aggsTry.head, aggsTry.tail: _*)
    val qPlain = prepared.agg(aggsPlain.head, aggsPlain.tail: _*)
    println("==== try plan ====")
    qTry.explain("formatted")
    println("==== plain plan ====")
    qPlain.explain("formatted")
    qTry.head(); qPlain.head() // warm
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var bTry = Double.MaxValue
    var bPlain = Double.MaxValue
    (1 to reps).foreach { _ =>
      bTry = math.min(bTry, time(qTry.head()))
      bPlain = math.min(bPlain, time(qPlain.head()))
    }
    println(f"[ab] corr_agg try=$bTry%.3fs plain=$bPlain%.3fs")
    // value equality on this data (no overflow at this scale)
    println(s"[check] equal=${qTry.head() == qPlain.head()}")
    spark.stop()
  }
}
