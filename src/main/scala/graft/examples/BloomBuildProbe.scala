package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does decontaminateBloom's build-side second go?
  * Times the eval-gram distinct alone, the bloom aggregate head(), and
  * filter-size variants in one warm session.
  * Usage: runMain graft.examples.BloomBuildProbe [sfDir] [reps]
  */
object BloomBuildProbe {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.bridge

    val docs = graft.Tables.parquet(spark, s"$dir/documents.parquet")
      .filter(col("source") === "src19")
    val toks = split(col("text"), " ")
    def grams = docs
      .select(toks.as("_t"))
      .filter(size(col("_t")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(_t) - 2), i -> concat_ws(' ', _t[i-1], _t[i], _t[i+1]))"))
        .as("_gram"))
      .distinct()
    def time(what: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[bloomprobe] $what%-34s $best%.3fs")
    }
    def bloomOf(exp: Long, bits: Long): Array[Byte] = grams
      .select(bridge.column(new BloomFilterAggregate(
        bridge.expression(xxhash64(col("_gram"))),
        Literal(exp), Literal(bits)).toAggregateExpression()).as("_bf"))
      .head().getAs[Array[Byte]](0)

    println(s"[bloomprobe] distinct grams = ${grams.count()}")
    time("grams.count()")(grams.groupBy().count().collect())
    time("bloom 3.5M/64Mbit (default)")(bloomOf(3500000L, 67108864L))
    time("bloom 146k/2.8Mbit (adaptive)")(bloomOf(146000L, 2800000L))
    time("bloom 16k/310kbit")(bloomOf(16384L, 311296L))
    spark.stop()
  }
}
