package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev experiment: the LSH/simhash candidate-pair self-join computes its
  * input pipeline TWICE (AQE broadcasts one side — BroadcastExchange and
  * shuffle Exchange never unify in ReuseExchange). A/B three shapes that
  * compute it once: merge-hinted self-join (shared shuffle exchange) and
  * set-based pair generation (groupBy key → sorted id set → ordered pair
  * explode, no join). Usage: runMain graft.examples.SelfJoinAB [sfDir] [reps]
  */
object SelfJoinAB {
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
    def docs = graft.Tables.parquet(spark, s"$dir/documents.parquet")

    // --- LSH variants ---
    def lshBase(d: DataFrame): DataFrame =
      Dedup.lshCandidatePairs(d, numPerms = 16, rowsPerBand = 4)
    def lshMerge(d: DataFrame): DataFrame = {
      val banded = Dedup.minhashBandSignatures(d, 16, 4)
      val a = banded.select(col("doc_id").as("id_a"), col("band"), col("sig"))
      val b = banded.select(col("doc_id").as("id_b"), col("band"), col("sig"))
      a.join(b.hint("merge"), Seq("band", "sig"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    }
    def lshSet(d: DataFrame): DataFrame = {
      val banded = Dedup.minhashBandSignatures(d, 16, 4)
      val ids = banded.groupBy(col("band"), col("sig"))
        .agg(sort_array(collect_set(col("doc_id"))).as("_ids"))
        .filter(size(col("_ids")) > 1)
      val pairsArr = flatten(transform(col("_ids"), (x, i) =>
        transform(
          slice(col("_ids"), i + lit(2), size(col("_ids")) - i - 1),
          y => struct(x.as("id_a"), y.as("id_b")))))
      ids.select(explode(pairsArr).as("_p"))
        .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"))
        .distinct()
    }

    // --- simhash variants ---
    def shBase(d: DataFrame): DataFrame = Dedup.simhashPairs(d, maxHamming = 2)
    def shSet(d: DataFrame): DataFrame = {
      val maxHamming = 2
      val sig = Dedup.simhash(d)
      val nChunks = maxHamming + 1
      val base = 32 / nChunks
      val extra = 32 % nChunks
      val bounds = (0 until nChunks).scanLeft(0) { (acc, c) =>
        acc + base + (if (c < extra) 1 else 0)
      }
      val chunkCols = (0 until nChunks).map { c =>
        val shift = bounds(c)
        val width = bounds(c + 1) - shift
        val mask = (1L << width) - 1
        struct(
          lit(c).as("ck"),
          (shiftright(col("simhash"), shift).bitwiseAND(lit(mask))).as("cv"))
      }
      val exploded = sig.select(
        col("doc_id"),
        col("simhash"),
        explode(array(chunkCols: _*)).as("_ch"))
      val grouped = exploded.groupBy(col("_ch"))
        .agg(sort_array(collect_set(struct(col("doc_id"), col("simhash")))).as("_m"))
        .filter(size(col("_m")) > 1)
      val pairsArr = flatten(transform(col("_m"), (x, i) =>
        transform(
          slice(col("_m"), i + lit(2), size(col("_m")) - i - 1),
          y => struct(
            x.getField("doc_id").as("id_a"),
            y.getField("doc_id").as("id_b"),
            bit_count(x.getField("simhash").bitwiseXOR(y.getField("simhash")))
              .as("hamming")))))
      grouped.select(explode(pairsArr).as("_p"))
        .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"),
          col("_p.hamming").as("hamming"))
        .filter(col("hamming") <= maxHamming)
        .distinct()
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "lsh.base" -> (() => lshBase(docs)),
      "lsh.merge" -> (() => lshMerge(docs)),
      "lsh.set" -> (() => lshSet(docs)),
      "sh.base" -> (() => shBase(docs)),
      "sh.set" -> (() => shSet(docs)))

    // value check first: identical rows (set equality)
    val lb = lshBase(docs).orderBy("id_a", "id_b").collect().toSeq
    val lm = lshMerge(docs).orderBy("id_a", "id_b").collect().toSeq
    val ls = lshSet(docs).orderBy("id_a", "id_b").collect().toSeq
    println(s"[check] lsh merge==base: ${lb == lm} set==base: ${lb == ls} n=${lb.size}")
    val sb = shBase(docs).orderBy("id_a", "id_b").collect().toSeq
    val ss = shSet(docs).orderBy("id_a", "id_b").collect().toSeq
    println(s"[check] simhash set==base: ${sb == ss} n=${sb.size}")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (_, f) => f().count() } // warm
    val acc = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    (1 to reps).foreach { _ =>
      variants.foreach { case (nm, f) =>
        acc(nm) = math.min(acc(nm), time(f().count()))
      }
    }
    variants.foreach { case (nm, _) => println(f"[ab] $nm%-10s ${acc(nm)}%.3fs") }
    spark.stop()
  }
}
