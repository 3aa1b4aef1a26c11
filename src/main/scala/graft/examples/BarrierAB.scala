package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B (round 15): fan-out strategy for MULTI-CONSUMER aggregates
  * over a narrow scan — the text_bm25_topk / text_tfidf_top shape where
  * a per-doc aggregate feeds BOTH a corpus-stats aggregate and the
  * scoring probe.
  *
  *   A keyed fan-out (round-14 pattern, shipped): the per-doc aggregate
  *     reuses the scan exchange, so it owns NO exchange and each
  *     consumer re-runs the tokenize+explode+aggregate body.
  *   B round-robin fan-out: the aggregate keeps its OWN exchange, which
  *     both consumers share via AQE stage reuse — tokenize runs once;
  *     costs sortBeforeRepartition + one raw-row shuffle (tiny under
  *     the narrow gate).
  *   C keyed fan-out + widened-key barrier (repartition by key+extra so
  *     EnsureRequirements cannot remove it): tokenize once, one extra
  *     aggregated-row shuffle.
  *
  * Same-JVM, alternating, min over reps; mirrors Bench's session.
  */
object BarrierAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    def docs = spark.read.parquet(s"$dir/documents.parquet")

    // --- bm25 shape: perDoc(dl + k conditional tfs) -> {1-row stats, probe}
    val terms = Seq("hash", "join", "skew", "window", "agg", "stream",
      "vector", "scan", "filter")
    def perDocFrom(src: DataFrame): DataFrame = {
      val tok = src.select(
        col("doc_id").as("_d"), explode(split(col("text"), " ")).as("_t"))
      val aggCols = count(lit(1)).as("_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(col("_t") === t, 1L).otherwise(0L)).as(s"_tfc_$i")
        }
      tok.groupBy(col("_d")).agg(aggCols.head, aggCols.tail: _*)
    }
    def bm25Like(perDoc: DataFrame): DataFrame = {
      val statAggs = Seq(
        count(lit(1)).as("_n_docs"), sum(col("_dl")).as("_sum_dl")) ++
        terms.indices.map(i =>
          sum(when(col(s"_tfc_$i") > 0L, 1L).otherwise(0L)).as(s"_dfc_$i"))
      val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
      perDoc.crossJoin(broadcast(stats))
        .select(terms.indices.map(i =>
          (col(s"_tfc_$i") * col(s"_dfc_$i") + col("_dl") * col("_n_docs"))
            .as(s"_s_$i")): _*)
        .groupBy().sum(terms.indices.map(i => s"_s_$i"): _*)
    }
    val bmA = () => bm25Like(perDocFrom(docs.repartition(par, col("doc_id"))))
    val bmB = () => bm25Like(perDocFrom(docs.repartition(par)))
    val bmC = () => bm25Like(
      perDocFrom(docs.repartition(par, col("doc_id")))
        .repartition(par, col("_d"), col("_dl")))

    // --- tfidf shape: tf(doc, token) -> {dfCounts, probe join + argmax}
    def tfFrom(src: DataFrame): DataFrame = src
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    def tfidfLike(tf: DataFrame): DataFrame = {
      val dfCounts = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfCounts), "token")
        .groupBy(col("doc_id"))
        .agg(min_by(struct(col("token"), col("tf"), col("df")),
          struct((-col("tf") * 1000L / (col("df") + 1L)).as("negs"),
            col("token"))).as("_top"))
        .groupBy().count()
    }
    val tfA = () => tfidfLike(tfFrom(docs.repartition(par, col("doc_id"))))
    val tfB = () => tfidfLike(tfFrom(docs.repartition(par)))
    val tfC = () => tfidfLike(
      tfFrom(docs.repartition(par, col("doc_id")))
        .repartition(par, col("doc_id"), col("token")))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "bm25/A-keyed-dup" -> bmA, "bm25/B-roundrobin" -> bmB,
      "bm25/C-keyed-barrier" -> bmC,
      "tfidf/A-keyed-dup" -> tfA, "tfidf/B-roundrobin" -> tfB,
      "tfidf/C-keyed-barrier" -> tfC)

    // warm
    variants.foreach { case (_, f) => f().collect() }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().collect()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times.getOrElse(name, Nil)
      }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[ab] $name%-22s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    // sanity: values agree across variants
    val va = bmA().collect().head.toSeq
    val vb = bmB().collect().head.toSeq
    val vc = bmC().collect().head.toSeq
    println(s"[agree] bm25 A==B: ${va == vb}  A==C: ${va == vc}")
    spark.stop()
  }
}
