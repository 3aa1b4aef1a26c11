package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, TextAnalysis}

/** End-to-end training-data curation over the documents table — the
  * composition story: every stage is one of the library's oracle-tested
  * operators, chained as lazy DataFrame transforms (one pipeline, no
  * intermediate materialization except the dedup cluster map).
  *
  *   1. quality gate    — stopword/diversity score + repetition fence
  *   2. decontamination — drop docs sharing word 4-grams with the
  *                        held-out eval slice
  *   3. near-dup dedup  — MinHash/LSH pairs → components → keep min id
  *   4. split           — deterministic hash buckets (train/valid/test)
  *   5. pack            — fixed-token-budget sequences per source shard
  *
  * Run: sbt 'runMain graft.examples.CurationDemo [sfDir]'
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()

    // 1. quality gate: keep docs with a healthy score and no dominant
    // repeated bigram (Gopher-style fences)
    val quality = TextAnalysis.qualityScore(docs)
      .filter(col("quality_score") >= 0.5)
      .select("doc_id")
    // the repetition fence REMOVES offenders — docs too short to have a
    // bigram verdict pass through (anti-join, not an inner join)
    val highRepetition = TextAnalysis.bigramRepetition(docs)
      .filter(col("top_bigram_frac") > 0.2)
      .select("doc_id")
    val gated = docs
      .join(quality, "doc_id")
      .join(highRepetition, Seq("doc_id"), "left_anti")
    val afterGate = gated.count()

    // 2. decontamination: the src19 slice stands in for a held-out
    // eval benchmark; any train doc sharing a word 4-gram with it goes
    val cleaned = TextAnalysis
      .decontaminate(
        gated.filter(col("source") =!= "src19"),
        docs.filter(col("source") === "src19"),
        n = 4)
      .filter(col("keep"))
      .drop("n_hit_grams", "keep")
    val afterDecontam = cleaned.count()

    // 3. near-dup removal: cluster LSH candidates, keep each cluster's
    // min id (singletons have no pair and pass through)
    val clusters = Dedup.connectedComponents(
      Dedup.lshCandidatePairs(cleaned, numPerms = 16, rowsPerBand = 4))
    val dropIds = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val deduped = cleaned.join(dropIds, Seq("doc_id"), "left_anti")
    val afterDedup = deduped.count()

    // 4 + 5. deterministic split, then pack each split's sources
    val split = Sampling.hashSplit(
      deduped, Seq("train" -> 90, "valid" -> 5, "test" -> 5))
    val packed = TextAnalysis.packSequences(
      split.filter(col("split") === "train"), budgetTokens = 512L)
    val trainPacks = packed.agg(countDistinct(col("source"), col("pack_id")))
      .head().getLong(0)

    println(s"[curation] total=$total afterQualityGate=$afterGate " +
      s"afterDecontam=$afterDecontam afterDedup=$afterDedup " +
      s"trainPacks=$trainPacks")
    spark.stop()
  }
}
