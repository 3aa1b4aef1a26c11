package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dedup-at-scale soak (the evidence twin of [[MutationScaleDemo]] for
  * the near-dup pipeline): a ~20M-document synthetic corpus with a
  * KNOWN planted near-duplicate rate driven through minhash → banded
  * LSH candidates → exact-Jaccard verification → connected components,
  * printing per-stage wall time, shuffle bytes, and the candidate
  * count against the all-pairs counterfactual.
  *
  * What the numbers must show (committed to PLANS.md):
  *   - candidates scale with the BANDS, not n²: the candidate count
  *     stays within a small multiple of the planted-pair count while
  *     the all-pairs counterfactual is ~10 orders of magnitude larger;
  *   - recall of planted duplicates ≥ the [[Dedup.bandsForJaccard]]
  *     design target the band count was derived from;
  *   - no stage ever materializes an all-pairs shape: shuffle bytes
  *     stay O(corpus · perms), not O(n²).
  *
  * The corpus is deterministic (md5-derived tokens): doc i is ~32
  * tokens from a 2²⁰-token vocabulary; every PLANT_EVERY-th doc gets a
  * twin (id + N) sharing all but one token — shingle Jaccard ≈ 0.9,
  * above the 0.8 design threshold. Run:
  * `sbt "runMain graft.examples.DedupScaleDemo [docs] [sfOut]"`.
  */
object DedupScaleDemo {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(20000000L)
    val plantEvery = 100L
    val threshold = 0.8
    val targetRecall = 0.9
    val rowsPerBand = 4
    val bands = Dedup.bandsForJaccard(targetRecall, threshold, rowsPerBand)
    val numPerms = bands * rowsPerBand

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val meter = new ShuffleMeter(spark)
    def time[A](name: String)(f: => A): A = meter.step(name)(f)

    println(s"[cfg] docs=$nDocs plantEvery=$plantEvery threshold=$threshold " +
      s"targetRecall=$targetRecall -> bands=$bands x $rowsPerBand perms (=$numPerms)")

    // ---- corpus: deterministic tokens; every plantEvery-th doc twins
    val tokens = 32
    def tokenCol(idExpr: String, j: Int, mutate: Boolean): org.apache.spark.sql.Column = {
      // token = md5-bucket of (doc id, position) into a 2^20 vocabulary;
      // the twin replaces position 0's token (one-shingle-window change)
      val pos = if (mutate && j == 0) s"concat('mut', $idExpr)" else s"concat($idExpr, '_', $j)"
      expr(s"concat('t', conv(substring(md5($pos), 1, 5), 16, 10))")
    }
    // base doc i keyed by i; twin k (doc_id = nDocs + k) keys its text
    // by k*plantEvery, so it shares 31/32 tokens with doc k*plantEvery
    def docs(n: Long, docIdExpr: String, textKeyExpr: String, mutate: Boolean): DataFrame =
      spark.range(n).select(
        expr(docIdExpr).cast("long").as("doc_id"),
        concat_ws(" ", (0 until tokens).map(j => tokenCol(textKeyExpr, j, mutate)): _*)
          .as("text"))
    val base = docs(nDocs, "id", "id", mutate = false)
    val twins = docs(
      nDocs / plantEvery, s"id + ${nDocs}L", s"id * ${plantEvery}L", mutate = true)
    val corpusPath = java.nio.file.Files
      .createTempDirectory("graft_dedup_soak").toString + "/docs"
    time("materialize corpus") {
      base.unionByName(twins).write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    val total = corpus.count()
    val planted = nDocs / plantEvery
    println(s"[corpus] $total docs ($planted planted twins)")

    // ---- stage 2: banded signatures (the persistable LSH index form)
    val sigCount = time("band signatures") {
      Dedup.minhashBandSignatures(corpus, numPerms, rowsPerBand).count()
    }
    println(s"[sigs] $sigCount (docs x $bands bands)")

    // ---- stage 3: LSH candidates vs the all-pairs counterfactual
    val candidates = time("lsh candidate pairs") {
      Dedup.lshCandidatePairs(corpus, numPerms, rowsPerBand).count()
    }
    val allPairs = BigDecimal(total) * BigDecimal(total - 1) / 2
    println(f"[candidates] $candidates vs all-pairs ${allPairs.toDouble}%.3e " +
      f"(${candidates / planted.toDouble}%.1fx the planted count)")

    // ---- stage 4: exact-Jaccard verification + planted recall
    val verified = Dedup
      .verifiedNearDupPairs(corpus, threshold, numPerms, rowsPerBand)
      .persist()
    val nVerified = time("verify candidates (jaccard)") { verified.count() }
    val foundPlanted = verified
      .filter(col("id_b") >= nDocs && col("id_a") === (col("id_b") - nDocs) * plantEvery)
      .count()
    val recall = foundPlanted.toDouble / planted
    println(f"[verified] $nVerified pairs; planted recall = $recall%.4f " +
      f"(target >= $targetRecall, bands derived for it)")

    // ---- stage 5: components over the verified pairs
    val clusters = time("connected components") {
      Dedup.connectedComponents(verified).select("cluster_id").distinct().count()
    }
    println(s"[clusters] $clusters distinct near-dup clusters")
    verified.unpersist()

    meter.total("banded signatures + verification sets only")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(corpusPath).getParentFile)
    spark.stop()
  }
}
