package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Retrieval, Similarity, TextAnalysis}

/** The retrieval family soaked at ~100× bench scale — the evidence twin
  * of [[CrossSpanScaleDemo]] for [[TextAnalysis.bm25TopK]] →
  * [[Retrieval.rrfFuse]] → [[Retrieval.mmrRerankPool]] over an IVF pool
  * (the composition the contract queries wire together, here at 5M
  * documents instead of 5k).
  *
  * Corpus construction (all deterministic, no RNG):
  *   - every PLANT_EVERY-th document contains the query terms
  *     ("alpha"/"beta", tf varying 1-3 by id) amid md5-unique filler;
  *     all other documents are filler-only — so the full BM25 answer
  *     set is known exactly (only planted docs can score > 0);
  *   - embeddings are 8-dim: planted docs sit in the e0 half-space
  *     with a small id-derived e1 component, filler docs in the e1
  *     half-space; the query vector is pure e0 — so the dense top-k
  *     and the 2-centroid IVF pool are also known exactly.
  *
  * What the numbers must show (committed to PLANS.md):
  *   - BM25's ONLY corpus-sized exchange is the per-doc groupBy (dl +
  *     per-term tf in one aggregation): shuffle bytes scale with |docs|
  *     × one skinny row, never with |tokens| — document frequencies
  *     ride the same 1-row stats aggregate, no second pass, no df join;
  *   - the dense/IVF side broadcasts the query row and exchanges only
  *     the WindowGroupLimit-capped candidates (maps × k × |queries|),
  *     never the corpus;
  *   - fusion and MMR are |queries|×k work: sub-second at ANY corpus
  *     size, with every fused/selected doc drawn from the planted set;
  *   - correctness at scale: every bm25/rrf row is a planted doc,
  *     ranked by the known tf structure; the MMR selection ⊆ its pool.
  *
  * Run: `sbt "runMain graft.examples.RetrievalScaleDemo [docs]"`.
  */
object RetrievalScaleDemo {

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(5000000L)
    val plantEvery = 1000L
    val nPlanted = nDocs / plantEvery
    val fillerTokens = 14

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val meter = new ShuffleMeter(spark)
    def time[A](name: String)(f: => A): A = meter.step(name)(f)

    println(s"[cfg] docs=$nDocs plantEvery=$plantEvery planted=$nPlanted " +
      s"filler/doc=$fillerTokens")

    // ---- corpus: filler tokens are md5-unique per (doc, position);
    // planted docs append "alpha beta" × tf, tf = 1 + (doc_id div
    // plantEvery) mod 3 — so BM25 ranks planted docs by tf desc, id asc
    // (equal dl would be needed for a clean tf ordering; dl varies by
    // ±4 tokens here, which the assertions account for by checking SET
    // membership and positivity, not exact order)
    def tok(keyExpr: String): String =
      s"concat('f', conv(substring(md5($keyExpr), 1, 6), 16, 10))"
    val filler = (1 to fillerTokens).map(j => tok(s"concat(id, '_', $j)"))
    val planted = s"id % ${plantEvery}L = 0"
    val tfExpr = s"CAST(1 + (id div ${plantEvery}L) % 3 AS INT)"
    val corpusPath = java.nio.file.Files
      .createTempDirectory("graft_retrieval_soak").toString + "/docs"
    time("materialize corpus") {
      spark.range(nDocs).select(
        col("id").cast("long").as("doc_id"),
        expr(
          s"""concat_ws(' ', ${filler.mkString(", ")},
             |  CASE WHEN $planted
             |       THEN concat_ws(' ', array_repeat('alpha beta', $tfExpr))
             |       ELSE ${tok("concat('x', id)")} END)""".stripMargin)
          .as("text"),
        // 8-dim embedding: planted -> (1, id-derived small e1, 0...);
        // filler -> (0, 1, 0...); the query doc is id 0 (planted, e0)
        expr(
          s"""CASE WHEN $planted
             |  THEN array(CAST(1.0 AS FLOAT),
             |             CAST((id % 97) / 970.0 AS FLOAT),
             |             ${Seq.fill(6)("CAST(0.0 AS FLOAT)").mkString(", ")})
             |  ELSE array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT),
             |             CAST((id % 89) / 890.0 AS FLOAT),
             |             ${Seq.fill(5)("CAST(0.0 AS FLOAT)").mkString(", ")})
             |END""".stripMargin).as("embedding"))
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    println(s"[corpus] ${corpus.count()} docs")

    // ---- lexical: one-pass BM25, 1 query, top-20
    val k = 20
    val lex = time("bm25TopK (one pass)") {
      val df = TextAnalysis
        .bm25TopK(corpus, Seq((1, Seq("alpha", "beta"))), k = k)
        .persist()
      df.count() // materialize INSIDE the timed step (persist is lazy)
      df
    }
    val lexRows = lex.collect()
    val lexPlanted = lexRows.count(_.getAs[Long]("doc_id") % plantEvery == 0)
    println(s"[bm25] ${lexRows.length} rows, planted=$lexPlanted " +
      s"(every positive score must come from a planted doc)")
    // tf structure: rank-1 doc must carry the max tf among planted (3)
    val top = lexRows.minBy(_.getAs[Long]("rank"))
    println(s"[bm25] top doc=${top.getAs[Long]("doc_id")} " +
      s"score_u=${top.getAs[Long]("score_u")}")

    // ---- dense: IVF top-20 against seeded 2-centroid quantizer;
    // query = doc 0 (pure e0). The corpus never shuffles: argmax list
    // assignment is map-side, the query row broadcasts, and the rank
    // exchange carries only WindowGroupLimit-capped candidates.
    val cents = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val emb = corpus.select(col("doc_id").as("vec_id"), col("embedding"))
    val dense = time("ivfTopKWith (dense top-20)") {
      val df = Similarity
        .ivfTopKWith(emb, cents, Seq(0L), k = k, nProbe = 1)
        .persist()
      df.count()
      df
    }
    val denseRows = dense.collect()
    val densePlanted = denseRows.count(_.getAs[Long]("neighbor_id") % plantEvery == 0)
    println(s"[dense] ${denseRows.length} rows, planted=$densePlanted " +
      "(nProbe=1 probes only the e0 list -> planted docs only)")

    // ---- fusion: |queries| × k work regardless of corpus size
    val fused = time("rrfFuse") {
      Retrieval.rrfFuse(
        lex.select(lit(0L).as("query_id"), col("doc_id"), col("rank")),
        dense.select(col("query_id").cast("long").as("query_id"),
          col("neighbor_id"), col("rank")),
        k = 10, idColB = "neighbor_id").collect()
    }
    val fusedPlanted = fused.count(_.getAs[Long]("doc_id") % plantEvery == 0)
    println(s"[rrf] ${fused.length} rows, planted=$fusedPlanted")

    // ---- MMR diversity over the IVF pool: greedy step sees ONLY the
    // pool (|pool| vectors per query), never the corpus
    val mmr = time("mmrRerankPool (k=8)") {
      Retrieval
        .mmrRerankPool(emb, dense, k = 8, lambdaPermille = 700)
        .collect()
    }
    val poolIds = denseRows.map(_.getAs[Long]("neighbor_id")).toSet
    val mmrInPool = mmr.count(r => poolIds.contains(r.getAs[Long]("doc_id")))
    println(s"[mmr] ${mmr.length} rows, inPool=$mmrInPool of ${mmr.length}")

    // ---- verdicts
    val ok =
      lexRows.length == k && lexPlanted == k &&
        denseRows.length == k && densePlanted == k &&
        fused.length == 10 && fusedPlanted == 10 &&
        mmr.length == 8 && mmrInPool == 8
    println(s"[verdict] ${if (ok) "ALL CHECKS GREEN" else "CHECK FAILED"}")

    meter.total("BM25's per-doc groupBy is the only corpus-sized exchange; " +
      "dense/fusion/MMR exchange only capped candidate sets")
    lex.unpersist(); dense.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(corpusPath).getParentFile)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
