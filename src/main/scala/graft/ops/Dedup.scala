package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH and SimHash. All hash arithmetic uses the
  * md5-derived portable family in [[Hashing]] so the DuckDB oracle can
  * reproduce results value-for-value.
  *
  * Scale notes (100 TB design):
  *   - exact dedup is one hash-aggregate (map-side combined);
  *   - MinHash/LSH is the scale path for near-dup: shingles → k minhash
  *     values (one partial-aggregated groupBy) → banded signatures →
  *     candidate pairs via an equi-join on (band, signature) — never an
  *     all-pairs comparison. Band width trades recall vs candidates.
  *   - exact Jaccard / SimHash all-pairs are verification/eval tools;
  *     their pairwise stages are bounded by shared-shingle joins and
  *     should be fed LSH candidates (not the full corpus) at scale.
  */
object Dedup {

  /** Exact-duplicate groups: one row per distinct text with the kept
    * (minimum) id and the duplicate count. A single hash aggregation.
    */
  def exactDuplicates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def wordShingles(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(
        col(idCol),
        explode(
          transform(
            sequence(lit(0), size(col("_toks")) - n),
            i => concat_ws(" ", slice(col("_toks"), i + 1, lit(n))))).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-duplicate pairs (ids a < b with
    * J(a,b) >= threshold). Pairwise work is bounded by the
    * shared-shingle join, grouped map-side per (a, b).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = wordShingles(docs, n, idCol, textCol)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("_n"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = a
      .join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("_n").as("_na")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("_n").as("_nb")), Seq("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        (col("_inter").cast("double") / (col("_na") + col("_nb") - col("_inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: one row per (id, perm) with the min hashed
    * shingle under permutation `perm`. k small (16-128); the permutation
    * table is broadcast and the min is partial-aggregated map-side.
    */
  def minhashSignatures(
      docs: DataFrame,
      numPerms: Int,
      shingleWidth: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val p = Hashing.MinHashPrime
    val perms = spark
      .range(numPerms)
      .select(
        col("id").cast("int").as("perm"),
        (lit(1L) + lit(37L) * col("id")).as("_a"),
        ((lit(1000003L) * col("id") + lit(12345L)) % p).as("_b"))
    val hashed = wordShingles(docs, shingleWidth, idCol, textCol)
      .select(col(idCol), (Hashing.md5Long60(col("shingle")) % p).as("_h"))
    hashed
      .join(broadcast(perms))
      .groupBy(col(idCol), col("perm"))
      .agg(min((col("_a") * col("_h") + col("_b")) % p).as("minhash"))
  }

  /** LSH banding: group each doc's minhashes into bands of
    * `rowsPerBand`, concatenate each band into a signature string, and
    * emit candidate pairs (a < b) sharing any (band, signature) — an
    * equi-join, no all-pairs scan.
    */
  def lshCandidatePairs(
      docs: DataFrame,
      numPerms: Int,
      rowsPerBand: Int,
      shingleWidth: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sig = minhashSignatures(docs, numPerms, shingleWidth, idCol, textCol)
      .groupBy(col(idCol), (col("perm") / rowsPerBand).cast("int").as("band"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("perm"), col("minhash")))),
            x => x.getField("minhash").cast("string")),
          ",").as("sig"))
    val a = sig.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = sig.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** 32-bit SimHash per document over tokens (with multiplicity):
    * bit i of the signature is the sign of Σ_tokens (2·bit_i(h(tok))−1).
    * One explode + two partial-aggregated groupBys.
    */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    // 32-row broadcast table of (bit index, 2^i) — pow is exact here and
    // reproducible in the oracle SQL.
    val bits = spark
      .range(32)
      .select(
        col("id").cast("int").as("bit"),
        pow(lit(2.0), col("id")).cast("long").as("_shift"))
    val tokenHashes = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("_tok"))
      .select(col(idCol), Hashing.md5Long32(col("_tok")).as("_h"))
    tokenHashes
      .join(broadcast(bits))
      .groupBy(col(idCol), col("bit"), col("_shift"))
      // integer division, not `/`: double-cast truncation differs between
      // engines (DuckDB rounds on cast), integral div is exact in both
      .agg(sum(expr("((_h div _shift) % 2) * 2 - 1")).as("_s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("_s") > 0, col("_shift")).otherwise(0L)).cast("long").as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance <= maxHamming.
    * All-pairs here (fine for eval corpora); at scale feed LSH buckets
    * or band the simhash bytes first.
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sig = simhash(docs, idCol, textCol)
    val a = sig.select(col(idCol).as("id_a"), col("simhash").as("_sa"))
    val b = sig.select(col(idCol).as("id_b"), col("simhash").as("_sb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("_sa").bitwiseXOR(col("_sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
