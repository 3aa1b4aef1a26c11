package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distinct word n-gram shingles per document: (id, shingle).
    * Deliberately lambda-free (explode + element_at, no higher-order
    * functions): HOF lambdas get fresh expression ids on every
    * invocation, which defeats plan/codegen caching and degrades
    * long-lived sessions.
    */
  def wordShingles(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    shingleOccurrences(docs, n, idCol, textCol).distinct()

  /** Fan a narrow scan out to the session's parallelism before a
    * compute-heavy per-row pipeline (tokenize + shingle explode +
    * hash): a small corpus arrives as a handful of parquet splits and
    * would otherwise run the whole pipeline on as many cores. The
    * narrow-scan condition bounds the repartition's shuffle at
    * parallelism × maxPartitionBytes; a wide scan (the 100 TB shape,
    * thousands of splits) never triggers it. Routing-only: the fanned
    * frame holds exactly the same rows.
    *
    * Apply ONLY where the scan pipeline's compute dominates and the
    * next operator is not an immediate aggregation: measured on the
    * shingle→groupBy paths (ngramJaccardPairs), fanning out made them
    * SLOWER (1.36 → 1.70 s at bench) — with one input task the
    * map-side combine collapses duplicate keys in one hash table,
    * while 32 tasks push 32 partial states per key through the
    * shuffle. crossDupSpans (scan feeding a count-only aggregate and a
    * tiny self-join) measured 3.6 → 1.8 s.
    *
    * The narrow-scan test applies ONLY to plans whose every leaf is a
    * file-backed relation, and reads the OPTIMIZED-plan size statistic
    * (for a parquet relation, the summed file sizes already gathered
    * at read time) against parallelism × maxPartitionBytes — a pure
    * driver-side arithmetic check. The previous probe
    * (`df.rdd.getNumPartitions`) physical-planned the whole upstream
    * query once just to count splits, then the real execution planned
    * it a second time, and under AQE the pre-execution count could
    * disagree with the runtime partitioning anyway. Non-file leaves
    * (LocalRelation, a cached InMemoryRelation, streaming sources) are
    * left untouched: their size statistic is small-and-accurate, so
    * the estimate would repartition inputs that are ALREADY
    * parallelized (a local scan fans out at conversion; a cached frame
    * keeps its cached partitioning) — routing-only, rows unchanged
    * either way.
    */
  /** The shared narrowness gate of the fan-out helpers (and of
    * [[graft.ops.TextAnalysis.crossDupSpans]]'s single-pass strategy
    * pick): true iff every leaf is file-backed AND the whole input is
    * estimated under both `par` splits and `maxSplitsOfBytes` splits'
    * worth of bytes — i.e. the scan cannot feed the session's
    * parallelism on its own. Routing-only by contract: callers may only
    * use it to choose between result-identical physical strategies.
    */
  private[graft] def isNarrowScan(
      df: DataFrame, maxSplitsOfBytes: Int): Boolean = {
    import org.apache.spark.sql.graftbridge.bridge
    require(maxSplitsOfBytes >= 1,
      s"maxSplitsOfBytes must be >= 1, got $maxSplitsOfBytes")
    val plan = bridge.optimizedPlan(df)
    val leaves = plan.collectLeaves()
    val fileBacked = leaves.nonEmpty && leaves.forall(bridge.isFileBackedLeaf)
    if (!fileBacked) return false
    val par = df.sparkSession.sparkContext.defaultParallelism
    val maxPartitionBytes =
      math.max(1L, bridge.filesMaxPartitionBytes(df.sparkSession))
    val sizeBytes = plan.stats.sizeInBytes
    val estSplits = (sizeBytes + (maxPartitionBytes - 1)) / maxPartitionBytes
    estSplits < BigInt(par) &&
      sizeBytes <= BigInt(maxPartitionBytes) * maxSplitsOfBytes
  }

  private[graft] def fanOutNarrowScan(
      df: DataFrame, maxSplitsOfBytes: Int = 1): DataFrame = {
    // two-sided narrowness: fewer estimated splits than cores AND at
    // most `maxSplitsOfBytes` splits' worth of bytes. The default (1)
    // is the literal "small corpus in a single parquet split" shape
    // the fan-out exists for (and where it was measured to win); a
    // mid-size scan (say 250 MB in 2 splits on 32 cores) passes the
    // split test, but the repartition shuffles hundreds of MBs to buy
    // task-count the per-row compute rarely justifies — measured
    // 182 MB of pure shuffle for no wall win on a 1M×64-dim ANN prune
    // (AnnRpScaleDemo). A caller whose per-row pipeline is MUCH
    // heavier than a shuffle byte (cross-span shingling: measured
    // 3.6 → 1.8 s) may raise the byte bound to keep the win on
    // mid-size corpora.
    if (isNarrowScan(df, maxSplitsOfBytes))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
  }

  /** Hash-keyed sibling of [[fanOutNarrowScan]] for pipelines whose next
    * aggregation groups by `keyCols`: repartition the narrow scan BY THE
    * GROUP KEY, so the downstream groupBy reuses the exchange (no second
    * shuffle) and the per-row compute between scan and aggregate runs at
    * session parallelism instead of in the scan's single task.
    *
    * Why not the round-robin form: a keyless `repartition(n)` first pays
    * a local sort of its input (sortBeforeRepartition, needed for
    * deterministic retries — guide §2.5), and its exchange is EXTRA (the
    * groupBy still shuffles by key afterwards). Hash-partitioning by the
    * key needs no sort and replaces the aggregation's own exchange:
    * measured round-14 on the minhash family, round-robin fan-out LOSES
    * (lsh 0.46→0.63 s) while the keyed form wins (0.46→0.41 lsh,
    * 0.50→0.45 jaccard-fine, 0.55→0.46 simhash) — shuffling raw text by
    * id moves <1 MB at the narrow-scan sizes this gates on.
    *
    * Same scale-safety as [[fanOutNarrowScan]]: fires only when every
    * leaf is file-backed and the whole input is under
    * `maxSplitsOfBytes` splits' worth of bytes — a wide scan (the 100 TB
    * shape) keeps its partial-aggregate-then-exchange plan, which
    * shuffles per-key partial states instead of raw rows. Routing-only:
    * the fanned frame holds exactly the same rows, and every aggregate
    * downstream here is commutative (min / sum / count / collect_set
    * whose consumers are order-invariant).
    */
  private[graft] def fanOutNarrowScanBy(
      df: DataFrame, keyCols: Seq[String], maxSplitsOfBytes: Int = 1): DataFrame = {
    require(keyCols.nonEmpty, "fanOutNarrowScanBy needs at least one key column")
    if (isNarrowScan(df, maxSplitsOfBytes))
      df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, keyCols.map(col): _*)
    else df
  }

  /** The SHARED tokenization + windowing core of the whole
    * Jaccard/MinHash family: (id, _toks array, _i 0-based window
    * start), one row per n-token window. [[shingleOccurrences]] (the
    * candidate/minhash side) and [[shingleHashSets]] (the verification
    * side) both derive from THIS frame, so a tokenization change here
    * applies to candidate generation and exact verification at once —
    * they must never desynchronize, or LSH proposes pairs the verifier
    * shingles differently.
    */
  private def tokenWindows(
      docs: DataFrame,
      n: Int,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(
        col(idCol),
        col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - n)).as("_i"))
  }

  private def shingleOccurrences(
      docs: DataFrame,
      n: Int,
      idCol: String,
      textCol: String): DataFrame =
    tokenWindows(docs, n, idCol, textCol)
      .select(
        col(idCol),
        concat_ws(
          " ",
          (1 to n).map(j => element_at(col("_toks"), col("_i") + j)): _*)
          .as("shingle"))

  /** Per-doc distinct shingle-hash sets: (id, _set array<long>, _n size).
    * Shingles are hashed with codegen'd xxhash64 over the token SLICE
    * directly ([[TextAnalysis.crossDupSpans]]'s choice): ~8 bytes per
    * key downstream instead of a 20+-byte string, no concat_ws
    * allocation, no cryptographic hash — these hashes never surface in
    * any output (only intersection counts and set sizes do; every
    * oracle groups raw shingle strings), so the portable md5 family is
    * not needed here, and token tuples have identical equality classes
    * to their space-joined strings (tokens are space-free by
    * construction). Collision odds 2^-64 per pair. One aggregation
    * dedups and sizes in a single shuffle. NOTE: a persisted
    * [[NearDupIndex]] embeds these hashes — rebuild indexes when this
    * function's hash family changes.
    */
  private def shingleHashSets(
      docs: DataFrame,
      n: Int,
      idCol: String,
      textCol: String): DataFrame =
    // KEYED narrow-scan fan-out (round-14): the round-12 verdict against
    // fan-out here was measured on the ROUND-ROBIN form, whose local
    // sort + extra exchange cost 0.46 → 0.65 s; hash-repartitioning by
    // the id makes the groupBy below REUSE the exchange (one shuffle
    // either way, raw-text-sized only on narrow scans) and parallelizes
    // the tokenize+hash body — measured 0.50 → 0.45 s on the
    // jaccard-fine path in the same-JVM A/B (FanoutAB).
    // slice is 1-based: window start _i (0-based) + 1.
    tokenWindows(fanOutNarrowScanBy(docs, Seq(idCol)), n, idCol, textCol)
      .select(
        col(idCol),
        xxhash64(slice(col("_toks"), col("_i") + 1, lit(n))).as("_sh"))
      .groupBy(col(idCol))
      .agg(collect_set(col("_sh")).as("_set"))
      .select(col(idCol), col("_set"), size(col("_set")).as("_n"))

  /** Exact n-gram Jaccard near-duplicate pairs (ids a < b with
    * J(a,b) >= threshold). Pairwise work is bounded by the
    * shared-shingle join, grouped map-side per (a, b).
    *
    * `carrySizes` picks the physical strategy for attaching set sizes
    * (values identical either way):
    *   - `true` (default, fine granularity): sizes ride along through
    *     the shared-shingle join and come out of the pair aggregate as
    *     `first()` — 3 shuffles total, no extra joins; the +16 bytes
    *     per joined row is noise when ids are documents.
    *   - `false` (coarse granularity — [[NorthStar]] `source_overlap`,
    *     tens of groups with heavy shared-shingle fan-out): no pair
    *     JOIN at all — one full-cardinality shuffle (shingle hash →
    *     sorted distinct id set), then inclusive ordered pairs are
    *     array-generated per set and partial-aggregated in the same
    *     stage; the diagonal rows of that one aggregate ARE the per-id
    *     sizes, attached back by a ≤|groups|-row broadcast. Strategy
    *     agreement is asserted in OpsSpec.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      carrySizes: Boolean = true): DataFrame = {
    // Join on the 64-bit shingle hash, not the shingle string: ~8 bytes
    // per key through the shuffle instead of ~20+, and cheap equality.
    // Hash collisions are immaterial at 2^-64 per pair, and the hash
    // never surfaces (the oracle joins raw shingle strings — only
    // intersection counts and sizes cross the compare).
    // One aggregation builds each doc's distinct-shingle set (and its
    // size) — a single shuffle replacing separate distinct + size
    // passes; the re-explode is shuffle-free, and both join inputs are
    // the same subplan so its shuffle is planned once and reused.
    val jaccard =
      (col("_inter").cast("double") / (col("_na") + col("_nb") - col("_inter")))
        .as("jaccard")
    val pairs =
      if (carrySizes) {
        val sets = shingleHashSets(docs, n, idCol, textCol)
        val sh = sets.select(col(idCol), explode(col("_set")).as("_sh"), col("_n"))
        sh.select(col(idCol).as("id_a"), col("_sh"), col("_n").as("_na"))
          .join(sh.select(col(idCol).as("id_b"), col("_sh"), col("_n").as("_nb")), Seq("_sh"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(
            count(lit(1)).as("_inter"),
            first(col("_na")).as("_na"),
            first(col("_nb")).as("_nb"))
      } else {
        // Coarse path (group granularity), ONE lazy plan with no driver
        // round-trips. The shingle hash never surfaces in the output
        // (the oracle joins raw strings), so it needs no portable-hash
        // family: xxhash64 over the token n-gram runs inside
        // whole-stage codegen with no md5 hex round-trip and no
        // concat_ws allocation (tokens are space-free by construction,
        // so the token tuple and the concatenated shingle string have
        // identical equality classes).
        //
        // Each SHINGLE aggregates its (≤|groups|) sorted distinct id
        // set (collect_set drops null ids and dedups (id, shingle)
        // repeats map-side — no separate distinct pass); INCLUSIVE
        // ordered pairs — (x, y) for every x <= y, diagonal included —
        // are generated from each set with array ops and
        // partial-aggregated IN THE SAME STAGE (the per-shingle k²
        // fan-out collapses map-side to ≤|groups|²/2 rows per task and
        // never crosses a shuffle). The DIAGONAL rows (x, x) are the
        // per-id set sizes — each shingle contributes exactly one per
        // member — so intersections AND sizes come out of ONE pair
        // aggregation; the former separate sizes pass re-exploded every
        // per-shingle id set through a second full-cardinality shuffle
        // to compute numbers the diagonal already carries. Sizes then
        // attach by broadcast (≤|groups| rows). An intermediate
        // "compress identical membership patterns first" stage was
        // measured SLOWER here: it adds a full-cardinality shuffle of
        // the id arrays to save fan-out that map-side combine already
        // absorbs.
        val toks = split(col(textCol), " ")
        // round-robin narrow-scan fan-out (crossDupSpans' pattern): the
        // tokenize+explode+hash+partial-collect pipeline below otherwise
        // runs in the scan's ONE task on a single-split corpus (measured
        // 0.34 s of a ~1.0 s query in one task at sf0.1). The aggregate
        // key (_sh) does not exist at scan time, so the keyed fan-out is
        // unavailable; the round-robin sort cost is raw narrow doc rows
        // (tiny under the byte gate), and a wide scan (the 100 TB shape)
        // is untouched.
        val bySh = fanOutNarrowScan(
            docs.filter(col(idCol).isNotNull), maxSplitsOfBytes = 8)
          .select(col(idCol), toks.as("_toks"))
          .filter(size(col("_toks")) >= n)
          .select(
            col(idCol),
            col("_toks"),
            explode(sequence(lit(0), size(col("_toks")) - n)).as("_i"))
          .select(
            col(idCol),
            xxhash64(
              (1 to n).map(j => element_at(col("_toks"), col("_i") + j)): _*)
              .as("_sh"))
          .groupBy(col("_sh"))
          .agg(sort_array(collect_set(col(idCol))).as("_ids"))
        // slice from 1-based position i+1 = the element x itself: the
        // inner transform yields (x, x), (x, next), ... — diagonal + pairs
        val pairsArr = flatten(transform(col("_ids"), (x, i) =>
          transform(
            slice(col("_ids"), i + lit(1), size(col("_ids")) - i),
            y => struct(x.as("id_a"), y.as("id_b")))))
        val counts = bySh
          .select(explode(pairsArr).as("_p"))
          .select(col("_p.id_a"), col("_p.id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("_inter"))
        // Sizes attach by two WINDOWS over the tiny pair stream, not by
        // broadcast-joining back two more copies of the whole pipeline:
        // each side's size is the DIAGONAL row of its own partition
        // ((a, a) sorts into both partitionBy(id_a)=a and
        // partitionBy(id_b)=a — inclusive pair generation guarantees it
        // exists for every id that reaches any pair), and the windowed
        // stream is ≤ |groups|²/2 rows by construction. The former
        // self-join-on-broadcast form planned the shingle pipeline
        // THREE times (probe + two size sides) — exchange reuse
        // deduplicated the shuffles but each consumer still re-ran the
        // final aggregate + pair explosion (measured: two ~0.2-0.4 s
        // 32-task stages where one suffices at sf0.1).
        import org.apache.spark.sql.expressions.Window
        val diag = when(col("id_a") === col("id_b"), col("_inter"))
        counts
          .withColumn("_na", max(diag).over(Window.partitionBy(col("id_a"))))
          .withColumn("_nb", max(diag).over(Window.partitionBy(col("id_b"))))
          .filter(col("id_a") < col("id_b"))
      }
    pairs
      .select(col("id_a"), col("id_b"), jaccard)
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
    val p = Hashing.MinHashPrime
    // Straight from shingle occurrences: min under any permutation is
    // invariant to duplicate shingles, so no per-doc distinct pass (and
    // its extra shuffle + collect_set buffers) is needed — duplicates
    // just lose the min() race map-side. Keyed narrow-scan fan-out: the
    // groupBy below reuses the id-hash exchange, so a single-split
    // corpus runs the shingle+md5 body at session parallelism (see
    // [[fanOutNarrowScanBy]]; measured on the banded twin).
    val hashed = shingleOccurrences(
      fanOutNarrowScanBy(docs, Seq(idCol)), shingleWidth, idCol, textCol)
      .select(col(idCol), (Hashing.md5Long60(col("shingle")) % p).as("_h"))
    val minAggs = (0 until numPerms).map { i =>
      min((lit(Hashing.permA(i)) * col("_h") + lit(Hashing.permB(i))) % p)
        .as(s"_mh$i")
    }
    // wide aggregation (one partial-combined shuffle), unpivoted back to
    // the documented long (id, perm, minhash) shape without a join
    val wide = hashed.groupBy(col(idCol)).agg(minAggs.head, minAggs.tail: _*)
    val permStructs = (0 until numPerms).map { i =>
      struct(lit(i).as("perm"), col(s"_mh$i").as("minhash"))
    }
    wide
      .select(col(idCol), explode(array(permStructs: _*)).as("_pm"))
      .select(col(idCol), col("_pm.perm").as("perm"), col("_pm.minhash").as("minhash"))
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
      textCol: String = "text"): DataFrame =
    lshCandidatePairsRaw(docs, numPerms, rowsPerBand, shingleWidth, idCol, textCol)
      .distinct()

  /** [[lshCandidatePairs]] WITHOUT the final distinct: a pair sharing
    * several bands appears once per shared band. For consumers that
    * re-aggregate by pair anyway ([[connectedComponents]]' symmetric
    * distinct, a per-pair groupBy), the extra exchange the distinct
    * costs buys nothing — map-side combine absorbs the ≤numBands
    * duplicates in the consumer's own aggregation.
    */
  private[graft] def lshCandidatePairsRaw(
      docs: DataFrame,
      numPerms: Int,
      rowsPerBand: Int,
      shingleWidth: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val banded = minhashBandSignatures(docs, numPerms, rowsPerBand, shingleWidth, idCol, textCol)
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Banded MinHash signatures: one row per (id, band, sig) — the
    * persistable LSH index form. In a production pipeline the corpus's
    * signatures are computed once at ingest and STORED (partitioned by
    * band); incremental dedup then hashes only the incoming batch.
    */
  def minhashBandSignatures(
      docs: DataFrame,
      numPerms: Int,
      rowsPerBand: Int,
      shingleWidth: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    if (rowsPerBand < 1 || numPerms % rowsPerBand != 0)
      throw new graft.store.FeatureValidationError(
        s"rowsPerBand ($rowsPerBand) must be >= 1 and divide numPerms ($numPerms)")
    val p = Hashing.MinHashPrime
    // Wide form: all k minhashes as k min-aggregates in ONE partial-
    // aggregated shuffle (no permutation join, no collect_list sort,
    // and no per-doc distinct pass — min is duplicate-invariant) — the
    // shape that holds up at corpus scale. Keyed narrow-scan fan-out:
    // measured 0.46 → 0.41 s on the LSH candidate path (FanoutAB); the
    // groupBy(id) reuses the exchange, so no extra shuffle.
    val hashed = shingleOccurrences(
      fanOutNarrowScanBy(docs, Seq(idCol)), shingleWidth, idCol, textCol)
      .select(col(idCol), (Hashing.md5Long60(col("shingle")) % p).as("_h"))
    val minAggs = (0 until numPerms).map { i =>
      min((lit(Hashing.permA(i)) * col("_h") + lit(Hashing.permB(i))) % p)
        .as(s"_mh$i")
    }
    val sigWide = hashed.groupBy(col(idCol)).agg(minAggs.head, minAggs.tail: _*)
    val numBands = numPerms / rowsPerBand
    val bandSigs = (0 until numBands).map { b =>
      concat_ws(
        ",",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"_mh$i").cast("string")): _*)
    }
    sigWide.select(
      col(idCol),
      posexplode(array(bandSigs: _*)).as(Seq("band", "sig")))
  }

  /** RECALL-TARGETED MinHash band count — the Jaccard twin of
    * [[graft.ops.Similarity.bandsFor]]: the fewest bands b such that a
    * pair at Jaccard `threshold` survives banding with probability ≥
    * `recall` under the standard MinHash s-curve — per-permutation
    * match probability s, band match s^r, survival 1 − (1 − s^r)^b:
    *
    *   b = ⌈ ln(1 − recall) / ln(1 − s^r) ⌉
    *
    * `numPerms` to pass to the banding entry points is then
    * b · rowsPerBand. More-similar pairs survive with strictly higher
    * probability, so the target is a floor over the reported range.
    * Clamped to [1, 256] — past that, lower `rowsPerBand` instead
    * (each unit multiplies the band-match probability by s). Measured
    * recall ≥ target is asserted on a seeded corpus in OpsSpec.
    */
  def bandsForJaccard(
      recall: Double,
      threshold: Double,
      rowsPerBand: Int = 4): Int = {
    require(recall > 0.0 && recall < 1.0, s"recall must be in (0,1), got $recall")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    require(rowsPerBand > 0, s"rowsPerBand must be positive")
    val pBand = math.pow(threshold, rowsPerBand.toDouble)
    val b = math.ceil(math.log1p(-recall) / math.log1p(-pBand))
    math.max(1, math.min(256.0, b).toInt)
  }

  /** Incremental near-dup detection — the daily-ingest production
    * shape: verify each INCOMING document against the EXISTING corpus
    * without ever self-joining the corpus. Candidates come from an
    * equi-join of the batch's band signatures against the corpus's
    * (at scale the corpus side is the stored [[minhashBandSignatures]]
    * index, partitioned by band — only matching bands are read, and
    * the work per day is O(batch), not O(corpus)); exact shingle
    * Jaccard is computed on candidates only. Output: one row per
    * (new_id, corpus_id) pair at or above `threshold`.
    */
  def incrementalNearDupPairs(
      incoming: DataFrame,
      corpus: DataFrame,
      threshold: Double,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    incrementalNearDupPairs(
      incoming,
      buildNearDupIndex(corpus, numPerms, rowsPerBand, n, idCol, textCol),
      threshold, numPerms, rowsPerBand, n, idCol, textCol)

  /** The corpus side of incremental dedup, as a value a pipeline builds
    * ONCE (and persists/caches): banded signatures for candidate
    * generation plus shingle-hash sets for exact verification. Both
    * components are plain DataFrames — write them partitioned by band /
    * bucketed by id and every future batch reads only what it probes.
    */
  final case class NearDupIndex(signatures: DataFrame, shingleSets: DataFrame)

  def buildNearDupIndex(
      corpus: DataFrame,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): NearDupIndex =
    NearDupIndex(
      minhashBandSignatures(corpus, numPerms, rowsPerBand, n, idCol, textCol)
        .select(col(idCol).as("corpus_id"), col("band"), col("sig")),
      shingleHashSets(corpus, n, idCol, textCol)
        .select(col(idCol).as("corpus_id"), col("_set").as("_sb"),
          col("_n").as("_nb"), lit(true).as(ShingleHashFamilyMarker)))

  /** Hash-family stamp carried as a COLUMN NAME in
    * [[NearDupIndex.shingleSets]]: a persisted index's verification
    * sets only compare equal against batches hashed by the same
    * family, and a silent family change would zero every intersection
    * (all near-dup pairs dropped, no error). Encoding the family in
    * the schema makes the mismatch detectable from the frame alone —
    * a pure driver-side check, no data read. Bump the suffix whenever
    * [[shingleHashSets]]'s hash changes.
    */
  private[graft] val ShingleHashFamilyMarker = "_hf_xxh64slice_v1"

  /** [[incrementalNearDupPairs]] against a prebuilt corpus index — the
    * form a daily/streaming pipeline actually runs: only the incoming
    * batch is shingled and hashed here.
    */
  def incrementalNearDupPairs(
      incoming: DataFrame,
      index: NearDupIndex,
      threshold: Double,
      numPerms: Int,
      rowsPerBand: Int,
      n: Int,
      idCol: String,
      textCol: String): DataFrame = {
    require(
      index.shingleSets.columns.contains(ShingleHashFamilyMarker),
      s"NearDupIndex.shingleSets lacks the '$ShingleHashFamilyMarker' " +
        "hash-family marker: it was built by a different (older) shingle " +
        "hash family, and verifying this batch against it would silently " +
        "zero every intersection. Rebuild the index with buildNearDupIndex.")
    val sigNew = minhashBandSignatures(incoming, numPerms, rowsPerBand, n, idCol, textCol)
      .select(col(idCol).as("new_id"), col("band"), col("sig"))
    val cands = sigNew.join(index.signatures, Seq("band", "sig"))
      .select("new_id", "corpus_id")
      .distinct()
    val setsNew = shingleHashSets(incoming, n, idCol, textCol)
      .select(col(idCol).as("new_id"), col("_set").as("_sa"), col("_n").as("_na"))
    cands
      .join(setsNew, "new_id")
      .join(index.shingleSets.drop(ShingleHashFamilyMarker), "corpus_id")
      .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))))
      .select(
        col("new_id"),
        col("corpus_id"),
        (col("_inter").cast("double") /
          (col("_na") + col("_nb") - col("_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash per document over tokens (with multiplicity):
    * bit i of the signature is the sign of Σ_tokens (2·bit_i(h(tok))−1).
    * One explode + two partial-aggregated groupBys.
    */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // keyed narrow-scan fan-out: the sign-sum groupBy(id) below reuses
    // the exchange; measured 0.55 → 0.46 s on simhashPairs (FanoutAB)
    val tokenHashes = fanOutNarrowScanBy(docs, Seq(idCol))
      .select(col(idCol), explode(split(col(textCol), " ")).as("_tok"))
      .select(col(idCol), Hashing.md5Long32(col("_tok")).as("_h"))
    // All 32 per-bit sign sums as wide aggregates in ONE partial-
    // aggregated shuffle (no 32× row blowup, no bit-table join).
    // Integer `div`, not `/`: double-cast truncation differs between
    // engines (DuckDB rounds on cast), integral div is exact in both.
    val signAggs = (0 until 32).map { i =>
      sum(expr(s"((_h div ${1L << i}) % 2) * 2 - 1")).as(s"_s$i")
    }
    val packed = (0 until 32)
      .map(i => when(col(s"_s$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    tokenHashes
      .groupBy(col(idCol))
      .agg(signAggs.head, signAggs.tail: _*)
      .select(col(idCol), packed.cast("long").as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance <= maxHamming.
    *
    * Pigeonhole banding instead of all-pairs: the 32 signature bits
    * split into `maxHamming + 1` chunks, and two signatures within the
    * Hamming budget MUST agree exactly on at least one chunk (at most
    * `maxHamming` chunks can contain a differing bit) — so candidates
    * come from an equi-join on (chunk index, chunk bits) and only
    * candidates pay the exact `bit_count(xor)` check. Recall is exact
    * (no false negatives by the pigeonhole argument), and the O(n²)
    * theta-join this replaces never forms: shuffle volume is
    * |signatures| × chunks plus the (sparse) candidate pairs.
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    simhashPairsRaw(docs, maxHamming, idCol, textCol)
      // a pair can agree on several chunks — one row per pair
      .distinct()

  /** [[simhashPairs]] WITHOUT the final distinct — a pair agreeing on
    * several chunks appears once per agreeing chunk. For consumers that
    * re-aggregate by pair ([[graft.NorthStar]] method-overlap), the
    * distinct's exchange is pure overhead.
    */
  private[graft] def simhashPairsRaw(
      docs: DataFrame,
      maxHamming: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"bad maxHamming $maxHamming")
    val sig = simhash(docs, idCol, textCol)
    val nChunks = maxHamming + 1
    val base = 32 / nChunks
    val extra = 32 % nChunks // first `extra` chunks get one more bit
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
      col(idCol),
      col("simhash"),
      explode(array(chunkCols: _*)).as("_ch"))
    val a = exploded.select(
      col(idCol).as("id_a"), col("simhash").as("_sa"), col("_ch"))
    val b = exploded.select(
      col(idCol).as("id_b"), col("simhash").as("_sb"), col("_ch"))
    a.join(b, Seq("_ch"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("_sa").bitwiseXOR(col("_sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Two-stage near-dup detection — the production shape at corpus
    * scale: LSH banding proposes candidates (cheap, high recall, some
    * false positives), then EXACT shingle Jaccard is computed on the
    * candidates ONLY and thresholded. All-pairs exact Jaccard touches
    * O(n²) pairs; this touches O(|candidates|): the shingle sets join
    * onto the (small) candidate list and the intersection is a per-row
    * array op, no second pairwise shuffle.
    */
  def verifiedNearDupPairs(
      docs: DataFrame,
      threshold: Double,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cands = lshCandidatePairs(
      docs, numPerms, rowsPerBand, shingleWidth = n,
      idCol = idCol, textCol = textCol)
    val sets = shingleHashSets(docs, n, idCol, textCol)
    cands
      .join(sets.select(
        col(idCol).as("id_a"), col("_set").as("_sa"), col("_n").as("_na")), "id_a")
      .join(sets.select(
        col(idCol).as("id_b"), col("_set").as("_sb"), col("_n").as("_nb")), "id_b")
      .withColumn("_inter", size(array_intersect(col("_sa"), col("_sb"))))
      .select(
        col("id_a"),
        col("id_b"),
        (col("_inter").cast("double") /
          (col("_na") + col("_nb") - col("_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected near-duplicate pair list —
    * the step that turns candidate PAIRS into actionable dedup GROUPS
    * (keep `cluster_id`, drop the rest). Deterministic: a node's cluster
    * id is the smallest id reachable from it.
    *
    * Iterative min-label propagation: each round pushes every node's
    * current label across its edges and keeps the minimum — one shuffle
    * join plus one aggregation per round, converging within the largest
    * component's diameter (near-dup clusters are shallow; genuinely deep
    * chains converge in diameter rounds, and `maxIters` guards the
    * pathological case rather than returning a half-propagated answer).
    * `localCheckpoint` truncates the growing lineage each round — the
    * standard discipline for iterative DataFrame algorithms. Only nodes
    * appearing in some pair are labeled; singletons need no dedup.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIters: Int = 50,
      localEdgeThreshold: Long = 1L << 20): DataFrame = {
    // symmetrize with a generator, not a self-union: a union's two
    // branches re-evaluate the whole candidate pipeline unless an
    // exchange happens to sit at the shared root (the former input's
    // final distinct was exactly that exchange — with RAW per-band pairs
    // there is none, and the LSH join ran twice). The explode doubles
    // each row inline in one pass, whatever the input plan looks like.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("u"), col(bCol).as("v")),
        struct(col(bCol).as("u"), col(aCol).as("v")))).as("_e"))
      .select(col("_e.u").as("u"), col("_e.v").as("v"))
      .distinct()
      .localCheckpoint()
    // Size-adaptive: after LSH banding the candidate graph is tiny
    // relative to the corpus — when the (deduped, symmetric) edge list
    // fits comfortably on the driver, a sequential union-find beats
    // several distributed rounds outright; past the threshold the
    // iterative path below takes over. Both produce the identical
    // min-reachable-id labeling (property-tested against each other).
    // ... but only when the id's EXTERNAL row type is Comparable (the
    // union-find orders representatives with compareTo). Binary ids
    // surface as Array[Byte], arrays/structs as WrappedArray/Row —
    // none Comparable — so those route to the distributed path below,
    // which only ever compares ids with Catalyst's own min/equality.
    val idType = pairs.schema(aCol).dataType
    val comparableIds = {
      import org.apache.spark.sql.types._
      idType match {
        case StringType | BooleanType | ByteType | ShortType |
            IntegerType | LongType | FloatType | DoubleType | DateType |
            TimestampType | TimestampNTZType | _: DecimalType => true
        case _ => false
      }
    }
    if (comparableIds && edges.count() <= localEdgeThreshold)
      return localComponents(pairs.sparkSession, edges.collect(), idType)
    var labels = edges
      .select(col("u").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    // Labels only ever DECREASE, so for integral ids an exact decimal
    // sum is a sound fixpoint witness (one cheap aggregation per round,
    // no 64-bit wrap); for any other id type fall back to the exact
    // join-and-count change test.
    val integralIds = pairs.schema(aCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType |
          _: org.apache.spark.sql.types.ShortType |
          _: org.apache.spark.sql.types.IntegerType |
          _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    def checksum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    def changedCount(next: DataFrame, prev: DataFrame): Long = next
      .join(prev.withColumnRenamed("cluster_id", "_old"), "doc_id")
      .filter(col("cluster_id") =!= col("_old"))
      .count()
    var prevSum = if (integralIds) checksum(labels) else null
    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaEdges = edges
        .join(labels, edges("u") === labels("doc_id"))
        .select(edges("v").as("doc_id"), labels("cluster_id"))
      // pointer jump (label-of-label): collapses long chains in
      // O(log diameter) rounds instead of O(diameter)
      val viaPointer = labels.as("x")
        .join(labels.as("y"), col("x.cluster_id") === col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.cluster_id").as("cluster_id"))
      val next = labels
        .union(viaEdges)
        .union(viaPointer)
        .groupBy("doc_id")
        .agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint()
      if (integralIds) {
        val nextSum = checksum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
      } else {
        converged = changedCount(next, labels) == 0
      }
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds")
    labels
  }

  /** Driver-side union-find over a collected edge list, min-id
    * representatives — the small-graph path of [[connectedComponents]].
    * Ids may be any mutually comparable atomic type.
    */
  private def localComponents(
      spark: org.apache.spark.sql.SparkSession,
      collected: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val es = collected.map(r => (r.get(0), r.get(1)))
    val parent = scala.collection.mutable.Map[Any, Any]()
    // iterative find with full path compression — min-union (no rank)
    // can build O(n)-deep chains, which a recursive find would blow the
    // stack on at the default 2^20-edge threshold
    def find(x: Any): Any = {
      var root = parent.getOrElseUpdate(x, x)
      while (parent(root) != root) root = parent(root)
      var cur = x
      while (parent(cur) != root) {
        val nxt = parent(cur)
        parent(cur) = root
        cur = nxt
      }
      root
    }
    def lt(x: Any, y: Any): Boolean =
      x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows = parent.keys.toSeq.map(k =>
      org.apache.spark.sql.Row(k, find(k)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", idType),
        org.apache.spark.sql.types.StructField("cluster_id", idType))))
  }
}
