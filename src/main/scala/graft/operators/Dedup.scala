package graft.operators

import graft.{GQuery, Tables}
import graft.CacheScope.Trackable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design (100 TB): every variant is shuffle-bounded — candidates come
  * from equality joins on fingerprints/band-keys (never a cross join); the
  * only O(n^2) work is inside tiny candidate buckets. The DuckDB oracles ARE
  * brute-force O(n^2) — feasible only because verification runs at sf0.01;
  * the Spark side never materializes the quadratic space.
  */
object Dedup {

  /** distinct word tokens of `text` */
  private def tokens: Column = array_distinct(split(col("text"), " "))

  /** Candidate-stage plan registry for the stretch artifact: each heavy
    * pair-finder publishes its candidate DataFrame (the band/prefix join
    * output BEFORE exact verification) while its plan is CONSTRUCTED, so
    * StretchBench counts the exact candidate stage the timed run
    * executed — a superlinear candidate blowup is then measured per
    * scale leg, never inferred from totals or confused with corpus
    * drift. Keys are short query ids (d02 ... v05). Registration is a
    * plan reference (lazy, no action); consumers build the query's
    * DataFrame first (Stretch's untimed construction pass does) and
    * count AFTER the timed window. */
  private[operators] object PairStats {
    val lastCandidates = new java.util.concurrent.ConcurrentHashMap[
      String, DataFrame]()
  }

  /** published for StretchBench (read-only view) */
  def candidatePlan(shortId: String): Option[DataFrame] =
    Option(PairStats.lastCandidates.get(shortId))

  /** `spark.graft.dedup.referencePlan=true` flips every plan-shape choice
    * this family makes for SPEED onto its slower, structurally different
    * alternative — array-tier jaccard verify instead of the fused mask
    * expressions, no explicit broadcasts, a different pinned parallelism
    * for the exploding band joins — WITHOUT changing any operator's
    * contract. [[graft.DedupSf1Gate]] hash-compares both legs at the sf1
    * stretch scale: answer equivalence under diverging plans is the
    * evidence that the r13 scale fixes (numbered repartition, measured
    * broadcast gates, mask tiers) optimize without altering results. */
  private def referencePlan(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.dedup.referencePlan").exists(_.toBoolean)

  private val NumHashes = 128 // minhash functions (xxhash64 seeded by index)
  private val BandR = 4 // rows per band -> 32 bands; at J>=0.8 the pair
  // miss probability is (1-J^4)^32 <= (1-0.41)^32 ~ 4e-8, while mediocre
  // pairs (J~0.5) fire ~100x fewer bands than r=2 would — the candidate
  // set stays near the true pair set instead of exploding.

  /** Content fingerprint of the sorted distinct token array `toks`. The
    * separator matters: tokens come from splitting on spaces so they can
    * never contain one, which makes the space-joined form INJECTIVE —
    * concatenation without a separator would conflate e.g. ["ab","c"]
    * with ["a","bc"] and fabricate an exact duplicate. */
  private def tokenFp: Column = md5(concat_ws(" ", col("toks")).cast(BinaryType))

  /** documents with the scan spread before heavy per-row token/digest
    * expressions: a single local parquet file plans one task, which would
    * serialize the tokenize+md5 map work. One doc moves once — strictly
    * less data than the downstream token-level shuffles — and on a
    * many-file corpus the exchange coalesces away under AQE. */
  private def docsSpread(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).repartition(s.sparkContext.defaultParallelism)

  /** Label the jobs a gate/broadcast-build action spawns (Spark UI +
    * the Profile* listeners attribute stages by job description); the
    * previous description is restored so the caller's own labeling —
    * e.g. Bench's per-query tags — is untouched. */
  private def labeled[T](s: SparkSession, tag: String)(f: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(tag)
    try f finally sc.setJobDescription(prev)
  }

  /** Shared d02/d08 signature core over token-set representatives
    * `(idCol, toks)`. Dictionary-encodes tokens to int ids — inline
    * xxhash64, computed per row and fully parallel (a global
    * row_number().over(Window.orderBy(...)) would funnel the entire
    * vocabulary through ONE partition, the textbook Spark scale-killer);
    * injectivity (the bijection every jaccard count relies on) is
    * verified with one vocabulary-sized aggregate, falling back to dense
    * ids from partition-parallel RDD zipWithIndex on the astronomically
    * unlikely 64-bit collision. The collision check runs over the
    * DISTINCT vocabulary so the shuffle carries ~|V| tokens. Derives:
    *  - expInt  (idCol, tid)          — d02's bitmask verify path
    *  - repsInt (idCol, tids sorted)  — sorted-merge jaccard verify
    *  - banded  (idCol, nt, bk)       — 32 bands x r=4 minhash keys;
    *    persisted because both sides of a band join read it and the
    *    128-min-agg signature pass above it is the pipeline's most
    *    expensive stage
    * All three are `.tracked` (the consumer drives the action and
    * releases via CacheScope); also returns the vocabulary size for the
    * bitmask-representation gate and a SORTED-dictionary provider: the
    * distinct tids equal the persisted vocab mapped through the id
    * assignment, so consumers that need the dictionary (the mask-table
    * builds) read the ~|V|-row cached vocab instead of re-shuffling a
    * distinct over the exploded (id, tid) table (~n_tokens rows — a real
    * exchange at any scale, and the mask gates already bound |V|). */
  private def tokenSignatures(s: SparkSession, reps: DataFrame,
      idCol: String): (DataFrame, DataFrame, DataFrame, Long, () => Array[Long]) = {
    val exploded = reps.select(col(idCol), explode(col("toks")).as("tok"))
    val vocab = exploded.select(col("tok")).distinct().tracked
    // one driver action for size + hash-injectivity (was two — each
    // pre-query action is ~0.1-0.3 s of driver round-trip at bench scale)
    val vcnt = labeled(s, "sig-core: vocab size+injectivity")(vocab
      .agg(count(lit(1)), count_distinct(xxhash64(col("tok")))).head())
    val vocabSize = vcnt.getLong(0)
    val hashInjective = vocabSize == vcnt.getLong(1)
    val dict: () => Array[Long] =
      if (hashInjective)
        // narrow scan of the cached vocab — no exchange, no distinct
        () => labeled(s, "sig-core: dictionary scan")(
          vocab.select(xxhash64(col("tok"))).collect())
          .map(_.getLong(0)).sorted
      else
        // dense ids are assigned 1..|V| by construction
        () => Array.tabulate(vocabSize.toInt)(i => i + 1L)
    val expInt = (if (hashInjective) {
      exploded.select(col(idCol), xxhash64(col("tok")).as("tid"))
    } else {
      val dense = s.createDataFrame(
        vocab.rdd.map(_.getString(0)).zipWithIndex()
          .map { case (t, i) => org.apache.spark.sql.Row(t, i + 1L) },
        new StructType().add("tok", StringType).add("tid", LongType))
      exploded.join(dense, "tok").select(col(idCol), col("tid"))
    }).tracked
    // sort_array: one O(k log k) per representative buys the verify an
    // allocation-free sorted-merge jaccard per candidate pair (and makes
    // the collected arrays deterministic)
    val repsInt = expInt.groupBy(idCol)
      .agg(sort_array(collect_list(col("tid"))).as("tids"))
      .tracked
    // NARROW band frame (round 16, VERDICT r15 #5): the in-run band join
    // needs only EQUALITY of band keys, so the 4-long (h0..h3) struct
    // collapses to one xxhash64 — a within-band collision can only ADD a
    // candidate pair, every candidate is exact-verified, and all three
    // dedup oracles are brute-force truth, so extra verified pairs are
    // rows the oracle also carries (the SigTable the first-shared-band
    // predicate reads stores the SAME kh values, so join hits and the
    // predicate agree on what "shared" means by construction). The band
    // exchanges stay JOIN-TIME (ENSURE_REQUIREMENTS or the caller's
    // explicit pin) rather than baked into the cache: a build-time
    // pre-partition was measured — it removes one exchange but also
    // removes AQE's skew splitting from the enumeration stage (d02 sf1
    // wall 12.1 -> 15.0 s, one 200 s-runSum 64-task stage) — the bytes
    // win the same either way because the rows are narrow now. The
    // persisted d10 index (pureBands) keeps the full flat h0..h3 layout.
    val banded = bandRows(repsInt, idCol)
      .select(col(idCol), col("nt"), col("bk.band").as("band"),
        xxhash64(col("bk")).as("kh"))
      .tracked
    (expInt, repsInt, banded, vocabSize, dict)
  }

  /** (id, tids) -> flat banded rows (id, nt, bk): the 128 minhash
    * functions evaluate per-row over the sorted tid ARRAY in ONE native
    * pass (MinHashSigs) — bit-identical to the
    * array_min(transform(tids, x -> xxhash64(lit(i), x))) formula (same
    * int-literal seed folding), but without 128 transform-array
    * allocations per representative and with zero additional shuffle.
    * This is the ONE place the band layout (NumHashes x BandR, struct
    * fields band,h0..h3) is defined: the in-run signatures
    * (tokenSignatures) and the persisted-index signatures (pureBands)
    * derive band keys here and so can never drift apart. */
  private def bandRows(tids: DataFrame, idCol: String): DataFrame =
    // FUSED band-key generation (round 16, VERDICT r15 #2): one kernel
    // emits the 32 (band, h0..h3) structs straight from the 128-min
    // accumulator — same minima bit-for-bit (MinHashBandsKernel delegates
    // to MinHashKernel), so band keys and candidate sets are unchanged,
    // but the per-row intermediate 128-long array, the 128 GetArrayItem
    // evaluations and the 32-struct expression tree disappear from the
    // signature pass (the family's dominant CPU at sf1). Kernel-identity
    // vs the composed formula is pinned in SqlFunctionsSpec.
    tids.select(col(idCol), size(col("tids")).as("nt"),
      explode(graft.functions.VectorFunctions
        .minhash_bands(col("tids"), NumHashes, BandR)).as("bk"))

  /** Band keys as a PURE function of the token set — tids are xxhash64 of
    * the token string unconditionally (no dense-id fallback): a persisted
    * signature index and a later batch signing MUST derive identical band
    * keys from identical token sets across runs, which a per-run fallback
    * dictionary cannot guarantee. Collisions only conflate tokens inside
    * the candidate GENERATION (verification is exact over token strings),
    * and a lost candidate would fail the oracle hash — accepted at
    * ~|V|^2 / 2^64. Emits flat (fp, nt, band, h0..h3) rows, equality-join
    * and columnar-storage ready. */
  private def pureBands(reps: DataFrame, idCol: String): DataFrame = {
    val tids = reps.select(col(idCol), explode(col("toks")).as("tok"))
      .select(col(idCol), xxhash64(col("tok")).as("tid"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("tid"))).as("tids"))
    bandRows(tids, idCol)
      .select(Seq(col(idCol), col("nt"), col("bk.band").as("band")) ++
        (0 until BandR).map(r => col(s"bk.h$r").as(s"h$r")): _*)
  }

  /** Shared d08/d10 oracle: brute-force best-match of each new doc
    * against the corpus side (DuckDB computes the quadratic join; both
    * Spark formulations must hash-match it exactly). */
  private val oIncremental: String =
    """WITH toks AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) s FROM documents),
      |nw AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
      |corpus AS (SELECT * FROM toks WHERE doc_id % 5 <> 0)
      |SELECT nw.doc_id AS doc_id,
      |  MAX(CAST(len(list_intersect(nw.s, corpus.s)) AS DOUBLE) /
      |      len(list_distinct(list_concat(nw.s, corpus.s)))) AS best_jaccard
      |FROM nw JOIN corpus ON
      |  CAST(len(list_intersect(nw.s, corpus.s)) AS DOUBLE) /
      |      len(list_distinct(list_concat(nw.s, corpus.s))) >= 0.8
      |GROUP BY nw.doc_id
      |ORDER BY doc_id""".stripMargin

  /** DuckDB brute-force token-set jaccard pair query (oracle side). */
  private def oJaccardPairs(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) s FROM documents)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= $threshold
       |ORDER BY a_id, b_id""".stripMargin

  /** 32-bit SimHash from the high bit of each md5 hex nibble of each
    * distinct token: bit_k = majority over tokens of (hexchar_k >= '8').
    * Pure string/integer ops => identical in Spark and DuckDB. */
  private def simhashDF(s: SparkSession, d: String): DataFrame =
    // one-pass native Simhash32 over the token array — bit-identical to
    // the md5-nibble voting formula the oracle CTE mirrors, but per-row:
    // no token explode, no 32-column aggregation. The repartition
    // spreads the digest work when the input arrives as few splits
    // (one local parquet file = one task); it moves each doc ONCE —
    // strictly less data than the exploded-token shuffle it replaced —
    // and on a many-file corpus the exchange coalesces away under AQE.
    // The isNotNull filter matches the old groupBy formulation, which
    // simply had no row for a (theoretical) token-less document.
    docsSpread(s, d)
      .select(col("doc_id"),
        graft.functions.VectorFunctions.simhash32(tokens).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** Shared oracle CTE computing the same 32-bit simhash in DuckDB. */
  private def oSimhashCte: String = {
    val sums = (1 to 32)
      .map(k => s"SUM(CASE WHEN substring(md5(tok), $k, 1) >= '8' THEN 1 ELSE -1 END) AS s$k")
      .mkString(",\n    ")
    val fp = (1 to 32)
      .map(k => s"(CASE WHEN s$k > 0 THEN CAST(${1L << (k - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
       |bits AS (SELECT doc_id,
       |    $sums
       |  FROM toks GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fp AS simhash FROM bits)""".stripMargin
  }

  /** SimHash near-dup pairs (hamming <= 6) via 8x4-bit banding over
    * DISTINCT fingerprints, then output-proportional member expansion.
    *
    * Banding the raw corpus is the textbook skew scale-killer: the
    * (band, key) space has only 8x16 = 128 values, so a full-corpus
    * banded self-join shuffles EVERY doc onto <=128 keys and the
    * within-group join is quadratic in N/16. Instead, docs sharing a
    * simhash are pairwise hamming-0 duplicates (the d06 rep-collapse
    * trick), so the candidate structure is fully determined by the
    * graph over DISTINCT fingerprints: band those (bounded by 2^32 and
    * in practice by corpus entropy, NOT corpus size), take the exact
    * hamming<=6 fingerprint pairs, then expand to member pairs with two
    * high-cardinality equality joins on the fingerprint — candidate
    * work scales with distinct fingerprints, expansion with output
    * size. Exactness is unchanged: old output = all doc pairs with
    * hamming<=6 = (same-fp pairs, hamming 0) ∪ (members of fp pairs
    * with 1<=hamming<=6), and pigeonhole recall applies to the
    * distinct-fp banding identically. */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    // fingerprints are tiny (one long per doc) but cost a full corpus
    // pass — persist AND materialize before the multi-consumer plans
    // below (banding input, both expansion joins, the intra self-join)
    val fp = simhashDF(s, d).tracked
    fp.count()
    // fingerprint-level candidate pairs: reuse the banded join with the
    // fingerprint itself as the ordering id (simhash32 is non-negative,
    // so `<` on the long is a total order over distinct values)
    val fpCand = bandedCandidates(
      fp.select(col("simhash").as("doc_id"), col("simhash")).distinct())
    PairStats.lastCandidates.put("d05", fpCand)
    val fpPairs = fpCand.filter(col("hamming") <= 6)
      .select(col("a_id").as("a_fp"), col("b_id").as("b_fp"), col("hamming"))
    // cross-fingerprint member pairs: each join keys on the full 32-bit
    // fingerprint (high cardinality — no 128-key pile-up)
    val cross = fpPairs
      .join(fp.as("ma"), col("a_fp") === col("ma.simhash"))
      .join(fp.as("mb"), col("b_fp") === col("mb.simhash"))
      .select(
        least(col("ma.doc_id"), col("mb.doc_id")).as("a_id"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("b_id"),
        col("hamming"))
    // intra-fingerprint pairs (hamming 0): equality self-join on the
    // fingerprint — output-proportional (the k^2 blowup is the answer
    // itself, not shuffle or candidate work)
    val intra = fp.as("x").join(fp.as("y"),
        col("x.simhash") === col("y.simhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        lit(0).cast(IntegerType).as("hamming"))
    cross.unionByName(intra)
  }

  /** hamming<=6 pairs among the given (doc_id, simhash) rows, via 4
    * 8-bit blocks with Hamming<=1 multi-probe (the v05 sketch-join
    * trick) — pigeonhole-exact: if every block differed in >=2 bits the
    * total would be >=8 > 6, so some block differs in <=1 bit, and the
    * probe side's 9 keys per block (exact + each single-bit flip) cover
    * exactly that block.
    *
    * Why not the classic 8x4-bit equality banding: its (band, key)
    * space has 128 values, so candidate count is ~F²/4 over F distinct
    * fingerprints and the join parallelism is capped at 128 reducers.
    * The 8-bit blocks give a 1024-value key space (~3.5x fewer
    * candidates, 8x the parallelism) at the cost of a 36-rows-per-
    * fingerprint probe side — fingerprint rows are two longs, so the
    * probe explosion is bytes-cheap while the candidate reduction is
    * quadratic-cheap.
    *
    * First-match-block dedup: each pair is emitted ONLY at its first
    * block with block-hamming <= 1 (a per-row expression on the
    * fingerprint XOR), so the join output needs no distinct() — the
    * de-duplicating shuffle would move more rows than there are
    * candidates. Within a block a pair matches exactly one probe row
    * (the 9 probe keys are distinct; the build key equals the one whose
    * flip is the differing bit). */
  private def bandedPairs(fp: DataFrame): DataFrame =
    bandedCandidates(fp)
      .filter(col("hamming") <= 6)
      .select("a_id", "b_id", "hamming")

  /** the band join's raw output (hamming still unfiltered) — the
    * CANDIDATE stage [[bandedPairs]] verifies, split out so the stretch
    * artifact can count exactly what the op enumerates */
  private def bandedCandidates(fp: DataFrame): DataFrame = {
    // AQE parallelism guard: the distinct-fingerprint input is tiny in
    // BYTES (two longs per row), so AQE coalesces the upstream shuffle to
    // ONE partition — but this join EXPLODES ~70x beyond its input (the
    // sf1 stretch leg ran its 96M match-iterations in a single task,
    // 60 s of a 65 s query; caught round 13 by the stage metrics). An
    // explicit NUMBERED repartition pins the streamed side's task count:
    // REPARTITION_BY_NUM is exempt from AQE coalescing, and the extra
    // exchange moves only the fingerprint rows (negligible at any scale —
    // distinct fps, not docs).
    val spread = fp.repartition(
      if (referencePlan(fp.sparkSession))
        // a deliberately DIFFERENT pin (odd, smaller): the gate's two
        // legs must diverge in task layout to prove answers don't
        // depend on it — still >1, so neither leg exercises the
        // single-task pathology
        math.max(3, fp.sparkSession.sparkContext.defaultParallelism / 4 | 1)
      else fp.sparkSession.sparkContext.defaultParallelism)
    val buildCols = (0 until 4).map { b =>
      struct(lit(b).as("b"),
        shiftrightunsigned(col("simhash"), 8 * b).bitwiseAND(lit(255L)).as("key"))
    }
    val probeCols = (0 until 4).flatMap { b =>
      val key = shiftrightunsigned(col("simhash"), 8 * b).bitwiseAND(lit(255L))
      key +: (0 until 8).map(bit => key.bitwiseXOR(lit(1L << bit)))
    }.zipWithIndex.map { case (k, i) =>
      struct(lit(i / 9).as("b"), k.as("key"))
    }
    val build = spread.select(col("doc_id"), col("simhash"),
      explode(array(buildCols: _*)).as("bk"))
    val probe = spread.select(col("doc_id"), col("simhash"),
      explode(array(probeCols: _*)).as("bk"))
    val xor = col("x.simhash").bitwiseXOR(col("y.simhash"))
    def blockHamming(b: Int) =
      bit_count(shiftrightunsigned(xor, 8 * b).bitwiseAND(lit(255L)))
    val firstBlock = (3 to 0 by -1).foldLeft(lit(-1)) { (acc, b) =>
      when(blockHamming(b) <= 1, lit(b)).otherwise(acc)
    }
    build.as("x").join(probe.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id") &&
          col("x.bk.b") === firstBlock)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(xor).cast(IntegerType).as("hamming"))
  }

  /** Primitive open-addressing union-find over arbitrary long ids
    * (linear probing, power-of-two capacity, grow at 60% load, path
    * halving, union by size) — no boxing in the per-edge path; doc ids
    * are arbitrary longs, Long.MinValue is the empty-slot sentinel (ids
    * are nonnegative in every corpus, and a hostile MinValue id would
    * only over-emit edges, never drop connectivity). Shared by the
    * per-partition forest contraction ([[forestEdges]]) and the
    * driver-local CC finish ([[localCcLabels]]) so their component
    * semantics can never drift apart. */
  private[graft] final class LongUnionFind {
    private var cap = 1 << 13
    private var mask = cap - 1
    private var keys = Array.fill[Long](cap)(Long.MinValue)
    private var slot = new Array[Int](cap)
    private[graft] var ids = new Array[Long](cap) // slot -> id
    private var parent = new Array[Int](cap)
    private var compSize = new Array[Int](cap)
    private[graft] var n = 0
    private def rehash(): Unit = {
      val oc = cap
      cap <<= 1; mask = cap - 1
      val ok = keys; val os = slot
      keys = Array.fill[Long](cap)(Long.MinValue)
      slot = new Array[Int](cap)
      ids = java.util.Arrays.copyOf(ids, cap)
      parent = java.util.Arrays.copyOf(parent, cap)
      compSize = java.util.Arrays.copyOf(compSize, cap)
      var i = 0
      while (i < oc) {
        val k = ok(i)
        if (k != Long.MinValue) {
          var h = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
          while (keys(h) != Long.MinValue) h = (h + 1) & mask
          keys(h) = k; slot(h) = os(i)
        }
        i += 1
      }
    }
    def idx(k: Long): Int = {
      var h = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      while (keys(h) != Long.MinValue && keys(h) != k) h = (h + 1) & mask
      if (keys(h) == k) slot(h)
      else {
        if ((n + 1) * 5 >= cap * 3) { rehash(); idx(k) }
        else {
          keys(h) = k; slot(h) = n
          ids(n) = k; parent(n) = n; compSize(n) = 1
          n += 1; n - 1
        }
      }
    }
    def find(i0: Int): Int = {
      var i = i0
      while (parent(i) != i) { parent(i) = parent(parent(i)); i = parent(i) }
      i
    }
    /** true iff the edge connected two previously-separate components */
    def union(a: Long, b: Long): Boolean = {
      val ra = find(idx(a))
      val rb = find(idx(b))
      if (ra == rb) false
      else {
        if (compSize(ra) < compSize(rb)) {
          parent(ra) = rb; compSize(rb) += compSize(ra)
        } else {
          parent(rb) = ra; compSize(ra) += compSize(rb)
        }
        true
      }
    }
  }

  /** Per-partition spanning forest: emits exactly the input edges that
    * join two components not yet connected within this partition
    * (<= distinct-nodes-1 edges per partition, one pass, no shuffle). */
  private[graft] def forestEdges(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val uf = new LongUnionFind
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (it.hasNext) {
      val e = it.next()
      if (uf.union(e._1, e._2)) out += e
    }
    out.iterator
  }

  /** Driver-local CC finish over a MEASURED-BOUNDED edge list: one
    * union-find pass, then each node labels as the MINIMUM node id of
    * its component — exactly the fixpoint the distributed min-label/
    * pointer-jump loop converges to, computed without the loop's
    * per-round shuffles. Only nodes that appear in an edge are emitted;
    * isolated reps label as themselves via the left-join coalesce at the
    * consumer. Order-independent (union-find component structure does
    * not depend on edge order), so collect() nondeterminism cannot leak
    * into the answer. */
  private[graft] def localCcLabels(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val uf = new LongUnionFind
    var i = 0
    while (i < edges.length) {
      uf.union(edges(i)._1, edges(i)._2)
      i += 1
    }
    ccLabelsOf(uf)
  }

  /** [[localCcLabels]] over FLAT per-partition long arrays
    * ([a0,b0,a1,b1,...]) — the collect path ships primitive arrays
    * instead of millions of boxed (Long, Long) tuples (round 16,
    * VERDICT r15 minor #5: at the 4M-edge gate the tuple collect was
    * low-hundreds of MB of driver garbage). Identical labels: the
    * union-find sees the same edge multiset. */
  private[graft] def localCcLabelsFlat(packed: Array[Array[Long]]): Array[(Long, Long)] = {
    val uf = new LongUnionFind
    packed.foreach { arr =>
      var i = 0
      while (i < arr.length) { uf.union(arr(i), arr(i + 1)); i += 2 }
    }
    ccLabelsOf(uf)
  }

  /** min-node-id-per-component labels of a populated union-find */
  private def ccLabelsOf(uf: LongUnionFind): Array[(Long, Long)] = {
    val minId = Array.fill[Long](uf.n)(Long.MaxValue)
    var i = 0
    while (i < uf.n) {
      val r = uf.find(i)
      if (uf.ids(i) < minId(r)) minId(r) = uf.ids(i)
      i += 1
    }
    val out = new Array[(Long, Long)](uf.n)
    i = 0
    while (i < uf.n) {
      out(i) = (uf.ids(i), minId(uf.find(i)))
      i += 1
    }
    out
  }

  /** Connected components over the simhash near-dup pair graph:
    * (doc_id, cluster_id, cluster_size), unordered — shared by d06
    * (cluster listing) and d07 (best-of-cluster selection). See the d06
    * comment for the algorithm and the plan-barrier rationale. */
  private def dupClusters(s: SparkSession, d: String): DataFrame = {
    // Fingerprint-representative collapse (the d02 trick, applied to
    // connectivity): docs sharing a simhash are pairwise hamming-0
    // duplicates, so component structure is fully determined by the
    // graph over DISTINCT fingerprints. Run CC on one representative
    // per fingerprint (the group's min doc_id) and let members inherit
    // the rep's label — exact, not approximate: every rep is its
    // group's minimum, so the component minimum over reps IS the
    // component minimum over docs. At sf0.1 this shrinks the edge set
    // 12x (8.0M member pairs -> 675k rep pairs) and the node set from
    // the corpus to the distinct-fingerprint count; at 100 TB the win
    // grows with duplication (the k^2 intra-group pair blowup never
    // materializes).
    val fp = simhashDF(s, d).tracked // (doc_id, simhash), one corpus pass
    fp.count() // populate before the multi-branch plans below
    // persisted: feeds the banded self-join (both sides), the label init,
    // and the member-inheritance join — without it each consumer re-runs
    // the groupBy-min shuffle over fp
    val repFp = fp.groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("doc_id")).tracked
    // The iterative min-label/pointer-jump loop runs on co-partitioned
    // RDDs, not DataFrames: per-round data is tiny relative to the
    // corpus (the rep graph), so the cost driver is fixed plan/stage
    // overhead, which an explicit HashPartitioner reduces to ONE job of
    // three small shuffles per round (the edge join itself is narrow —
    // both sides share the partitioner). RDDs also make the plan
    // barrier implicit: persisted lineage per round, no exponential
    // Catalyst tree growth. Parallelism is sized from the MEASURED edge
    // count, so a 100 TB rep graph still fans out to the cluster while
    // the sf0.1 graph stops paying 32-partition scheduling overhead
    // for 2 k nodes.
    val cand6 = bandedCandidates(repFp)
    PairStats.lastCandidates.put("d06", cand6)
    val rawPairs = cand6.filter(col("hamming") <= 6)
      .select(col("a_id").cast(LongType), col("b_id").cast(LongType))
      .rdd.map(r => (r.getLong(0), r.getLong(1))).persist()
    val rawCount = rawPairs.count() // also the contraction gate input
    // Local CONTRACTION before the loop (round 15): a near-dup rep graph
    // is a union of near-cliques (sf1: 15.4M pairs over 26k nodes, avg
    // degree ~1180), and every label round re-scans every edge — ~250 s
    // of the measured runSum was the edge join alone. A per-partition
    // union-find keeps only edges that connect two components not yet
    // connected WITHIN that partition (a spanning forest, <= nodes-1
    // edges per partition, one pass, no shuffle). Connectivity is
    // preserved exactly: the original graph's components are the
    // transitive closure of the union of per-partition subgraphs, and a
    // spanning forest preserves each subgraph's connectivity by
    // definition. Memory is bounded by the partition's DISTINCT nodes
    // (<= 2x its edge count, ~1M longs at the 500k-edges/partition
    // sizing below), not the graph. The uncontracted loop stays the
    // referencePlan leg, so DedupSf1Gate compares the two end-to-end.
    // gate on measured edge count: below ~2M edges the loop's per-round
    // scan is already cheap and the extra forest pass/counts only add
    // fixed overhead (sf0.1: 675k pairs) — the win is scale-side only.
    // The threshold is a conf so the in-suite equivalence test can force
    // the contraction on a tiny corpus (the per-round sf1 gate exercises
    // it at scale; this keeps a `sbt test`-time witness too).
    val minEdges = s.conf.getOption("spark.graft.dedup.ccContractMinEdges")
      .map(_.toLong).getOrElse(2000000L)
    val (pairs, pairCount) =
      if (referencePlan(s) || rawCount < minEdges) (rawPairs, rawCount)
      else {
        val f = rawPairs.mapPartitions(forestEdges).persist()
        val c = f.count()
        rawPairs.unpersist(blocking = false)
        (f, c)
      }
    val labelSchema = new StructType()
      .add("node", LongType).add("label", LongType)
    // LOCAL FINISH (round-15 optimization, guide §2.4 "remove shuffles
    // outright"): below a MEASURED edge bound the component labels come
    // from one driver-side union-find pass over the collected edge list —
    // the distributed loop's per-round cost here is pure scheduling (at
    // sf0.1 each round is ~3 tiny shuffles + a convergence aggregate over
    // a 675k-edge/2.7k-node graph, ~0.6-0.9 s of wall for microseconds of
    // CPU). The collect is bounded by the SAME discipline as the
    // SigTable/MaskTable broadcasts: a measured count against a conf'd
    // gate (default 4M edges = tens of MB on the driver), and the
    // contraction pass above keeps the post-forest edge count
    // node-bounded at scale (sf1: 15.4M raw -> 0.74M forest edges). Past
    // the gate — and always under referencePlan, so DedupSf1Gate
    // hash-compares loop vs local end-to-end at sf1 — the distributed
    // loop below stands unchanged. Exactness: localCcLabels emits the
    // min-node-id-per-component fixpoint, the identical contract the
    // loop converges to (property-tested side by side in DedupFuzzSpec).
    val maxLocalEdges = s.conf.getOption("spark.graft.dedup.ccLocalMaxEdges")
      .map(_.toLong).getOrElse(4000000L)
    val labelsDf: DataFrame = if (!referencePlan(s) && pairCount <= maxLocalEdges) {
      // primitive packing: each task ships ONE long[] (flat a,b pairs)
      // instead of boxed tuples — at the 4M-edge gate the old tuple
      // collect was low-hundreds of MB of short-lived driver garbage
      val packed = pairs.mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { e => buf += e._1; buf += e._2 }
        Iterator(buf.result())
      }.collect()
      val local = localCcLabelsFlat(packed)
      pairs.unpersist(blocking = false)
      val slices = math.max(1, math.min(s.sparkContext.defaultParallelism,
        local.length / 100000 + 1))
      s.createDataFrame(
        s.sparkContext.parallelize(
          local.toSeq.map { case (n0, l) => org.apache.spark.sql.Row(n0, l) },
          slices),
        labelSchema)
    } else {
      val edgeCount = pairCount * 2
      val ccParts = math.max(1, math.min(
        s.sparkContext.defaultParallelism, (edgeCount / 500000L).toInt + 1))
      val part = new org.apache.spark.HashPartitioner(ccParts)
      // both directions, hash-partitioned by src ONCE — every round's
      // edge-side join input is then narrow
      val edgesBySrc = pairs
        .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
        .partitionBy(part).persist()
      edgesBySrc.count()
      pairs.unpersist(blocking = false)
      // BigInt label sum: exact convergence test, immune to long overflow
      // when node ids are dense at 100 TB row counts (1e12 ids sum past
      // 2^63). Labels only ever decrease, so an unchanged sum == fixpoint.
      def labelSum(l: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
        l.aggregate(BigInt(0))((acc, kv) => acc + kv._2, _ + _)
      var labels = repFp.select(col("doc_id").cast(LongType)).rdd
        .map { r => val id = r.getLong(0); (id, id) }
        .partitionBy(part).persist()
      var last = labelSum(labels)
      var converged = false
      var round = 0
      while (!converged && round < 40) {
        round += 1
        val t0 = System.nanoTime()
        // min neighbor label per node (edge join is narrow: co-partitioned)
        val nbrMin = edgesBySrc.join(labels)
          .map { case (_, (dst, lab)) => (dst, lab) }
          .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        val merged = labels.leftOuterJoin(nbrMin)
          .mapValues { case (l, nl) => math.min(l, nl.getOrElse(l)) }
        // pointer jump: label(v) <- label(label(v)); every label IS a node
        // id (min over node-id-valued labels), so the lookup join hits
        val next = merged.map { case (n, l) => (l, n) }
          .join(merged.partitionBy(part))
          .map { case (_, (n, pl)) => (n, pl) }
          .partitionBy(part).persist()
        val now = labelSum(next) // materializes next
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          println(s"[cc] round $round sum=$now ${(System.nanoTime() - t0) / 1e9}s")
        converged = now == last
        last = now
        labels.unpersist(blocking = false)
        labels = next
      }
      edgesBySrc.unpersist(blocking = false)
      graft.CacheScope.trackRdd(labels) // released after the consuming action
      s.createDataFrame(
        labels.map { case (n, l) => org.apache.spark.sql.Row(n, l) }, labelSchema)
    }
    // members inherit their representative's component label (exact:
    // identical fingerprints are hamming-0 pairs, so the whole group is
    // in the rep's component); cluster sizes count DOCS, not reps. The
    // cluster universe is the DOCUMENTS table, not fp: a doc whose text
    // tokenizes to nothing has no fingerprint, but is still its own
    // singleton cluster (the oracle's walk seeds from documents too).
    // LEFT join + coalesce: the local-finish labels cover only nodes that
    // appear in an edge; an isolated rep's component minimum is itself.
    // Equivalent under the loop path too (there labelsDf covers every rep
    // and an isolated rep's label is already its own id).
    val memberLabels = fp
      .join(repFp.select(col("simhash"), col("doc_id").as("rep")), "simhash")
      .join(labelsDf.select(col("node").as("rep"), col("label")),
        Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("rep")).as("label"))
    val docLabels = Tables.documents(s, d).select(col("doc_id"))
      .join(memberLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("label"))
    val sizes = docLabels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    docLabels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"))
  }

  /** The d06/d07 shared oracle prefix: simhash fingerprints -> pair graph
    * -> WITH RECURSIVE reachability closure -> cc(doc_id, cluster_id). */
  private def oCcCte: String =
    s"""WITH RECURSIVE $oSimhashCte,
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL
       |  SELECT b_id AS src, a_id AS dst FROM pairs),
       |walk(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
       |cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id
       |       FROM walk GROUP BY node)""".stripMargin

  val queries: Seq[GQuery] = Seq(

    // Exact dedup: hash-groupBy on a content fingerprint. At scale this is
    // one shuffle on the fingerprint (map-side partial agg applies).
    GQuery("d01_dedup_exact", (s, d) => {
      val w = Window.partitionBy(col("fp"))
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast(BinaryType)).as("fp"))
        .withColumn("n_copies", count(lit(1)).over(w))
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
        .select("doc_id", "fp", "n_copies", "keep_id", "is_dup")
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id, fp, n_copies, keep_id, doc_id <> keep_id AS is_dup
             |FROM (SELECT doc_id, md5(text) AS fp,
             |        COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
             |        MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // MinHash + LSH near-dup pairs, exact-verified, in three scale moves:
    //  1. collapse docs with IDENTICAL token sets to one representative
    //     (training corpora are full of exact near-dup clusters; a cluster
    //     of k docs would otherwise inject k^2/2 candidates into every
    //     band bucket) — their pairs are J=1 by construction;
    //  2. LSH over representatives only: 32 bands of r=4 minhashes
    //     (miss prob at J>=0.8 is (1-J^4)^32 < 4e-8 — the candidate set
    //     covers the brute-force oracle);
    //  3. exact token-set Jaccard verification of candidates, then expand
    //     representative pairs back to doc pairs.
    // Everything is equality-join bounded — no cross join at any step.
    GQuery("d02_minhash_lsh", (s, d) => {
      // no docsSpread here: the per-doc prep (sort + one md5) is light and
      // the fp groupBy shuffles immediately after — measured neutral-to-
      // negative, unlike the heavy-loop trigram/simhash passes
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_sort(tokens).as("toks"))
        .withColumn("fp", tokenFp)
      val groups = docs.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("rep_id"),
          first(col("toks")).as("toks"),
          collect_list(col("doc_id")).as("members"))
        .tracked // reused by reps, the verify joins, and both expansions
      val reps = groups.select(col("rep_id"), col("toks"))
      val (expInt, repsInt, banded, vocabSize, dictOf) =
        tokenSignatures(s, reps, "rep_id")
      // FUSED fast path (round 15, the d08 pattern brought home where it
      // started): sf1 profiling put d02's cost in CPU, not shuffle — one
      // 447 s-runSum stage against 11 MB of total shuffle, split between
      // the ~10 band-hit copies per candidate ground through the
      // pre-distinct partial aggregate and 37.7M sorted-merge jaccards
      // over ~150-token arrays (~5 us each). First-shared-band unique
      // emission deletes the copies; the broadcast mask jaccard
      // (~100 ns/pair) deletes the array verify. Unlike d08 there is NO
      // collision gate: rep_id is min(doc_id) per fp group — unique by
      // construction — so the broadcast tables key on it directly.
      val nReps = labeled(s, "d02: groups count")(groups.count())
      val sigBc: Option[org.apache.spark.broadcast.Broadcast[
          org.apache.spark.sql.graft.SigTable]] =
        if (referencePlan(s) || nReps * 1100L >= (256L << 20)) None
        else {
          // per-band kh values (the join key hashes), stride 1 — same
          // equality the narrow band join tests, 4x smaller than h0..h3
          val rows = labeled(s, "d02: sig-table collect")(
            banded.select(col("rep_id"), col("band"), col("kh")).collect())
          val ids = rows.map(_.getLong(0)).distinct.sorted
          val idx = new java.util.HashMap[Long, Integer](ids.length * 2)
          ids.zipWithIndex.foreach { case (g0, i) => idx.put(g0, i) }
          val nBands = NumHashes / BandR
          val flat = new Array[Long](ids.length * nBands)
          rows.foreach { r =>
            flat(idx.get(r.getLong(0)).intValue * nBands + r.getInt(1)) =
              r.getLong(2)
          }
          Some(s.sparkContext.broadcast(new org.apache.spark.sql.graft
            .SigTable(ids, flat, 1, nBands)))
        }
      // size-ratio bound applied INSIDE the band join: J>=0.8 forces
      // |A|/|B| in [0.8, 1.25], so dropping these rows before the distinct
      // cannot lose a true pair (verify applies the same bound). The nt
      // bound is per-PAIR (band-independent), so it holds at the
      // first-shared-band copy whenever it holds at any copy — unique
      // emission keeps exactly the distinct candidate set.
      val bandCond =
        col("x.band") === col("y.band") && col("x.kh") === col("y.kh") &&
          col("x.rep_id") < col("y.rep_id") &&
          col("x.nt") >= col("y.nt") * 0.8 - 0.5 &&
          col("y.nt") >= col("x.nt") * 0.8 - 0.5
      // NUMBERED repartition pin, gated on the MEASURED band-row count
      // (round 16): with the rows narrowed to (rep_id, nt, band, kh) the
      // join exchanges dropped below AQE's advisory size and byte-based
      // coalescing collapsed the CPU-quadratic enumeration at sf1
      // (12.1 -> 13.9 s quiet) — the d05/d08 lesson, triggered by the
      // narrowing itself. BELOW the gate the pin is itself the
      // pathology: at sf0.1 AQE broadcast-converts the small self-join
      // map-side and the forced exchanges cost 3.8 -> 8.6 s. nReps is
      // already measured for the sig gate, so the pin fires exactly
      // when the band rows are big enough that AQE would coalesce (not
      // broadcast) them. REPARTITION_BY_NUM is coalesce-exempt and
      // hash-satisfies the join's distribution.
      val pinMinRows = s.conf
        .getOption("spark.graft.dedup.bandPinMinRows")
        .map(_.toLong).getOrElse(1000000L)
      val npD02 = s.sparkContext.defaultParallelism
      val pinned =
        if (nReps * (NumHashes / BandR) < pinMinRows) banded
        else banded.repartition(npD02, col("band"), col("kh"))
      val candidates = sigBc match {
        case Some(bc) =>
          pinned.as("x").join(pinned.as("y"),
              bandCond && graft.functions.VectorFunctions
                .pair_first_shared_band(col("x.rep_id"), col("y.rep_id"), bc) ===
                col("x.band"))
            .select(col("x.rep_id").as("ra"), col("y.rep_id").as("rb"))
        case None =>
          pinned.as("x").join(pinned.as("y"), bandCond)
            .select(col("x.rep_id").as("ra"), col("y.rep_id").as("rb"))
            .distinct()
      }
      PairStats.lastCandidates.put("d02", candidates)
      // MAP-SIDE verify over a broadcast rep_id -> token-mask table
      // (same kernel and gates as d08; masks need a <=65536-token
      // dictionary and the table must fit executor memory). Exact: the
      // mask popcounts produce the same |A∩B| and |A∪B| integers as the
      // sorted-merge kernel, so the double ratio is bit-identical.
      val maskBc: Option[org.apache.spark.broadcast.Broadcast[
          org.apache.spark.sql.graft.MaskTable]] = {
        val nW = math.max(1L, (vocabSize + 63) / 64)
        if (sigBc.isEmpty || vocabSize > 65536 ||
            nReps * (nW * 8L + 8L) >= (256L << 20)) None
        else {
          // sorted dictionary from the CACHED vocab (tokenSignatures),
          // not a distinct over the exploded (id, tid) table — that
          // distinct re-shuffled ~n_tokens rows for a |V|-bounded result
          val dict = dictOf()
          val rows = labeled(s, "d02: mask-table collect")(
            repsInt.select(col("rep_id"), graft.functions
                .VectorFunctions.sorted_ids_to_mask(col("tids"), dict))
              .collect()).sortBy(_.getLong(0))
          val ids = rows.map(_.getLong(0))
          val flat = new Array[Long](ids.length * nW.toInt)
          var i = 0
          while (i < rows.length) {
            val m = rows(i).getSeq[Long](1)
            var wd = 0
            while (wd < nW.toInt) { flat(i * nW.toInt + wd) = m(wd); wd += 1 }
            i += 1
          }
          Some(s.sparkContext.broadcast(new org.apache.spark.sql.graft
            .MaskTable(ids, flat, nW.toInt, Array.empty)))
        }
      }
      // exact verify between representative token sets (size-ratio
      // prefilter is implied by J>=t: |A|/|B| must be in [t, 1/t]).
      // Adaptive representation: when the corpus vocabulary fits in a
      // 64-bit word, each set is a bitmask and jaccard becomes two
      // bit_counts — identical integer ratios, ~100x cheaper per pair.
      def verifiedLegacy = if (vocabSize <= 62) {
        // map the <=62 sparse tids to dense bit positions via a collected,
        // sorted table — bounded by the gate, so the collect and the
        // broadcast are provably tiny at any corpus size
        val tids = dictOf() // sorted ascending, from the cached vocab
        val posDf = broadcast(s.createDataFrame(
          s.sparkContext.parallelize(tids.zipWithIndex.toSeq.map {
            case (t, i) => org.apache.spark.sql.Row(t, i + 1)
          }, 1),
          new StructType().add("tid", LongType).add("pos", IntegerType)))
        val masks = expInt.join(posDf, "tid").groupBy("rep_id")
          // positions are distinct per rep, so the sum of powers IS the bit-OR
          .agg(sum(expr("shiftleft(cast(1 as bigint), pos - 1)")).as("mask"))
        candidates
          .join(masks.select(col("rep_id").as("ra"), col("mask").as("ma")), "ra")
          .join(masks.select(col("rep_id").as("rb"), col("mask").as("mb")), "rb")
          .withColumn("inter", bit_count(col("ma").bitwiseAND(col("mb"))))
          .withColumn("uni", bit_count(col("ma").bitwiseOR(col("mb"))))
          .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
          .filter(col("jaccard") >= 0.8)
          .select(col("ra"), col("rb"), col("jaccard"))
      } else candidates
        .join(repsInt.select(col("rep_id").as("ra"), col("tids").as("a_toks")), "ra")
        .join(repsInt.select(col("rep_id").as("rb"), col("tids").as("b_toks")), "rb")
        .filter(size(col("a_toks")) >= size(col("b_toks")) * 0.8 - 0.5 &&
          size(col("b_toks")) >= size(col("a_toks")) * 0.8 - 0.5)
        // sorted-merge verify kernel: exact same |A∩B|/|A∪B| as the
        // array_intersect/union formula, zero allocation per pair
        .withColumn("jaccard", graft.functions.VectorFunctions
          .sorted_jaccard(col("a_toks"), col("b_toks")))
        .filter(col("jaccard") >= 0.8)
        .select(col("ra"), col("rb"), col("jaccard"))
      val verified = maskBc match {
        case Some(bc) =>
          // fused: the jaccard is a map-side expression in the stage that
          // emitted the candidate — no mask/array fetch joins at all
          candidates
            .withColumn("jaccard", graft.functions.VectorFunctions
              .pair_mask_jaccard(col("ra"), col("rb"), bc))
            .filter(col("jaccard") >= 0.8)
            .select(col("ra"), col("rb"), col("jaccard"))
        case None => verifiedLegacy
      }
      // expand: cross-group pairs
      val mem = groups.select(col("rep_id"), explode(col("members")).as("m"))
      val crossPairs = verified
        .join(mem.select(col("rep_id").as("ra"), col("m").as("ma")), "ra")
        .join(mem.select(col("rep_id").as("rb"), col("m").as("mb")), "rb")
        .select(least(col("ma"), col("mb")).as("a_id"),
          greatest(col("ma"), col("mb")).as("b_id"), col("jaccard"))
      // expand: within-group pairs (identical token sets, J = 1)
      val withinPairs = mem.as("p").join(mem.as("q"),
          col("p.rep_id") === col("q.rep_id") && col("p.m") < col("q.m"))
        .select(col("p.m").as("a_id"), col("q.m").as("b_id"),
          lit(1.0).as("jaccard"))
      crossPairs.unionByName(withinPairs)
        .orderBy("a_id", "b_id")
    },
      Some(oJaccardPairs(0.8))),

    // Character n-gram (3-gram) Jaccard within language blocks — EXACT
    // similarity join via prefix filtering (the AllPairs/PPJoin family):
    // with a global total order on grams (rarest first), two sets with
    // J >= t MUST share a gram within each other's first
    // |A| - ceil(t*|A|) + 1 grams. So candidates come from an equality
    // join on (lang, prefix gram) — never a cross join — and each
    // candidate is verified exactly. Plus the size-ratio bound
    // (J>=t => |A|/|B| in [t, 1/t]). Identical output to brute force.
    GQuery("d03_ngram_jaccard", (s, d) => {
      val t = 0.6
      // packed-codepoint trigram ids straight off the text (native
      // TrigramIds expression): each id packs the trigram's 3 code points
      // into 63 bits — injective BY CONSTRUCTION, so the old dictionary-
      // encoding join, xxhash64 collision check and dense-id fallback all
      // disappear, along with every per-gram string allocation. The id
      // arrays are born sorted+distinct per document, so the verify-side
      // sorted-merge input (gInt) is free.
      val docs3 = docsSpread(s, d)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"),
          graft.functions.VectorFunctions.trigram_ids(col("text")).as("sids"))
      // identical-trigram-SET collapse (the d02 rep trick, sf1-stretch
      // motivated): a cluster of k docs with one gram set would inject
      // k^2/2 pairs into every prefix bucket AND k^2/2 verify rows; reps
      // make candidate volume scale with DISTINCT sets, and the cluster's
      // own pairs are J=1 by construction. The sorted id array IS the
      // group key (exact, no digest): the shuffle carries each doc's ids
      // once — the same bytes the exploded-gram stages below move anyway.
      val groups3 = docs3
        .groupBy(col("lang"), col("sids"))
        .agg(min(col("doc_id")).as("doc_id"),
          sort_array(collect_list(col("doc_id"))).as("members"))
        .tracked
      val g = groups3
        .select(col("doc_id"), col("lang"), col("sids"))
        .withColumn("sz", size(col("sids")))
        .tracked // feeds the prefix pass, the df counts and the verify joins
      val gInt = g.select(col("doc_id").as("gd"), col("lang"), col("sz"),
        col("sids"))
      val grams = g.select(col("doc_id"), col("lang"), col("sz"),
        explode(col("sids")).as("gid"))
      // document frequency drives the canonical rare-first prefix order
      // (ANY total order is correct for PPJoin completeness; rare-first
      // minimizes candidates). The df join carries no broadcast hint: a
      // 100 TB corpus vocabulary needn't fit in a broadcast — AQE
      // promotes the join when it actually is small.
      val freq = grams.groupBy("gid").agg(count(lit(1)).as("df")).tracked
      val vocabV = freq.count()
      val gidGrams = grams.join(freq, "gid")
        .select(col("doc_id"), col("lang"), col("sz"), col("gid"), col("df"))
      // ---- verify-tier and emission-strategy choice (moved above the
      // prefix build: the unique-emission join below needs the mask
      // table the mask tier already collects) ----
      // multi-word bitset verify: with a dictionary of V grams, each set
      // is ceil(V/64) longs; |A&B| / |A|B| are word-wise popcounts —
      // identical integer ratios to the array intersect/union, ~2 orders
      // cheaper per candidate pair WHEN sets are dense in the vocabulary
      // (char-level corpora: OCR text, code, CJK). Falls back to array
      // jaccard when the masks would be mostly-zero padding.
      // max(1, _): an empty corpus must not build a 0-word mask
      // expression (the pipeline is empty end-to-end anyway)
      val nWords = math.max(1L, (vocabV + 63) / 64).toInt
      // lazy: the common <=64-word case never pays this extra job, and an
      // empty corpus (avg = NULL) reads as density 0 -> array tier
      lazy val avgSz = Option(g.agg(avg(col("sz"))).head.get(0))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      val repCount = g.count() // g is persisted; metadata-cheap
      val maskBytes = repCount * (nWords + 4L) * 8L
      // broadcast gate on RAW payload bytes with generous headroom: a
      // broadcast HashedRelation materializes at a small multiple of the
      // raw estimate (object headers, hash table, the driver-side copy),
      // so a near-limit raw estimate can occupy several times that in
      // the single local-mode JVM. 24 MiB raw ~= well under 200 MiB
      // materialized worst-case — safely inside executor memory at any
      // fan-out, while still broadcasting every corpus the fused mask
      // tier actually selects (sf1 stretch: ~3 MiB). Never a blind
      // hint that could OOM the driver on a genuinely large rep set
      // (the d09 rule).
      val maskBroadcastable = maskBytes < (24L << 20)
      // density decides mask-vs-merge: mask verify costs ~nWords word
      // ops per pair, sorted-merge ~|A|+|B| branchy steps — masks win
      // while V stays within ~256x the average set size; the <=64-word
      // tier is unconditional (tiny masks beat everything)
      val maskKernelOk = nWords <= 64 || (nWords <= 1024 && vocabV <= 256 * avgSz)
      // TIER CHOICE. When the set side BROADCASTS, the candidate stream
      // carries nothing and the fused popcount kernel wins outright ->
      // mask. When it cannot broadcast, the two fetch joins drag the
      // payload per CANDIDATE row through two exchanges (the sf1
      // straddle: 50.9M candidates x 2 sides — the row's dominant
      // cost), so the WIRE SIZE of the set representation decides:
      // delta-varint rank gaps are ~1-2 bytes/element (gap ~ V/avg, one
      // LEB128 byte while V <= 128*avg) vs nWords*8 for the mask and
      // 8/element for raw ids — pick the smallest estimate. The varint
      // tier needs the same <=65536-gid dictionary as the mask tier;
      // past that the corpus is a genuine word-level vocabulary and the
      // raw sorted-id arrays are the honest representation.
      // `spark.graft.dedup.d03VerifyTier` forces a tier (test hook —
      // StageGateSpec proves all tiers agree on answers).
      val tier: String = s.conf.getOption("spark.graft.dedup.d03VerifyTier")
        .getOrElse {
          if (referencePlan(s)) "array"
          else if (maskKernelOk && maskBroadcastable) "mask"
          else if (vocabV <= 65536) {
            val gapBytes = 1.0 + math.max(0.0,
              math.log(math.max(1.0, vocabV / math.max(avgSz, 1.0))) /
                math.log(128.0))
            val estVarintBytes = avgSz * gapBytes
            if (maskKernelOk && (nWords + 4L) * 8.0 <= estVarintBytes) "mask"
            else "varint"
          } else "array"
        }
      // the <=65536-gid dictionary (mask + varint tiers) — bounded by
      // the tier gates, so the collect is provably tiny at any corpus
      // size (freq already holds exactly one row per gid). Payloads
      // build MAP-SIDE from each representative's already-persisted
      // sorted id array with the dictionary riding as one expression
      // reference (no rank join, no per-gram shuffle, no re-group).
      lazy val gidDf: Array[(Long, Long)] = freq
        .select(col("gid"), col("df")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      lazy val gids: Array[Long] = gidDf.map(_._1).sorted
      // UNIQUE-EMISSION gate (round 15): collect the reps' masks ONCE in
      // canonical (df, gid) bit order, ship them as a Spark BROADCAST,
      // and let the prefix join emit each pair exactly at its
      // canonically-smallest shared gram — the pre-distinct candidate
      // stream (239.7M rows / 1636 MB of d03's 1785 MB sf1 shuffle, ~12x
      // the 19.0M distinct candidates; the copies land in different gid
      // partitions so no partial aggregate can merge them) collapses to
      // one row per pair and the distinct exchange disappears. Correct
      // and complete: the min shared gram lies in both prefixes
      // (prefixes are downward-closed in the canonical order) and
      // carries the pair's MINIMAL ranks, so the positional filter is
      // loosest exactly at the emitted copy. The gate is EXECUTOR memory
      // (one broadcast copy per executor, a handle per task), so it runs
      // far past the verify tier's 24 MiB expression-reference bound —
      // the d03x straddle corpus (~77 MB of masks) is exactly the case
      // that needs it. Past the gate (or on the reference leg) the
      // legacy enumerate-then-distinct path stands.
      val maskTableBytes = repCount * (nWords * 8L + 32L)
      // an explicitly forced tier takes the legacy enumerate-distinct-
      // fetch path (the tier-agreement spec compares those three legs;
      // the shipped-vs-reference gate compares fused against array)
      val fused = vocabV <= 65536 && maskKernelOk &&
        maskTableBytes < (256L << 20) && !referencePlan(s) &&
        s.conf.getOption("spark.graft.dedup.d03VerifyTier").isEmpty
      // canonical order maps: perm (value-sorted dict slot -> canonical
      // rank) and canonGids (canonical rank -> gid)
      lazy val canonGids: Array[Long] =
        gidDf.sortBy { case (gid0, df0) => (df0, gid0) }.map(_._1)
      lazy val perm: Array[Int] = {
        val rankOf = new java.util.HashMap[Long, Integer](canonGids.length * 2)
        var i = 0
        while (i < canonGids.length) { rankOf.put(canonGids(i), i); i += 1 }
        gids.map(g0 => rankOf.get(g0).intValue)
      }
      // the broadcast flat mask table (sorted rep ids + nWords-strided
      // canonical masks)
      lazy val maskTableBc = {
        val rows = g.select(col("doc_id"), graft.functions.VectorFunctions
            .sorted_ids_to_mask_permuted(col("sids"), gids, perm, nWords))
          .collect().sortBy(_.getLong(0))
        val ids = rows.map(_.getLong(0))
        val flat = new Array[Long](ids.length * nWords)
        var i = 0
        while (i < rows.length) {
          val m = rows(i).getSeq[Long](1)
          var wd = 0
          while (wd < nWords) { flat(i * nWords + wd) = m(wd); wd += 1 }
          i += 1
        }
        s.sparkContext.broadcast(
          new org.apache.spark.sql.graft.MaskTable(ids, flat, nWords, canonGids))
      }
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("gid"))
      // persist: both sides of the prefix self-join consume this, and the
      // per-doc rank window above it would otherwise run once per side
      val prefix = gidGrams
        .withColumn("rn", row_number().over(w))
        // -1e-9 guards against fp overshoot in sz*t making ceil (and thus
        // the prefix) one too short — a silent false-negative source
        .filter(col("rn") <= col("sz") - ceil(col("sz") * t - 1e-9) + 1)
        .select(col("doc_id"), col("lang"), col("sz"), col("gid"), col("rn"))
        .tracked
      // ASYMMETRIC INDEX PREFIX (PPJoin, Xiao et al. WWW'08; round 15):
      // the smaller record of a qualifying pair only needs its first
      // sz - ceil(2t/(1+t)*sz) + 1 grams indexed (~0.25*sz at t=0.6 vs
      // ~0.4*sz for the probe prefix). Complete: for |x| <= |y| with
      // J >= t the required overlap a = ceil(t/(1+t)*(|x|+|y|)) satisfies
      // a >= 2t/(1+t)*|x| AND (via the size filter |x| >= t*|y|)
      // a >= t*|y|, so the prefix lemma's guaranteed shared gram falls
      // inside x's INDEX prefix and y's probe prefix. This cuts both the
      // enumeration multiplicity (a true pair is emitted once per gram in
      // the INTERSECTION of a shorter and a full prefix — the pre-distinct
      // stream was 239.7M rows for 19.0M distinct candidates at sf1, and
      // that stream's exchange was 1636 of d03's 1785 MB total shuffle)
      // and the candidate count itself (a strictly tighter, still
      // complete filter).
      val indexPrefix = prefix
        .filter(col("rn") <=
          col("sz") - ceil(col("sz") * (2 * t / (1 + t)) - 1e-9) + 1)
      // PPJoin positional filter: a gram matching at 1-based positions
      // (rnX, rnY) of the canonical rare-first order bounds the overlap by
      // 1 + min(szX-rnX, szY-rnY), which must reach the equivalent overlap
      // threshold a = t/(1+t) * (szX+szY). Complete: the smallest common
      // gram of any qualifying pair satisfies the bound. The x side is
      // the INDEXED (smaller) record: size-then-id order makes each pair
      // enumerable from exactly one role assignment.
      val baseCond =
        col("x.gid") === col("y.gid") && col("x.lang") === col("y.lang") &&
          (col("x.sz") < col("y.sz") ||
            (col("x.sz") === col("y.sz") &&
              col("x.doc_id") < col("y.doc_id"))) &&
          // int sizes: 0.5 slack keeps boundary pairs (|X| = t|Y|) safe
          col("x.sz") >= col("y.sz") * t - 0.5 &&
          lit(1) + least(col("x.sz") - col("x.rn"), col("y.sz") - col("y.rn")) >=
            (col("x.sz") + col("y.sz")) * (t / (1 + t)) - 0.5
      // unique emission: keep the copy at the pair's canonically-smallest
      // shared gram only — all other copies of the pair die inside the
      // join stage, before any exchange
      val joinCond =
        if (fused) baseCond &&
          graft.functions.VectorFunctions.pair_min_shared_gid(
            col("x.doc_id"), col("y.doc_id"), maskTableBc) === col("x.gid")
        else baseCond
      val rawPairs = indexPrefix.as("x").join(prefix.as("y"), joinCond)
        .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
      // fused emission is duplicate-free BY CONSTRUCTION (one role
      // assignment per pair, one qualifying gram) — no distinct, no
      // exchange; the legacy path dedups the ~12x copies the multi-gram
      // enumeration produces
      val candidates = if (fused) rawPairs else rawPairs.distinct()
      PairStats.lastCandidates.put("d03", candidates)
      // TIER CHOICE. When the set side BROADCASTS, the candidate stream
      // verify runs AFTER the dedup point, never on multiplied copies: an
      // sf1 experiment with the broadcast-mask verify fused pre-distinct
      // showed 80% of enumerated copies are TRUE pairs in a dense corpus,
      // so filtering early SHIPPED MORE (2425 MB vs 1785) — unique
      // emission (above) beats both by never creating the copies.
      // FUSED verify: the broadcast table already holds every rep's
      // mask, so the exact jaccard is a map-side expression over the
      // bare (a_id, b_id) stream — no payload fetch joins at all (the
      // d03x straddle's two fetch exchanges, 1 GB and its dominant
      // 1210 s of runtime, were exactly this). Identical answers: same
      // masks, same popcount arithmetic, permutation-invariant.
      val verify =
        if (fused)
          candidates.withColumn("jaccard", graft.functions.VectorFunctions
            .pair_mask_jaccard(col("a_id"), col("b_id"), maskTableBc))
        else tier match {
        case "mask" =>
          val masks = g.select(col("doc_id"), graft.functions.VectorFunctions
            .sorted_ids_to_mask(col("sids"), gids).as("m"))
          val maskSide = if (maskBroadcastable) broadcast(masks) else masks
          candidates
            .join(maskSide.select(col("doc_id").as("a_id"), col("m").as("ma")), "a_id")
            .join(maskSide.select(col("doc_id").as("b_id"), col("m").as("mb")), "b_id")
            .withColumn("jaccard", graft.functions.VectorFunctions
              .mask_jaccard(col("ma"), col("mb")))
        case "varint" =>
          val vars = g.select(col("doc_id"), graft.functions.VectorFunctions
            .sorted_ids_to_varint(col("sids"), gids).as("v"))
          candidates
            .join(vars.select(col("doc_id").as("a_id"), col("v").as("va")), "a_id")
            .join(vars.select(col("doc_id").as("b_id"), col("v").as("vb")), "b_id")
            .withColumn("jaccard", graft.functions.VectorFunctions
              .varint_jaccard(col("va"), col("vb")))
        case _ => candidates
          .join(gInt.select(col("gd").as("a_id"), col("sids").as("a_s")), "a_id")
          .join(gInt.select(col("gd").as("b_id"), col("sids").as("b_s")), "b_id")
          .withColumn("jaccard", graft.functions.VectorFunctions
            .sorted_jaccard(col("a_s"), col("b_s")))
      }
      val repPairs = verify
        .filter(col("jaccard") >= t)
        .select(col("a_id").as("ra"), col("b_id").as("rb"), col("jaccard"))
      // expand representative pairs back to doc pairs; within-group pairs
      // (identical trigram sets) are J = 1 by construction
      val mem3 = groups3.select(col("doc_id").as("rep_id"),
        explode(col("members")).as("m"))
      val crossPairs = repPairs
        .join(mem3.select(col("rep_id").as("ra"), col("m").as("ma")), "ra")
        .join(mem3.select(col("rep_id").as("rb"), col("m").as("mb")), "rb")
        .select(least(col("ma"), col("mb")).as("a_id"),
          greatest(col("ma"), col("mb")).as("b_id"), col("jaccard"))
      val withinPairs = mem3.as("p").join(mem3.as("q"),
          col("p.rep_id") === col("q.rep_id") && col("p.m") < col("q.m"))
        .select(col("p.m").as("a_id"), col("q.m").as("b_id"),
          lit(1.0).as("jaccard"))
      crossPairs.unionByName(withinPairs)
        .orderBy("a_id", "b_id")
    },
      Some("""WITH g AS (SELECT doc_id, lang,
             |    list_distinct([substring(text, i, 3) for i in range(1, length(text) - 1)]) s
             |  FROM documents WHERE length(text) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
             |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
             |ORDER BY a_id, b_id""".stripMargin)),

    // SimHash fingerprints (32-bit, md5-nibble bits — engine-portable).
    GQuery("d04_simhash", (s, d) =>
      simhashDF(s, d).orderBy("doc_id"),
      Some(s"""WITH $oSimhashCte
              |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin)),

    // SimHash near-dup pairs: hamming(a,b) <= 6 on the 32-bit fingerprint.
    // 8 bands x 4 bits: any pair with <= 7 differing bits shares at least
    // one clean band (pigeonhole) => banding has PROVABLY exact recall.
    GQuery("d05_simhash_pairs", (s, d) =>
      simhashPairs(s, d).orderBy("a_id", "b_id"),
      Some(s"""WITH $oSimhashCte
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
              |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
              |ORDER BY a_id, b_id""".stripMargin)),

    // Duplicate CLUSTERS — the op a training pipeline actually runs over a
    // near-dup pair graph (keep ONE representative per transitive group;
    // pairs alone under-remove: a~b, b~c must collapse {a,b,c} even when
    // a!~c). Connected components by iterative min-label propagation with
    // pointer jumping: per round, (1) every node takes the min label among
    // itself and its neighbors (one equality-join shuffle + partial-agg
    // min), then (2) label <- label(label) (one self-join) — the pointer
    // jump halves chain depth so rounds are O(log diameter), not
    // O(diameter). Labels only decrease, so sum(label) is a strictly
    // decreasing monotone: one scalar aggregate per round detects the
    // fixpoint with no driver-side graph state beyond that scalar (the
    // GraphX-CC coordination shape). Each round rematerializes the labels
    // as a persisted RDD-backed frame (plan barrier): the round's plan
    // references `labels` three times, so composing DataFrames across
    // rounds would grow the Catalyst tree exponentially; the barrier keeps
    // every round's plan flat and lets the previous round's storage be
    // released as soon as the next is materialized.
    GQuery("d06_dup_clusters", (s, d) =>
      dupClusters(s, d).orderBy("doc_id"),
      Some(s"""$oCcCte
              |SELECT c.doc_id, c.cluster_id, s.cluster_size
              |FROM cc c JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
              |                FROM cc GROUP BY cluster_id) s USING (cluster_id)
              |ORDER BY c.doc_id""".stripMargin)),

    // Best-of-cluster selection — the curation DECISION on top of d06:
    // keep the LONGEST document of every duplicate cluster (ties to the
    // lowest id), drop the rest. The cluster assignment is MATERIALIZED
    // once per corpus in gpx and the selection reads it (at 100 TB you
    // never re-cluster to pick keepers — d06 measures the clustering
    // itself, this measures the production selection path). One argmax
    // per cluster via max_by over a (n_chars, -doc_id) struct — a
    // partial-aggregatable groupBy, not a window sort, so map-side
    // combine applies and no per-cluster event list ever materializes.
    GQuery("d07_dedup_keep_best", (s, d) => {
      val dir = FormatOps.cachedDir(d, "dup_clusters") { dir =>
        dupClusters(s, d).write.format("gpx").mode("overwrite").save(dir)
        graft.CacheScope.release()
      }
      val clusters = s.read.format("gpx").load(dir)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      clusters.join(docs, "doc_id")
        .groupBy(col("cluster_id"))
        .agg(
          max_by(col("doc_id"),
            struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("keep_id"),
          max(col("n_chars")).as("keep_chars"),
          count(lit(1)).as("cluster_size"))
        .withColumn("n_dropped", col("cluster_size") - 1)
        .select("cluster_id", "keep_id", "keep_chars", "cluster_size", "n_dropped")
        .orderBy("cluster_id")
    },
      Some(s"""$oCcCte,
              |j AS (SELECT c.cluster_id, dd.doc_id, dd.n_chars
              |      FROM cc c JOIN documents dd USING (doc_id)),
              |r AS (SELECT *,
              |    ROW_NUMBER() OVER (PARTITION BY cluster_id
              |      ORDER BY n_chars DESC, doc_id) AS rk,
              |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
              |  FROM j)
              |SELECT cluster_id, doc_id AS keep_id, n_chars AS keep_chars,
              |  cluster_size, cluster_size - 1 AS n_dropped
              |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin)),

    // Incremental (batch-vs-corpus) near-dup screening — the nightly-ingest
    // shape: an arriving batch (doc_id % 5 = 0 here) is checked against the
    // existing corpus WITHOUT re-running corpus x corpus dedup. Candidates
    // come from batch-side bands equality-joined to corpus-side bands only,
    // so steady-state cost is O(|batch| signatures + matched buckets), never
    // O(|corpus|^2); at scale the corpus side's banded signatures are a
    // maintained table (the v06 persisted-index pattern) and only the batch
    // side is computed per run. Exact duplicates shortcut through the
    // token-set fingerprint (no banding needed); near-dups are LSH
    // candidates exact-verified at J >= 0.8. Output: each batch doc that
    // collides with the corpus, with its best (max) corpus jaccard.
    GQuery("d08_incremental_dedup", (s, d) => {
      val t = 0.8
      // light prep + immediate fp groupBy: docsSpread measured neutral here
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), array_sort(tokens).as("toks"))
        .withColumn("fp", tokenFp)
        .withColumn("is_new", col("doc_id") % 5 === 0)
      // one group per distinct token set; members split by side (a token
      // set present on both sides is an exact cross-side duplicate)
      val groups = docs.groupBy(col("fp"))
        .agg(first(col("toks")).as("toks"),
          sort_array(collect_list(when(col("is_new"), col("doc_id"))))
            .as("new_members"),
          count(when(!col("is_new"), lit(1))).as("n_old"))
        .tracked
      // Candidate generation runs over COMPACT 64-bit group ids
      // (xxhash64 of the fp), not the 32-char md5 strings: the band
      // join's pre-distinct output is ~10 pair rows per true candidate
      // (similar docs share many bands), and profiling at 10x scale put
      // 19x growth in the distinct's shuffle of string pairs — the one
      // superlinear phase (STRETCH_r9 d08 1.395). Long pairs shrink that
      // shuffle ~8x. Round 16 extends this to the SIGNATURE CORE: with
      // gid-fp injectivity proven on the corpus (the fused gate below),
      // the whole core keys on the long gid and the band cache never
      // carries the md5 string (its build exchange was 40.9 of d08's
      // 49.6 sf1 MB — 32 string bytes riding every band row). Without
      // injectivity the core keys on fp exactly as before, so the legacy
      // path's collision story is unchanged: a gid collision only ADDS
      // candidate rows, every candidate is exact-verified over the real
      // token arrays below, and side-restricted rep resolution settles
      // the rest.
      // count + gid-injectivity in ONE driver action (the distinct-gid
      // leg is only decision-relevant when nGroups is small, where it is
      // trivially cheap; at sizes past the broadcast gate the fused agg
      // costs one distinct over gids, noise next to the corpus pass)
      val gcnt = labeled(s, "d08: groups count+gid-injectivity")(groups
        .agg(count(lit(1)), count_distinct(xxhash64(col("fp")))).head())
      val nGroups = gcnt.getLong(0)
      val fused = !referencePlan(s) && nGroups * 1100L < (256L << 20) &&
        gcnt.getLong(1) == nGroups
      // the core's group key: the injective long gid when proven, else
      // the md5 string (a collision would merge two groups' token sets
      // INSIDE the core, which nothing downstream could tolerate)
      val keyExpr = if (fused) xxhash64(col("fp")) else col("fp")
      // gid as candidates carry it: already the key when fused, else
      // compacted from the string at the last moment (as in r9-r15)
      def gidOf(gkey: org.apache.spark.sql.Column) =
        if (fused) gkey else xxhash64(gkey)
      val (expInt, repsInt, bands, vocabSize, dictOf) =
        tokenSignatures(s, groups.select(keyExpr.as("gkey"), col("toks")),
          "gkey")
      val sides = groups.select(keyExpr.as("gkey"), col("fp"),
        (size(col("new_members")) > 0).as("is_batch"),
        (col("n_old") > 0).as("is_corpus"))
      // FIRST-SHARED-BAND unique emission (round 15, the d03 lesson
      // applied to the LSH band join): similar pairs agree on MANY of
      // the 32 bands, so the pre-distinct band-hit stream ran ~13x the
      // candidate count (101.8M rows / 1221 MB at sf1, 96% of d08's
      // shuffle) and the copies land in different band-key partitions
      // where no partial aggregate merges them. With the per-group
      // band-key hashes broadcast (sorted gids + 32 kh strides), the
      // join keeps a copy iff ITS band is the pair's first shared band —
      // each pair leaves the join exactly once and the distinct exchange
      // disappears. Gated on (a) the table fitting executor memory and
      // (b) gid-fp injectivity verified on the actual corpus; the legacy
      // distinct path stays the fallback and the reference leg.
      val sigBc: Option[org.apache.spark.broadcast.Broadcast[
          org.apache.spark.sql.graft.SigTable]] =
        if (!fused) None
        else {
          // per-band kh values, stride 1 (see tokenSignatures) — the
          // same equality the narrow band join tests
          val rows = labeled(s, "d08: sig-table collect")(
            bands.select(col("gkey"), col("band"), col("kh")).collect())
          val ids = rows.map(_.getLong(0)).distinct.sorted
          val idx = new java.util.HashMap[Long, Integer](ids.length * 2)
          ids.zipWithIndex.foreach { case (g0, i) => idx.put(g0, i) }
          val nBands = NumHashes / BandR
          val flat = new Array[Long](ids.length * nBands)
          rows.foreach { r =>
            flat(idx.get(r.getLong(0)).intValue * nBands + r.getInt(1)) =
              r.getLong(2)
          }
          Some(s.sparkContext.broadcast(new org.apache.spark.sql.graft
            .SigTable(ids, flat, 1, nBands)))
        }
      // fused branch: broadcast the sides join so the band cache's
      // (band, kh) partitioning reaches both self-join inputs untouched —
      // the join reads co-partitioned InMemoryTableScans, no exchange.
      // sides is nGroups-bounded by the same gate as the sig broadcast.
      val sidesFlags = sides.select(col("gkey"),
        col("is_batch"), col("is_corpus"))
      val banded = bands
        .join(if (fused) broadcast(sidesFlags) else sidesFlags, "gkey")
        .select(gidOf(col("gkey")).as("gid"), col("band"), col("kh"),
          col("nt"), col("is_batch"), col("is_corpus"))
      // asymmetric band join: batch bands probe corpus bands; size-ratio
      // bound inside the join as in d02 (J>=0.8 forces |A|/|B| in
      // [0.8, 1.25], so dropping these rows cannot lose a true pair).
      // The nt bound is per-PAIR (band-independent), so it holds at the
      // first-shared-band copy whenever it holds at any copy.
      val bandCond =
        col("x.band") === col("y.band") && col("x.kh") === col("y.kh") &&
          col("x.nt") >= col("y.nt") * t - 0.5 &&
          col("y.nt") >= col("x.nt") * t - 0.5
      // explicit NUMBERED repartition by band key pins the join stage's
      // parallelism (the d05 lesson, kept UNCONDITIONAL from r15): the
      // asymmetric batch x corpus enumeration is CPU-quadratic inside
      // dense band buckets while its input is a few MB, so byte-based
      // AQE coalescing collapses it to 1-2 tasks — measured at sf0.1
      // both in r15 (17 s of runSum behind a 3 s single-task wall) and
      // again in r16 with the narrow rows (7.8 s unpinned vs 4.2 s
      // pinned; unlike d02's symmetric self-join, AQE does not rescue
      // this shape with a broadcast). REPARTITION_BY_NUM is
      // coalesce-exempt and hash-satisfies the join's distribution; the
      // rows crossing it shrank from (md5 string + 4-long struct) to
      // (long gid, int band, long kh).
      val np = s.sparkContext.defaultParallelism
      def pin(df: DataFrame): DataFrame =
        df.repartition(np, col("band"), col("kh"))
      val candidates = (sigBc match {
        case Some(bc) =>
          pin(banded.filter(col("is_batch"))).as("x")
            .join(pin(banded.filter(col("is_corpus"))).as("y"),
              bandCond && graft.functions.VectorFunctions
                .pair_first_shared_band(col("x.gid"), col("y.gid"), bc) ===
                col("x.band"))
            .select(col("x.gid").as("ga"), col("y.gid").as("gb"))
        case None =>
          banded.filter(col("is_batch")).as("x")
            .join(banded.filter(col("is_corpus")).as("y"), bandCond)
            .select(col("x.gid").as("ga"), col("y.gid").as("gb"))
            .distinct()
      })
      PairStats.lastCandidates.put("d08", candidates)
      // side-restricted rep resolution: ga resolves against BATCH reps
      // and gb against CORPUS reps only. Without the gb restriction, a
      // 64-bit gid collision between a corpus fp and a batch-only fp
      // would score a batch-batch jaccard as a corpus best_jaccard —
      // a collision class exact verification cannot settle, because it
      // checks the similarity value, not side membership.
      val gidReps = repsInt.join(sides, "gkey")
        .select(gidOf(col("gkey")).as("gid"), col("fp"), col("tids"),
          col("is_batch"), col("is_corpus"))
      // MAP-SIDE verify (round 15, the d03 fused-verify pattern): with
      // gid-fp injectivity already proven on this corpus (the sigBc
      // gate), a broadcast gid->token-mask table answers the exact
      // jaccard per candidate row in the stage that emitted it — no
      // fetch joins, no candidate exchange (the 13.3M-pair ga shuffle
      // was d08's residual 138 MB). Side restriction is subsumed by
      // injectivity: each gid resolves to exactly one fp's set. The
      // per-ga max shrinks map-side before the one tiny fp join.
      // Vocabulary gate as in d03 (masks need a <=65536 dictionary).
      val maskBc: Option[org.apache.spark.broadcast.Broadcast[
          org.apache.spark.sql.graft.MaskTable]] =
        if (sigBc.isEmpty || vocabSize > 65536) None
        else {
          // sorted dictionary from the CACHED vocab — see the d02 note
          val dict = dictOf()
          val nW = math.max(1L, (vocabSize + 63) / 64).toInt
          val rows = labeled(s, "d08: mask-table collect")(
            gidReps.select(col("gid"), graft.functions
                .VectorFunctions.sorted_ids_to_mask(col("tids"), dict))
              .collect()).sortBy(_.getLong(0))
          val ids = rows.map(_.getLong(0))
          val flat = new Array[Long](ids.length * nW)
          var i = 0
          while (i < rows.length) {
            val m = rows(i).getSeq[Long](1)
            var wd = 0
            while (wd < nW) { flat(i * nW + wd) = m(wd); wd += 1 }
            i += 1
          }
          Some(s.sparkContext.broadcast(new org.apache.spark.sql.graft
            .MaskTable(ids, flat, nW, Array.empty)))
        }
      val verified = maskBc match {
        case Some(bc) =>
          candidates
            .withColumn("j", graft.functions.VectorFunctions
              .pair_mask_jaccard(col("ga"), col("gb"), bc))
            .filter(col("j") >= t)
            .groupBy(col("ga")).agg(max(col("j")).as("j"))
            .join(gidReps.filter(col("is_batch"))
              .select(col("gid").as("ga"), col("fp")), "ga")
            .select(col("fp"), col("j"))
        case None =>
          candidates
            .join(gidReps.filter(col("is_batch"))
              .select(col("gid").as("ga"), col("fp").as("fa"),
                col("tids").as("ta")), "ga")
            .join(gidReps.filter(col("is_corpus"))
              .select(col("gid").as("gb"), col("tids").as("tb")), "gb")
            .withColumn("j", graft.functions.VectorFunctions
              .sorted_jaccard(col("ta"), col("tb")))
            .filter(col("j") >= t)
            .select(col("fa").as("fp"), col("j"))
      }
      // exact cross-side duplicate: identical token set => J = 1 exactly
      val exact = groups
        .filter(size(col("new_members")) > 0 && col("n_old") > 0)
        .select(col("fp"), lit(1.0).as("j"))
      val best = verified.unionByName(exact)
        .groupBy("fp").agg(max(col("j")).as("best_jaccard"))
      groups.filter(size(col("new_members")) > 0)
        .select(col("fp"), explode(col("new_members")).as("doc_id"))
        .join(best, "fp")
        .select(col("doc_id"), col("best_jaccard"))
        .orderBy("doc_id")
    },
      Some(oIncremental)),

    // The STEADY STATE of incremental dedup: the corpus signatures live
    // in PERSISTED gpx tables (content-keyed like every cachedDir
    // materialization) and each batch signs only ITSELF, probes the
    // stored band index with an equality join, and exactly verifies the
    // few candidates over stored token strings — v06's persisted-IVF
    // pattern applied to text dedup. At 100 TB the difference vs d08 is
    // the whole point: the corpus is never re-tokenized, re-hashed or
    // re-shuffled per batch; batch cost is O(batch + candidates).
    // Same result set and SAME ORACLE as d08.
    GQuery("d10_indexed_incremental_dedup", (s, d) => {
      val t = 0.8
      val idx = FormatOps.cachedDir(d, "dedup_sigidx4") { dir =>
        val corpus = Tables.documents(s, d)
          .filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), array_sort(tokens).as("toks"))
          .withColumn("fp", tokenFp)
        val cgroups = corpus.groupBy(col("fp"))
          .agg(first(col("toks")).as("toks"))
          .tracked
        pureBands(cgroups, "fp")
          .write.format("gpx").mode("overwrite").save(s"$dir/banded")
        // token sets PRE-AGGREGATED into the index: one row per fp with
        // the sorted tokens joined on a SPACE, the one injective separator
        // (tokens come from splitting on spaces, so no token contains
        // one; any OTHER byte can occur inside a token and would decode
        // to a different set, skewing the jaccard). The steady-state
        // probe then verifies candidates with a split — no per-run
        // collect_list regroup, no shuffle of the corpus token stream.
        // This raw form stays the reference/fallback verify tier.
        cgroups.select(col("fp"),
          concat_ws(" ", col("toks")).as("toks_s"))
          .write.format("gpx").mode("overwrite").save(s"$dir/tokens")
        // the varint WIRE tier (round 15): corpus vocabulary as a sorted
        // dictionary plus each set pre-encoded as a delta-varint rank
        // stream (~1-2 B/token vs ~8+len for the raw arrays the fetch
        // joins previously dragged — d10 was the sf1 registry's top
        // shuffle producer at 2593 MB, 2413 of them one exchange whose
        // candidate rows each carried fp + a full array<string>).
        // Bounded corpora only: past 64k distinct tokens the dictionary
        // stops being an expression-reference-sized object and the raw
        // string form is the honest representation (same 65536 gate and
        // rationale as d03's rank tiers).
        val dictDf = cgroups
          .select(explode(col("toks")).as("tok")).distinct()
        if (dictDf.count() <= 65536) {
          val dictArr = dictDf.collect().map(_.getString(0))
          cgroups.select(col("fp"), graft.functions.VectorFunctions
              .sorted_tokens_to_varint(col("toks"), dictArr).as("vb"))
            .write.format("gpx").mode("overwrite").save(s"$dir/varint")
          dictDf.coalesce(1)
            .write.format("gpx").mode("overwrite").save(s"$dir/dict")
        }
        cgroups.select(col("fp"))
          .write.format("gpx").mode("overwrite").save(s"$dir/reps")
      }
      val corpusBanded = s.read.format("gpx").load(s"$idx/banded")
      val corpusTokens = s.read.format("gpx").load(s"$idx/tokens")
      val corpusReps = s.read.format("gpx").load(s"$idx/reps")
      // batch side, signed fresh (it is the only thing signed)
      val bgroups = docsSpread(s, d)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), array_sort(tokens).as("toks"))
        .withColumn("fp", tokenFp)
        .groupBy(col("fp"))
        .agg(first(col("toks")).as("toks"),
          sort_array(collect_list(col("doc_id"))).as("members"))
        .tracked
      val bband = pureBands(bgroups.select(col("fp"), col("toks")), "fp")
      val hEq = (0 until BandR)
        .map(r => col(s"x.h$r") === col(s"y.h$r")).reduce(_ && _)
      // the BATCH side broadcasts by definition of the steady state (a
      // nightly batch is orders of magnitude smaller than the corpus):
      // the persisted band index streams through a broadcast hash join —
      // the corpus is never shuffled, the probe's exchange carries only
      // the batch signatures + matched candidates
      // reference leg: shuffle join instead — answers must not depend on
      // the join strategy (DedupSf1Gate hash-compares both)
      val bbandSide =
        if (referencePlan(s)) bband else broadcast(bband)
      // candidate pairs travel as COMPACT 64-bit gids, not 32-char md5
      // strings — the d08 lesson applied to the indexed path after the
      // round-14 StageGate shuffle stamp ranked d10 the registry's top
      // shuffle producer at sf1 (2993 MB, mostly the pre-distinct band
      // hits and the two verify fetch joins dragging string pairs).
      // EXACTNESS IS PRESERVED by the same argument as d08: a gid
      // collision only ADDS candidate rows; the batch fetch resolves ga
      // against BATCH groups only and the corpus fetch resolves gb
      // against the CORPUS index only, so every extra row is a genuine
      // (batch, corpus) pair exact-verified over the real token sets —
      // a subset of the all-pairs contract the oracle computes.
      // FIRST-SHARED-BAND unique emission (round 15, after the varint
      // work left the pre-distinct band-hit stream as d10's remaining
      // shuffle): a broadcast SigTable over batch ∪ corpus group
      // signatures lets the probe keep a hit iff ITS band is the pair's
      // first shared band, so the distinct exchange disappears. The
      // signatures come from the PERSISTED band sidecar (one bounded
      // driver read of ~34 B/group, not a corpus re-tokenization), so
      // the steady-state batch-cost contract stands; the gate is the
      // same 256 MiB executor-memory bound as d08's plus gid
      // injectivity over the UNION of both sides' fps (the collision
      // class the side-restricted verify cannot settle alone when the
      // emission predicate consults merged signatures). Past the gate —
      // and on the reference leg — the enumerate-then-distinct path
      // stands unchanged.
      val uc = bgroups.select(col("fp"))
        .union(corpusReps.select(col("fp")))
        .agg(count_distinct(col("fp")),
          count_distinct(xxhash64(col("fp")))).head()
      val sigBc10: Option[org.apache.spark.broadcast.Broadcast[
          org.apache.spark.sql.graft.SigTable]] =
        if (referencePlan(s) || uc.getLong(0) * 1100L >= (256L << 20) ||
            uc.getLong(1) != uc.getLong(0)) None
        else {
          val rows = bband.unionByName(corpusBanded)
            .select(xxhash64(col("fp")).as("gid"), col("band"),
              col("h0"), col("h1"), col("h2"), col("h3")).collect()
          val ids = rows.map(_.getLong(0)).distinct.sorted
          val idx = new java.util.HashMap[Long, Integer](ids.length * 2)
          ids.zipWithIndex.foreach { case (g0, i) => idx.put(g0, i) }
          val flat = new Array[Long](ids.length * NumHashes)
          rows.foreach { r =>
            val o = idx.get(r.getLong(0)).intValue * NumHashes +
              r.getInt(1) * BandR
            flat(o) = r.getLong(2); flat(o + 1) = r.getLong(3)
            flat(o + 2) = r.getLong(4); flat(o + 3) = r.getLong(5)
          }
          Some(s.sparkContext.broadcast(new org.apache.spark.sql.graft
            .SigTable(ids, flat, BandR, NumHashes / BandR)))
        }
      val candBase =
        col("x.band") === col("y.band") && hEq &&
          col("x.fp") =!= col("y.fp") &&
          col("x.nt") >= col("y.nt") * t - 0.5 &&
          col("y.nt") >= col("x.nt") * t - 0.5
      val cand = (sigBc10 match {
        case Some(bc) =>
          bbandSide.as("x").join(corpusBanded.as("y"),
              candBase && graft.functions.VectorFunctions
                .pair_first_shared_band(xxhash64(col("x.fp")),
                  xxhash64(col("y.fp")), bc) === col("x.band"))
            .select(xxhash64(col("x.fp")).as("ga"),
              xxhash64(col("y.fp")).as("gb"))
        case None =>
          bbandSide.as("x").join(corpusBanded.as("y"), candBase)
            .select(xxhash64(col("x.fp")).as("ga"),
              xxhash64(col("y.fp")).as("gb"))
            .distinct()
      })
      // exact verification bounded by the candidate set. Preferred tier
      // (round 15): VARINT rank streams — the corpus side was encoded
      // once at index build against its own vocabulary (every token
      // in-dict by construction), the batch side encodes map-side with
      // novel tokens carried as an exact out-of-dict COUNT (they can
      // intersect nothing in the corpus), and the join order keeps every
      // payload off the wide exchange: cand rows cross the gb shuffle as
      // two bare longs, the corpus varints join there at ~1-2 B/token,
      // and the batch payload rides a broadcast. The raw string tier
      // below remains for unbounded vocabularies (no dict in the index)
      // and as the deliberately-divergent reference leg DedupSf1Gate
      // hash-compares.
      val haveVarint = new java.io.File(s"$idx/dict").exists()
      val useVarint = haveVarint && !referencePlan(s) &&
        !s.conf.getOption("spark.graft.dedup.d10VerifyTier").contains("array")
      // with unique emission AND a bounded varint sidecar, the WHOLE
      // corpus varint table broadcasts (gate: its measured bytes, one
      // cheap agg over the index — no dependence on the candidate set)
      // and the candidate stream never leaves its emitting stage: no
      // distinct exchange, no cand exchange, no cache materialization —
      // cand is consumed exactly once, so it is only `.tracked` when a
      // fallback tier reads it twice (the semi-join prefilters below).
      val varTblBytes: Long =
        if (!useVarint || sigBc10.isEmpty) Long.MaxValue
        else s.read.format("gpx").load(s"$idx/varint")
          .agg(coalesce(sum(length(col("vb"))), lit(0L)) +
            count(lit(1)) * lit(24L)).head().getLong(0)
      val onePass = varTblBytes < (64L << 20)
      val candS = if (onePass) cand else cand.tracked
      PairStats.lastCandidates.put("d10", candS)
      val verified = if (useVarint) {
        val dictArr = s.read.format("gpx").load(s"$idx/dict")
          .collect().map(_.getString(0))
        val varTbl = s.read.format("gpx").load(s"$idx/varint")
        val cvSide =
          if (onePass)
            broadcast(varTbl.select(xxhash64(col("fp")).as("gb"), col("vb")))
          else varTbl
            .select(xxhash64(col("fp")).as("gb"), col("vb"))
            .join(broadcast(candS.select(col("gb")).distinct()), "gb")
        val bVar = bgroups.select(xxhash64(col("fp")).as("ga"), col("fp"),
          graft.functions.VectorFunctions
            .sorted_tokens_to_varint(col("toks"), dictArr).as("va"))
        candS
          .join(cvSide, "gb")
          .join(broadcast(bVar), "ga")
          .withColumn("j", graft.functions.VectorFunctions
            .varint_jaccard_ex(col("va"), col("vb")))
          .filter(col("j") >= t)
          .select(col("fp"), col("j"))
      } else {
        // raw-string tier: semi-join + split per candidate row, zero
        // aggregation (the index stores each fp's sorted token set as one
        // joined string; an empty set round-trips as an empty array)
        val ctoks = corpusTokens
          .select(xxhash64(col("fp")).as("gb"), col("toks_s"))
          .join(broadcast(candS.select(col("gb")).distinct()), "gb")
          .select(col("gb"),
            // split-on-space yields >= 1 element, so the EMPTY set is
            // unreachable; the only set serializing to "" is [""] — decode
            // it back exactly (an empty array here would diverge from the
            // batch side's [""] and skew the jaccard for empty-token docs)
            when(col("toks_s") === "", array(lit("")))
              .otherwise(split(col("toks_s"), " ")).as("ctoks"))
        candS
          .join(bgroups.select(xxhash64(col("fp")).as("ga"), col("fp"),
            col("toks").as("btoks")), "ga")
          .join(ctoks, "gb")
          .withColumn("j",
            size(array_intersect(col("btoks"), col("ctoks"))).cast(DoubleType) /
              size(array_union(col("btoks"), col("ctoks"))))
          .filter(col("j") >= t)
          .select(col("fp"), col("j"))
      }
      // identical token set present in the index => exact dup, J = 1
      val exact = bgroups.join(corpusReps, Seq("fp"), "leftsemi")
        .select(col("fp"), lit(1.0).as("j"))
      val best = verified.unionByName(exact)
        .groupBy("fp").agg(max(col("j")).as("best_jaccard"))
      bgroups
        .select(col("fp"), explode(col("members")).as("doc_id"))
        .join(best, "fp")
        .select(col("doc_id"), col("best_jaccard"))
        .orderBy("doc_id")
    },
      Some(oIncremental)),

    // Benchmark decontamination — the eval-overlap screen every training
    // corpus needs before release: flag corpus documents sharing any
    // 5-token shingle with a benchmark/eval set (doc_id % 29 = 0 here
    // stands in for the external eval table), with the matched-shingle
    // count as the contamination strength. 100 TB shape: a REAL eval
    // suite is a fixed few MBs, so its distinct-gram set auto-broadcasts
    // and the corpus never shuffles — grams generate map-side (explode
    // inside the scan stage), the broadcast hash join filters them in
    // place, and only matched (doc, gram) pairs — a vanishing fraction
    // of the corpus — reach the final groupBy. The broadcast is left to
    // the optimizer (NOT a forced hint): this stand-in bench side grows
    // with the corpus, and forcing it past autoBroadcastJoinThreshold
    // would OOM the driver at stretch scale; a fixed-size production
    // suite broadcasts automatically. Exact containment (not
    // similarity): a single shared shingle flags the doc, which is the
    // standard n-gram decontamination contract.
    GQuery("d09_decontaminate", (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      // size guard: Spark's sequence(1, n) is DESCENDING for n < 1,
      // which would fabricate grams for 4-token docs
      val grams = toks.filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 4)," +
            " i -> concat_ws(' ', slice(t, i, 5)))")).as("g"))
      val bench = grams.filter(col("doc_id") % 29 === 0)
        .select(col("g")).distinct()
      grams.filter(col("doc_id") % 29 =!= 0)
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(count_distinct(col("g")).as("n_hit_grams"))
        .orderBy("doc_id")
    },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |grams AS (
             |  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
             |  FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)),
             |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0)
             |SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_hit_grams
             |FROM grams c JOIN bench b ON c.g = b.g
             |WHERE c.doc_id % 29 <> 0
             |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin))
  )
}
