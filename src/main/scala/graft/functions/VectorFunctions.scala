package graft.functions

import org.apache.spark.sql.Column

/** Public column API for graft's native Catalyst expressions. */
object VectorFunctions {
  /** Cosine similarity of two array<double> columns — codegen'd native
    * expression (org.apache.spark.sql.graft.CosineSimilarity). */
  def cos_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.cos_sim(a, b)

  /** Exact Jaccard of two sorted distinct array<long> columns — one
    * allocation-free merge pass per pair, codegen'd
    * (org.apache.spark.sql.graft.SortedJaccard). */
  def sorted_jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.sorted_jaccard(a, b)

  def trigram_ids(s: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.trigram_ids(s)

  /** Exact Jaccard of two fixed-width array<long> bitmasks —
    * popcount(AND)/popcount(OR) in one fused codegen'd pass
    * (org.apache.spark.sql.graft.MaskJaccard). */
  def mask_jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.mask_jaccard(a, b)

  /** Fixed-width array<long> bitmask from 1-based bit positions
    * (org.apache.spark.sql.graft.PositionsToMask). */
  def positions_to_mask(ps: Column, nWords: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.positions_to_mask(ps, nWords)

  /** Delta-varint rank stream (binary) of a sorted distinct array<long>
    * against a sorted dictionary — the compact verify payload when the
    * set side cannot broadcast
    * (org.apache.spark.sql.graft.SortedIdsToVarint). */
  def sorted_ids_to_varint(ids: Column, dict: Array[Long]): Column =
    org.apache.spark.sql.graft.VectorExpressions.sorted_ids_to_varint(ids, dict)

  /** Exact Jaccard of two delta-varint rank streams — one streaming
    * decode-merge per pair (org.apache.spark.sql.graft.VarintJaccard). */
  def varint_jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.varint_jaccard(a, b)

  /** Bitmask with bit positions remapped through a canonical-order
    * permutation (org.apache.spark.sql.graft.SortedIdsToMaskPermuted);
    * jaccard-equivalent to sorted_ids_to_mask. */
  def sorted_ids_to_mask_permuted(ids: Column, dict: Array[Long],
      perm: Array[Int], nWords: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .sorted_ids_to_mask_permuted(ids, dict, perm, nWords)

  /** The id of two documents' canonically-first shared set element,
    * looked up in a BROADCAST flat mask table — the unique-emission
    * predicate for prefix-join candidate enumeration
    * (org.apache.spark.sql.graft.PairMinSharedGid). */
  def pair_min_shared_gid(a: Column, b: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.sql.graft.MaskTable]): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .pair_min_shared_gid(a, b, bc)

  /** Exact jaccard straight off the broadcast mask table — map-side
    * verify over bare (a_id, b_id) candidate rows, zero fetch joins
    * (org.apache.spark.sql.graft.PairMaskJaccard). */
  def pair_mask_jaccard(a: Column, b: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.sql.graft.MaskTable]): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .pair_mask_jaccard(a, b, bc)

  /** The first band on which two documents' minhash signatures agree,
    * from a broadcast signature table — unique emission for LSH band
    * self-joins (org.apache.spark.sql.graft.PairFirstSharedBand). */
  def pair_first_shared_band(a: Column, b: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.sql.graft.SigTable]): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .pair_first_shared_band(a, b, bc)

  /** Delta-varint rank stream of a sorted distinct array<string> against
    * a string dictionary, with an out-of-dict COUNT header — the exact
    * compact payload for incremental dedup where a batch carries tokens
    * the corpus dictionary has never seen
    * (org.apache.spark.sql.graft.SortedTokensToVarint). */
  def sorted_tokens_to_varint(toks: Column, dict: Array[String]): Column =
    org.apache.spark.sql.graft.VectorExpressions.sorted_tokens_to_varint(toks, dict)

  /** Exact Jaccard of two sorted_tokens_to_varint streams — rank merge
    * plus out-of-dict headers; sound when at most one side can carry
    * out-of-dict tokens (org.apache.spark.sql.graft.VarintJaccardEx). */
  def varint_jaccard_ex(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.varint_jaccard_ex(a, b)

  /** Fixed-width array<long> bitmask from a sorted-distinct id array and
    * a sorted dictionary, computed map-side with zero joins
    * (org.apache.spark.sql.graft.SortedIdsToMask). */
  def sorted_ids_to_mask(ids: Column, dict: Array[Long]): Column =
    org.apache.spark.sql.graft.VectorExpressions.sorted_ids_to_mask(ids, dict)

  def minhash_sigs(a: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.minhash_sigs(a, numHashes)

  /** fused minhash + band-key grouping: array<struct<band,h0..h{r-1}>>
    * with the exact [[minhash_sigs]] minima — no intermediate signature
    * array per row (the dedup band joins' hottest projection) */
  def minhash_bands(a: Column, numHashes: Int, bandR: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.minhash_bands(a, numHashes, bandR)

  def simhash32(a: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.simhash32(a)

  /** Raw inner product of two array<double> columns — the MIPS scoring
    * kernel, codegen'd (org.apache.spark.sql.graft.DotProduct). */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dot_product(a, b)

  /** All random-hyperplane LSH signatures of an array<double> vector in
    * one codegen'd pass: `tables` ints of `bits` sign-bits over a flat
    * row-major (tables*bits) x dim plane matrix
    * (org.apache.spark.sql.graft.HyperplaneSigs). */
  def hyperplane_sigs(v: Column, planes: Array[Double],
      tables: Int, bits: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .hyperplane_sigs(v, planes, tables, bits)

  /** Exact partial-aggregatable top-k: the k highest-scored (score, id)
    * pairs per group as array<struct<score,id>> best-first — map-side
    * buffers hold at most k rows, so the exchange carries
    * O(groups x partitions x k) rows instead of every candidate
    * (org.apache.spark.sql.graft.TopKByScore). */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.TopKAggregate.topk_by_score(score, id, k)

  /** Map-side nearest-centroid id under cosine against a flat K x dim
    * literal centroid matrix; ties and invalid inputs resolve to the
    * lowest cid (org.apache.spark.sql.graft.NearestCentroid). */
  def nearest_centroid(v: Column, norm: Column,
      cents: Array[Double], cnorms: Array[Double]): Column =
    org.apache.spark.sql.graft.VectorExpressions
      .nearest_centroid(v, norm, cents, cnorms)

  /** Partial-aggregatable elementwise vector sum + well-formed row count:
    * struct<sums array<double>, n bigint>, the one-exchange k-means mean
    * step (org.apache.spark.sql.graft.VecSumCount). */
  def vec_sum_count(v: Column): Column =
    org.apache.spark.sql.graft.TopKAggregate.vec_sum_count(v)
}
