package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM training-data pipelines (beyond the
  * reference's surface; BASELINE.json north star). All are partition-local
  * map operations — no shuffle, no driver state — so they scale linearly
  * with data volume on any cluster.
  *
  * Determinism: every measure is integer-derived (lengths, replace-trick
  * occurrence counts) or an exact ratio of integers evaluated in double,
  * so Spark and DuckDB agree bit-for-bit.
  */
object TextOps {

  /** Occurrence count of word w in text via the padded replace trick:
    * identical semantics in Spark SQL and DuckDB (both non-overlapping
    * left-to-right replace). */
  private[operators] def cnt(w: String): Column =
    ((length(concat(lit(" "), col("text"), lit(" "))) -
      length(expr(s"replace(concat(' ', text, ' '), ' $w ', '')"))) /
      lit(w.length + 2)).cast(IntegerType)

  private[operators] def oCnt(w: String): String =
    s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) / ${w.length + 2} AS INT)"

  // language -> marker stopwords (simple n-gram/stopword heuristic)
  private[operators] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"))

  val queries: Seq[GQuery] = Seq(

    // Language identification: stopword-marker scoring with a fixed
    // argmax tie-break order.
    GQuery("t01_langid", (s, d) => {
      val scored = markers.foldLeft(Tables.documents(s, d)) {
        case (df, (lang, ws)) =>
          df.withColumn(s"${lang}_score",
            ws.map(cnt).reduce(_ + _))
      }
      val Seq(en, es, de, fr) =
        Seq("en_score", "es_score", "de_score", "fr_score").map(col)
      scored.withColumn("predicted",
          when(en >= es && en >= de && en >= fr, "en")
            .when(es >= de && es >= fr, "es")
            .when(de >= fr, "de")
            .otherwise("fr"))
        .select("doc_id", "en_score", "es_score", "de_score", "fr_score", "predicted")
        .orderBy("doc_id")
    },
      Some {
        val sc = markers.map { case (lang, ws) =>
          s"${ws.map(oCnt).mkString(" + ")} AS ${lang}_score"
        }.mkString(",\n  ")
        s"""SELECT doc_id, en_score, es_score, de_score, fr_score,
           |  CASE WHEN en_score >= es_score AND en_score >= de_score AND en_score >= fr_score THEN 'en'
           |       WHEN es_score >= de_score AND es_score >= fr_score THEN 'es'
           |       WHEN de_score >= fr_score THEN 'de'
           |       ELSE 'fr' END AS predicted
           |FROM (SELECT doc_id,
           |  $sc
           |FROM documents) t
           |ORDER BY doc_id""".stripMargin
      }),

    // Quality scoring: token count, average token length, stopword ratio.
    GQuery("t02_quality_score", (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens",
          (length(trim(col("text"))) - length(expr("replace(trim(text), ' ', '')")) + 1).cast(IntegerType))
        .withColumn("n_alpha", length(expr("replace(trim(text), ' ', '')")).cast(IntegerType))
        .withColumn("stop_hits", cnt("the") + cnt("and") + cnt("a"))
        .withColumn("avg_token_len", col("n_alpha").cast(DoubleType) / col("n_tokens"))
        .withColumn("stop_ratio", col("stop_hits").cast(DoubleType) / col("n_tokens"))
        .select("doc_id", "n_tokens", "avg_token_len", "stop_ratio")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, n_tokens,
              |  CAST(n_alpha AS DOUBLE) / n_tokens AS avg_token_len,
              |  CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio
              |FROM (SELECT doc_id,
              |  CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS INT) AS n_tokens,
              |  CAST(length(replace(trim(text), ' ', '')) AS INT) AS n_alpha,
              |  ${oCnt("the")} + ${oCnt("and")} + ${oCnt("a")} AS stop_hits
              |FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    // Token statistics: total and distinct token counts per document, plus
    // corpus-level rollup by language.
    GQuery("t03_token_stats", (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .groupBy("lang")
        .agg(
          sum(size(col("toks"))).as("total_tokens"),
          sum(size(array_distinct(col("toks")))).as("total_distinct"),
          count(lit(1)).as("n_docs"),
          max(size(col("toks"))).as("max_tokens"))
        .orderBy("lang"),
      Some("""SELECT lang,
             |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |  CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS total_distinct,
             |  COUNT(*) AS n_docs,
             |  CAST(MAX(len(string_split(text, ' '))) AS INT) AS max_tokens
             |FROM documents GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // BPE-ish token counting: a GPT-2-style pre-tokenizer splits letter
    // runs, digit runs, and punctuation runs into separate tokens before
    // byte-pair merging; counting those runs approximates the BPE token
    // count without a merges table. The alternation's branches are
    // disjoint on their first character, so Java (Spark) and RE2 (DuckDB)
    // tokenize identically — partition-local expression math, no shuffle
    // until the per-language rollup.
    GQuery("t06_bpe_tokens", (s, d) => {
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"
      // "source:id text" framing: the corpus text is pure letters+spaces,
      // so the header's digits/punctuation are what exercises run
      // splitting (a web-crawl doc carries exactly this kind of framing)
      Tables.documents(s, d)
        .select(col("lang"),
          concat(col("source"), lit(":"), col("doc_id"), lit(" "), col("text"))
            .as("framed"))
        .select(col("lang"),
          size(split(col("framed"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("framed"), lit(pat), lit(0))).as("bpe_tokens"))
        .groupBy("lang")
        .agg(sum(col("ws_tokens")).as("ws_total"),
          sum(col("bpe_tokens")).as("bpe_total"),
          max(col("bpe_tokens")).as("bpe_max"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    },
      Some("""WITH f AS (SELECT lang,
             |    source || ':' || doc_id || ' ' || text AS framed
             |  FROM documents)
             |SELECT lang,
             |  CAST(SUM(len(string_split(framed, ' '))) AS BIGINT) AS ws_total,
             |  CAST(SUM(len(regexp_extract_all(framed, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))) AS BIGINT) AS bpe_total,
             |  CAST(MAX(len(regexp_extract_all(framed, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))) AS INT) AS bpe_max,
             |  COUNT(*) AS n_docs
             |FROM f GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // Stratified sampling — the curation op that balances a training mix:
    // per-language keep rates applied via a DETERMINISTIC multiplicative
    // hash of the document id (Knuth 2654435761), so the sample is
    // reproducible across engines and runs, partition-local (no shuffle,
    // no RNG state), and any stratum's rate is tunable per key. The
    // filter is pure integer arithmetic evaluated inside the scan stage
    // (codegen'd, partition-local — no shuffle before the sample lands)
    // and oracle-matches exactly; sampling by rand() could do neither.
    GQuery("t07_stratified_sample", (s, d) => {
      // doc_id is reduced mod a prime BEFORE the Knuth multiply: the
      // product stays below 2^62 for ANY int64 id (no ANSI overflow, no
      // engine-divergent wraparound at 100 TB id ranges)
      val keep = "(doc_id % 1000003) * 2654435761 % 1000 < " +
        "CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300 " +
        "WHEN 'fr' THEN 300 ELSE 500 END"
      Tables.documents(s, d)
        .filter(expr(keep))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id, lang, source FROM documents
             |WHERE (doc_id % 1000003) * 2654435761 % 1000 <
             |  CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300
             |    WHEN 'fr' THEN 300 ELSE 500 END
             |ORDER BY doc_id""".stripMargin)),

    // PII-style scrubbing: mask digit runs and long tokens via portable
    // string surgery (translate digits to '#'), report scrub statistics.
    GQuery("t05_scrub", (s, d) =>
      Tables.documents(s, d)
        .withColumn("scrubbed", translate(col("text"), "0123456789", "##########"))
        .withColumn("n_digits",
          (length(col("text")) -
            length(expr("translate(text, '0123456789', '')"))).cast(IntegerType))
        .select(col("doc_id"), col("n_digits"),
          substring(col("scrubbed"), 1, 40).as("scrub_prefix"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(text) - length(translate(text, '0123456789', '')) AS INT) AS n_digits,
             |  substring(translate(text, '0123456789', '##########'), 1, 40) AS scrub_prefix
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // Document fingerprinting: md5 of normalized text + per-source dup stats.
    GQuery("t04_fingerprint", (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(expr("cast(lower(trim(text)) as binary)")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_docs,
             |  COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique
             |FROM documents GROUP BY source
             |ORDER BY source""".stripMargin)),

    // Repetition-based quality signals (the Gopher/C4 family): per document,
    // the duplicate-token fraction, the most-frequent-token fraction, and
    // the duplicate-bigram fraction. High values flag boilerplate/spam for
    // corpus filtering. Token counts take two partial-aggregatable
    // shuffles — one on (doc_id, tok) for the per-token counts, one on
    // doc_id for the rollup — with map-side partials collapsing both;
    // bigram stats are pure array expressions inside the scan stage. All
    // ratios are exact integer-over-integer divisions evaluated in double.
    GQuery("t08_repetition", (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      val cnts = tk.select(col("doc_id"), explode(col("tk")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val tokAgg = cnts.groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
      // guard size<2: Spark sequence(1, 0) would count DOWN, not be empty
      val bg = tk.select(col("doc_id"),
        when(size(col("tk")) >= 2,
          lit(1.0) - size(array_distinct(expr(
            "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")))
            .cast(DoubleType) / (size(col("tk")) - 1))
          .otherwise(lit(0.0)).as("dup_bigram_ratio"))
      tokAgg.join(bg, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          (lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_tokens"))
            .as("dup_token_ratio"),
          (col("top_cnt").cast(DoubleType) / col("n_tokens"))
            .as("top_token_ratio"),
          col("dup_bigram_ratio"))
        .orderBy("doc_id")
    },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
             |cnts AS (SELECT doc_id, tok, COUNT(*) c
             |  FROM (SELECT doc_id, unnest(l) AS tok FROM tk) u
             |  GROUP BY doc_id, tok),
             |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) n_tokens,
             |    COUNT(*) n_distinct, MAX(c) top_cnt
             |  FROM cnts GROUP BY doc_id),
             |bg AS (SELECT doc_id,
             |    CASE WHEN len(l) >= 2 THEN
             |      1.0 - CAST(len(list_distinct(list_transform(range(1, len(l)),
             |        i -> l[i] || ' ' || l[i+1]))) AS DOUBLE) / (len(l) - 1)
             |    ELSE 0.0 END AS dup_bigram_ratio
             |  FROM tk)
             |SELECT ta.doc_id AS doc_id, n_tokens,
             |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_ratio,
             |  CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_ratio,
             |  dup_bigram_ratio
             |FROM ta JOIN bg ON ta.doc_id = bg.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Corpus-order n-gram novelty — the dedup-aware curation signal:
    // what fraction of each document's distinct 5-gram shingles appear
    // for the FIRST time at that document (by doc_id order)? Boilerplate
    // and near-dups score ~0, fresh content ~1; selecting by novelty is
    // the streaming-corpus analog of d06/d07's cluster-then-keep-best.
    // Scale shape: two partial-aggregatable shuffles (gram -> min doc to
    // find first owners, then doc -> counts) and a doc-keyed join of two
    // doc-sized aggregates; the gram-level rows never join back against
    // themselves and nothing is driver-side.
    GQuery("t09_ngram_novelty", (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      // size guard: sequence(1, n) counts DOWN for n < 1
      val grams = toks.filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(t) - 4)," +
            " i -> concat_ws(' ', slice(t, i, 5)))"))).as("g"))
      val num = grams.groupBy("g").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
      val den = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      den.join(num, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          (coalesce(col("n_novel"), lit(0L)).cast(DoubleType) /
            col("n_grams")).as("novelty"))
        .orderBy("doc_id")
    },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
             |  FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)),
             |firsts AS (SELECT g, MIN(doc_id) AS doc_id FROM grams GROUP BY g),
             |num AS (SELECT doc_id, COUNT(*) AS n_novel FROM firsts GROUP BY doc_id),
             |den AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id)
             |SELECT den.doc_id AS doc_id, n_grams,
             |  COALESCE(n_novel, 0) AS n_novel,
             |  CAST(COALESCE(n_novel, 0) AS DOUBLE) / n_grams AS novelty
             |FROM den LEFT JOIN num ON den.doc_id = num.doc_id
             |ORDER BY doc_id""".stripMargin))
  )
}
