package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables => T}

/** LLM-training-data pipeline operators (north star, BASELINE.json:6):
  * dedup, text analysis, JSON extraction, similarity search, array/
  * multimodal column processing. Everything is built from codegen'd
  * built-in functions — no UDFs — so the hot paths stay inside
  * whole-stage codegen.
  */
object LlmPipeline {

  /** Exact dedup keeping the smallest id per duplicate group. Deliberately
    * NOT dropDuplicates (nondeterministic row pick, H6): group-by + min is
    * deterministic and plans identically (hash aggregate). At 100 TB: one
    * shuffle on the dedup key; pre-aggregation collapses per-partition
    * duplicates before the exchange. */
  val dedupExact: Q = Q(
    "q_dedup_exact",
    """SELECT user_id, event_type, value, MIN(event_id) AS keeper, COUNT(*) AS n
      |FROM events GROUP BY user_id, event_type, value
      |ORDER BY user_id, event_type, value""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .groupBy("user_id", "event_type", "value")
      .agg(min(col("event_id")).as("keeper"), count(lit(1)).as("n"))
      .orderBy("user_id", "event_type", "value")
  }

  /** Near-dup detection via normalized-token-multiset digest: docs whose
    * sorted token list md5-collides are duplicates up to word order.
    * Shuffle carries (16-byte digest, id) pairs only — documents
    * themselves never move, which is what makes this viable at 100 TB. */
  val dedupText: Q = Q(
    "q_dedup_text",
    """SELECT digest, COUNT(*) AS n, MIN(doc_id) AS keeper FROM (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(string_split(lower(text), ' ')), ',')) AS digest
      |  FROM documents)
      |GROUP BY digest
      |ORDER BY digest""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        md5(concat_ws(",", sort_array(split(lower(col("text")), " ")))).as("digest"))
      .groupBy("digest")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .orderBy("digest")
  }

  /** Global top-20 token frequency (explode → count → top-k). The heavy
    * groupBy is on the token (bounded vocabulary), and the final top-k is
    * TakeOrderedAndProject — no global sort of the vocabulary. */
  val tokenTopK: Q = Q(
    "q_token_topk",
    """SELECT token, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20)
  }

  /** JSON field extraction from the events.props payload column. Spark's
    * get_json_object is a codegen'd path expression — no full JSON parse
    * materialized per row. */
  val jsonExtract: Q = Q(
    "q_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS bucket,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .groupBy((get_json_object(col("props"), "$.k").cast(IntegerType) % 10).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Dot product of two float-array columns in DOUBLE — the codegen'd
    * native expression (graft.functions.FloatVecDot); same strict
    * left-to-right fold as aggregate(zip_with(...)), so engine-exact. */
  private def dot(s: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column =
    graft.functions.VectorOps.vecDot(s, a, b)

  private def l2(s: org.apache.spark.sql.SparkSession)(a: Column): Column =
    sqrt(dot(s)(a, a))

  /** Brute-force cosine top-k ANN baseline: 5 query vectors (lowest
    * vec_ids) × all candidates. The tiny query side is broadcast; the scan
    * side streams once — at 100 TB this exact plan still works (broadcast
    * nested loop over the fact), and the LSH-bucketed variant in
    * graft.ops.Similarity is the sub-linear path. Scores are rounded to
    * 4 dp (only rounding in the compared surface; float-fold drift is
    * ~1e-15 so boundary flips are negligible). */
  val similarityTopK: Q = Q(
    "q_similarity_topk",
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |s AS (SELECT qid, vec_id,
      |        round(list_inner_product(e, qe) /
      |              (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product(qe, qe))), 4)
      |          AS score
      |      FROM c, q WHERE vec_id != qid)
      |SELECT qid, CAST(rn AS INTEGER) AS rn, vec_id, score FROM (
      |  SELECT qid, vec_id, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
      |  FROM s)
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  ) { (s, d) =>
    // Norms are computed once per vector BEFORE the broadcast join (linear
    // work, map-side), so each of the O(n·k) scored rows evaluates ONE dot
    // product instead of three array traversals. sqrt(dot(e,e)) on the
    // same doubles → numerically identical to the per-pair form (oracle
    // unchanged).
    val e = T.embeddings(s, d).select(col("vec_id"), col("embedding"),
      sqrt(dot(s)(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(s)(col("embedding"), col("qe")) /
          (col("nrm") * col("qn")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("qid", "rn", "vec_id", "score")
      .orderBy("qid", "rn")
  }

  /** Array/multimodal column stats: per-label count, average L2 norm of
    * the embedding, dimensionality check. Norms are computed in double and
    * snapped to DECIMAL(18,6) before averaging so the cross-row sum is
    * exact (H3). */
  val multimodalStats: Q = Q(
    "q_multimodal_stats",
    """SELECT label, COUNT(*) AS n,
      |  CAST(SUM(CAST(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |       AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm,
      |  CAST(MAX(len(embedding)) AS INTEGER) AS dim
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  ) { (s, d) =>
    T.embeddings(s, d)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        (sum(l2(s)(col("embedding")).cast(DecimalType(18, 6))).cast(DoubleType) /
          count(lit(1))).as("avg_norm"),
        max(size(col("embedding"))).as("dim"))
      .orderBy("label")
  }

  /** Per-document top-3 salient terms by tf·(N/df) — tf-idf with the exact
    * reciprocal-df idf (tf·N is integer-exact, one IEEE division by df;
    * log-idf would hang the comparison on ln() ulp differences between the
    * JVM intrinsic and libm). Scale shape: tf is a partial-aggregated
    * (doc, token) groupBy; df is a vocabulary-sized aggregate joined back
    * on the token (vocabulary ≪ corpus, and the join is post-aggregation —
    * the exchange carries (token, df) pairs, never raw text); N is a 1-row
    * broadcast. */
  val tfidf: Q = Q(
    "q_tfidf",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    tf.tf * nd.n_docs / CAST(df.df AS DOUBLE) AS score
      |  FROM tf JOIN df USING (token) CROSS JOIN nd),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |       ORDER BY score DESC, token) AS rn FROM scored)
      |SELECT doc_id, CAST(rn AS INTEGER) AS rn, token, tf, df, score
      |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "token").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * col("n_docs") / col("df").cast(DoubleType)).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "rn", "token", "tf", "df", "score")
      .orderBy("doc_id", "rn")
  }

  /** Benchmark-contamination check: count word-8-gram shingles each
    * training document shares with a held-out eval set (docs with
    * doc_id % 50 = 0 stand in for the benchmark). The eval shingle set is
    * small by nature → broadcast hash join; the training side streams once
    * and only matching (doc_id, shingle) pairs reach the count-distinct
    * aggregate. The explicit len >= 8 guard exists because Spark's
    * sequence(1, n) DESCENDS for n < 1 instead of returning empty. */
  val contamination: Q = Q(
    "q_contamination",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
      |                         for i in generate_series(1, len(toks) - 7)]) AS shingle
      |  FROM toks WHERE len(toks) >= 8),
      |eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
      |train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 != 0)
      |SELECT t.doc_id, COUNT(DISTINCT t.shingle) AS n_contaminated
      |FROM train t JOIN eval_sh e USING (shingle)
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
  ) { (s, d) =>
    val sh = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("shingle"))
    val evalSh = sh.filter(col("doc_id") % 50 === 0).select("shingle").distinct()
    sh.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(evalSh), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("n_contaminated"))
      .orderBy("doc_id")
  }

  /** Sequence packing — the batching step that turns a curated corpus
    * into fixed-budget training contexts (512 tokens here): docs are
    * packed contiguously in doc_id order and a doc's pack is the one its
    * START offset falls in (floor(cum_before / budget)). Packing is
    * SHARD-LOCAL (shard = doc_id % 8): each window partition packs only
    * its shard, so no task ever sorts more than one shard — the global
    * single-partition cumsum that would straggle at 100 TB never exists;
    * global pack identity is (shard, pack). All integer math, engine-
    * exact. One window shuffle on shard + the tiny per-pack aggregate. */
  /** The shard-local packing CTEs, shared verbatim by q_pack_sequences
    * and q_pack_efficiency so the packs the census grades are exactly
    * the packs the packer emits. */
  private val packCtesSql: String =
    """d AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tok,
      |    CAST(floor((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
      |      / 512) AS BIGINT) AS pack
      |  FROM d)""".stripMargin

  /** The packing assignment (doc → (shard, pack)), shared by both ops. */
  private[graft] def packedDocs(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    T.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("pack",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / 512).cast(LongType))
  }

  val packSequences: Q = Q(
    "q_pack_sequences",
    s"""WITH $packCtesSql
      |SELECT shard, pack, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY shard, pack ORDER BY shard, pack""".stripMargin
  ) { (s, d) =>
    packedDocs(s, d)
      .groupBy("shard", "pack")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "pack")
  }

  /** Packing-efficiency census — the number a training-batch pipeline
    * watches after q_pack_sequences runs: start-offset packing never
    * splits a document, so a pack can OVERFLOW its 512-token budget
    * (the straddling doc's tail) or UNDERFILL it (the next doc started a
    * new pack) — both are wasted accelerator time (overflow truncates,
    * underfill pads). Per shard: pack count, token mass, nominal
    * capacity, fill ppm, the overflow/underfill token masses, and the
    * extreme pack sizes — all integer-exact, derived from the SAME
    * packing CTEs the packer emits, so the census can never drift from
    * the packing it grades.
    *
    * Scale shape: q_pack_sequences' one shard-local window shuffle, then
    * two partial-agg levels ((shard, pack) → shard, 8 output rows);
    * the census adds one tiny aggregation to the packing pass. */
  val packEfficiency: Q = Q(
    "q_pack_efficiency",
    s"""WITH $packCtesSql,
      |p AS (SELECT shard, pack, CAST(SUM(n_tok) AS BIGINT) AS pt
      |  FROM c GROUP BY shard, pack)
      |SELECT shard,
      |  CAST(count(*) AS BIGINT) AS n_packs,
      |  CAST(sum(pt) AS BIGINT) AS n_tokens,
      |  CAST(count(*) * 512 AS BIGINT) AS capacity,
      |  CAST(sum(pt) * 1000000 // (count(*) * 512) AS BIGINT) AS fill_ppm,
      |  CAST(sum(greatest(pt - 512, 0)) AS BIGINT) AS overflow_tokens,
      |  CAST(sum(greatest(512 - pt, 0)) AS BIGINT) AS underfill_tokens,
      |  CAST(min(pt) AS BIGINT) AS min_pack,
      |  CAST(max(pt) AS BIGINT) AS max_pack
      |FROM p GROUP BY shard ORDER BY shard""".stripMargin
  ) { (s, d) =>
    packedDocs(s, d)
      .groupBy("shard", "pack")
      .agg(sum(col("n_tok")).as("pt"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_packs"),
        sum(col("pt")).as("n_tokens"),
        (count(lit(1)) * 512L).as("capacity"),
        expr("sum(pt) * 1000000 div (count(1) * 512)").as("fill_ppm"),
        sum(greatest(col("pt") - 512L, lit(0L))).as("overflow_tokens"),
        sum(greatest(lit(512L) - col("pt"), lit(0L))).as("underfill_tokens"),
        min(col("pt")).as("min_pack"),
        max(col("pt")).as("max_pack"))
      .orderBy("shard")
  }

  /** Context-window chunking with stride — the sequence-prep step between
    * curation and packing: each document split into windows of 64 tokens
    * advancing by 48 (16-token overlap, the RAG/pretraining chunk shape),
    * short docs emitting exactly one chunk. Starts run while
    * start <= n - (W - S), which guarantees every token lands in some
    * chunk (the final chunk is short rather than the tail dropped) and
    * no chunk is fully contained in its predecessor. Strictly per-row
    * map + Generate (the output IS per-chunk rows — the fan-out is the
    * operator's semantics, not overhead); no shuffle besides the
    * presentation sort, and chunk math is all integer (sequence/
    * generate_series with identical inclusive-stop semantics).
    * chunk_tok < 64 only on each doc's final chunk. */
  val chunkDocs: Q = Q(
    "q_chunk_docs",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n, unnest(generate_series(1, greatest(n - 16, 1), 48)) AS start
      |  FROM toks),
      |x AS (
      |  SELECT c.doc_id, (c.start - 1) // 48 AS chunk_id,
      |    least(c.n - c.start + 1, 64) AS chunk_tok,
      |    array_to_string(t.toks[c.start:least(c.start + 63, c.n)], ' ') AS chunk_text
      |  FROM c JOIN toks t ON t.doc_id = c.doc_id)
      |SELECT doc_id, chunk_id, chunk_tok, chunk_text
      |FROM x ORDER BY doc_id, chunk_id""".stripMargin
  ) { (s, d) =>
    val W = 64
    val S = 48
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast(LongType))
      .withColumn("start",
        explode(sequence(lit(1L), greatest(col("n") - (W - S), lit(1L)), lit(S.toLong))))
      .select(col("doc_id"),
        // start - 1 is k·S by construction, so the division is exact and
        // the cast is lossless (DuckDB's // floor-div agrees)
        (((col("start") - 1) / S).cast(LongType)).as("chunk_id"),
        least(col("n") - col("start") + 1, lit(W.toLong)).as("chunk_tok"),
        concat_ws(" ", slice(col("toks"), col("start"),
          least(col("n") - col("start") + 1, lit(W.toLong)))).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** BM25 retrieval scoring — the lexical-retrieval half q_tfidf's
    * presentation ranking gestures at, in the engine's exact-integer
    * dialect: the query is the corpus's top-5 df terms (deterministic,
    * derived — no free-text parameter to smuggle floats through), and
    * each (doc, term) contributes
    *   idf_ppm · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with k1 = 1.2 and b = 0.75 spelled as ppm integers (2200000,
    * 1200000, 750000), dl/avgdl as dl·n_docs div total_tokens, and the
    * log-free inverse-frequency idf_ppm = n_docs·1e6 div df (the
    * q_rarity_score recipe) — every division is integer, both engines
    * replay bit-for-bit.
    *
    * Scale shape: tf/df/dl are partial-aggregated token censuses (the
    * exchange carries (doc, token, count) — never text); the query-term
    * table is 5 rows broadcast; the 1-row corpus census broadcast; the
    * score is one partial-aggregating groupBy(doc) and a top-20
    * TakeOrdered. At 100 TB: two token-census shuffles + O(docs)
    * aggregation, the minimum any lexical scorer pays. */
  /** The full-recompute BM25 closure — shared verbatim by q_bm25 and
    * q_bm25_delta: the oracle for BOTH is the complete scoring over the
    * whole current corpus, which is exactly the claim the incremental
    * index must live up to (the delta-family oracle-sharing convention:
    * componentsClosureSql, pagerankSql). */
  private lazy val bm25Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |              CAST((SELECT count(*) FROM tok) AS BIGINT) AS tot
      |       FROM documents),
      |df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |       FROM tok GROUP BY 1),
      |q AS (SELECT token, df FROM df ORDER BY df DESC, token LIMIT 5),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok GROUP BY 1, 2),
      |sc AS (SELECT tf.doc_id,
      |    CAST(count(*) AS BIGINT) AS n_terms,
      |    CAST(sum(
      |      ((nd.n_docs * 1000000 // q.df) *
      |       ((tf.tf * 2200000 * 1000000) //
      |        (tf.tf * 1000000 +
      |         (1200000 * (250000 + (750000 * dl.dl * nd.n_docs) // nd.tot))
      |           // 1000000))) // 1000000
      |    ) AS BIGINT) AS bm25_ppm
      |  FROM tf JOIN q USING (token) JOIN dl USING (doc_id) CROSS JOIN nd
      |  GROUP BY 1)
      |SELECT doc_id, n_terms, bm25_ppm FROM sc
      |ORDER BY bm25_ppm DESC, doc_id LIMIT 20""".stripMargin

  /** The four index tables BM25 serves from — (doc, token, tf) postings,
    * (doc, dl) lengths, (token, df) document frequencies, and the 1-row
    * (n_docs, tot) corpus census — built from one tokenization of `docs`.
    * Shared by q_bm25 (whole corpus) and q_bm25_delta (base and delta
    * halves separately). */
  private def bm25Index(docs: DataFrame, freeze: Boolean = false)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // freeze: the four outputs are four separate plans over `tok`, so an
    // un-materialized tok re-tokenizes `docs` once PER OUTPUT — fine for
    // the one-shot full build (pushed-down corpus scans Catalyst
    // pipelines), a 4× delta tokenization in q_bpe-style serve/refresh
    // paths (round-14 verdict #3: 16 jobs per q_bm25_delta serve, the
    // four ~0.2-0.45 s legs were the same slice re-exploded). Delta
    // slices are O(delta), so the checkpoint write is delta-sized.
    val tok0 = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tok = if (freeze) tok0.localCheckpoint() else tok0
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tok.agg(count(lit(1)).as("tot")))
    (tf, dl, df, nd)
  }

  /** The exact-integer BM25 scoring tail over prepared index tables:
    * query = top-5 df terms, score summed per doc, top-20 presentation.
    * `df` must carry corpus-wide document frequencies; `nd` the 1-row
    * (n_docs, tot) census. */
  private def bm25Score(tf: DataFrame, dl: DataFrame, df: DataFrame,
      nd: DataFrame): DataFrame = {
    val q5 = df.orderBy(col("df").desc, col("token")).limit(5)
    tf.join(broadcast(q5), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nd))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr(
          """((n_docs * 1000000 div df) *
            | ((tf * 2200000 * 1000000) div
            |  (tf * 1000000 +
            |   (1200000 * (250000 + (750000 * dl * n_docs) div tot))
            |     div 1000000))) div 1000000""".stripMargin))
          .as("bm25_ppm"))
      .orderBy(col("bm25_ppm").desc, col("doc_id"))
      .limit(20)
  }

  val bm25: Q = Q("q_bm25", bm25Sql) { (s, d) =>
    val (tf, dl, df, nd) = bm25Index(T.documents(s, d).select("doc_id", "text"))
    bm25Score(tf, dl, df, nd)
  }

  /** Incremental BM25 index maintenance — the retrieval member of the
    * delta family (q_ivf_assign_delta, q_pq_encode_delta,
    * q_components_delta, q_pagerank_delta): the expensive O(corpus) step
    * of lexical retrieval is TOKENIZATION plus the three token-census
    * shuffles, and all four of its outputs are MONOIDAL over disjoint
    * doc sets — postings and doc lengths union (doc sets are disjoint),
    * document frequencies and the corpus census add. So yesterday's
    * index (docs below the 7/8 doc_id split) is a FROZEN artifact
    * (ModelCache "bm25-base", the train-rarely economics), today's docs
    * tokenize alone (O(delta)), and the serving-time merge is a union +
    * a k-term df sum — never a re-scan of the base corpus. Scoring then
    * reads only the q5 postings, exactly as q_bm25.
    *
    * Global coupling is confined to the STATS, not the scan: new docs
    * shift df/n_docs/tot, which changes every doc's score — but scores
    * are a cheap function OF the index, so incremental index + full
    * re-score is exact. The ORACLE is the full recompute over the whole
    * corpus (bm25Sql, shared with q_bm25): the hash gate proves
    * incremental == full across two engines. */
  /** The frozen lexical index base: (split, tf, dl, df, nd) over docs
    * below the split. REFRESH (round-11 verdict #1): all four outputs
    * are monoidal over disjoint doc sets — postings and doc-lengths
    * union, document frequencies and the corpus census add — so a
    * corpus change rolls the base forward by indexing ONLY the slice
    * [sp0, sp1) and merging, never re-tokenizing the old corpus.
    * RefreshSpec pins refresh == retrain bit-identically. */
  private[graft] def bm25Base(s: org.apache.spark.sql.SparkSession, d: String)
      : (Long, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    graft.core.ModelCache.getOrRefreshGuarded(s, "bm25-base", s"$d/documents.parquet") {
      val maxRow = docs.agg(max(col("doc_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxId / 8L
      val (tf, dl, df, nd) = bm25Index(docs.filter(col("doc_id") < sp))
      (sp, tf.localCheckpoint(), dl.localCheckpoint(),
        df.localCheckpoint(), nd.localCheckpoint())
    } { case ((sp0, tf0, dl0, df0, nd0), newFiles) =>
      // Backfill guard (round-15 verdict #1): a new file carrying
      // doc_id < sp0 is invisible to the [sp0, sp1) slice — decline the
      // merge, ModelCache retrains over the whole corpus.
      if (graft.core.Backfill.below(s, newFiles, "doc_id", sp0)) None
      else Some {
      val maxRow = docs.agg(max(col("doc_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp1 = math.max(7L * maxId / 8L, sp0) // monotone, now CHECKED
      val (tfS, dlS, dfS, ndS) = bm25Index(
        docs.filter(col("doc_id") >= sp0 && col("doc_id") < sp1), freeze = true)
      val df1 = df0.unionAll(dfS).groupBy("token").agg(sum(col("df")).as("df"))
      val nd1 = nd0.select(col("n_docs").as("nb"), col("tot").as("tb"))
        .crossJoin(ndS.select(col("n_docs").as("ndd"), col("tot").as("td")))
        .select((col("nb") + col("ndd")).as("n_docs"),
          (col("tb") + col("td")).as("tot"))
      // tf/dl: checkpoint ONLY the delta slice — re-checkpointing the
      // union would copy the O(corpus) base postings on every refresh,
      // exactly the cost the refreeze exists to avoid. The union nodes
      // accrete one per refresh generation, so flattenWide re-materializes
      // once every ~8 generations — amortized a fraction of a delta,
      // plan depth pinned for month-long sessions.
      (sp1, graft.core.Session.flattenWide(tf0.unionAll(tfS.localCheckpoint())),
        graft.core.Session.flattenWide(dl0.unionAll(dlS.localCheckpoint())),
        df1.localCheckpoint(), nd1.localCheckpoint())
      }
    }
  }

  val bm25Delta: Q = Q("q_bm25_delta", bm25Sql) { (s, d) =>
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val (split, tfB, dlB, dfB, ndB) = bm25Base(s, d)
    val (tfD, dlD, dfD, ndD) =
      bm25Index(docs.filter(col("doc_id") >= split), freeze = true)
    val df = dfB.unionAll(dfD).groupBy("token").agg(sum(col("df")).as("df"))
    val nd = ndB.select(col("n_docs").as("nb"), col("tot").as("tb"))
      .crossJoin(ndD.select(col("n_docs").as("ndd"), col("tot").as("td")))
      .select((col("nb") + col("ndd")).as("n_docs"),
        (col("tb") + col("td")).as("tot"))
    bm25Score(tfB.unionAll(tfD), dlB.unionAll(dlD), df, nd)
  }

  /** Hybrid retrieval with reciprocal-rank fusion — the two-tower serving
    * shape RAG stacks actually run: for each query document (the 5 lowest
    * ids, the q_similarity_topk convention) BOTH a dense list (cosine
    * top-10 over the embedding column) and a lexical list (top-10 by
    * summed idf of shared tokens — the log-free idf_ppm recipe, an
    * inverted-index join on the query's own tokens) are ranked, then
    * fused by RRF: rrf_ppm = Σ_lists 1e6 div (60 + rank), the standard
    * k=60 formula in exact-integer form, absent-from-list contributing
    * zero. Fusion operates on RANKS, so the incommensurable score scales
    * (cosine ∈ [-1,1] vs idf sums) never need calibrating — which is why
    * RRF is the default fusion everywhere. Candidates are the docs that
    * HAVE embeddings (the hybrid domain must be the intersection, or the
    * lexical list votes for docs the dense list cannot see).
    *
    * Scale shape: the dense side is the broadcast-query scan every
    * exact eval pays (Similarity's IVF is the sub-linear swap-in); the
    * lexical side touches only postings of the query docs' own tokens
    * (an inverted-index probe, never a doc×doc product); fusion joins
    * two ≤10-row-per-query lists. */
  /** The two retrieval channels' CTE block, shared by q_hybrid_rrf and
    * q_rank_corr (the bm25Sql precedent: one SQL text, two oracles —
    * the channels must be IDENTICAL for the correlation to be about the
    * channels, not about two slightly different reconstructions). */
  private lazy val channelCtes: String =
    """cand AS (SELECT DISTINCT vec_id AS id FROM embeddings),
      |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
      |      FROM embeddings WHERE vec_id < 5),
      |vs AS (SELECT q.qid, e.vec_id AS id,
      |         round(list_inner_product(e.embedding::DOUBLE[], q.qe) /
      |               (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
      |                sqrt(list_inner_product(q.qe, q.qe))), 4) AS vscore
      |       FROM embeddings e, q WHERE e.vec_id != q.qid),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |dtok AS (SELECT DISTINCT doc_id, token FROM tok),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM dtok GROUP BY 1),
      |qt AS (SELECT q.qid, d.token FROM q JOIN dtok d ON d.doc_id = q.qid),
      |ls AS (SELECT qt.qid, d2.doc_id AS id,
      |         CAST(sum(nd.n_docs * 1000000 // df.df) AS BIGINT) AS lscore
      |       FROM qt JOIN dtok d2 USING (token) JOIN df USING (token)
      |       JOIN cand ON cand.id = d2.doc_id CROSS JOIN nd
      |       WHERE d2.doc_id != qt.qid GROUP BY 1, 2)""".stripMargin

  /** The top-10 cut of each channel — q_hybrid_rrf's serving lists.
    * Separate from [[channelCtes]] so q_rank_corr can correlate the
    * FULL rankings (top-10 intersections are empty on an uncorrelated
    * synthetic corpus — 10·10/|catalog| expected hits). */
  private lazy val topCtes: String =
    """vtop AS (SELECT qid, id, r FROM (
      |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY vscore DESC, id) AS r
      |  FROM vs) WHERE r <= 10),
      |ltop AS (SELECT qid, id, r FROM (
      |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY lscore DESC, id) AS r
      |  FROM ls) WHERE r <= 10)""".stripMargin

  val hybridRrf: Q = Q(
    "q_hybrid_rrf",
    s"""WITH $channelCtes,
      |$topCtes,
      |u AS (SELECT qid, id FROM vtop UNION SELECT qid, id FROM ltop),
      |f AS (SELECT u.qid, u.id,
      |        CAST(coalesce(v.r, 0) AS BIGINT) AS r_vec,
      |        CAST(coalesce(l.r, 0) AS BIGINT) AS r_lex,
      |        CAST((CASE WHEN v.r IS NULL THEN 0 ELSE 1000000 // (60 + v.r) END) +
      |             (CASE WHEN l.r IS NULL THEN 0 ELSE 1000000 // (60 + l.r) END)
      |          AS BIGINT) AS rrf_ppm
      |      FROM u LEFT JOIN vtop v ON v.qid = u.qid AND v.id = u.id
      |             LEFT JOIN ltop l ON l.qid = u.qid AND l.id = u.id)
      |SELECT qid, CAST(rn AS BIGINT) AS rn, id, rrf_ppm, r_vec, r_lex FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_ppm DESC, id) AS rn
      |  FROM f)
      |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  ) { (s, d) =>
    val (vs, ls) = rankChannels(s, d)
    // vtop/ltop each feed two consumers (the union-of-candidates leg and
    // a left join) and the static plan prints both channels' subtrees
    // twice (6 Generates / 32 scans) — but that duplication is PAPER
    // ONLY: the copies are canonically identical, so runtime exchange
    // reuse dedupes them at AQE stage creation. Measured in round 18:
    // the old shape serves in 23 jobs; pinning both top-10 lists with
    // eager checkpoints RAISED it to 29 jobs at equal wall time (the
    // checkpoint barriers add driver round trips, the reused stages were
    // already free) — rejected. Contrast q_vocab_growth, where the
    // duplicated subtree is pruned DIFFERENTLY per consumer (no reuse
    // possible) and the pin is a genuine win.
    val wv = Window.partitionBy("qid").orderBy(col("vscore").desc, col("id"))
    val vtop = vs.withColumn("r", row_number().over(wv).cast(LongType))
      .filter(col("r") <= 10).select("qid", "id", "r")
    val wl = Window.partitionBy("qid").orderBy(col("lscore").desc, col("id"))
    val ltop = ls.withColumn("r", row_number().over(wl).cast(LongType))
      .filter(col("r") <= 10).select("qid", "id", "r")
    // fuse on ranks
    val u = vtop.select("qid", "id").union(ltop.select("qid", "id")).distinct()
    val f = u
      .join(vtop.withColumnRenamed("r", "vr"), Seq("qid", "id"), "left")
      .join(ltop.withColumnRenamed("r", "lr"), Seq("qid", "id"), "left")
      .select(col("qid"), col("id"),
        coalesce(col("vr"), lit(0L)).as("r_vec"),
        coalesce(col("lr"), lit(0L)).as("r_lex"),
        (when(col("vr").isNull, 0L).otherwise(expr("1000000 div (60 + vr)")) +
          when(col("lr").isNull, 0L).otherwise(expr("1000000 div (60 + lr)")))
          .as("rrf_ppm"))
    val wf = Window.partitionBy("qid").orderBy(col("rrf_ppm").desc, col("id"))
    f.withColumn("rn", row_number().over(wf).cast(LongType))
      .filter(col("rn") <= 5)
      .select("qid", "rn", "id", "rrf_ppm", "r_vec", "r_lex")
      .orderBy("qid", "rn")
  }

  /** Builds the two SCORED candidate lists (dense cosine `vscore`,
    * lexical idf_ppm `lscore`) per query doc — the channel construction
    * factored off q_hybrid_rrf so eval operators measure the SAME
    * channels the fusion serves. Returns (vs, ls), each
    * (qid, id, score); callers cut their own top-k. */
  private[graft] def rankChannels(s: org.apache.spark.sql.SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val emb = T.embeddings(s, d)
    val cand = emb.select(col("vec_id").as("id")).distinct()
    // dense list: norms precomputed map-side (the q_similarity_topk shape)
    val e = emb.select(col("vec_id"), col("embedding"),
      l2(s)(col("embedding")).as("nrm"))
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val vs = e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id"),
        round(dot(s)(col("embedding"), col("qe")) / (col("nrm") * col("qn")), 4)
          .as("vscore"))
    // lexical list: inverted-index probe on the query docs' own tokens
    val dtok = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val nd = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val df = dtok.groupBy("token").agg(count(lit(1)).as("df"))
    // both channels share ONE query set derived from embeddings (the
    // oracle's construction): a doc_id < 5 without an embedding row must
    // not spawn a lexical-only query group the dense side cannot see
    val qt = dtok.join(broadcast(qv.select("qid")),
        dtok("doc_id") === col("qid"))
      .select(col("qid"), col("token"))
    val ls = broadcast(qt).join(dtok, "token")
      .filter(col("doc_id") =!= col("qid"))
      .join(df, "token")
      .join(cand.withColumnRenamed("id", "doc_id"), "doc_id")
      .crossJoin(broadcast(nd))
      .groupBy(col("qid"), col("doc_id").as("id"))
      .agg(sum(expr("n_docs * 1000000 div df")).as("lscore"))
    (vs, ls)
  }

  /** Spearman rank correlation between the dense and lexical channels —
    * the diagnostic BEHIND q_hybrid_rrf: fusion pays off exactly when
    * the channels disagree (ρ low) yet are individually competent, and
    * a ρ near 1 says the second channel is redundant spend at serving
    * time. Correlates the FULL rankings over each query's shared scored
    * domain (docs with both a cosine and a lexical score): a top-10 ∩
    * top-10 restriction is vacuous on an uncorrelated catalog
    * (10·10/|catalog| expected hits), and restricted ranks are not 1..n
    * anyway — so both channels are re-ranked densely WITHIN the shared
    * domain and ρ = 1 − 6·Σd² / (n·(n²−1)) is exact: n and Σd² are
    * integers in both engines (ties broken by id under both orderings,
    * identically), the only float is the ONE final division (n ≥ 2
    * guarded — NULL below that in both engines). Magnitudes: Σd² < n³/3
    * and n·(n²−1) pass int64 up to n ≈ 2·10⁶ per query; the documented
    * switch past that is DECIMAL(38,0), but a rank-eval domain is a
    * candidate list, not a corpus.
    *
    * Scale shape: one (qid, id) equi-join of the two scored lists, two
    * windows over O(domain) rows per query, one partial-aggregated
    * groupBy — the channels themselves (the SAME frozen plans
    * q_hybrid_rrf serves, rankChannels) carry the cost. O(queries)
    * output rows. */
  val rankCorr: Q = Q(
    "q_rank_corr",
    s"""WITH $channelCtes,
      |j AS (SELECT vs.qid, vs.id, vs.vscore, ls.lscore
      |      FROM vs JOIN ls USING (qid, id)),
      |rr AS (SELECT qid,
      |         row_number() OVER (PARTITION BY qid ORDER BY vscore DESC, id)
      |           AS rv2,
      |         row_number() OVER (PARTITION BY qid ORDER BY lscore DESC, id)
      |           AS rl2
      |       FROM j)
      |SELECT qid, CAST(count(*) AS BIGINT) AS n_common,
      |  CAST(sum((rv2 - rl2) * (rv2 - rl2)) AS BIGINT) AS sum_d2,
      |  CASE WHEN count(*) >= 2 THEN
      |    round(CAST(1 AS DOUBLE) -
      |      CAST(6 AS DOUBLE) * CAST(sum((rv2 - rl2) * (rv2 - rl2)) AS DOUBLE)
      |        / (count(*) * (count(*) * count(*) - 1)), 4)
      |  END AS rho
      |FROM rr GROUP BY qid ORDER BY qid""".stripMargin
  ) { (s, d) =>
    val (vs, ls) = rankChannels(s, d)
    val j = vs.join(ls, Seq("qid", "id"))
    val rr = j
      .withColumn("rv2", row_number()
        .over(Window.partitionBy("qid").orderBy(col("vscore").desc, col("id")))
        .cast(LongType))
      .withColumn("rl2", row_number()
        .over(Window.partitionBy("qid").orderBy(col("lscore").desc, col("id")))
        .cast(LongType))
    rr.groupBy("qid")
      .agg(count(lit(1)).as("n_common"),
        sum((col("rv2") - col("rl2")) * (col("rv2") - col("rl2"))).as("sum_d2"))
      .select(col("qid"), col("n_common"), col("sum_d2"),
        when(col("n_common") >= 2,
          round(lit(1.0) - lit(6.0) * col("sum_d2").cast(DoubleType) /
            (col("n_common") * (col("n_common") * col("n_common") - 1)), 4))
          .as("rho"))
      .orderBy("qid")
  }

  val all: Seq[Q] = Seq(
    dedupExact, dedupText, tokenTopK, jsonExtract, similarityTopK, multimodalStats,
    tfidf, contamination, packSequences, packEfficiency, chunkDocs, bm25,
    bm25Delta, hybridRrf, rankCorr)
}
