package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Canonical => C, Q, Tables => T}

/** Scalable near-duplicate detection: MinHash+LSH, SimHash, and n-gram
  * Jaccard — the standard toolkit for training-corpus dedup at 100 TB
  * (exact dedup lives in LlmPipeline.dedupExact; the multiset digest in
  * LlmPipeline.dedupText).
  *
  * Scale shape shared by all three: the document text never crosses a
  * shuffle. Tokens are exploded, hashed to fixed-width integers, and
  * reduced per doc_id (partial aggregation), so the exchange carries
  * (doc_id, few integers) regardless of document size. The LSH band join
  * then buckets 16-byte keys — candidate generation is O(n·bands), not
  * O(n²), which is the whole point of MinHash at corpus scale.
  *
  * All hash functions are md5-derived (H1: engine-portable), seeded by
  * prefixing the seed index to the token.
  */
object Dedup {

  private val K = 8          // minhash signature length
  private val Bands = 4      // LSH bands (rows per band = K / Bands = 2)

  /** The toks→sig→bands CTE chain in DuckDB SQL — ONE definition shared
    * by every query built on the LSH banding (q_dedup_minhash census,
    * q_neardup_pipeline, q_dedup_clusters, q_minhash_jaccard_est), so a
    * change to K or the band-key encoding cannot desynchronize them. */
  private val sigBandsCteSql: String = {
    val hashCols = (0 until K).map(i => s"min(a + $i * b) AS h$i").mkString(", ")
    val bandCase = (0 until Bands).map(b =>
      s"WHEN ${b} THEN md5(concat_ws(',', CAST(h${2 * b} AS VARCHAR), CAST(h${2 * b + 1} AS VARCHAR)))")
      .mkString(" ")
    s"""toks AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(tok), 1, 12))::BIGINT AS a,
       |    ('0x' || substr(md5(tok), 13, 12))::BIGINT AS b
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |), sig AS (
       |  SELECT doc_id, $hashCols FROM toks GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, band, CASE band $bandCase END AS bucket
       |  FROM sig, (SELECT unnest([${(0 until Bands).mkString(", ")}]) AS band)
       |)""".stripMargin
  }

  /** The Spark twin of `sigBandsCteSql`'s bands CTE: MinhashSig kernel
    * signature (one token-array walk per doc, map-side) exploded into
    * (doc_id, band, bucket). Parameterized by the doc set so
    * q_dedup_delta can band ONLY its delta docs. */
  private[graft] def bandsOfDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    val sig = docs
      .select(col("doc_id"),
        graft.functions.MinhashSig.sig(s, split(col("text"), " "), K).as("sig"))
    val bandKeys = (0 until Bands).map(b =>
      md5(concat_ws(",", element_at(col("sig"), 2 * b + 1).cast(StringType),
        element_at(col("sig"), 2 * b + 2).cast(StringType))))
    sig.select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "bucket")))
  }

  private def bandsOf(s: SparkSession, d: String): DataFrame =
    bandsOfDocs(s, T.documents(s, d))

  /** MinHash + LSH banding: per-doc K-wide signature of min-hashed tokens,
    * banded into `Bands` buckets; docs sharing a (band, bucket) are
    * near-dup candidates. Output: every LSH bucket with its population and
    * keeper (min doc_id).
    *
    * The K hash functions are derived from ONE md5 per token via
    * Kirsch-Mitzenmacher double hashing (h_i = a + i·b from the two md5
    * halves) — 1/K-th the hashing cost, and min over the token multiset
    * equals min over the token set, so no dedup shuffle is needed before
    * the per-doc aggregate. Spark side: the codegen'd MinhashSig kernel
    * makes the signature map-side, so the FIRST shuffle in the plan is
    * already the tiny (band, bucket) census. (History: an exploded+
    * partial-agg formulation was the round-1 best; an interpreted
    * transform+array_min variant was ~15% slower; the native kernel beats
    * both and removes a whole aggregate stage.) */
  val dedupMinhash: Q = Q(
    "q_dedup_minhash",
    s"""WITH $sigBandsCteSql
       |SELECT band, bucket, count(*) AS n, min(doc_id) AS keeper
       |FROM bands GROUP BY band, bucket
       |ORDER BY band, bucket""".stripMargin
  ) { (s, d) =>
    bandsOf(s, d)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .orderBy("band", "bucket")
  }

  /** SimHash (32-bit): per-bit majority vote over token hashes, with token
    * multiplicity. Documents with equal (or near-equal, by Hamming
    * distance) simhash are near-dups. One explode + one 32-way aggregate. */
  val dedupSimhash: Q = {
    val bitSums = (0 until 32).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val assemble = (0 until 32).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    Q(
      "q_dedup_simhash",
      s"""WITH toks AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |), bits AS (
         |  SELECT doc_id, $bitSums FROM toks GROUP BY doc_id
         |)
         |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // Codegen'd SimhashSig kernel: majority vote folded in one pass per
      // document, map-side — the exploded 32-column CASE-sum aggregate
      // (round-1 formulation) is gone, and the only shuffle left is the
      // presentation sort.
      T.documents(s, d)
        .select(col("doc_id"),
          graft.functions.SimhashSig.sig(s, split(col("text"), " ")).as("simhash"))
        .orderBy("doc_id")
    }
  }

  /** Token-set Jaccard similarity over consecutive doc pairs (d, d+1) —
    * the bounded-pair formulation of n-gram Jaccard (candidate pairs in
    * production come from the MinHash buckets above; pairing by adjacent
    * id keeps the oracle's output size linear).
    *
    * Token sets are built map-side (array_distinct of the split — no
    * explode, no token-level shuffle or join), so the pair join carries
    * one bounded array per doc and the intersection is a per-pair array
    * op. At corpus scale the exchange is O(docs · avg-set-size), versus
    * O(total tokens) shuffled twice in the exploded formulation. */
  val ngramJaccard: Q = Q(
    "q_ngram_jaccard",
    """WITH sets AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
      |    len(list_distinct(string_split(text, ' '))) AS n
      |  FROM documents
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.toks, b.toks)) AS n_inter,
      |  a.n + b.n - len(list_intersect(a.toks, b.toks)) AS n_union,
      |  len(list_intersect(a.toks, b.toks))
      |    / (a.n + b.n - len(list_intersect(a.toks, b.toks))) AS jaccard
      |FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
      |ORDER BY a_id""".stripMargin
  ) { (s, d) =>
    val sets = T.documents(s, d).select(
      col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast(LongType).as("n"))
    val a = sets.select(col("doc_id").as("a_id"), col("toks").as("toks_a"), col("n").as("n_a"))
    val b = sets.select(col("doc_id").as("b_id"), col("toks").as("toks_b"), col("n").as("n_b"))
    val inter = size(array_intersect(col("toks_a"), col("toks_b"))).cast(LongType)
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"), col("b_id"),
        inter.as("n_inter"),
        (col("n_a") + col("n_b") - inter).as("n_union"),
        (inter / (col("n_a") + col("n_b") - inter)).as("jaccard"))
      .orderBy("a_id")
  }

  /** SimHash Hamming distance over consecutive doc pairs: the comparison
    * half of the SimHash pipeline (bit_count of xor — near-dups are pairs
    * within a small radius). Bounded to adjacent ids like ngramJaccard;
    * production candidates come from bucketing on simhash prefixes. */
  val simhashHamming: Q = {
    val bitSums = (0 until 32).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val assemble = (0 until 32).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    Q(
      "q_simhash_hamming",
      s"""WITH toks AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |), sh AS (
         |  SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
         |  FROM (SELECT doc_id, $bitSums FROM toks GROUP BY doc_id)
         |)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
         |ORDER BY a_id""".stripMargin
    ) { (s, d) =>
      // With the SimhashSig kernel the signature is a cheap map-side
      // projection, so recomputing it on both sides of the self-join is
      // cheaper (and variance-free) versus the round-1 localCheckpoint,
      // which existed to avoid re-running a 32-way token aggregate.
      val sh = T.documents(s, d)
        .select(col("doc_id"),
          graft.functions.SimhashSig.sig(s, split(col("text"), " ")).as("simhash"))
      val a = sh.select(col("doc_id").as("a_id"), col("simhash").as("sh_a"))
      val b = sh.select(col("doc_id").as("b_id"), col("simhash").as("sh_b"))
      a.join(b, col("b_id") === col("a_id") + 1)
        .select(col("a_id"), col("b_id"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
        .orderBy("a_id")
    }
  }

  /** Edit-distance fuzzy matching over bounded pairs: levenshtein is
    * integer-exact in both engines, making it the one string-similarity
    * measure comparable without float hazards. Candidate pairs are
    * adjacent ids here; in production they come from LSH/minhash buckets
    * (edit distance is O(len²) per pair — never run it all-pairs). */
  val dedupEditDistance: Q = Q(
    "q_dedup_editdist",
    """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
      |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist,
      |  CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 1 ELSE 0 END AS near_dup
      |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
      |ORDER BY a_id""".stripMargin
  ) { (s, d) =>
    val c = T.customer(s, d).select("c_custkey", "c_name")
    val a = c.select(col("c_custkey").as("a_id"), col("c_name").as("na"))
    val b = c.select(col("c_custkey").as("b_id"), col("c_name").as("nb"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("na"), col("nb")).as("dist"),
        when(levenshtein(col("na"), col("nb")) <= 2, 1).otherwise(0).as("near_dup"))
      .orderBy("a_id")
  }

  /** The end-to-end near-dup pipeline a curation run actually executes:
    * MinHash+LSH candidate generation (the q_dedup_minhash half) piped into
    * true token-set Jaccard verification (the q_ngram_jaccard half) in ONE
    * query. Each doc is verified against its CANDIDATE KEEPER — the
    * smallest doc_id over all LSH buckets the doc lands in — not against
    * every bucket co-member: verification work is O(docs), immune to
    * degenerate buckets (this corpus has two 300+-doc buckets; all-pairs
    * there would be quadratic, and at 100 TB a single hot bucket would be
    * a straggler task). Output: every doc with a candidate keeper below
    * it, the exact Jaccard against that keeper, and the drop verdict at
    * the 0.5 threshold.
    *
    * Scale shape: signatures and token sets are born map-side (MinhashSig
    * kernel / array_distinct — text never crosses a shuffle); the band
    * census shuffles (band, bucket, doc_id) triples; the verify joins
    * carry one bounded token set per doc. */
  /** The LSH candidate stage — (doc_id, keeper_id) pairs — as shared
    * DuckDB CTE text and as a Spark plan, used by both q_neardup_pipeline
    * (Jaccard verification) and q_dedup_clusters (transitive closure).
    * Builds on the same sigBandsCteSql / bandsOf as the census query. */
  private val candCteSql: String =
    s"""$sigBandsCteSql, keepers AS (
       |  SELECT band, bucket, min(doc_id) AS k FROM bands GROUP BY 1, 2
       |), cand AS (
       |  SELECT b.doc_id, min(k.k) AS keeper_id
       |  FROM bands b JOIN keepers k ON b.band = k.band AND b.bucket = k.bucket
       |  GROUP BY b.doc_id HAVING min(k.k) < b.doc_id
       |)""".stripMargin

  private def candidatePairs(s: SparkSession, d: String): DataFrame = {
    val bands = bandsOf(s, d)
    val keepers = bands.groupBy("band", "bucket").agg(min(col("doc_id")).as("k"))
    // co-partitioned with keepers on (band, bucket) — the census shuffle
    // is reused by the join; then one narrow shuffle on doc_id
    bands.join(keepers, Seq("band", "bucket"))
      .groupBy("doc_id").agg(min(col("k")).as("keeper_id"))
      .filter(col("keeper_id") < col("doc_id"))
  }

  val neardupPipeline: Q = {
    Q(
      "q_neardup_pipeline",
      s"""WITH $candCteSql, sets AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t,
         |    len(list_distinct(string_split(text, ' '))) AS n
         |  FROM documents
         |)
         |SELECT c.doc_id, c.keeper_id,
         |  len(list_intersect(x.t, y.t)) AS n_inter,
         |  x.n + y.n - len(list_intersect(x.t, y.t)) AS n_union,
         |  len(list_intersect(x.t, y.t))
         |    / (x.n + y.n - len(list_intersect(x.t, y.t))) AS jaccard,
         |  CASE WHEN len(list_intersect(x.t, y.t))
         |    / (x.n + y.n - len(list_intersect(x.t, y.t))) >= 0.5
         |    THEN 1 ELSE 0 END AS is_dup
         |FROM cand c JOIN sets x ON x.doc_id = c.doc_id
         |JOIN sets y ON y.doc_id = c.keeper_id
         |ORDER BY c.doc_id""".stripMargin
    ) { (s, d) =>
      val cand = candidatePairs(s, d)
      val sets = T.documents(s, d).select(
        col("doc_id"), array_distinct(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).cast(LongType).as("n"))
      val inter = size(array_intersect(col("t_x"), col("t_y"))).cast(LongType)
      val uni = col("n_x") + col("n_y") - inter
      cand
        .join(sets.select(col("doc_id"), col("t").as("t_x"), col("n").as("n_x")), "doc_id")
        .join(sets.select(col("doc_id").as("keeper_id"), col("t").as("t_y"),
          col("n").as("n_y")), "keeper_id")
        .select(col("doc_id"), col("keeper_id"),
          inter.as("n_inter"), uni.as("n_union"),
          (inter / uni).as("jaccard"),
          when(inter / uni >= 0.5, 1).otherwise(0).as("is_dup"))
        .orderBy("doc_id")
    }
  }

  /** Transitive closure of the candidate pairs into DEDUP CLUSTERS — the
    * step after candidate generation in a real curation run: doc→keeper
    * edges form a forest (every keeper id is smaller than its doc), and
    * the cluster root is the chain's minimum. Spark side is distributed
    * pointer jumping (label := parent's label, chain length halves per
    * round, so convergence is O(log depth) rounds — the GraphFrames/
    * Pregel connected-components shape; every round is a key-partitioned
    * join, the driver only probes a 1-row convergence aggregate;
    * localCheckpoint truncates the otherwise-exponential iterative plan
    * lineage). The oracle walks the same closure as a DuckDB RECURSIVE
    * CTE — two unrelated fixpoint engines agreeing on the clustering. */
  /** The recursive half of the closure oracle, shared by
    * q_dedup_clusters and q_dedup_report. */
  private val rootsCteSql: String =
    s"""$candCteSql,
       |reach AS (
       |  SELECT doc_id, keeper_id AS r FROM cand
       |  UNION
       |  SELECT re.doc_id, c.keeper_id FROM reach re JOIN cand c ON re.r = c.doc_id
       |), roots AS (
       |  SELECT doc_id, min(r) AS root_id FROM reach GROUP BY doc_id
       |)""".stripMargin

  /** Pointer-jumping fixpoint: (doc_id, root) with root = the chain
    * minimum over candidatePairs' keeper edges. */
  private def rootsOf(s: SparkSession, d: String): DataFrame = {
    // Session.truncate: localCheckpoint by default, reliable checkpoint
    // when spark.graft.checkpointDir is set (see Session.CheckpointDirKey)
    var lab = graft.core.Session.truncate(candidatePairs(s, d)
      .select(col("doc_id"), col("keeper_id").as("root")))
    var prevSum = -1L
    var iter = 0
    var converged = false
    while (!converged && iter < 32) {
      val parents = lab.select(col("doc_id").as("p_doc"), col("root").as("p_root"))
      lab = graft.core.Session.truncate(
        lab.join(parents, col("root") === col("p_doc"), "left")
          .select(col("doc_id"),
            least(col("root"), coalesce(col("p_root"), col("root"))).as("root")),
        eager = false) // probed next — the sum probe job materializes
      // roots only decrease; the sum is a cheap monotone fixpoint probe
      // (coalesce: SUM over an empty frame is NULL — a corpus with no
      // near-dup candidates must converge, not throw)
      val sum = lab
        .agg(coalesce(org.apache.spark.sql.functions.sum("root"), lit(0L)))
        .head().getLong(0)
      converged = sum == prevSum
      prevSum = sum
      iter += 1
    }
    lab
  }

  val dedupClusters: Q = Q(
    "q_dedup_clusters",
    s"""WITH RECURSIVE $rootsCteSql
       |SELECT doc_id, root_id FROM roots ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    rootsOf(s, d).select(col("doc_id"), col("root").as("root_id")).orderBy("doc_id")
  }

  /** The dedup SUMMARY a curation run reports before committing a drop
    * policy: corpus size, docs that would be dropped (every doc with a
    * root below it), surviving cluster count, tokens reclaimed, and the
    * drop ratio. Single-row output built on the same closure as
    * q_dedup_clusters (shared rootsCteSql / rootsOf), joined back to
    * per-doc token counts — the join and aggregates are all over the
    * duplicate set, not the corpus. */
  val dedupReport: Q = Q(
    "q_dedup_report",
    s"""WITH RECURSIVE $rootsCteSql,
       |tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)
       |SELECT (SELECT count(*) FROM documents) AS n_docs,
       |  count(*) AS n_dup_docs,
       |  count(DISTINCT r.root_id) AS n_clusters,
       |  CAST(sum(t.n_tok) AS BIGINT) AS dup_tokens,
       |  round(count(*) / (SELECT count(*) FROM documents)::DOUBLE, 6) AS dup_ratio
       |FROM roots r JOIN tok t ON t.doc_id = r.doc_id""".stripMargin
  ) { (s, d) =>
    val roots = rootsOf(s, d)
    val tok = T.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    val total = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    roots.join(tok, "doc_id")
      .agg(count(lit(1)).as("n_dup_docs"),
        countDistinct(col("root")).as("n_clusters"),
        sum(col("n_tok")).as("dup_tokens"))
      .crossJoin(broadcast(total))
      .select(col("n_docs"), col("n_dup_docs"), col("n_clusters"), col("dup_tokens"),
        round(col("n_dup_docs") / col("n_docs").cast(DoubleType), 6).as("dup_ratio"))
  }

  /** The estimator LSH is built on, made visible: for adjacent-id pairs,
    * the fraction of equal minhash slots (an unbiased estimate of
    * Jaccard — P[min-hash collision] = J) next to the exact token-set
    * Jaccard it estimates. Integer slot-match count, n/8 exact in
    * binary, so the whole comparison is hash-stable. This is the
    * tuning-loop query for picking K and the band shape on a real
    * corpus. */
  val minhashJaccardEst: Q = {
    val eqSum = (0 until K).map(i =>
      s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")
    Q(
      "q_minhash_jaccard_est",
      s"""WITH $candCteSql, sets AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t,
         |    len(list_distinct(string_split(text, ' '))) AS n
         |  FROM documents
         |)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST($eqSum AS INTEGER) AS n_match,
         |  ($eqSum) / ${K}.0 AS est_jaccard,
         |  len(list_intersect(x.t, y.t))
         |    / (x.n + y.n - len(list_intersect(x.t, y.t))) AS jaccard
         |FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
         |JOIN sets x ON x.doc_id = a.doc_id
         |JOIN sets y ON y.doc_id = b.doc_id
         |ORDER BY a_id""".stripMargin
    ) { (s, d) =>
      val sig = T.documents(s, d)
        .select(col("doc_id"),
          graft.functions.MinhashSig.sig(s, split(col("text"), " "), K).as("sig"),
          array_distinct(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), col("sig"), col("t"),
          size(col("t")).cast(LongType).as("n"))
      val a = sig.select(col("doc_id").as("a_id"), col("sig").as("sa"),
        col("t").as("ta"), col("n").as("na"))
      val b = sig.select(col("doc_id").as("b_id"), col("sig").as("sb"),
        col("t").as("tb"), col("n").as("nb"))
      val nMatch = (1 to K).map(i =>
        when(element_at(col("sa"), i) === element_at(col("sb"), i), 1).otherwise(0))
        .reduce(_ + _)
      val inter = size(array_intersect(col("ta"), col("tb"))).cast(LongType)
      val uni = col("na") + col("nb") - inter
      a.join(b, col("b_id") === col("a_id") + 1)
        .select(col("a_id"), col("b_id"),
          nMatch.as("n_match"),
          (nMatch / lit(K.toDouble)).as("est_jaccard"),
          (inter / uni).as("jaccard"))
        .orderBy("a_id")
    }
  }

  /** Sequence-level EXACT-substring dedup — the training-data dedup
    * family MinHash/SimHash (whole-doc near-dup) and q_dedup_text
    * (whole-doc exact) do not cover: find passages duplicated VERBATIM
    * across documents, the way a crawl duplicates boilerplate or quoted
    * text into otherwise-distinct pages.
    *
    * Every W-token sliding window is digested to md5 map-side (the text
    * never crosses a shuffle — the exchange carries 16-byte digests, the
    * same discipline as the MinHash banding above); spans seen in more
    * than one document are reported with their occurrence count and
    * keeper (min doc_id — the doc a scrubber would keep the passage in).
    * At 100 TB the shuffle is O(tokens) fixed-width keys with map-side
    * partial aggregation; a production scrubber would follow with a
    * per-doc join against this table to mask spans where
    * doc_id != keeper. */
  private val W = 8 // substring-span width in tokens (shared with the scrub)

  /** SQL: (doc_id, i, h) — every W-token span with its 1-based start. */
  private val spanCteSql: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |spans AS (
       |  SELECT doc_id, s['i'] AS i, s['h'] AS h FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(t) - ${W - 2}),
       |      i -> {'i': i, 'h': md5(array_to_string(t[i:i+${W - 1}], ' '))})) AS s
       |    FROM toks))""".stripMargin

  /** Spark twin: (doc_id, i, h) with the same 1-based starts; short docs
    * yield no spans. Spark's sequence(1, n) steps BACKWARDS for n < 1 —
    * guard short docs to an empty span list (DuckDB's range(1, n<1) is
    * already []). */
  private def spansOf(s: SparkSession, d: String): DataFrame = {
    val toks = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val hashes = when(size(col("t")) >= W,
      transform(sequence(lit(1), size(col("t")) - (W - 1)),
        i => md5(concat_ws(" ", slice(col("t"), i, lit(W))))))
      .otherwise(array().cast(ArrayType(StringType)))
    toks.select(col("doc_id"), posexplode(hashes).as(Seq("i0", "h")))
      .select(col("doc_id"), (col("i0") + 1).cast(LongType).as("i"), col("h"))
  }

  val substringDedup: Q = {
    Q(
      "q_substring_dedup",
      s"""WITH $spanCteSql
         |SELECT h AS span_hash, count(*) AS n_occ,
         |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keeper
         |FROM spans GROUP BY h HAVING count(DISTINCT doc_id) > 1
         |ORDER BY span_hash""".stripMargin
    ) { (s, d) =>
      // two-level aggregate instead of countDistinct: the distinct-agg
      // Expand would double every shuffled row; (h, doc_id) partials
      // dedup per doc map-side, then the per-span rollup counts docs as
      // plain rows — both levels partial-aggregating
      spansOf(s, d).select(col("doc_id"), col("h"))
        .groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("h")
        .agg(sum(col("c")).as("n_occ"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
        .select(col("h").as("span_hash"), col("n_occ"), col("n_docs"), col("keeper"))
        .orderBy("span_hash")
    }
  }

  /** The scrub CONSUMER of q_substring_dedup: rebuild every document with
    * cross-document duplicated passages masked out of every NON-keeper
    * occurrence — the boilerplate/quoted-text removal step a crawl
    * corpus goes through before training. A token is masked if any
    * duplicated W-token span that starts at-or-before it (and covers it)
    * occurs in a doc that is not that span's keeper.
    *
    * Scale shape: span digests and token positions are born map-side;
    * the mask join carries (doc_id, position) pairs only; the rebuild is
    * a per-doc sort-free aggregate (collect_list + array_sort over that
    * doc's tokens — bounded by document length, the same per-doc bound
    * every tokenizer already assumes). */
  val substringScrub: Q = Q(
    "q_substring_scrub",
    s"""WITH $spanCteSql,
       |g AS (SELECT h, min(doc_id) AS keeper FROM spans
       |  GROUP BY h HAVING count(DISTINCT doc_id) > 1),
       |mask AS (SELECT DISTINCT sp.doc_id, sp.i + o.o AS p
       |  FROM spans sp JOIN g ON g.h = sp.h AND g.keeper != sp.doc_id
       |  CROSS JOIN (SELECT unnest(range(0, $W)) AS o) o),
       |tok AS (SELECT doc_id, s['i'] AS p, s['tok'] AS tok FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
       |    i -> {'i': i, 'tok': t[i]})) AS s
       |  FROM toks))
       |SELECT t.doc_id, count(*) AS n_tokens, count(m.p) AS n_masked,
       |  string_agg(CASE WHEN m.p IS NOT NULL THEN '_' ELSE t.tok END,
       |             ' ' ORDER BY t.p) AS scrubbed_text
       |FROM tok t LEFT JOIN mask m ON m.doc_id = t.doc_id AND m.p = t.p
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
  ) { (s, d) =>
    // Round-18 optimization (guide §1.2 step 1 / §8): the span table feeds
    // TWO consumers (the duplicated-span census g and the mask join), and
    // both legs previously re-ran the full tokenize + W-token-window md5
    // pass — the single most expensive map-side work in this query.
    // Checkpoint it once (eager: the two consumers would otherwise race
    // to compute it concurrently in the final job). The artifact is
    // O(tokens) fixed-width digests — the same bound the exchange already
    // carries; at cluster scale the alternative (recompute the digest
    // pass per consumer) doubles corpus-scan CPU instead.
    val spans = spansOf(s, d).localCheckpoint()
    val g = spans.groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(count(lit(1)).as("nd"), min(col("doc_id")).as("keeper"))
      .filter(col("nd") > 1).select("h", "keeper")
    val mask = spans.join(g, "h").filter(col("keeper") =!= col("doc_id"))
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (W - 1))).as("p"))
      .distinct()
      .withColumn("m", lit(1))
    val tok = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("p"), col("tok"))
    tok.join(mask, Seq("doc_id", "p"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("m")).as("n_masked"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"),
            when(col("m").isNotNull, lit("_")).otherwise(col("tok")).as("tk")))),
          x => x.getField("tk"))).as("scrubbed_text"))
      .orderBy("doc_id")
  }

  /** Incremental INGEST dedup — the dedup member of the delta family
    * (its 7th, after IVF/PQ/CC/PR/BM25/BPE): the production pattern for
    * a training-data pipeline is not "dedup the corpus nightly" but
    * "check each arriving batch against everything already admitted".
    * The frozen base is a PER-BUCKET SUMMARY of the admitted corpus's
    * LSH bands — (band, bucket) → (min admitted id, population) — so the
    * base artifact is O(distinct buckets), not even O(corpus) (ModelCache
    * "dedup-base"); the delta batch hashes ALONE (O(delta) MinhashSig
    * kernel work) and each delta doc reports its keeper candidate, its
    * probe workload, and the EXACT token-set Jaccard against the keeper.
    *
    * THE SCALE LESSON (learned on the clone-saturated 10× dir): the
    * naive formulation — join delta bands against all bands and
    * enumerate (delta, smaller-id) pairs — is quadratic in the hottest
    * bucket's population (a 40k-doc clone bucket × its delta members =
    * hundreds of millions of rows on ONE join key; 8 minutes at 10×).
    * The pair join is UNNECESSARY: ids are split-partitioned (every
    * admitted id < split ≤ every delta id), so per bucket the base
    * contributes `population` smaller ids and `min id` as its best
    * keeper in O(1) from the frozen summary, and within the delta the
    * smaller-id count is just rank-1 by a per-bucket window (sort, not
    * pairs). dup_of = min over the doc's buckets of (base min, delta
    * bucket min when not first); n_probes = Σ per-bucket smaller-id
    * counts (a multiset census of the probe workload — the quantity a
    * deployment budgets). No pair set is ever materialized; the exact
    * verify fetches two token sets for ONE pair per flagged doc. The
    * ORACLE runs the identical window/pre-agg formulation on the
    * full-corpus banding: probe-the-frozen-base == rebuild, proven by
    * the shared hash and a local recompute spec. */
  /** The frozen ingest-dedup artifact, shared by q_dedup_delta and the
    * streaming admission gate (Stateful.dedupGate): (split id, per-bucket
    * (b_min, b_cnt) summary of the admitted corpus's LSH bands). */
  private[graft] def dedupBase(s: SparkSession, d: String): (Long, DataFrame) =
    graft.core.ModelCache.getOrRefreshGuarded(s, "dedup-base", s"$d/documents.parquet") {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val maxRow = docs.agg(max(col("doc_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxId / 8L
      val agg = bandsOfDocs(s, docs.filter(col("doc_id") < sp))
        .groupBy("band", "bucket")
        .agg(min(col("doc_id")).as("b_min"), count(lit(1)).as("b_cnt"))
        .localCheckpoint()
      (sp, agg)
    } { case ((sp0, agg0), newFiles) =>
      // REFREEZE (round-11 verdict #1): the per-bucket (min, count)
      // summary is a monoid over disjoint doc sets, so the next frozen
      // base = old base ⊕ banded slice [sp0, sp1) — only the newly
      // admitted docs are ever hashed; the old corpus is never re-read.
      // RefreshSpec pins refresh == retrain bit-identically. Backfill
      // guard (round-15 verdict #1): a new file with doc_id < sp0 sits
      // inside the frozen prefix the slice scan never revisits — decline
      // the merge, ModelCache retrains.
      if (graft.core.Backfill.below(s, newFiles, "doc_id", sp0)) None
      else Some {
        val docs = T.documents(s, d).select(col("doc_id"), col("text"))
        val maxRow = docs.agg(max(col("doc_id"))).head()
        val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
        val sp1 = math.max(7L * maxId / 8L, sp0) // monotone, now CHECKED
        val deltaAgg = bandsOfDocs(s,
            docs.filter(col("doc_id") >= sp0 && col("doc_id") < sp1))
          .groupBy("band", "bucket")
          .agg(min(col("doc_id")).as("b_min"), count(lit(1)).as("b_cnt"))
        val agg1 = agg0.unionAll(deltaAgg)
          .groupBy("band", "bucket")
          .agg(min(col("b_min")).as("b_min"), sum(col("b_cnt")).as("b_cnt"))
          .localCheckpoint()
        (sp1, agg1)
      }
    }

  val dedupDelta: Q = {
    val Sentinel = Long.MaxValue
    Q(
      "q_dedup_delta",
      s"""WITH $sigBandsCteSql,
         |sp AS (SELECT 7 * max(doc_id) // 8 AS sp FROM documents),
         |bb AS (SELECT band, bucket, CAST(min(doc_id) AS BIGINT) AS b_min,
         |         CAST(count(*) AS BIGINT) AS b_cnt
         |       FROM bands CROSS JOIN sp WHERE doc_id < sp.sp GROUP BY 1, 2),
         |db AS (SELECT doc_id, band, bucket,
         |         CAST(row_number() OVER (
         |           PARTITION BY band, bucket ORDER BY doc_id) AS BIGINT) AS rk,
         |         CAST(min(doc_id) OVER (PARTITION BY band, bucket) AS BIGINT)
         |           AS d_min
         |       FROM bands CROSS JOIN sp WHERE doc_id >= sp.sp),
         |per AS (SELECT db.doc_id AS did,
         |    coalesce(bb.b_cnt, 0) + db.rk - 1 AS n_smaller,
         |    least(coalesce(bb.b_min, ${Sentinel}),
         |      CASE WHEN db.rk > 1 THEN db.d_min ELSE ${Sentinel} END) AS mc
         |  FROM db LEFT JOIN bb ON bb.band = db.band AND bb.bucket = db.bucket),
         |agg AS (SELECT did,
         |    CAST(CASE WHEN min(mc) = ${Sentinel} THEN NULL
         |         ELSE min(mc) END AS BIGINT) AS dup_of,
         |    CAST(sum(n_smaller) AS BIGINT) AS n_probes
         |  FROM per GROUP BY did),
         |tsets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
         |          FROM documents),
         |ver AS (SELECT g.did, g.dup_of, g.n_probes,
         |  CAST((len(list_intersect(tb.ts, ta.ts)) * 1000000) //
         |       (len(tb.ts) + len(ta.ts) - len(list_intersect(tb.ts, ta.ts)))
         |    AS BIGINT) AS jac_ppm
         |  FROM agg g JOIN tsets tb ON tb.doc_id = g.did
         |             JOIN tsets ta ON ta.doc_id = g.dup_of)
         |SELECT d.doc_id, v.dup_of,
         |  CAST(coalesce(a2.n_probes, 0) AS BIGINT) AS n_probes, v.jac_ppm
         |FROM documents d CROSS JOIN sp
         |LEFT JOIN agg a2 ON a2.did = d.doc_id
         |LEFT JOIN ver v ON v.did = d.doc_id
         |WHERE d.doc_id >= sp.sp
         |ORDER BY d.doc_id""".stripMargin
    ) { (s, d) =>
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val (splitId, baseAgg) = dedupBase(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("band", "bucket")
      val db = bandsOfDocs(s, docs.filter(col("doc_id") >= splitId))
        .withColumn("rk",
          row_number().over(w.orderBy("doc_id")).cast(LongType))
        .withColumn("d_min", min(col("doc_id")).over(w))
      val per = db
        .join(baseAgg, Seq("band", "bucket"), "left")
        .select(col("doc_id").as("did"),
          (coalesce(col("b_cnt"), lit(0L)) + col("rk") - 1L).as("n_smaller"),
          least(coalesce(col("b_min"), lit(Sentinel)),
            when(col("rk") > 1L, col("d_min")).otherwise(Sentinel)).as("mc"))
      val agg = per.groupBy("did")
        .agg(min(col("mc")).as("m"), sum(col("n_smaller")).as("n_probes"))
        .select(col("did"),
          when(col("m") === Sentinel, lit(null).cast(LongType))
            .otherwise(col("m")).as("dup_of"),
          col("n_probes"))
      val tsets = docs
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
      val inter = size(array_intersect(col("tsb"), col("tsa"))).cast(LongType)
      val union = size(col("tsb")).cast(LongType) +
        size(col("tsa")).cast(LongType) - inter
      val ver = agg.filter(col("dup_of").isNotNull)
        .join(tsets.select(col("doc_id").as("did"), col("ts").as("tsb")), Seq("did"))
        .join(tsets.select(col("doc_id").as("dup_of"), col("ts").as("tsa")),
          Seq("dup_of"))
        .withColumn("n_inter", inter)
        .withColumn("n_union", union)
        .select(col("did"), col("dup_of"),
          expr("(n_inter * 1000000) div n_union").as("jac_ppm"))
      docs.filter(col("doc_id") >= splitId).select(col("doc_id"))
        .join(agg.select(col("did").as("doc_id"), col("n_probes")),
          Seq("doc_id"), "left")
        .join(ver.select(col("did").as("doc_id"), col("dup_of"), col("jac_ppm")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_of"),
          coalesce(col("n_probes"), lit(0L)).as("n_probes"), col("jac_ppm"))
        .orderBy("doc_id")
    }
  }

  /** Cross-source duplication census — the PROVENANCE half of dedup
    * that decides source precedence before a crawl merge: per ordered
    * source pair, how many LSH buckets the two sources co-occupy and
    * how many candidate near-dup pairs that implies. No doc pair is
    * ever materialized: the per-bucket per-source POPULATION census
    * (O(buckets × sources), sources is small) yields the pair count in
    * closed form — n·(n−1)/2 within a source, n_a·n_b across — so the
    * op is immune to the clone-saturated hot-bucket blowup the pair
    * join suffers (the q_dedup_delta lesson applied at census grain).
    * Counts are the standard band-multiset upper bound (a pair sharing
    * k band buckets counts k times — the probe-workload convention of
    * n_probes). Exact integers end to end; the bucket-level self-join
    * keys on (band, bucket), the same shuffle the banding census
    * already pays. */
  val sourceOverlap: Q = Q(
    "q_source_overlap",
    s"""WITH $sigBandsCteSql,
       |bs AS (SELECT b.band, b.bucket, d.source, CAST(count(*) AS BIGINT) AS n
       |  FROM bands b JOIN documents d USING (doc_id) GROUP BY 1, 2, 3),
       |px AS (SELECT a.source AS source_a, b.source AS source_b,
       |    CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
       |         ELSE a.n * b.n END AS np
       |  FROM bs a JOIN bs b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.source <= b.source)
       |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(np) AS BIGINT) AS cand_pairs
       |FROM px WHERE np > 0
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val bs = bandsOfDocs(s, docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("band", "bucket", "source")
      .agg(count(lit(1)).as("n"))
    val a = bs.select(col("band"), col("bucket"),
      col("source").as("source_a"), col("n").as("na"))
    val b = bs.select(col("band"), col("bucket"),
      col("source").as("source_b"), col("n").as("nb"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("source_a") <= col("source_b"))
      .select(col("source_a"), col("source_b"),
        when(col("source_a") === col("source_b"),
          expr("na * (na - 1) div 2")).otherwise(col("na") * col("nb"))
          .as("np"))
      .filter(col("np") > 0)
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_buckets"), sum(col("np")).as("cand_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** Threshold SWEEP over the near-dup pipeline — the tuning census run
    * before committing to a Jaccard bar: q_dedup_report answers "how
    * much is duplicate at 0.5", this answers "how does the removed mass
    * move as the bar moves" (40..90 pct), which is the number that
    * decides the threshold in the first place. For each threshold: docs
    * whose keeper-pair survives it, distinct keepers among them
    * (clusters engaged), and the raw token mass removal would reclaim.
    * The verdict is the EXACT set Jaccard, compared in INTEGERS
    * (inter·100 ≥ thr·union — no float ratio exists anywhere), so both
    * engines agree bit-for-bit at every threshold.
    *
    * Scale shape: ONE candidate-pair verification pass (the
    * q_neardup_pipeline join — LSH-bounded, one pair per doc), a 6-row
    * Generate over the thresholds, and a two-level partial agg
    * ((thr, doc) → thr); the sweep costs one extra tiny aggregation over
    * the verify pass a pipeline already pays. */
  val dedupSweep: Q = Q(
    "q_dedup_sweep",
    s"""WITH $candCteSql, sets AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t,
       |    len(list_distinct(string_split(text, ' '))) AS n,
       |    len(string_split(text, ' ')) AS n_tok
       |  FROM documents
       |),
       |pairs AS (SELECT c.doc_id, c.keeper_id, x.n_tok,
       |    len(list_intersect(x.t, y.t)) AS ni,
       |    x.n + y.n - len(list_intersect(x.t, y.t)) AS nu
       |  FROM cand c JOIN sets x ON x.doc_id = c.doc_id
       |  JOIN sets y ON y.doc_id = c.keeper_id)
       |SELECT thr_pct,
       |  CAST(count(*) AS BIGINT) AS n_flagged,
       |  CAST(count(DISTINCT keeper_id) AS BIGINT) AS n_keepers,
       |  CAST(sum(n_tok) AS BIGINT) AS flagged_tokens
       |FROM pairs CROSS JOIN
       |  (SELECT unnest([40, 50, 60, 70, 80, 90]) AS thr_pct)
       |WHERE ni * 100 >= thr_pct * nu
       |GROUP BY thr_pct ORDER BY thr_pct""".stripMargin
  ) { (s, d) =>
    val cand = candidatePairs(s, d)
    val sets = T.documents(s, d)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("t"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .select(col("doc_id"), col("t"), size(col("t")).cast(LongType).as("n"),
        col("n_tok"))
    val inter = size(array_intersect(col("t_x"), col("t_y"))).cast(LongType)
    val uni = col("n_x") + col("n_y") - inter
    cand
      .join(sets.select(col("doc_id"), col("t").as("t_x"), col("n").as("n_x"),
        col("n_tok")), "doc_id")
      .join(sets.select(col("doc_id").as("keeper_id"), col("t").as("t_y"),
        col("n").as("n_y")), "keeper_id")
      .select(col("doc_id"), col("keeper_id"), col("n_tok"),
        inter.as("ni"), uni.as("nu"))
      .withColumn("thr_pct",
        explode(array((40 to 90 by 10).map(t => lit(t)): _*)))
      .filter(col("ni") * 100 >= col("thr_pct") * col("nu"))
      .groupBy("thr_pct")
      .agg(count(lit(1)).as("n_flagged"),
        countDistinct(col("keeper_id")).as("n_keepers"),
        sum(col("n_tok")).as("flagged_tokens"))
      .orderBy("thr_pct")
  }

  /** Census-key digest switch (round-19 verdict ask #3, guide §2.3
    * "narrower types"): when ON, the shingle/bigram census families key
    * their exchanges on `xxhash64` 8-byte fingerprints instead of the
    * ~50-byte shingle strings — every downstream groupBy/join/distinct
    * is key-only (the strings never surface in any declared output), so
    * the exchanges, checkpoints and frozen artifacts shrink ~6× at
    * identical semantics (modulo 64-bit collisions: ~3e-8 at 1e6
    * distinct shingles; the 10× oracle gate hash-verifies the switch ON
    * end to end). Config `spark.graft.censusDigest` = on | off | auto
    * (default auto); env SPARK_GRAFT_CENSUS_DIGEST overrides for A/Bs.
    * AUTO resolves by input size: ON once the documents table under `d`
    * exceeds 2 MB — i.e. OFF at the driver's sf0.001–0.1 dirs (bench
    * comparability: the extra map-side hash pass is a small local
    * regression on single-row-group scans, the r18 measured rejection)
    * and ON at ScaleGen 10×+ dirs, where exchange bytes are the cost.
    * The flag must be stable within a session for a given dir (frozen
    * artifacts store digested keys); specs that flip it call
    * ModelCache.clear() first. q_containment_est deliberately stays on
    * strings: its MinHash leg pins md5-of-the-shingle-STRING semantics
    * against the oracle. */
  private[graft] def censusDigest(s: SparkSession, d: String): Boolean =
    sys.env.get("SPARK_GRAFT_CENSUS_DIGEST").filter(_.nonEmpty)
      .orElse(s.conf.getOption("spark.graft.censusDigest"))
      .getOrElse("auto") match {
      case "on"  => true
      case "off" => false
      case _ =>
        val p = java.nio.file.Paths.get(d, "documents.parquet")
        val bytes =
          try {
            if (java.nio.file.Files.isDirectory(p)) {
              val st = java.nio.file.Files.walk(p)
              try st.filter(java.nio.file.Files.isRegularFile(_))
                .mapToLong(java.nio.file.Files.size(_)).sum()
              finally st.close()
            } else java.nio.file.Files.size(p)
          } catch { case _: Throwable => 0L } // non-local FS: stay off
        bytes >= 2L * 1024 * 1024
    }

  /** The canonical 8-token shingle relation (doc_id, shingle), distinct
    * per doc — q_contamination's definition, shared by the containment
    * census, its streaming admission gate, and their specs so all four
    * see the same shingles. With `digest` (see [[censusDigest]]) the
    * shingle column is its xxhash64 fingerprint (LongType) — callers
    * that only ever key on the column are oblivious; the streaming
    * verdict helpers auto-detect from the base relation's dtype so an
    * arriving micro-batch always matches its frozen artifact. */
  private[graft] def shinglesOf(docs: org.apache.spark.sql.DataFrame,
      digest: Boolean = false): org.apache.spark.sql.DataFrame = {
    val raw = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("shingle"))
    // hash BEFORE the distinct so even the first exchange ships 8-byte keys
    (if (digest) raw.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
     else raw)
      .distinct()
  }

  /** Frozen engulfment-probe artifact for the streaming admission gate:
    * the covered doc-id bound, the base corpus's full shingle relation,
    * the per-shingle df census, the rare-shingle inverted index (df ≤ 8
    * IN THE BASE — an arriving doc is the occurrence that makes a df-1
    * shingle pair-worthy, so the lower bound of the batch census's 2..8
    * band does not apply), and per-doc set sizes. */
  final case class ContainBase(sp: Long,
      full: org.apache.spark.sql.DataFrame,
      df: org.apache.spark.sql.DataFrame,
      rareIdx: org.apache.spark.sql.DataFrame,
      sizes: org.apache.spark.sql.DataFrame)

  /** containment-base — the TENTH delta-family member (round-13 verdict
    * ask #2, retiring the retrain-only lifecycle). Round 13 argued the
    * rare index is not monoidal because an append can push a shingle's
    * df PAST the cap, and removal is what base ⊕ delta cannot express —
    * but the per-shingle DF CENSUS is a count monoid under append, and
    * rare membership can only change for DELTA-TOUCHED shingles (df
    * never decreases). So the refresh is the lp-base census pattern:
    * merge df for delta keys alone (base counts fetched by a lazy
    * key-semi-join over the frozen census, never a base-sized shuffle
    * or write), keep every untouched row behind a lazy anti-join, then
    * rebuild ONLY the rare-index slice whose membership changed —
    * postings of shingles crossing OUT (merged df > 8) drop behind an
    * anti-join on the delta-sized out-set; delta postings of shingles
    * staying/arriving ≤ 8 append. Base postings of a still-rare shingle
    * are already in the stored index (train capped at the same ≤ 8), so
    * no old document is ever re-shingled: every checkpoint is
    * delta-sized, flattenWide bounds the stored unions' depth, and a
    * non-append rewrite falls back to retrain via the fingerprint as
    * everywhere else. RefreshSpec pins refresh == retrain bit-identically
    * including a shingle crossing INTO and OUT OF the rare band. */
  private[graft] def containmentBase(s: SparkSession, d: String): ContainBase =
    graft.core.ModelCache.getOrRefreshGuarded(s, "containment-base", s"$d/documents.parquet") {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val maxRow = docs.agg(max(col("doc_id"))).head()
      // 7/8 doc-id split (the sessBase convention): the artifact freezes
      // the prefix, the tail stays a live serve-time delta — so the
      // base ⊕ delta merge ([[containmentServe]]) is exercised by the
      // oracle gate on every run, never structurally empty
      val sp = if (maxRow.isNullAt(0)) -1L else 7L * maxRow.getLong(0) / 8L
      val sh = shinglesOf(docs.filter(col("doc_id") <= sp), censusDigest(s, d))
        .select(col("doc_id").as("bdoc"), col("shingle"))
        .localCheckpoint()
      val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .localCheckpoint()
      ContainBase(sp, sh, df,
        sh.join(df.filter(col("df") <= 8).select("shingle"), "shingle")
          .localCheckpoint(),
        sh.groupBy("bdoc").agg(count(lit(1)).as("n_base")).localCheckpoint())
    } { case (ContainBase(sp0, full0, df0, rareIdx0, sizes0), newFiles) =>
      // Backfill guard (round-15 verdict #1): this base freezes the
      // INCLUSIVE prefix doc_id <= sp0, so a new file at doc_id <= sp0
      // (i.e. < sp0 + 1) breaks the slice merge — decline, retrain.
      if (graft.core.Backfill.below(s, newFiles, "doc_id", sp0 + 1)) None
      else Some {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val maxRow = docs.agg(max(col("doc_id"))).head()
      val sp1 = math.max(
        if (maxRow.isNullAt(0)) -1L else 7L * maxRow.getLong(0) / 8L, sp0)
      val shD = shinglesOf(
          docs.filter(col("doc_id") > sp0 && col("doc_id") <= sp1),
          censusDigest(s, d))
        .select(col("doc_id").as("bdoc"), col("shingle"))
        .localCheckpoint()
      val dfD = shD.groupBy("shingle").agg(count(lit(1)).as("df"))
      val dKeys = broadcast(dfD.select("shingle"))
      // merged census rows for delta-touched shingles only — the lp-base
      // shape: old counts arrive via a lazy semi-join on the frozen
      // census (a scan, never a base-sized write)
      val mergedD = dfD.unionAll(df0.join(dKeys, Seq("shingle"), "left_semi"))
        .groupBy("shingle").agg(sum(col("df")).as("df"))
        .localCheckpoint()
      val df1 = graft.core.Session.flattenWide(
        df0.join(dKeys, Seq("shingle"), "left_anti").unionAll(mergedD))
      // rare membership: df only grows, so only delta-touched shingles
      // can cross the cap — and only OUTWARD
      val outShingles = mergedD.filter(col("df") > 8).select("shingle")
        .localCheckpoint()
      val rareDeltaPostings = shD
        .join(broadcast(mergedD.filter(col("df") <= 8).select("shingle")),
          "shingle")
        .localCheckpoint()
      val rareIdx1 = graft.core.Session.flattenWide(
        rareIdx0.join(broadcast(outShingles), Seq("shingle"), "left_anti")
          .unionByName(rareDeltaPostings))
      val full1 = graft.core.Session.flattenWide(full0.unionByName(shD))
      val sizes1 = graft.core.Session.flattenWide(
        sizes0.unionByName(
          shD.groupBy("bdoc").agg(count(lit(1)).as("n_base")).localCheckpoint()))
      ContainBase(sp1, full1, df1, rareIdx1, sizes1)
      }
    }

  /** Shingle-CONTAINMENT census — the near-dup direction Jaccard misses:
    * a short doc engulfed inside a long one (boilerplate-wrapped repost,
    * quote-expansion, aggregator page) has low Jaccard (the union is
    * dominated by the engulfer) but overlap-coefficient ≈ 1. Per flagged
    * pair: the engulfed doc (smaller 8-token-shingle set; tie → lower
    * id), its engulfer, both set sizes, the exact common-shingle count,
    * and cont_pct = ⌊100·|∩| / n_small⌋ — integers end to end, pairs
    * kept at ≥ 50%.
    *
    * Scale shape — candidate generation is an inverted index on RARE
    * shingles only (2 ≤ df ≤ 8): df=1 shingles pair nobody, df>8
    * shingles are template boilerplate (they signal shared chrome, not
    * engulfment) AND are exactly the hot keys that would blow up a
    * pair join — capping df bounds per-shingle fan-out at C(8,2)=28
    * pairs, so candidate volume is O(rare shingles), never O(docs²).
    * Verification is the exact set-intersection join over candidates —
    * LSH-free because the candidates are already evidence-bearing (a
    * shared rare shingle). The shingle relation is checkpointed once
    * and reused by all four consumers (census, df, both pair sides).
    * Fixture note: the ScaleGen 10× dir clones every doc ~10×, lifting
    * every shingle's df past the cap — the boilerplate filter correctly
    * rejects cloned mass there and the census is empty (hash-equal with
    * DuckDB); organic growth keeps rare shingles rare (sf0.1: 256
    * flagged pairs).
    * Reference anchor: none (duckdb_cdc.go has no analytics); this is
    * the training-data curation surface (SURVEY §2B dedup family,
    * q_contamination's canonical 8-token shingle definition). */
  /** q_dedup_containment's oracle, shared verbatim by
    * [[containmentDelta]]: the artifact-served census must reproduce the
    * SAME flagged pairs. */
  private val containmentSql: String =
    """WITH toksr AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh0 AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
      |                         for i in generate_series(1, len(toks) - 7)]) AS shingle
      |  FROM toksr WHERE len(toks) >= 8),
      |sh AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM sh0),
      |sz AS MATERIALIZED (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      |rare AS (
      |  SELECT shingle FROM sh GROUP BY shingle
      |  HAVING count(*) BETWEEN 2 AND 8),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM sh a JOIN rare r ON a.shingle = r.shingle
      |            JOIN sh b ON b.shingle = r.shingle
      |  WHERE a.doc_id < b.doc_id),
      |com AS (
      |  SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS n_common
      |  FROM cand c JOIN sh ta ON ta.doc_id = c.da
      |              JOIN sh tb ON tb.doc_id = c.db AND tb.shingle = ta.shingle
      |  GROUP BY 1, 2)
      |SELECT CASE WHEN sb.n < sa.n THEN c.db ELSE c.da END AS engulfed,
      |  CASE WHEN sb.n < sa.n THEN c.da ELSE c.db END AS engulfer,
      |  least(sa.n, sb.n) AS n_small, greatest(sa.n, sb.n) AS n_big, n_common,
      |  (100 * n_common) // least(sa.n, sb.n) AS cont_pct
      |FROM com c JOIN sz sa ON sa.doc_id = c.da JOIN sz sb ON sb.doc_id = c.db
      |WHERE 100 * n_common >= 50 * least(sa.n, sb.n)
      |ORDER BY 1, 2""".stripMargin

  val dedupContainment: Q = Q(
    "q_dedup_containment",
    containmentSql
  ) { (s, d) =>
    val sh = shinglesOf(T.documents(s, d).select(col("doc_id"), col("text")),
        censusDigest(s, d))
      .localCheckpoint() // reused by sz, rare, both pair sides, verify
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 8)).select("shingle")
    val withRare = sh.join(rare, "shingle")
    val cand = withRare.select(col("shingle"), col("doc_id").as("da"))
      .join(withRare.select(col("shingle"), col("doc_id").as("db")), "shingle")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val com = cand
      .join(sh.select(col("doc_id").as("da"), col("shingle")), Seq("da"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), Seq("db", "shingle"))
      .groupBy("da", "db").agg(count(lit(1)).as("n_common"))
    com
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(lit(100) * col("n_common") >= lit(50) * least(col("na"), col("nb")))
      .select(
        when(col("nb") < col("na"), col("db")).otherwise(col("da")).as("engulfed"),
        when(col("nb") < col("na"), col("da")).otherwise(col("db")).as("engulfer"),
        least(col("na"), col("nb")).as("n_small"),
        greatest(col("na"), col("nb")).as("n_big"),
        col("n_common"),
        expr("(100 * n_common) div least(na, nb)").as("cont_pct"))
      .orderBy("engulfed", "engulfer")
  }

  /** Containment ESTIMATOR eval — can the K=8 MinHash signature stand in
    * for the exact overlap coefficient? For every pair the exact census
    * ([[dedupContainment]]) flags, report the exact containment (ppm)
    * next to the sketch-derived estimate: Ĵ = matching-component
    * fraction of the SHINGLE-set signatures, algebraically converted to
    * containment via |∩|̂ = Ĵ(n_a+n_b)/(1+Ĵ), Ĉ = |∩|̂/n_small — the
    * standard size-aware Jaccard→containment bridge, possible because
    * exact set SIZES are one groupBy away while exact INTERSECTIONS are
    * the expensive part sketches exist to avoid. The q_ann_recall /
    * q_lsh_recall pattern applied to the dedup axis: the estimator and
    * its ground truth in one row, so a threshold decision reads its own
    * error margin. Signatures are one map-side kernel pass per doc
    * (duplicates cannot perturb a min); floats appear only in the final
    * identical-shape division, rounded to 6 dp (H3 discipline). */
  val containmentEst: Q = Q(
    "q_containment_est",
    s"""WITH toksr AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh0 AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
      |                         for i in generate_series(1, len(toks) - 7)]) AS shingle
      |  FROM toksr WHERE len(toks) >= 8),
      |sh AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM sh0),
      |sz AS MATERIALIZED (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      |rare AS (
      |  SELECT shingle FROM sh GROUP BY shingle
      |  HAVING count(*) BETWEEN 2 AND 8),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM sh a JOIN rare r ON a.shingle = r.shingle
      |            JOIN sh b ON b.shingle = r.shingle
      |  WHERE a.doc_id < b.doc_id),
      |com AS (
      |  SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS n_common
      |  FROM cand c JOIN sh ta ON ta.doc_id = c.da
      |              JOIN sh tb ON tb.doc_id = c.db AND tb.shingle = ta.shingle
      |  GROUP BY 1, 2),
      |el AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS a,
      |    ('0x' || substr(md5(shingle), 13, 12))::BIGINT AS b
      |  FROM sh),
      |sig AS MATERIALIZED (
      |  SELECT doc_id, ${(0 until K).map(i => s"min(a + $i * b) AS h$i").mkString(", ")}
      |  FROM el GROUP BY doc_id)
      |SELECT c.da AS a_id, c.db AS b_id,
      |  least(sa.n, sb.n) AS n_small, n_common,
      |  (1000000 * n_common) // least(sa.n, sb.n) AS exact_ppm,
      |  CAST(${(0 until K).map(i => s"CASE WHEN ga.h$i = gb.h$i THEN 1 ELSE 0 END").mkString(" + ")} AS BIGINT) AS n_match,
      |  round((${(0 until K).map(i => s"CASE WHEN ga.h$i = gb.h$i THEN 1 ELSE 0 END").mkString(" + ")}) / $K.0
      |    * (sa.n + sb.n)
      |    / ((1 + (${(0 until K).map(i => s"CASE WHEN ga.h$i = gb.h$i THEN 1 ELSE 0 END").mkString(" + ")}) / $K.0)
      |       * least(sa.n, sb.n)), 6) AS est_containment
      |FROM com c JOIN sz sa ON sa.doc_id = c.da JOIN sz sb ON sb.doc_id = c.db
      |  JOIN sig ga ON ga.doc_id = c.da JOIN sig gb ON gb.doc_id = c.db
      |WHERE 100 * n_common >= 50 * least(sa.n, sb.n)
      |ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    // digest=false ALWAYS: the sig leg below collect_lists the shingle
    // STRINGS and MinhashSig md5-hashes them — the oracle's el/sig CTEs
    // pin md5-of-the-string, so this family cannot ride the digest switch
    val sh = shinglesOf(T.documents(s, d).select(col("doc_id"), col("text")))
      .localCheckpoint() // census, rare, pair sides, verify, and sigs
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 8)).select("shingle")
    val withRare = sh.join(rare, "shingle")
    val cand = withRare.select(col("shingle"), col("doc_id").as("da"))
      .join(withRare.select(col("shingle"), col("doc_id").as("db")), "shingle")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val com = cand
      .join(sh.select(col("doc_id").as("da"), col("shingle")), Seq("da"))
      .join(sh.select(col("doc_id").as("db"), col("shingle")), Seq("db", "shingle"))
      .groupBy("da", "db").agg(count(lit(1)).as("n_common"))
    val sig = sh.groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("shs"))
      .select(col("doc_id"),
        graft.functions.MinhashSig.sig(s, col("shs"), K).as("sig"))
    val nMatch = (1 to K).map(i =>
      when(element_at(col("sa"), i) === element_at(col("sb"), i), 1L).otherwise(0L))
      .reduce(_ + _)
    val jhat = nMatch / lit(K.toDouble)
    com
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .join(sig.select(col("doc_id").as("da"), col("sig").as("sa")), "da")
      .join(sig.select(col("doc_id").as("db"), col("sig").as("sb")), "db")
      .filter(lit(100) * col("n_common") >= lit(50) * least(col("na"), col("nb")))
      .select(col("da").as("a_id"), col("db").as("b_id"),
        least(col("na"), col("nb")).as("n_small"), col("n_common"),
        expr("(1000000 * n_common) div least(na, nb)").as("exact_ppm"),
        nMatch.as("n_match"),
        round(jhat * (col("na") + col("nb")) /
          ((lit(1) + jhat) * least(col("na"), col("nb"))), 6)
          .as("est_containment"))
      .orderBy("a_id", "b_id")
  }

  /** Incremental containment census — the ELEVENTH delta-family member
    * (q_concurrency_delta's pattern on the dedup axis): the SAME
    * engulfment census as [[dedupContainment]], produced WITHOUT
    * re-shingling the frozen corpus. The containment-base artifact
    * supplies the 7/8-prefix shingle relation, df census, rare postings,
    * and per-doc sizes; serve-time shingles ONLY the 1/8 doc-id tail
    * ([[containmentServe]] — the merge leg is LIVE in every oracle run,
    * and RefreshSpec pins the same algebra bit-identical through the
    * refresh path), merges the df census for delta-touched shingles, and
    * rebuilds the census from the merged 2..8 band. A rare shingle's
    * total df ≤ 8 implies its base df ≤ 8, so every base posting it
    * needs is already in the stored index — no old document is ever
    * re-read. Oracle: q_dedup_containment's SQL VERBATIM. PlanShapeSpec
    * pins that every corpus scan in the serve plan carries the pushed
    * doc_id split bound (row-group pruning makes the empty delta free). */
  /** Whole-corpus containment relations: the frozen artifact ⊕ the
    * serve-time delta slice (docs past the 7/8 split), merged with the
    * SAME algebra the refresh uses — shared by [[containmentDelta]] and
    * the streaming admission gate. `rareCand` is a superset of every
    * band's postings (total df ≤ 8 ⇒ base df ≤ 8 ⇒ base postings are in
    * the stored index; delta postings ride along) — band-filter it
    * against `df`. One localCheckpoint on the delta shingles: they feed
    * four consumers and are O(corpus/8). */
  final case class ContainView(full: org.apache.spark.sql.DataFrame,
      df: org.apache.spark.sql.DataFrame,
      rareCand: org.apache.spark.sql.DataFrame,
      sizes: org.apache.spark.sql.DataFrame)

  private[graft] def containmentServe(s: SparkSession, d: String): ContainView = {
    val base = containmentBase(s, d)
    val shD = shinglesOf(
        T.documents(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") > base.sp), censusDigest(s, d))
      .select(col("doc_id").as("bdoc"), col("shingle"))
      .localCheckpoint()
    val dfD = shD.groupBy("shingle").agg(count(lit(1)).as("df"))
    val dKeys = broadcast(dfD.select("shingle"))
    val mergedD = dfD
      .unionAll(base.df.join(dKeys, Seq("shingle"), "left_semi"))
      .groupBy("shingle").agg(sum(col("df")).as("df"))
    val dfAll = base.df.join(dKeys, Seq("shingle"), "left_anti")
      .unionAll(mergedD)
    ContainView(
      base.full.unionByName(shD),
      dfAll,
      base.rareIdx.unionByName(shD),
      base.sizes.unionByName(
        shD.groupBy("bdoc").agg(count(lit(1)).as("n_base"))))
  }

  /** Verdict-ready PINNED view for the STREAMING containment gate
    * (round-17 verdict #2). [[containmentServe]] stays a lazy per-call
    * merge — right for the batch delta census, which runs once — but a
    * gate tick that re-derived it paid, EVERY tick: a re-shingle +
    * localCheckpoint of the live slice, a df-census merge, and the
    * rare-band join, all before the first verdict row (the "~10 jobs
    * per verdict batch" BASELINE named as the bottleneck). Here the two
    * relations a verdict actually probes are materialized ONCE per
    * corpus state — memoized through ModelCache exactly like the base
    * artifact, so an append re-points the gate (rebuild via the base's
    * delta refresh) and a rewrite retrains, preserving the mid-stream
    * re-point contract — and pinned HASH-PARTITIONED AND SORTED on
    * their per-tick join keys: localCheckpoint preserves partitioning
    * and ordering through LogicalRDD, so every tick's join exchanges
    * and sorts only the O(micro-batch) side while the corpus-sized side
    * is probed in place, never reshuffled. */
  final case class GateView(full: org.apache.spark.sql.DataFrame,
      rareIdx: org.apache.spark.sql.DataFrame)

  private[graft] def containmentGateView(s: SparkSession, d: String): GateView =
    graft.core.ModelCache.getOrTrain(s, "contain-gate", s"$d/documents.parquet") {
      val v = containmentServe(s, d)
      GateView(
        v.full.repartition(col("bdoc"), col("shingle"))
          .sortWithinPartitions("bdoc", "shingle").localCheckpoint(),
        v.rareCand
          .join(v.df.filter(col("df") <= 8).select("shingle"), "shingle")
          .repartition(col("shingle")).sortWithinPartitions("shingle")
          .localCheckpoint())
    }

  /** The novelty gate's pinned twin of [[containmentGateView]]: the
    * seen-shingle membership view materialized once per corpus state,
    * partitioned and sorted on `shingle` so a verdict tick's probe join
    * shuffles only the arriving micro-batch. */
  private[graft] def noveltySeenView(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.core.ModelCache.getOrTrain(s, "novelty-seen", s"$d/documents.parquet") {
      noveltyServe(s, d).repartition(col("shingle"))
        .sortWithinPartitions("shingle").localCheckpoint()
    }

  val containmentDelta: Q = Q("q_containment_delta", containmentSql) { (s, d) =>
    val view = containmentServe(s, d)
    val rare = view.df.filter(col("df").between(2, 8)).select("shingle")
    val postings = view.rareCand.join(rare, "shingle")
    val fullAll = view.full
    val szAll = view.sizes
      .select(col("bdoc").as("doc_id"), col("n_base").as("n"))
    val cand = postings.select(col("shingle"), col("bdoc").as("da"))
      .join(postings.select(col("shingle"), col("bdoc").as("db")), "shingle")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val com = cand
      .join(fullAll.select(col("bdoc").as("da"), col("shingle")), Seq("da"))
      .join(fullAll.select(col("bdoc").as("db"), col("shingle")),
        Seq("db", "shingle"))
      .groupBy("da", "db").agg(count(lit(1)).as("n_common"))
    com
      .join(szAll.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(szAll.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(lit(100) * col("n_common") >= lit(50) * least(col("na"), col("nb")))
      .select(
        when(col("nb") < col("na"), col("db")).otherwise(col("da")).as("engulfed"),
        when(col("nb") < col("na"), col("da")).otherwise(col("db")).as("engulfer"),
        least(col("na"), col("nb")).as("n_small"),
        greatest(col("na"), col("nb")).as("n_big"),
        col("n_common"),
        expr("(100 * n_common) div least(na, nb)").as("cont_pct"))
      .orderBy("engulfed", "engulfer")
  }

  // ---------------------------------------------------------------------
  // n-gram novelty: first-seen shingle census (round 16)
  // ---------------------------------------------------------------------

  /** Oracle SQL shared VERBATIM by q_ngram_novelty and q_novelty_delta
    * (the delta-family contract): per-shingle first owner = min doc_id,
    * novelty of a doc = the distinct shingles it owns / its distinct
    * shingles, in exact-integer ppm. */
  private val noveltySql =
    """WITH toksr AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh0 AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
      |                         for i in generate_series(1, len(toks) - 7)]) AS shingle
      |  FROM toksr WHERE len(toks) >= 8),
      |sh AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM sh0),
      |own AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY 1),
      |nv AS (SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
      |       FROM own GROUP BY 1),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
      |       FROM sh GROUP BY 1)
      |SELECT s.doc_id, s.n_shingles,
      |  CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
      |  CAST((coalesce(n.n_novel, 0) * 1000000) // s.n_shingles AS BIGINT)
      |    AS novelty_ppm
      |FROM sz s LEFT JOIN nv n ON n.doc_id = s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Per-doc novelty from a (doc_id, shingle) relation and an owner
    * census restricted to the docs the caller wants novelty credited to
    * — shared by the full query, the frozen-base train, its refresh
    * slice, and the delta serve leg, so all four can only differ in how
    * the inputs were sliced. */
  private def noveltyFrom(sh: DataFrame, own: DataFrame): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val nv = own.groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    sz.join(nv, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty_ppm", expr("(n_novel * 1000000) div n_shingles"))
      .select("doc_id", "n_shingles", "n_novel", "novelty_ppm")
  }

  /** q_ngram_novelty: ingest-order content-freshness census — for each
    * document, how much of its distinct 8-token-shingle content is seen
    * HERE FIRST (owner = min doc_id over the corpus, the ingest-id
    * order)? The curation signal between exact dedup (novelty 0 for a
    * byte-clone) and near-dup Jaccard: boilerplate-heavy docs score low
    * without any pair ever being formed, and a sampling policy can keep
    * high-novelty docs preferentially (the epoch/importance planners'
    * natural input).
    *
    * Scale shape: text never crosses a shuffle (shingles explode
    * map-side and hash-partition by shingle); the owner census is ONE
    * min-aggregation over distinct (doc, shingle) — the dedup-base
    * monoid — and per-doc novel counts fall out of the census itself
    * (group the O(distinct shingles) owner table by owner), so there is
    * no second pass over the corpus and never any pair join. O(corpus
    * shingles) total, three partial-aggregating shuffles. */
  val ngramNovelty: Q = Q("q_ngram_novelty", noveltySql) { (s, d) =>
    val sh = shinglesOf(T.documents(s, d).select(col("doc_id"), col("text")),
        censusDigest(s, d))
      .localCheckpoint() // feeds sizes + owner census
    noveltyFrom(sh,
      sh.groupBy("shingle").agg(min(col("doc_id")).as("owner")))
      .orderBy("doc_id")
  }

  /** Frozen first-owner artifact for [[noveltyDelta]] — the novelty
    * member of the delta family: (split, per-shingle owner census over
    * docs below the split, frozen per-doc novelty rows). Both halves are
    * append-stable BY THE MIN MONOID: a new doc's id exceeds every
    * frozen id, so it can never steal ownership — frozen per-doc rows
    * are immutable and the owner census only gains rows. REFRESH rolls
    * forward with delta-sized writes only (new-shingle owners + the
    * slice's result rows; the stored unions stay lazy behind
    * flattenWide). BACKFILL GUARD from day one (this round's mechanism):
    * a new file with doc_id < split COULD steal ownership, so the probe
    * declines the merge and ModelCache retrains. */
  private[graft] def noveltyBase(s: SparkSession, d: String)
      : (Long, DataFrame, DataFrame) =
    graft.core.ModelCache.getOrRefreshGuarded(
      s, "novelty-base", s"$d/documents.parquet") {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val maxRow = docs.agg(max(col("doc_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxId / 8L
      val sh = shinglesOf(docs.filter(col("doc_id") < sp), censusDigest(s, d))
        .localCheckpoint()
      val own = sh.groupBy("shingle").agg(min(col("doc_id")).as("owner"))
        .localCheckpoint()
      (sp, own, noveltyFrom(sh, own).localCheckpoint())
    } { case ((sp0, own0, res0), newFiles) =>
      if (graft.core.Backfill.below(s, newFiles, "doc_id", sp0)) None
      else Some {
        val docs = T.documents(s, d).select(col("doc_id"), col("text"))
        val maxRow = docs.agg(max(col("doc_id"))).head()
        val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
        val sp1 = math.max(7L * maxId / 8L, sp0) // monotone, now CHECKED
        val shS = shinglesOf(
          docs.filter(col("doc_id") >= sp0 && col("doc_id") < sp1),
          censusDigest(s, d))
          .localCheckpoint() // feeds new-owner census + slice sizes
        // only shingles UNSEEN below sp0 gain an owner; within the slice
        // the min decides — old-owned shingles drop behind the anti-join
        val newOwn = shS
          .join(own0.select("shingle"), Seq("shingle"), "left_anti")
          .groupBy("shingle").agg(min(col("doc_id")).as("owner"))
          .localCheckpoint()
        (sp1,
          graft.core.Session.flattenWide(own0.unionByName(newOwn)),
          graft.core.Session.flattenWide(
            res0.unionByName(noveltyFrom(shS, newOwn).localCheckpoint())))
      }
    }

  /** The CURRENT seen-shingle membership view: frozen owner census ⊕ the
    * live (id ≥ split) slice's shingles — the containmentServe shape,
    * what the streaming novelty gate probes (an ARRIVING doc is novel
    * against the whole corpus as of now, not just the frozen prefix).
    * O(live slice) scan per resolve; the frozen side never re-reads. */
  private[graft] def noveltyServe(s: SparkSession, d: String): DataFrame = {
    val (split, own, _) = noveltyBase(s, d)
    own.select(col("shingle")).unionByName(
      shinglesOf(T.documents(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") >= split), censusDigest(s, d))
        .select(col("shingle")))
      .distinct()
  }

  /** q_novelty_delta: the novelty census served INCREMENTALLY — frozen
    * per-doc rows verbatim (immutable under append by the min monoid),
    * live docs (id ≥ split) scored against the frozen owner census plus
    * a live-only min: a live doc's shingle is novel iff no frozen doc
    * owns it AND no smaller-id live doc does. Zero re-reads of the
    * frozen corpus; the live leg's doc_id ≥ split predicate reaches the
    * parquet scan. ORACLE: q_ngram_novelty's SQL VERBATIM — the
    * incremental path must reproduce the from-scratch census
    * bit-for-bit, the delta-family contract. */
  val noveltyDelta: Q = Q("q_novelty_delta", noveltySql) { (s, d) =>
    val (split, own, res) = noveltyBase(s, d)
    val shL = shinglesOf(T.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") >= split), censusDigest(s, d))
      .localCheckpoint() // feeds live-owner census + live sizes
    val ownL = shL.join(own.select("shingle"), Seq("shingle"), "left_anti")
      .groupBy("shingle").agg(min(col("doc_id")).as("owner"))
    res.unionByName(noveltyFrom(shL, ownL)).orderBy("doc_id")
  }

  val all: Seq[Q] =
    Seq(dedupMinhash, dedupSimhash, ngramJaccard, simhashHamming,
      dedupEditDistance, neardupPipeline, dedupClusters, dedupReport,
      minhashJaccardEst, substringDedup, substringScrub, dedupDelta,
      sourceOverlap, dedupSweep, dedupContainment, containmentEst,
      containmentDelta, ngramNovelty, noveltyDelta)
}
