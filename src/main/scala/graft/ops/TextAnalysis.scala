package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Canonical => C, Q, Tables => T}

/** Text-analysis operators for training-data curation (north star):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All heuristics are chosen to be expressible identically in Spark
  * Columns and DuckDB SQL (the oracle cross-checks the semantics, not just
  * the plumbing). Every operator is a single explode → aggregate pass:
  * one shuffle on doc_id, partial aggregation before it.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "and", "of", "to", "in", "is", "a", "for")
  private val stopSql = stopwords.map(w => s"'$w'").mkString(", ")

  /** n-gram-heuristic language ID: English stopword density. The verdict
    * threshold is integer math (n_stop·10 >= n_tok ⇔ ratio >= 0.1) so no
    * float compare crosses engines. */
  val langId: Q = Q(
    "q_lang_id",
    s"""SELECT doc_id, count(*) AS n_tok,
       |  CAST(sum(CASE WHEN tok IN ($stopSql) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
       |  CASE WHEN sum(CASE WHEN tok IN ($stopSql) THEN 1 ELSE 0 END) * 10 >= count(*)
       |       THEN 'en' ELSE 'other' END AS pred
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    // One-pass TokenStats kernel (map-side) instead of explode + groupBy:
    // the token-level shuffle is gone and the verdict is the same integer
    // compare on the kernel's counters.
    T.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TokenStats.stats(s, split(col("text"), " "), stopwords).as("st"))
      .select(col("doc_id"), col("st.n_tok").as("n_tok"), col("st.n_stop").as("n_stop"),
        when(col("st.n_stop") * 10 >= col("st.n_tok"), "en").otherwise("other").as("pred"))
      .orderBy("doc_id")
  }

  /** Quality scoring: token count, unique-token count, type-token ratio,
    * average token length. Ratios are BIGINT/BIGINT true division — the
    * one float op both engines perform identically. */
  val qualityScore: Q = Q(
    "q_quality_score",
    """SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq,
      |  count(DISTINCT tok) / count(*) AS ttr,
      |  CAST(sum(length(tok)) AS BIGINT) / count(*) AS avg_len
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    // TokenStats kernel: counts, distinct set, and length sum in one
    // map-side pass (was explode + groupBy with a distinct aggregate).
    // Same BIGINT/BIGINT true divisions as the oracle.
    T.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TokenStats.stats(s, split(col("text"), " "), Nil).as("st"))
      .select(col("doc_id"), col("st.n_tok").as("n_tok"), col("st.n_uniq").as("n_uniq"),
        (col("st.n_uniq") / col("st.n_tok")).as("ttr"),
        (col("st.len_sum") / col("st.n_tok")).as("avg_len"))
      .orderBy("doc_id")
  }

  /** Token counting three ways: whitespace split, alpha-run regex (the
    * BPE-ish pre-tokenizer shape), and a chars/4 BPE-size estimate.
    * Pure per-row map — no shuffle at all besides the presentation sort. */
  val tokenCount: Q = Q(
    "q_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_alpha,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_alpha"),
        ceil(length(col("text")) / 4.0).as("n_bpe_est"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: position-weighted rolling digest
    * sum((i · h40(token_i)) mod p) — order-sensitive (unlike the multiset
    * digest in q_dedup_text), so re-ordered documents fingerprint
    * differently. Each term is mod-reduced (< 2^30) before the sum, so
    * the per-doc aggregate stays inside signed-64 (no ANSI overflow) for
    * documents up to ~1M tokens. */
  val fingerprint: Q = Q(
    "q_fingerprint",
    """SELECT doc_id,
      |  CAST(list_sum(list_transform(range(1, len(toks) + 1),
      |    i -> (i * ('0x' || substr(md5(toks[i]), 1, 10))::BIGINT) % 1000000007))
      |    AS BIGINT) AS fingerprint
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    // Codegen'd FingerprintSig kernel: the rolling digest folds in one
    // pass per document, map-side — the round-1 posexplode + groupBy-sum
    // stage (a token-level shuffle) is gone.
    T.documents(s, d)
      .select(col("doc_id"),
        graft.functions.FingerprintSig.sig(s, split(col("text"), " "))
          .as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Bigram (2-token shingle) top-20 — the n-gram upgrade of q_token_topk
    * and the shingling primitive MinHash would use for order-sensitive
    * near-dup at scale. Shingles are built per-row from adjacent array
    * slices (zip_with over the token array); no positional join. */
  val bigramTopK: Q = Q(
    "q_bigram_topk",
    """SELECT bigram, count(*) AS n FROM (
      |  SELECT unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || '_' || toks[i + 1])) AS bigram
      |  FROM (SELECT string_split(text, ' ') AS toks FROM documents))
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin
  ) { (s, d) =>
    val toks = split(col("text"), " ")
    val len1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), len1),
      slice(toks, lit(2), len1),
      (x, y) => concat(x, lit("_"), y))
    T.documents(s, d)
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(20)
  }

  /** PII-style scrubbing: redact digit runs and count redactions — the
    * shape of an anonymization pass over a training corpus (the pattern
    * set extends to emails/phones; digits are what the test data
    * contains). Map-side projection, codegen'd regex. DuckDB needs the
    * 'g' flag for global replace (Spark's regexp_replace is global by
    * default). */
  val piiScrub: Q = Q(
    "q_pii_scrub",
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS INTEGER) AS n_redactions
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    T.customer(s, d).select(
      col("c_custkey"),
      regexp_replace(col("c_name"), lit("[0-9]+"), lit("<ID>")).as("scrubbed"),
      size(regexp_extract_all(col("c_name"), lit("[0-9]+"), lit(0))).as("n_redactions"))
      .orderBy("c_custkey")
  }

  /** Corpus vocabulary statistics: vocabulary size, total token count,
    * hapax legomena (frequency-1 tokens), type-token ratio. Two stacked
    * aggregations — token counts (vocabulary-sized, partial-aggregated)
    * then a single global row. The ratio is an exact-int division rounded
    * at 6 dp. */
  val vocabStats: Q = Q(
    "q_vocab_stats",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tc AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1)
      |SELECT COUNT(*) AS vocab,
      |  CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  COUNT(*) FILTER (WHERE n = 1) AS hapax,
      |  round(COUNT(*) / CAST(SUM(n) AS DOUBLE), 6) AS type_token_ratio
      |FROM tc""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("vocab"),
        sum(col("n")).as("total_tokens"),
        count(when(col("n") === 1, 1)).as("hapax"),
        round(count(lit(1)) / sum(col("n")).cast(DoubleType), 6).as("type_token_ratio"))
  }

  /** Document-length histogram (token-count buckets of 10) with the char
    * range per bucket — the length-distribution pass a curation pipeline
    * runs before setting min/max length filters. */
  val lengthBuckets: Q = Q(
    "q_length_buckets",
    """SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bucket,
      |  COUNT(*) AS n_docs,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars, CAST(MAX(n_chars) AS BIGINT) AS max_chars
      |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .groupBy(floor(size(split(col("text"), " ")) / 10).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy("bucket")
  }

  /** Character trigram top-25 (the language-ID feature extractor's core):
    * sliding substr over lowercased text, space-crossing grams dropped.
    * The gram groupBy is bounded by the alphabet (≤ |Σ|³ groups) with
    * map-side partial counts; top-k is TakeOrderedAndProject. */
  val charNgrams: Q = Q(
    "q_char_ngrams",
    """WITH grams AS (
      |  SELECT unnest([substr(lower(text), i, 3) for i in generate_series(1, len(text) - 2)]) AS g
      |  FROM documents WHERE len(text) >= 3)
      |SELECT g, COUNT(*) AS n FROM grams
      |WHERE NOT contains(g, ' ')
      |GROUP BY g ORDER BY n DESC, g LIMIT 25""".stripMargin
  ) { (s, d) =>
    // graft.functions.StringNgrams: codegen'd sliding-window kernel — the
    // transform(sequence(...)) HOF form is interpreted per gram and was
    // 4.5× slower at sf0.1. Identical grams (1-based char substr).
    T.documents(s, d)
      .filter(length(col("text")) >= 3)
      .select(explode(
        graft.functions.StringNgrams.ngrams(s, lower(col("text")), 3)).as("g"))
      .filter(!col("g").contains(" "))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("g"))
      .limit(25)
  }

  /** Confusion matrix of the stopword-density language classifier
    * (q_lang_id) against the corpus's labeled `lang` column — the
    * evaluation query any heuristic classifier ships with. Same kernel
    * verdict as q_lang_id, one (label, pred) aggregate. */
  val langConfusion: Q = Q(
    "q_lang_confusion",
    s"""WITH scored AS (
       |  SELECT lang,
       |    CASE WHEN sum(CASE WHEN tok IN ($stopSql) THEN 1 ELSE 0 END) * 10 >= count(*)
       |         THEN 'en' ELSE 'other' END AS pred
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id, lang)
       |SELECT lang, pred, count(*) AS n
       |FROM scored GROUP BY lang, pred ORDER BY lang, pred""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(col("lang"),
        graft.functions.TokenStats.stats(s, split(col("text"), " "), stopwords).as("st"))
      .select(col("lang"),
        when(col("st.n_stop") * 10 >= col("st.n_tok"), "en").otherwise("other").as("pred"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")
  }

  /** Corpus composition report: per source, document/token counts and
    * token share — the mixing-weights table a pretraining data recipe is
    * written against. Share is an exact-int division rounded at 6 dp. */
  val corpusMix: Q = Q(
    "q_corpus_mix",
    """WITH d AS (
      |  SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(n_tok) AS BIGINT)
      |    / (SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |       FROM documents)::DOUBLE, 6) AS token_share
      |FROM d GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    val total = docs.agg(sum(col("n_tok")).as("total"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("total").cast(DoubleType), 6).as("token_share"))
      .orderBy("source")
  }

  /** Gopher-style intra-document repetition filters: fraction of
    * duplicate word-bigrams/trigrams and the share of the top n-gram —
    * the "repeated phrase" quality rules a pretraining pipeline applies
    * before any corpus-level work (boilerplate, keyword stuffing, decode
    * loops all light these up). Strictly per-row signals, so the
    * NgramRepeat kernel computes each doc's (total, distinct, top-count)
    * n-gram triple map-side in one sliding-window pass — no token ever
    * crosses a shuffle; the only exchange is the presentation sort.
    * Fractions are single divisions of exact integer counters (the
    * established one-float-op determinism pattern). Docs with < 3 tokens
    * have no trigram and are filtered identically in both engines. */
  val repetitionFilter: Q = Q(
    "q_repetition_filter",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |b AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+1], ' ')
      |                         for i in generate_series(1, len(toks) - 1)]) AS g
      |  FROM toks),
      |bc AS (SELECT doc_id, g, count(*) AS cnt FROM b GROUP BY 1, 2),
      |bs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n2,
      |         count(*) AS u2, CAST(max(cnt) AS BIGINT) AS top2
      |       FROM bc GROUP BY doc_id),
      |t AS (
      |  SELECT doc_id, unnest([array_to_string(toks[i:i+2], ' ')
      |                         for i in generate_series(1, len(toks) - 2)]) AS g
      |  FROM toks),
      |tc AS (SELECT doc_id, g, count(*) AS cnt FROM t GROUP BY 1, 2),
      |ts AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n3,
      |         count(*) AS u3, CAST(max(cnt) AS BIGINT) AS top3
      |       FROM tc GROUP BY doc_id)
      |SELECT doc_id, n2, u2, top2,
      |  (n2 - u2) / n2 AS dup_bigram_frac, top2 / n2 AS top_bigram_frac,
      |  n3, u3, top3,
      |  (n3 - u3) / n3 AS dup_trigram_frac, top3 / n3 AS top_trigram_frac
      |FROM bs JOIN ts USING (doc_id) ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val base = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.functions.NgramRepeat.stats(s, col("toks"), 2).as("b"),
        graft.functions.NgramRepeat.stats(s, col("toks"), 3).as("t"))
      .select(col("doc_id"),
        col("b.n_grams").as("n2"), col("b.n_uniq").as("u2"),
        col("b.top_cnt").as("top2"),
        col("t.n_grams").as("n3"), col("t.n_uniq").as("u3"),
        col("t.top_cnt").as("top3"))
    base.select(col("doc_id"), col("n2"), col("u2"), col("top2"),
        ((col("n2") - col("u2")) / col("n2")).as("dup_bigram_frac"),
        (col("top2") / col("n2")).as("top_bigram_frac"),
        col("n3"), col("u3"), col("top3"),
        ((col("n3") - col("u3")) / col("n3")).as("dup_trigram_frac"),
        (col("top3") / col("n3")).as("top_trigram_frac"))
      .orderBy("doc_id")
  }

  /** Corpus-frequency rarity scoring — the deterministic core of
    * perplexity-style filtering (CCNet-class): score each document by how
    * common its tokens are in the corpus itself. Deliberately log-free:
    * a unigram-LM cross-entropy needs ln(), whose partial-sum fold order
    * differs across engines; every signal here is an exact-integer
    * counter, and the two ratios are single divisions of those exact
    * operands (identical in both engines regardless of plan shape).
    * `n_rare`/`rare_frac` count tokens with corpus probability ≤ 0.1%
    * (cnt·1000 ≤ N — integer compare, no float threshold).
    *
    * Scale shape (the q_tfidf class): the token stream collapses to
    * per-doc term frequencies first — one doc_id+token shuffle with
    * partial aggregation — so the vocabulary join carries DISTINCT
    * (doc, token) pairs, not the raw stream; the Zipf-head skew on the
    * token key is exactly what AQE skew-join splits. Products tf·cnt stay
    * exact longs (doc tf ≤ 10³, corpus N ≤ 2⁶³/10³). */
  val rarityScore: Q = Q(
    "q_rarity_score",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |cf AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cf)
      |SELECT tf.doc_id,
      |  CAST(sum(tf.tf) AS BIGINT) AS n_tok,
      |  CAST(sum(tf.tf * cf.cnt) AS BIGINT) AS freq_mass,
      |  CAST(min(cf.cnt) AS BIGINT) AS min_cnt,
      |  CAST(sum(CASE WHEN cf.cnt * 1000 <= tot.n THEN tf.tf ELSE 0 END) AS BIGINT) AS n_rare,
      |  CAST(sum(tf.tf * cf.cnt) AS BIGINT) / CAST(sum(tf.tf) AS BIGINT) AS avg_tok_freq,
      |  CAST(sum(CASE WHEN cf.cnt * 1000 <= tot.n THEN tf.tf ELSE 0 END) AS BIGINT)
      |    / CAST(sum(tf.tf) AS BIGINT) AS rare_frac
      |FROM tf JOIN cf USING (token) CROSS JOIN tot
      |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val tok = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // cf feeds the scoring join AND the 1-row total census, so the
    // explode + (doc, token) aggregate appears three times in the plan.
    // Checkpointing the O(vocab) cf census was A/B'd in one host window
    // (round 18) and LOST at sf0.1 — 1.10 s lazy vs 1.43 s checkpointed:
    // the duplicate subtrees overlap inside one job across all cores and
    // the checkpoint's barrier costs more than the re-explode it saves
    // (the q_mad lazy-re-scan lesson). `.localCheckpoint()` on cf is the
    // documented switch for a bandwidth-bound cluster where three corpus
    // passes ARE the cost; tf must stay lazy either way (an O(corpus)
    // materialization is the measured anti-pattern).
    val cf = tf.groupBy("token").agg(sum(col("tf")).as("cnt"))
    val tot = cf.agg(sum(col("cnt")).as("n"))
    tf.join(cf, "token").crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("cnt")).as("freq_mass"),
        min(col("cnt")).as("min_cnt"),
        sum(when(col("cnt") * 1000 <= col("n"), col("tf")).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tok"), col("freq_mass"), col("min_cnt"),
        col("n_rare"),
        (col("freq_mass") / col("n_tok")).as("avg_tok_freq"),
        (col("n_rare") / col("n_tok")).as("rare_frac"))
      .orderBy("doc_id")
  }

  /** Document-level token co-occurrence with lift scoring — phrase/topic
    * association mining (q_bigram_topk counts ADJACENT pairs; this scores
    * arbitrary within-document pairs against their independence
    * baseline). Log-free PMI: lift = P(a,b)/(P(a)·P(b)) =
    * n_ab·N/(df_a·df_b), reported in integer ppm computed as
    * ((n_ab·1e6) div df_a)·N div df_b — divide-first keeps every
    * intermediate under 2^63 at any corpus size (the naive n_ab·N·1e6
    * overflows past ~3M docs; n_ab ≤ df_a bounds the first quotient at
    * 1e6) and both engines run the identical integer sequence, so they
    * agree bit-for-bit. Precision: the early floor's remainder is
    * amplified by the later ·N, so the result can undershoot the exact
    * floor(n_ab·1e6·N/(df_a·df_b)) by up to ceil(N/df_b) ≤ 10 ppm —
    * bounded because df_b sits on the ≥10%-of-corpus spine
    * (LiftPpmPropertySpec pins both the bound and the no-overflow claim).
    *
    * Scale shape: the pair join is the quadratic step, so it runs over
    * the FREQUENT-token spine only (document frequency ≥ 10% of the
    * corpus — an integer compare derived from a corpus census, the same
    * data-derived-bound pattern as the ANN cell cap): per doc the join
    * width is |frequent tokens in doc|², not |tokens|², and the spine
    * table is a broadcast. Distinct-per-doc first (one shuffle with
    * partial agg) so repeated tokens don't multiply pairs. */
  val cooccurLift: Q = Q(
    "q_cooccur_lift",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> ''),
      |nd AS (SELECT count(*) AS n FROM documents),
      |df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
      |ft AS (SELECT token, df FROM df CROSS JOIN nd WHERE df * 10 >= n),
      |ftok AS (SELECT t.doc_id, t.token FROM tok t JOIN ft ON ft.token = t.token),
      |pair AS (
      |  SELECT a.token AS t1, b.token AS t2, count(*) AS n_ab
      |  FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND a.token < b.token
      |  GROUP BY a.token, b.token)
      |SELECT p.t1, p.t2, CAST(p.n_ab AS BIGINT) AS n_ab,
      |  CAST((((p.n_ab * 1000000) // fa.df) * nd.n) // fb.df AS BIGINT) AS lift_ppm
      |FROM pair p JOIN ft fa ON fa.token = p.t1 JOIN ft fb ON fb.token = p.t2
      |CROSS JOIN nd
      |ORDER BY lift_ppm DESC, t1, t2 LIMIT 20""".stripMargin
  ) { (s, d) =>
    // tok feeds df AND both sides of the pair self-join — materialize the
    // explode+distinct once instead of re-running the token stream 3×
    val tok = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .localCheckpoint()
    val nd = T.documents(s, d).agg(count(lit(1)).as("n"))
    val df = tok.groupBy("token").agg(count(lit(1)).as("df"))
    // ft backs THREE broadcast builds (the spine filter for ftok, fa, fb);
    // each build re-ran the df aggregation over the cached token stream.
    // ft is O(frequent tokens) — bounded by the ≥10%-of-corpus spine — so
    // one eager checkpoint turns three census passes into cache reads
    // (guide §2.4).
    val ft = df.crossJoin(broadcast(nd)).filter(col("df") * 10 >= col("n"))
      .select("token", "df")
      .localCheckpoint()
    val ftok = tok.join(broadcast(ft.select("token")), "token")
    val pair = ftok.as("a")
      .join(ftok.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("t1"), col("b.token").as("t2"))
      .agg(count(lit(1)).as("n_ab"))
    pair
      .join(broadcast(ft.select(col("token").as("t1"), col("df").as("dfa"))), "t1")
      .join(broadcast(ft.select(col("token").as("t2"), col("df").as("dfb"))), "t2")
      .crossJoin(broadcast(nd))
      // divide BEFORE the final multiply: n_ab·n·1e6 in one BIGINT term
      // overflows 2^63 past ~3M documents. n_ab ≤ dfa bounds the first
      // quotient at 1e6, so the largest intermediate is n·1e6 — safe to
      // ~9e12 documents. The early floor's remainder is amplified by the
      // ·n that follows: undershoots the exact value by up to
      // ceil(n/dfb) ≤ 10 ppm (dfb is on the ≥10% spine). Both engines
      // compute the identical integer sequence, so parity is exact.
      .select(col("t1"), col("t2"), col("n_ab"),
        expr("((n_ab * 1000000L) div dfa) * n div dfb").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("t1"), col("t2"))
      .limit(20)
  }

  /** Bigram-LM quality scoring — the perplexity-proxy filter every
    * pretraining pipeline runs, in the engine's log-free exact-integer
    * dialect: the corpus itself is the language model (bigram counts
    * with add-one smoothing over a vocabulary-size denominator), and a
    * document's score is the mean smoothed conditional probability of
    * its bigrams in ppm —
    *   p(t₂|t₁) = (count(t₁_t₂) + 1)·1e6 div (count(t₁) + V).
    * True perplexity exponentiates a mean log; ln() fold order diverges
    * across engines, so the mean raw probability is the cross-engine-
    * exact stand-in (same monotone use: rank docs, threshold the tail —
    * the q_importance_weight / q_rarity_score convention).
    *
    * Scale shape: bigrams are built map-side from adjacent array slices
    * (zip_with, no positional join); the model is two partial-aggregated
    * censuses (bigram counts, unigram counts) joined back on their keys
    * plus a 1-row vocabulary census broadcast; scoring is one
    * partial-aggregating groupBy(doc). Round-19 (verdict ask #3): the
    * census-digest switch (Dedup.censusDigest — on/off/auto by corpus
    * size) keys both censuses and the scoring joins on xxhash64 8-byte
    * fingerprints of the bigram/token strings instead of the strings,
    * so every exchange is fixed-width; the strings never reach any
    * declared output (doc_id, counts, ppm only) and the vocabulary size
    * V = count over the token census is collision-exact at any
    * realistic vocab (64-bit). OFF at the driver's sf dirs (auto),
    * hash-verified ON at the 10× dir. */
  val bigramLm: Q = Q(
    "q_bigram_lm",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS t1,
      |    unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || '_' || toks[i + 1])) AS bigram
      |  FROM toks),
      |un AS (SELECT unnest(toks) AS token FROM toks),
      |bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS bc FROM bg GROUP BY 1),
      |uc AS (SELECT token, CAST(count(*) AS BIGINT) AS uc FROM un GROUP BY 1),
      |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uc)
      |SELECT bg.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(((bc.bc + 1) * 1000000) // (uc.uc + vs.v)) // count(*)
      |    AS BIGINT) AS lm_ppm
      |FROM bg JOIN bc USING (bigram) JOIN uc ON uc.token = bg.t1
      |CROSS JOIN vs
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin
  ) { (s, d) =>
    val toksC = split(col("text"), " ")
    val len1 = greatest(size(toksC) - 1, lit(0))
    val docs = T.documents(s, d)
    val dig = graft.ops.Dedup.censusDigest(s, d)
    def key(c: org.apache.spark.sql.Column) = if (dig) xxhash64(c) else c
    val bg = docs.select(col("doc_id"),
        explode(arrays_zip(
          slice(toksC, lit(1), len1),
          zip_with(slice(toksC, lit(1), len1), slice(toksC, lit(2), len1),
            (x, y) => concat(x, lit("_"), y)))).as("z"))
      .select(col("doc_id"), key(col("z.0")).as("t1"), key(col("z.1")).as("bigram"))
    val un = docs.select(explode(toksC).as("tok0"))
      .select(key(col("tok0")).as("token"))
    val bc = bg.groupBy("bigram").agg(count(lit(1)).as("bc"))
    // uc feeds the scoring join AND the vocabulary-size census, so the
    // unigram explode appears twice in the plan. Checkpointing the
    // O(vocab) census was A/B'd in one host window (round 18) and LOST at
    // sf0.1 — 1.52 s lazy vs 1.83 s checkpointed: the duplicate subtrees
    // run CONCURRENTLY inside one job across all cores, while the eager
    // checkpoint serializes a barrier in front of them (the q_mad
    // lazy-re-scan lesson on the explode axis). On a bandwidth-bound
    // cluster where two corpus passes are the cost, `.localCheckpoint()`
    // on uc (and bc) is the one-line switch — lmModel's streaming gate
    // already serves exactly those checkpointed censuses.
    val uc = un.groupBy("token").agg(count(lit(1)).as("uc"))
    val vs = uc.agg(count(lit(1)).as("v"))
    bg.join(bc, "bigram")
      .join(uc, col("token") === col("t1"))
      .crossJoin(broadcast(vs))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(((bc + 1) * 1000000) div (uc + v)) div count(*)").as("lm_ppm"))
      .orderBy("doc_id")
  }

  /** The frozen artifacts of q_bigram_lm, for the streaming gate
    * (Stateful.lmGate): the corpus bigram census, the unigram census,
    * and the vocabulary size — the same train-rarely/score-continuously
    * split as the bm25-base and ivf-base families. The censuses stay
    * DISTRIBUTED (localCheckpointed DataFrames in ModelCache, the
    * "bm25-base" pattern) and the stream broadcast-joins against them —
    * bigram vocabularies at 100 TB are billions of entries, so driver
    * collects are out (round-10 verdict #3: the gate must carry no
    * corpus-cardinality collect; the only driver action here is the
    * 1-number vocabulary count). */
  final case class LmModel(
      bc: org.apache.spark.sql.DataFrame,  // (bigram, bc)
      uc: org.apache.spark.sql.DataFrame,  // (token, uc)
      vocab: Long)

  def lmModel(s: org.apache.spark.sql.SparkSession, d: String): LmModel = {
    val toksC = split(col("text"), " ")
    val len1 = greatest(size(toksC) - 1, lit(0))
    def bcOf(docs: org.apache.spark.sql.DataFrame) = docs
      .select(explode(zip_with(
        slice(toksC, lit(1), len1), slice(toksC, lit(2), len1),
        (x, y) => concat(x, lit("_"), y))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("bc"))
    def ucOf(docs: org.apache.spark.sql.DataFrame) = docs
      .select(explode(toksC).as("token"))
      .groupBy("token").agg(count(lit(1)).as("uc"))
    def maxIdOf: Long = {
      val r = T.documents(s, d).agg(max(col("doc_id"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
    val (_, bc, uc, vocab) = graft.core.ModelCache.getOrRefreshGuarded(
      s, "lm-base", s"$d/documents.parquet") {
      val uc = ucOf(T.documents(s, d)).localCheckpoint()
      (maxIdOf, bcOf(T.documents(s, d)).localCheckpoint(), uc,
        java.lang.Long.valueOf(uc.count()))
    } { case ((max0, bc0, uc0, _), newFiles) =>
      // Backfill guard (round-15 verdict #1): a new file with
      // doc_id <= the frozen high-water never enters the `> max0` delta
      // scan — decline the merge, ModelCache retrains.
      if (graft.core.Backfill.below(s, newFiles, "doc_id", max0 + 1)) None
      else Some {
      // REFREEZE (round-11 verdict #1 family): both censuses are count
      // monoids over disjoint doc sets — growth tokenizes only docs
      // above the frozen high-water id and merges with one groupBy-sum;
      // the old corpus is never re-read. RefreshSpec pins refresh ==
      // retrain.
      val delta = T.documents(s, d).filter(col("doc_id") > max0)
      val uc1 = uc0.unionAll(ucOf(delta)).groupBy("token")
        .agg(sum(col("uc")).as("uc")).localCheckpoint()
      (maxIdOf,
        bc0.unionAll(bcOf(delta)).groupBy("bigram")
          .agg(sum(col("bc")).as("bc")).localCheckpoint(),
        uc1, java.lang.Long.valueOf(uc1.count()))
      }
    }
    LmModel(bc, uc, vocab)
  }

  /** Tokenizer-budget coverage census: how much of each document's
    * bigram stream a FIXED 256-entry vocabulary (the corpus's most
    * frequent bigrams, ties by code) covers — the eval a tokenizer/vocab
    * decision is judged by before a retrain. Bigram units because the
    * synthetic token space is tiny (31 words — word coverage is
    * degenerately 100%); the 916-bigram space gives a real OOV tail.
    *
    * Scale shape: bigrams are map-side slices (no positional join); the
    * frequency census is one partial-aggregating groupBy over distinct
    * bigrams; top-256 is a TakeOrdered (per-partition partial top-V,
    * V fixed by the tokenizer budget — never corpus-sized); scoring is a
    * BROADCAST join of that tiny vocab against the bigram stream plus
    * one partial-aggregating groupBy(doc). Text never crosses a shuffle
    * wider than the bigram census itself. */
  private val VocabBudget = 256

  val vocabCoverage: Q = Q(
    "q_vocab_coverage",
    s"""WITH bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || '_' || toks[i + 1])) AS b
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |tf AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
       |vocab AS (SELECT b FROM (
       |    SELECT b, row_number() OVER (ORDER BY c DESC, b) AS rn FROM tf)
       |  WHERE rn <= $VocabBudget),
       |per AS (SELECT k.doc_id, count(*) AS nb,
       |    sum(CASE WHEN v.b IS NULL THEN 1 ELSE 0 END) AS noov
       |  FROM bg k LEFT JOIN vocab v USING (b) GROUP BY k.doc_id)
       |SELECT d.doc_id, CAST(coalesce(per.nb, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(per.noov, 0) AS BIGINT) AS n_oov,
       |  CAST(CASE WHEN coalesce(per.nb, 0) = 0 THEN 0
       |       ELSE (per.noov * 1000000) // per.nb END AS BIGINT) AS oov_ppm
       |FROM documents d LEFT JOIN per USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val toksC = split(col("text"), " ")
    val len1 = greatest(size(toksC) - 1, lit(0))
    val bigrams = zip_with(
      slice(toksC, lit(1), len1), slice(toksC, lit(2), len1),
      (x, y) => concat(x, lit("_"), y))
    val docs = T.documents(s, d)
    val bg = docs.select(col("doc_id"), explode(bigrams).as("b"))
    val vocab = bg.groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("b").asc).limit(VocabBudget)
      .select(col("b"), lit(1).as("in_v"))
    val per = bg.join(broadcast(vocab), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nb"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("noov"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("noov"), lit(0L)).as("n_oov"),
        when(coalesce(col("nb"), lit(0L)) === 0L, 0L)
          .otherwise(expr("(noov * 1000000) div nb")).as("oov_ppm"))
      .orderBy("doc_id")
  }

  /** BPE training re-shaped onto the classic (word, count) frequency
    * dictionary (Sennrich et al. 2016's actual algorithm): the corpus is
    * collapsed ONCE to its word histogram — distinct words ≪ token
    * stream — and every merge round (count all adjacent symbol pairs →
    * merge the most frequent pair everywhere → repeat) runs over the
    * DICTIONARY with word counts as weights. Symbols start as the
    * word's characters and merges never cross word boundaries, which is
    * exactly why the dictionary-weighted pair census equals the census
    * over the full token stream: per-round cost drops from O(corpus) to
    * O(vocabulary), the only shape that extends to a real k ≈ 30,000
    * vocabulary build at 100 TB (the round-10 verdict's one weak plan).
    *
    * The dictionary state between rounds is a DELIMITED STRING per word,
    * `| c1 | c2 | … | cn |`, and a merge is one literal
    * replace(s, "| a | b ", "| a_b ") — the pattern's leading `|` and
    * trailing space are exactly the guards that make a left-to-right
    * non-overlapping string replace (both engines' replace semantics)
    * equal greedy BPE application: a symbol that merely ends in `a` or
    * extends `b` cannot match, and consecutive occurrences (`a b a b`)
    * each keep their own leading delimiter. PRECONDITION (round-10
    * ADVICE): no corpus word may contain the delimiter `|` — both
    * engines FILTER such words out of the dictionary up front (space
    * cannot occur inside a word by construction of the split), so the
    * guard pattern is never ambiguous. Merged symbols join with `_`;
    * since symbols never contain ` | `, two distinct symbol sequences
    * can never render to the same delimited string. Pair selection is
    * exact (weighted count DESC, then (t1, t2) — total order, no float
    * anywhere), so the oracle replays the identical rounds as unrolled
    * CTEs and hash-matches the chosen merges.
    *
    * Scale shape: ONE corpus pass builds the histogram (partial-agg
    * shuffle on word — the q_token_topk cost); the dictionary is then
    * localCheckpointed and the entire round loop — pair census, 1-row
    * argmax broadcast, map-side replace — touches only O(vocabulary)
    * rows per round (PlanShapeSpec asserts the round loop's plan holds
    * ZERO file scans). Output: one row per round — the merged pair, its
    * weighted pre-merge count, and the corpus symbol count entering the
    * round Σ len(symbols)·cnt (which shrinks by the applied merge count
    * each round — the compression evidence). */
  private val BpeRounds = 8

  /** DuckDB CTE chain shared by q_bpe_merges and q_bpe_apply: dict
    * histogram + delimited-string init + `rounds` unrolled merge rounds.
    * Exposes s<i>/t<i> (dict state), b<i> (chosen pair), c<i> (symbol
    * census) per round i. */
  private def bpeDuckCtes(rounds: Int): String = {
    def duck(i: Int): String = {
      val prevT = s"t${i - 1}"
      s"""p$i AS (SELECT pr[1] AS t1, pr[2] AS t2, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt, unnest(list_transform(range(1, len(toks)),
         |    j -> [toks[j], toks[j + 1]])) AS pr FROM $prevT) GROUP BY 1, 2),
         |b$i AS (SELECT t1, t2, '| ' || t1 || ' | ' || t2 || ' ' AS pat, n
         |        FROM p$i ORDER BY n DESC, t1, t2 LIMIT 1),
         |c$i AS (SELECT CAST(coalesce(sum(len(toks) * cnt), 0) AS BIGINT) AS nt
         |        FROM $prevT),
         |s$i AS (SELECT word, cnt, replace(s, b.pat, replace(b.pat, ' | ', '_')) AS s
         |        FROM s${i - 1} CROSS JOIN b$i b),
         |t$i AS (SELECT word, cnt,
         |          string_split(substr(s, 3, length(s) - 4), ' | ') AS toks
         |        FROM s$i)""".stripMargin
    }
    s"""dict AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE tok NOT LIKE '%|%' GROUP BY 1),
       |s0 AS (SELECT word, cnt,
       |         rtrim('| ' || regexp_replace(word, '(.)', '\\1 | ', 'g')) AS s
       |       FROM dict),
       |t0 AS (SELECT word, cnt,
       |         string_split(substr(s, 3, length(s) - 4), ' | ') AS toks
       |       FROM s0),
       |${(1 to rounds).map(duck).mkString(",\n")}""".stripMargin
  }

  /** The word histogram — the ONE corpus-wide pass of BPE training, and
    * the monoidal quantity q_bpe_delta's incremental path merges. */
  private def wordHist(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(!col("word").contains("|")) // delimiter precondition (doc above)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Spark-side shared train: returns (one row per round, final dict
    * carrying the fully-merged delimited string per word). The dict is
    * materialized once; the round loop runs entirely over it. */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String,
      rounds: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    bpeRoundsOverHist(wordHist(T.documents(s, d)), rounds)

  /** The round loop over a (word, cnt) histogram — however the histogram
    * was produced (full corpus pass, or q_bpe_delta's base+delta merge).
    *
    * Each round is ONE Spark action: the pair census and the round's
    * token count ride the same shuffle (the token count is a sentinel
    * row in the census union — nt = Σ cnt·#toks = Σ_pairs cnt + Σ cnt,
    * both sums partial-aggregate map-side), the winning pair and nt come
    * back in a single 1-row driver collect, and the dictionary rewrite
    * uses the collected pair as a LITERAL — no broadcast join, no
    * per-round checkpoint. The first cut paid TWO eager localCheckpoints
    * per round (top1 + rewritten dict), each fanning into several AQE
    * scheduler jobs: 56 jobs per q_bpe_delta serve measured at the
    * round-15 open (the unexplained 1.8→2.3 s creep in the round-14
    * verdict was this fixed overhead under host drift). Now: rounds + 2
    * actions. The un-checkpointed rewrite chain is ≤ `rounds` map-side
    * `replace` calls over the O(vocabulary) dict checkpoint —
    * recomputing round i's prefix is cheaper than one scheduler job —
    * and the FINAL dict is checkpointed once for its downstream readers
    * (bpeModel's dict/enc tables). */
  private def bpeRoundsOverHist(hist: org.apache.spark.sql.DataFrame,
      rounds: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val s = hist.sparkSession
    import s.implicits._
    val toksCol = split(expr("substring(s, 3, length(s) - 4)"), " \\| ")
    val dict = hist
      .withColumn("s",
        rtrim(concat(lit("| "), regexp_replace(col("word"), "(.)", "$1 | "))))
      .localCheckpoint() // histogram materialized; rounds never rescan
    var cur = dict
    var out = List.empty[(Long, String, String, Long, Long)]
    for (i <- 1 to rounds) {
      val withToks = cur.withColumn("toks", toksCol)
      val n1 = greatest(size(col("toks")) - 1, lit(0))
      val pairRows = withToks.select(col("cnt"), explode(zip_with(
          slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
          (a, b) => struct(a.as("t1"), b.as("t2")))).as("pr"))
        .select(lit(false).as("is_nt"), col("pr.t1").as("t1"),
          col("pr.t2").as("t2"), col("cnt").as("n"))
      val ntRow = withToks.select(lit(true).as("is_nt"),
        lit(null).cast("string").as("t1"), lit(null).cast("string").as("t2"),
        (size(col("toks")).cast(LongType) * col("cnt")).as("n"))
      // min over struct(-n, t1, t2) ≡ ORDER BY n DESC, t1, t2 LIMIT 1
      val r = pairRows.unionAll(ntRow)
        .groupBy("is_nt", "t1", "t2").agg(sum(col("n")).as("n"))
        .agg(
          min(when(!col("is_nt"),
            struct((-col("n")).as("negn"), col("t1"), col("t2")))).as("top"),
          sum(when(col("is_nt"), col("n"))).as("nt"))
        .collect()(0)
      if (r.isNullAt(0)) {
        // no adjacent pairs anywhere: the old top1-crossJoin form emitted
        // no further round rows and emptied the dict — preserve exactly
        cur = cur.filter(lit(false))
      } else {
        val top = r.getStruct(0)
        val (n, t1, t2) = (-top.getLong(0), top.getString(1), top.getString(2))
        out :+= ((i.toLong, t1, t2, n, r.getLong(1)))
        val pat = s"| $t1 | $t2 "
        cur = cur.select(col("word"), col("cnt"),
          replace(col("s"), lit(pat), lit(pat.replace(" | ", "_"))).as("s"))
      }
    }
    (out.toDF("round", "t1", "t2", "n_pairs", "n_tokens").orderBy("round"),
      cur.localCheckpoint())
  }

  /** ModelCache-frozen BPE artifacts (the ivf-base/bm25-base/lm-base
    * economics): one train per (session, corpus state) serves
    * q_bpe_merges, q_bpe_apply, q_bpe_vocab AND the streaming encode
    * gate (Stateful.bpeGate). Holds (round rows, final dict state, the
    * encode table word → subtoken count). */
  final case class BpeModel(
      rounds: org.apache.spark.sql.DataFrame,
      dict: org.apache.spark.sql.DataFrame,   // (word, cnt, s)
      enc: org.apache.spark.sql.DataFrame)    // (word, n_sub)

  def bpeModel(s: org.apache.spark.sql.SparkSession, d: String): BpeModel =
    graft.core.ModelCache.getOrTrain(s, "bpe-base", s"$d/documents.parquet") {
      val (rounds, dict) = bpeTrain(s, d, BpeRounds)
      val toksCol = split(expr("substring(s, 3, length(s) - 4)"), " \\| ")
      BpeModel(rounds.localCheckpoint(), dict,
        dict.select(col("word"), size(toksCol).cast(LongType).as("n_sub"))
          .localCheckpoint())
    }

  val bpeMerges: Q = Q(
    "q_bpe_merges",
    s"""WITH ${bpeDuckCtes(BpeRounds)}
       |SELECT * FROM (
       |${(1 to BpeRounds).map(i =>
      s"""  SELECT CAST($i AS BIGINT) AS round, b.t1, b.t2,
         |    b.n AS n_pairs, c.nt AS n_tokens
         |  FROM b$i b CROSS JOIN c$i c""".stripMargin)
      .mkString("\n  UNION ALL\n")}
       |) ORDER BY round""".stripMargin
  ) { (s, d) => bpeModel(s, d).rounds.orderBy("round") }

  /** The missing half of the tokenizer family (round-10 verdict #2):
    * ENCODE the corpus with the vocabulary q_bpe_merges trained. Each
    * word's fully-merged symbol count comes straight off the final
    * dictionary state (len of its delimited string's symbol list), so
    * the per-doc encode is one explode + one broadcast join against the
    * O(vocabulary) encode table + one partial-aggregating groupBy(doc) —
    * the corpus-wide pass an encoder genuinely pays, paid once. Emits
    * per doc: word count, BPE token count, character count (the
    * pre-merge symbol count), and compression in ppm (BPE tokens per
    * character — ≤ 1e6, shrinking as merges bite). Words filtered by the
    * dictionary's delimiter precondition drop out of BOTH engines via
    * the inner join. */
  val bpeApply: Q = Q(
    "q_bpe_apply",
    s"""WITH ${bpeDuckCtes(BpeRounds)},
       |enc AS (SELECT word, CAST(len(toks) AS BIGINT) AS n_sub FROM t$BpeRounds),
       |tokd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |         FROM documents),
       |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(e.n_sub) AS BIGINT) AS n_subtok,
       |    CAST(sum(length(t.word)) AS BIGINT) AS n_chars
       |  FROM tokd t JOIN enc e USING (word) GROUP BY 1)
       |SELECT doc_id, n_words, n_subtok, n_chars,
       |  CAST((n_subtok * 1000000) // n_chars AS BIGINT) AS comp_ppm
       |FROM per ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(bpeModel(s, d).enc), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subtok"),
        sum(length(col("word")).cast(LongType)).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_subtok"), col("n_chars"),
        expr("(n_subtok * 1000000) div n_chars").as("comp_ppm"))
      .orderBy("doc_id")
  }

  /** The shipped artifact of a tokenizer build: the trained VOCABULARY
    * census after the k merge rounds — every surviving symbol (single
    * chars plus the merged subwords), its corpus occurrence count
    * weighted by word frequency, and whether it is a merge product.
    * This is the table an encode deployment loads (q_bpe_apply counts
    * against exactly these symbols), and its size is the vocabulary-
    * budget evidence a tokenizer decision reads. Scale shape: one
    * explode over the O(vocabulary) dictionary (weighted by cnt — the
    * corpus itself is never re-read) + one partial-agg census. */
  val bpeVocab: Q = Q(
    "q_bpe_vocab",
    s"""WITH ${bpeDuckCtes(BpeRounds)}
       |SELECT tok, CAST(sum(cnt) AS BIGINT) AS n_occ,
       |  CAST(CASE WHEN contains(tok, '_') THEN 1 ELSE 0 END AS BIGINT) AS is_merged
       |FROM (SELECT cnt, unnest(toks) AS tok FROM t$BpeRounds)
       |GROUP BY tok ORDER BY n_occ DESC, tok""".stripMargin
  ) { (s, d) =>
    val toksCol = split(expr("substring(s, 3, length(s) - 4)"), " \\| ")
    bpeModel(s, d).dict
      .select(col("cnt"), explode(toksCol).as("tok"))
      .groupBy("tok").agg(sum(col("cnt")).as("n_occ"))
      .select(col("tok"), col("n_occ"),
        when(col("tok").contains("_"), 1L).otherwise(0L).as("is_merged"))
      .orderBy(col("n_occ").desc, col("tok"))
  }

  /** Incremental BPE vocabulary maintenance — the tokenizer member of
    * the delta family (q_ivf_assign_delta / q_pq_encode_delta /
    * q_components_delta / q_pagerank_delta / q_bm25_delta): the only
    * corpus-wide input to the re-shaped training loop is the word
    * HISTOGRAM, and histograms are MONOIDAL over disjoint doc sets —
    * counts add. So a nightly vocabulary refresh is: the frozen base
    * histogram (docs below the 7/8 doc_id split, ModelCache
    * "bpe-hist-base" — the bm25-base economics), today's docs tokenized
    * ALONE (O(delta)), one groupBy-sum merge (O(vocabulary)), and the
    * identical O(vocabulary) merge rounds. The base corpus is never
    * re-read; the round loop's zero-file-scan shape is inherited from
    * q_bpe_merges. The ORACLE is the full-corpus replay (shared SQL
    * with q_bpe_merges): the hash gate proves incremental == full
    * across two engines, and OperatorSpec pins Spark-side bit-parity. */
  /** The frozen word-histogram base: (split, hist over docs below the
    * split). REFRESH (round-11 verdict #1): the word histogram is the
    * textbook monoid — counts add over disjoint doc sets — so a corpus
    * change rolls the frozen base forward with one groupBy-sum over the
    * old base plus the tokenized [sp0, sp1) slice; the old corpus is
    * never re-tokenized. RefreshSpec pins refresh == retrain. */
  private[graft] def bpeHistBase(s: org.apache.spark.sql.SparkSession,
      d: String): (Long, org.apache.spark.sql.DataFrame) = {
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    graft.core.ModelCache.getOrRefreshGuarded(
      s, "bpe-hist-base", s"$d/documents.parquet") {
      val maxRow = docs.agg(max(col("doc_id"))).head()
      val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
      val sp = 7L * maxId / 8L
      (sp, wordHist(docs.filter(col("doc_id") < sp)).localCheckpoint())
    } { case ((sp0, hist0), newFiles) =>
      // Backfill guard (round-15 verdict #1): doc_id < sp0 in a new file
      // never enters the slice scan — decline the merge, retrain.
      if (graft.core.Backfill.below(s, newFiles, "doc_id", sp0)) None
      else Some {
        val maxRow = docs.agg(max(col("doc_id"))).head()
        val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
        val sp1 = math.max(7L * maxId / 8L, sp0) // monotone, now CHECKED
        val histS = wordHist(docs.filter(col("doc_id") >= sp0 && col("doc_id") < sp1))
        (sp1, hist0.unionAll(histS)
          .groupBy("word").agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint())
      }
    }
  }

  val bpeDelta: Q = Q(
    "q_bpe_delta",
    s"""WITH ${bpeDuckCtes(BpeRounds)}
       |SELECT * FROM (
       |${(1 to BpeRounds).map(i =>
      s"""  SELECT CAST($i AS BIGINT) AS round, b.t1, b.t2,
         |    b.n AS n_pairs, c.nt AS n_tokens
         |  FROM b$i b CROSS JOIN c$i c""".stripMargin)
      .mkString("\n  UNION ALL\n")}
       |) ORDER BY round""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val (split, histB) = bpeHistBase(s, d)
    val histD = wordHist(docs.filter(col("doc_id") >= split))
    val hist = histB.unionAll(histD)
      .groupBy("word").agg(sum(col("cnt")).as("cnt"))
    bpeRoundsOverHist(hist, BpeRounds)._1
  }

  /** Per-language tokenizer FERTILITY — the eval that drives
    * per-language vocabulary-budget decisions before a retrain: mean
    * subtokens per word (fertility) and BPE tokens per character, per
    * lang, off the same frozen encode table as q_bpe_apply. A language
    * whose fertility stays near its character count is under-served by
    * the vocabulary. One explode + broadcast join + partial-agg
    * groupBy(lang). */
  val bpeFertility: Q = Q(
    "q_bpe_fertility",
    s"""WITH ${bpeDuckCtes(BpeRounds)},
       |enc AS (SELECT word, CAST(len(toks) AS BIGINT) AS n_sub FROM t$BpeRounds),
       |tokd AS (SELECT lang, unnest(string_split(text, ' ')) AS word
       |         FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.n_sub) AS BIGINT) AS n_subtok,
       |  CAST(sum(length(t.word)) AS BIGINT) AS n_chars,
       |  CAST((sum(e.n_sub) * 1000000) // count(*) AS BIGINT) AS fertility_ppm,
       |  CAST((sum(e.n_sub) * 1000000) // sum(length(t.word)) AS BIGINT)
       |    AS comp_ppm
       |FROM tokd t JOIN enc e USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(bpeModel(s, d).enc), "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subtok"),
        sum(length(col("word")).cast(LongType)).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_subtok"), col("n_chars"),
        expr("(n_subtok * 1000000) div n_words").as("fertility_ppm"),
        expr("(n_subtok * 1000000) div n_chars").as("comp_ppm"))
      .orderBy("lang")
  }

  /** Vocabulary GROWTH across ingest history — the Heaps-law census
    * behind every tokenizer-budget and dedup-capacity decision:
    * q_vocab_stats says how big the vocabulary IS, this says how fast it
    * is still GROWING. Ids are assigned monotonically at ingest (the
    * delta family's corpus contract), so quarters of the id RANGE are
    * quarters of ingest history: for each checkpoint, the docs ingested
    * by then, the tokens first seen in that quarter, and the cumulative
    * vocabulary. A still-steep curve at the last checkpoint says the
    * corpus has not saturated its domain (keep acquiring); a flat one
    * says new data is mostly re-spending known vocabulary (dedup harder,
    * budget tokenizer now). All thresholds are exact-integer arithmetic
    * from a 1-row (min, max) census — no order statistics, no sort.
    *
    * Scale shape: one token explode + per-token min partial-agg (the
    * q_vocab_stats cost family), one documents scan with a 4-row
    * broadcast checkpoint table (conditional aggregates — the dq_audit
    * twin shape), and a 4-row window for the cumulative. Nothing touches
    * a global sort or a driver loop. */
  val vocabGrowth: Q = Q(
    "q_vocab_growth",
    """WITH c AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
      |ks AS (SELECT unnest([1, 2, 3, 4]) AS k),
      |b AS (SELECT CAST(k AS BIGINT) AS k,
      |    mn - 1 + (mx - mn + 1) * k // 4 AS bound
      |  FROM ks CROSS JOIN c),
      |nd AS (SELECT b.k, b.bound,
      |    CAST(count(*) FILTER (WHERE d.doc_id <= b.bound) AS BIGINT) AS n_docs
      |  FROM documents d CROSS JOIN b GROUP BY b.k, b.bound),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |units AS (
      |  SELECT 'token' AS unit, unnest(t) AS u, doc_id FROM toks
      |  UNION ALL
      |  SELECT 'shingle8', unnest([array_to_string(t[i:i+7], ' ')
      |      for i in generate_series(1, len(t) - 7)]), doc_id
      |  FROM toks WHERE len(t) >= 8),
      |fd AS (SELECT unit, u, min(doc_id) AS fdoc FROM units GROUP BY 1, 2),
      |nu AS (SELECT unit, k, CAST(count(*) AS BIGINT) AS new_units FROM (
      |    SELECT f.unit, f.u, min(b.k) AS k
      |    FROM fd f JOIN b ON f.fdoc <= b.bound GROUP BY f.unit, f.u)
      |  GROUP BY unit, k)
      |SELECT nd.k AS checkpoint, u.unit, nd.bound AS bound_id, nd.n_docs,
      |  coalesce(nu.new_units, 0) AS new_units,
      |  CAST(sum(coalesce(nu.new_units, 0))
      |    OVER (PARTITION BY u.unit ORDER BY nd.k) AS BIGINT) AS units_cum
      |FROM nd CROSS JOIN (SELECT DISTINCT unit FROM units) u
      |LEFT JOIN nu ON nu.k = nd.k AND nu.unit = u.unit
      |ORDER BY checkpoint, u.unit""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    val cRow = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (mn, mx) = (cRow.getLong(0), cRow.getLong(1))
    val bounds = (1 to 4).map(k => (k.toLong, mn - 1 + (mx - mn + 1) * k / 4))
    val boundArr = array(bounds.map { case (k, bd) =>
      struct(lit(k).as("k"), lit(bd).as("bound")) }: _*)
    val b = docs.sparkSession.range(1).select(explode(boundArr).as("p"))
      .select(col("p.k").as("k"), col("p.bound").as("bound"))
    val nd = docs.crossJoin(broadcast(b))
      .groupBy("k", "bound")
      .agg(sum(when(col("doc_id") <= col("bound"), 1L).otherwise(0L)).as("n_docs"))
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val units = toks
      .select(lit("token").as("unit"), explode(col("t")).as("u"), col("doc_id"))
      .unionAll(toks.filter(size(col("t")) >= 8)
        .select(lit("shingle8").as("unit"), explode(expr(
          "transform(sequence(1, size(t) - 7), i -> concat_ws(' ', slice(t, i, 8)))"))
          .as("u"), col("doc_id")))
    val fd = units.groupBy("unit", "u").agg(min(col("doc_id")).as("fdoc"))
    // Round-18 optimization #2 on this query (guide §2.3/§2.4): the oracle
    // formulates "first checkpoint containing fdoc" as a range join
    // (fd ⋈ b ON fdoc <= bound) + min(k) re-aggregation — on the Spark
    // side that fanned every distinct unit out to up to 4 rows and paid a
    // SECOND full (unit, u) shuffle of wide shingle strings just to take
    // min(k). The bounds are 4 driver-side constants (computed from the
    // same 1-row census the b table is built from) and are monotone in k,
    // so min{k : fdoc <= bound_k} is a pure CASE over fdoc: bucketize
    // map-side and partial-aggregate straight to (unit, k) — the O(units)
    // string exchange and the 4x fan-out disappear from the plan.
    // Equivalence note (round-19, advice #2): the final otherwise() arm
    // assigns a NULL fdoc to the last checkpoint, whereas the oracle's
    // inner range join would DROP such a row. Unreachable today — doc_id
    // is non-null by the TESTDATA contract and min() over non-null input
    // is non-null — but if a nullable doc_id source ever feeds this,
    // the CASE must gain a when(fdoc.isNotNull, …) guard to keep parity.
    val bucketK = bounds.init.foldRight(lit(bounds.last._1): org.apache.spark.sql.Column) {
      case ((k, bd), acc) => when(col("fdoc") <= bd, lit(k)).otherwise(acc)
    }
    // nu is O(units · checkpoints) = ≤ 8 rows, and it feeds BOTH the
    // left-join leg and the distinct-unit axis below. Exchange reuse
    // cannot be relied on for the second consumer (RemoveRedundantAggregates
    // rewrites `nu.select("unit").distinct()` into a distinct over the raw
    // explode — the optimizer prunes the inner aggregates and with them
    // the shared subtree), so the corpus-wide token/shingle census is
    // pinned with ONE eager checkpoint: the explode runs exactly once,
    // every consumer reads 8 cached rows. NOTE (round-19, advice #3):
    // the checkpoint is eager and lives in the query BUILDER, so
    // explain-only callers (PlanDump) execute the corpus census to
    // print this plan — accepted: the builder already runs a head()
    // census to derive the bounds, so plan inspection was never free
    // here.
    val nu = fd.select(col("unit"), bucketK.as("k"))
      .groupBy("unit", "k").agg(count(lit(1)).as("new_units"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("unit").orderBy("checkpoint")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // Round-18 optimization (guide §2.4): the distinct unit list reads the
    // O(units)-collapsed nu census, NOT fd — `fd.select("unit").distinct()`
    // looked free but prunes min(fdoc) out of fd's aggregate, so its
    // exchange subtree no longer matches fd's and Catalyst re-ran the
    // corpus-wide token/shingle explode for the 2-row unit list (the
    // before-plan shows the second Generate pair; no ReusedExchange).
    // nu's own exchange feeds both consumers VERBATIM, so the explode and
    // the (unit, u) census run once. Same unit set by construction:
    // aggregates preserve their key set (units → fd → nu never drops a
    // unit — every fd row lands in some checkpoint bucket).
    nd.crossJoin(nu.select("unit").distinct())
      .join(nu, Seq("unit", "k"), "left")
      .select(col("k").as("checkpoint"), col("unit"), col("bound").as("bound_id"),
        col("n_docs"), coalesce(col("new_units"), lit(0L)).as("new_units"))
      .withColumn("units_cum", sum(col("new_units")).over(w))
      .orderBy("checkpoint", "unit")
  }

  val all: Seq[Q] =
    Seq(langId, qualityScore, tokenCount, fingerprint, bigramTopK, piiScrub,
      vocabStats, lengthBuckets, charNgrams, langConfusion, corpusMix,
      repetitionFilter, rarityScore, cooccurLift, bigramLm, vocabCoverage,
      bpeMerges, bpeApply, bpeVocab, bpeDelta, bpeFertility, vocabGrowth)
}
