package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{TextDedup, TextQuality, TextStats}

/** CCNet-style corpus quality + retrieval family (operators/TextQuality):
  * n-gram LM perplexity scoring, BM25 retrieval, deterministic weighted
  * sampling, exact KS drift, and the composed lang-id → LM-score →
  * dedup-keep → perplexity-bucket pipeline. All hash-checked: floats
  * cross the engine boundary through DECIMAL with identical op
  * sequences, rankings key on rendered decimals + integer tie-breaks.
  */
object QualityQueries {

  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** DuckDB replay of srch5's unrolled MMR greedy: identical candidate
    * pool, pairwise sims, and 5 argmax steps (integer arithmetic
    * throughout, cand_id tie-breaks — bit-equal to the Spark side).
    */
  /** srch2's full oracle — also srch7's: a merged two-shard index is
    * table-identical to the full build (postings dedup + stats
    * re-derivation, QualitySpec), so both serves replay the same DuckDB
    * BM25 derivation.
    */
  private def bm25IndexedOracleSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
        st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        tf AS (SELECT d.doc_id, dl.dl, t.term, COUNT(*) AS tf
          FROM d JOIN dl USING (doc_id), UNNEST(d.w) AS t(term)
          WHERE t.term IN ('vector', 'hash', 'spark') GROUP BY 1, 2, 3),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id,
            ln(1.0 + (CAST(st.n_docs - dft.df AS DOUBLE) + 0.5)
                     / (CAST(dft.df AS DOUBLE) + 0.5))
            * ((CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                  * (CAST(tf.dl AS DOUBLE)
                     / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))) AS sc
          FROM tf JOIN dft USING (term) CROSS JOIN st)
        SELECT doc_id, COUNT(*) AS n_terms,
          CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20"""

  private def mmrOracleSql: String = {
    val steps = (2 to 5).map { i =>
      s"""r$i AS (SELECT c.* FROM cands c LEFT JOIN sel${i - 1} s
          ON s.query_id = c.query_id AND s.cand_id = c.cand_id
        WHERE s.cand_id IS NULL),
      m$i AS (SELECT r.query_id, r.cand_id, r.rel_micro,
          MAX(COALESCE(sims.sim_micro, 0)) AS maxsim_micro
        FROM r$i r JOIN sel${i - 1} s ON s.query_id = r.query_id
        LEFT JOIN sims ON sims.id_a = LEAST(r.cand_id, s.cand_id)
          AND sims.id_b = GREATEST(r.cand_id, s.cand_id)
        GROUP BY 1, 2, 3),
      s$i AS (SELECT query_id, CAST($i AS BIGINT) AS step, cand_id, rel_micro,
          maxsim_micro, 700 * rel_micro - 300 * maxsim_micro AS mmr_score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY 700 * rel_micro - 300 * maxsim_micro DESC, cand_id) AS rn
          FROM m$i) WHERE rn = 1),
      sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)"""
    }.mkString(",\n      ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      common AS (SELECT a.doc_id AS query_id, b.doc_id AS cand_id, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        WHERE a.doc_id < 5 GROUP BY 1, 2),
      rel AS (SELECT query_id, cand_id,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS rel_micro
        FROM common JOIN cnt ca ON ca.doc_id = query_id
          JOIN cnt cb ON cb.doc_id = cand_id),
      cands AS (SELECT query_id, cand_id, rel_micro FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rel_micro DESC, cand_id) AS rn FROM rel) WHERE rn <= 10),
      cd AS (SELECT DISTINCT cand_id AS doc_id FROM cands),
      csh AS (SELECT sh.doc_id, sh.s FROM sh JOIN cd ON sh.doc_id = cd.doc_id),
      ccommon AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      sims AS (SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS sim_micro
        FROM ccommon JOIN cnt ca ON ca.doc_id = id_a
          JOIN cnt cb ON cb.doc_id = id_b),
      sel1 AS (SELECT query_id, CAST(1 AS BIGINT) AS step, cand_id, rel_micro,
          CAST(0 AS BIGINT) AS maxsim_micro, 700 * rel_micro AS mmr_score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rel_micro DESC, cand_id) AS rn FROM cands) WHERE rn = 1),
      $steps
      SELECT query_id, step, cand_id, rel_micro, maxsim_micro, mmr_score
      FROM sel5 ORDER BY query_id, step"""
  }

  /** Shared oracle CTEs for the trigram LM (t15 + e2e8): occurrence-
    * grained trigram/context counts and the add-one-smoothed per-doc
    * cross-entropy, mirroring TextQuality.lmScore op-for-op.
    */
  private val lmCtes =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      v AS (SELECT COUNT(DISTINCT tok) AS v
        FROM (SELECT unnest(w) AS tok FROM toks)),
      tri AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri,
          w[i] || ' ' || w[i+1] AS ctx
        FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
      c3 AS (SELECT tri, COUNT(*) AS c3 FROM tri GROUP BY 1),
      c2 AS (SELECT ctx, COUNT(*) AS c2 FROM tri GROUP BY 1),
      lm AS (SELECT tri.doc_id, COUNT(*) AS n_tris,
          CAST(SUM(CAST(
              ln(CAST(c2.c2 + v.v AS DOUBLE) / CAST(c3.c3 + 1 AS DOUBLE))
            AS DECIMAL(18,6))) * 1000000 AS BIGINT) // COUNT(*) AS avg_nlp_micro
        FROM tri JOIN c3 USING (tri) JOIN c2 USING (ctx) CROSS JOIN v
        GROUP BY tri.doc_id)"""

  val all: Map[String, Q] = Map(

    // Gopher hard-rule quality gate (the rejector a pretraining pipeline
    // runs before any scoring): per-doc integer metrics + one flag per
    // published rule + the conjunction. Line-structure rules are omitted
    // engine-side (single-line synthetic corpus — they'd be constant).
    "t22_gopher_rules" -> Q(
      (s, d) => TextQuality.gopherRules(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some(s"""WITH m AS (SELECT doc_id, text, string_split($normSql, ' ') AS toks
          FROM documents),
        r AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          CAST(FLOOR(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            * 1000 / len(toks)) AS BIGINT) AS mean_word_len_milli,
          CAST(FLOOR(CAST(len(regexp_extract_all(text, '[#…]')) AS DOUBLE)
            * 1000 / len(toks)) AS BIGINT) AS symbol_permille,
          CAST(FLOOR(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
            * 1000 / len(toks)) AS BIGINT) AS alpha_permille,
          CAST(len(list_filter(toks, x -> list_contains(
            ['the','a','and','of','to','in','is','on'], x))) AS BIGINT) AS n_stopwords
          FROM m)
        SELECT doc_id, n_words, mean_word_len_milli, symbol_permille,
          alpha_permille, n_stopwords,
          CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT) AS r_words,
          CAST(mean_word_len_milli >= 3000 AND mean_word_len_milli <= 10000 AS BIGINT) AS r_len,
          CAST(symbol_permille < 100 AS BIGINT) AS r_symbol,
          CAST(alpha_permille >= 800 AS BIGINT) AS r_alpha,
          CAST(n_stopwords >= 2 AS BIGINT) AS r_stop,
          CAST(n_words >= 50 AND n_words <= 100000
            AND mean_word_len_milli >= 3000 AND mean_word_len_milli <= 10000
            AND symbol_permille < 100 AND alpha_permille >= 800
            AND n_stopwords >= 2 AS BIGINT) AS passes
        FROM r ORDER BY doc_id"""),
      "Gopher rule-based quality gate: integer metrics, per-rule flags, conjunction"),

    // Per-doc LM cross-entropy — the perplexity quality gate (CCNet
    // doctrine): low avg_nlp = templated/duplicated text, high = noise.
    "t15_lm_score" -> Q(
      (s, d) => TextQuality.lmScore(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some(s"""WITH $lmCtes
        SELECT doc_id, n_tris, CAST(avg_nlp_micro AS BIGINT) AS avg_nlp_micro
        FROM lm ORDER BY doc_id"""),
      "trigram-LM cross-entropy per doc (add-one smoothing, micro-nats)"),

    // Incremental LM scoring — the deployment path: the LM is trained
    // on the EXISTING corpus and frozen; only the incoming batch is
    // scored (d12's even/odd split convention). Unseen trigrams hit
    // the add-one floor via left-join coalesce.
    "t16_lm_frozen" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextQuality.lmScoreFrozen(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        et AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
        v AS (SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest(w) AS tok FROM et)),
        etri AS (SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri,
            w[i] || ' ' || w[i+1] AS ctx
          FROM et, UNNEST(range(1, len(w) - 1)) AS t(i)),
        c3 AS (SELECT tri, COUNT(*) AS c3 FROM etri GROUP BY 1),
        c2 AS (SELECT ctx, COUNT(*) AS c2 FROM etri GROUP BY 1),
        btri AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri,
            w[i] || ' ' || w[i+1] AS ctx
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
          WHERE doc_id % 2 = 1),
        sc AS (SELECT btri.doc_id,
            ln(CAST(COALESCE(c2.c2, 0) + v.v AS DOUBLE)
               / CAST(COALESCE(c3.c3, 0) + 1 AS DOUBLE)) AS nlp
          FROM btri LEFT JOIN c3 USING (tri) LEFT JOIN c2 USING (ctx)
          CROSS JOIN v)
        SELECT doc_id, COUNT(*) AS n_tris,
          CAST(SUM(CAST(nlp AS DECIMAL(18,6))) * 1000000 AS BIGINT)
            // COUNT(*) AS avg_nlp_micro
        FROM sc GROUP BY doc_id ORDER BY doc_id"""),
      "frozen-LM batch scoring: train on existing corpus, score new only"),

    // BM25 retrieval for a fixed query — eval-set decontamination and
    // targeted corpus inspection both reduce to this ranking.
    "srch1_bm25" -> Q(
      (s, d) => TextQuality.bm25(Tables.documents(s, d),
        Seq("vector", "hash", "spark"), k = 20),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
        st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        tf AS (SELECT d.doc_id, dl.dl, t.term, COUNT(*) AS tf
          FROM d JOIN dl USING (doc_id), UNNEST(d.w) AS t(term)
          WHERE t.term IN ('vector', 'hash', 'spark') GROUP BY 1, 2, 3),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id,
            ln(1.0 + (CAST(st.n_docs - dft.df AS DOUBLE) + 0.5)
                     / (CAST(dft.df AS DOUBLE) + 0.5))
            * ((CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                  * (CAST(tf.dl AS DOUBLE)
                     / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))) AS sc
          FROM tf JOIN dft USING (term) CROSS JOIN st)
        SELECT doc_id, COUNT(*) AS n_terms,
          CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20"""),
      "BM25 top-20 docs for a 3-term query (k1=1.2, b=0.75)"),

    // HYBRID retrieval: BM25 lexical leg + brute-force cosine vector leg
    // fused by reciprocal-rank fusion (RRF, the standard hybrid-search
    // combiner): score = Σ_legs ⌊1e6/(60+rank)⌋, integer micro-units so
    // the fusion is engine-exact. Rank keys are the ROUNDED leg scores
    // (the DECIMAL(18,6) doubles srch1/ann1's hash-green matches prove
    // identical across engines) with doc_id tiebreak — fully
    // deterministic end to end. The query is doc 0: its embedding drives
    // the vector leg, a fixed 3-term query the lexical leg (documents
    // and embeddings share the id space).
    "srch6_hybrid_rrf" -> Q(
      (s, d) => {
        import graft.operators.Similarity
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val lex = TextQuality.bm25(docs, Seq("vector", "hash", "spark"), k = 20)
          .withColumn("lr", row_number().over(
            Window.orderBy(col("bm25").desc, col("doc_id"))))
          .select(col("doc_id"), col("lr"))
        val vec = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") === 0), emb, k = 20)
          .withColumn("vr", row_number().over(
            Window.orderBy(col("cos").desc, col("neighbor_id"))))
          .select(col("neighbor_id").as("doc_id"), col("vr"))
        val contrib = (r: org.apache.spark.sql.Column) =>
          when(r.isNull, 0L).otherwise(
            floor(lit(1000000.0) / (lit(60) + r)).cast(LongType))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("lr"), lit(0)).cast(LongType).as("lex_rank"),
            coalesce(col("vr"), lit(0)).cast(LongType).as("vec_rank"),
            (contrib(col("lr")) + contrib(col("vr"))).as("rrf_micro"))
          .orderBy(col("rrf_micro").desc, col("doc_id"))
          .limit(10)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
        st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        tf AS (SELECT d.doc_id, dl.dl, t.term, COUNT(*) AS tf
          FROM d JOIN dl USING (doc_id), UNNEST(d.w) AS t(term)
          WHERE t.term IN ('vector', 'hash', 'spark') GROUP BY 1, 2, 3),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id,
            ln(1.0 + (CAST(st.n_docs - dft.df AS DOUBLE) + 0.5)
                     / (CAST(dft.df AS DOUBLE) + 0.5))
            * ((CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                  * (CAST(tf.dl AS DOUBLE)
                     / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))) AS sc
          FROM tf JOIN dft USING (term) CROSS JOIN st),
        lex AS (SELECT doc_id, CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
          FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
        lexr AS (SELECT doc_id,
            row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lr FROM lex),
        vec AS (SELECT c.vec_id AS doc_id,
            CAST(CAST(list_cosine_similarity(q.embedding::DOUBLE[],
              c.embedding::DOUBLE[]) AS DECIMAL(18,6)) AS DOUBLE) AS cos
          FROM embeddings q JOIN embeddings c ON q.vec_id = 0 AND c.vec_id != 0
          QUALIFY row_number() OVER (ORDER BY
            list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
            c.vec_id) <= 20),
        vecr AS (SELECT doc_id,
            row_number() OVER (ORDER BY cos DESC, doc_id) AS vr FROM vec),
        f AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
            CAST(COALESCE(l.lr, 0) AS BIGINT) AS lex_rank,
            CAST(COALESCE(v.vr, 0) AS BIGINT) AS vec_rank,
            CAST(CASE WHEN l.lr IS NULL THEN 0 ELSE 1000000 // (60 + l.lr) END
              + CASE WHEN v.vr IS NULL THEN 0 ELSE 1000000 // (60 + v.vr) END
              AS BIGINT) AS rrf_micro
          FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id)
        SELECT doc_id, lex_rank, vec_rank, rrf_micro FROM f
        ORDER BY rrf_micro DESC, doc_id LIMIT 10"""),
      "hybrid search: BM25 + cosine legs fused by reciprocal-rank fusion"),

    // Same ranking served from the STORED inverted index (postings +
    // stats artifacts, built once per corpus): shares srch1's oracle
    // because indexed == direct by construction (one shared scorer,
    // QualitySpec pins CLI build/append/query against the direct path).
    "srch2_bm25_indexed" -> Q(
      (s, d) => {
        val idx = graft.operators.TextIndexStore.ensure(d, Tables.documents(s, d))
        graft.operators.TextIndexStore.search(s, idx,
          Seq("vector", "hash", "spark"), k = 20)
      },
      Some(bm25IndexedOracleSql),
      "BM25 top-20 served from the stored inverted-index artifact"),

    // srch2 served from a MERGED two-shard inverted index (the d30
    // protocol for the search family): shards index independently,
    // merge unions postings with (term, doc_id) dedup and re-derives
    // `stats` from the merged rows — so overlapping shards cannot
    // double-count lengths, the merged index equals the full build
    // (QualitySpec pins it), and the serve shares srch2's oracle
    // verbatim.
    "srch7_merged_bm25" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.TextIndexStore.ensureMerged(d,
          Seq(docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1)))
        graft.operators.TextIndexStore.search(s, idx,
          Seq("vector", "hash", "spark"), k = 20)
      },
      Some(bm25IndexedOracleSql),
      "BM25 top-20 from a two-shard merged index — distributed build, same ranking"),

    // Conjunctive (AND) retrieval: same BM25 scoring, but a doc
    // qualifies only if EVERY query term occurs — eval-set
    // decontamination wants exactly this (a doc missing a term can't
    // contain the benchmark string).
    "srch3_bm25_all_terms" -> Q(
      (s, d) => TextQuality.bm25(Tables.documents(s, d),
        Seq("vector", "hash", "spark"), k = 20, requireAll = true),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
        st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        tf AS (SELECT d.doc_id, dl.dl, t.term, COUNT(*) AS tf
          FROM d JOIN dl USING (doc_id), UNNEST(d.w) AS t(term)
          WHERE t.term IN ('vector', 'hash', 'spark') GROUP BY 1, 2, 3),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id,
            ln(1.0 + (CAST(st.n_docs - dft.df AS DOUBLE) + 0.5)
                     / (CAST(dft.df AS DOUBLE) + 0.5))
            * ((CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                  * (CAST(tf.dl AS DOUBLE)
                     / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))) AS sc
          FROM tf JOIN dft USING (term) CROSS JOIN st)
        SELECT doc_id, COUNT(*) AS n_terms,
          CAST(SUM(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM sc GROUP BY doc_id HAVING COUNT(*) = 3
        ORDER BY bm25 DESC, doc_id LIMIT 20"""),
      "BM25 with AND semantics: top-20 docs containing ALL query terms"),

    // Exact-PHRASE search via positional postings: each query term's
    // (doc, position) rows are selective filters pushed before any
    // shuffle; consecutive-position equi-joins assemble the phrase (the
    // inverted-index-with-positions shape a real search engine runs —
    // and exactly what eval-set decontamination needs to find verbatim
    // benchmark strings, where srch3's AND-of-terms still over-matches).
    "srch4_phrase" -> Q(
      (s, d) => {
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "term")
        def at(term: String, offset: Int) = toks.filter(col("term") === term)
          .select(col("doc_id"), (col("pos") - offset).as("pos"))
        at("window", 0).join(at("merge", 1), Seq("doc_id", "pos"))
          .join(at("hash", 2), Seq("doc_id", "pos"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
          .orderBy(col("n_matches").desc, col("doc_id")).limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        wins AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i))
        SELECT doc_id, COUNT(*) AS n_matches FROM wins
        WHERE g = 'window merge hash' GROUP BY 1
        ORDER BY n_matches DESC, doc_id LIMIT 20"""),
      "exact-phrase search: positional postings + consecutive-position joins"),

    // Per-doc unigram Shannon entropy in integer micro-nats — the
    // information-theoretic repetition/diversity signal (t9's dup-word
    // ratio in nats). One explode + two hash aggs; every ln rounds
    // through DECIMAL(18,6) once, the rest is exact integer/decimal
    // arithmetic, so the oracle hash-matches.
    "t23_token_entropy" -> Q(
      (s, d) => TextStats.tokenEntropy(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some(s"""WITH occ AS (SELECT doc_id,
            unnest(string_split($normSql, ' ')) AS tok FROM documents),
        g AS (SELECT doc_id, tok, COUNT(*) AS c FROM occ
          WHERE length(tok) > 0 GROUP BY 1, 2),
        p AS (SELECT doc_id, c,
            CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,6)) AS lnc6 FROM g),
        a AS (SELECT doc_id, SUM(c) AS n_toks,
            SUM(CAST(c AS DECIMAL(18,0)) * lnc6) AS s6 FROM p GROUP BY 1)
        SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
          CAST(CAST(CAST(ln(CAST(n_toks AS DOUBLE)) AS DECIMAL(18,6))
              * 1000000 AS BIGINT)
            - (CAST(s6 * 1000000 AS BIGINT) // n_toks) AS BIGINT) AS entropy_micro
        FROM a ORDER BY doc_id"""),
      "per-doc unigram Shannon entropy, integer micro-nats"),

    // MMR diversity rerank (Carbonell & Goldstein 1998) over each query
    // doc's lexical shortlist: greedily pick k results balancing
    // relevance (3-gram Jaccard micros to the query) against redundancy
    // (max Jaccard to already-picked results), λ=0.7. The greedy is
    // unrolled (k is a page-size constant) and every step is
    // candidate-scale; all arithmetic is integer, so the selection is
    // bit-identical across engines — the oracle replays the identical
    // 5-step chain.
    "srch5_mmr_rerank" -> Q(
      (s, d) => {
        import graft.operators.{Mmr, TextDedup}
        val docs = Tables.documents(s, d)
        // one explode feeds the query join, the size counts, and the
        // candidate sims (a deployment serves all three from the stored
        // postings table — DedupIndexStore's `postings`)
        val sh = TextDedup.shingleRows(docs, 3).localCheckpoint(true)
        val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        def jacMicro = floor(col("c").cast(DoubleType) * 1000000d /
          (col("na") + col("nb") - col("c")).cast(DoubleType)).cast(LongType)
        val common = broadcast(sh.as("a").filter(col("a.doc_id") < 5))
          .join(sh.as("b"), col("a.s") === col("b.s") &&
            col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("query_id"), col("b.doc_id").as("cand_id"))
          .agg(count(lit(1)).as("c"))
        val wTop = Window.partitionBy(col("query_id"))
          .orderBy(col("rel_micro").desc, col("cand_id"))
        val cands = common
          .join(cnt.toDF("query_id", "na"), Seq("query_id"))
          .join(cnt.toDF("cand_id", "nb"), Seq("cand_id"))
          .withColumn("rel_micro", jacMicro)
          .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 10)
          .select(col("query_id"), col("cand_id"), col("rel_micro"))
          // pool is page-sized (queries × 10) — one partition keeps every
          // greedy step single-task; a many-query deployment would
          // repartition by query_id here instead
          .coalesce(1).localCheckpoint(true)
        val csh = sh.join(
          broadcast(cands.select(col("cand_id").as("doc_id")).distinct()),
          Seq("doc_id"))
        val sims = csh.as("a").join(csh.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("c"))
          .join(cnt.toDF("id_a", "na"), Seq("id_a"))
          .join(cnt.toDF("id_b", "nb"), Seq("id_b"))
          .select(col("id_a"), col("id_b"), jacMicro.as("sim_micro"))
          .coalesce(1).localCheckpoint(true) // pool-sized, joined every step
        Mmr.rerank(cands, sims, k = 5, lambdaMilli = 700L)
          .orderBy(col("query_id"), col("step"))
      },
      Some(mmrOracleSql),
      "MMR diversity rerank: unrolled integer-exact greedy over the shortlist"),

    // Supervised corpus classification (the fastText-style gate):
    // multinomial Naive Bayes over tokens, self-trained on the corpus
    // labels and predicting each doc's language — the label-recovery
    // diagnostic. Scores cross the engines as exact decimal sums of
    // DECIMAL(18,6)-cast logs (the t15 doctrine), argmax ties break on
    // label, output in integer micro-nats.
    "t17_nb_classify" -> Q(
      (s, d) => TextQuality.nbClassify(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, lang,
            unnest(string_split(text, ' ')) AS tok FROM documents),
        cls AS (SELECT lang AS label, COUNT(*) AS n_docs_c FROM documents GROUP BY 1),
        tot AS (SELECT SUM(n_docs_c) AS n_docs FROM cls),
        tc AS (SELECT lang AS label, COUNT(*) AS t_c FROM toks GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
        w AS (SELECT lang AS label, tok,
            CAST(ln(CAST(COUNT(*) + 1 AS DOUBLE)) AS DECIMAL(18,6)) AS lnw6
          FROM toks GROUP BY 1, 2),
        consts AS (SELECT cls.label,
            CAST(ln(CAST(cls.n_docs_c AS DOUBLE) / CAST(tot.n_docs AS DOUBLE))
              AS DECIMAL(18,6)) AS prior6,
            CAST(ln(CAST(tc.t_c + v.v AS DOUBLE)) AS DECIMAL(18,6)) AS lnden6
          FROM cls JOIN tc USING (label) CROSS JOIN tot CROSS JOIN v),
        dlen AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY 1),
        s2 AS (SELECT t.doc_id, w.label, SUM(w.lnw6) AS s2
          FROM toks t JOIN w ON w.tok = t.tok GROUP BY 1, 2),
        sc AS (SELECT dn.doc_id, c.label,
            c.prior6 + COALESCE(s2.s2, 0)
              - CAST(dn.n_toks AS DECIMAL(18,0)) * c.lnden6 AS sc6
          FROM dlen dn CROSS JOIN consts c
          LEFT JOIN s2 ON s2.doc_id = dn.doc_id AND s2.label = c.label),
        rk AS (SELECT doc_id, label, sc6, ROW_NUMBER() OVER
            (PARTITION BY doc_id ORDER BY sc6 DESC, label) AS rk FROM sc)
        SELECT doc_id, label AS pred_label,
          CAST(sc6 * 1000000 AS BIGINT) AS score_micro
        FROM rk WHERE rk = 1 ORDER BY doc_id"""),
      "multinomial NB language classifier, self-trained (micro-nat scores)"),

    // Incremental classification — the deployment path: the NB model is
    // trained on the EXISTING labeled half and frozen; only the incoming
    // batch is scored (d12's even/odd split convention; OOV tokens fall
    // to the add-one floor through the |d|·ln(t_c+V) term).
    "t18_nb_frozen" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextQuality.nbScoreFrozen(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"))
      },
      Some("""WITH et AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
        toks AS (SELECT doc_id, lang,
            unnest(string_split(text, ' ')) AS tok FROM et),
        cls AS (SELECT lang AS label, COUNT(*) AS n_docs_c FROM et GROUP BY 1),
        tot AS (SELECT SUM(n_docs_c) AS n_docs FROM cls),
        tc AS (SELECT lang AS label, COUNT(*) AS t_c FROM toks GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
        w AS (SELECT lang AS label, tok,
            CAST(ln(CAST(COUNT(*) + 1 AS DOUBLE)) AS DECIMAL(18,6)) AS lnw6
          FROM toks GROUP BY 1, 2),
        consts AS (SELECT cls.label,
            CAST(ln(CAST(cls.n_docs_c AS DOUBLE) / CAST(tot.n_docs AS DOUBLE))
              AS DECIMAL(18,6)) AS prior6,
            CAST(ln(CAST(tc.t_c + v.v AS DOUBLE)) AS DECIMAL(18,6)) AS lnden6
          FROM cls JOIN tc USING (label) CROSS JOIN tot CROSS JOIN v),
        btoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id % 2 = 1),
        dlen AS (SELECT doc_id, COUNT(*) AS n_toks FROM btoks GROUP BY 1),
        s2 AS (SELECT b.doc_id, w.label, SUM(w.lnw6) AS s2
          FROM btoks b JOIN w ON w.tok = b.tok GROUP BY 1, 2),
        sc AS (SELECT dn.doc_id, c.label,
            c.prior6 + COALESCE(s2.s2, 0)
              - CAST(dn.n_toks AS DECIMAL(18,0)) * c.lnden6 AS sc6
          FROM dlen dn CROSS JOIN consts c
          LEFT JOIN s2 ON s2.doc_id = dn.doc_id AND s2.label = c.label),
        rk AS (SELECT doc_id, label, sc6, ROW_NUMBER() OVER
            (PARTITION BY doc_id ORDER BY sc6 DESC, label) AS rk FROM sc)
        SELECT doc_id, label AS pred_label,
          CAST(sc6 * 1000000 AS BIGINT) AS score_micro
        FROM rk WHERE rk = 1 ORDER BY doc_id"""),
      "frozen NB classifier: train on existing labeled corpus, score new batch"),

    // Deterministic weighted sampling without replacement
    // (Efraimidis–Spirakis keys on a content-derived uniform).
    "s9_weighted_sample" -> Q(
      (s, d) => TextQuality.weightedSample(Tables.documents(s, d),
        "doc_id", "n_chars", k = 50),
      Some("""WITH s AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
            CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
          FROM documents)
        SELECT doc_id, weight,
          CAST(CAST(-ln(CAST(h + 1 AS DOUBLE) / 4294967297.0)
            / CAST(weight AS DOUBLE) AS DECIMAL(18,12)) AS DOUBLE) AS samp_key
        FROM s ORDER BY samp_key, doc_id LIMIT 50"""),
      "weighted sample w/o replacement, reproducible (hash-derived keys)"),

    // Per-source KS drift on the doc-length distribution — the
    // distribution-shape sibling of dq2's category-mix L1 monitor.
    "dq3_ks_drift" -> Q(
      (s, d) => TextQuality.ksDrift(Tables.documents(s, d))
        .orderBy(col("source")),
      Some("""WITH cnt AS (SELECT source, n_chars AS x, COUNT(*) AS c
            FROM documents GROUP BY 1, 2),
          ns AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
          corpus AS (SELECT x, SUM(c) AS c_all FROM cnt GROUP BY 1),
          cc AS (SELECT x, SUM(c_all) OVER
              (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_all FROM corpus),
          tot AS (SELECT SUM(c_all) AS n_tot FROM corpus),
          scum AS (SELECT source, x, SUM(c) OVER
              (PARTITION BY source ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_s
            FROM cnt),
          g AS (SELECT ns.source, ns.n_s, cc.x, cc.cum_all, scum.cum_s
            FROM ns CROSS JOIN cc
            LEFT JOIN scum ON scum.source = ns.source AND scum.x = cc.x),
          f AS (SELECT source, n_s, cum_all,
              COALESCE(MAX(cum_s) OVER (PARTITION BY source ORDER BY x), 0) AS cum_s_f
            FROM g),
          q AS (SELECT source, n_s, n_tot,
              MAX(ABS(cum_s_f * n_tot - cum_all * n_s)) AS m
            FROM f CROSS JOIN tot GROUP BY 1, 2, 3)
        SELECT source, CAST(m * 1000000 // (n_s * n_tot) AS BIGINT) AS ks_micro
        FROM q ORDER BY source"""),
      "exact two-sample KS statistic per source (integer micro-units)"),

    // Quality drift between cohorts: KS statistic over the LM-score
    // distribution of the incoming half vs the existing half — the
    // monitor a deployment runs on every batch's scores (qualityStream
    // feeds exactly this state). Scores are BINNED to centi-nats
    // (micro DIV 10000) before the CDF so the unpartitioned corpus-CDF
    // window stays value-DOMAIN-sized (a few hundred bins) instead of
    // doc-sized — the dq3 scale contract preserved for a continuous
    // metric.
    // Ingest-volume anomalies: daily event counts per type, flagged by
    // the rolling 21-day median/MAD rule (w8's integer machinery over
    // the pipeline's own A6-style count monitors — counts are already
    // integers, so no micro scaling is even needed). One narrow count
    // aggregation, one shuffle by type, per-row array ops; the oracle
    // replays the frame relationally like w8's.
    // Two-sided CUSUM changepoint detection over daily counts — the
    // mean-shift monitor dq5's point-outlier rule can't give. Frozen
    // 14-day baseline, 5% slack, threshold = one baseline day of
    // accumulated drift; all Long arithmetic, so the sequential walk is
    // bit-identical to the recursive-CTE replay.
    "w9_cusum_changepoint" -> Q(
      (s, d) => {
        val ss = s; import ss.implicits._
        import graft.operators.Temporal
        val daily = Tables.events(s, d)
          .groupBy(col("event_type").as("key"),
            expr("ts DIV 86400000000000").as("day"))
          .agg(count(lit(1)).as("n"))
          .as[Temporal.CountPoint]
        Temporal.cusum(daily).toDF()
          .select(col("key").as("event_type"), col("day").as("day_idx"),
            col("n"), col("s_pos_milli"), col("s_neg_milli"), col("changepoint"))
          .orderBy(col("event_type"), col("day_idx"))
      },
      Some("""WITH RECURSIVE daily AS (SELECT event_type,
            epoch_ns(ts) // 86400000000000 AS day_idx, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        rk AS (SELECT event_type, day_idx, n,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS tot
          FROM daily),
        base AS (SELECT event_type,
            CAST(SUM(CASE WHEN rn <= 14 THEN n ELSE 0 END) * 1000
              // LEAST(MAX(tot), 14) AS BIGINT) AS mu
          FROM rk GROUP BY 1),
        walk(event_type, day_idx, n, sp, sn, rn) AS (
          SELECT r.event_type, r.day_idx, r.n,
            GREATEST(0, r.n * 1000 - b.mu - b.mu // 20),
            GREATEST(0, b.mu - r.n * 1000 - b.mu // 20), r.rn
          FROM rk r JOIN base b ON b.event_type = r.event_type WHERE r.rn = 1
          UNION ALL
          SELECT r.event_type, r.day_idx, r.n,
            GREATEST(0, w.sp + r.n * 1000 - b.mu - b.mu // 20),
            GREATEST(0, w.sn + b.mu - r.n * 1000 - b.mu // 20), r.rn
          FROM walk w JOIN rk r ON r.event_type = w.event_type
            AND r.rn = w.rn + 1
          JOIN base b ON b.event_type = r.event_type)
        SELECT w.event_type, w.day_idx, w.n,
          CAST(w.sp AS BIGINT) AS s_pos_milli,
          CAST(w.sn AS BIGINT) AS s_neg_milli,
          CAST(w.sp > b.mu OR w.sn > b.mu AS BIGINT) AS changepoint
        FROM walk w JOIN base b ON b.event_type = w.event_type
        ORDER BY w.event_type, day_idx"""),
      "two-sided integer CUSUM: frozen baseline, accumulated-drift changepoints"),

    // Embedding-space drift: per label, cosine between the existing
    // cohort's centroid and the incoming cohort's — the semantic-shift
    // alarm dq3/dq4's scalar distributions can't see (encoder version
    // skew, topic drift). Decimal-exact centroids (emb2), DECIMAL(18,6)
    // cosine; per-(label,dim) partials — vectors never ride a shuffle.
    "dq6_embedding_drift" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        graft.operators.Similarity.embeddingDrift(
            emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
          FROM embeddings),
        co AS (SELECT label, list(c ORDER BY i) AS cent, MAX(n) AS n_old FROM (
            SELECT label, i,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c,
              COUNT(*) AS n
            FROM e, UNNEST(range(1, 65)) AS t(i)
            WHERE vec_id % 2 = 0 GROUP BY label, i) GROUP BY label),
        cn AS (SELECT label, list(c ORDER BY i) AS cent, MAX(n) AS n_new FROM (
            SELECT label, i,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c,
              COUNT(*) AS n
            FROM e, UNNEST(range(1, 65)) AS t(i)
            WHERE vec_id % 2 = 1 GROUP BY label, i) GROUP BY label)
        SELECT co.label, co.n_old, cn.n_new,
          CAST(CAST(list_cosine_similarity(co.cent, cn.cent) AS DECIMAL(18,6)) AS DOUBLE) AS cos_drift
        FROM co JOIN cn USING (label) ORDER BY label"""),
      "per-label centroid cosine between cohorts: embedding-space drift monitor"),

    "dq5_volume_anomaly" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("ts DIV 86400000000000").as("day_idx"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
          .rowsBetween(-20, Window.currentRow)
        daily.withColumn("vals", collect_list(col("n")).over(w))
          .withColumn("srt", array_sort(col("vals")))
          .withColumn("m", size(col("srt")).cast(LongType))
          .withColumn("med2", expr(
            "element_at(srt, CAST((m + 1) DIV 2 AS INT)) + element_at(srt, CAST(m DIV 2 + 1 AS INT))"))
          .withColumn("devs", expr("array_sort(transform(vals, x -> abs(x * 2 - med2)))"))
          .withColumn("mad4", expr(
            "element_at(devs, CAST((m + 1) DIV 2 AS INT)) + element_at(devs, CAST(m DIV 2 + 1 AS INT))"))
          .withColumn("is_anom",
            when(col("m") >= 10 &&
              abs(col("n") * 2 - col("med2")) * 2 > col("mad4") * 3, 1L)
              .otherwise(0L))
          .select(col("event_type"), col("day_idx"), col("n"),
            col("med2").as("med2"), col("mad4").as("mad4"), col("is_anom"))
          .orderBy(col("event_type"), col("day_idx"))
      },
      Some("""WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day_idx,
            COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        pts AS (SELECT event_type, day_idx, n,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn
          FROM daily),
        fr AS (SELECT a.event_type, a.rn, b.n AS fv
          FROM pts a JOIN pts b ON b.event_type = a.event_type
            AND b.rn BETWEEN a.rn - 20 AND a.rn),
        rk AS (SELECT event_type, rn, fv,
            COUNT(*) OVER (PARTITION BY event_type, rn) AS m,
            ROW_NUMBER() OVER (PARTITION BY event_type, rn ORDER BY fv) AS k
          FROM fr),
        md AS (SELECT event_type, rn, MAX(m) AS m,
            CAST(SUM(fv * (CAST(k = (m+1)//2 AS INT) + CAST(k = m//2+1 AS INT))) AS BIGINT) AS med2
          FROM rk GROUP BY 1, 2),
        dv AS (SELECT f.event_type, f.rn, ABS(2 * f.fv - md.med2) AS dev
          FROM fr f JOIN md ON md.event_type = f.event_type AND md.rn = f.rn),
        dk AS (SELECT event_type, rn, dev,
            COUNT(*) OVER (PARTITION BY event_type, rn) AS m,
            ROW_NUMBER() OVER (PARTITION BY event_type, rn ORDER BY dev) AS k
          FROM dv),
        mm AS (SELECT event_type, rn,
            CAST(SUM(dev * (CAST(k = (m+1)//2 AS INT) + CAST(k = m//2+1 AS INT))) AS BIGINT) AS mad4
          FROM dk GROUP BY 1, 2)
        SELECT p.event_type, p.day_idx, p.n, md.med2, mm.mad4,
          CAST(CASE WHEN md.m >= 10 AND 2 * ABS(2 * p.n - md.med2) > 3 * mm.mad4
            THEN 1 ELSE 0 END AS BIGINT) AS is_anom
        FROM pts p JOIN md ON md.event_type = p.event_type AND md.rn = p.rn
          JOIN mm ON mm.event_type = p.event_type AND mm.rn = p.rn
        ORDER BY p.event_type, p.day_idx"""),
      "daily ingest-volume anomalies per event type — robust median/MAD flags"),

    "dq4_quality_drift" -> Q(
      (s, d) => {
        val lm = TextQuality.lmScore(Tables.documents(s, d))
        val labeled = lm.select(
          when(col("doc_id") % 2 === 0, "existing")
            .otherwise("incoming").as("source"),
          expr("avg_nlp_micro DIV 10000").as("score_bin"))
        TextQuality.ksDrift(labeled, "score_bin").orderBy(col("source"))
      },
      Some(s"""WITH $lmCtes,
        lab AS (SELECT CASE WHEN doc_id % 2 = 0 THEN 'existing'
              ELSE 'incoming' END AS source,
            avg_nlp_micro // 10000 AS x
          FROM lm),
        cnt AS (SELECT source, x, COUNT(*) AS c FROM lab GROUP BY 1, 2),
        ns AS (SELECT source, SUM(c) AS n_s FROM cnt GROUP BY 1),
        corpus AS (SELECT x, SUM(c) AS c_all FROM cnt GROUP BY 1),
        cc AS (SELECT x, SUM(c_all) OVER
            (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_all FROM corpus),
        tot AS (SELECT SUM(c_all) AS n_tot FROM corpus),
        scum AS (SELECT source, x, SUM(c) OVER
            (PARTITION BY source ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_s
          FROM cnt),
        g AS (SELECT ns.source, ns.n_s, cc.x, cc.cum_all, scum.cum_s
          FROM ns CROSS JOIN cc
          LEFT JOIN scum ON scum.source = ns.source AND scum.x = cc.x),
        f AS (SELECT source, n_s, cum_all,
            COALESCE(MAX(cum_s) OVER (PARTITION BY source ORDER BY x), 0) AS cum_s_f
          FROM g),
        q AS (SELECT source, n_s, n_tot,
            MAX(ABS(cum_s_f * n_tot - cum_all * n_s)) AS m
          FROM f CROSS JOIN tot GROUP BY 1, 2, 3)
        SELECT source, CAST(m * 1000000 // (n_s * n_tot) AS BIGINT) AS ks_micro
        FROM q ORDER BY source"""),
      "KS drift of LM-score distributions: incoming cohort vs corpus"),

    // Quality-aware mixing (the CCNet head/middle/tail selection as a
    // SAMPLING policy): per-language perplexity terciles get descending
    // keep-rates (head 1000‰ / middle 700‰ / tail 300‰), applied with
    // mx1's deterministic content-hash sampling — reproducible across
    // runs, engines and cluster sizes. Composes lmScore + ntile +
    // Curation.mixSample; report grain like mx1.
    "mx4_quality_mix" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lang = TextStats.languageId(docs)
          .select(col("doc_id"), col("pred_lang"))
        val lm = TextQuality.lmScore(docs)
          .select(col("doc_id"), col("avg_nlp_micro"))
        val wNt = Window.partitionBy(col("pred_lang"))
          .orderBy(col("avg_nlp_micro"), col("doc_id"))
        val bucketed = docs.select(col("doc_id"), col("text"))
          .join(lang, Seq("doc_id")).join(lm, Seq("doc_id"))
          .withColumn("bucket", ntile(3).over(wNt).cast(LongType))
        val rate = when(col("bucket") === 1L, lit(1000L))
          .when(col("bucket") === 2L, lit(700L)).otherwise(lit(300L))
        graft.operators.Curation.mixSample(bucketed, rate)
          .groupBy(col("pred_lang"), col("bucket"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc"))
          .orderBy(col("pred_lang"), col("bucket"))
      },
      Some(s"""WITH $lmCtes,
        lsc AS (SELECT doc_id, text,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['the','a','and','of','to','in','is','that','it','for'], x))) AS s_en,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['el','la','de','que','y','en','un','los','se','no'], x))) AS s_es,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['der','die','und','das','ist','nicht','von','mit','den','ein'], x))) AS s_de,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['le','la','et','les','des','est','un','une','du','que'], x))) AS s_fr
          FROM documents),
        lg AS (SELECT doc_id,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN gm <= 0 THEN 'und'
               WHEN s_en = gm THEN 'en' WHEN s_es = gm THEN 'es'
               WHEN s_de = gm THEN 'de' ELSE 'fr' END AS pred_lang
          FROM (SELECT *, GREATEST(s_en, s_es, s_de, s_fr) AS gm FROM lsc)),
        nt AS (SELECT d.doc_id, d.text, lg.pred_lang,
            NTILE(3) OVER (PARTITION BY lg.pred_lang
              ORDER BY lm.avg_nlp_micro, d.doc_id) AS bucket
          FROM documents d JOIN lg USING (doc_id) JOIN lm USING (doc_id)),
        kept AS (SELECT pred_lang, bucket, doc_id FROM nt
          WHERE CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1000 <
            CASE WHEN bucket = 1 THEN 1000 WHEN bucket = 2 THEN 700 ELSE 300 END)
        SELECT pred_lang, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_kept,
          MIN(doc_id) AS min_doc
        FROM kept GROUP BY 1, 2 ORDER BY pred_lang, bucket"""),
      "quality-aware mix: perplexity-tercile keep-rates, content-hash sampled"),

    // The composed CCNet-style curation report: dedup-keep → lang-id →
    // LM score → per-language perplexity terciles (head/middle/tail).
    // The tercile window partitions by language; a 100 TB run replaces
    // ntile with a20's distributed equi-depth ranks (same output
    // contract) — at report grain the partition skew is acceptable
    // here and the composition is what's under test.
    "e2e8_ccnet_report" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keep = TextDedup.exactDedup(docs)
          .select(col("canonical_id").as("doc_id"))
        val lang = TextStats.languageId(docs)
          .select(col("doc_id"), col("pred_lang"))
        val lm = TextQuality.lmScore(docs)
          .select(col("doc_id"), col("avg_nlp_micro"))
        val wNt = Window.partitionBy(col("pred_lang"))
          .orderBy(col("avg_nlp_micro"), col("doc_id"))
        keep.join(lang, Seq("doc_id")).join(lm, Seq("doc_id"))
          .withColumn("bucket", ntile(3).over(wNt).cast(LongType))
          .groupBy(col("pred_lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("avg_nlp_micro")).as("sm"))
          .select(col("pred_lang"), col("bucket"), col("n_docs"),
            expr("sm DIV n_docs").as("mean_nlp_micro"))
          .orderBy(col("pred_lang"), col("bucket"))
      },
      Some(s"""WITH $lmCtes,
        keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
        lsc AS (SELECT doc_id, text,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['the','a','and','of','to','in','is','that','it','for'], x))) AS s_en,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['el','la','de','que','y','en','un','los','se','no'], x))) AS s_es,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['der','die','und','das','ist','nicht','von','mit','den','ein'], x))) AS s_de,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['le','la','et','les','des','est','un','une','du','que'], x))) AS s_fr
          FROM documents),
        lg AS (SELECT doc_id,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN gm <= 0 THEN 'und'
               WHEN s_en = gm THEN 'en' WHEN s_es = gm THEN 'es'
               WHEN s_de = gm THEN 'de' ELSE 'fr' END AS pred_lang
          FROM (SELECT *, GREATEST(s_en, s_es, s_de, s_fr) AS gm FROM lsc)),
        j AS (SELECT keep.doc_id, lg.pred_lang, lm.avg_nlp_micro
          FROM keep JOIN lg USING (doc_id) JOIN lm USING (doc_id)),
        nt AS (SELECT pred_lang, avg_nlp_micro,
            NTILE(3) OVER (PARTITION BY pred_lang
              ORDER BY avg_nlp_micro, doc_id) AS bucket
          FROM j)
        SELECT pred_lang, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
          CAST(SUM(avg_nlp_micro) // COUNT(*) AS BIGINT) AS mean_nlp_micro
        FROM nt GROUP BY 1, 2 ORDER BY pred_lang, bucket"""),
      "CCNet-style report: dedup-keep, lang-id, LM perplexity terciles"))
}
