package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Curation

/** Corpus-curation queries (training-data pipeline, beyond the
  * reference's surface): benchmark decontamination, repetition quality
  * signals, PII scrubbing, deterministic source-mix sampling, and
  * token-window chunking. All oracle-checked — the operators are pure
  * relational/regex/hash transformations both engines can express.
  */
object CurationQueries {

  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** DuckDB rendering of Curation.docGrams for word n-grams of size n:
    * distinct per doc, space-joined.
    */
  private def gramsSql(n: Int): String =
    s"""toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
      grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+${n - 1}], ' ') AS gram
        FROM toks, UNNEST(range(1, len(w) - ${n - 2})) AS t(i))"""

  /** DuckDB replay of Dsir.importanceWeights (CTEs up to per-doc
    * weights): hashed unigram+bigram features, add-one-smoothed bucket
    * LLRs through one DECIMAL(18,6) ln each, exact decimal sums.
    */
  private val dsirWeightsCtes =
    s"""w0 AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
    g AS (SELECT doc_id, g FROM
        (SELECT doc_id, unnest(w) AS g FROM w0) WHERE length(g) > 0
      UNION ALL
      SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
        FROM w0, UNNEST(range(1, len(w))) t(i)),
    f AS (SELECT doc_id,
        CAST(concat('0x', substr(md5(g), 1, 4)) AS BIGINT) % 4096 AS bucket
      FROM g),
    tc AS (SELECT bucket, COUNT(*) AS c_t FROM f
      WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
      GROUP BY 1),
    rc AS (SELECT bucket, COUNT(*) AS c_r FROM f GROUP BY 1),
    nt AS (SELECT SUM(c_t) AS n_t FROM tc),
    nr AS (SELECT SUM(c_r) AS n_r FROM rc),
    lnr AS (SELECT rc.bucket,
        CAST(ln(((COALESCE(tc.c_t, 0) + 1)::DOUBLE / (rc.c_r + 1)) *
          ((nr.n_r + 4096)::DOUBLE / (nt.n_t + 4096))) AS DECIMAL(18, 6)) AS lnr6
      FROM rc LEFT JOIN tc ON tc.bucket = rc.bucket CROSS JOIN nt CROSS JOIN nr),
    wts AS (SELECT f.doc_id, COUNT(*) AS n_feats,
        CAST(SUM(lnr6) * 1000000 AS BIGINT) AS weight_micro
      FROM f JOIN lnr ON lnr.bucket = f.bucket GROUP BY 1)"""

  val all: Map[String, Q] = Map(

    // DSIR (Xie et al. 2023): importance weights of every raw doc against
    // the lang='en' target slice, under add-one-smoothed bag-of-hashed-
    // ngram models (B=4096 buckets, unigrams+bigrams). The corpus-sized
    // stages are one narrow feature explode and one doc_id aggregation;
    // the ratio table is B-bounded and broadcast.
    "dsir1_importance_weights" -> Q(
      (s, d) => graft.operators.Dsir.importanceWeights(
          Tables.documents(s, d), col("lang") === "en")
        .orderBy(col("doc_id")),
      Some(s"""WITH $dsirWeightsCtes
        SELECT doc_id, n_feats, weight_micro FROM wts ORDER BY doc_id"""),
      "DSIR importance weights: hashed-ngram LLR of raw docs vs the lang='en' target"),

    // The resampling step: Gumbel top-k over the log weights with
    // deterministic content-hash uniforms — a without-replacement sample
    // ∝ importance weight, reproducible across engines and runs. TakeOrdered,
    // never a global sort.
    "dsir2_importance_resample" -> Q(
      (s, d) => graft.operators.Dsir.resample(
          Tables.documents(s, d), col("lang") === "en", k = 100)
        .orderBy(col("key_micro").desc, col("doc_id")),
      Some(s"""WITH $dsirWeightsCtes
        SELECT doc_id, weight_micro, weight_micro + CAST(FLOOR(-ln(-ln(
            (CAST(concat('0x', substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) + 0.5) / 65536.0)) * 1000000.0) AS BIGINT) AS key_micro
        FROM wts ORDER BY key_micro DESC, doc_id LIMIT 100"""),
      "DSIR Gumbel top-k resample (k=100) — deterministic hash uniforms"),

    // Benchmark decontamination: training docs sharing a word 4-gram with
    // the held-out set (doc_id ≡ 0 mod 97 stands in for the benchmark
    // corpus). The benchmark gram set is broadcast; the training side is
    // never self-joined — the 100 TB side streams through one broadcast
    // hash join.
    "ct1_decontaminate" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        Curation.decontaminate(
            docs.where(pmod(col("doc_id"), lit(97L)) =!= 0),
            docs.where(pmod(col("doc_id"), lit(97L)) === 0), n = 4)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${gramsSql(4)},
        ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
        SELECT doc_id, COUNT(*) AS n_shared_grams FROM grams
        WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM ev)
        GROUP BY doc_id ORDER BY doc_id"""),
      "eval-overlap decontamination — broadcast benchmark grams, no self-join"),

    // Gopher-style repetition signals: duplicate-word and top-bigram
    // fractions in integer permille (identical double op sequence on both
    // engines).
    "t9_repetition" -> Q(
      (s, d) => Curation.repetitionSignals(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        m AS (SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd FROM toks),
        bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
          FROM toks, UNNEST(range(1, len(w))) AS t(i)),
        mx AS (SELECT doc_id, MAX(c) AS mx FROM
          (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1)
        SELECT m.doc_id AS doc_id,
          CAST(FLOOR((n - nd) * 1000.0 / n) AS BIGINT) AS dup_word_permille,
          CASE WHEN n > 1
            THEN CAST(FLOOR(COALESCE(mx, 0) * 1000.0 / (n - 1)) AS BIGINT)
            ELSE 0 END AS top_bigram_permille
        FROM m LEFT JOIN mx ON m.doc_id = mx.doc_id ORDER BY m.doc_id"""),
      "duplicate-word + top-bigram repetition fractions per doc"),

    // PII scrubbing: mask every digit run (phone / account / numeric-id
    // shapes) in the semi-structured event payloads, report the redaction
    // count. Narrow regex projection — the shape of a full-corpus scrub.
    "pii1_mask_ids" -> Q(
      (s, d) => graft.operators.Par.fan(Tables.events(s, d))
        .select(col("event_id"),
          Curation.maskDigits(col("props")).as("props_masked"),
          Curation.digitCount(col("props")).cast(LongType).as("n_redacted"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
          regexp_replace(props, '[0-9]', 'X', 'g') AS props_masked,
          CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT)
            AS n_redacted
        FROM events ORDER BY event_id"""),
      "digit-masking PII scrub with redaction counts"),

    // Structured-PII scrub: emails → IPv4 → phone shapes, each masked
    // with a category token and counted per category (ordering is
    // load-bearing — see Curation.scrubPii). The corpus text is salted
    // with deterministic doc_id-derived PII on BOTH engines so the
    // extraction paths are exercised with nonzero counts and the whole
    // scrub is hash-checked, not vacuously green on clean text.
    "pii2_structured_scrub" -> Q(
      (s, d) => {
        val salted = graft.operators.Par.fan(Tables.documents(s, d))
          .select(col("doc_id"), concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@mail.example.com from host "),
            pmod(col("doc_id"), lit(256L)), lit("."),
            pmod(col("doc_id") * 7, lit(256L)), lit(".0.1 call +1 555 "),
            lpad(pmod(col("doc_id") * 31, lit(10000L)).cast("string"), 7, "0"))
            .as("text"))
        Curation.scrubPii(salted)
          .select(col("doc_id"), col("text_scrubbed"), col("n_emails"),
            col("n_ipv4"), col("n_phones"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH salted AS (SELECT doc_id,
          text || ' contact user' || doc_id || '@mail.example.com from host '
            || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.0.1 call +1 555 '
            || lpad(CAST((doc_id * 31) % 10000 AS VARCHAR), 7, '0') AS t
          FROM documents),
        s1 AS (SELECT doc_id,
          len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
          regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
          FROM salted),
        s2 AS (SELECT doc_id, n_emails,
          len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
          regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
          FROM s1),
        s3 AS (SELECT doc_id, n_emails, n_ipv4,
          len(regexp_extract_all(t, '\+?\d[\d() -]{5,}\d')) AS n_phones,
          regexp_replace(t, '\+?\d[\d() -]{5,}\d', '<PHONE>', 'g') AS t
          FROM s2)
        SELECT doc_id, t AS text_scrubbed,
          CAST(n_emails AS BIGINT) AS n_emails, CAST(n_ipv4 AS BIGINT) AS n_ipv4,
          CAST(n_phones AS BIGINT) AS n_phones
        FROM s3 ORDER BY doc_id"""),
      "structured-PII scrub: email/IPv4/phone masking with per-category counts"),

    // Deterministic source-mix sampling: re-weight the corpus toward a
    // configured target mix (here: even-numbered sources keep 100%, odd
    // keep 40%) by thresholding a content-hash bucket — reproducible
    // across engines, reruns and repartitioning, unlike rand().
    "mx1_source_mix" -> Q(
      (s, d) => {
        val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast(LongType)
        val rate = when(pmod(srcNum, lit(2L)) === 0, lit(1000L)).otherwise(lit(400L))
        Curation.mixSample(Tables.documents(s, d), rate)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc
        FROM documents
        WHERE CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1000 <
          CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 2 = 0
            THEN 1000 ELSE 400 END
        GROUP BY source ORDER BY source"""),
      "content-hash source-mix downsampling to a target distribution"),

    // Upsampling flavor: odd sources emit 2.6x their docs (2 copies + a
    // deterministic hash-chosen 60% get a third), even sources pass
    // through. The oracle computes the closed-form copy counts; the
    // Spark side actually EXPLODES the replicas and re-aggregates, so a
    // match certifies the materialized output.
    "mx2_source_upsample" -> Q(
      (s, d) => {
        val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast(LongType)
        val rate = when(pmod(srcNum, lit(2L)) === 0, lit(1000L)).otherwise(lit(2600L))
        Curation.upsample(Tables.documents(s, d), rate)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_rows"), count_distinct(col("doc_id")).as("n_docs"),
            max(col("copy_idx")).as("max_copy"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (SELECT source, doc_id,
          CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 2 = 0
            THEN 1000 ELSE 2600 END AS rate,
          CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1000 AS bucket
          FROM documents),
        n AS (SELECT source, doc_id,
          rate // 1000 + CASE WHEN bucket < rate % 1000 THEN 1 ELSE 0 END AS copies
          FROM c WHERE rate > 0)
        SELECT source, CAST(SUM(copies) AS BIGINT) AS n_rows,
          COUNT(*) AS n_docs, CAST(MAX(copies) - 1 AS BIGINT) AS max_copy
        FROM n WHERE copies > 0 GROUP BY source ORDER BY source"""),
      "deterministic upsampling to a >1x target mix, replicas materialized"),

    // Cross-source duplication matrix: for every (source, source) pair,
    // how many near-dup pairs straddle it — the report that tells a
    // curator WHICH sources to dedup against each other (the
    // corpus-overlap tables dataset papers publish). The pair set is
    // near-dup-sized (tiny vs the corpus), so the source lookup prunes
    // the corpus side to pair endpoints with a KB Bloom (the j8 runtime-
    // filter doctrine) before the join — the corpus never fully shuffles
    // for a KB-scale report.
    "mx6_cross_source_dup" -> Q(
      (s, d) => {
        import graft.operators.{RuntimeFilter, TextDedup}
        val docs = Tables.documents(s, d)
        val pairs = TextDedup.jaccardPairs(docs, n = 3, minJaccard = 0.8)
          .select(col("id_a"), col("id_b")).localCheckpoint(true)
        val ids = pairs.select(col("id_a").as("id"))
          .unionByName(pairs.select(col("id_b").as("id")))
        val src = RuntimeFilter.bloomPruneLong(
          docs.select(col("doc_id"), col("source")), ids, "doc_id", "id",
          expectedKeys = 1L << 16, fpp = 0.01)
        pairs
          .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), Seq("id_a"))
          .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), Seq("id_b"))
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8)
        SELECT LEAST(da.source, db.source) AS source_a,
          GREATEST(da.source, db.source) AS source_b,
          COUNT(*) AS n_pairs
        FROM pairs JOIN documents da ON da.doc_id = id_a
          JOIN documents db ON db.doc_id = id_b
        GROUP BY 1, 2 ORDER BY source_a, source_b"""),
      "cross-source near-dup matrix: which sources duplicate each other"),

    // Curriculum interleave: the data-ORDER half of the mix family —
    // stride scheduling emits source s's r-th doc at virtual time
    // (2r−1)/2w_s with w_s = ⌊1000·√n_s⌋ (temperature-2 shares, mx3
    // doctrine), so sources interleave proportionally with bounded
    // burstiness and small sources surface early and evenly instead of
    // clumping wherever a hash happens to land them. Exact integer
    // virtual keys, distributed ranks (GlobalOrder) — no global window.
    "mx7_curriculum_interleave" -> Q(
      (s, d) => graft.operators.Curation.curriculumInterleave(
          Tables.documents(s, d), "doc_id", "source", seed = "42")
        .orderBy(col("pos")),
      Some("""WITH rk AS (SELECT doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS src_rank
          FROM documents),
        w AS (SELECT source,
            CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT) AS w_milli
          FROM documents GROUP BY source),
        k AS (SELECT rk.doc_id, rk.source, CAST(rk.src_rank AS BIGINT) AS src_rank,
            (2 * rk.src_rank - 1) * 100000000 // w.w_milli AS vkey
          FROM rk JOIN w USING (source))
        SELECT doc_id, source, src_rank, vkey,
          ROW_NUMBER() OVER (ORDER BY vkey, source, doc_id) AS pos
        FROM k ORDER BY pos"""),
      "stride-scheduled source interleave: proportional, bursty-free, reproducible"),

    // Temperature-scaled language rebalancing (the multilingual training
    // mix: rare languages upsampled toward p^α, α = 0.5): per-lang rate
    // = ⌊1000·√(c_max/c_l)⌋ permille, DERIVED FROM THE CORPUS COUNTS
    // rather than hand-set like mx2. The rate math is per-lang (one
    // divide, one sqrt — no cross-lang float sum to order), replication
    // reuses the deterministic content-hash machinery, so the whole mix
    // is reproducible across engines, reruns and cluster sizes.
    "mx3_temperature_mix" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        val cmax = counts.agg(max(col("c")).as("cmax"))
        val rates = counts.crossJoin(broadcast(cmax))
          .select(col("lang"), col("c").as("n_orig"),
            floor(lit(1000d) * sqrt(col("cmax").cast(DoubleType) / col("c")))
              .cast(LongType).as("rate_permille"))
        val tagged = docs.join(broadcast(rates), Seq("lang"))
        Curation.upsample(tagged, col("rate_permille"))
          .groupBy(col("lang"))
          .agg(max(col("n_orig")).as("n_orig"),
            max(col("rate_permille")).as("rate_permille"),
            count(lit(1)).as("n_out"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
        m AS (SELECT MAX(c) AS cmax FROM c),
        r AS (SELECT lang, c AS n_orig,
            CAST(FLOOR(1000 * sqrt(CAST(cmax AS DOUBLE) / c)) AS BIGINT) AS rate_permille
          FROM c, m),
        n AS (SELECT d.lang, r.n_orig, r.rate_permille,
            r.rate_permille // 1000 + CASE WHEN
              CAST(concat('0x', substr(md5(d.text), 1, 4)) AS BIGINT) % 1000
              < r.rate_permille % 1000 THEN 1 ELSE 0 END AS copies
          FROM documents d JOIN r USING (lang))
        SELECT lang, CAST(MAX(n_orig) AS BIGINT) AS n_orig,
          CAST(MAX(rate_permille) AS BIGINT) AS rate_permille,
          CAST(SUM(copies) AS BIGINT) AS n_out
        FROM n WHERE copies > 0 GROUP BY lang ORDER BY lang"""),
      "temperature (a=0.5) language rebalancing — rates derived from corpus counts"),

    // Token-window chunking: 32-word windows, stride 24 — the sequence
    // preparation step before packing (t7/t8 pack whole docs; t10 splits
    // long ones). One narrow explode, no shuffle.
    "t10_token_chunks" -> Q(
      (s, d) => Curation.tokenChunks(Tables.documents(s, d), chunkSize = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_start")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents)
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_start,
          CAST(LEAST(32, len(w) - i + 1) AS BIGINT) AS chunk_len,
          w[CAST(i AS INTEGER)] AS first_token
        FROM toks, UNNEST(range(1, len(w) + 1, 24)) AS t(i)
        ORDER BY doc_id, chunk_start"""),
      "overlapping token-window chunking (size 32, stride 24)"),

    // Source-mix drift monitor: per-source L1 distance (in permille)
    // between its language distribution and the corpus's — the alarm that
    // catches a crawler/source going off-mix before it pollutes the blend
    // (mx1/mx2 set the mix; dq2 watches it). All arithmetic is integer
    // floor-division permille → exact on both engines. Two grouped counts
    // + a broadcast grid join; the heavy scan is the (source, lang) count,
    // everything after is KB-scale.
    "dq2_mix_drift" -> Q(
      (s, d) => {
        val sl = Tables.documents(s, d)
          .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c_sl"))
        val bySource = sl.groupBy(col("source")).agg(sum(col("c_sl")).as("n_s"))
        val byLang = sl.groupBy(col("lang")).agg(sum(col("c_sl")).as("c_l"))
        val total = sl.agg(sum(col("c_sl")).as("n"))
        val globalP = byLang.crossJoin(broadcast(total))
          .select(col("lang"), expr("c_l * 1000 DIV n").as("p_l"))
        bySource.crossJoin(broadcast(globalP))
          .join(sl, Seq("source", "lang"), "left")
          .select(col("source"),
            abs(expr("coalesce(c_sl, 0L) * 1000 DIV n_s") - col("p_l")).as("dev"))
          .groupBy(col("source"))
          .agg(sum(col("dev")).cast("long").as("drift_permille"))
          .orderBy(col("source"))
      },
      Some("""WITH sl AS (SELECT source, lang, COUNT(*) AS c_sl
            FROM documents GROUP BY 1, 2),
          bs AS (SELECT source, SUM(c_sl) AS n_s FROM sl GROUP BY 1),
          bl AS (SELECT lang, SUM(c_sl) AS c_l FROM sl GROUP BY 1),
          tot AS (SELECT SUM(c_sl) AS n FROM sl),
          gp AS (SELECT lang, (c_l * 1000) // n AS p_l FROM bl, tot),
          grid AS (SELECT bs.source, bs.n_s, gp.lang, gp.p_l
            FROM bs CROSS JOIN gp),
          q AS (SELECT g.source,
              ABS((COALESCE(sl.c_sl, 0) * 1000) // g.n_s - g.p_l) AS dev
            FROM grid g LEFT JOIN sl
              ON sl.source = g.source AND sl.lang = g.lang)
        SELECT source, CAST(SUM(dev) AS BIGINT) AS drift_permille
        FROM q GROUP BY source ORDER BY source"""),
      "per-source language-mix drift vs corpus, exact integer permille"),

    // Embedding-space decontamination — the semantic sibling of ct1:
    // benchmark vectors (label 9 = the held-out eval set) ride along as
    // ONE array literal (KB), so the corpus scan is a single narrow pass
    // with zero join/shuffle; max_cos ≥ τ flags docs to drop before
    // pretraining. ct1 catches verbatim leakage; this catches
    // paraphrased leakage n-grams miss.
    "ct2_semantic_decontaminate" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val bench = graft.operators.Similarity.collectBenchmark(
          emb.where(col("label") === 9))
        graft.operators.Similarity.semanticContamination(
            emb.where(col("label") =!= 9), bench, minCos = 0.35)
          .orderBy(col("vec_id"))
      },
      Some("""WITH bench AS (
          SELECT embedding::DOUBLE[] AS b FROM embeddings WHERE label = 9),
        corpus AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE label <> 9),
        m AS (SELECT c.vec_id, MAX(list_cosine_similarity(c.v, b.b)) AS mx
          FROM corpus c CROSS JOIN bench b GROUP BY 1)
        SELECT vec_id, CAST(CAST(mx AS DECIMAL(18,6)) AS DOUBLE) AS max_cos,
          CAST(mx >= 0.35 AS BIGINT) AS contaminated
        FROM m ORDER BY vec_id"""),
      "embedding-space decontamination: max benchmark cosine per corpus vector"),

    // SSL-prototypes curation (Sorscher et al. 2022 data-pruning): keep
    // the m most centroid-prototypical vectors per label. Centroids are
    // emb2's exact decimal means; ranking is on the 1e-6-rounded cosine
    // with a vec_id tiebreak, so the kept set is deterministic across
    // engines and partitionings.
    "cl2_label_prototypes" -> Q(
      (s, d) => graft.operators.Similarity
        .labelPrototypes(Tables.embeddings(s, d), m = 20)
        .orderBy(col("label"), col("rk")),
      Some("""WITH emb AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT label, list(c_val ORDER BY dim) AS cent FROM (
            SELECT label, i AS dim,
              CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
            FROM emb, UNNEST(range(1, 65)) AS t(i)
            GROUP BY label, i) GROUP BY label),
        sc AS (SELECT e.vec_id, e.label,
            CAST(CAST(list_cosine_similarity(e.v, c.cent) AS DECIMAL(18,6)) AS DOUBLE) AS cos
          FROM emb e JOIN cent c ON c.label = e.label),
        rk AS (SELECT vec_id, label, cos, ROW_NUMBER() OVER
            (PARTITION BY label ORDER BY cos DESC, vec_id) AS rk FROM sc)
        SELECT label, vec_id, cos, rk FROM rk WHERE rk <= 20
        ORDER BY label, rk"""),
      "SSL-prototypes pruning: top-20 most centroid-prototypical per label"),

    // Token-budget data recipe (the LLaMA/DoReMi mixing table): α=0.5
    // temperature weights over per-source token counts, normalized
    // through an exact DECIMAL(18,6) sum (order-independent across
    // engines/partitionings — a double Σ would not be), then per-source
    // target tokens + repeat factor for a fixed training budget.
    // Shape: one narrow token-count pass, one 20-row agg, broadcast
    // total — the whole recipe costs one corpus scan at any scale.
    "mx5_token_budget" -> Q(
      (s, d) => {
        val budget = 10000000d // 10 M training tokens
        val toks = size(split(graft.operators.TextDedup.normalizeText(col("text")), " "))
          .cast(LongType)
        val per = Tables.documents(s, d).select(col("source"), toks.as("t"))
          .groupBy(col("source")).agg(sum(col("t")).as("n_tok"))
          .withColumn("w6", sqrt(col("n_tok").cast(DoubleType)).cast(DecimalType(18, 6)))
        val tot = per.agg(sum(col("w6")).as("tot6"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tok"),
            floor(col("w6").cast(DoubleType) * lit(budget) /
              col("tot6").cast(DoubleType)).cast(LongType).as("target_tok"))
          .withColumn("epochs_milli",
            floor(col("target_tok").cast(DoubleType) * 1000d /
              col("n_tok").cast(DoubleType)).cast(LongType))
          .withColumn("oversampled", (col("epochs_milli") > 1000L).cast(LongType))
          .orderBy(col("source"))
      },
      Some(s"""WITH per AS (SELECT source,
            CAST(SUM(len(string_split($normSql, ' '))) AS BIGINT) AS n_tok
          FROM documents GROUP BY 1),
        w AS (SELECT source, n_tok,
            CAST(sqrt(CAST(n_tok AS DOUBLE)) AS DECIMAL(18,6)) AS w6 FROM per),
        tot AS (SELECT SUM(w6) AS tot6 FROM w),
        t AS (SELECT source, n_tok,
            CAST(FLOOR(CAST(w6 AS DOUBLE) * 10000000.0 / CAST(tot6 AS DOUBLE)) AS BIGINT) AS target_tok
          FROM w CROSS JOIN tot),
        e AS (SELECT source, n_tok, target_tok,
            CAST(FLOOR(CAST(target_tok AS DOUBLE) * 1000 / CAST(n_tok AS DOUBLE)) AS BIGINT) AS epochs_milli
          FROM t)
        SELECT source, n_tok, target_tok, epochs_milli,
          CAST(epochs_milli > 1000 AS BIGINT) AS oversampled
        FROM e ORDER BY source"""),
      "token-budget recipe: α=0.5 temperature weights, targets + repeat factors"))
}
