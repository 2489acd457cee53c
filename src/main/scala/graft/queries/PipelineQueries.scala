package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.multimodal.Media
import graft.operators.{Similarity, TextDedup, TextStats}

/** Training-data-pipeline operators (beyond the reference's surface —
  * SURVEY §7.4 north-star): deduplication, similarity search, text
  * analysis, multimodal feature extraction, sessionization. Oracle parity
  * notes:
  *  - ratio/score outputs are integer micro/permille units produced by the
  *    IDENTICAL double op sequence on both engines (float repr compare);
  *  - cosine outputs round through DECIMAL(18,6) then render as DOUBLE
  *    (both engines agree to ~1e-15; the decimal stage kills float-tail
  *    ties, the double rendering survives every parquet reader);
  *  - hash-derived operators replay in SQL when their randomness is a
  *    deterministic artifact: md5-derived signatures re-derive in DuckDB
  *    (d3/d4/d6), seeded plane/quantizer constants render as literals in
  *    BOTH plans (ann2/ann6). Only genuinely float-iterative training
  *    (Lloyd/Jacobi — ann3-5, cl1, emb1) stays rows-only, gated by
  *    recall/orthonormality specs instead.
  */
object PipelineQueries {

  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** d29's full oracle — also d34's: the b-bit band store's merge is a
    * row-identical fold (banding is a pure function of the packed
    * signature), so the merged serve replays the same DuckDB b-bit
    * MinHash derivation.
    */
  private def d29OracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        hv AS (SELECT doc_id,
            CAST(CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) AS HUGEINT) AS h1,
            CAST(CAST(concat('0x', substr(md5(s), 17, 16)) AS UBIGINT) AS HUGEINT) AS h2
          FROM sh),
        comp AS (SELECT doc_id, p,
            MIN(CAST((h1 + p * h2) % 9223372036854775808 AS BIGINT)) AS v
          FROM hv, UNNEST(range(0, 64)) AS t(p) GROUP BY doc_id, p),
        byt AS (SELECT doc_id, p, v % 256 AS y FROM comp),
        band AS (SELECT doc_id, p // 4 AS bd,
            SUM(y * (CASE p % 4 WHEN 0 THEN 1 WHEN 1 THEN 256
              WHEN 2 THEN 65536 ELSE 16777216 END)) AS bval
          FROM byt GROUP BY doc_id, p // 4),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM band a JOIN band b
            ON a.bd = b.bd AND a.bval = b.bval AND a.doc_id < b.doc_id),
        agree AS (SELECT c.id_a, c.id_b,
            SUM(CASE WHEN ya.y = yb.y THEN 1 ELSE 0 END) AS n_agree
          FROM cand c JOIN byt ya ON ya.doc_id = c.id_a
            JOIN byt yb ON yb.doc_id = c.id_b AND yb.p = ya.p
          GROUP BY 1, 2),
        est AS (SELECT id_a, id_b,
            (CAST(n_agree AS DOUBLE) / 64 - 1.0 / 256) / (1 - 1.0 / 256) AS est
          FROM agree)
        SELECT id_a, id_b, CAST(FLOOR(est * 1000000) AS BIGINT) AS est_micro
        FROM est WHERE est >= 0.7 AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""

  /** d28's full oracle — also d32's: a two-shard merged band store is
    * row-identical to the single build (banding is a pure function of
    * the signature), so both serves replay the same DuckDB SimHash
    * derivation.
    */
  private def d28OracleSql: String =
    """WITH tok AS (SELECT doc_id, t AS tok
          FROM (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                x -> len(x) > 0) AS tk
            FROM documents), UNNEST(tk) AS u(t)),
        th AS (SELECT doc_id,
            CAST(CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS HUGEINT) AS h
          FROM tok),
        bits AS (SELECT doc_id, b,
            SUM(CASE WHEN (h >> CAST(b AS INTEGER)) % 2 = 1 THEN 1 ELSE -1 END) AS cnt
          FROM th, UNNEST(range(0, 64)) AS t(b) GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
            CAST(SUM(CASE WHEN cnt > 0 AND b < 63 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
              WHEN cnt > 0 AND b = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
              ELSE 0 END) AS BIGINT) AS sh
          FROM bits GROUP BY doc_id),
        sig2 AS (SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
          FROM documents d LEFT JOIN sig s USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM sig2 a JOIN sig2 b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 7
          AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
        ORDER BY id_a, id_b"""

  /** d26's full oracle — also d31's: a two-shard merged suffix store is
    * table-identical to the single build (SuffixSpec), so both serves
    * replay the same DuckDB derivation (capped suffix sort, neighbor
    * common-prefix lengths, batch restriction).
    */
  private def d26OracleSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        suf AS (SELECT doc_id, p, w[p:least(p + 31, len(w))] AS key
          FROM toks, UNNEST(range(1, len(w) + 1)) AS t(p)),
        ord AS (SELECT doc_id, p, key,
            lag(key) OVER (ORDER BY key) AS pk,
            lead(key) OVER (ORDER BY key) AS nk
          FROM suf),
        l AS (SELECT doc_id, p, GREATEST(
            COALESCE(CASE WHEN pk IS NULL THEN 0 ELSE
              COALESCE(NULLIF(list_position(list_transform(
                range(1, least(len(key), len(pk)) + 1), i -> key[i] = pk[i]),
                false), 0) - 1, least(len(key), len(pk))) END, 0),
            COALESCE(CASE WHEN nk IS NULL THEN 0 ELSE
              COALESCE(NULLIF(list_position(list_transform(
                range(1, least(len(key), len(nk)) + 1), i -> key[i] = nk[i]),
                false), 0) - 1, least(len(key), len(nk))) END, 0)
          ) AS match_len FROM ord)
        SELECT doc_id, p, CAST(match_len AS BIGINT) AS match_len
        FROM l WHERE match_len >= 8 AND doc_id % 2 = 1 ORDER BY doc_id, p"""

  /** DuckDB replay of ann2's LSH stage. The 8×4 seeded gaussian planes
    * are the SAME deterministic artifact both engines consume: Spark
    * ships them as `typedLit` arrays inside the plan, the oracle renders
    * them here as `%.17e` literals (18 significant digits round-trip any
    * double exactly, and E-notation parses as DOUBLE in DuckDB — no
    * DECIMAL-literal detour). Bucket bits are the identical sign tests;
    * a sign can only disagree across engines if |dot| falls inside the
    * summation-order tail (~1e-15 relative), which gaussian planes
    * against real data never produce — so the candidate sets replay
    * exactly, and the rescoring reuses ann1's proven DECIMAL(18,6)
    * cosine protocol. This is the ann6 frozen-quantizer doctrine applied
    * to the one ANN family member whose "training" is pure seeded
    * randomness rather than float iteration.
    */
  /** ann3's full oracle — also ann8's: a two-shard frozen-artifact build
    * merged is bit-identical to the unsharded index (encode is a pure
    * projection given frozen decimal-exact centroids, and those train
    * order-exactly over any shard layout), so both queries replay the
    * same DuckDB derivation: centroids, argmax-cosine cells, probing
    * order, in-cell rescoring.
    */
  /** cl1's oracle: the exact-Lloyd trajectory with the iterations
    * UNROLLED into chained CTE blocks (c0 → a1 → c1 → … → c_iters →
    * final assignment). Each assignment ranks DECIMAL(18,6)-rounded
    * list_distance with a cell tiebreak — the identical comparison key
    * the Spark argmin struct uses — and each update is the decimal-sum
    * mean with empty cells COALESCE-ing to their previous centroid.
    */
  private def kmeansOracle(k: Int, iters: Int): String = {
    def asg(name: String, cents: String) =
      s"""$name AS MATERIALIZED (SELECT vec_id, v, cell FROM (
          SELECT e.vec_id, e.v, c.cell,
            row_number() OVER (PARTITION BY e.vec_id ORDER BY
              CAST(list_distance(e.v, c.cent) AS DECIMAL(18,6)), c.cell) AS rn
          FROM emb e, $cents c) WHERE rn = 1)"""
    def upd(name: String, assigned: String, prev: String) =
      s"""$name AS MATERIALIZED (SELECT p.cell, COALESCE(m.cent, p.cent) AS cent
          FROM $prev p LEFT JOIN (
            SELECT cell, list(cv ORDER BY dim) AS cent FROM (
              SELECT cell, i AS dim,
                CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cv
              FROM $assigned, UNNEST(range(1, 65)) AS t(i)
              GROUP BY cell, i) GROUP BY cell) m USING (cell))"""
    val blocks = (1 to iters).flatMap(i =>
      Seq(asg(s"a$i", s"c${i - 1}"), upd(s"c$i", s"a$i", s"c${i - 1}")))
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
          v AS cent
        FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $k)),
      ${blocks.mkString(",\n      ")},
      ${asg("afin", s"c$iters")}
      SELECT vec_id, cell FROM afin ORDER BY vec_id"""
  }

  /** ann4's oracle: the ENTIRE raw-PQ pipeline replayed — per-subspace
    * Lloyd training (iterations unrolled like `kmeansOracle`, all M
    * subspaces riding one chain via the `m` column), rounded-argmin
    * encode over the full corpus, per-query LUTs, ADC scoring with the
    * ROUNDED approx-cosine shortlist rank, and the exact-cosine
    * re-rank. Every comparison key is DECIMAL(18,6)-rounded with an id
    * tiebreak (the cl1 protocol), so neither engine's ~1e-16
    * summation-order noise can flip an assignment, a shortlist
    * boundary, or a rank — which is what lets a Lloyd-trained
    * quantizer sit under the hash gate at all.
    */
  private def pqOracle(k: Int, refine: Int, sampleSize: Int, iters: Int,
      m: Int, subDim: Int, kSub: Int): String = {
    def asg(name: String, cents: String, src: String) =
      s"""$name AS MATERIALIZED (SELECT vec_id, m, sv, code FROM (
          SELECT s.vec_id, s.m, s.sv, c.code,
            row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
              CAST(list_distance(s.sv, c.cent) AS DECIMAL(18,6)), c.code) AS rn
          FROM $src s JOIN $cents c ON s.m = c.m) WHERE rn = 1)"""
    def upd(name: String, assigned: String, prev: String) =
      s"""$name AS MATERIALIZED (SELECT p.m, p.code, COALESCE(u.cent, p.cent) AS cent
          FROM $prev p LEFT JOIN (
            SELECT m, code, list(cv ORDER BY dim) AS cent FROM (
              SELECT m, code, i AS dim,
                CAST(SUM(CAST(sv[CAST(i AS INTEGER)] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cv
              FROM $assigned, UNNEST(range(1, $subDim + 1)) AS t(i)
              GROUP BY m, code, i) GROUP BY m, code) u USING (m, code))"""
    val blocks = (1 to iters).flatMap(i =>
      Seq(asg(s"a$i", s"c${i - 1}", "subs"), upd(s"c$i", s"a$i", s"c${i - 1}")))
    val sl = s"CAST(m*$subDim+1 AS INTEGER):CAST(m*$subDim+$subDim AS INTEGER)"
    val slc = s"CAST(c.m*$subDim+1 AS INTEGER):CAST(c.m*$subDim+$subDim AS INTEGER)"
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      samp AS MATERIALIZED (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $sampleSize),
      subs AS MATERIALIZED (SELECT vec_id, CAST(m AS INTEGER) AS m, v[$sl] AS sv
        FROM samp, UNNEST(range(0, $m)) AS t(m)),
      c0 AS MATERIALIZED (SELECT m, CAST(rn - 1 AS INTEGER) AS code, sv AS cent FROM (
          SELECT m, sv, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
          FROM subs) WHERE rn <= $kSub),
      ${blocks.mkString(",\n      ")},
      fsubs AS MATERIALIZED (SELECT vec_id, CAST(m AS INTEGER) AS m, v[$sl] AS sv
        FROM emb, UNNEST(range(0, $m)) AS t(m)),
      codes AS MATERIALIZED (SELECT vec_id, m, code FROM (
          SELECT f.vec_id, f.m, c.code,
            row_number() OVER (PARTITION BY f.vec_id, f.m ORDER BY
              CAST(list_distance(f.sv, c.cent) AS DECIMAL(18,6)), c.code) AS rn
          FROM fsubs f JOIN c$iters c ON f.m = c.m) WHERE rn = 1),
      norms AS (SELECT vec_id, sqrt(list_inner_product(v, v)) AS norm FROM emb),
      q AS (SELECT vec_id AS query_id, v AS qv,
          sqrt(list_inner_product(v, v)) AS qnorm FROM emb WHERE vec_id < 5),
      luts AS (SELECT q.query_id, c.m, c.code,
          list_inner_product(q.qv[$slc], c.cent) AS ip
        FROM q, c$iters c),
      adc AS (SELECT l.query_id, co.vec_id,
          CAST(SUM(l.ip) / (ANY_VALUE(q.qnorm) * ANY_VALUE(n.norm)) AS DECIMAL(18,6)) AS approx_cos
        FROM codes co JOIN luts l ON co.m = l.m AND co.code = l.code
        JOIN norms n ON n.vec_id = co.vec_id
        JOIN q ON q.query_id = l.query_id
        WHERE l.query_id != co.vec_id
        GROUP BY l.query_id, co.vec_id),
      shortlist AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY approx_cos DESC, vec_id) AS rn FROM adc)
        WHERE rn <= ${k * refine})
      SELECT s.query_id, s.vec_id AS neighbor_id,
        CAST(CAST(list_cosine_similarity(q.qv, e.v) AS DECIMAL(18,6)) AS DOUBLE) AS cos
      FROM shortlist s JOIN q USING (query_id) JOIN emb e ON e.vec_id = s.vec_id
      QUALIFY row_number() OVER (PARTITION BY s.query_id
        ORDER BY CAST(list_cosine_similarity(q.qv, e.v) AS DECIMAL(18,6)) DESC, s.vec_id) <= $k
      ORDER BY query_id, cos DESC, neighbor_id"""
  }

  /** ann5's oracle: the ENTIRE IVFPQ pipeline replayed — unrolled coarse
    * k-means over full vectors (kc chain), rounded cell assignment,
    * residual subvectors of the training sample, unrolled per-subspace
    * residual Lloyd (pc chain, all M subspaces on one chain via the `m`
    * column), full-corpus residual encode, rounded nprobe probe
    * selection, coarse-corrected ADC (⟨q,c_cell⟩ + Σ lut) with the
    * rounded shortlist rank, and the exact re-rank. Every CTE is
    * MATERIALIZED: the kc/pc chains nest ~26 deep and each level is
    * referenced twice, so default inlining would multiply the base scan
    * exponentially (observed as fd exhaustion); materialization bounds
    * it to one scan per block.
    */
  private def ivfPqOracle(k: Int, refine: Int, nprobe: Int, kClusters: Int,
      coarseIters: Int, sampleSize: Int, resIters: Int,
      m: Int, subDim: Int, kSub: Int): String = {
    val dim = m * subDim
    def kasg(name: String, cents: String) =
      s"""$name AS MATERIALIZED (SELECT vec_id, v, cell FROM (
          SELECT e.vec_id, e.v, c.cell,
            row_number() OVER (PARTITION BY e.vec_id ORDER BY
              CAST(list_distance(e.v, c.cent) AS DECIMAL(18,6)), c.cell) AS rn
          FROM emb e, $cents c) WHERE rn = 1)"""
    def kupd(name: String, assigned: String, prev: String) =
      s"""$name AS MATERIALIZED (SELECT p.cell, COALESCE(u.cent, p.cent) AS cent
          FROM $prev p LEFT JOIN (
            SELECT cell, list(cv ORDER BY dim) AS cent FROM (
              SELECT cell, i AS dim,
                CAST(SUM(CAST(v[CAST(i AS INTEGER)] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cv
              FROM $assigned, UNNEST(range(1, $dim + 1)) AS t(i)
              GROUP BY cell, i) GROUP BY cell) u USING (cell))"""
    def pasg(name: String, cents: String, src: String) =
      s"""$name AS MATERIALIZED (SELECT vec_id, m, rsv, code FROM (
          SELECT s.vec_id, s.m, s.rsv, c.code,
            row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
              CAST(list_distance(s.rsv, c.cent) AS DECIMAL(18,6)), c.code) AS rn
          FROM $src s JOIN $cents c ON s.m = c.m) WHERE rn = 1)"""
    def pupd(name: String, assigned: String, prev: String) =
      s"""$name AS MATERIALIZED (SELECT p.m, p.code, COALESCE(u.cent, p.cent) AS cent
          FROM $prev p LEFT JOIN (
            SELECT m, code, list(cv ORDER BY dim) AS cent FROM (
              SELECT m, code, i AS dim,
                CAST(SUM(CAST(rsv[CAST(i AS INTEGER)] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS cv
              FROM $assigned, UNNEST(range(1, $subDim + 1)) AS t(i)
              GROUP BY m, code, i) GROUP BY m, code) u USING (m, code))"""
    val kBlocks = (1 to coarseIters).flatMap(i =>
      Seq(kasg(s"ka$i", s"kc${i - 1}"), kupd(s"kc$i", s"ka$i", s"kc${i - 1}")))
    val pBlocks = (1 to resIters).flatMap(i =>
      Seq(pasg(s"pa$i", s"pc${i - 1}", "rsubs"), pupd(s"pc$i", s"pa$i", s"pc${i - 1}")))
    val rsvExpr = s"""list_transform(range(1, $subDim + 1),
            i -> s.v[CAST(t.m*$subDim+i AS INTEGER)] - kc.cent[CAST(t.m*$subDim+i AS INTEGER)])"""
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      kc0 AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
          v AS cent
        FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $kClusters)),
      ${kBlocks.mkString(",\n      ")},
      cells AS MATERIALIZED (SELECT vec_id, v, cell FROM (
          SELECT e.vec_id, e.v, c.cell,
            row_number() OVER (PARTITION BY e.vec_id ORDER BY
              CAST(list_distance(e.v, c.cent) AS DECIMAL(18,6)), c.cell) AS rn
          FROM emb e, kc$coarseIters c) WHERE rn = 1),
      rsubs AS MATERIALIZED (SELECT s.vec_id, CAST(t.m AS INTEGER) AS m, $rsvExpr AS rsv
        FROM (SELECT vec_id, v, cell FROM cells ORDER BY vec_id LIMIT $sampleSize) s
        JOIN kc$coarseIters kc USING (cell), UNNEST(range(0, $m)) AS t(m)),
      pc0 AS MATERIALIZED (SELECT m, CAST(rn - 1 AS INTEGER) AS code, rsv AS cent FROM (
          SELECT m, rsv, row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
          FROM rsubs) WHERE rn <= $kSub),
      ${pBlocks.mkString(",\n      ")},
      frsubs AS MATERIALIZED (SELECT s.vec_id, s.cell, CAST(t.m AS INTEGER) AS m, $rsvExpr AS rsv
        FROM cells s JOIN kc$coarseIters kc USING (cell), UNNEST(range(0, $m)) AS t(m)),
      codes AS MATERIALIZED (SELECT vec_id, cell, m, code FROM (
          SELECT f.vec_id, f.cell, f.m, c.code,
            row_number() OVER (PARTITION BY f.vec_id, f.m ORDER BY
              CAST(list_distance(f.rsv, c.cent) AS DECIMAL(18,6)), c.code) AS rn
          FROM frsubs f JOIN pc$resIters c ON f.m = c.m) WHERE rn = 1),
      norms AS MATERIALIZED (SELECT vec_id, sqrt(list_inner_product(v, v)) AS norm FROM emb),
      q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv,
          sqrt(list_inner_product(v, v)) AS qnorm FROM emb WHERE vec_id < 5),
      probes AS MATERIALIZED (SELECT query_id, cell, qc FROM (
          SELECT q.query_id, c.cell,
            list_inner_product(q.qv, c.cent) AS qc,
            row_number() OVER (PARTITION BY q.query_id ORDER BY
              CAST(list_distance(q.qv, c.cent) AS DECIMAL(18,6)), c.cell) AS rn
          FROM q, kc$coarseIters c) WHERE rn <= $nprobe),
      luts AS MATERIALIZED (SELECT q.query_id, c.m, c.code,
          list_inner_product(q.qv[CAST(c.m*$subDim+1 AS INTEGER):CAST(c.m*$subDim+$subDim AS INTEGER)], c.cent) AS ip
        FROM q, pc$resIters c),
      adc AS MATERIALIZED (SELECT p.query_id, co.vec_id,
          CAST((ANY_VALUE(p.qc) + SUM(l.ip)) / (ANY_VALUE(q.qnorm) * ANY_VALUE(n.norm)) AS DECIMAL(18,6)) AS approx_cos
        FROM probes p
        JOIN codes co ON co.cell = p.cell
        JOIN luts l ON l.query_id = p.query_id AND l.m = co.m AND l.code = co.code
        JOIN norms n ON n.vec_id = co.vec_id
        JOIN q ON q.query_id = p.query_id
        WHERE p.query_id != co.vec_id
        GROUP BY p.query_id, co.vec_id),
      shortlist AS MATERIALIZED (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY approx_cos DESC, vec_id) AS rn FROM adc)
        WHERE rn <= ${k * refine})
      SELECT s.query_id, s.vec_id AS neighbor_id,
        CAST(CAST(list_cosine_similarity(q.qv, e.v) AS DECIMAL(18,6)) AS DOUBLE) AS cos
      FROM shortlist s JOIN q USING (query_id) JOIN emb e ON e.vec_id = s.vec_id
      QUALIFY row_number() OVER (PARTITION BY s.query_id
        ORDER BY CAST(list_cosine_similarity(q.qv, e.v) AS DECIMAL(18,6)) DESC, s.vec_id) <= $k
      ORDER BY query_id, cos DESC, neighbor_id"""
  }

  private def ann3OracleSql: String =
    """WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        cent AS (SELECT label AS cell, list(c_val ORDER BY dim) AS cent FROM (
            SELECT label, i AS dim,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
            FROM emb, UNNEST(range(1, 65)) AS t(i)
            GROUP BY label, i) GROUP BY label),
        assigned AS (SELECT vec_id, cell, emb FROM (
            SELECT e.vec_id, c.cell, e.emb,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.emb, c.cent) DESC, c.cell) AS rn
            FROM emb e, cent c) WHERE rn = 1),
        probes AS (SELECT vec_id AS query_id, emb AS qv, cell FROM (
            SELECT e.vec_id, e.emb, c.cell,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.emb, c.cent) DESC, c.cell) AS rn
            FROM emb e, cent c WHERE e.vec_id < 5) WHERE rn <= 6),
        scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
            list_cosine_similarity(p.qv, a.emb) AS cs
          FROM probes p JOIN assigned a
            ON a.cell = p.cell AND a.vec_id <> p.query_id)
        SELECT query_id, neighbor_id,
          CAST(CAST(cs AS DECIMAL(18,6)) AS DOUBLE) AS cos
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
          ORDER BY cs DESC, neighbor_id) <= 3
        ORDER BY query_id, cos DESC, neighbor_id"""

  private def ann2OracleSql: String = {
    val planes = Similarity.hyperplanes(64, 8, 4)
    def arr(p: Array[Double]): String =
      p.map(x => f"$x%.17e").mkString("[", ", ", "]")
    val legs = planes.zipWithIndex.map { case (table, t) =>
      val bits = table.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_inner_product(v, ${arr(p)}) >= 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString("\n        + ")
      s"SELECT vec_id, $t AS tbl,\n        $bits AS bucket FROM b"
    }.mkString("\n      UNION ALL ")
    s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      bu AS ($legs),
      cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM bu q JOIN bu c ON q.tbl = c.tbl AND q.bucket = c.bucket
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id)
      SELECT query_id, neighbor_id,
        CAST(CAST(list_cosine_similarity(qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]) AS DECIMAL(18,6)) AS DOUBLE) AS cos
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
      QUALIFY row_number() OVER (PARTITION BY query_id
        ORDER BY list_cosine_similarity(qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]) DESC, neighbor_id) <= 3
      ORDER BY query_id, cos DESC, neighbor_id"""
  }

  /** DuckDB replay of the BPE training chain (bpe3/bpe4 oracles): the
    * word-frequency state as symbol LISTS, then per merge step j —
    * pair counts (pj), deterministic best (bj), fold rewrite (sj). The
    * list_reduce fold is the same LTR non-overlapping pass as
    * Bpe.mergePass (see its doc for the equivalence argument). bj is
    * LEFT JOINed so an exhausted chain (no pairs left) leaves the state
    * unchanged instead of emptying it — mirroring the Scala loop's early
    * stop.
    */
  private def bpeChainCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""wf AS (SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split($normSql, ' ')) AS w FROM documents)
      WHERE length(w) >= 2 GROUP BY w),
    s0 AS (SELECT list_transform(range(1, length(w) + 1),
        i -> w[CAST(i AS INTEGER)]) AS syms, freq FROM wf)""")
    for (j <- 1 to nMerges) {
      val prev = s"s${j - 1}"
      sb.append(s""",
    p$j AS (SELECT syms[CAST(i AS INTEGER)] AS l,
        syms[CAST(i + 1 AS INTEGER)] AS r, SUM(freq) AS n
      FROM $prev, UNNEST(range(1, len(syms))) t(i) GROUP BY 1, 2),
    b$j AS (SELECT l, r, n FROM p$j ORDER BY n DESC, l, r LIMIT 1),
    s$j AS (SELECT CASE WHEN b.l IS NULL THEN syms ELSE
        list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
            THEN acc[:-2] || [b.l || b.r] ELSE acc || x END) END AS syms, freq
      FROM $prev LEFT JOIN b$j b ON TRUE)""")
    }
    sb.toString
  }

  private def bpeTrainOracle(nMerges: Int): String = {
    val union = (1 to nMerges).map(j =>
      s"SELECT CAST($j AS BIGINT) AS step, l, r, CAST(n AS BIGINT) AS n FROM b$j")
      .mkString("\n      UNION ALL ")
    s"""WITH ${bpeChainCtes(nMerges)}
    SELECT step, l, r, n FROM ($union) ORDER BY step"""
  }

  private def bpeEncodeOracle(nMerges: Int): String = {
    val encodeChain = (1 to nMerges).map { j =>
      s"""e$j AS (SELECT w, CASE WHEN b.l IS NULL THEN syms ELSE
        list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
            THEN acc[:-2] || [b.l || b.r] ELSE acc || x END) END AS syms
      FROM e${j - 1} LEFT JOIN b$j b ON TRUE)"""
    }.mkString(",\n    ")
    s"""WITH ${bpeChainCtes(nMerges)},
    dw AS (SELECT doc_id, w FROM (SELECT doc_id,
        unnest(string_split($normSql, ' ')) AS w FROM documents)
      WHERE length(w) >= 1),
    e0 AS (SELECT w, list_transform(range(1, length(w) + 1),
        i -> w[CAST(i AS INTEGER)]) AS syms FROM (SELECT DISTINCT w FROM dw)),
    $encodeChain,
    tok AS (SELECT w, len(syms) AS n_tok FROM e$nMerges)
    SELECT d.doc_id, COUNT(*) AS n_words, CAST(SUM(t.n_tok) AS BIGINT) AS n_tokens,
      CAST(SUM(t.n_tok) * 1000 // COUNT(*) AS BIGINT) AS fertility_permille
    FROM dw d JOIN tok t ON t.w = d.w
    GROUP BY 1 ORDER BY doc_id"""
  }

  val all: Map[String, Q] = Map(

    // ───── deduplication ─────

    "d1_exact_dedup" -> Q(
      (s, d) => TextDedup.exactDedup(Tables.documents(s, d))
        .orderBy(col("content_hash")),
      Some(s"""SELECT md5($normSql) AS content_hash, COUNT(*) AS n_docs,
        MIN(doc_id) AS canonical_id
        FROM documents GROUP BY 1 ORDER BY content_hash"""),
      "exact dedup via content-hash groupBy; one shuffle on the hash"),

    "d2_ngram_jaccard" -> Q(
      (s, d) => TextDedup.jaccardPairs(Tables.documents(s, d), n = 3, minJaccard = 0.8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS jac_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
        ORDER BY id_a, id_b"""),
      "exact 3-gram Jaccard near-dup pairs — correctness baseline for MinHash"),

    // d2's pairs are not yet a dedup DECISION: similarity chains (A≈B≈C)
    // must collapse to one canonical doc, i.e. connected components of the
    // pair graph labeled by min doc id. Spark side: min-label propagation
    // (join+agg per round, O(diameter) rounds); oracle: transitive closure
    // via recursive CTE over the identical pair set.
    "d7_dedup_clusters" -> Q(
      (s, d) => TextDedup.connectedComponents(
          TextDedup.jaccardPairs(Tables.documents(s, d), n = 3, minJaccard = 0.8))
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
        SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach
        GROUP BY u ORDER BY doc_id"""),
      "near-dup clusters: connected components of the pair graph, min-id canonical"),

    // The reference's W1 priority dedup (DISTINCT ON ... ORDER BY origin)
    // generalized to NEAR-dup clusters: within each connected component
    // keep the doc from the lexicographically-first source (doc_id
    // tiebreak), unclustered docs are their own cluster. The window
    // partitions by cluster — component-sized, never corpus-sized.
    "d9_priority_keep" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = TextDedup.connectedComponents(
          TextDedup.jaccardPairs(docs, n = 3, minJaccard = 0.8))
        val labeled = docs.select(col("doc_id"), col("source"))
          .join(clusters, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("source"), col("doc_id"))
        labeled.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
        lab AS (SELECT d.doc_id, d.source,
            COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        keep AS (SELECT doc_id, source, ROW_NUMBER() OVER
            (PARTITION BY cluster_id ORDER BY source, doc_id) AS rk
          FROM lab)
        SELECT source, COUNT(*) AS n_kept FROM keep WHERE rk = 1
        GROUP BY source ORDER BY source"""),
      "W1 priority dedup generalized to near-dup clusters: preferred source wins"),

    // The dedup DECISION applied: drop every cluster member except its
    // canonical (minimum-id) doc, keep everything unclustered — the
    // filter step a curation pipeline actually ships. One anti-join
    // against the (tiny) non-canonical id set.
    "d8_keep_canonical" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = TextDedup.connectedComponents(
          TextDedup.jaccardPairs(docs, n = 3, minJaccard = 0.8))
        val drop = clusters.filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id"))
        docs.join(drop, Seq("doc_id"), "left_anti")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .orderBy(col("lang"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        clus AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
        SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)
        GROUP BY lang ORDER BY lang"""),
      "dedup applied: keep each cluster's min-id doc + all unclustered docs"),

    // THE 100 TB dedup cascade, composed end-to-end: LSH candidate pairs
    // (band-bucket collisions, never n²) → exact Jaccard verification of
    // candidates only (narrow array_intersect per pair) → connected
    // components → min-id cluster labels. Because verification is exact
    // and LSH recall is total on this corpus (fixed seeds ⇒
    // deterministic), the cluster set EQUALS d7's — so the scale path
    // gets the same recursive-CTE transitive-closure oracle as the exact
    // baseline. PipelineOpsSpec additionally pins d10 == d7 cluster-set
    // equality through the DataFrame API.
    "d10_lsh_clusters" -> Q(
      (s, d) => TextDedup.connectedComponents(
          TextDedup.lshVerifiedPairs(Tables.documents(s, d), n = 3, minJaccard = 0.8))
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
        SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach
        GROUP BY u ORDER BY doc_id"""),
      "scale-path dedup cascade: LSH candidates -> exact verify -> clusters"),

    // Prefix-filtering set-similarity join (PPJoin candidate scheme):
    // the GUARANTEED-recall scale path — any pair with Jaccard ≥ t must
    // share a token in its rarest-first prefix, so unlike LSH the recall
    // is a theorem, not a probability. Exact verification of the
    // (token-rarity-bounded) candidates makes the output EQUAL d2's, so
    // it shares d2's oracle; PipelineOpsSpec pins the equality through
    // the DataFrame API.
    "d11_prefix_pairs" -> Q(
      (s, d) => TextDedup.prefixFilterPairs(Tables.documents(s, d), n = 3, minJaccard = 0.8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS jac_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
        ORDER BY id_a, id_b"""),
      "prefix-filtered similarity join — guaranteed-recall near-dup pairs"),

    // INCREMENTAL dedup for a growing corpus: the even-id docs play the
    // existing corpus, the odd-id docs a new batch. Candidates touch only
    // new×new and new×old (the existing corpus never self-joins again —
    // the property that makes continuous curation affordable at 100 TB);
    // lex-order prefixes are per-doc so exposure is stable under growth,
    // recall stays a theorem, and exact verification makes the output
    // relational: exactly the qualifying pairs with ≥1 odd member.
    "d12_incremental_pairs" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextDedup.prefixFilterPairsIncremental(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1),
            n = 3, minJaccard = 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS jac_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
          AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""),
      "incremental near-dup pairs: new batch vs corpus, old docs never re-join"),

    // INCREMENTAL dedup, cluster stage: the even-id docs are the existing
    // corpus whose labels are SERVED FROM STORED STATE (ensureClusters —
    // built once per corpus, read thereafter: the table a deployment
    // keeps between batches, exactly what `dedup --incremental` and
    // Streams.dedupStream maintain); the odd-id batch arrives, the pair
    // DELTA is SERVED FROM THE PERSISTED PREFIX INDEX (DedupIndexStore
    // — the same stored fabric d23 serves; batch-sized work, the corpus
    // is never re-shingled per batch), and ccIncremental merges it by
    // contracting old clusters to their canonical supernode — CC runs on
    // a delta-sized reduced graph, never over the full historical pair
    // set. Index-served delta pairs EQUAL the from-scratch incremental
    // join (frozen-order recall + exact verification), so the composed
    // labels provably equal a from-scratch CC over the whole corpus and
    // d13 shares d7's recursive-CTE transitive-closure oracle;
    // PipelineOpsSpec pins incremental == batch through the DataFrame API
    // (and the from-scratch one-query composition) as well.
    "d13_incremental_clusters" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val existing = docs.filter(col("doc_id") % 2 === 0)
        val incoming = docs.filter(col("doc_id") % 2 === 1)
        val prev = TextDedup.ensureClusters(s, d, existing,
          n = 3, minJaccard = 0.8, tag = "even")
        val idx = graft.operators.DedupIndexStore.ensure(s, d, existing,
          n = 3, tJac = 0.8, tCont = 0.8)
        TextDedup.ccIncremental(prev,
            graft.operators.DedupIndexStore.pairsIncremental(idx, incoming,
              n = 3, minJaccard = 0.8))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
        SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach
        GROUP BY u ORDER BY doc_id"""),
      "incremental clusters: delta pairs merged into existing labels, CC on the contraction"),

    // Exact-substring (span-level) duplication: the signal used to strip
    // boilerplate spans a whole-doc dedup can't see. Position-level
    // 8-token windows, corpus-wide multiplicity, per-doc duplicated
    // fraction — gram-keyed shuffles only, fully SQL-mirrorable.
    "d14_duplicated_spans" -> Q(
      (s, d) => TextDedup.duplicatedSpans(Tables.documents(s, d), n = 8)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        pos AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
          FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i) WHERE len(w) >= 8),
        f AS (SELECT g, COUNT(*) AS cnt FROM pos GROUP BY g)
        SELECT doc_id, COUNT(*) AS n_windows,
          CAST(COALESCE(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_windows,
          CAST(FLOOR(CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
            * 1000 / COUNT(*)) AS BIGINT) AS dup_permille
        FROM pos JOIN f USING (g)
        GROUP BY doc_id ORDER BY doc_id"""),
      "span-level exact-substring duplication: per-doc duplicated-window permille"),

    // INCREMENTAL span duplication: the quality signal where an arriving
    // batch retroactively changes OLD docs (a unique span becomes
    // duplicated when a new doc repeats it). Even docs = existing state
    // (postings/freq/stats tables a deployment stores), odd docs = the
    // batch; only crossing grams (prev cnt == 1, re-mentioned) touch the
    // stored postings, via one semi-join. Composed output must equal the
    // one-shot d14 over the full corpus — so it shares d14's oracle.
    "d15_incremental_spans" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val existing = docs.filter(col("doc_id") % 2 === 0)
        val incoming = docs.filter(col("doc_id") % 2 === 1)
        val prevPostings = TextDedup.spanPostings(existing, n = 8)
        val prevFreq = prevPostings.groupBy(col("g")).agg(sum(col("k")).as("cnt"))
        val prevStats = TextDedup.duplicatedSpans(existing, n = 8)
        TextDedup.duplicatedSpansIncremental(
            prevPostings, prevFreq, prevStats, incoming, n = 8)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        pos AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
          FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i) WHERE len(w) >= 8),
        f AS (SELECT g, COUNT(*) AS cnt FROM pos GROUP BY g)
        SELECT doc_id, COUNT(*) AS n_windows,
          CAST(COALESCE(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_windows,
          CAST(FLOOR(CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
            * 1000 / COUNT(*)) AS BIGINT) AS dup_permille
        FROM pos JOIN f USING (g)
        GROUP BY doc_id ORDER BY doc_id"""),
      "incremental span duplication: crossing grams retro-update old docs"),

    // Exact-substring REMOVAL (the action on d14's signal): strip every
    // token covered by a corpus-duplicated 8-token window, rebuild the
    // doc in original order. The rebuilt text is pinned byte-exactly
    // through its md5 — both engines rebuild independently and must
    // agree on every surviving byte.
    "d16_span_scrub" -> Q(
      (s, d) => TextDedup.scrubDuplicatedSpans(Tables.documents(s, d), n = 8)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        wins AS (SELECT doc_id, i AS start, array_to_string(w[i:i+7], ' ') AS g
          FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i) WHERE len(w) >= 8),
        dup AS (SELECT g FROM wins GROUP BY g HAVING COUNT(*) >= 2),
        cov AS (SELECT DISTINCT w.doc_id, w.start + j AS p
          FROM wins w JOIN dup USING (g), UNNEST(range(0, 8)) AS t2(j)),
        tk AS (SELECT doc_id, i AS p, w[i] AS tok
          FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)),
        kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
          WHERE NOT EXISTS (SELECT 1 FROM cov
            WHERE cov.doc_id = tk.doc_id AND cov.p = tk.p)),
        reb AS (SELECT doc_id, COUNT(*) AS n_kept,
            string_agg(tok, ' ' ORDER BY p) AS clean
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
          CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
          md5(COALESCE(r.clean, '')) AS clean_hash
        FROM toks t LEFT JOIN reb r USING (doc_id)
        ORDER BY t.doc_id"""),
      "exact-substring removal: duplicated windows stripped, rebuilt text md5-pinned"),

    // Exact-substring dedup via DISTRIBUTED SUFFIX GROUPING (Lee et al.
    // 2022): per token position, the MAXIMAL duplicated-substring length
    // (capped at 32 tokens), from one global suffix sort + neighbor-LCP
    // scan — never per-length re-aggregation, never n² pairs. Positions
    // with match_len >= 8 are EXACTLY d14's duplicated-window starts
    // (SuffixSpec pins the superset/equality relation); the lengths are
    // what the fixed windows can't see. Oracle replays the suffix sort
    // with window lag/lead + list-LCP — the neighbor-max property makes
    // the result independent of each engine's tie order.
    "d25_suffix_spans" -> Q(
      (s, d) => graft.operators.SuffixDedup.maxMatchSpans(
          Tables.documents(s, d), minLen = 8, maxLen = 32)
        .orderBy(col("doc_id"), col("p")),
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        suf AS (SELECT doc_id, p, w[p:least(p + 31, len(w))] AS key
          FROM toks, UNNEST(range(1, len(w) + 1)) AS t(p)),
        ord AS (SELECT doc_id, p, key,
            lag(key) OVER (ORDER BY key) AS pk,
            lead(key) OVER (ORDER BY key) AS nk
          FROM suf),
        l AS (SELECT doc_id, p, GREATEST(
            COALESCE(CASE WHEN pk IS NULL THEN 0 ELSE
              COALESCE(NULLIF(list_position(list_transform(
                range(1, least(len(key), len(pk)) + 1), i -> key[i] = pk[i]),
                false), 0) - 1, least(len(key), len(pk))) END, 0),
            COALESCE(CASE WHEN nk IS NULL THEN 0 ELSE
              COALESCE(NULLIF(list_position(list_transform(
                range(1, least(len(key), len(nk)) + 1), i -> key[i] = nk[i]),
                false), 0) - 1, least(len(key), len(nk))) END, 0)
          ) AS match_len FROM ord)
        SELECT doc_id, p, CAST(match_len AS BIGINT) AS match_len
        FROM l WHERE match_len >= 8 ORDER BY doc_id, p"""),
      "suffix-grouped exact-substring dedup: maximal duplicated span lengths"),

    // d25 SERVED INCREMENTALLY from persisted suffix-key state (even ids
    // = indexed corpus, odd ids = arriving batch, the d13/d23 split
    // convention): the batch's maximal duplicated-span lengths vs
    // (corpus ∪ batch), with the corpus-sized suffix re-sort replaced by
    // a prefix-bucketed stored table — only corpus suffixes sharing a
    // batch minLen-prefix ever leave the scan (equality on the first
    // minLen tokens has trivially guaranteed recall for matches ≥
    // minLen). Oracle = d25's over ALL docs, restricted to batch ids:
    // served == batch-restricted recompute, exactly.
    "d26_indexed_suffix_spans" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.SuffixIndexStore.ensure(s, d,
          docs.filter(col("doc_id") % 2 === 0), minLen = 8, maxLen = 32)
        graft.operators.SuffixIndexStore.servedSpans(idx,
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"), col("p"))
      },
      Some(d26OracleSql),
      "suffix-span dedup served from prefix-bucketed stored state — batch-shaped work"),

    // d26 served from a MERGED two-shard suffix store (the d30 protocol
    // for the substring family): shards of the even corpus build
    // independently at the same caps, fold at the cap intersection, and
    // the odd batch serves from the merged store exactly as from the
    // single build — so it shares d26's oracle verbatim (merged == fresh
    // build pinned table-and-serve in SuffixSpec).
    "d31_merged_suffix_spans" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.SuffixIndexStore.ensureMerged(s, d,
          Seq(docs.filter(col("doc_id") % 4 === 0),
            docs.filter(col("doc_id") % 4 === 2)),
          minLen = 8, maxLen = 32)
        graft.operators.SuffixIndexStore.servedSpans(idx,
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"), col("p"))
      },
      Some(d26OracleSql),
      "suffix-span serve from a two-shard merged store — distributed build, same spans"),

    // The ACTION on d26's signal: scrub the arriving batch's duplicated
    // substrings against the indexed corpus and rebuild its text,
    // md5-pinned — "clean the incoming batch" as a deployment verb (the
    // corpus is already scrubbed and is never rewritten). Covered
    // positions from maximal spans provably coincide with d16's
    // duplicated-window cover at n = minLen, so the oracle is d16's
    // scrub SQL over ALL docs restricted to batch ids.
    "d27_indexed_scrub" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.SuffixIndexStore.ensure(s, d,
          docs.filter(col("doc_id") % 2 === 0), minLen = 8, maxLen = 32)
        graft.operators.SuffixIndexStore.scrubServed(idx,
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        wins AS (SELECT doc_id, i AS start, array_to_string(w[i:i+7], ' ') AS g
          FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i) WHERE len(w) >= 8),
        dup AS (SELECT g FROM wins GROUP BY g HAVING COUNT(*) >= 2),
        cov AS (SELECT DISTINCT w.doc_id, w.start + j AS p
          FROM wins w JOIN dup USING (g), UNNEST(range(0, 8)) AS t2(j)),
        tk AS (SELECT doc_id, i AS p, w[i] AS tok
          FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)),
        kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
          WHERE NOT EXISTS (SELECT 1 FROM cov
            WHERE cov.doc_id = tk.doc_id AND cov.p = tk.p)),
        reb AS (SELECT doc_id, COUNT(*) AS n_kept,
            string_agg(tok, ' ' ORDER BY p) AS clean
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
          CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
          md5(COALESCE(r.clean, '')) AS clean_hash
        FROM toks t LEFT JOIN reb r USING (doc_id)
        WHERE t.doc_id % 2 = 1
        ORDER BY t.doc_id"""),
      "indexed scrub: arriving batch rebuilt with corpus-duplicated substrings stripped"),

    // ASYMMETRIC containment C(A→B) = |A∩B|/|A|: the quote/excerpt
    // detector — a short doc embedded in a long one has near-zero
    // Jaccard (union is long-doc-sized) but containment ≈ 1. Candidates
    // come from A-side prefix filtering (pigeonhole: recall guaranteed)
    // against B's full postings; exact verification makes the output
    // relational, so it shares d2's CTE skeleton with the one-sided
    // denominator.
    "d17_containment_pairs" -> Q(
      (s, d) => TextDedup.containmentPairs(Tables.documents(s, d), n = 3, minContainment = 0.8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / ca.n) AS BIGINT) AS cont_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a
        WHERE CAST(c AS DOUBLE) / ca.n >= 0.8
        ORDER BY id_a, id_b"""),
      "containment join: docs ≥80% inside another doc — excerpt redundancy"),

    // Bloom-prefiltered INCREMENTAL exact dedup (even ids = stored
    // corpus, odd ids = arriving batch, the d12 split convention): the
    // corpus is summarized once into a KB-scale bloom filter; batch
    // hashes probe it with native might_contain — negatives are
    // provably new and never touch the corpus, positives (true dups +
    // bounded false positives) anti-join stored hashes for exact
    // verification. Output = exactly the genuinely-new contents.
    "d18_bloom_dedup" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextDedup.incrementalExactDedup(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("content_hash"))
      },
      Some(s"""WITH ex AS (SELECT DISTINCT md5($normSql) AS content_hash
          FROM documents WHERE doc_id % 2 = 0),
        inc AS (SELECT md5($normSql) AS content_hash, COUNT(*) AS n_docs,
            MIN(doc_id) AS canonical_id
          FROM documents WHERE doc_id % 2 = 1 GROUP BY 1)
        SELECT content_hash, n_docs, canonical_id FROM inc
        WHERE content_hash NOT IN (SELECT content_hash FROM ex)
        ORDER BY content_hash"""),
      "bloom-prefiltered incremental exact dedup: batch probes a KB sketch of the corpus"),

    // d17's pairs turned into a curation DECISION (the d8/d9 pattern
    // applied to containment): drop docs ≥80% contained in a LARGER doc,
    // ties to the smaller id — no connected components needed, the drop
    // rule is a per-doc existential over its containers.
    "d20_containment_keep" -> Q(
      (s, d) => TextDedup.containmentKeep(Tables.documents(s, d), n = 3,
          minContainment = 0.8)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2),
        drops AS (SELECT id_a AS doc_id, COUNT(*) AS n_containers
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / ca.n >= 0.8
            AND (cb.n > ca.n OR (cb.n = ca.n AND id_b < id_a))
          GROUP BY 1)
        SELECT d.doc_id, CAST(COALESCE(dr.n_containers, 0) AS BIGINT) AS n_containers,
          CAST(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_kept
        FROM documents d LEFT JOIN drops dr ON dr.doc_id = d.doc_id
        ORDER BY d.doc_id"""),
      "containment keep decision: drop excerpts of larger docs, ties to min id"),

    // INCREMENTAL containment (even = corpus, odd = arriving batch): the
    // batch delta — every ordered qualifying pair with ≥1 new member.
    // The corpus's postings never join against themselves again; recall
    // needs no cross-batch order agreement (the containment prefix
    // bound is a per-doc pigeonhole, order is purely a cost choice).
    "d21_incremental_containment" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextDedup.containmentPairsIncremental(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1),
            n = 3, minContainment = 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / ca.n) AS BIGINT) AS cont_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a
        WHERE CAST(c AS DOUBLE) / ca.n >= 0.8
          AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""),
      "incremental containment: batch delta pairs, corpus postings never self-join"),

    // INCREMENTAL keep decisions (even = corpus whose decisions are
    // SERVED FROM STORED STATE via ensureKeep — built once per corpus,
    // read thereafter, so the timed runs measure the delta merge a
    // deployment actually pays; odd = batch): container counts are
    // abelian sums and the pair delta partitions the pair set exactly,
    // so merged decisions equal the from-scratch d20 — including old
    // docs RETRO-FLIPPED to dropped when a new, larger container
    // arrives. Shares d20's oracle.
    "d22_incremental_keep" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val existing = docs.filter(col("doc_id") % 2 === 0)
        val prev = TextDedup.ensureKeep(s, d, existing,
          n = 3, minContainment = 0.8, tag = "even")
        TextDedup.containmentKeepIncremental(prev, existing,
            docs.filter(col("doc_id") % 2 === 1),
            n = 3, minContainment = 0.8)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2),
        drops AS (SELECT id_a AS doc_id, COUNT(*) AS n_containers
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / ca.n >= 0.8
            AND (cb.n > ca.n OR (cb.n = ca.n AND id_b < id_a))
          GROUP BY 1)
        SELECT d.doc_id, CAST(COALESCE(dr.n_containers, 0) AS BIGINT) AS n_containers,
          CAST(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_kept
        FROM documents d LEFT JOIN drops dr ON dr.doc_id = d.doc_id
        ORDER BY d.doc_id"""),
      "incremental keep decisions: abelian container counts, retro-flips exact"),

    // INDEXED incremental near-dup pairs: the corpus's prefix rows,
    // postings, frozen frequencies, and shingle sets are SERVED FROM THE
    // PERSISTED DedupIndexStore (built once per corpus, read thereafter)
    // — so the per-batch plan touches NOTHING corpus-sized: no corpus
    // re-shingle, no union-frequency groupBy, no corpus-side window.
    // Same semantics as d12 (the prefix theorem needs one COMMON total
    // order — here the frozen build-time order — and exact verification
    // makes the final pairs equal), so it shares d12's oracle verbatim.
    "d23_indexed_pairs" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.DedupIndexStore.ensure(s, d,
          docs.filter(col("doc_id") % 2 === 0), n = 3, tJac = 0.8, tCont = 0.8)
        graft.operators.DedupIndexStore.pairsIncremental(idx,
            docs.filter(col("doc_id") % 2 === 1), n = 3, minJaccard = 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS jac_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
          AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""),
      "indexed incremental pairs: served from the stored prefix index, zero corpus-sized work"),

    // INDEXED incremental containment — d21's semantics served from the
    // same stored index (batch prefixes × stored∪batch postings, stored
    // containment prefixes × batch postings, verification against stored
    // sets). Shares d21's oracle verbatim.
    "d24_indexed_containment" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.DedupIndexStore.ensure(s, d,
          docs.filter(col("doc_id") % 2 === 0), n = 3, tJac = 0.8, tCont = 0.8)
        graft.operators.DedupIndexStore.containmentIncremental(idx,
            docs.filter(col("doc_id") % 2 === 1), n = 3, minContainment = 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / ca.n) AS BIGINT) AS cont_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a
        WHERE CAST(c AS DOUBLE) / ca.n >= 0.8
          AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""),
      "indexed incremental containment: served from the stored prefix index"),

    // INDEXED incremental SimHash near-dup — d4's semantics served from
    // the persisted HammingIndexStore (the same band store mm4 uses for
    // perceptual hashes, under its own ensure tag): the even-id corpus's
    // 8 band rows per doc are stored once; the odd-id batch re-bands
    // ONLY itself and joins the stored bands on (band, band_val).
    // Banding is a pure function of the hash, so there is no frozen-
    // order subtlety — output = d4's pairs restricted to pairs touching
    // the batch, which is exactly d4's oracle with the batch predicate.
    "d28_indexed_simhash" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def sig(df: org.apache.spark.sql.DataFrame) =
          TextDedup.simhash(df).select(col("doc_id"), col("simhash").as("hash64"))
        val idx = graft.operators.HammingIndexStore.ensure(s, d,
          sig(docs.filter(col("doc_id") % 2 === 0)), maxHamming = 7,
          tag = "simhash")
        graft.operators.HammingIndexStore.pairsIncremental(idx,
            sig(docs.filter(col("doc_id") % 2 === 1)))
          .select(col("id_a"), col("id_b"),
            col("hamming").cast(LongType).as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(d28OracleSql),
      "indexed SimHash near-dup: batch bands vs the persisted band table"),

    // d28 served from a MERGED two-shard band store (the d30 protocol
    // for the sketch family): banding is a pure function of the hash,
    // so the merged store is row-identical to the single build
    // (DedupIndexSpec pins it) and the serve shares d28's oracle
    // verbatim.
    "d32_merged_simhash" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def sig(df: org.apache.spark.sql.DataFrame) =
          TextDedup.simhash(df).select(col("doc_id"), col("simhash").as("hash64"))
        val idx = graft.operators.HammingIndexStore.ensureMerged(s, d,
          Seq(sig(docs.filter(col("doc_id") % 4 === 0)),
            sig(docs.filter(col("doc_id") % 4 === 2))),
          maxHamming = 7, tag = "simhash")
        graft.operators.HammingIndexStore.pairsIncremental(idx,
            sig(docs.filter(col("doc_id") % 2 === 1)))
          .select(col("id_a"), col("id_b"),
            col("hamming").cast(LongType).as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(d28OracleSql),
      "SimHash serve from a two-shard merged band store — distributed build, same pairs"),

    // INDEXED incremental b-bit MinHash — d6's semantics served from the
    // width-parameterized HammingIndexStore (16 × 32-bit bands over the
    // packed 8-long signature instead of the 64-bit face's 8 × 8-bit):
    // the even-id corpus's 16 band rows per doc are stored once; the
    // odd-id batch re-bands ONLY itself and joins the stored bands on
    // (band, band_val). Banding is a pure function of the signature —
    // no frozen-order subtlety — so output = d6's pairs restricted to
    // pairs touching the batch, which is exactly d6's oracle with the
    // batch predicate.
    "d29_indexed_bbit" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def sig(df: org.apache.spark.sql.DataFrame) =
          graft.operators.Par.fan(df).select(col("doc_id"),
            graft.functions.TextSketches.bbitMinhashSig(col("text"), 3).as("sig"))
        val idx = graft.operators.HammingIndexStore.ensureBbit(s, d,
          sig(docs.filter(col("doc_id") % 2 === 0)), minEst = 0.7, tag = "bbit")
        graft.operators.HammingIndexStore.pairsIncrementalBbit(idx,
            sig(docs.filter(col("doc_id") % 2 === 1)))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(d29OracleSql),
      "indexed b-bit MinHash: batch bands vs the persisted wide-band table"),

    // d29 served from a MERGED two-shard b-bit band store — the d32
    // pattern on the wide-band face (16 × 32-bit bands over the packed
    // signature): banding is a pure function of the signature, the
    // face-agnostic merge folds row-identically, so the serve shares
    // d29's oracle verbatim. With this, EVERY face of every persisted
    // index family has a driver-gated merged serve.
    "d34_merged_bbit" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def sig(df: org.apache.spark.sql.DataFrame) =
          graft.operators.Par.fan(df).select(col("doc_id"),
            graft.functions.TextSketches.bbitMinhashSig(col("text"), 3).as("sig"))
        val idx = graft.operators.HammingIndexStore.ensureMergedBbit(s, d,
          Seq(sig(docs.filter(col("doc_id") % 4 === 0)),
            sig(docs.filter(col("doc_id") % 4 === 2))),
          minEst = 0.7, tag = "bbit")
        graft.operators.HammingIndexStore.pairsIncrementalBbit(idx,
            sig(docs.filter(col("doc_id") % 2 === 1)))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(d29OracleSql),
      "b-bit MinHash serve from a two-shard merged band store — same pairs"),

    // MERGED shard indexes — the distributed-build protocol end-to-end:
    // the even-id corpus is sharded (doc_id % 4 = 0 vs = 2), each shard
    // builds its OWN DedupIndexStore independently (the 100 TB shape:
    // per-source/per-date builds with no cross-shard shuffle), and one
    // merge pass folds them — sets union + a full re-rank of the prefix
    // order under the merged frequencies (the refreeze derivation), so
    // the merged index == a fresh build over the whole even corpus, and
    // the common-total-order premise of the prefix recall theorem holds
    // across shard boundaries by construction. The odd-id batch then
    // serves from the merged index exactly as d23 does from the
    // single-build one — same semantics, so it shares d23's oracle
    // verbatim (merged == fresh build is ALSO pinned table-by-table in
    // DedupIndexSpec; this query pins the end-to-end serve against the
    // independent DuckDB recompute).
    "d30_merged_index_pairs" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.DedupIndexStore.ensureMerged(s, d,
          Seq(docs.filter(col("doc_id") % 4 === 0),
            docs.filter(col("doc_id") % 4 === 2)),
          n = 3, tJac = 0.8, tCont = 0.8)
        graft.operators.DedupIndexStore.pairsIncremental(idx,
            docs.filter(col("doc_id") % 2 === 1), n = 3, minJaccard = 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS jac_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
          AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""),
      "shard-built indexes merged (refreeze-derived order), served like d23"),

    // RETRACTION (takedown) under the oracle gate: the even-id corpus is
    // indexed, then every even doc from source 'src0' is FORGOTTEN
    // (licensing/contamination takedown — the verb a deployment needs
    // the day a source must leave the corpus), and the odd batch serves
    // from the retracted index. `retract` anti-joins the stored `sets`
    // and re-derives postings/freq/prefix orders under the remaining
    // frequencies (the refreeze derivation minus rows, no tombstones,
    // no corpus re-read), so the serve equals d23's with the retracted
    // docs excluded — which is exactly the oracle: d23's SQL with the
    // (even ∧ src0) documents removed from the corpus CTE.
    "d33_retracted_pairs" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val even = docs.filter(col("doc_id") % 2 === 0)
        val idx = graft.operators.DedupIndexStore.ensureRetracted(s, d,
          even, even.filter(col("source") === "src0").select(col("doc_id")),
          n = 3, tJac = 0.8, tCont = 0.8)
        graft.operators.DedupIndexStore.pairsIncremental(idx,
            docs.filter(col("doc_id") % 2 === 1), n = 3, minJaccard = 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE NOT (doc_id % 2 = 0 AND source = 'src0')),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(FLOOR(CAST(c AS DOUBLE) * 1000000 / (ca.n + cb.n - c)) AS BIGINT) AS jac_micro
        FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8
          AND (id_a % 2 = 1 OR id_b % 2 = 1)
        ORDER BY id_a, id_b"""),
      "takedown serve: retracted source forgotten, pairs == fresh build without it"),

    // Duplication REPORT: the cluster-size histogram (how much of the
    // corpus is duplication mass, and in what shapes — many pairs vs a
    // few giant boilerplate clusters drive different curation choices).
    // Singleton docs (in no near-dup pair) are counted as size-1
    // clusters so the histogram sums to the corpus size. A report reads
    // the STORED cluster labels (ensureClusters — build once per
    // corpus, read thereafter), so its timed cost is the aggregation a
    // deployment actually pays.
    "d19_cluster_histogram" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = TextDedup.ensureClusters(s, d, docs,
          n = 3, minJaccard = 0.8, tag = "full")
        val sizes = clusters.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
        val nClustered = clusters.agg(count(lit(1)).as("n")).
          select(col("n"))
        val singles = docs.agg(count(lit(1)).as("total"))
          .crossJoin(broadcast(nClustered))
          .select(lit(1L).as("cluster_size"),
            (col("total") - col("n")).as("n_clusters"))
        sizes.unionByName(singles)
          .groupBy(col("cluster_size"))
          .agg(sum(col("n_clusters")).as("n_clusters"))
          .orderBy(col("cluster_size"))
      },
      Some("""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b
          FROM common JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.8),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        lab AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
        sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1),
        hist AS (SELECT cluster_size, COUNT(*) AS n_clusters FROM sz GROUP BY 1
          UNION ALL
          SELECT 1 AS cluster_size,
            (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM lab) AS n_clusters)
        SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
        FROM hist GROUP BY 1 ORDER BY cluster_size"""),
      "dedup report: cluster-size histogram incl. singletons — duplication mass by shape"),

    // MinHash+LSH / SimHash signatures are md5-derived (TextHash: h1/h2 =
    // the two 64-bit halves of md5(s), component p = (h1 + p·h2) mod 2^63
    // — Kirsch–Mitzenmacher), so DuckDB replays the ENTIRE signature +
    // banding + agreement computation from its own md5() in HUGEINT
    // arithmetic and the family is hash-green, not rows-only. Band
    // collision is rendered as equality of the underlying component
    // tuple — identical to Spark's xxhash64 bucket up to 64-bit hash
    // collisions (none on any tested corpus; a collision could only ADD
    // a candidate, and est/hamming filters judge candidates exactly).
    "d3_minhash_lsh" -> Q(
      (s, d) => TextDedup.minhashPairs(Tables.documents(s, d), n = 3, minEst = 0.7)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        hv AS (SELECT doc_id,
            CAST(CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) AS HUGEINT) AS h1,
            CAST(CAST(concat('0x', substr(md5(s), 17, 16)) AS UBIGINT) AS HUGEINT) AS h2
          FROM sh),
        comp AS (SELECT doc_id, p,
            MIN(CAST((h1 + p * h2) % 9223372036854775808 AS BIGINT)) AS v
          FROM hv, UNNEST(range(0, 64)) AS t(p) GROUP BY doc_id, p),
        band AS (SELECT doc_id, p // 4 AS bd,
            string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS bkey
          FROM comp GROUP BY doc_id, p // 4),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM band a JOIN band b
            ON a.bd = b.bd AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        agree AS (SELECT c.id_a, c.id_b,
            SUM(CASE WHEN ca.v = cb.v THEN 1 ELSE 0 END) AS n_agree
          FROM cand c JOIN comp ca ON ca.doc_id = c.id_a
            JOIN comp cb ON cb.doc_id = c.id_b AND cb.p = ca.p
          GROUP BY 1, 2)
        SELECT id_a, id_b, CAST(n_agree * 1000000 // 64 AS BIGINT) AS est_micro
        FROM agree WHERE n_agree >= 45 ORDER BY id_a, id_b"""),
      "MinHash(64)+LSH(16×4) near-dup candidates — the 100 TB dedup path"),

    "d6_bbit_minhash" -> Q(
      (s, d) => TextDedup.bbitMinhashPairs(Tables.documents(s, d), n = 3, minEst = 0.7)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        hv AS (SELECT doc_id,
            CAST(CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT) AS HUGEINT) AS h1,
            CAST(CAST(concat('0x', substr(md5(s), 17, 16)) AS UBIGINT) AS HUGEINT) AS h2
          FROM sh),
        comp AS (SELECT doc_id, p,
            MIN(CAST((h1 + p * h2) % 9223372036854775808 AS BIGINT)) AS v
          FROM hv, UNNEST(range(0, 64)) AS t(p) GROUP BY doc_id, p),
        byt AS (SELECT doc_id, p, v % 256 AS y FROM comp),
        band AS (SELECT doc_id, p // 4 AS bd,
            SUM(y * (CASE p % 4 WHEN 0 THEN 1 WHEN 1 THEN 256
              WHEN 2 THEN 65536 ELSE 16777216 END)) AS bval
          FROM byt GROUP BY doc_id, p // 4),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM band a JOIN band b
            ON a.bd = b.bd AND a.bval = b.bval AND a.doc_id < b.doc_id),
        agree AS (SELECT c.id_a, c.id_b,
            SUM(CASE WHEN ya.y = yb.y THEN 1 ELSE 0 END) AS n_agree
          FROM cand c JOIN byt ya ON ya.doc_id = c.id_a
            JOIN byt yb ON yb.doc_id = c.id_b AND yb.p = ya.p
          GROUP BY 1, 2),
        est AS (SELECT id_a, id_b,
            (CAST(n_agree AS DOUBLE) / 64 - 1.0 / 256) / (1 - 1.0 / 256) AS est
          FROM agree)
        SELECT id_a, id_b, CAST(FLOOR(est * 1000000) AS BIGINT) AS est_micro
        FROM est WHERE est >= 0.7 ORDER BY id_a, id_b"""),
      "b-bit (8-bit) MinHash near-dup candidates — signatures 8× smaller than d3"),

    "d4_simhash" -> Q(
      (s, d) => TextDedup.simhashPairs(Tables.documents(s, d), maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast(LongType).as("hamming"))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH tok AS (SELECT doc_id, t AS tok
          FROM (SELECT doc_id,
              list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                x -> len(x) > 0) AS tk
            FROM documents), UNNEST(tk) AS u(t)),
        th AS (SELECT doc_id,
            CAST(CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS HUGEINT) AS h
          FROM tok),
        bits AS (SELECT doc_id, b,
            SUM(CASE WHEN (h >> CAST(b AS INTEGER)) % 2 = 1 THEN 1 ELSE -1 END) AS cnt
          FROM th, UNNEST(range(0, 64)) AS t(b) GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
            CAST(SUM(CASE WHEN cnt > 0 AND b < 63 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
              WHEN cnt > 0 AND b = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
              ELSE 0 END) AS BIGINT) AS sh
          FROM bits GROUP BY doc_id),
        sig2 AS (SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
          FROM documents d LEFT JOIN sig s USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM sig2 a JOIN sig2 b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 7
        ORDER BY id_a, id_b"""),
      "SimHash-64 near-dup pairs via 8-bit band join + popcount (exact ≤ 7)"),

    "d5_embedding_neardup" -> Q(
      (s, d) => Similarity.cosineNearDupPairs(Tables.embeddings(s, d), minCos = 0.4)
        .orderBy(col("id_a"), col("id_b")),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        CAST(CAST(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS DECIMAL(18,6)) AS DOUBLE) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        ORDER BY id_a, id_b"""),
      "embedding-cosine near-dup pairs (exact baseline; ann2 is the scale path)"),

    // SemDeDup-style semantic dedup: cells (nearest decimal-exact label
    // centroid) bound the pair search, so the quadratic never happens
    // corpus-wide; within-cell cosine pairs collapse through connected
    // components to a min-id canonical. Composes emb2's centroid parity
    // + d5's cosine parity + d7's recursive-CTE closure — the whole
    // decision (cell, cluster, keep flag) is hash-checked end to end.
    // Serves from the PERSISTED cluster state (ensureSemanticClusters —
    // the ann4/ann5 doctrine): the iterative CC closure builds once per
    // corpus; each invocation pays assignment + one label join
    // (stored == inline pinned in PipelineOpsSpec).
    "sem1_semantic_dedup" -> Q(
      (s, d) => Similarity.semanticDedupServed(s, d, Tables.embeddings(s, d),
          minCos = 0.3)
        .orderBy(col("vec_id")),
      Some("""WITH RECURSIVE emb AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        cent AS (SELECT label AS cell, list(c_val ORDER BY dim) AS cent FROM (
            SELECT label, i AS dim,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
            FROM emb, UNNEST(range(1, 65)) AS t(i)
            GROUP BY label, i) GROUP BY label),
        assigned AS (SELECT vec_id, cell, emb FROM (
            SELECT e.vec_id, c.cell, e.emb,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.emb, c.cent) DESC, c.cell) AS rn
            FROM emb e, cent c) WHERE rn = 1),
        pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        cl AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
        SELECT a.vec_id, a.cell,
          COALESCE(cl.cluster_id, a.vec_id) AS cluster_id,
          CAST(CASE WHEN COALESCE(cl.cluster_id, a.vec_id) = a.vec_id
            THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM assigned a LEFT JOIN cl USING (vec_id)
        ORDER BY a.vec_id"""),
      "SemDeDup: cell-bounded cosine near-dup clusters, min-id canonical keep"),

    // INCREMENTAL semantic dedup: centroids trained on the EXISTING
    // (even-id) corpus and FROZEN — the add-after-train doctrine of the
    // ANN index stores applied to SemDeDup. The odd-id batch assigns
    // into frozen cells; only new×new + new×existing pairs are scored;
    // ccIncremental merges the delta into the existing labels. Old ∪
    // delta pairs = all within-cell pairs under frozen cells, so the
    // composition equals a one-shot closure with existing-corpus
    // centroids — which this oracle replays (centroid CTE over even ids).
    "sem2_incremental_semdedup" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val existing = emb.filter(col("vec_id") % 2 === 0)
        val incoming = emb.filter(col("vec_id") % 2 === 1)
        // existing-corpus centroids, cell rows AND labels all served from
        // STORED state (built once per corpus, read thereafter) — the
        // bench measures what a deployment pays per batch: batch-only
        // assignment + delta pairs + label merge; the existing corpus is
        // never retrained or re-assigned
        val st = Similarity.ensureSemanticState(s, d, existing,
          minCos = 0.3, tag = "even")
        Similarity.semanticDedupMergeAssigned(Similarity.readCents(st),
            st.read("labels"), st.read("assigned"), incoming, minCos = 0.3)
          .orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE emb AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        cent AS (SELECT label AS cell, list(c_val ORDER BY dim) AS cent FROM (
            SELECT label, i AS dim,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
            FROM emb, UNNEST(range(1, 65)) AS t(i)
            WHERE vec_id % 2 = 0
            GROUP BY label, i) GROUP BY label),
        assigned AS (SELECT vec_id, cell, emb FROM (
            SELECT e.vec_id, c.cell, e.emb,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.emb, c.cent) DESC, c.cell) AS rn
            FROM emb e, cent c) WHERE rn = 1),
        pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        cl AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
        SELECT a.vec_id, a.cell,
          COALESCE(cl.cluster_id, a.vec_id) AS cluster_id,
          CAST(CASE WHEN COALESCE(cl.cluster_id, a.vec_id) = a.vec_id
            THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM assigned a LEFT JOIN cl USING (vec_id)
        ORDER BY a.vec_id"""),
      "incremental SemDeDup: frozen cells, batch-only pair delta, ccIncremental merge"),

    // RETRACTION (takedown) through the SEMANTIC-dedup state — the one
    // persisted state family the round-10 takedown verb skipped: a
    // deployment dropping a source re-derived lexical clusters correctly
    // but kept serving stale semantic labels. `semanticRetract`
    // anti-joins assigned/pairs and RE-CLOSES labels over the remaining
    // pair graph (full CC — a retracted bridge can SPLIT a cluster,
    // which the merge-only incremental closure can't express); the
    // frozen cell quantizer stays (an aggregate statistic of the
    // training corpus — the PQ/IVF frozen-artifact doctrine;
    // strict-forget = retrain). The serve equals sem1's oracle with the
    // retracted vectors excluded AFTER assignment but with centroids
    // still trained on the FULL corpus — which is exactly what this SQL
    // replays (cent CTE unrestricted, assigned CTE filtered). At sf0.01
    // the retraction re-canonicalizes 40 rows (retracted min-id
    // canonicals hand their clusters to the next member) — the gate is
    // not vacuous.
    "sem3_retracted_semdedup" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val st = Similarity.ensureRetractedSemantic(s, d, emb, minCos = 0.3,
          tag = "full", emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
        Similarity.servedClusters(st).orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE emb AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        cent AS (SELECT label AS cell, list(c_val ORDER BY dim) AS cent FROM (
            SELECT label, i AS dim,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
            FROM emb, UNNEST(range(1, 65)) AS t(i)
            GROUP BY label, i) GROUP BY label),
        assigned AS (SELECT vec_id, cell, emb FROM (
            SELECT e.vec_id, c.cell, e.emb,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.emb, c.cent) DESC, c.cell) AS rn
            FROM emb e, cent c) WHERE rn = 1 AND NOT (vec_id % 7 = 3)),
        pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        cl AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
        SELECT a.vec_id, a.cell,
          COALESCE(cl.cluster_id, a.vec_id) AS cluster_id,
          CAST(CASE WHEN COALESCE(cl.cluster_id, a.vec_id) = a.vec_id
            THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM assigned a LEFT JOIN cl USING (vec_id)
        ORDER BY a.vec_id"""),
      "semantic takedown serve: retracted vectors forgotten, labels re-closed under frozen cells"),

    // MERGE (distributed build) through the SEMANTIC-dedup state — the
    // verb that completes the family's deployment matrix (build/serve/
    // append/retract landed earlier; every lexical and vector index
    // already has all five). Protocol: the quantizer trains ONCE on the
    // union (labelCentroids is an order-exact decimal sum — one narrow
    // pass, layout-free), three vec_id%3 shards build independently
    // under the frozen cells (no cross-shard shuffle — the
    // embarrassingly-parallel half), and the fold adds the one thing no
    // shard could see: CROSS-shard within-cell qualifying pairs, still
    // cell-bounded. Shard pairs ∪ cross pairs = ALL within-cell pairs
    // over the union, so the merged state EQUALS the one-shot build —
    // which is why this query's oracle is sem1's SQL verbatim (the
    // strongest merge gate available: not "plausible rows" but the
    // single-build twin, hash-checked). Labels merge through
    // ccIncremental on the delta (a merge only ever JOINS clusters — no
    // split — so the merge-only incremental closure is exact and
    // delta-graph-sized).
    "sem4_merged_semdedup" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val shards = (0 until 3).map(i => emb.filter(col("vec_id") % 3 === i))
        val st = Similarity.ensureMergedSemantic(s, d, shards, minCos = 0.3,
          tag = "m3")
        Similarity.servedClusters(st).orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE emb AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        cent AS (SELECT label AS cell, list(c_val ORDER BY dim) AS cent FROM (
            SELECT label, i AS dim,
              CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
            FROM emb, UNNEST(range(1, 65)) AS t(i)
            GROUP BY label, i) GROUP BY label),
        assigned AS (SELECT vec_id, cell, emb FROM (
            SELECT e.vec_id, c.cell, e.emb,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY list_cosine_similarity(e.emb, c.cent) DESC, c.cell) AS rn
            FROM emb e, cent c) WHERE rn = 1),
        pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3),
        und AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(u, v) AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM und)
          UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
        cl AS (SELECT u AS vec_id, MIN(v) AS cluster_id FROM reach GROUP BY u)
        SELECT a.vec_id, a.cell,
          COALESCE(cl.cluster_id, a.vec_id) AS cluster_id,
          CAST(CASE WHEN COALESCE(cl.cluster_id, a.vec_id) = a.vec_id
            THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM assigned a LEFT JOIN cl USING (vec_id)
        ORDER BY a.vec_id"""),
      "merged SemDeDup: three frozen-cell shard states folded; equals the one-shot build"),

    // ───── similarity search ─────

    "ann1_bruteforce_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some("""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(CAST(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DECIMAL(18,6)) AS DOUBLE) AS cos
        FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id
        QUALIFY row_number() OVER (PARTITION BY q.vec_id
          ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
          c.vec_id) <= 3
        ORDER BY query_id, cos DESC, neighbor_id"""),
      "brute-force cosine top-k, query side broadcast — exact ANN baseline"),

    // FILTERED vector search (the vector-DB "metadata filter" verb):
    // top-k among candidates satisfying a relational predicate. The
    // filter applies BEFORE any distance work — it reaches the parquet
    // scan (PushedFilters), so at 100 TB the distance pass reads only
    // the qualifying stripe, and k never starves (no post-filter
    // over-fetch heuristics, which is why the exact path is the right
    // default until selectivity makes an index worth it).
    "ann7_filtered_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
            emb.filter(col("label") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some("""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(CAST(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DECIMAL(18,6)) AS DOUBLE) AS cos
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 5 AND c.vec_id != q.vec_id AND c.label < 5
        QUALIFY row_number() OVER (PARTITION BY q.vec_id
          ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
          c.vec_id) <= 3
        ORDER BY query_id, cos DESC, neighbor_id"""),
      "filtered ANN: metadata predicate below the distance pass, exact top-k"),

    "ann2_lsh_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(ann2OracleSql),
      "random-hyperplane LSH top-k (8 tables × 4 bits) — approximate scale path"),

    // ann3 serves from the persisted IVF index like ann4/ann5: first
    // invocation per corpus quantizes and writes centroids +
    // cell-assigned rows; later invocations (the bench's timed runs)
    // only read. HASH-GREEN since round 10: the coarse quantizer is the
    // decimal-exact label-centroid one (IvfIndex.fitExact — the
    // emb2/sem1 protocol), so the oracle replays centroids, cell
    // assignment, cosine probing order and in-cell rescoring
    // bit-identically; the recall@10 ≥ 0.75 gate is re-pinned on these
    // cells in PipelineOpsSpec. Stored == inline pinned there too.
    "ann3_ivf_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val idx = graft.operators.VectorIndexStore.ensureIvf(d, emb)
        graft.operators.VectorIndexStore.ivfTopK(s, idx, emb.filter(col("vec_id") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(ann3OracleSql),
      "IVF top-k: stored exact-cell quantizer + nprobe probing, exact in-cell rescoring"),

    // MERGED shard ANN index — the d30 protocol for the vector family:
    // the exact-cell quantizer trains ONCE over the shard union
    // (DECIMAL per-dim sums are order-exact, so sharding cannot move the
    // centroids), each embedding shard encodes independently against the
    // frozen artifacts (a pure projection — the 100 TB shape: no
    // cross-shard shuffle at build time), and one merge pass folds the
    // code tables after verifying the artifacts are bit-identical.
    // Because frozen-artifact encode is a projection, merged codes ==
    // the unsharded build's codes exactly, so the serve shares ann3's
    // oracle verbatim — the strongest available statement that the
    // distributed build changes NOTHING about query semantics.
    "ann8_merged_ivf_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val idx = graft.operators.VectorIndexStore.ensureMergedIvf(d,
          Seq(emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1)))
        graft.operators.VectorIndexStore.ivfTopK(s, idx, emb.filter(col("vec_id") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(ann3OracleSql),
      "IVF top-k served from a two-shard merged index — distributed build, same answers"),

    // ann4/ann5 serve from a PERSISTED index (VectorIndexStore): the
    // first invocation per corpus trains the quantizers and writes
    // codebooks/centroids/codes as parquet; every later invocation —
    // including the bench's timed runs — only reads, which is the
    // deployment cost model (training amortizes over the index lifetime,
    // not per query). Deterministic either way: training is seeded by
    // the lowest vec_ids, so stored == inline codebooks.
    // ann5 — GRADUATED with ann4: the exact-arithmetic protocol through
    // the ENTIRE IVFPQ chain — exact-Lloyd coarse quantizer (the cl1
    // trainer at k=16), rounded cell assignment, residual codebooks
    // trained on rounded-assigned sample residuals, rounded residual
    // encode (the expansion rsq − 2⟨v,cb⟩ + 2⟨c,cb⟩ + |cb|² vs the
    // oracle's explicit Σ(r−cb)² differ by ~1e-14 cancellation noise,
    // absorbed by the DECIMAL(18,6) keys), rounded nprobe probe
    // selection, coarse-corrected ADC shortlist, exact re-rank. The
    // deepest oracle in the suite: 26 chained MATERIALIZED CTE blocks.
    "ann5_ivfpq_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val idx = graft.operators.VectorIndexStore.ensureIvfPq(d, emb)
        graft.operators.VectorIndexStore.ivfPqTopK(s, idx, emb.filter(col("vec_id") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(ivfPqOracle(k = 3, refine = 32, nprobe = 4, kClusters = 16,
        coarseIters = 5, sampleSize = 10000, resIters = 8,
        m = 8, subDim = 8, kSub = 16)),
      "IVFPQ: coarse probing × in-cell residual ADC × exact re-rank — trajectory hash-checked"),

    // The PQ legs of the distributed-build fold, registered so
    // `VectorIndexStore.merge`'s flavor-agnostic PQ/IVFPQ paths sit
    // under PLANS/BENCH like every other index face (ann8 gates the IVF
    // leg on ann3's oracle). HASH-GREEN since round 12, on ann4/ann5's
    // own oracles: once the PQ family graduated via the exact-arithmetic
    // protocol (rounded-argmin Lloyd + decimal means is layout-free —
    // training on the shard UNION equals training on the unsharded
    // corpus, and frozen-artifact encode is a pure projection), the
    // merged serve answers bit-for-bit like the unsharded serve
    // (PipelineOpsSpec "PQ/IVFPQ merged shards..." pins the artifact
    // equality), so the d30/ann8 shared-oracle pattern applies: the
    // strongest available statement that the distributed build changes
    // NOTHING about query semantics.
    "ann9_merged_pq_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val idx = graft.operators.VectorIndexStore.ensureMergedPq(d,
          Seq(emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1)))
        graft.operators.VectorIndexStore.pqTopK(s, idx, emb.filter(col("vec_id") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(pqOracle(k = 3, refine = 32, sampleSize = 10000, iters = 8,
        m = 8, subDim = 8, kSub = 16)),
      "PQ top-k served from a two-shard merged index — frozen codebooks, fold == unsharded"),

    "ann10_merged_ivfpq_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val idx = graft.operators.VectorIndexStore.ensureMergedIvfPq(d,
          Seq(emb.filter(col("vec_id") % 2 === 0),
            emb.filter(col("vec_id") % 2 === 1)))
        graft.operators.VectorIndexStore.ivfPqTopK(s, idx, emb.filter(col("vec_id") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(ivfPqOracle(k = 3, refine = 32, nprobe = 4, kClusters = 16,
        coarseIters = 5, sampleSize = 10000, resIters = 8,
        m = 8, subDim = 8, kSub = 16)),
      "IVFPQ top-k served from a two-shard merged index — both artifacts frozen centrally"),

    // ann4 — GRADUATED from rows-only to hash-green: the cl1 exact-
    // arithmetic protocol applied to the whole PQ pipeline. Codebooks
    // train with rounded-argmin + decimal-mean Lloyd (PqIndex.trainOn),
    // the encode ranks the FULL rounded distance (a constant-dropped
    // |cb|²−2⟨v,cb⟩ ranking is argmin-equivalent only unrounded), and
    // both the ADC shortlist and the exact re-rank order on
    // DECIMAL(18,6) keys with id tiebreaks — so the oracle replays
    // training, encoding, scanning and ranking end to end (pqOracle:
    // 8 unrolled Lloyd iterations, all 8 subspaces on one CTE chain).
    // A Lloyd-trained quantizer under the hash gate.
    "ann4_pq_topk" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val idx = graft.operators.VectorIndexStore.ensurePq(d, emb)
        graft.operators.VectorIndexStore.pqTopK(s, idx, emb.filter(col("vec_id") < 5), k = 3)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some(pqOracle(k = 3, refine = 32, sampleSize = 10000, iters = 8,
        m = 8, subDim = 8, kSub = 16)),
      "product-quantization top-k: 4-bit×8 codes + ADC scan + exact re-rank — trajectory hash-checked"),

    // ───── sequence packing (training-batch construction) ─────
    // Pack documents into fixed token-budget training sequences by
    // chunked cumulative sum: seq_id = (running_total_before) DIV budget
    // over a deterministic doc order. The running total comes from
    // GlobalOrder.cumSum — the two-phase distributed prefix sum, NOT a
    // single-partition global window. (Greedy re-packing at boundaries
    // would need sequential state; the chunked assignment is
    // deterministic, oracle-able, and within one doc of greedy waste.)
    "t7_sequence_packing" -> Q(
      (s, d) => {
        val budget = 2048L
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(col("doc_id"),
            TextStats.wsTokenCount(col("text")).cast(LongType).as("n_tokens"))
        graft.operators.GlobalOrder.cumSum(toks, col("doc_id"), col("n_tokens"))
          .withColumn("seq_id", expr(s"(cum - n_tokens) DIV $budget"))
          .groupBy(col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("seq_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, n_tokens,
          SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        SELECT CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens, MIN(doc_id) AS first_doc
        FROM c GROUP BY 1 ORDER BY seq_id"""),
      "fixed-token-budget sequence packing via chunked cumulative sums"),

    // t7's production variant: GREEDY first-fit packing (no sequence ever
    // overflows the budget — the invariant a trainer needs). Sequential
    // walk distributed as bounded per-range flatMapGroups after the
    // two-phase prefix sum; waste vs chunked + determinism + equality to a
    // single-threaded greedy reference are asserted in PipelineOpsSpec.
    // Hash-green via the d7/w6 recursive-CTE trick: the walk is
    // deterministic integer state, so the oracle replays it per range
    // (row_number within range ordered by doc_id = the Spark sort order;
    // range_id from the identical windowed prefix sum).
    "t8_greedy_packing" -> Q(
      (s, d) => {
        val budget = 2048L
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(col("doc_id"),
            TextStats.wsTokenCount(col("text")).cast(LongType).as("n_tokens"))
        graft.operators.Packing.greedyPack(toks, budget)
          .groupBy(col("seq_range"), col("seq_in_range"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("seq_range"), col("seq_in_range"))
      },
      Some("""WITH RECURSIVE t AS (SELECT doc_id,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, n_tokens,
            SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t),
        r AS (SELECT doc_id, n_tokens,
            CAST((cum - n_tokens) // 131072 AS BIGINT) AS range_id,
            ROW_NUMBER() OVER (PARTITION BY CAST((cum - n_tokens) // 131072 AS BIGINT)
              ORDER BY doc_id) AS rn
          FROM c),
        walk(range_id, rn, doc_id, n_tokens, seq, fill) AS (
          SELECT range_id, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS seq,
            n_tokens AS fill
          FROM r WHERE rn = 1
          UNION ALL
          SELECT p.range_id, p.rn, p.doc_id, p.n_tokens,
            CASE WHEN w.fill > 0 AND w.fill + p.n_tokens > 2048
              THEN w.seq + 1 ELSE w.seq END,
            CASE WHEN w.fill > 0 AND w.fill + p.n_tokens > 2048
              THEN p.n_tokens ELSE w.fill + p.n_tokens END
          FROM walk w JOIN r p ON p.range_id = w.range_id AND p.rn = w.rn + 1)
        SELECT range_id AS seq_range, seq AS seq_in_range, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens, MIN(doc_id) AS first_doc
        FROM walk GROUP BY 1, 2 ORDER BY seq_range, seq_in_range"""),
      "greedy first-fit sequence packing — never-overflow training batches"),

    // ───── text analysis ─────

    "t1_token_stats" -> Q(
      (s, d) => graft.operators.Par.fan(Tables.documents(s, d)).select(col("doc_id"),
          TextStats.wsTokenCount(col("text")).cast(LongType).as("ws_tokens"),
          TextStats.subwordCount(col("text")).cast(LongType).as("subwords"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS subwords
        FROM documents ORDER BY doc_id"""),
      "whitespace + BPE-ish pre-tokenizer counts"),

    "t2_quality_score" -> Q(
      (s, d) => TextStats.qualityMetrics(Tables.documents(s, d))
        .select(col("doc_id"), col("n_tokens"), col("n_subwords"),
          col("punct_permille"), col("stop_permille"), col("quality_score"))
        .orderBy(col("doc_id")),
      Some(s"""WITH m AS (
          SELECT doc_id,
            CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
            CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords,
            CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
            length(text) AS n_chars2,
            string_split($normSql, ' ') AS toks
          FROM documents),
        r AS (
          SELECT doc_id, n_tokens, n_subwords,
            CASE WHEN n_chars2 > 0
              THEN CAST(FLOOR(CAST(n_punct AS DOUBLE) * 1000 / n_chars2) AS BIGINT)
              ELSE 0 END AS punct_permille,
            CASE WHEN len(toks) > 0
              THEN CAST(FLOOR(CAST(len(list_filter(toks,
                x -> list_contains(['the','a','and','of','to','in','is','on'], x))) AS DOUBLE)
                * 1000 / len(toks)) AS BIGINT)
              ELSE 0 END AS stop_permille
          FROM m)
        SELECT doc_id, n_tokens, n_subwords, punct_permille, stop_permille,
          stop_permille + LEAST(n_tokens, 100) * 10 - punct_permille AS quality_score
        FROM r ORDER BY doc_id"""),
      "doc quality metrics: integer permille ratios + composite score"),

    "t3_lang_id" -> Q(
      (s, d) => TextStats.languageId(Tables.documents(s, d))
        .select(col("doc_id"), col("pred_lang")).orderBy(col("doc_id")),
      Some(s"""WITH sc AS (SELECT doc_id, text,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['the','a','and','of','to','in','is','that','it','for'], x))) AS s_en,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['el','la','de','que','y','en','un','los','se','no'], x))) AS s_es,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['der','die','und','das','ist','nicht','von','mit','den','ein'], x))) AS s_de,
          len(list_filter(string_split($normSql, ' '),
            x -> list_contains(['le','la','et','les','des','est','un','une','du','que'], x))) AS s_fr
          FROM documents),
        g AS (SELECT *, GREATEST(s_en, s_es, s_de, s_fr) AS gm FROM sc)
        SELECT doc_id,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN gm <= 0 THEN 'und'
               WHEN s_en = gm THEN 'en' WHEN s_es = gm THEN 'es'
               WHEN s_de = gm THEN 'de' ELSE 'fr' END AS pred_lang
        FROM g ORDER BY doc_id"""),
      "stopword-profile language ID with deterministic tie-break"),

    "t4_fingerprint" -> Q(
      (s, d) => TextStats.fingerprint(Tables.documents(s, d))
        .select(col("doc_id"), col("fingerprint")).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, md5($normSql) AS fingerprint
        FROM documents ORDER BY doc_id"""),
      "normalized-content MD5 fingerprint"),

    // F4 decimal coercion at scale (ref src/transform.py:68-86): lineitem
    // prices re-rendered in four polyglot money styles (integer-cents
    // construction — exact on both engines), parsed by the REAL engine
    // path, checked against directly-computed decimals.
    "f4_decimal_parse" -> Q(
      (s, d) => {
        val li = graft.operators.Par.fan(Tables.lineitem(s, d))
          .withColumn("cents", floor(col("l_extendedprice") * 100).cast(LongType))
        val w = expr("cents DIV 100").cast(StringType)
        val f = lpad(pmod(col("cents"), lit(100L)).cast(StringType), 2, "0")
        val style = pmod(col("l_linenumber"), lit(4))
        val str = when(style === 0, concat(w, lit(","), f))
          .when(style === 1, concat(lit("$"), w, lit("."), f))
          .when(style === 2, concat(lit("("), w, lit(","), f, lit(")")))
          .otherwise(concat(lit("₽ "), w, lit(","), f))
        // materialize the string first: toDecimal references its argument
        // ~1300× through the nested helpers — an attribute read is free,
        // re-evaluating the concat/when construction is not
        li.withColumn("str", str)
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.functions.Parsers.toDecimal(col("str")).cast(DoubleType).as("parsed"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""WITH c AS (SELECT l_orderkey, l_linenumber,
          CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
          l_linenumber % 4 AS style FROM lineitem)
        SELECT l_orderkey, l_linenumber,
          CAST(CAST(CASE WHEN style = 2 THEN '-' ELSE '' END ||
            (cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0')
            AS DECIMAL(38,10)) AS DOUBLE) AS parsed
        FROM c ORDER BY l_orderkey, l_linenumber"""),
      "polyglot money parsing (F2+F3+F4) hash-checked on 600k lineitem rows"),

    // F5 int coercion (ref src/transform.py:89-105): decimal-parse then
    // truncate toward zero — includes the documented "1,234"→1 European
    // reading (style 0 strings with a 2-digit fraction).
    "f5_int_parse" -> Q(
      (s, d) => {
        val li = graft.operators.Par.fan(Tables.lineitem(s, d))
          .withColumn("cents", floor(col("l_extendedprice") * 100).cast(LongType))
        val w = expr("cents DIV 100").cast(StringType)
        val f = lpad(pmod(col("cents"), lit(100L)).cast(StringType), 2, "0")
        val style = pmod(col("l_linenumber"), lit(3))
        val str = when(style === 0, concat(w, lit(","), f)) // comma-decimal
          .when(style === 1, w)                             // plain int
          .otherwise(concat(lit("("), w, lit(")")))         // paren negative
        li.withColumn("str", str)
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.functions.Parsers.toInt(col("str")).as("parsed"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""WITH c AS (SELECT l_orderkey, l_linenumber,
          CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
          l_linenumber % 3 AS style FROM lineitem)
        SELECT l_orderkey, l_linenumber,
          CAST(CASE WHEN style = 2 THEN -(cents // 100) ELSE cents // 100 END AS INT) AS parsed
        FROM c ORDER BY l_orderkey, l_linenumber"""),
      "int coercion via decimal truncation (F5) hash-checked on lineitem"),

    // t5: corpus vocabulary — exact top-k frequent tokens (tokenizer stats
    // for training-data pipelines). Two-level agg: token counts shuffle on
    // the token, top-k via TakeOrderedAndProject.
    "t5_vocab_topk" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20),
      Some("""SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token != '' GROUP BY token ORDER BY n DESC, token LIMIT 20"""),
      "exact top-k vocabulary extraction"),

    // Count-Min Sketch estimates for the exact top-20 tokens — a
    // HASH-GREEN sketch query: the row hashes are md5-derived and the
    // counters integers, so DuckDB replays the whole sketch bit-for-bit
    // (unlike the float sketch family a7/a13, which carries error
    // gates instead of an oracle). The output pins both CMS guarantees
    // relationally: cms_n >= exact_n always, and for genuine heavy
    // hitters the two usually coincide. The sketch is <= d·w rows —
    // broadcast-sized at any corpus scale — and per-shard sketches fold
    // by counter addition (TextStats.cmsMerge, spec-pinned == unsharded).
    "t24_cms_heavy_hitters" -> Q(
      (s, d) => {
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("token")).limit(20)
        val sketch = TextStats.cmsBuild(Tables.documents(s, d))
        exact.join(TextStats.cmsEstimate(sketch, exact), Seq("token"))
          .select(col("token"), col("exact_n"), col("cms_n"))
          .orderBy(col("exact_n").desc, col("token"))
      },
      Some("""WITH t AS (SELECT token FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          WHERE token != ''),
        exact AS (SELECT token, COUNT(*) AS exact_n FROM t
          GROUP BY token ORDER BY exact_n DESC, token LIMIT 20),
        h AS (SELECT token, i AS row,
            CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || token), 1, 8))
              AS BIGINT) % 1024 AS bucket
          FROM t, UNNEST(range(0, 4)) AS r(i)),
        sk AS (SELECT row, bucket, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
        ph AS (SELECT e.token, e.exact_n, i AS row,
            CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || e.token), 1, 8))
              AS BIGINT) % 1024 AS bucket
          FROM exact e, UNNEST(range(0, 4)) AS r(i))
        SELECT p.token, p.exact_n, MIN(COALESCE(sk.cnt, 0)) AS cms_n
        FROM ph p LEFT JOIN sk ON sk.row = p.row AND sk.bucket = p.bucket
        GROUP BY p.token, p.exact_n
        ORDER BY exact_n DESC, token"""),
      "count-min sketch: integer md5-hashed counters, estimates replayed exactly by the oracle"),

    // BPE training, iteration 0: adjacent symbol pairs over the DISTINCT
    // word-frequency table (vocabulary-sized — the real trainers' shape;
    // the corpus is walked exactly once, by the wordFreq agg).
    "bpe1_pair_counts" -> Q(
      (s, d) => graft.operators.Bpe.pairCounts(Tables.documents(s, d), 40),
      Some(s"""WITH wf AS (SELECT w, COUNT(*) AS freq FROM (
            SELECT unnest(string_split($normSql, ' ')) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY w),
        p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
          FROM wf, UNNEST(range(1, length(w))) t(i))
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
        FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 40"""),
      "BPE iteration 0: corpus-weighted adjacent-pair counts over distinct words"),

    // BPE training, one merge iteration: the best pair rewrites to a
    // single symbol in every word (left-to-right non-overlapping — the
    // BPE contract) and pairs are recounted. The best pair is a 1-row
    // broadcast aggregate, not driver logic; per-iteration work is
    // vocabulary-sized. A hash match certifies count → argmax-with-
    // tie-break → rewrite → recount end-to-end.
    "bpe2_merge_step" -> Q(
      (s, d) => graft.operators.Bpe.mergeStep(Tables.documents(s, d), 40),
      Some(s"""WITH wf AS (SELECT w, COUNT(*) AS freq FROM (
            SELECT unnest(string_split($normSql, ' ')) AS w FROM documents)
          WHERE length(w) >= 2 GROUP BY w),
        p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
          FROM wf, UNNEST(range(1, length(w))) t(i)),
        pc AS (SELECT pair, SUM(freq) AS n FROM p GROUP BY pair),
        best AS (SELECT pair AS merged_pair, n AS merged_n FROM pc
          ORDER BY n DESC, pair LIMIT 1),
        rw AS (SELECT replace(w, merged_pair, '§') AS w, freq,
            merged_pair, merged_n
          FROM wf CROSS JOIN best),
        p2 AS (SELECT merged_pair, merged_n,
            substr(w, CAST(i AS INTEGER), 2) AS pair, freq
          FROM rw, UNNEST(range(1, length(w))) t(i)
          WHERE length(w) >= 2)
        SELECT merged_pair, CAST(merged_n AS BIGINT) AS merged_n, pair,
          CAST(SUM(freq) AS BIGINT) AS n
        FROM p2 GROUP BY 1, 2, 3 ORDER BY n DESC, pair LIMIT 40"""),
      "BPE merge iteration: broadcast best pair, rewrite, recount — all vocab-sized"),

    // Full BPE training loop (round 7): nMerges merges over the
    // vocabulary-sized symbol-array state (real multi-char symbols — the
    // '§' single-char trick of bpe2 doesn't iterate). The oracle replays
    // the ENTIRE loop in DuckDB as an unrolled CTE chain: per step, pair
    // counts over list state → deterministic best → list_reduce fold
    // rewrite (proven equal to LTR non-overlapping merging: a pass output
    // l||r can never re-match as l). Hash-green = both engines agree on
    // every merge decision AND every count, end to end.
    "bpe3_train_merges" -> Q(
      (s, d) => graft.operators.Bpe.trainMerges(Tables.documents(s, d), 6)
        .orderBy(col("step")),
      Some(bpeTrainOracle(6)),
      "full BPE training: 6 merges, vocab-sized state, 1-row-per-step driver data"),

    // Tokenizer APPLICATION: train 6 merges, encode the corpus, report
    // per-doc token counts + fertility (tokens per 1000 words — the
    // tokenizer-fit curation signal). Encoding cost is vocab-sized
    // (distinct words only); docs join the encoded vocab broadcast.
    "bpe4_encode_fertility" -> Q(
      (s, d) => graft.operators.Bpe.encodeFertility(Tables.documents(s, d), 6)
        .orderBy(col("doc_id")),
      Some(bpeEncodeOracle(6)),
      "BPE encode + per-doc fertility under the 6 trained merges"),

    // The SECOND tokenizer family (unigram/WordPiece-style serving
    // path): greedy longest-match encode under a count-derived piece
    // vocab. Training a unigram LM proper is EM (float-iterative →
    // would be no_oracle); the application face is deterministic —
    // top-200 substring pieces by integer occurrence weight (total-order
    // tie-break), then a left-to-right longest-match scan folded as ONE
    // codegen'd `aggregate` per DISTINCT word (corpus touched once; all
    // later stages vocabulary-sized — the Bpe.encodeVocab doctrine).
    // Output is bpe4's exact schema, giving its fertility query a
    // cross-tokenizer comparison face (TokenizerSpec pins it per
    // source). The oracle replays vocab selection, per-position longest
    // match, and the greedy scan (recursive CTE) bit for bit.
    "tok1_unigram_fertility" -> Q(
      (s, d) => graft.operators.Unigram
        .encodeFertility(Tables.documents(s, d), 200)
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE dw AS (SELECT doc_id, w FROM (SELECT doc_id,
            unnest(string_split($normSql, ' ')) AS w FROM documents)
          WHERE length(w) >= 1),
        wf AS (SELECT w, COUNT(*) AS freq FROM dw WHERE length(w) >= 2 GROUP BY w),
        pc AS (SELECT piece, SUM(freq) AS n FROM (
            SELECT substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece, freq
            FROM wf, UNNEST(range(1, length(w) + 1)) AS t(i),
              UNNEST(range(2, 5)) AS u(l)
            WHERE length(substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER))) = CAST(l AS INTEGER))
          GROUP BY piece),
        vocab AS (SELECT piece FROM pc ORDER BY n DESC, piece LIMIT 200),
        words AS (SELECT DISTINCT w FROM dw),
        m AS (SELECT c.w, c.pos, MAX(c.l) AS mlen FROM (
            SELECT wo.w, CAST(i AS INTEGER) AS pos, CAST(l AS INTEGER) AS l,
              substring(wo.w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece
            FROM words wo, UNNEST(range(1, length(wo.w) + 1)) AS t(i),
              UNNEST(range(2, 5)) AS u(l)) c
          JOIN vocab v ON v.piece = c.piece
          WHERE length(c.piece) = c.l
          GROUP BY c.w, c.pos),
        tok(w, len, pos, cnt) AS (
          SELECT w, CAST(length(w) AS INTEGER), 1, 0 FROM words
          UNION ALL
          SELECT t.w, t.len, t.pos + COALESCE(m.mlen, 1), t.cnt + 1
          FROM tok t LEFT JOIN m ON m.w = t.w AND m.pos = t.pos
          WHERE t.pos <= t.len),
        nt AS (SELECT w, cnt AS n_tok FROM tok WHERE pos > len)
        SELECT d.doc_id, COUNT(*) AS n_words, CAST(SUM(t.n_tok) AS BIGINT) AS n_tokens,
          CAST(SUM(t.n_tok) * 1000 // COUNT(*) AS BIGINT) AS fertility_permille
        FROM dw d JOIN nt t ON t.w = d.w
        GROUP BY 1 ORDER BY doc_id"""),
      "unigram-family greedy longest-match encode + per-doc fertility (top-200 piece vocab)"),

    // Unigram-family TRAINING face — hard-EM vocabulary refinement (the
    // SentencePiece prune step with the EM hardened to the greedy
    // segmenter, so the whole trainer is integer arithmetic under the
    // hash gate, not a float-iterative no_oracle): seed with the top-400
    // candidate pieces by raw count, SEGMENT the corpus under them
    // (E-step — the same greedy walk as tok1, with the fold collecting
    // consumed positions), count actual consumption weighted by word
    // frequency, keep the top-200 by usage (M-step), and encode under
    // the refined vocabulary. Long candidates cannibalize their
    // substrings' raw counts but only earn usage when the scan truly
    // picks them — the refined vocab differs from tok1's exactly where
    // raw frequency overstates utility (TokenizerSpec pins fertility ≤
    // tok1's on this corpus). The oracle replays candidate selection,
    // BOTH walks, and the usage re-rank bit for bit (two recursive CTEs).
    "tok2_unigram_hardem" -> Q(
      (s, d) => graft.operators.Unigram
        .hardEmFertility(Tables.documents(s, d), 400, 200)
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE dw AS (SELECT doc_id, w FROM (SELECT doc_id,
            unnest(string_split($normSql, ' ')) AS w FROM documents)
          WHERE length(w) >= 1),
        wf AS (SELECT w, COUNT(*) AS freq FROM dw WHERE length(w) >= 2 GROUP BY w),
        pc AS (SELECT piece, SUM(freq) AS n FROM (
            SELECT substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece, freq
            FROM wf, UNNEST(range(1, length(w) + 1)) AS t(i),
              UNNEST(range(2, 5)) AS u(l)
            WHERE length(substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER))) = CAST(l AS INTEGER))
          GROUP BY piece),
        cand AS (SELECT piece FROM pc ORDER BY n DESC, piece LIMIT 400),
        m0 AS (SELECT c.w, c.pos, MAX(c.l) AS mlen FROM (
            SELECT wo.w, CAST(i AS INTEGER) AS pos, CAST(l AS INTEGER) AS l,
              substring(wo.w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece
            FROM wf wo, UNNEST(range(1, length(wo.w) + 1)) AS t(i),
              UNNEST(range(2, 5)) AS u(l)) c
          JOIN cand v ON v.piece = c.piece
          WHERE length(c.piece) = c.l
          GROUP BY c.w, c.pos),
        walk0(w, len, pos, cpos, ml) AS (
          SELECT w, CAST(length(w) AS INTEGER), 1, CAST(NULL AS INTEGER), CAST(NULL AS INTEGER) FROM wf
          UNION ALL
          SELECT t.w, t.len, t.pos + COALESCE(m0.mlen, 1), t.pos, COALESCE(m0.mlen, 1)
          FROM walk0 t LEFT JOIN m0 ON m0.w = t.w AND m0.pos = t.pos
          WHERE t.pos <= t.len),
        use_n AS (SELECT substring(c.w, c.cpos, c.ml) AS piece, SUM(f.freq) AS u_n
          FROM walk0 c JOIN wf f ON f.w = c.w
          WHERE c.ml >= 2 GROUP BY 1),
        vocab AS (SELECT piece FROM use_n ORDER BY u_n DESC, piece LIMIT 200),
        words AS (SELECT DISTINCT w FROM dw),
        m AS (SELECT c.w, c.pos, MAX(c.l) AS mlen FROM (
            SELECT wo.w, CAST(i AS INTEGER) AS pos, CAST(l AS INTEGER) AS l,
              substring(wo.w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece
            FROM words wo, UNNEST(range(1, length(wo.w) + 1)) AS t(i),
              UNNEST(range(2, 5)) AS u(l)) c
          JOIN vocab v ON v.piece = c.piece
          WHERE length(c.piece) = c.l
          GROUP BY c.w, c.pos),
        tok(w, len, pos, cnt) AS (
          SELECT w, CAST(length(w) AS INTEGER), 1, 0 FROM words
          UNION ALL
          SELECT t.w, t.len, t.pos + COALESCE(m.mlen, 1), t.cnt + 1
          FROM tok t LEFT JOIN m ON m.w = t.w AND m.pos = t.pos
          WHERE t.pos <= t.len),
        nt AS (SELECT w, cnt AS n_tok FROM tok WHERE pos > len)
        SELECT d.doc_id, COUNT(*) AS n_words, CAST(SUM(t.n_tok) AS BIGINT) AS n_tokens,
          CAST(SUM(t.n_tok) * 1000 // COUNT(*) AS BIGINT) AS fertility_permille
        FROM dw d JOIN nt t ON t.w = d.w
        GROUP BY 1 ORDER BY doc_id"""),
      "unigram hard-EM trained vocab (usage-pruned top-400→200) + per-doc fertility"),

    // Per-label embedding centroids (the "domain centroid" a curation
    // pipeline scores documents against): element-wise mean via the a18
    // sufficient-statistics discipline — exact DECIMAL sums per
    // (label, dim), one identical double division at the end. A double
    // SUM would be partition-order-dependent and unhashable.
    "emb2_label_centroids" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("label"),
            posexplode(col("embedding").cast(ArrayType(DoubleType))))
        e.groupBy(col("label"), (col("pos") + 1).cast(LongType).as("dim"))
          .agg(sum(col("col").cast(DecimalType(18, 6))).as("s6"),
            count(lit(1)).as("n"))
          .select(col("label"), col("dim"),
            (col("s6").cast(DoubleType) / col("n")).as("c_val"), col("n"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""SELECT label, i AS dim,
          CAST(SUM(CAST(embedding[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val,
          COUNT(*) AS n
        FROM (SELECT label, embedding::DOUBLE[] AS embedding FROM embeddings),
          UNNEST(range(1, 65)) AS t(i)
        GROUP BY label, i ORDER BY label, dim"""),
      "per-label embedding centroids from exact decimal sums"),

    // Trigram language-model corpus statistics (the n-gram LM used for
    // perplexity-style quality filtering): occurrence counts — NOT the
    // distinct shingle sets of the dedup family — plus document
    // frequency per trigram. One hash agg; skewed head trigrams are
    // exactly what t11's Misra–Gries path bounds when the cutoff moves
    // to top-k.
    "t13_trigram_lm" -> Q(
      (s, d) => {
        // trigrams from one native eval per doc (SpanArray) — same
        // strings as the old transform/element_at/concat lambda; < 3
        // token docs vanish at the explode like the old size filter
        val tris = graft.operators.Par.fan(Tables.documents(s, d))
          .select(col("doc_id"), explode(
            graft.functions.TextSketches.spanArray(col("text"), 3)).as("tri"))
        tris.groupBy(col("tri"))
          .agg(count(lit(1)).as("c"), countDistinct(col("doc_id")).as("ndocs"))
          .filter(col("c") >= 5)
          .orderBy(col("c").desc, col("tri"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        tri AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i))
        SELECT tri, COUNT(*) AS c, COUNT(DISTINCT doc_id) AS ndocs
        FROM tri GROUP BY tri HAVING COUNT(*) >= 5
        ORDER BY c DESC, tri"""),
      "trigram LM counts + document frequency — n-gram corpus statistics"),

    // Embedding outlier detection (mislabeled/noise screening): score
    // every vector against its OWN label's centroid and flag the far
    // tail. Composes emb2's decimal-exact centroids (broadcast — 10×64
    // doubles) with d5's cosine parity; the scan side is one narrow
    // DotProduct pass, no self-join anywhere.
    "e2e5_embedding_outliers" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            col("embedding").cast(ArrayType(DoubleType)).as("emb"))
        val cents = e.select(col("label"), posexplode(col("emb")))
          .groupBy(col("label"), (col("pos") + 1).cast(LongType).as("dim"))
          .agg(sum(col("col").cast(DecimalType(18, 6))).as("s6"), count(lit(1)).as("n"))
          .select(col("label"), col("dim"), (col("s6").cast(DoubleType) / col("n")).as("c_val"))
          .groupBy(col("label"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("c_val")))),
            x => x.getField("c_val")).as("cent"))
        val dotp = Similarity.dot _
        e.join(broadcast(cents), Seq("label"))
          .withColumn("cs", dotp(col("emb"), col("cent")) /
            sqrt(dotp(col("emb"), col("emb")) * dotp(col("cent"), col("cent"))))
          .filter(col("cs") < -0.05)
          .select(col("vec_id"), col("label"),
            col("cs").cast(DecimalType(18, 6)).cast(DoubleType).as("cos"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        c AS (SELECT label, i AS dim,
            CAST(SUM(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c_val
          FROM e, UNNEST(range(1, 65)) AS t(i) GROUP BY label, i),
        ca AS (SELECT label, list(c_val ORDER BY dim) AS cent FROM c GROUP BY label),
        s AS (SELECT e.vec_id, e.label,
            list_cosine_similarity(e.emb, ca.cent) AS cs
          FROM e JOIN ca USING (label))
        SELECT vec_id, label, CAST(CAST(cs AS DECIMAL(18,6)) AS DOUBLE) AS cos
        FROM s WHERE cs < -0.05 ORDER BY vec_id"""),
      "per-label centroid outliers: broadcast centroids, narrow cosine scan"),

    // TF-IDF top terms per doc: ranking is INTEGER-keyed (tf desc, df
    // asc, term) so it cannot flip across engines; only the score value
    // crosses the float boundary, rendered through DECIMAL(18,6) with
    // the identical op sequence (tf · ln(N/df)) on both sides.
    "t14_tfidf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("__n"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df"), col("term"))
        tf.join(dfT, Seq("term")).crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(w).cast(LongType))
          .filter(col("rk") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rk"),
            (col("tf") * log(col("__n").cast(DoubleType) / col("df")))
              .cast(DecimalType(18, 6)).cast(DoubleType).as("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
          WHERE term != '' GROUP BY 1, 2),
        dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        r AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
            ROW_NUMBER() OVER (PARTITION BY tf.doc_id
              ORDER BY tf.tf DESC, dft.df, tf.term) AS rk
          FROM tf JOIN dft USING (term))
        SELECT doc_id, term, tf, CAST(df AS BIGINT) AS df, rk,
          CAST(CAST(tf * ln(CAST(n.n AS DOUBLE) / df) AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
        FROM r CROSS JOIN n WHERE rk <= 5 ORDER BY doc_id, rk"""),
      "TF-IDF top-5 terms per doc — integer-keyed ranking, rendered score"),

    // Vocabulary Zipf slope: least-squares fit of ln(freq) ~ ln(rank)
    // over the top-1000 terms — the corpus-health diagnostic (natural
    // text sits near −1; templated/synthetic corpora drift). Ranking is
    // INTEGER-keyed (freq desc, term) so it cannot flip across engines;
    // each per-term log term is cast to DECIMAL(18,6) BEFORE summing
    // (decimal sums are exact and order-free — the t15 pattern), and
    // only the final slope crosses as floor-micro. The global sort is
    // top-1000-bounded (TakeOrdered), never vocabulary-sized.
    "t21_zipf_slope" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
        val top = toks.groupBy(col("term")).agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("term")).limit(1000)
        val ranked = top.withColumn("rank",
          row_number().over(Window.orderBy(col("freq").desc, col("term"))))
        val dec = DecimalType(18, 6)
        val stats = ranked.select(
            log(col("rank").cast(DoubleType)).as("x"),
            log(col("freq").cast(DoubleType)).as("y"))
          .agg(count(lit(1)).cast(DoubleType).as("n"),
            sum(col("x").cast(dec)).cast(DoubleType).as("sx"),
            sum(col("y").cast(dec)).cast(DoubleType).as("sy"),
            sum((col("x") * col("y")).cast(dec)).cast(DoubleType).as("sxy"),
            sum((col("x") * col("x")).cast(dec)).cast(DoubleType).as("sxx"))
        stats.select(col("n").cast(LongType).as("n_terms"),
          floor((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * 1000000d)
            .cast(LongType).as("slope_micro"))
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        f AS (SELECT term, COUNT(*) AS freq FROM toks WHERE term != '' GROUP BY 1),
        top AS (SELECT term, freq FROM f ORDER BY freq DESC, term LIMIT 1000),
        r AS (SELECT freq,
            ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rank FROM top),
        t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
            CAST(SUM(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
            CAST(SUM(CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) AS sxx
          FROM r)
        SELECT CAST(n AS BIGINT) AS n_terms,
          CAST(FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000) AS BIGINT) AS slope_micro
        FROM t"""),
      "Zipf slope of the top-1000 vocabulary — corpus-health power-law fit"),

    // Per-doc novelty: permille of shingles unique to the doc (df == 1
    // corpus-wide). Low novelty + not-a-near-dup = boilerplate-heavy
    // source; curation keep-rates can key on it.
    "t19_novelty" -> Q(
      (s, d) => TextStats.noveltyScores(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        f AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1)
        SELECT doc_id, COUNT(*) AS n_shingles,
          CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
          CAST(FLOOR(CAST(1000 AS DOUBLE)
            * CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS novelty_permille
        FROM sh JOIN f USING (s) GROUP BY doc_id ORDER BY doc_id"""),
      "novelty scoring: permille of corpus-unique shingles per doc"),

    // Incremental novelty — the deployment form (even ids = corpus whose
    // shingle frequencies are the stored state, odd ids = arriving
    // batch): the batch scores its UNSEEN-in-corpus shingle permille via
    // one left join against the stored counts; the corpus never
    // re-shuffles per batch.
    "t20_novelty_frozen" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextStats.noveltyScoresFrozen(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
          FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)),
        exs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0)
        SELECT sh.doc_id, COUNT(*) AS n_shingles,
          CAST(SUM(CASE WHEN exs.s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
          CAST(FLOOR(CAST(1000 AS DOUBLE)
            * CAST(SUM(CASE WHEN exs.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS novelty_permille
        FROM sh LEFT JOIN exs ON exs.s = sh.s
        WHERE sh.doc_id % 2 = 1 GROUP BY sh.doc_id ORDER BY sh.doc_id"""),
      "incremental novelty: batch scored against stored corpus shingle counts"),

    // cl1: corpus clustering — k-means, GRADUATED from rows-only to
    // hash-green (the ann3 move applied to the trainer itself): the
    // exact Lloyd (`IvfIndex.fitExactLloyd`) compares DECIMAL(18,6)-
    // rounded Euclidean distances in the argmin (ties to the lower cell
    // — robust to either engine's ~1e-15 summation-order noise) and
    // updates centroids with order-exact decimal-sum means, so the
    // WHOLE trajectory — seeds, 3 assignment rounds, 3 updates, final
    // assignment — replays bit-for-bit in DuckDB. The oracle unrolls
    // the iterations into chained CTE blocks (SQL disallows aggregates
    // in a recursive term; the count is a constant). Unlike ann3's
    // fitExact, the cells here stay ADAPTIVE — this is real k-means
    // under the oracle gate, not label cells.
    "cl1_kmeans_clusters" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        graft.operators.IvfIndex.assignCellsExact(emb,
            graft.operators.IvfIndex.fitExactLloyd(emb, 8, 3))
          .orderBy(col("vec_id"))
      },
      Some(kmeansOracle(k = 8, iters = 3)),
      "k-means (exact Lloyd, 8 adaptive cells) — trajectory hash-checked end to end"),

    // Heavy hitters via Misra–Gries (operators/HeavyHitters): the top-k
    // path whose shuffle is capacity-bounded, not vocabulary-bounded —
    // t5's groupBy(token) at 100 TB moves every distinct URL/n-gram/id
    // through the exchange; the sketch pass moves 64-entry buffers. The
    // synthetic corpus is uniform (931 bigrams, max/10th = 48/44 — no
    // natural skew), so the key domain is CONSTRUCTED scale-invariantly:
    // even doc_ids contribute their lang (5 heavy keys, ~n/10 each), odd
    // ones a per-doc singleton (~n/2 tail keys). The 5 heavy keys clear
    // the N/(capacity+1) survival bound at every SF, so sketch+recount
    // returns the EXACT top-5 — hash-checked (the sq1/ann6 pattern).
    "t11_heavy_hitters" -> Q(
      (s, d) => {
        val toks = graft.operators.Par.fan(Tables.documents(s, d))
          .select(when(col("doc_id") % 2 === 0, col("lang"))
            .otherwise(concat(lit("u"), col("doc_id"))).as("token"))
        graft.operators.HeavyHitters.topK(toks, "token", k = 5, capacity = 64)
      },
      Some("""SELECT token, COUNT(*) AS n FROM (
          SELECT CASE WHEN doc_id % 2 = 0 THEN lang
            ELSE 'u' || CAST(doc_id AS VARCHAR) END AS token
          FROM documents) t
        GROUP BY token ORDER BY n DESC, token LIMIT 5"""),
      "Misra-Gries heavy hitters + exact recount == exact top-5"),

    // PCA dimensionality reduction (operators/Pca): one distributed
    // covariance pass carried as order-exact DECIMAL(18,6) sufficient
    // statistics (layout-free — any partitioning fits the identical
    // model), driver-side Jacobi on the d×d matrix, narrow DotProduct
    // projection. Rows-only: the eigen-decomposition is not
    // SQL-expressible; PcaSpec proves orthonormality, variance ordering,
    // exact full-rank reconstruction and the deterministic sign
    // convention.
    "emb1_pca_project" -> Q(
      (s, d) => {
        import graft.operators.{Par, Pca}
        val emb = Par.fan(Tables.embeddings(s, d))
        val model = Pca.fit(emb, "embedding", k = 4)
        Pca.project(emb, "embedding", model)
          .select(col("vec_id"), col("label"),
            col("pc1"), col("pc2"), col("pc3"), col("pc4"))
          .orderBy(col("vec_id"))
      },
      None,
      "PCA top-4 projection of embeddings (pre-quantization rotation)"),

    // DISTRIBUTED PCA fit (the sem4/ann8 protocol applied to the dense
    // model): three shards compute sufficient statistics independently
    // (no cross-shard shuffle), one driver fold adds the decimals
    // EXACTLY, one Jacobi — and because the statistics are order-exact,
    // the merged model equals the one-shot BIT-FOR-BIT (PcaSpec), the
    // strongest artifact-equality form of the merge doctrine (PCA's
    // training pass is an abelian sum; Lloyd's is not). Rows-only like
    // emb1 (same eigen-solve), but the projection below is bit-identical
    // to emb1's by construction — the fold is bench-visible here.
    "emb3_merged_pca" -> Q(
      (s, d) => {
        import graft.operators.{Par, Pca}
        val emb = Par.fan(Tables.embeddings(s, d))
        val model = Pca.fitMerged(
          (0 until 3).map(i => emb.filter(col("vec_id") % 3 === i)),
          "embedding", k = 4)
        Pca.project(emb, "embedding", model)
          .select(col("vec_id"), col("label"),
            col("pc1"), col("pc2"), col("pc3"), col("pc4"))
          .orderBy(col("vec_id"))
      },
      None,
      "shard-folded PCA fit == one-shot bit-for-bit; projection under the merged model"),

    // int8 scalar quantization (FAISS SQ8): per-dim min/max training
    // (dim-bounded collect, the centroid pattern) + a zero-shuffle narrow
    // encode. The oracle recomputes codes and dequantization error with
    // the identical double op sequence — fully SQL-mirrorable, unlike the
    // hash-seeded sketches, so this one IS hash-checked.
    "sq1_scalar_quant" -> Q(
      (s, d) => {
        import graft.operators.{Par, ScalarQuant}
        val embs = Par.fan(Tables.embeddings(s, d))
        val ranges = ScalarQuant.trainRanges(embs)
        ScalarQuant.quantize(embs, ranges)
          .select(col("vec_id"),
            aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
            aggregate(col("err_micro"), lit(0L), (a, x) => greatest(a, x))
              .as("max_err_micro"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding[CAST(i AS INTEGER)] AS v, i
          FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        r AS (SELECT i, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY i),
        q AS (SELECT vec_id, CAST(v AS DOUBLE) AS vd,
            CAST(lo AS DOUBLE) AS lod, CAST(hi AS DOUBLE) AS hid,
            CASE WHEN hi > lo THEN FLOOR((CAST(v AS DOUBLE) - CAST(lo AS DOUBLE)) * 255.0
              / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) + 0.5) ELSE 0 END AS code
          FROM e JOIN r USING (i))
        SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
          CAST(MAX(FLOOR(ABS(lod + code * (hid - lod) / 255.0 - vd) * 1000000)) AS BIGINT)
            AS max_err_micro
        FROM q GROUP BY vec_id ORDER BY vec_id"""),
      "int8 scalar quantization: codes + dequant error, oracle-checked"),

    // SQ8 search: approximate pass over the 4x-smaller codes, exact
    // re-rank on the output-sized shortlist. Deterministic end to end —
    // the ONE approximate ANN path that is hash-checked against an oracle
    // mirroring both stages (the hash-seeded paths ann2-ann5 can't be).
    "ann6_sq8_topk" -> Q(
      (s, d) => {
        import graft.operators.{Par, ScalarQuant}
        val emb = Par.fan(Tables.embeddings(s, d))
        val ranges = ScalarQuant.trainRanges(emb)
        ScalarQuant.sq8TopK(emb.filter(col("vec_id") < 5), emb, ranges, k = 3, refine = 4)
          .orderBy(col("query_id"), col("cos").desc, col("neighbor_id"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS vd, i
          FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
        r AS (SELECT i, MIN(vd) AS lod, MAX(vd) AS hid FROM e GROUP BY i),
        deq AS (SELECT vec_id, list(
              lod + (CASE WHEN hid > lod
                THEN FLOOR((vd - lod) * 255.0 / (hid - lod) + 0.5) ELSE 0 END)
                * (hid - lod) / 255.0 ORDER BY i) AS dv
          FROM e JOIN r USING (i) GROUP BY vec_id),
        ap AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            list_cosine_similarity(q.embedding::DOUBLE[], d.dv) AS acos
          FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id
          JOIN deq d ON d.vec_id = c.vec_id),
        sl AS (SELECT query_id, neighbor_id FROM ap
          QUALIFY row_number() OVER (PARTITION BY query_id
            ORDER BY acos DESC, neighbor_id) <= 12)
        SELECT s.query_id, s.neighbor_id,
          CAST(CAST(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
            AS DECIMAL(18,6)) AS DOUBLE) AS cos
        FROM sl s JOIN embeddings q ON q.vec_id = s.query_id
          JOIN embeddings c ON c.vec_id = s.neighbor_id
        QUALIFY row_number() OVER (PARTITION BY s.query_id
          ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
            s.neighbor_id) <= 3
        ORDER BY query_id, cos DESC, neighbor_id"""),
      "SQ8 codes scan + exact re-rank top-k — deterministic, oracle-checked"),

    // F6 stored-flavor MD5 (ref main.py:156-160): the hash raw.data
    // actually persists — md5 of DEFAULT json.dumps (spaced separators).
    // The oracle rebuilds the exact byte string; a match certifies
    // migration-grade hash compatibility of the raw/staging layers.
    "f7_raw_hash" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("event_id") < 10000)
          .select(col("event_id"),
            map(lit("a"), col("event_type"),
              lit("b"), col("user_id").cast(StringType)).as("payload"))
        ev.select(col("event_id"),
            graft.functions.Parsers.rawPayloadHash(col("payload")).as("raw_hash"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
        md5('{"a": "' || event_type || '", "b": "' ||
          CAST(user_id AS VARCHAR) || '"}') AS raw_hash
        FROM events WHERE event_id < 10000 ORDER BY event_id"""),
      "stored payload_hash flavor (ref main.py:156-160) — migration byte parity"),

    // F7/F8 id synthesis (ref main.py:179-212): id-less payloads get
    // gsheet_auto_{sha256(pyDefaultJson)[:12]}_{index}. The sha input is
    // json.dumps DEFAULT flavor — ", "/": " separators (ref main.py:191) —
    // rebuilt literally in the oracle (alnum values → no escaping); a match
    // certifies the byte layout + SHA-256 + the synth format.
    "f8_id_synth" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("event_id") < 10000)
          .select(col("event_id").cast(IntegerType).as("sheet_row_number"),
            map(lit("a"), col("event_type"),
              lit("b"), col("user_id").cast(StringType)).as("payload"))
        import graft.functions.Parsers
        ev.select(col("sheet_row_number").as("row"),
            Parsers.pickOrSynthId(col("payload"),
              Parsers.normalizeKeys(col("payload")), col("sheet_row_number")).as("id"))
          .orderBy(col("row"))
      },
      Some("""SELECT CAST(event_id AS INT) AS row,
        'gsheet_auto_' || substring(sha256('{"a": "' || event_type || '", "b": "' ||
          CAST(user_id AS VARCHAR) || '"}'), 1, 12) || '_' || CAST(event_id AS INT) AS id
        FROM events WHERE event_id < 10000 ORDER BY row"""),
      "fallback id synthesis: canonical JSON + SHA-256 + row index (ref main.py:179-212)"),

    // ───── multimodal ─────

    "mm1_media_features" -> Q(
      (s, d) => Media.extractFeatures(
          Media.documentsAsMedia(s, Tables.documents(s, d)))
        .toDF().orderBy(col("media_id")),
      Some("""SELECT CAST(doc_id AS BIGINT) AS media_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        md5(text) AS content_md5,
        CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        CAST(octet_length(encode(text)) * 7 % 480 AS INT) AS height,
        CAST(octet_length(encode(text)) % 32 AS INT) AS n_frames
        FROM documents ORDER BY media_id"""),
      "binary media column → per-partition batched feature extraction (decode stubbed)"),

    "mm2_frame_sample" -> Q(
      (s, d) => Media.frameSample(
          Media.documentsAsMedia(s, Tables.documents(s, d)), frameSize = 64, stride = 2)
        .toDF().orderBy(col("media_id"), col("frame_idx")),
      // ASCII corpus: DuckDB's char-substring md5 == the byte-slice md5
      Some("""SELECT CAST(doc_id AS BIGINT) AS media_id, CAST(i AS INT) AS frame_idx,
        CAST(64 AS INT) AS frame_len,
        md5(substring(text, CAST(i AS INT) * 64 + 1, 64)) AS frame_md5
        FROM documents, UNNEST(range(0, length(text) // 64, 2)) AS t(i)
        ORDER BY media_id, frame_idx"""),
      "fixed-size frame sampling over binary payloads (stride 2) — batched, narrow"),

    // Perceptual-hash near-dup over BINARY payloads: aHash bits from 64
    // sampled "pixels" (integer-only ⇒ both engines compute identical
    // hashes; decode honestly stubbed, see Media.perceptualHash), then
    // the SAME hamming band join as SimHash — exact for hamming ≤ 7 by
    // pigeonhole. Oracle is the brute-force O(n²) pair scan; the engine
    // side never materializes it. Bit 63 rides DuckDB's HUGEINT sum
    // (1<<63 overflows its BIGINT shift).
    "mm3_phash_neardup" -> Q(
      (s, d) => {
        val sig = Media.perceptualHash(
            Media.documentsAsMedia(s, Tables.documents(s, d)))
          .toDF().select(col("media_id").as("doc_id"), col("phash").as("simhash"))
        TextDedup.hammingBandPairs(sig, maxHamming = 7)
          .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH px AS (
          SELECT doc_id, i,
            ord(substr(text, CAST(i * (length(text) - 1) // 63 AS BIGINT) + 1, 1)) AS p
          FROM documents, UNNEST(range(0, 64)) AS t(i)),
        h AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN p > avg_p AND i < 63 THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
              WHEN p > avg_p AND i = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
              ELSE 0 END) AS BIGINT) AS phash
          FROM (SELECT doc_id, i, p,
              CAST(SUM(p) OVER (PARTITION BY doc_id) AS BIGINT) // 64 AS avg_p FROM px)
          GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 7
        ORDER BY id_a, id_b"""),
      "perceptual-hash near-dup over binary media — banded, oracle is brute force"),

    // mm3 SERVED from a persisted band index (even ids = indexed corpus,
    // odd = arriving batch): batch bands join the stored 8-rows-per-file
    // band table; phash rides in the band rows so verification is an
    // inline xor — no corpus re-band, no second join. Oracle = mm3's
    // brute force restricted to pairs touching the batch.
    "mm4_indexed_phash" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def sig(df: org.apache.spark.sql.DataFrame) =
          Media.perceptualHash(Media.documentsAsMedia(s, df)).toDF()
        val idx = graft.multimodal.MediaIndexStore.ensure(s, d,
          sig(docs.filter(col("doc_id") % 2 === 0)), maxHamming = 7)
        graft.multimodal.MediaIndexStore.pairsIncremental(idx,
            sig(docs.filter(col("doc_id") % 2 === 1)))
          .select(col("id_a"), col("id_b"), col("hamming").cast(LongType).as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH px AS (
          SELECT doc_id, i,
            ord(substr(text, CAST(i * (length(text) - 1) // 63 AS BIGINT) + 1, 1)) AS p
          FROM documents, UNNEST(range(0, 64)) AS t(i)),
        h AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN p > avg_p AND i < 63 THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
              WHEN p > avg_p AND i = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
              ELSE 0 END) AS BIGINT) AS phash
          FROM (SELECT doc_id, i, p,
              CAST(SUM(p) OVER (PARTITION BY doc_id) AS BIGINT) // 64 AS avg_p FROM px)
          GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 7
          AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
        ORDER BY id_a, id_b"""),
      "indexed perceptual-hash near-dup: batch bands vs the persisted band table"),

    // ───── sessionization (batch flavor of the streaming operator) ─────

    "st2_sessionization" -> Q(
      (s, d) => {
        val gap = graft.streaming.Streams.GapNs
        // DuckDB reads parquet TIMESTAMP(NANOS) at µs precision — truncate
        // to µs-grid ns with exact integer division (double ÷ would lose
        // precision at 1e18).
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            (expr("ts DIV 1000") * 1000L).as("tns"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tns"), col("event_id"))
        val brk = when(lag(col("tns"), 1).over(w).isNull ||
          col("tns") - lag(col("tns"), 1).over(w) > gap, 1).otherwise(0)
        e.withColumn("brk", brk)
          .withColumn("session_id", sum(col("brk"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tns")).as("start_ns"), max(col("tns")).as("end_ns"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
        g AS (SELECT *, CASE WHEN lag(tns) OVER w IS NULL
                OR tns - lag(tns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tns, event_id
                ROWS UNBOUNDED PRECEDING) AS sess FROM g)
        SELECT user_id, CAST(sess AS BIGINT) AS session_id, COUNT(*) AS n_events,
          MIN(tns) AS start_ns, MAX(tns) AS end_ns
        FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
      "30-min-gap sessionization; batch twin of Streams.sessionize"),
  )
}
