"""DuckDB oracle SQL for every SQL-expressible query in ``__ray_entry__``.

Each SQL string runs against the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) and must produce the SAME columns/types/values as the matching
Ray pipeline. Shared CTE fragments guarantee the transcript derivation and
gazetteer cannot drift between engine and oracle.
"""

from __future__ import annotations

from bio_re_with_entity_embeddings_ray.functions.textfns import NGRAM_MAX_DF
from bio_re_with_entity_embeddings_ray.sources.dictionaries import gazetteer_sql_values
from bio_re_with_entity_embeddings_ray.sources.transcripts import (
    TURN_WORDS,
    transcripts_sql_cte,
)

_GZ = gazetteer_sql_values("gz")
_T = TURN_WORDS


def kg_cte() -> str:
    """WITH-clause body: transcripts_v, token offsets, mentions tables."""
    return f"""{transcripts_sql_cte()},
__tok2 AS (
  SELECT conv_id, CAST((i - 1) // {_T} AS INT) AS turn_idx, w,
         CAST(COALESCE(SUM(length(w) + 1) OVER (
             PARTITION BY conv_id, (i - 1) // {_T} ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS start
  FROM __tok
),
__text_mentions AS (
  SELECT t.conv_id, t.turn_idx, gz.entity_type, gz.entity_id,
         t.w AS mention_text, t.start,
         CAST(t.start + length(t.w) AS INT) AS "end"
  FROM __tok2 t JOIN {_GZ} ON lower(t.w) = gz.surface
),
__tool_mentions AS (
  SELECT conv_id, turn_idx, 'tool' AS entity_type,
         'TOOL:' || upper(tool) AS entity_id, tool AS mention_text,
         CAST(-1 AS INT) AS start, CAST(-1 AS INT) AS "end"
  FROM transcripts_v WHERE tool IS NOT NULL AND tool <> ''
),
__mentions AS (
  SELECT * FROM __text_mentions UNION ALL SELECT * FROM __tool_mentions
)"""


TRANSCRIPTS = f"WITH {transcripts_sql_cte()} SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts_v"

CONVERSATIONS = f"""WITH {transcripts_sql_cte()}
SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS text,
       CAST(count(*) AS INT) AS n_turns
FROM transcripts_v GROUP BY conv_id"""

# Per-conversation LAG (stages/relational.turn_lag): prev role +
# inter-turn latency, typed sentinels for conversation-first turns
TURN_LAG = f"""WITH {transcripts_sql_cte()}
SELECT conv_id, turn_idx, role,
       COALESCE(LAG(role) OVER w, '') AS prev_role,
       CAST(COALESCE(epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w, -1) AS BIGINT) AS gap_ms
FROM transcripts_v
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)"""

MENTIONS = f"""WITH {kg_cte()}
SELECT conv_id, turn_idx, entity_type, entity_id, mention_text, start, "end"
FROM __text_mentions"""

TOOL_MENTIONS = f"""WITH {kg_cte()}
SELECT conv_id, turn_idx, entity_type, entity_id, mention_text, start, "end"
FROM __tool_mentions"""

CONV2ENTITY = f"""WITH {kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions)
SELECT conv_id,
       string_agg(entity_id, ';;;' ORDER BY entity_id) AS entity_ids,
       CAST(count(*) AS INT) AS n_entities
FROM __dm GROUP BY conv_id"""

# Arrow list<string> production schema (SURVEY §1.3): the as_string=False
# engine path, verified against a real DuckDB LIST aggregate
CONV2ENTITY_LIST = f"""WITH {kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions)
SELECT conv_id,
       list(entity_id ORDER BY entity_id) AS entity_ids,
       CAST(count(*) AS INT) AS n_entities
FROM __dm GROUP BY conv_id"""

ENTITY2CONV = f"""WITH {kg_cte()},
__dm AS (SELECT DISTINCT entity_id, entity_type, conv_id FROM __mentions)
SELECT entity_id, entity_type,
       string_agg(conv_id, ';;;' ORDER BY conv_id) AS conv_ids,
       count(*) AS support
FROM __dm GROUP BY entity_id, entity_type"""

_PAIR_CTE = f"""{kg_cte()},
__src AS (SELECT DISTINCT conv_id, entity_id AS subj_id FROM __mentions WHERE entity_type = 'op'),
__tgt AS (SELECT DISTINCT conv_id, entity_id AS obj_id FROM __mentions WHERE entity_type = 'res'),
__cp AS (SELECT s.conv_id, s.subj_id, t.obj_id FROM __src s JOIN __tgt t ON s.conv_id = t.conv_id),
__triples AS (
  SELECT subj_id, 'applies_to' AS pred, obj_id,
         string_agg(conv_id, ';;;' ORDER BY conv_id) AS conv_ids,
         count(*) AS support
  FROM __cp GROUP BY subj_id, obj_id
)"""

TRIPLES = f"WITH {_PAIR_CTE} SELECT subj_id, pred, obj_id, conv_ids, support FROM __triples"

# Exact-integer lift (exp-PMI) edge weights (stages/pairs.pair_lift):
# observed/expected co-occurrence, integer arithmetic end to end
PAIR_LIFT = f"""WITH {kg_cte()},
__pl_src AS (SELECT DISTINCT conv_id, entity_id AS subj_id FROM __mentions WHERE entity_type = 'op'),
__pl_tgt AS (SELECT DISTINCT conv_id, entity_id AS obj_id FROM __mentions WHERE entity_type = 'res'),
__pl_p AS (SELECT subj_id, obj_id, count(*) AS n_pair
        FROM __pl_src s JOIN __pl_tgt t ON s.conv_id = t.conv_id
        GROUP BY subj_id, obj_id),
__pl_ns AS (SELECT subj_id, count(*) AS n_subj FROM __pl_src GROUP BY subj_id),
__pl_nt AS (SELECT obj_id, count(*) AS n_obj FROM __pl_tgt GROUP BY obj_id),
__pl_n AS (SELECT count(DISTINCT conv_id) AS n_convs FROM __mentions
        WHERE entity_type IN ('op', 'res'))
SELECT p.subj_id, p.obj_id,
       CAST(n_pair AS BIGINT) AS n_pair,
       CAST(n_subj AS BIGINT) AS n_subj,
       CAST(n_obj AS BIGINT) AS n_obj,
       CAST(n_convs AS BIGINT) AS n_convs,
       CAST((10000 * n_pair * n_convs) // (n_subj * n_obj) AS BIGINT) AS lift_bp
FROM __pl_p p JOIN __pl_ns USING (subj_id) JOIN __pl_nt USING (obj_id) CROSS JOIN __pl_n"""

# second type pair: pre-linked tool mentions x resources, predicate 'touches'
TRIPLES_TOOL = f"""WITH {kg_cte()},
__src AS (SELECT DISTINCT conv_id, entity_id AS subj_id FROM __mentions WHERE entity_type = 'tool'),
__tgt AS (SELECT DISTINCT conv_id, entity_id AS obj_id FROM __mentions WHERE entity_type = 'res'),
__cp AS (SELECT s.conv_id, s.subj_id, t.obj_id FROM __src s JOIN __tgt t ON s.conv_id = t.conv_id)
SELECT subj_id, 'touches' AS pred, obj_id,
       string_agg(conv_id, ';;;' ORDER BY conv_id) AS conv_ids,
       count(*) AS support
FROM __cp GROUP BY subj_id, obj_id"""

ADJACENCY_EDGES = f"""WITH {_PAIR_CTE}
SELECT subj_id AS entity_id, obj_id AS neighbor_id, pred, support AS weight FROM __triples
UNION ALL
SELECT obj_id AS entity_id, subj_id AS neighbor_id, pred, support AS weight FROM __triples"""

# nested list<struct> adjacency index (stages/pairs.adjacency_index)
ADJACENCY_INDEX = f"""WITH {_PAIR_CTE},
__edges AS (
  SELECT subj_id AS entity_id, obj_id AS neighbor_id, pred, support AS weight FROM __triples
  UNION ALL
  SELECT obj_id AS entity_id, subj_id AS neighbor_id, pred, support AS weight FROM __triples
)
SELECT entity_id,
       list(struct_pack(neighbor_id := neighbor_id, pred := pred, weight := weight)
            ORDER BY neighbor_id, pred) AS neighbors
FROM __edges GROUP BY entity_id"""

DOC2VEC_INPUT = f"""WITH {kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions),
__tags AS (
  SELECT conv_id, string_agg(entity_id, ';;;' ORDER BY entity_id) AS tags
  FROM __dm GROUP BY conv_id
),
__convs AS (
  SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS text
  FROM transcripts_v GROUP BY conv_id
)
SELECT t.conv_id, t.tags, c.text FROM __tags t JOIN __convs c ON t.conv_id = c.conv_id"""

CONV_IDS = f"""WITH {kg_cte()}
SELECT DISTINCT conv_id FROM __mentions"""


# ------------------------------------------------------------------ dedup
# Duplicated corpus (documents ∪ shifted copy) so exact/near-dup operators
# have non-trivial positives on the synthetic testdata.
_CORPUS = """__corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
)"""

_SHINGLES = f"""{_CORPUS},
__cp AS (SELECT doc_id, string_split(text, ' ') AS parts FROM __corpus),
__ci AS (SELECT doc_id, parts, unnest(range(1, len(parts) - 1)) AS i FROM __cp),
__sh AS (
  SELECT DISTINCT doc_id,
         parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2] AS shingle
  FROM __ci
)"""

DEDUP_EXACT = f"""WITH {_CORPUS}
SELECT min(doc_id) AS doc_id, text FROM __corpus GROUP BY text"""

DEDUP_EXACT_HASHED = f"""WITH {_CORPUS}
SELECT min(doc_id) AS doc_id, md5(text) AS content_md5
FROM __corpus GROUP BY md5(text)"""

NGRAM_JACCARD = f"""WITH {_SHINGLES},
__sizes AS (SELECT doc_id, count(*) AS size FROM __sh GROUP BY doc_id),
__cool AS (
  -- hot-shingle cap (mirror of stages/dedup.ngram_jaccard_pairs max_df):
  -- shingles in more than NGRAM_MAX_DF docs are pruned before pairing
  SELECT shingle FROM __sh GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}
),
__pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM __sh a
  JOIN __cool c ON a.shingle = c.shingle
  JOIN __sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter, sa.size AS size_a, sb.size AS size_b
FROM __pairs p
JOIN __sizes sa ON p.doc_a = sa.doc_id
JOIN __sizes sb ON p.doc_b = sb.doc_id
WHERE 10000 * p.inter >= 5000 * (sa.size + sb.size - p.inter)"""


def _perm_values() -> str:
    from bio_re_with_entity_embeddings_ray.functions.textfns import MINHASH_A, MINHASH_B

    rows = ", ".join(
        f"({p + 1}, {int(a)}, {int(b)})"
        for p, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    return f"(VALUES {rows}) AS perm(p, a, b)"


MINHASH_LSH = f"""WITH {_SHINGLES},
__shh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % 2147483647 AS x
  FROM __sh
),
__sig AS (
  SELECT doc_id, perm.p, min((perm.a * x + perm.b) % 2147483647) AS mh
  FROM __shh, {_perm_values()} GROUP BY 1, 2
),
__band AS (
  SELECT doc_id, CAST((p - 1) // 4 AS INT) AS band_id,
         string_agg(CAST(mh AS VARCHAR), '-' ORDER BY p) AS band_key
  FROM __sig GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM __band a
JOIN __band b ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id"""

def _minhash_star_pairs_cte(src: str) -> str:
    """CTE chain (no WITH keyword) computing ``__mh_pairs(doc_a, doc_b)``
    — MinHash-LSH star candidate pairs over relation ``src(doc_id, text)``.
    Mirrors MINHASH_LSH_STAR but parameterized by source so composed
    oracles (CURATE_NEARDUP) can band a FILTERED corpus."""
    return f"""__mh_cp AS (SELECT doc_id, string_split(text, ' ') AS parts FROM {src}),
__mh_ci AS (SELECT doc_id, parts, unnest(range(1, len(parts) - 1)) AS i FROM __mh_cp),
__mh_sh AS (
  SELECT DISTINCT doc_id,
         parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2] AS shingle
  FROM __mh_ci
),
__mh_shh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % 2147483647 AS x
  FROM __mh_sh
),
__mh_sig AS (
  SELECT doc_id, perm.p, min((perm.a * x + perm.b) % 2147483647) AS mh
  FROM __mh_shh, {_perm_values()} GROUP BY 1, 2
),
__mh_band AS (
  SELECT doc_id, CAST((p - 1) // 4 AS INT) AS band_id,
         string_agg(CAST(mh AS VARCHAR), '-' ORDER BY p) AS band_key
  FROM __mh_sig GROUP BY 1, 2
),
__mh_pairs AS (
  SELECT DISTINCT m.mn AS doc_a, b.doc_id AS doc_b
  FROM __mh_band b
  JOIN (SELECT band_id, band_key, min(doc_id) AS mn
        FROM __mh_band GROUP BY 1, 2) m
    ON b.band_id = m.band_id AND b.band_key = m.band_key AND b.doc_id > m.mn
)"""


# transitive closure of the (symmetrized) pair graph; min reachable id =
# component representative — the SQL mirror of dedup.connected_components
def _cc_closure_cte(pairs_rel: str) -> str:
    return f"""__edges AS (
  SELECT doc_a AS a, doc_b AS b FROM {pairs_rel}
  UNION
  SELECT doc_b AS a, doc_a AS b FROM {pairs_rel}
),
__reach(node, r) AS (
  SELECT a, a FROM __edges
  UNION
  SELECT e.a, rc.r FROM __edges e JOIN __reach rc ON rc.node = e.b
),
__cc AS (SELECT node, min(r) AS r FROM __reach GROUP BY node)"""


# star mode: spanning edges per LSH bucket (linear in bucket size)
MINHASH_LSH_STAR = MINHASH_LSH.replace(
    """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM __band a
JOIN __band b ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id""",
    """SELECT DISTINCT m.mn AS doc_a, b.doc_id AS doc_b
FROM __band b
JOIN (SELECT band_id, band_key, min(doc_id) AS mn
      FROM __band GROUP BY 1, 2) m
  ON b.band_id = m.band_id AND b.band_key = m.band_key AND b.doc_id > m.mn""",
)

SIMHASH = """WITH __tok AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
),
__bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h // (CAST(1 AS BIGINT) << j)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM __tok, (SELECT unnest(range(0, 32)) AS j) GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM __bits GROUP BY doc_id"""

def _simhash_near_dup_sql() -> str:
    inner = SIMHASH.strip()
    return (
        "WITH __sh AS (" + inner + ")\n"
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
        "FROM __sh a JOIN __sh b ON a.doc_id < b.doc_id\n"
        "WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3"
    )


SIMHASH_NEAR_DUP = None  # filled after SIMHASH is defined (see below)

EMBEDDING_NEAR_DUP = """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"""

# ------------------------------------------------------------- similarity

EMBEDDING_NEAR_DUP_IVF = """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
vc AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
    FROM embeddings e, c) WHERE rn = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM vc a JOIN vc b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"""

KNN_TOPK = """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.qid
),
r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM s)
SELECT qid, nid, CAST(rk AS BIGINT) AS rank FROM r WHERE rk <= 10"""

IVF_SEARCH = """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
qc AS (
  SELECT qid, qe, cid FROM (
    SELECT q.qid, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.qid ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cid) AS rn
    FROM q, c) WHERE rn = 1
),
vc AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
    FROM embeddings e, c) WHERE rn = 1
),
scored AS (
  SELECT qc.qid, vc.vec_id AS nid,
         list_cosine_similarity(qc.qe, vc.embedding) AS sim
  FROM qc JOIN vc ON vc.cid = qc.cid AND vc.vec_id != qc.qid
)
SELECT qid, nid, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
  FROM scored) WHERE rnk <= 5"""

IVF_ASSIGN = """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding, c.ce) AS sim
  FROM embeddings e, c
),
r AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rk FROM s)
SELECT vec_id, cid AS centroid_id FROM r WHERE rk = 1"""

# -------------------------------------------------------------- textstats

TOKEN_COUNTS = """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""

QUALITY_SCORES = """WITH __tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
__agg AS (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct,
         SUM(CASE WHEN w IN ('the', 'a', 'of', 'to', 'and') THEN 1 ELSE 0 END) AS n_stop
  FROM __tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       CAST(10000 * n_distinct // n_tokens AS BIGINT) AS distinct_bp,
       CAST(10000 * n_stop // n_tokens AS BIGINT) AS stop_bp
FROM __agg"""

LANG_ID = """SELECT doc_id,
       CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
            WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
            WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
            WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
            ELSE 'und' END AS pred_lang
FROM documents"""

FINGERPRINTS = """WITH __p AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
__tok AS (
  SELECT doc_id, unnest(parts) AS w, unnest(range(1, 1 + len(parts))) AS i FROM __p
)
SELECT doc_id,
       CAST(SUM(CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) * i)
            % 2305843009213693951 AS BIGINT) AS fingerprint
FROM __tok GROUP BY doc_id"""

# exact quantiles of token counts (stages/textstats.exact_quantiles):
# q-quantile = value at 1-based position ceil(q*n/10000) of the sorted
# metric — integer ceiling on both sides
TOKEN_QUANTILES = """WITH __t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents
),
__n AS (SELECT count(*) AS n FROM __t),
__r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM __t),
__q AS (SELECT CAST(unnest([100, 2500, 5000, 7500, 9900]) AS BIGINT) AS q_bp)
SELECT q.q_bp,
       (SELECT v FROM __r
        WHERE rn = GREATEST(1, (q.q_bp * (SELECT n FROM __n) + 9999) // 10000)) AS value
FROM __q q"""

# global vocabulary top-k (textstats.vocab_topk), ties by token
VOCAB_TOPK = """SELECT token, cnt, CAST(rn AS BIGINT) AS rank FROM (
  SELECT w AS token, CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, w) AS rn
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w) WHERE rn <= 50"""

# per-group exact quantiles (textstats.exact_quantiles_by) grouped by the
# lang-ID heuristic — same integer position rule, within each group
TOKEN_QUANTILES_BY_LANG = """WITH __d AS (
  SELECT CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
              WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
              WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
              WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
              ELSE 'und' END AS pred_lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS v
  FROM documents
),
__n AS (SELECT pred_lang, count(*) AS n FROM __d GROUP BY 1),
__r AS (SELECT pred_lang, v, row_number() OVER (PARTITION BY pred_lang ORDER BY v) AS rn FROM __d),
__q AS (SELECT CAST(unnest([2500, 5000, 7500]) AS BIGINT) AS q_bp)
SELECT n.pred_lang, q.q_bp, r.v AS value
FROM __q q
CROSS JOIN __n n
JOIN __r r ON r.pred_lang = n.pred_lang
          AND r.rn = GREATEST(1, (q.q_bp * n.n + 9999) // 10000)"""

# HyperLogLog registers (stages/sketches.hll_registers, p=8, salt='hll',
# over the dup-heavy __corpus text column): the registers are exact
# integers, so the sketch state itself is oracle-checked; bit_length is
# mirrored with generated integer CASE arithmetic (no float log)
def _hll_rank_case() -> str:
    terms = " ".join(f"WHEN rem >= {1 << (b - 1)} THEN {b}" for b in range(24, 0, -1))
    return f"CASE WHEN rem = 0 THEN 25 ELSE 25 - (CASE {terms} END) END"


HLL_REGISTERS = f"""WITH {_CORPUS},
__h AS (
  SELECT CAST(('0x' || substr(md5('hll:' || text), 1, 8)) AS BIGINT) AS h
  FROM __corpus
),
__r AS (SELECT h >> 24 AS register, h & 16777215 AS rem FROM __h),
__k AS (SELECT register, {_hll_rank_case()} AS rank FROM __r),
__m AS (SELECT register, max(rank) AS max_rank FROM __k GROUP BY register),
__all AS (SELECT CAST(unnest(range(0, 256)) AS BIGINT) AS register)
SELECT a.register, CAST(COALESCE(m.max_rank, 0) AS BIGINT) AS max_rank
FROM __all a LEFT JOIN __m m USING (register)"""

# distributed k-means (stages/clustering.kmeans_centroids_bp, k=8,
# iters=2): Lloyd iterations unrolled as CTE pairs; init = vec_id < 8,
# assignment ties -> lowest centroid id, empty clusters keep the previous
# centroid; compared via the floor(v*10000) integer projection
def _kmeans_iter_cte(i: int, prev: str) -> str:
    return f"""a{i} AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.embedding, c.ce), c.cid) AS rn
    FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1
),
m{i} AS (
  SELECT cid, i, AVG(v) AS v FROM (
    SELECT cid, unnest(embedding) AS v,
           unnest(range(1, 1 + len(embedding))) AS i FROM a{i})
  GROUP BY cid, i
),
c{i} AS (
  SELECT p.cid, COALESCE(l.ce, p.ce) AS ce
  FROM {prev} p LEFT JOIN (SELECT cid, list(v ORDER BY i) AS ce FROM m{i} GROUP BY cid) l
  USING (cid)
)"""


KMEANS_CENTROIDS = f"""WITH c0 AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8
),
{_kmeans_iter_cte(1, "c0")},
{_kmeans_iter_cte(2, "c1")}
SELECT cid AS centroid_id, CAST(i AS BIGINT) AS dim_idx,
       CAST(floor(v * 10000) AS BIGINT) AS value_bp
FROM (SELECT cid, unnest(ce) AS v, unnest(range(1, 1 + len(ce))) AS i FROM c2)"""

# IVF assignment under the TRAINED codebook (stages/scoring.ivf_assign,
# centroids="kmeans"): the same unrolled Lloyd CTEs derive c2, then every
# vector goes to its Euclidean-nearest trained centroid (ties -> lowest
# centroid id — the fit's own tie discipline)
IVF_ASSIGN_KMEANS = f"""WITH c0 AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8
),
{_kmeans_iter_cte(1, "c0")},
{_kmeans_iter_cte(2, "c1")},
__a AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.embedding, c.ce), c.cid) AS rn
    FROM embeddings e CROSS JOIN c2 c) WHERE rn = 1
)
SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id FROM __a"""

# embedding near-dup within TRAINED-codebook Voronoi cells
# (stages/dedup.embedding_near_dup_ivf, centroids="kmeans"): assignment
# as IVF_ASSIGN_KMEANS, pair threshold on cosine as the prefix variant
EMBEDDING_NEAR_DUP_IVF_KMEANS = f"""WITH c0 AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8
),
{_kmeans_iter_cte(1, "c0")},
{_kmeans_iter_cte(2, "c1")},
vc AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.embedding, c.ce), c.cid) AS rn
    FROM embeddings e CROSS JOIN c2 c) WHERE rn = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM vc a JOIN vc b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"""

# windowed HLL (stages/sketches.windowed_hll, width=3600s, p=8, over
# events.user_id): sparse (window, register, max_rank) rows — only
# touched registers, exactly what the engine ships
WINDOWED_HLL = f"""WITH __h AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
         CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM events
),
__r AS (SELECT window_start, h >> 24 AS register, h & 16777215 AS rem FROM __h),
__k AS (SELECT window_start, register, {_hll_rank_case()} AS rank FROM __r)
SELECT window_start, register, CAST(max(rank) AS BIGINT) AS max_rank
FROM __k GROUP BY window_start, register"""

# GPT-style sequence packing (stages/ordered.pack_sequences, budget=512):
# docs laid out in doc_id order; each doc assigned the sequence its first
# token falls in
PACK_SEQUENCES = """WITH __t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
__s AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start
  FROM __t
)
SELECT doc_id, n_tokens,
       CAST(start // 512 AS BIGINT) AS seq_id,
       CAST(start % 512 AS BIGINT) AS offset_in_seq
FROM __s"""

# shuffled-then-packed layout (stages/ordered.pack_sequences_shuffled,
# budget=512, salt='shuffle'): pack in deterministic-shuffle order
PACK_SEQUENCES_SHUFFLED = """WITH __t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM documents
),
__s AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start
  FROM __t
)
SELECT doc_id, n_tokens,
       CAST(start // 512 AS BIGINT) AS seq_id,
       CAST(start % 512 AS BIGINT) AS offset_in_seq
FROM __s"""

# C4-style normalization (stages/safety.normalize_text) over a corpus
# with deterministically-injected messy suffixes (the synthetic text is
# already clean; wrapper and SQL inject identically)
NORMALIZE_TEXT = """SELECT doc_id,
       trim(regexp_replace(lower(
         CASE WHEN doc_id % 5 = 0
              THEN text || '  MIXED   Case' || chr(9) || 'Tab' || chr(10) || 'End  '
              ELSE text END
       ), '[ \t\n]+', ' ', 'g')) AS norm_text
FROM documents"""

# reproducible global shuffle (stages/ordered.deterministic_shuffle,
# salt='shuffle'): rank under (md5int8('shuffle:'||key), key)
DETERMINISTIC_SHUFFLE = """SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY CAST(('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT),
                  doc_id) - 1 AS BIGINT) AS shuffle_pos
FROM documents"""

# benchmark n-gram decontamination (stages/safety.decontaminate, k=3,
# threshold_bp=1000): benchmark = documents with doc_id % 19 = 0; both
# sides match shingles by md5int8 so engine and SQL agree by construction
DECONTAMINATE = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__sh AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2]), 1, 8))
              AS BIGINT) AS h
  FROM (SELECT doc_id, parts, unnest(range(1, len(parts) - 1)) AS i FROM __p)
),
__bs AS (SELECT DISTINCT h FROM __sh WHERE doc_id % 19 = 0),
__cnt AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
  FROM __sh s LEFT JOIN __bs b USING (h) GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(c.n_shingles, 0) AS n_shingles,
       COALESCE(c.n_overlap, 0) AS n_overlap,
       CAST(10000 * COALESCE(c.n_overlap, 0)
            // GREATEST(COALESCE(c.n_shingles, 0), 1) AS BIGINT) AS contam_bp,
       CAST(CASE WHEN 10000 * COALESCE(c.n_overlap, 0)
                      // GREATEST(COALESCE(c.n_shingles, 0), 1) >= 1000
                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM documents d LEFT JOIN __cnt c USING (doc_id)"""

# PII count + redaction (stages/safety.pii_scrub) over a deterministic
# PII-injected corpus (the synthetic documents contain no PII, so the
# query wrapper and this SQL inject identical emails/phones first)
_PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+"
_PII_PHONE = r"\b[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]\b"
PII_SCRUB = f"""WITH __in AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' today'
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                      '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text
FROM __in"""

# Gopher-style repetition signals (stages/textstats.repetition_scores, k=3):
# fraction of repeated token trigrams + dominant-token fraction, integer bp
REPETITION_SCORES = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__base AS (
  SELECT doc_id, CAST(len(parts) AS BIGINT) AS n_tokens,
         CAST(GREATEST(len(parts) - 2, 0) AS BIGINT) AS n_kgrams
  FROM __p
),
__tri AS (
  SELECT doc_id, parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2] AS kg
  FROM (SELECT doc_id, parts, unnest(range(1, len(parts) - 1)) AS i FROM __p)
),
__dk AS (SELECT doc_id, count(DISTINCT kg) AS n_distinct_kg FROM __tri GROUP BY doc_id),
__top AS (
  SELECT doc_id, max(c) AS topc FROM (
    SELECT doc_id, w, count(*) AS c
    FROM (SELECT doc_id, unnest(parts) AS w FROM __p) GROUP BY doc_id, w
  ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_kgrams,
       CAST(10000 * (b.n_kgrams - COALESCE(d.n_distinct_kg, 0))
            // GREATEST(b.n_kgrams, 1) AS BIGINT) AS rep_kgram_bp,
       CAST(10000 * t.topc // GREATEST(b.n_tokens, 1) AS BIGINT) AS top_token_bp
FROM __base b
LEFT JOIN __dk d USING (doc_id)
JOIN __top t USING (doc_id)"""

# integer tf-idf surrogate (stages/textstats.tfidf_topk, top=3):
# score_ppb = 10^9 * tf // (n_tokens * df), ties by token asc
TFIDF_TOPK = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__tok AS (
  SELECT doc_id, CAST(len(parts) AS BIGINT) AS n_tokens, unnest(parts) AS w
  FROM __p
),
__tf AS (
  SELECT doc_id, w AS token, any_value(n_tokens) AS n_tokens,
         CAST(count(*) AS BIGINT) AS tf
  FROM __tok GROUP BY doc_id, w
),
__df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, w AS token FROM __tok) GROUP BY token
),
__s AS (
  SELECT t.doc_id, t.token, t.tf,
         CAST(1000000000 * t.tf // (t.n_tokens * d.df) AS BIGINT) AS score_ppb
  FROM __tf t JOIN __df d USING (token)
),
__r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_ppb DESC, token) AS rn
  FROM __s
)
SELECT doc_id, token, tf, score_ppb, CAST(rn AS BIGINT) AS rank
FROM __r WHERE rn <= 3"""

# truncated-postings inverted index (stages/textstats.inverted_index,
# max_postings=8): full df, first 8 doc_ids ascending
INVERTED_INDEX = """WITH __tok AS (
  SELECT DISTINCT doc_id, w AS token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
),
__r AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM __tok
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY rn) AS postings
FROM __r GROUP BY token"""

CURATE = f"""WITH {_CORPUS},
__q AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM __corpus
),
__f AS (
  SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens FROM __q
  WHERE n_tokens >= 5 AND 10000 * n_distinct // n_tokens >= 3000
)
SELECT doc_id, text, n_tokens FROM (
  SELECT doc_id, text, n_tokens,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM __f) WHERE rn = 1"""

# full training-prep composition (pipelines/curate.curate_decontam):
# quality filter -> benchmark decontamination (benchmark = documents with
# doc_id % 19 = 0, threshold 1000 bp) -> exact dedup keep-min-id
CURATE_DECONTAM = f"""WITH {_CORPUS},
__q AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM __corpus
),
__f AS (
  SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens FROM __q
  WHERE n_tokens >= 5 AND 10000 * n_distinct // n_tokens >= 3000
),
__shf AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2]), 1, 8))
              AS BIGINT) AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM __f) p,
       LATERAL (SELECT unnest(range(1, len(parts) - 1)) AS i) ix
),
__bs AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2]), 1, 8))
              AS BIGINT) AS h
  FROM (SELECT string_split(text, ' ') AS parts FROM documents WHERE doc_id % 19 = 0) p,
       LATERAL (SELECT unnest(range(1, len(parts) - 1)) AS i) ix
),
__cnt AS (
  SELECT s.doc_id, count(*) AS n_sh,
         SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_ov
  FROM __shf s LEFT JOIN __bs b USING (h) GROUP BY s.doc_id
),
__keep AS (
  SELECT f.doc_id, f.text, f.n_tokens
  FROM __f f LEFT JOIN __cnt c USING (doc_id)
  WHERE COALESCE(10000 * c.n_ov // GREATEST(c.n_sh, 1), 0) < 1000
)
SELECT doc_id, text, n_tokens FROM (
  SELECT doc_id, text, n_tokens,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM __keep) WHERE rn = 1"""

# incremental-crawl curation (pipelines/curate.curate_incremental):
# today's shard = __corpus; yesterday's digests = md5(text) of documents
# with doc_id % 3 = 0; content already in the prior corpus is dropped
CURATE_INCREMENTAL = f"""WITH {_CORPUS},
__q AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM __corpus
),
__f AS (
  SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens FROM __q
  WHERE n_tokens >= 5 AND 10000 * n_distinct // n_tokens >= 3000
),
__keep AS (
  SELECT min(doc_id) AS doc_id, md5(text) AS content_md5
  FROM __f GROUP BY md5(text)
),
__prior AS (
  SELECT DISTINCT md5(text) AS content_md5 FROM documents WHERE doc_id % 3 = 0
),
__fresh AS (
  SELECT k.doc_id FROM __keep k
  LEFT JOIN __prior p USING (content_md5) WHERE p.content_md5 IS NULL
)
SELECT f.doc_id, f.text, f.n_tokens FROM __f f JOIN __fresh USING (doc_id)"""

# generic hot-key histogram (stages/relational.top_values over
# events.user_id, k=20): skew diagnostics for partitioning decisions
TOP_VALUES = """SELECT value, cnt, CAST(rn AS BIGINT) AS rank FROM (
  SELECT user_id AS value, CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn
  FROM events GROUP BY user_id) WHERE rn <= 20"""

DEDUP_CLUSTERS = f"""WITH RECURSIVE __pairs AS ({MINHASH_LSH_STAR}),
{_cc_closure_cte("__pairs")}
SELECT node AS doc_id, r AS cluster_id FROM __cc"""

CURATE_NEARDUP = f"""WITH RECURSIVE {_CORPUS},
__q AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM __corpus
),
__f AS (
  SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens FROM __q
  WHERE n_tokens >= 5 AND 10000 * n_distinct // n_tokens >= 3000
),
{_minhash_star_pairs_cte("__f")},
{_cc_closure_cte("__mh_pairs")}
SELECT f.doc_id, f.text, f.n_tokens
FROM __f f LEFT JOIN __cc c ON c.node = f.doc_id
WHERE c.node IS NULL OR c.r = f.doc_id"""

CURATE_BUDGET = f"""WITH {_CORPUS},
__q AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM __corpus
),
__f AS (
  SELECT doc_id, text, n_tokens FROM __q
  WHERE n_tokens >= 5 AND 10000 * n_distinct // n_tokens >= 3000
),
__d AS (
  SELECT text, n_tokens FROM (
    SELECT text, n_tokens, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM __f) WHERE rn = 1
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM __d"""

# ------------------------------------------------------------- relational

REL_GROUPBY_AGG = """SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem GROUP BY 1, 2"""

REL_TOP_ORDERS = """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10"""

REL_SEMI_JOIN = """SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')"""

REL_REKEY_UNION = """WITH d AS (
  SELECT DISTINCT n.n_regionkey AS r_regionkey, c.c_custkey
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey,
       string_agg(CAST(c_custkey AS VARCHAR), ';;;' ORDER BY c_custkey) AS custkeys,
       count(*) AS n_cust
FROM d GROUP BY 1"""

REL_TOP_N_PER_GROUP = """SELECT o_custkey, o_orderkey, price_cents, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
         ) AS rnk
  FROM orders) WHERE rnk <= 3"""

REL_ANTI_JOIN = """SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')"""

# multi-probe variant: each query searches its 2 nearest centroid buckets
IVF_SEARCH_PROBE2 = """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
qc AS (
  SELECT qid, qe, cid FROM (
    SELECT q.qid, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.qid ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cid) AS rn
    FROM q, c) WHERE rn <= 2
),
vc AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
    FROM embeddings e, c) WHERE rn = 1
),
scored AS (
  SELECT DISTINCT qc.qid, vc.vec_id AS nid,
         list_cosine_similarity((SELECT qe FROM qc q2 WHERE q2.qid = qc.qid LIMIT 1), vc.embedding) AS sim
  FROM qc JOIN vc ON vc.cid = qc.cid AND vc.vec_id != qc.qid
)
SELECT qid, nid, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
  FROM scored) WHERE rnk <= 5"""

# as-of join (stages/relational.asof_join_events): DuckDB's native ASOF
# LEFT JOIN is the oracle; the right side is pre-deduped per (user, epoch)
# keeping max event_id so ties are deterministic on both sides
ASOF_JOIN = """WITH __l AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch FROM events
),
__rd AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
         max(event_id) AS ref_event_id
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
)
SELECT l.event_id,
       CAST(COALESCE(r.ref_event_id, -1) AS BIGINT) AS ref_event_id,
       CAST(COALESCE(l.epoch - r.epoch, -1) AS BIGINT) AS lag_s
FROM __l l ASOF LEFT JOIN __rd r
  ON l.user_id = r.user_id AND l.epoch >= r.epoch"""


def _range_join_sql() -> str:
    from bio_re_with_entity_embeddings_ray.stages.relational import PRICE_BANDS

    rows = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in PRICE_BANDS)
    return f"""SELECT o.o_orderkey, CAST(b.band_id AS BIGINT) AS band_id
FROM orders o
JOIN (VALUES {rows}) b(band_id, lo, hi)
  ON CAST(round(o.o_totalprice * 100) AS BIGINT) // 100 >= b.lo
 AND CAST(round(o.o_totalprice * 100) AS BIGINT) // 100 < b.hi"""


RANGE_JOIN = _range_join_sql()

ORDERS_DESCRIBE = """WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(cents) // count(*) AS BIGINT) AS mean_cents
FROM c"""

WINDOW_TUMBLING = """WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, (s // 3600) * 3600 AS window_start,
       count(*) AS n, CAST(SUM(cents) AS BIGINT) AS value_cents
FROM e GROUP BY 1, 2"""

WINDOW_HOPPING = """WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT event_type, (s // 1800) * 1800 - j * 1800 AS window_start, cents
  FROM e, unnest(range(0, 2)) AS t(j)
)
SELECT event_type, window_start, count(*) AS n, CAST(SUM(cents) AS BIGINT) AS value_cents
FROM w GROUP BY 1, 2"""

SESSIONIZE = """WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
),
l AS (SELECT user_id, s, lag(s) OVER (PARTITION BY user_id ORDER BY s) AS prev FROM e),
m AS (SELECT user_id, CASE WHEN prev IS NULL OR s - prev > 1800 THEN 1 ELSE 0 END AS ns FROM l)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM m GROUP BY user_id"""

# ------------------------------------------------------------- multimodal
# The media table is synthesized deterministically from documents
# (stages/multimodal.attach_media): payload = UTF-8 bytes of text, kind and
# dimensions pure functions of doc_id. These CTEs restate that derivation.

_MEDIA = """__media AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text)) AS len,
         16 + doc_id % 49 AS w,
         16 + doc_id % 33 AS h
  FROM documents
)"""

MEDIA_STATS = f"""WITH {_MEDIA}
SELECT doc_id, kind, CAST(len AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height
FROM __media"""

MEDIA_FEATURES = f"""WITH {_MEDIA}
SELECT doc_id, kind, CAST(len AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * 10000 // h AS BIGINT) AS aspect_bp
FROM __media"""

MEDIA_FRAMES = f"""WITH {_MEDIA},
__f AS (
  SELECT doc_id, len, unnest(range(0, CAST((len - 1) // 256 + 1 AS BIGINT), 2)) AS i
  FROM __media WHERE kind = 'video'
)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       CAST(LEAST(256, len - i * 256) AS BIGINT) AS n_bytes
FROM __f"""

MEDIA_RESIZE = f"""WITH {_MEDIA},
__r AS (
  SELECT doc_id, kind, len,
         CASE WHEN GREATEST(w, h) <= 32 THEN w
              WHEN w >= h THEN 32 ELSE w * 32 // h END AS nw,
         CASE WHEN GREATEST(w, h) <= 32 THEN h
              WHEN w >= h THEN h * 32 // w ELSE 32 END AS nh
  FROM __media
)
SELECT doc_id, kind, CAST(nw AS INT) AS width, CAST(nh AS INT) AS height,
       CAST(LEAST(len, nw * nh) AS BIGINT) AS n_bytes
FROM __r"""

# ------------------------------------------------- model scoring oracles
# Float outputs are projected to integer micro-units (round(1e6 * x) —
# "bp" columns) on BOTH sides: the driver hashes stringified values, and
# engine (numpy float64) vs DuckDB double agree to ~1e-15 relative, far
# inside the 1e-6 grid. Embeddings are CAST to DOUBLE[] in SQL because the
# stored lists are float32 and DuckDB would otherwise accumulate in
# float32 while the engine computes in float64.

# deterministic entity -> matrix row: md5int8(entity_id) % n over the
# vec_id-ORDERED matrix (stages/scoring.py TripleScorer._rows)
_EMB_POS = """__n AS (SELECT count(*) AS n FROM embeddings),
__pos AS (
  SELECT CAST(embedding AS DOUBLE[]) AS e,
         row_number() OVER (ORDER BY vec_id) - 1 AS p
  FROM embeddings
)"""

SCORED_TRIPLES = f"""WITH {_PAIR_CTE},
{_EMB_POS},
__k AS (
  SELECT subj_id, pred, obj_id, conv_ids, support,
         CAST(('0x' || substr(md5(subj_id), 1, 8)) AS BIGINT) % (SELECT n FROM __n) AS ps,
         CAST(('0x' || substr(md5(obj_id), 1, 8)) AS BIGINT) % (SELECT n FROM __n) AS po
  FROM __triples
)
SELECT k.subj_id, k.pred, k.obj_id, k.conv_ids, k.support,
       CAST(round(1000000 * list_cosine_similarity(a.e, b.e)) AS BIGINT) AS score_bp
FROM __k k JOIN __pos a ON a.p = k.ps JOIN __pos b ON b.p = k.po"""

# sigmoid(w . [subj_vec ++ obj_vec]) with the md5-derived placeholder
# weights of scoring.default_classifier_weights (dim = 64 -> 128 weights)
CLASSIFIED_TRIPLES = f"""WITH {_PAIR_CTE},
{_EMB_POS},
__w AS (
  SELECT j,
         0.3 * ((CAST(('0x' || substr(md5('w' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000) / 1000.0 AS w
  FROM range(0, 128) t(j)
),
__k AS (
  SELECT subj_id, pred, obj_id, conv_ids, support,
         CAST(('0x' || substr(md5(subj_id), 1, 8)) AS BIGINT) % (SELECT n FROM __n) AS ps,
         CAST(('0x' || substr(md5(obj_id), 1, 8)) AS BIGINT) % (SELECT n FROM __n) AS po
  FROM __triples
),
__v AS (
  SELECT k.subj_id, k.pred, k.obj_id, k.conv_ids, k.support,
         a.e AS se, sqrt(list_dot_product(a.e, a.e)) AS sn,
         b.e AS oe, sqrt(list_dot_product(b.e, b.e)) AS onn
  FROM __k k JOIN __pos a ON a.p = k.ps JOIN __pos b ON b.p = k.po
),
__z AS (
  SELECT subj_id, pred, obj_id, conv_ids, support,
         SUM(ws.w * se[t.j + 1] / sn + wo.w * oe[t.j + 1] / onn) AS z
  FROM __v
  CROSS JOIN range(0, 64) t(j)
  JOIN __w ws ON ws.j = t.j
  JOIN __w wo ON wo.j = t.j + 64
  GROUP BY 1, 2, 3, 4, 5
)
SELECT subj_id, pred, obj_id, conv_ids, support,
       CAST(round(1000000 / (1 + exp(-z))) AS BIGINT) AS prob_bp
FROM __z"""

# hashed-PPMI trainer (stages/embedding_train.py) at dim=32 over the
# doc2vec_input table, exploded to (tag, dim_idx, value_bp):
# count(tag, f) = token occurrences hashing to feature f across the tag's
# documents; PPMI = max(0, ln((c/g) / ((tag_total/g) * max(tot_f,1)/g)));
# then L2-normalize per tag.
LEARNED_EMBEDDINGS = f"""WITH {kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions),
__convs AS (
  SELECT conv_id, string_agg(text, ' ' ORDER BY turn_idx) AS text
  FROM transcripts_v GROUP BY conv_id
),
__toks AS (
  SELECT conv_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 32 AS f
  FROM (SELECT conv_id, unnest(string_split(text, ' ')) AS w FROM __convs)
),
__cnt AS (
  SELECT d.entity_id AS tag, t.f, count(*) AS c
  FROM __dm d JOIN __toks t ON d.conv_id = t.conv_id
  GROUP BY 1, 2
),
__dims AS (SELECT unnest(range(0, 32)) AS f),
__tot AS (
  SELECT d.f, COALESCE(SUM(c.c), 0) AS tc
  FROM __dims d LEFT JOIN __cnt c ON c.f = d.f GROUP BY d.f
),
__grand AS (SELECT GREATEST(SUM(c), 1) AS g FROM __cnt),
__tagtot AS (SELECT tag, GREATEST(SUM(c), 1.0) AS tt FROM __cnt GROUP BY tag),
__full AS (
  SELECT tg.tag, d.f, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT tag FROM __cnt) tg
  CROSS JOIN __dims d
  LEFT JOIN __cnt c ON c.tag = tg.tag AND c.f = d.f
),
__v AS (
  SELECT f.tag, f.f,
         CASE WHEN f.c > 0 THEN GREATEST(
           ln((CAST(f.c AS DOUBLE) / g.g) /
              ((tt.tt / g.g) * (GREATEST(t.tc, 1) / CAST(g.g AS DOUBLE)))), 0)
         ELSE 0 END AS v
  FROM __full f
  JOIN __tagtot tt ON tt.tag = f.tag
  JOIN __tot t ON t.f = f.f
  CROSS JOIN __grand g
),
__norm AS (SELECT tag, sqrt(SUM(v * v)) AS nn FROM __v GROUP BY tag)
SELECT v.tag, CAST(v.f AS BIGINT) AS dim_idx,
       CAST(round(1000000 * CASE WHEN n.nn > 0 THEN v.v / n.nn ELSE v.v END) AS BIGINT) AS value_bp
FROM __v v JOIN __norm n ON n.tag = v.tag"""

# --------------------------------------------------- sampling / corpus mix
# deterministic salted-hash sampling (stages/sampling.py): keep iff
# md5int8(salt || ':' || key) % 10000 < rate_bp

HASH_SAMPLE = """SELECT doc_id, text FROM documents
WHERE CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 2500"""

_SPLIT_HASH = (
    "CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"
)
HASH_SPLIT_TRAIN = f"SELECT doc_id, text FROM documents WHERE {_SPLIT_HASH} >= 1000"
HASH_SPLIT_VAL = f"SELECT doc_id, text FROM documents WHERE {_SPLIT_HASH} < 1000"

# mix: 70% of documents (salt mixA) ∪ 30% of the +1M shifted copy (salt mixB)
CORPUS_MIX = """SELECT doc_id, text FROM documents
WHERE CAST(('0x' || substr(md5('mixA:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 7000
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents
WHERE CAST(('0x' || substr(md5('mixB:' || CAST(doc_id + 1000000 AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 3000"""

# per-group cap (stages/sampling.cap_per_group): keep <= n rows per
# group by smallest salted key hash, ties by key
CAP_PER_GROUP = """SELECT doc_id, grp FROM (
  SELECT doc_id, doc_id % 7 AS grp,
         row_number() OVER (
           PARTITION BY doc_id % 7
           ORDER BY CAST(('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id
         ) AS rn
  FROM documents) WHERE rn <= 20"""

# ------------------------------------------------------- drop_duplicates

DROP_DUPLICATES = """SELECT o_custkey, o_orderkey, price_cents FROM (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
  FROM orders
) WHERE rn = 1"""

SIMHASH_NEAR_DUP = _simhash_near_dup_sql()

# ------------------------------------------------- round-3 tail additions

# SemDeDup semantic dedup (stages/clustering.semantic_dedup, k=8, iters=2,
# threshold=0.4): final assignment = one more kmeans-CTE step against the
# 2-iteration centroids (only its a3 member is referenced); a vector is
# dropped iff a lower-vec_id member of ITS cluster is cosine-similar above
# the threshold (keep-lowest-id representative)
SEMANTIC_DEDUP = f"""WITH c0 AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8
),
{_kmeans_iter_cte(1, "c0")},
{_kmeans_iter_cte(2, "c1")},
{_kmeans_iter_cte(3, "c2")},
__p AS (
  SELECT b.vec_id AS vb
  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
)
SELECT g.vec_id, g.cid AS cluster_id,
       CAST(CASE WHEN g.vec_id IN (SELECT vb FROM __p) THEN 0 ELSE 1 END
            AS BIGINT) AS keep
FROM a3 g"""

# BM25 top-k (stages/textstats.bm25_topk, query='join sort window', k=10,
# k1=1.2, b=0.75, Lucene non-negative idf): each (doc, term) contribution
# is floored to integer micro-units BEFORE the sum so the unordered SQL
# SUM and the engine's per-term accumulation agree exactly
BM25_TOPK = """WITH __t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
__g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM __t
),
__q AS (SELECT unnest(['join', 'sort', 'window']) AS qt),
__df AS (
  SELECT q.qt,
         (SELECT CAST(count(*) AS DOUBLE) FROM __t
          WHERE list_contains(toks, q.qt)) AS df
  FROM __q q
),
__tf AS (
  SELECT t.doc_id, q.qt, t.dl,
         CAST(len(list_filter(t.toks, x -> x = q.qt)) AS DOUBLE) AS tf
  FROM __t t CROSS JOIN __q q
),
__c AS (
  SELECT f.doc_id,
         CAST(floor(
           ln(1 + ((SELECT n FROM __g) - d.df + 0.5) / (d.df + 0.5))
           * f.tf * (1.2 + 1)
           / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / (SELECT avgdl FROM __g)))
           * 1000000) AS BIGINT) AS contrib_fp
  FROM __tf f JOIN __df d USING (qt)
  WHERE f.tf > 0
),
__s AS (
  SELECT doc_id, SUM(contrib_fp) AS score_fp FROM __c GROUP BY doc_id
  HAVING SUM(contrib_fp) > 0
)
SELECT doc_id, CAST(score_fp AS BIGINT) AS score_fp, CAST(rn AS BIGINT) AS rank
FROM (SELECT doc_id, score_fp,
             row_number() OVER (ORDER BY score_fp DESC, doc_id) AS rn
      FROM __s)
WHERE rn <= 10"""

# percentile-threshold quality gate (pipelines/curate.curate_percentile,
# q_bp=2500): threshold = value at 1-based position ceil(q*n/10000) of the
# ascending token counts (the exact_quantiles rule); survivors keep their
# counts
CURATE_PERCENTILE = """WITH __t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
__n AS (SELECT count(*) AS n FROM __t),
__r AS (SELECT n_tokens AS v, row_number() OVER (ORDER BY n_tokens) AS rn
        FROM __t),
__thr AS (SELECT v FROM __r
          WHERE rn = GREATEST(1, (2500 * (SELECT n FROM __n) + 9999) // 10000))
SELECT doc_id, n_tokens FROM __t
WHERE n_tokens >= (SELECT v FROM __thr)"""

# real-WAV audio features (stages/multimodal.attach_audio +
# AudioFeaturizer): the oracle recomputes from the PCM generation formula
# — it never sees the RIFF container — so a hash match proves the
# engine's actual header parse + int16 decode; rms uses an exact int64
# sum of squares with only the final sqrt in float
AUDIO_FEATURES = """WITH __p AS (
  SELECT doc_id, 256 + (doc_id % 16) * 32 AS n,
         8000 + (doc_id % 3) * 4000 AS sr
  FROM documents
),
__v AS (
  SELECT doc_id, n, sr,
         ((doc_id * 31 + unnest(range(0, n)) * 7) % 65536) - 32768 AS x
  FROM __p
),
__a AS (
  SELECT doc_id, any_value(n) AS n, any_value(sr) AS sr,
         SUM(x * x) AS ss, MAX(ABS(x)) AS peak
  FROM __v GROUP BY doc_id
)
SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // sr AS BIGINT) AS duration_ms,
       CAST(floor(sqrt(CAST(ss AS DOUBLE) / n) * 1000) AS BIGINT) AS rms_milli,
       CAST(peak AS BIGINT) AS peak
FROM __a"""

# exact-substring duplication coverage (stages/dedup.duplicate_spans,
# k=3): fraction of a doc's k-gram positions whose gram occurs in >= 2
# distinct docs; gram identity = md5int8 of the ' '-joined gram (the
# repo-standard 32-bit digest — engine and oracle share any collisions)
DUPLICATE_SPANS = """WITH __t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
__i AS (
  SELECT doc_id, toks, unnest(range(0, len(toks) - 3 + 1)) AS i FROM __t
),
__g AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(array_to_string(toks[i + 1:i + 3], ' ')), 1, 8))
              AS BIGINT) AS g
  FROM __i
),
__df AS (SELECT g, count(DISTINCT doc_id) AS nd FROM __g GROUP BY g),
__d AS (
  SELECT gr.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE df.nd >= 2) AS BIGINT) AS dup_grams
  FROM __g gr JOIN __df df USING (g) GROUP BY gr.doc_id
)
SELECT doc_id, n_grams, dup_grams,
       CAST(10000 * dup_grams // n_grams AS BIGINT) AS dup_bp
FROM __d"""

# corpus bigram-LM NLL (stages/textstats.bigram_nll, Laplace smoothing):
# per-position contribution floored to integer micro-nats before the sum
# so the unordered SQL SUM matches the engine's accumulation; V counts
# distinct tokens over ALL positions (incl. doc-final)
BIGRAM_NLL = """WITH __t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
__i AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i FROM __t),
__p AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2 FROM __i),
__b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM __p GROUP BY w1, w2),
__c AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cc FROM __b GROUP BY w1),
__v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS w FROM __t)),
__s AS (
  SELECT p.doc_id,
         CAST(floor(-ln((b.cb + 1.0) / (c.cc + (SELECT v FROM __v))) * 1000000)
              AS BIGINT) AS nfp
  FROM __p p JOIN __b b USING (w1, w2) JOIN __c c USING (w1)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nfp) AS BIGINT) AS nll_fp
FROM __s GROUP BY doc_id"""

# generic row-level inner equi-join (stages/relational.hash_join):
# customer dimension x orders fact; same result for the broadcast and
# the native shuffle plan
REL_HASH_JOIN = """SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey"""

# BPE-ish regex pre-token counts (stages/textstats.token_counts_regex):
# RE2 pattern shared verbatim with the engine
TOKEN_COUNTS_REGEX = """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents"""

# Count-Min sketch counters (stages/sketches.cms_registers over
# events.user_id, depth=4, width=256): dense (row, register, cnt) —
# exact integers, same md5 discipline as the HLL registers
CMS_REGISTERS = """WITH __h AS (
  SELECT t.j,
         CAST(('0x' || substr(md5('cms' || CAST(t.j AS VARCHAR) || ':'
                                  || CAST(e.user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 256 AS w
  FROM events e CROSS JOIN range(0, 4) t(j)
),
__c AS (SELECT j, w, CAST(count(*) AS BIGINT) AS cnt FROM __h GROUP BY j, w),
__all AS (
  SELECT CAST(a.j AS BIGINT) AS j, CAST(b.w AS BIGINT) AS w
  FROM range(0, 4) a(j) CROSS JOIN range(0, 256) b(w)
)
SELECT a.j AS row, a.w AS register, COALESCE(c.cnt, 0) AS cnt
FROM __all a LEFT JOIN __c c ON a.j = c.j AND a.w = c.w"""

# row-level LEFT join (stages/relational.hash_join, how="left"):
# orderless customers keep one null-coalesced row
REL_LEFT_JOIN = """SELECT c.c_custkey, c.c_name,
       COALESCE(o.o_orderkey, -1) AS o_orderkey,
       COALESCE(CAST(round(o.o_totalprice * 100) AS BIGINT), -1) AS price_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey"""

# paragraph-level exact dedup (stages/dedup.paragraph_dedup): fixed
# 8-token chunks of the doubled corpus; a chunk survives only at its
# lexicographically-smallest (doc_id, pidx). The arithmetic winner rank
# (doc_id * 2^20 + pidx) equals the engine's lexicographic min while
# pidx < 2^20 (docs here are tens of tokens). Docs losing every chunk
# stay with n_kept = 0 / ''; text = '' has no chunks (string_split('',
# ' ') = [] matches the engine's empty-text guard).
PARAGRAPH_DEDUP = f"""WITH {_CORPUS},
__pd_cp AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM __corpus WHERE text <> ''
),
__pd_tok AS (
  SELECT doc_id, unnest(parts) AS tok, generate_subscripts(parts, 1) AS ord
  FROM __pd_cp
),
__pd_para AS (
  SELECT doc_id, (ord - 1) // 8 AS pidx,
         string_agg(tok, ' ' ORDER BY ord) AS para
  FROM __pd_tok GROUP BY doc_id, pidx
),
__pd_win AS (
  SELECT para, min(doc_id * 1048576 + pidx) AS w FROM __pd_para GROUP BY para
),
__pd_kept AS (
  SELECT p.doc_id, p.pidx, p.para
  FROM __pd_para p JOIN __pd_win w ON p.para = w.para
  WHERE p.doc_id * 1048576 + p.pidx = w.w
),
__pd_n AS (SELECT doc_id, count(*) AS n_paras FROM __pd_para GROUP BY doc_id),
__pd_k AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(para, ' ' ORDER BY pidx) AS text_dedup
  FROM __pd_kept GROUP BY doc_id
)
SELECT n.doc_id, n.n_paras, COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.text_dedup, '') AS text_dedup
FROM __pd_n n LEFT JOIN __pd_k k ON n.doc_id = k.doc_id"""

# per-user rolling window (stages/relational.rolling_per_key): values
# floored to integer milli-units BEFORE the windowed SUM so accumulation
# order cannot matter; (ts, event_id) is the shared unique tiebreak
ROLLING_WINDOW = """WITH __rv AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events
)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS roll_n,
       CAST(sum(v_milli) OVER w AS BIGINT) AS roll_sum_milli
FROM __rv
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""

# distributed ROW_NUMBER + equi-depth decile (stages/ordered.global_rank):
# tile = (rank-1) * 10 // total — exact equi-depth, NOT SQL NTILE (whose
# remainder-balancing differs)
GLOBAL_RANK = """WITH __gr AS (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rank
  FROM documents
)
SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank,
       CAST((rank - 1) * 10 // (SELECT count(*) FROM documents) AS BIGINT) AS tile
FROM __gr"""

# full outer join (stages/relational.hash_join, how="outer"): planted
# unmatched keys on both sides; key coalesced across sides
REL_FULL_JOIN = """WITH __fl AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 != 0
),
__fr AS (
  SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_custkey % 3 != 2
)
SELECT COALESCE(l.c_custkey, r.o_custkey) AS c_custkey,
       COALESCE(l.c_name, '') AS c_name,
       COALESCE(r.o_orderkey, -1) AS o_orderkey,
       COALESCE(CAST(round(r.o_totalprice * 100) AS BIGINT), -1) AS price_cents
FROM __fl l FULL OUTER JOIN __fr r ON l.c_custkey = r.o_custkey"""


# ------------------------------------------------------------- graph family
# Untyped entity co-occurrence graph (stages/graph.cooccurrence_graph):
# symmetric distinct edges over ALL mention types — the shared input of
# the pagerank / neighbor_sample / triangle_counts oracles. The typed
# pair tables are bipartite; closed-walk statistics need this projection.
_COOC_EDGES = f"""{kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions),
__und AS (
  SELECT DISTINCT a.entity_id AS lo, b.entity_id AS hi
  FROM __dm a JOIN __dm b
    ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
),
__e AS (
  SELECT lo AS src, hi AS dst FROM __und
  UNION ALL
  SELECT hi AS src, lo AS dst FROM __und
)"""

# Bounded-hop reachability (stages/graph.reachable_k): recursive CTE
# with a depth bound; min(dist) = BFS first-discovery depth
REACHABLE_K = f"""WITH RECURSIVE {_COOC_EDGES},
__seed AS (SELECT DISTINCT src AS node FROM __e WHERE src LIKE 'TOOL:%'),
__r AS (
  SELECT node, 0 AS dist FROM __seed
  UNION
  SELECT e.dst AS node, r.dist + 1 AS dist
  FROM __r r JOIN __e e ON e.src = r.node
  WHERE r.dist < 2
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM __r GROUP BY node"""

COOC_EDGES = f"""WITH {_COOC_EDGES}
SELECT src, dst FROM __e"""

# Integer-exact PageRank (stages/graph.pagerank, iters=2, damping 85/100,
# scale 10^12): the fixed-point recurrence is pinned to int64 floor
# division on BOTH sides, so SUM order never matters.
def _pagerank_iter_cte(i: int, prev: str) -> str:
    return f"""r{i} AS (
  SELECT n.node,
         (SELECT b FROM __base) + COALESCE(s.c, 0) AS r
  FROM __nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((85 * (p.r // d.deg)) // 100) AS c
    FROM __e e
    JOIN {prev} p ON e.src = p.node
    JOIN __deg d ON e.src = d.node
    GROUP BY e.dst
  ) s USING (node)
)"""


PAGERANK = f"""WITH {_COOC_EDGES},
__nodes AS (SELECT DISTINCT src AS node FROM __e),
__n AS (SELECT count(*) AS n FROM __nodes),
__deg AS (SELECT src AS node, count(*) AS deg FROM __e GROUP BY src),
__base AS (SELECT (15 * (1000000000000 // n)) // 100 AS b FROM __n),
r0 AS (SELECT node, (SELECT 1000000000000 // n FROM __n) AS r FROM __nodes),
{_pagerank_iter_cte(1, "r0")},
{_pagerank_iter_cte(2, "r1")}
SELECT node, CAST(r AS BIGINT) AS rank_mu FROM r2"""

# Deterministic neighbor sampling (stages/graph.neighbor_sample, k=3,
# salt='nbr'): keep the k smallest (md5int8('nbr:'||src||'|'||dst), dst)
NEIGHBOR_SAMPLE = f"""WITH {_COOC_EDGES},
__h AS (
  SELECT src, dst,
         CAST(('0x' || substr(md5('nbr:' || src || '|' || dst), 1, 8))
              AS BIGINT) AS h
  FROM __e
),
__rn AS (
  SELECT src, dst, h,
         row_number() OVER (PARTITION BY src ORDER BY h, dst) AS rn
  FROM __h
)
SELECT src, dst, h FROM __rn WHERE rn <= 3"""

# Per-node triangle counts (stages/graph.triangle_counts): orient each
# undirected edge from lower (deg, node) rank to higher; a triangle is a
# closed wedge — counted once in canonical orientation — credited to all
# three corners.
TRIANGLE_COUNTS = f"""WITH {_COOC_EDGES},
__deg AS (SELECT src AS node, count(*) AS deg FROM __e GROUP BY src),
__rank AS (
  SELECT node, row_number() OVER (ORDER BY deg, node) AS rk FROM __deg
),
__o AS (
  SELECT e.src AS a, e.dst AS b
  FROM __e e
  JOIN __rank ra ON e.src = ra.node
  JOIN __rank rb ON e.dst = rb.node
  WHERE ra.rk < rb.rk
),
__tri AS (
  SELECT x.a, x.b, y.b AS c
  FROM __o x
  JOIN __o y ON x.a = y.a AND x.b <> y.b
  JOIN __o z ON z.a = x.b AND z.b = y.b
)
SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
  SELECT a AS node FROM __tri
  UNION ALL SELECT b FROM __tri
  UNION ALL SELECT c FROM __tri
) GROUP BY node"""


# right outer join (stages/relational.hash_join, how="right"): orders of
# customers ≡ 0 mod 3 removed, so those customers survive only as
# unmatched right rows; key coalesced under the left name
REL_RIGHT_JOIN = """WITH __rl AS (
  SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_custkey % 3 != 0
)
SELECT COALESCE(l.o_custkey, r.c_custkey) AS o_custkey,
       COALESCE(l.o_orderkey, -1) AS o_orderkey,
       COALESCE(CAST(round(l.o_totalprice * 100) AS BIGINT), -1) AS price_cents,
       r.c_name
FROM __rl l RIGHT JOIN customer r ON l.o_custkey = r.c_custkey"""

# exact-integer covariance accumulation (stages/clustering.
# embedding_covariance, COV_BP=10000): values quantized ONCE to int64
# fixed point, every later op integer — summation order can't matter
EMBEDDING_COVARIANCE = """WITH __q AS (
  SELECT vec_id,
         CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT) AS q,
         CAST(i AS BIGINT) AS i
  FROM (
    SELECT vec_id, unnest(embedding) AS v,
           unnest(range(1, 1 + len(embedding))) AS i
    FROM embeddings
  )
),
__n AS (SELECT count(DISTINCT vec_id) AS n FROM __q),
__x AS (SELECT i, SUM(q) AS sx FROM __q GROUP BY i),
__xx AS (
  SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS sxy
  FROM __q a JOIN __q b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT xx.i AS dim_i, xx.j AS dim_j,
       CAST((SELECT n FROM __n) * xx.sxy - xa.sx * xb.sx AS BIGINT) AS cov_num
FROM __xx xx JOIN __x xa ON xx.i = xa.i JOIN __x xb ON xx.j = xb.i"""

# grouped HLL (stages/sketches.grouped_hll over events: distinct user_id
# per event_type, p=8, salt='hll'): sparse exact-integer register rows
GROUPED_HLL = f"""WITH __h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM events
),
__r AS (SELECT event_type, h >> 24 AS register, h & 16777215 AS rem FROM __h),
__k AS (SELECT event_type, register, {_hll_rank_case()} AS rank FROM __r)
SELECT event_type, register, CAST(max(rank) AS BIGINT) AS max_rank
FROM __k GROUP BY event_type, register"""


# Bloom-filter semi-join (stages/relational.bloom_semi_join, m=4096,
# k=3, pos_j(x) = md5int8('bloom{j}:' || x) % m): survivor set mirrored
# exactly, deterministic false positives included
def _bloom_pos(expr: str, j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('bloom{j}:' || CAST({expr} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % 4096"
    )


BLOOM_SEMI_JOIN = f"""WITH __bp AS (
  SELECT DISTINCT {_bloom_pos('o_custkey', 0)} AS pos FROM orders
  UNION SELECT DISTINCT {_bloom_pos('o_custkey', 1)} FROM orders
  UNION SELECT DISTINCT {_bloom_pos('o_custkey', 2)} FROM orders
)
SELECT c_custkey, c_name FROM customer
WHERE {_bloom_pos('c_custkey', 0)} IN (SELECT pos FROM __bp)
  AND {_bloom_pos('c_custkey', 1)} IN (SELECT pos FROM __bp)
  AND {_bloom_pos('c_custkey', 2)} IN (SELECT pos FROM __bp)"""


# LSH-bucketed ANN (stages/scoring.lsh_assign / ann_lsh_search,
# planes=8, LSH_BP=10000): ±1 hyperplanes from md5 parity, sign test on
# the exact integer quantization — bucket assignment is bit-identical
_LSH_BUCKETS = """__q AS (
  SELECT vec_id,
         CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT) AS q,
         CAST(i AS BIGINT) AS i
  FROM (
    SELECT vec_id, unnest(embedding) AS v,
           unnest(range(1, 1 + len(embedding))) AS i
    FROM embeddings
  )
),
__dims AS (SELECT DISTINCT i FROM __q),
__s AS (
  SELECT b, i,
         CASE WHEN CAST(('0x' || substr(md5('lsh:' || b || ':' || i), 1, 8))
                   AS BIGINT) & 1 = 1 THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range(0, 8)) AS b), __dims
),
__dot AS (
  SELECT q.vec_id, s.b, SUM(s.s * q.q) AS dp
  FROM __q q JOIN __s s ON q.i = s.i
  GROUP BY q.vec_id, s.b
),
__bucket AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dp > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bucket
  FROM __dot GROUP BY vec_id
)"""

LSH_ASSIGN = f"""WITH {_LSH_BUCKETS}
SELECT vec_id, bucket FROM __bucket"""

ANN_LSH_SEARCH = f"""WITH {_LSH_BUCKETS},
__qs AS (
  SELECT e.vec_id AS qid, e.embedding AS qe, b.bucket
  FROM embeddings e JOIN __bucket b USING (vec_id) WHERE e.vec_id < 5
),
__scored AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM __qs q
  JOIN __bucket b ON b.bucket = q.bucket
  JOIN embeddings e ON e.vec_id = b.vec_id AND e.vec_id <> q.qid
)
SELECT qid, nid, CAST(rk AS BIGINT) AS rank FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
  FROM __scored) WHERE rk <= 5"""


# Two-hop GNN frontier (stages/graph.khop_sample, k1=3, k2=2, salts
# nbr1/nbr2): layer-wise deterministic sampling, hop-2 sample shared
# between seeds (the sample-once-per-node-per-layer GraphSAGE variant)
def _nbr_cte(name: str, salt: str, k: int) -> str:
    return f"""{name} AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY h, dst) AS rn
    FROM (
      SELECT src, dst,
             CAST(('0x' || substr(md5('{salt}:' || src || '|' || dst), 1, 8))
                  AS BIGINT) AS h
      FROM __e
    )
  ) WHERE rn <= {k}
)"""


KHOP_SAMPLE = f"""WITH {_COOC_EDGES},
{_nbr_cte("__h1", "nbr1", 3)},
{_nbr_cte("__h2", "nbr2", 2)}
SELECT a.src AS seed, a.dst AS hop1, b.dst AS hop2
FROM __h1 a JOIN __h2 b ON a.dst = b.src"""

# Percentile winsorization (stages/textstats.winsorize over documents
# n_chars, [p5, p95], exact_quantiles position rule)
WINSORIZE = """WITH __n AS (SELECT count(*) AS n FROM documents),
__r AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn FROM documents
),
__lo AS (
  SELECT n_chars AS v FROM __r, __n
  WHERE rn = GREATEST(1, (500 * n + 9999) // 10000)
),
__hi AS (
  SELECT n_chars AS v FROM __r, __n
  WHERE rn = GREATEST(1, (9500 * n + 9999) // 10000)
)
SELECT doc_id, n_chars,
       CAST(LEAST(GREATEST(n_chars, (SELECT v FROM __lo)),
                  (SELECT v FROM __hi)) AS BIGINT) AS clipped
FROM documents"""


# Per-edge neighborhood Jaccard (stages/graph.edge_jaccard): common
# neighbors via closed wedges in canonical (deg, node)-rank orientation;
# jaccard_bp = 10000 * common // (deg(a) + deg(b) - common)
EDGE_JACCARD = f"""WITH {_COOC_EDGES},
__deg AS (SELECT src AS node, count(*) AS deg FROM __e GROUP BY src),
__rank AS (
  SELECT node, row_number() OVER (ORDER BY deg, node) AS rk FROM __deg
),
__o AS (
  SELECT e.src AS a, e.dst AS b
  FROM __e e
  JOIN __rank ra ON e.src = ra.node
  JOIN __rank rb ON e.dst = rb.node
  WHERE ra.rk < rb.rk
),
__tri AS (
  SELECT x.a, x.b, y.b AS c
  FROM __o x
  JOIN __o y ON x.a = y.a AND x.b <> y.b
  JOIN __o z ON z.a = x.b AND z.b = y.b
),
__common AS (
  SELECT x, y, count(*) AS common FROM (
    SELECT a AS x, b AS y FROM __tri
    UNION ALL SELECT a, c FROM __tri
    UNION ALL SELECT b, c FROM __tri
  ) GROUP BY x, y
)
SELECT LEAST(x, y) AS lo, GREATEST(x, y) AS hi,
       CAST(common AS BIGINT) AS common,
       CAST(10000 * common // (da.deg + db.deg - common) AS BIGINT)
         AS jaccard_bp
FROM __common c
JOIN __deg da ON c.x = da.node
JOIN __deg db ON c.y = db.node"""

# Deterministic walk corpus (stages/graph.deterministic_walks, length=3,
# per-step salts walk1..walk3, k=1 argmin-hash transitions)
DETERMINISTIC_WALKS = f"""WITH {_COOC_EDGES},
{_nbr_cte("__w1", "walk1", 1)},
{_nbr_cte("__w2", "walk2", 1)},
{_nbr_cte("__w3", "walk3", 1)}
SELECT a.src AS start, a.dst AS n1, b.dst AS n2, c.dst AS n3
FROM __w1 a
JOIN __w2 b ON a.dst = b.src
JOIN __w3 c ON b.dst = c.src"""


# Weighted Bernoulli sample (stages/sampling.weighted_sample over
# documents, weight=n_chars, scale=10000, salt='wsample')
WEIGHTED_SAMPLE = """SELECT doc_id, n_chars FROM documents
WHERE CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000 < LEAST(n_chars, 10000)"""

# Pivot aggregate (stages/relational.pivot_counts over events by
# user_id x event_type, static column set)
PIVOT_COUNTS = """SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id"""


# Fixed-round k-core peel (stages/graph.kcore, k=2, rounds=3): unrolled
# degree/filter rounds, residual degree of the survivors
def _kcore_round(i: int, prev: str) -> str:
    return f"""d{i} AS (SELECT src AS node, count(*) AS deg FROM {prev} GROUP BY src),
k{i} AS (SELECT node FROM d{i} WHERE deg >= 2),
e{i} AS (
  SELECT src, dst FROM {prev}
  WHERE src IN (SELECT node FROM k{i}) AND dst IN (SELECT node FROM k{i})
)"""


KCORE = f"""WITH {_COOC_EDGES},
e0 AS (SELECT src, dst FROM __e),
{_kcore_round(1, "e0")},
{_kcore_round(2, "e1")},
{_kcore_round(3, "e2")},
d4 AS (SELECT src AS node, count(*) AS deg FROM e3 GROUP BY src)
SELECT node, CAST(deg AS BIGINT) AS deg FROM d4 WHERE deg >= 2"""

# Spelling-variant pairs (stages/textstats.fuzzy_token_pairs,
# min_len=4): the oracle verifies the FastSS blocking INDEPENDENTLY —
# a brute-force levenshtein self-join over the vocabulary, so any pair
# the deletion-key blocking missed would surface as a mismatch
FUZZY_TOKEN_PAIRS = """WITH __docs AS (
  SELECT text FROM documents
  UNION ALL
  SELECT 'mergee slowx tablle filte'
),
__vocab AS (
  SELECT DISTINCT w FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM __docs
  ) WHERE length(w) >= 4
)
SELECT a.w AS a, b.w AS b
FROM __vocab a JOIN __vocab b
  ON a.w < b.w AND levenshtein(a.w, b.w) <= 1"""


# Multi-way join rollup (stages/relational.revenue_by_nation, TPC-H Q5
# shape): revenue per nation, integer cents per row before summation
REL_MULTI_JOIN = """SELECT n.n_name,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""

# Arrow list flatten (stages/relational.explode_list over the
# conv->entity-list table): SQL unnest semantics
EXPLODE_LIST = f"""WITH {kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions),
__g AS (
  SELECT conv_id, list(entity_id ORDER BY entity_id) AS entity_ids,
         CAST(count(*) AS INT) AS n_entities
  FROM __dm GROUP BY conv_id
)
SELECT conv_id, n_entities, unnest(entity_ids) AS entity_id FROM __g"""


# CDC keep-latest compaction (stages/aggregate.keep_latest over events
# by (user_id, event_type), order (ts, event_id))
KEEP_LATEST = """SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1"""


# Robust median/MAD outliers (stages/relational.robust_outliers, k=3):
# both scalars are exact quantiles under the engine's position rule
# pos = GREATEST(1, ceil(q*n/10000)) over ascending values
ROBUST_OUTLIERS = """WITH __v AS (
  SELECT event_id, CAST(round(value * 1000) AS BIGINT) AS v_milli FROM events
),
__n AS (SELECT count(*) AS n FROM __v),
__med AS (
  SELECT v_milli AS m FROM (
    SELECT v_milli, row_number() OVER (ORDER BY v_milli) AS rn FROM __v
  ), __n WHERE rn = GREATEST(1, (5000 * n + 9999) // 10000)
),
__d AS (
  SELECT event_id, v_milli,
         abs(v_milli - (SELECT m FROM __med)) AS dev_milli
  FROM __v
),
__mad AS (
  SELECT dev_milli AS m FROM (
    SELECT dev_milli, row_number() OVER (ORDER BY dev_milli) AS rn FROM __d
  ), __n WHERE rn = GREATEST(1, (5000 * n + 9999) // 10000)
)
SELECT event_id, v_milli, dev_milli FROM __d
WHERE dev_milli > 3 * (SELECT m FROM __mad)"""


# Typo-tolerant entity linking (stages/mentions.fuzzy_link, min_len=4):
# independent brute-force levenshtein join against the gazetteer — any
# pair the FastSS index missed would surface as a mismatch
FUZZY_LINK = f"""WITH {transcripts_sql_cte()}
SELECT DISTINCT t.conv_id, gz.entity_id, lower(t.w) AS token
FROM __tok t JOIN {_GZ}
  ON levenshtein(lower(t.w), gz.surface) <= 1
WHERE length(t.w) >= 4"""


# Temporal triples (stages/pairs.temporal_triples): validity windows in
# exact epoch seconds from the supporting conversations
TEMPORAL_TRIPLES = f"""WITH {kg_cte()},
__src AS (SELECT DISTINCT conv_id, entity_id AS subj_id FROM __mentions WHERE entity_type = 'op'),
__tgt AS (SELECT DISTINCT conv_id, entity_id AS obj_id FROM __mentions WHERE entity_type = 'res'),
__cp AS (SELECT s.conv_id, s.subj_id, t.obj_id FROM __src s JOIN __tgt t ON s.conv_id = t.conv_id),
__ts AS (
  SELECT conv_id,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS first_s,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s
  FROM transcripts_v GROUP BY conv_id
)
SELECT cp.subj_id, 'applies_to' AS pred, cp.obj_id,
       CAST(count(*) AS BIGINT) AS support,
       MIN(t.first_s) AS first_s, MAX(t.last_s) AS last_s
FROM __cp cp JOIN __ts t USING (conv_id)
GROUP BY cp.subj_id, cp.obj_id"""

# Deterministic negative sampling (stages/pairs.triple_negatives,
# salt='neg'): corrupted object = vocab[h % n], bumped on self-clash
TRIPLE_NEGATIVES = f"""WITH {_PAIR_CTE},
__pos AS (SELECT subj_id, obj_id FROM __triples),
__vocab AS (
  SELECT obj_id AS v,
         row_number() OVER (ORDER BY obj_id) - 1 AS idx
  FROM (SELECT DISTINCT obj_id FROM __pos)
),
__n AS (SELECT count(*) AS n FROM __vocab),
__h AS (
  SELECT subj_id, obj_id,
         CAST(('0x' || substr(md5('neg:' || subj_id || '|' || obj_id), 1, 8))
              AS BIGINT) % (SELECT n FROM __n) AS h
  FROM __pos
)
SELECT h.subj_id, h.obj_id,
       CASE WHEN v1.v = h.obj_id THEN v2.v ELSE v1.v END AS neg_obj_id
FROM __h h
JOIN __vocab v1 ON v1.idx = h.h
JOIN __vocab v2 ON v2.idx = (h.h + 1) % (SELECT n FROM __n)"""


# Trending per tumbling window (stages/relational.windowed_topk,
# width=3600s, k=3): rank = (count DESC, type ASC)
WINDOWED_TOPK = """WITH __w AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
         event_type
  FROM events
),
__c AS (
  SELECT window_start, event_type, count(*) AS n
  FROM __w GROUP BY window_start, event_type
)
SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rank
  FROM __c
) WHERE rank <= 3"""

# Schema-drift union (stages/relational.union_by_name): narrow shard
# null-padded, sentinels coalesced
UNION_BY_NAME = """SELECT doc_id, text, lang, n_chars FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text, '' AS lang,
       CAST(-1 AS BIGINT) AS n_chars
FROM documents"""

# Role-transition Markov counts (stages/relational.role_transitions):
# LAG over (conv_id, turn_idx), first turns excluded
ROLE_TRANSITIONS = f"""WITH {transcripts_sql_cte()},
__l AS (
  SELECT role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts_v
)
SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n
FROM __l WHERE prev_role IS NOT NULL
GROUP BY prev_role, role"""

# Consecutive-duplicate turn removal (stages/relational.
# drop_repeated_turns): the engine query doubles every turn
# (turn_idx -> 2i, 2i+1) so the dedup path actually fires; survivors
# are exactly the even copies
DROP_REPEATED_TURNS = f"""WITH {transcripts_sql_cte()},
__doubled AS (
  SELECT conv_id, CAST(turn_idx * 2 AS INT) AS turn_idx, role, text, tool, ts
  FROM transcripts_v
  UNION ALL
  SELECT conv_id, CAST(turn_idx * 2 + 1 AS INT) AS turn_idx, role, text, tool, ts
  FROM transcripts_v
),
__l AS (
  SELECT *, LAG(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
  FROM __doubled
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM __l WHERE prev_text IS NULL OR text <> prev_text"""

# Per-conversation profile row (stages/relational.conv_stats)
CONV_STATS = f"""WITH {transcripts_sql_cte()}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
       CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
       CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
FROM transcripts_v GROUP BY conv_id"""

# Distinct set operations (stages/relational.set_op): doc ids in the
# English shard vs the long-document shard
_SETOP_A = "SELECT doc_id FROM documents WHERE lang = 'en'"
_SETOP_B = "SELECT doc_id FROM documents WHERE n_chars >= 300"
REL_INTERSECT = f"{_SETOP_A} INTERSECT {_SETOP_B}"
REL_EXCEPT = f"{_SETOP_A} EXCEPT {_SETOP_B}"

# Grouping-sets rollup (stages/relational.rollup_counts):
# GROUP BY ROLLUP(lang, source) with '*' as the rolled-up sentinel
ROLLUP_COUNTS = """SELECT COALESCE(lang, '*') AS lang,
       COALESCE(source, '*') AS source,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)"""

# BPE first-merge pair counts (stages/textstats.bpe_pair_counts, k=20):
# adjacent token pairs, rank = (count DESC, w1, w2)
BPE_PAIR_COUNTS = """WITH __t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
),
__i AS (SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM __t),
__p AS (SELECT toks[i + 1] AS w1, toks[i + 2] AS w2 FROM __i),
__c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM __p GROUP BY w1, w2)
SELECT w1, w2, n, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT w1, w2, n,
         row_number() OVER (ORDER BY n DESC, w1, w2) AS rank
  FROM __c
) WHERE rank <= 20"""

# Per-document unigram entropy in integer micro-nats
# (stages/textstats.doc_entropy): per-token-type contributions floored
# BEFORE the sum (bigram_nll discipline)
DOC_ENTROPY = """WITH __t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
__w AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS w FROM __t),
__c AS (
  SELECT doc_id, any_value(n) AS n, w, CAST(count(*) AS BIGINT) AS c
  FROM __w GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(any_value(n) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor(c * ln(CAST(n AS DOUBLE) / c) * 1000000)
                     AS BIGINT)) AS BIGINT) AS entropy_fp
FROM __c GROUP BY doc_id"""

# Stratified sampling (stages/sampling.stratified_sample): per-language
# keep rates — en downsampled to 30%, zh kept at 100%, default 60%
_STRAT_HASH = (
    "CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"
)
STRATIFIED_SAMPLE = f"""SELECT doc_id, text, lang FROM documents
WHERE {_STRAT_HASH} < CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 10000 ELSE 6000 END"""

# Per-user unbounded running total (stages/relational.running_total)
RUNNING_TOTAL = """WITH __rv AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events
)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS cum_n,
       CAST(sum(v_milli) OVER w AS BIGINT) AS cum_sum_milli
FROM __rv
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)"""

# Ordered conversion funnel view -> click -> purchase
# (stages/relational.funnel_counts): greedy earliest completion,
# strictly-after step ordering
FUNNEL_COUNTS = """WITH
__ev AS (SELECT * FROM events WHERE event_id % 7 = 0),
__s1 AS (SELECT user_id, min(ts) AS t FROM __ev
         WHERE event_type = 'view' GROUP BY user_id),
__s2 AS (SELECT e.user_id, min(e.ts) AS t FROM __ev e
         JOIN __s1 ON e.user_id = __s1.user_id
         WHERE e.event_type = 'click' AND e.ts > __s1.t GROUP BY e.user_id),
__s3 AS (SELECT e.user_id, min(e.ts) AS t FROM __ev e
         JOIN __s2 ON e.user_id = __s2.user_id
         WHERE e.event_type = 'purchase' AND e.ts > __s2.t GROUP BY e.user_id),
__u AS (SELECT DISTINCT user_id FROM __ev),
__d AS (
  SELECT __u.user_id,
         CASE WHEN __s3.user_id IS NOT NULL THEN 3
              WHEN __s2.user_id IS NOT NULL THEN 2
              WHEN __s1.user_id IS NOT NULL THEN 1
              ELSE 0 END AS depth
  FROM __u
  LEFT JOIN __s1 ON __u.user_id = __s1.user_id
  LEFT JOIN __s2 ON __u.user_id = __s2.user_id
  LEFT JOIN __s3 ON __u.user_id = __s3.user_id
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n_users
FROM __d GROUP BY depth"""

# k-anonymity audit (stages/relational.k_anonymity, k=8) over the
# (nation, market-segment) quasi-identifier
K_ANONYMITY = """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
FROM customer GROUP BY c_nationkey, c_mktsegment HAVING count(*) < 8"""

# Column profiling (stages/relational.column_profile over orders):
# min/max are lexicographic over the VARCHAR rendering by design
_PROFILE_COL = """SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       COALESCE(min(CAST({c} AS VARCHAR)), '') AS min_str,
       COALESCE(max(CAST({c} AS VARCHAR)), '') AS max_str
FROM orders"""
COLUMN_PROFILE = " UNION ALL ".join(
    _PROFILE_COL.format(c=c)
    for c in ("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")
)

# Unnormalized integer HITS, 2 rounds, over the directed (subj -> obj)
# triple edges (stages/graph.hits_scores); bit-exact unrolled recurrence
HITS_SCORES = f"""WITH {_PAIR_CTE},
__e AS (SELECT DISTINCT subj_id AS s, obj_id AS d FROM __triples),
__nodes AS (SELECT s AS node FROM __e UNION SELECT d AS node FROM __e),
__a1 AS (SELECT d AS node, CAST(count(*) AS BIGINT) AS a FROM __e GROUP BY d),
__h1 AS (SELECT e.s AS node, CAST(sum(a1.a) AS BIGINT) AS h
         FROM __e e JOIN __a1 a1 ON a1.node = e.d GROUP BY e.s),
__a2 AS (SELECT e.d AS node, CAST(sum(h1.h) AS BIGINT) AS a
         FROM __e e JOIN __h1 h1 ON h1.node = e.s GROUP BY e.d),
__h2 AS (SELECT e.s AS node, CAST(sum(a2.a) AS BIGINT) AS h
         FROM __e e JOIN __a2 a2 ON a2.node = e.d GROUP BY e.s)
SELECT n.node,
       CAST(COALESCE(__h2.h, 0) AS BIGINT) AS hub,
       CAST(COALESCE(__a2.a, 0) AS BIGINT) AS auth
FROM __nodes n
LEFT JOIN __h2 ON __h2.node = n.node
LEFT JOIN __a2 ON __a2.node = n.node"""

# Functional-predicate violations (stages/pairs.functional_violations):
# subjects with 2+ distinct objects under one predicate
FUNCTIONAL_VIOLATIONS = f"""WITH {_PAIR_CTE}
SELECT subj_id, pred, CAST(count(*) AS BIGINT) AS n_objs
FROM __triples GROUP BY subj_id, pred HAVING count(*) >= 2"""

# Gaps-and-islands interval coalescing (stages/relational.
# interval_coalesce, gap=600s): fixed-length spans merge when the next
# start is within the previous start + gap
INTERVAL_COALESCE = """WITH __e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
),
__f AS (
  SELECT user_id, s,
         CASE WHEN LAG(s) OVER w IS NULL OR s > LAG(s) OVER w + 600
              THEN 1 ELSE 0 END AS brk
  FROM __e WINDOW w AS (PARTITION BY user_id ORDER BY s)
),
__g AS (
  SELECT user_id, s,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM __f
)
SELECT user_id, CAST(min(s) AS BIGINT) AS start_s,
       CAST(max(s) + 600 AS BIGINT) AS end_s,
       CAST(count(*) AS BIGINT) AS n_events
FROM __g GROUP BY user_id, island"""

# Cohort retention matrix (stages/relational.cohort_retention,
# day buckets): cohort = user's first active day
COHORT_RETENTION = """WITH __e AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS bucket
  FROM events
),
__c AS (SELECT user_id, min(bucket) AS cohort FROM __e GROUP BY user_id)
SELECT c.cohort, e.bucket, CAST(count(*) AS BIGINT) AS n_users
FROM __e e JOIN __c c ON c.user_id = e.user_id
GROUP BY c.cohort, e.bucket"""

# Cross join (stages/relational.cross_join): region x nation expansion
REL_CROSS_JOIN = """SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name
FROM region r CROSS JOIN nation n"""

# LAG-semantics debounce (stages/relational.throttle_events,
# window=86400s): drop an event when the previous same-(user, type)
# event is under a day before it
THROTTLE_EVENTS = """WITH __e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
__l AS (
  SELECT *, LAG(s) OVER (PARTITION BY user_id, event_type
                         ORDER BY s, event_id) AS p
  FROM __e
)
SELECT event_id, user_id, event_type, s
FROM __l WHERE p IS NULL OR s - p >= 86400"""

# Semi-structured extraction (stages/relational.json_field_int): integer
# "k" field out of the props JSON blob; missing field -> NULL
JSON_PROPS = """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events"""

# Wide->long melt (stages/relational.unpivot): lineitem integer measures
UNPIVOT = """SELECT l_orderkey, l_linenumber,
       'l_partkey' AS measure, CAST(l_partkey AS BIGINT) AS value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber,
       'l_suppkey' AS measure, CAST(l_suppkey AS BIGINT) AS value
FROM lineitem"""

# Equi-width histogram (stages/relational.histogram, width=25): IEEE
# double division + floor is bit-identical in both engines
HISTOGRAM = """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1"""

# Aggregate-then-LAG (stages/relational.window_deltas, day buckets):
# day-over-day delta vs the type's previous OBSERVED day
WINDOW_DELTAS = """WITH __c AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(coalesce(
         n - LAG(n) OVER (PARTITION BY event_type ORDER BY day), 0
       ) AS BIGINT) AS delta
FROM __c"""

# Gap-filled daily counts (stages/relational.dense_counts): every day in
# the type's [min, max] range, missing days as 0
DENSE_COUNTS = """WITH __c AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
__r AS (
  SELECT event_type, min(day) AS lo, max(day) AS hi FROM __c GROUP BY 1
),
__d AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM __r
)
SELECT d.event_type, CAST(d.day AS BIGINT) AS day,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM __d d LEFT JOIN __c c
  ON c.event_type = d.event_type AND c.day = d.day"""

# TPC-H Q3 shape (stages/relational.tpch_q3): BUILDING segment, orders
# before / ships after 1998-06-01; revenue floored to cents PER ROW (the
# engine's order-independent integer discipline); deterministic top-10
REL_Q3 = """WITH __rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor(
           l_extendedprice * (1 - l_discount) * 100
         ) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY l_orderkey
)
SELECT o.o_orderkey AS l_orderkey, r.revenue_cents,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_orderdate_s,
       o.o_orderpriority
FROM __rev r
JOIN orders o ON o.o_orderkey = r.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
ORDER BY r.revenue_cents DESC, o_orderdate_s, l_orderkey
LIMIT 10"""

# Spike detection (stages/relational.anomaly_days): over the GAP-FILLED
# daily series, flag days where 7*n > 2*trailing-7-day sum; full windows
# only (the first 7 days of each type's range are skipped)
ANOMALY_DAYS = """WITH __c AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
__r AS (
  SELECT event_type, min(day) AS lo, max(day) AS hi FROM __c GROUP BY 1
),
__d AS (
  SELECT r.event_type, CAST(u.day AS BIGINT) AS day,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM (SELECT event_type, unnest(generate_series(lo, hi)) AS day
        FROM __r) u
  JOIN __r r ON r.event_type = u.event_type
  LEFT JOIN __c c ON c.event_type = u.event_type AND c.day = u.day
),
__w AS (
  SELECT event_type, day, n,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS trail_sum,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM __d
)
SELECT event_type, day, n, trail_sum,
       CAST(CASE WHEN 7 * n > 2 * trail_sum THEN 1 ELSE 0 END AS BIGINT)
         AS is_spike
FROM __w WHERE rn > 7"""

# Categorical argmax (stages/relational.mode_per_group): per-user modal
# event type, ties -> lexicographically smallest
MODE_PER_GROUP = """WITH __c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
__r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rn
  FROM __c
)
SELECT user_id, event_type AS mode_type, n FROM __r WHERE rn = 1"""

# LOCF densify (stages/relational.forward_fill): per (type, day) last
# event's value (by ts, event_id) in milli-units, gap-filled and carried
# forward across the type's day range
FORWARD_FILL = """WITH __e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 1000) AS BIGINT) AS v_milli,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC
         ) AS rn
  FROM events
),
__o AS (SELECT event_type, day, v_milli FROM __e WHERE rn = 1),
__r AS (
  SELECT event_type, min(day) AS lo, max(day) AS hi FROM __o GROUP BY 1
),
__d AS (
  SELECT event_type, CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS day
  FROM __r
)
SELECT d.event_type, d.day,
       CAST(last_value(o.v_milli IGNORE NULLS) OVER (
         PARTITION BY d.event_type ORDER BY d.day
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS v_milli
FROM __d d
LEFT JOIN __o o ON o.event_type = d.event_type AND o.day = d.day"""

# Ratio-to-report (stages/relational.share_bp): per-type share of all
# events in integer basis points (floor division)
SHARE_BP = """WITH __c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
)
SELECT event_type, n,
       CAST((n * 10000) // (SELECT sum(n) FROM __c) AS BIGINT) AS share_bp
FROM __c"""

# Chat-template flatten (stages/chat.render_conversations): one document
# per conversation, newline-joined "role: text" in turn order
RENDER_CONVERSATIONS = f"""WITH {transcripts_sql_cte()}
SELECT conv_id,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
         AS rendered,
       CAST(count(*) AS BIGINT) AS n_turns
FROM transcripts_v GROUP BY conv_id"""

# SFT pair construction (stages/chat.sft_examples, ctx_turns=4): one
# (context, target) per assistant turn; context = previous 4 turns
# rendered and newline-joined, '' when the assistant speaks first
SFT_EXAMPLES = f"""WITH {transcripts_sql_cte()},
__r AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text,
         role || ': ' || text AS rend
  FROM transcripts_v
),
__w AS (
  SELECT conv_id, turn_idx, role, text,
         coalesce(string_agg(rend, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING
         ), '') AS context
  FROM __r
)
SELECT conv_id, turn_idx, context, text AS target
FROM __w WHERE role = 'assistant'"""

# Tool-call trace signature (stages/chat.tool_chains): per-conv ordered
# ';;;'-joined tool names over tool turns; tool-free convs absent
TOOL_CHAINS = f"""WITH {transcripts_sql_cte()}
SELECT conv_id,
       string_agg(tool, ';;;' ORDER BY turn_idx) AS chain,
       CAST(count(*) AS BIGINT) AS n_calls
FROM transcripts_v WHERE role = 'tool' GROUP BY conv_id"""

# Conversation-level exact dedup (stages/chat.conv_dedup): min conv_id
# per distinct rendered chat-template document
CONV_DEDUP = f"""WITH {transcripts_sql_cte()},
__r AS (
  SELECT conv_id,
         string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
           AS rendered
  FROM transcripts_v GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id, md5(rendered) AS content_md5
FROM __r GROUP BY md5(rendered)"""

# Tool-name Markov transitions (stages/chat.tool_transitions): tool B
# called after tool A within a conversation, non-tool turns skipped
TOOL_TRANSITIONS = f"""WITH {transcripts_sql_cte()},
__t AS (
  SELECT conv_id, turn_idx, tool,
         LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_tool
  FROM transcripts_v WHERE role = 'tool'
)
SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
FROM __t WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool"""

# Last-touch attribution (stages/relational.attribution): most recent
# strictly-preceding non-purchase event type per purchase
ATTRIBUTION = """WITH __e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
__w AS (
  SELECT *,
         last_value(
           CASE WHEN event_type <> 'purchase' THEN event_type END
           IGNORE NULLS
         ) OVER (
           PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS attrib_type
  FROM __e
)
SELECT event_id, user_id, s, attrib_type
FROM __w WHERE event_type = 'purchase' AND attrib_type IS NOT NULL"""

# Histogram-sketch quantiles (stages/relational.approx_quantile_hist,
# width=25, q in {2500, 5000, 9900}): smallest bin whose cumulative
# count reaches ceil(q * total / 10000)
APPROX_QUANTILE_HIST = """WITH __b AS (
  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
__c AS (
  SELECT bin, sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         (SELECT sum(n) FROM __b) AS total
  FROM __b
),
__q AS (SELECT unnest([2500, 5000, 9900]) AS q_bp)
SELECT CAST(q.q_bp AS BIGINT) AS q_bp,
       CAST(min(c.bin) AS BIGINT) AS bin
FROM __q q JOIN __c c
  ON c.cum >= (q.q_bp * c.total + 9999) // 10000
GROUP BY q.q_bp"""

# Grouped vector pooling (stages/scoring.label_centroids): per-label
# exact-integer component sums (floor(v * 1e6) per vector) + counts
LABEL_CENTROIDS = """WITH __u AS (
  SELECT label,
         unnest(embedding) AS v,
         unnest(range(0, len(embedding))) AS dim_idx
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim_idx AS BIGINT) AS dim_idx,
       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_q,
       CAST(count(*) AS BIGINT) AS n
FROM __u GROUP BY label, dim_idx"""


# fixed-size overlapping character chunking (stages/textstats.
# chunk_documents, size=120 overlap=24): unnest over the per-doc chunk
# count; DuckDB length/substring are codepoint-based, matching the
# engine's utf8_slice_codeunits
_CHUNK_SIZE, _CHUNK_STEP = 120, 96
CHUNK_DOCS = f"""WITH __m AS (
  SELECT doc_id, text,
         1 + GREATEST(0, (length(text) - {_CHUNK_SIZE} + {_CHUNK_STEP} - 1)
                         // {_CHUNK_STEP}) AS m
  FROM documents
),
__u AS (SELECT doc_id, text, unnest(range(0, m)) AS j FROM __m)
SELECT doc_id,
       CAST(j AS BIGINT) AS chunk_id,
       CAST(j * {_CHUNK_STEP} AS BIGINT) AS start,
       CAST(length(substring(text, CAST(j * {_CHUNK_STEP} + 1 AS INT),
                             {_CHUNK_SIZE})) AS BIGINT) AS chunk_len,
       substring(text, CAST(j * {_CHUNK_STEP} + 1 AS INT),
                 {_CHUNK_SIZE}) AS chunk_text
FROM __u"""


# per-user RANK/DENSE_RANK/PERCENT_RANK by value desc (stages/relational.
# rank_in_group); pr_bp = floor((rank-1)*10000/(n-1)), 0 for n=1
RANK_IN_GROUP = """WITH __rv AS (
  SELECT event_id, user_id,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events
)
SELECT event_id, user_id,
       CAST(rank() OVER w AS BIGINT) AS rank,
       CAST(dense_rank() OVER w AS BIGINT) AS dense_rank,
       CAST(CASE WHEN count(*) OVER (PARTITION BY user_id) = 1 THEN 0
                 ELSE (rank() OVER w - 1) * 10000
                      // (count(*) OVER (PARTITION BY user_id) - 1) END
            AS BIGINT) AS pr_bp
FROM __rv
WINDOW w AS (PARTITION BY user_id ORDER BY v_milli DESC)"""


# distributed skyline / Pareto front (stages/relational.skyline):
# maximize price, minimize order date. Window mirror of the engine's
# dominance sweep (a point survives iff no strictly-higher-price point
# has date <= its own AND it holds its price run's min date) — same
# result as the quadratic NOT-EXISTS form but O(n log n)
SKYLINE = """WITH __o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         datediff('day', DATE '1970-01-01', o_orderdate) AS d_days
  FROM orders
),
__w AS (
  SELECT *,
         min(d_days) OVER (PARTITION BY price_cents) AS run_min,
         min(d_days) OVER (ORDER BY price_cents DESC
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                           EXCLUDE GROUP) AS strict_min
  FROM __o
)
SELECT o_orderkey, price_cents, CAST(d_days AS BIGINT) AS d_days
FROM __w
WHERE (strict_min IS NULL OR strict_min > d_days) AND d_days = run_min"""


# corpus snapshot CDC (stages/relational.snapshot_diff): new snapshot =
# documents minus doc_id%7==0 (removed), text suffixed where doc_id%5==0
# (changed), plus shifted copies of doc_id%11==0 (added); digest
# equality in the engine == text equality here
SNAPSHOT_DIFF = """WITH __new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 5000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM documents o FULL OUTER JOIN __new n USING (doc_id)
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text"""


# top session-opening event-type paths (stages/relational.event_paths,
# k=3, top=20): per-user first-3 types joined '>', counted, global top
EVENT_PATHS = """WITH __e AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
__p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM __e WHERE rn <= 3 GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM __p GROUP BY path
ORDER BY n DESC, path LIMIT 20"""


# DOID-style ancestor paths (sources/obo.ontology_parent_paths; reference
# append_paths/get_parent_paths, data/disease_ontology.py:227-270): a
# synthetic is_a DAG over the nation dimension — binary-tree edges plus a
# second parent for every third node (diamonds AND a duplicate-edge case
# at id=3, where both rules yield parent 1 — duplicates preserved on both
# sides). Chains build top-down; a non-root's chain IS its full path.
ONTOLOGY_PATHS = """WITH RECURSIVE
__nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
__edges AS (
  SELECT id AS child, (id - 1) // 2 AS parent FROM __nodes WHERE id > 0
  UNION ALL
  SELECT id, id - 2 FROM __nodes WHERE id % 3 = 0 AND id > 2
),
__chains(node, path) AS (
  SELECT id, 'DOID:' || id || '#' FROM __nodes WHERE id = 0
  UNION ALL
  SELECT e.child, c.path || '>DOID:' || e.child || '#'
  FROM __chains c JOIN __edges e ON e.parent = c.node
)
SELECT 'DOID:' || node AS doid, path FROM __chains WHERE node <> 0"""


# real-PNG image features (stages/multimodal.image_features): the engine
# parses/inflates/unfilters actual PNG bytes built by attach_images; the
# oracle recomputes the same features from the generating pixel formula
# (w = 4 + id%5, h = 3 + id%4, v[j] = (id*7 + j*11) % 256) — the
# attach_audio/AUDIO_FEATURES discipline for the image container.
IMAGE_FEATURES = """WITH __p AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents
),
__v AS (
  SELECT doc_id, w, h,
         (doc_id * 7 + unnest(range(0, w * h * 3)) * 11) % 256 AS v
  FROM __p
),
__a AS (
  SELECT doc_id, any_value(w) AS w, any_value(h) AS h, SUM(v) AS s
  FROM __v GROUP BY doc_id
)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels, CAST(s AS BIGINT) AS sum_rgb,
       CAST(1000 * s // (w * h * 3) AS BIGINT) AS mean_milli
FROM __a"""


# real APNG frame decode (stages/multimodal.apng_frame_features): per doc
# an APNG of 2 + doc_id % 3 frames, frame f pixel (doc_id*7 + f*13 +
# j*11) % 256; the engine decodes the CONTAINER (chunk parse + per-frame
# zlib inflate + unfilter) and emits every 2nd frame; the oracle
# recomputes the sampled frames' features straight from the formula
MEDIA_FRAMES_APNG = """WITH __p AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
         2 + doc_id % 3 AS n
  FROM documents
),
__f AS (
  SELECT doc_id, w, h, unnest(range(0, n)) AS f FROM __p
),
__sf AS (SELECT * FROM __f WHERE f % 2 = 0),
__v AS (
  SELECT doc_id, w, h, f,
         (doc_id * 7 + f * 13 + unnest(range(0, w * h * 3)) * 11) % 256 AS v
  FROM __sf
),
__a AS (
  SELECT doc_id, f, any_value(w) AS w, any_value(h) AS h, SUM(v) AS s
  FROM __v GROUP BY doc_id, f
)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(s AS BIGINT) AS sum_rgb,
       CAST(1000 * s // (w * h * 3) AS BIGINT) AS mean_milli
FROM __a"""


# LSH-candidates + exact-Jaccard verification chain
# (stages/dedup.minhash_verified_pairs): the NGRAM_JACCARD exact pair
# table semi-joined against the MINHASH_LSH band-collision candidate set
# — CTE namespaces are disjoint (__sizes/__cool/__pairs vs
# __shh/__sig/__band), so both chains splice into one WITH.
MINHASH_VERIFIED = f"""WITH {_SHINGLES},
__sizes AS (SELECT doc_id, count(*) AS size FROM __sh GROUP BY doc_id),
__cool AS (
  SELECT shingle FROM __sh GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}
),
__pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM __sh a
  JOIN __cool c ON a.shingle = c.shingle
  JOIN __sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
__shh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % 2147483647 AS x
  FROM __sh
),
__sig AS (
  SELECT doc_id, perm.p, min((perm.a * x + perm.b) % 2147483647) AS mh
  FROM __shh, {_perm_values()} GROUP BY 1, 2
),
__band AS (
  SELECT doc_id, CAST((p - 1) // 4 AS INT) AS band_id,
         string_agg(CAST(mh AS VARCHAR), '-' ORDER BY p) AS band_key
  FROM __sig GROUP BY 1, 2
),
__cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM __band a
  JOIN __band b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b, p.inter, sa.size AS size_a, sb.size AS size_b
FROM __pairs p
JOIN __sizes sa ON p.doc_a = sa.doc_id
JOIN __sizes sb ON p.doc_b = sb.doc_id
JOIN __cand c ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
WHERE 10000 * p.inter >= 5000 * (sa.size + sb.size - p.inter)"""


# sparse idf^2-weighted document-pair similarity mining
# (stages/textstats.similar_doc_pairs): global top-20 pairs by the exact
# integer dot SUM(tf_a * tf_b * W), W = 1e6 // df^2 (zero-weight terms
# pruned before pairing — the hot-term guard IS the scoring function)
SIMILAR_DOCS = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__tok AS (SELECT doc_id, unnest(parts) AS w FROM __p),
__tf AS (
  SELECT doc_id, w AS token, CAST(count(*) AS BIGINT) AS tf
  FROM __tok GROUP BY 1, 2
),
__df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM __tf GROUP BY token),
__w AS (
  SELECT token, CAST(1000000 // (df * df) AS BIGINT) AS w
  FROM __df WHERE 1000000 // (df * df) > 0
),
__post AS (SELECT t.doc_id, t.token, t.tf, w.w FROM __tf t JOIN __w w USING (token)),
__dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         SUM(a.tf * b.tf * a.w) AS dot
  FROM __post a JOIN __post b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
__norm AS (SELECT doc_id, SUM(tf * tf * w) AS norm FROM __post GROUP BY doc_id),
__r AS (
  SELECT d.*, row_number() OVER (ORDER BY dot DESC, doc_a, doc_b) AS rnk
  FROM __dots d
)
SELECT r.doc_a, r.doc_b, CAST(r.dot AS BIGINT) AS dot,
       CAST(na.norm AS BIGINT) AS norm_a, CAST(nb.norm AS BIGINT) AS norm_b,
       CAST(r.rnk AS BIGINT) AS rank
FROM __r r
JOIN __norm na ON r.doc_a = na.doc_id
JOIN __norm nb ON r.doc_b = nb.doc_id
WHERE r.rnk <= 20"""


# SCD type-2 validity intervals from the event changelog
# (stages/relational.scd2_history): per user, (ts, event_id) order,
# consecutive same-state rows collapse into one interval; valid_to =
# next change's valid_from, NULL (is_current=1) on the open row
SCD2_HISTORY = """WITH __o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
__chg AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM __o WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       CAST(CASE WHEN lead(valid_from) OVER w2 IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM __chg
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)"""


# collocation mining (stages/textstats.collocations): top-20 adjacent
# bigrams by exact integer lift n*B*scale // (l_a * r_b), min count 3
COLLOCATIONS = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__ci AS (SELECT doc_id, parts, unnest(range(1, len(parts))) AS i FROM __p),
__bg AS (
  SELECT parts[i] AS w1, parts[i + 1] AS w2 FROM __ci
),
__n AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM __bg GROUP BY 1, 2),
__l AS (SELECT w1 AS w, CAST(count(*) AS BIGINT) AS c FROM __bg GROUP BY 1),
__r AS (SELECT w2 AS w, CAST(count(*) AS BIGINT) AS c FROM __bg GROUP BY 1),
__b AS (SELECT CAST(count(*) AS BIGINT) AS B FROM __bg),
__s AS (
  SELECT n.w1, n.w2, n.n,
         CAST(10000 * n.n * (SELECT B FROM __b) // (l.c * r.c) AS BIGINT)
           AS lift_bp
  FROM __n n JOIN __l l ON n.w1 = l.w JOIN __r r ON n.w2 = r.w
  WHERE n.n >= 3
),
__rk AS (
  SELECT *, row_number() OVER (ORDER BY lift_bp DESC, w1, w2) AS rnk
  FROM __s
)
SELECT w1, w2, n, lift_bp, CAST(rnk AS BIGINT) AS rank
FROM __rk WHERE rnk <= 20"""


# as-of SCD2 state join (stages/relational.event_state_asof): every
# event annotated with the state valid at its ts (zero-length intervals
# from same-ts double changes never win)
EVENT_STATE_ASOF = """WITH __o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
__chg AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM __o WHERE prev_type IS NULL OR event_type <> prev_type
),
__iv AS (
  SELECT user_id, state, valid_from,
         lead(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from, event_id)
           AS valid_to
  FROM __chg
)
SELECT e.event_id, e.user_id, e.ts, i.state
FROM events e
JOIN __iv i ON e.user_id = i.user_id
           AND e.ts >= i.valid_from
           AND (i.valid_to IS NULL OR e.ts < i.valid_to)"""


# dictionary blocklist scoring (stages/safety.blocklist_hits)
BLOCKLIST_HITS = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__tok AS (
  SELECT doc_id, CAST(len(parts) AS BIGINT) AS n_tokens, unnest(parts) AS w
  FROM __p
)
SELECT doc_id, any_value(n_tokens) AS n_tokens,
       CAST(sum(CASE WHEN lower(w) IN ('alpha', 'delta', 'sigma')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(10000 * sum(CASE WHEN lower(w) IN ('alpha', 'delta', 'sigma')
                             THEN 1 ELSE 0 END)
            // greatest(any_value(n_tokens), 1) AS BIGINT) AS blocked_bp
FROM __tok GROUP BY doc_id"""


# degree centrality over the co-occurrence graph
# (stages/graph.degree_centrality): the symmetric edge list makes
# out-degree == degree; deg_bp = 10000 * deg // (n_nodes - 1)
DEGREE_CENTRALITY = f"""WITH {_COOC_EDGES},
__deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM __e GROUP BY src),
__n AS (SELECT count(*) AS n FROM __deg)
SELECT node, deg,
       CAST(10000 * deg // greatest((SELECT n FROM __n) - 1, 1) AS BIGINT)
         AS deg_bp
FROM __deg"""


# per-document nearest neighbor under the similar_doc_pairs dot
# (stages/textstats.nearest_doc): argmax partner, ties by smallest id
NEAREST_DOC = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__tok AS (SELECT doc_id, unnest(parts) AS w FROM __p),
__tf AS (
  SELECT doc_id, w AS token, CAST(count(*) AS BIGINT) AS tf
  FROM __tok GROUP BY 1, 2
),
__df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM __tf GROUP BY token),
__w AS (
  SELECT token, CAST(1000000 // (df * df) AS BIGINT) AS w
  FROM __df WHERE 1000000 // (df * df) > 0
),
__post AS (SELECT t.doc_id, t.token, t.tf, w.w FROM __tf t JOIN __w w USING (token)),
__dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         SUM(a.tf * b.tf * a.w) AS dot
  FROM __post a JOIN __post b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
__dir AS (
  SELECT doc_a AS doc_id, doc_b AS partner, dot FROM __dots
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS partner, dot FROM __dots
),
__r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY dot DESC, partner) AS rn
  FROM __dir
)
SELECT doc_id, partner AS best_doc, CAST(dot AS BIGINT) AS dot
FROM __r WHERE rn = 1"""


# per-tool response latency (stages/relational.tool_latency): latency of
# each tool turn to the NEXT turn of its conversation; conversation-final
# tool turns excluded
TOOL_LATENCY = f"""WITH {transcripts_sql_cte()},
__o AS (
  SELECT conv_id, turn_idx, tool, ts,
         lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nts
  FROM transcripts_v
),
__c AS (
  SELECT tool,
         CAST(date_diff('millisecond', ts, nts) AS BIGINT) AS ms
  FROM __o WHERE tool IS NOT NULL AND nts IS NOT NULL
)
SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
       CAST(sum(ms) AS BIGINT) AS total_ms,
       CAST(max(ms) AS BIGINT) AS max_ms
FROM __c GROUP BY tool"""


# per-token next-token top-k (stages/textstats.markov_next_token, k=3,
# min total continuations 2)
MARKOV_NEXT_TOKEN = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__ci AS (SELECT doc_id, parts, unnest(range(1, len(parts))) AS i FROM __p),
__bg AS (SELECT parts[i] AS w1, parts[i + 1] AS w2 FROM __ci),
__n AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM __bg GROUP BY 1, 2),
__tot AS (SELECT w1, sum(n) AS tot FROM __n GROUP BY w1),
__r AS (
  SELECT n.w1, n.w2, n.n,
         row_number() OVER (PARTITION BY n.w1 ORDER BY n.n DESC, n.w2) AS rnk
  FROM __n n JOIN __tot t ON n.w1 = t.w1
  WHERE t.tot >= 2
)
SELECT w1, w2, n, CAST(rnk AS BIGINT) AS rank FROM __r WHERE rnk <= 3"""


# corpus language mix (stages/textstats.lang_share): lang_id's marker
# heuristic (first match in priority order the/le/der/el), share in bp
LANG_SHARE = """WITH __p AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
__tok AS (SELECT doc_id, unnest(parts) AS w FROM __p),
__m AS (
  SELECT doc_id,
         max(CASE WHEN w = 'the' THEN 1 ELSE 0 END) AS has_en,
         max(CASE WHEN w = 'le' THEN 1 ELSE 0 END) AS has_fr,
         max(CASE WHEN w = 'der' THEN 1 ELSE 0 END) AS has_de,
         max(CASE WHEN w = 'el' THEN 1 ELSE 0 END) AS has_es
  FROM __tok GROUP BY doc_id
),
__l AS (
  SELECT doc_id,
         CASE WHEN has_en = 1 THEN 'en'
              WHEN has_fr = 1 THEN 'fr'
              WHEN has_de = 1 THEN 'de'
              WHEN has_es = 1 THEN 'es'
              ELSE 'und' END AS lang
  FROM __m
),
__c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM __l GROUP BY lang),
__t AS (SELECT sum(n_docs) AS total FROM __c)
SELECT lang, n_docs,
       CAST(10000 * n_docs // greatest((SELECT total FROM __t), 1) AS BIGINT)
         AS share_bp
FROM __c"""


# conversion latency (stages/relational.time_to_first, target 'purchase'):
# ms from a user's first event to their first target event; non-converts
# excluded
TIME_TO_FIRST = """WITH __f AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
),
__t AS (
  SELECT user_id, min(ts) AS hit_ts FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT f.user_id,
       CAST(date_diff('millisecond', f.first_ts, t.hit_ts) AS BIGINT) AS ms
FROM __f f JOIN __t t USING (user_id)"""


# local clustering coefficient (stages/graph.clustering_coeff):
# cc_bp = 10000 * 2 * triangles // (deg * (deg - 1)), deg >= 2 only
CLUSTERING_COEFF = f"""WITH {_COOC_EDGES},
__deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM __e GROUP BY src),
__rank AS (
  SELECT node, row_number() OVER (ORDER BY deg, node) AS rk FROM __deg
),
__o AS (
  SELECT e.src AS a, e.dst AS b
  FROM __e e
  JOIN __rank ra ON e.src = ra.node
  JOIN __rank rb ON e.dst = rb.node
  WHERE ra.rk < rb.rk
),
__tri AS (
  SELECT x.a, x.b, y.b AS c
  FROM __o x
  JOIN __o y ON x.a = y.a AND x.b <> y.b
  JOIN __o z ON z.a = x.b AND z.b = y.b
),
__t AS (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT a AS node FROM __tri
    UNION ALL SELECT b FROM __tri
    UNION ALL SELECT c FROM __tri
  ) GROUP BY node
)
SELECT d.node, d.deg, COALESCE(t.triangles, 0) AS triangles,
       CAST(20000 * COALESCE(t.triangles, 0) // (d.deg * (d.deg - 1))
            AS BIGINT) AS cc_bp
FROM __deg d LEFT JOIN __t t USING (node)
WHERE d.deg >= 2"""


# degree-assortativity sufficient statistics (stages/graph.degree_mixing)
DEGREE_MIXING = f"""WITH {_COOC_EDGES},
__deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM __e GROUP BY src)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(dx.deg) AS BIGINT) AS sum_x,
       CAST(sum(dy.deg) AS BIGINT) AS sum_y,
       CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sum_xy,
       CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sum_x2,
       CAST(sum(dy.deg * dy.deg) AS BIGINT) AS sum_y2
FROM __e e JOIN __deg dx ON e.src = dx.node JOIN __deg dy ON e.dst = dy.node"""


# near-dup cluster-size histogram (stages/dedup.cluster_size_hist):
# CC over the star pair graph, clusters counted per size
CLUSTER_SIZE_HIST = f"""WITH RECURSIVE __pairs AS ({MINHASH_LSH_STAR}),
{_cc_closure_cte("__pairs")},
__s AS (SELECT r, CAST(count(*) AS BIGINT) AS size FROM __cc GROUP BY r)
SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
FROM __s GROUP BY size"""


# TPC-H Q4 shape (stages/relational.late_orders_by_priority): orders
# with >= 1 lineitem shipped after the order date, counted per priority
REL_Q4 = """SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o.o_orderpriority"""


# TPC-H Q12 shape (stages/relational.priority_line_counts): per
# returnflag, lineitems of HIGH-priority orders vs lower
REL_Q12 = """SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_returnflag"""


# TPC-H Q14 shape (stages/relational.promo_revenue_share): PROMO parts'
# revenue share in bp, per-row floored cents (the rel_q3 discipline)
REL_Q14 = """WITH __c AS (
  SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents,
         CAST(p.p_type = 'PROMO' AS INT) AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT CAST(sum(cents * is_promo) AS BIGINT) AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(10000 * sum(cents * is_promo) // greatest(sum(cents), 1)
            AS BIGINT) AS promo_bp
FROM __c"""


# incremental KG merge (stages/pairs.incremental_triples): two disjoint
# half-corpus KGs merged == the full-corpus rebuild, so the oracle IS the
# full TRIPLES query
KG_INCREMENTAL = TRIPLES


# weighted co-occurrence edges (stages/graph.cooccurrence_weights):
# w = number of distinct shared conversations per entity pair
_COOC_W = f"""{kg_cte()},
__dm AS (SELECT DISTINCT conv_id, entity_id FROM __mentions),
__undw AS (
  SELECT a.entity_id AS lo, b.entity_id AS hi, CAST(count(*) AS BIGINT) AS w
  FROM __dm a JOIN __dm b
    ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
__ew AS (
  SELECT lo AS src, hi AS dst, w FROM __undw
  UNION ALL
  SELECT hi AS src, lo AS dst, w FROM __undw
)"""

COOC_WEIGHTS = f"""WITH {_COOC_W}
SELECT src, dst, w FROM __ew"""


def _pagerank_w_iter_cte(i: int, prev: str) -> str:
    return f"""r{i} AS (
  SELECT n.node,
         (SELECT b FROM __base) + COALESCE(s.c, 0) AS r
  FROM __nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((85 * ((p.r * e.w) // wt.W)) // 100) AS c
    FROM __ew e
    JOIN {prev} p ON e.src = p.node
    JOIN __W wt ON e.src = wt.node
    GROUP BY e.dst
  ) s USING (node)
)"""


# integer-exact weighted PageRank (stages/graph.pagerank_weighted,
# iters=2, damping 85/100, scale 10^9): per-edge floor contribution
# (85 * ((r*w) // W_u)) // 100 — the same pinned-floor discipline as
# the unweighted PAGERANK recurrence
PAGERANK_WEIGHTED = f"""WITH {_COOC_W},
__W AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS W FROM __ew GROUP BY src),
__nodes AS (SELECT src AS node FROM __ew UNION SELECT dst AS node FROM __ew),
__n AS (SELECT count(*) AS n FROM __nodes),
__base AS (
  SELECT ((100 - 85) * (1000000000 // n)) // 100 AS b FROM __n
),
r0 AS (
  SELECT node, 1000000000 // (SELECT n FROM __n) AS r FROM __nodes
),
{_pagerank_w_iter_cte(1, "r0")},
{_pagerank_w_iter_cte(2, "r1")}
SELECT node, CAST(r AS BIGINT) AS rank_nano FROM r2"""


# per-role turn/token aggregates (stages/relational.role_token_stats)
ROLE_TOKEN_STATS = f"""WITH {transcripts_sql_cte()}
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM transcripts_v GROUP BY role"""


# mentions per entity type (the mention-family observability aggregate)
ENTITY_TYPE_COUNTS = f"""WITH {kg_cte()}
SELECT entity_type, CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT entity_id) AS BIGINT) AS n_entities
FROM __mentions GROUP BY entity_type"""


# Asymmetric shingle containment (stages/dedup.containment_pairs,
# threshold_bp=8000): same candidate machinery as NGRAM_JACCARD, predicate
# inter / min(|A|, |B|) instead of Jaccard — catches subset-duplication.
CONTAINMENT_PAIRS = f"""WITH {_SHINGLES},
__sizes AS (SELECT doc_id, count(*) AS size FROM __sh GROUP BY doc_id),
__cool AS (
  SELECT shingle FROM __sh GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}
),
__pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM __sh a
  JOIN __cool c ON a.shingle = c.shingle
  JOIN __sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter, sa.size AS size_a, sb.size AS size_b
FROM __pairs p
JOIN __sizes sa ON p.doc_a = sa.doc_id
JOIN __sizes sb ON p.doc_b = sb.doc_id
WHERE 10000 * p.inter >= 8000 * least(sa.size, sb.size)"""


# Boilerplate prefix clusters (stages/textstats.prefix_clusters, k=8,
# min_docs=2) over the duplicated dedup corpus.
PREFIX_CLUSTERS = f"""WITH {_CORPUS},
__p AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
           AS prefix
  FROM __corpus
)
SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc_id
FROM __p GROUP BY prefix HAVING count(*) >= 2"""


def _ppr_iter_cte(i: int, prev: str) -> str:
    """One personalized-PageRank iteration: like _pagerank_iter_cte but
    the restart term is the per-node __basev (seeds only) instead of a
    uniform __base scalar."""
    return f"""pr{i} AS (
  SELECT n.node,
         n.b + COALESCE(s.c, 0) AS r
  FROM __basev n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((85 * (p.r // d.deg)) // 100) AS c
    FROM __e e
    JOIN {prev} p ON e.src = p.node
    JOIN __deg d ON e.src = d.node
    GROUP BY e.dst
  ) s USING (node)
)"""


# Personalized PageRank (stages/graph.pagerank_personalized, seeds =
# 'TOOL:%' nodes, iters=2, damping 85, scale 1e12): restart mass uniform
# over the seed set; identical int64 floor discipline as PAGERANK.
PAGERANK_PERSONALIZED = f"""WITH {_COOC_EDGES},
__nodes AS (SELECT DISTINCT src AS node FROM __e),
__deg AS (SELECT src AS node, count(*) AS deg FROM __e GROUP BY src),
__unit AS (
  SELECT 1000000000000 // count(*) AS u FROM __nodes
  WHERE node LIKE 'TOOL:%'
),
__basev AS (
  SELECT node,
         CASE WHEN node LIKE 'TOOL:%'
              THEN (15 * (SELECT u FROM __unit)) // 100
              ELSE 0 END AS b
  FROM __nodes
),
pr0 AS (
  SELECT node,
         CASE WHEN node LIKE 'TOOL:%' THEN (SELECT u FROM __unit)
              ELSE 0 END AS r
  FROM __nodes
),
{_ppr_iter_cte(1, "pr0")},
{_ppr_iter_cte(2, "pr1")}
SELECT node, CAST(r AS BIGINT) AS rank_mu FROM pr2"""


# CUBE grouping sets (stages/relational.cube_counts): ROLLUP plus the
# source-only level.
CUBE_COUNTS = """SELECT COALESCE(lang, '*') AS lang,
       COALESCE(source, '*') AS source,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY CUBE(lang, source)"""


# Per-user NTILE(4) (stages/relational.ntile_buckets): row-order tiles,
# first (g % n) tiles one row bigger — exact SQL NTILE semantics.
NTILE_BUCKETS = """WITH __rv AS (
  SELECT event_id, user_id,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events
)
SELECT event_id, user_id,
       CAST(ntile(4) OVER (PARTITION BY user_id
                           ORDER BY v_milli DESC, event_id) AS BIGINT)
         AS bucket
FROM __rv"""


# Integer fixed-point EMA over turn token counts
# (stages/relational.ema_smoothed, alpha=1/4, scale=1e6): recursive CTE
# walks each conversation in turn order; floor division each step.
EMA_SMOOTHED = f"""WITH RECURSIVE {transcripts_sql_cte()},
__x AS (
  SELECT conv_id, turn_idx,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pos
  FROM transcripts_v
),
__ema AS (
  SELECT conv_id, turn_idx, n_tok, pos, n_tok * 1000000 AS ema
  FROM __x WHERE pos = 1
  UNION ALL
  SELECT x.conv_id, x.turn_idx, x.n_tok, x.pos,
         (3 * e.ema + x.n_tok * 1000000) // 4 AS ema
  FROM __x x JOIN __ema e ON x.conv_id = e.conv_id AND x.pos = e.pos + 1
)
SELECT conv_id, turn_idx, n_tok, CAST(ema AS BIGINT) AS ema_mu FROM __ema"""


# Systematic every-7th sample under global doc_id order
# (stages/sampling.systematic_sample).
SYSTEMATIC_SAMPLE = """WITH __r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rank
  FROM documents
)
SELECT doc_id, rank FROM __r WHERE (rank - 1) % 7 = 0"""


# TPC-H Q18 shape (stages/relational.large_volume_orders): orders whose
# total lineitem quantity exceeds 200.00 (centi-units), joined back to
# customer names; integer centi/day units end to end.
REL_Q18 = """WITH __q AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_centi
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 20000
)
SELECT c.c_name, o.o_custkey, o.o_orderkey,
       CAST(datediff('day', DATE '1970-01-01', o.o_orderdate) AS BIGINT)
         AS d_days,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(q.sum_qty_centi AS BIGINT) AS sum_qty_centi
FROM orders o
JOIN __q q ON o.o_orderkey = q.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey"""


def _mlp_iter_cte(i: int, prev: str) -> str:
    """One min-label-propagation round: each node takes the min of its
    own label and its in-neighbors' labels (string lexicographic min —
    entity ids are ASCII, so DuckDB binary collation == Python order)."""
    return f"""ml{i} AS (
  SELECT n.node, least(n.lbl, COALESCE(m.ml, n.lbl)) AS lbl
  FROM {prev} n LEFT JOIN (
    SELECT e.dst AS node, min(p.lbl) AS ml
    FROM __e e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
  ) m USING (node)
)"""


# Bounded-round min-label propagation (stages/graph.min_label_prop,
# rounds=2): label(v) = smallest node id within 2 hops.
MIN_LABEL_PROP = f"""WITH {_COOC_EDGES},
__nodes AS (SELECT DISTINCT src AS node FROM __e),
ml0 AS (SELECT node, node AS lbl FROM __nodes),
{_mlp_iter_cte(1, "ml0")},
{_mlp_iter_cte(2, "ml1")}
SELECT node, lbl AS label FROM ml2"""


# Sorted-neighborhood ER blocking (stages/dedup.sorted_neighborhood_pairs,
# key=n_chars, window=3): all pairs within 3 ranks of the
# (n_chars, doc_id) order.
SORTED_NEIGHBORHOOD = """WITH __r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rnk
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.rnk AS rank_a, b.rnk AS rank_b
FROM __r a JOIN __r b ON b.rnk - a.rnk BETWEEN 1 AND 3"""


# Z-order curve value (stages/ordered.zorder_index): Morton interleave of
# (user_id & 0xFFFF, v_milli & 0xFFFF) via the same magic-mask ladder.
ZORDER_INDEX = """WITH __v AS (
  SELECT event_id, user_id,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events
),
__m AS (
  SELECT event_id, user_id, v_milli,
         user_id & 65535 AS x0, v_milli & 65535 AS y0
  FROM __v
),
__s1 AS (SELECT *, (x0 | (x0 << 8)) & 16711935 AS x1,
                (y0 | (y0 << 8)) & 16711935 AS y1 FROM __m),
__s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
                (y1 | (y1 << 4)) & 252645135 AS y2 FROM __s1),
__s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
                (y2 | (y2 << 2)) & 858993459 AS y3 FROM __s2),
__s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
                (y3 | (y3 << 1)) & 1431655765 AS y4 FROM __s3)
SELECT event_id, user_id, v_milli,
       CAST(x4 | (y4 << 1) AS BIGINT) AS zval
FROM __s4"""


# Reciprocal-rank fusion (stages/textstats.rrf_fusion, rrf_k=60): BM25
# top-10 fused with the raw query-term-frequency top-10; integer RRF.
RRF_FUSION = f"""WITH __bm AS (
{BM25_TOPK}
),
__qt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
__qc AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x = 'join')) +
              len(list_filter(toks, x -> x = 'sort')) +
              len(list_filter(toks, x -> x = 'window')) AS BIGINT) AS qtf
  FROM __qt
),
__qr AS (
  SELECT doc_id, CAST(rn AS BIGINT) AS rank
  FROM (SELECT doc_id,
               row_number() OVER (ORDER BY qtf DESC, doc_id) AS rn
        FROM __qc WHERE qtf > 0)
  WHERE rn <= 10
),
__u AS (
  SELECT doc_id, rank FROM __bm
  UNION ALL
  SELECT doc_id, rank FROM __qr
),
__s AS (
  SELECT doc_id,
         SUM(1000000000 // (60 + rank)) AS rrf_bp,
         count(*) AS n_lists
  FROM __u GROUP BY doc_id
)
SELECT doc_id, CAST(rrf_bp AS BIGINT) AS rrf_bp,
       CAST(n_lists AS BIGINT) AS n_lists,
       CAST(row_number() OVER (ORDER BY rrf_bp DESC, doc_id) AS BIGINT)
         AS rank
FROM __s"""


# Late-event accounting (stages/relational.late_arrivals): strictly
# older than the running max ts of earlier-ARRIVING events of the same
# user; arrival order = (md5int8('arr:'||event_id), event_id) — the
# deterministic-shuffle stand-in for an ingestion sequence; ms-boundary
# lag.
LATE_ARRIVALS = """WITH __h AS (
  SELECT event_id, user_id, ts,
         CAST(('0x' || substr(md5('arr:' || event_id), 1, 8)) AS BIGINT) AS h
  FROM events
),
__w AS (
  SELECT event_id, user_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY h, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm
  FROM __h
)
SELECT event_id, user_id,
       CAST(epoch_us(wm) // 1000 - epoch_us(ts) // 1000 AS BIGINT) AS lag_ms
FROM __w WHERE wm > ts"""


# Lexical diversity (stages/textstats.lexical_diversity): type-token
# ratio + hapax share in integer basis points.
LEXICAL_DIVERSITY = """WITH __t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
__g AS (SELECT doc_id, w, count(*) AS c FROM __t GROUP BY doc_id, w),
__s AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM __g GROUP BY doc_id
)
SELECT doc_id, n_tok, n_types,
       CAST(10000 * n_types // n_tok AS BIGINT) AS ttr_bp,
       CAST(10000 * n_hapax // n_tok AS BIGINT) AS hapax_bp
FROM __s"""


# Per-conversation role token balance
# (stages/relational.conv_role_balance): integer-bp shares.
CONV_ROLE_BALANCE = f"""WITH {transcripts_sql_cte()},
__r AS (
  SELECT conv_id, role,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM transcripts_v
),
__g AS (
  SELECT conv_id,
         CAST(SUM(nt) AS BIGINT) AS n_tok,
         CAST(SUM(CASE WHEN role = 'user' THEN nt ELSE 0 END) AS BIGINT) AS ut,
         CAST(SUM(CASE WHEN role = 'assistant' THEN nt ELSE 0 END) AS BIGINT) AS at,
         CAST(SUM(CASE WHEN role = 'tool' THEN nt ELSE 0 END) AS BIGINT) AS tt
  FROM __r GROUP BY conv_id
)
SELECT conv_id, n_tok,
       CAST(10000 * ut // GREATEST(n_tok, 1) AS BIGINT) AS user_bp,
       CAST(10000 * at // GREATEST(n_tok, 1) AS BIGINT) AS assistant_bp,
       CAST(10000 * tt // GREATEST(n_tok, 1) AS BIGINT) AS tool_bp
FROM __g"""


# Calendar-month order rollup (stages/relational.orders_by_month).
ORDERS_BY_MONTH = """SELECT
  CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM orders GROUP BY 1"""


# Exact quantiles of per-user lifetime value
# (stages/relational.user_ltv_quantiles): same ceil-position rule as
# TOKEN_QUANTILES over the per-user sums.
USER_LTV_QUANTILES = """WITH __u AS (
  SELECT user_id,
         CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY user_id
),
__n AS (SELECT count(*) AS n FROM __u),
__r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM __u),
__q AS (SELECT CAST(unnest([2500, 5000, 7500, 9500]) AS BIGINT) AS q_bp)
SELECT q.q_bp,
       (SELECT v FROM __r
        WHERE rn = GREATEST(1, (q.q_bp * (SELECT n FROM __n) + 9999) // 10000))
         AS value
FROM __q q"""


# Mentions-per-token conversation density
# (stages/relational.conv_entity_density): zero-mention convs included.
CONV_ENTITY_DENSITY = f"""WITH {kg_cte()},
__tok_c AS (
  SELECT conv_id,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
  FROM transcripts_v GROUP BY conv_id
),
__men_c AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_mentions
  FROM __mentions GROUP BY conv_id
)
SELECT t.conv_id, t.n_tok,
       COALESCE(m.n_mentions, 0) AS n_mentions,
       CAST(10000 * COALESCE(m.n_mentions, 0) // GREATEST(t.n_tok, 1)
            AS BIGINT) AS density_bp
FROM __tok_c t LEFT JOIN __men_c m USING (conv_id)"""


# Int8-range embedding quantization (stages/scoring.embedding_quantize):
# per-vector min/max codebook, float64 arithmetic in the exact engine
# expression order.
EMBEDDING_QUANTIZE = """WITH __x AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
__mm AS (SELECT vec_id, min(v) AS mn, max(v) AS mx FROM __x GROUP BY vec_id)
SELECT x.vec_id, CAST(x.i AS BIGINT) AS i,
       CAST(CASE WHEN m.mx = m.mn THEN 0
                 ELSE least(255, floor((x.v - m.mn) * 255 / (m.mx - m.mn)))
            END AS BIGINT) AS code
FROM __x x JOIN __mm m USING (vec_id)"""


# TPC-H Q5 shape (stages/relational.regional_revenue, region ASIA):
# same-nation customer+supplier revenue per nation of the region;
# integer cents x (10000 - discount_bp) units.
REL_Q5 = """SELECT n.n_name,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_units
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
             AND s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name"""


# MinHash Jaccard estimates over the LSH candidates
# (stages/dedup.minhash_jaccard_est): matching-permutation fraction,
# same 16-perm/4-row constants as MINHASH_LSH.
MINHASH_JACCARD_EST = f"""WITH {_SHINGLES},
__shh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % 2147483647 AS x
  FROM __sh
),
__sig AS (
  SELECT doc_id, perm.p, min((perm.a * x + perm.b) % 2147483647) AS mh
  FROM __shh, {_perm_values()} GROUP BY 1, 2
),
__band AS (
  SELECT doc_id, CAST((p - 1) // 4 AS INT) AS band_id,
         string_agg(CAST(mh AS VARCHAR), '-' ORDER BY p) AS band_key
  FROM __sig GROUP BY 1, 2
),
__cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM __band a
  JOIN __band b ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
__m AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS matches
  FROM __cand c
  JOIN __sig sa ON sa.doc_id = c.doc_a
  JOIN __sig sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(10000 * matches // 16 AS BIGINT) AS est_bp
FROM __m"""


# Churn cohort (stages/relational.churn_users, idle >= 1 day boundary —
# the fixture spans 3 days).
CHURN_USERS = """WITH __u AS (
  SELECT user_id,
         CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS last_day
  FROM events GROUP BY user_id
),
__g AS (SELECT max(last_day) AS gd FROM __u)
SELECT user_id, last_day,
       CAST((SELECT gd FROM __g) - last_day AS BIGINT) AS idle_days
FROM __u WHERE (SELECT gd FROM __g) - last_day >= 1"""


# Full curation -> packing chain (pipelines/curate.curate composed with
# stages/ordered.pack_sequences, budget 512): the end-to-end
# training-data layout manifest over the CURATED corpus.
CURATE_TO_PACK = f"""WITH {_CORPUS},
__q AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM __corpus
),
__f AS (
  SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens FROM __q
  WHERE n_tokens >= 5 AND 10000 * n_distinct // n_tokens >= 3000
),
__k AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM __f) WHERE rn = 1
),
__s AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start
  FROM __k
)
SELECT doc_id, n_tokens,
       CAST(start // 512 AS BIGINT) AS seq_id,
       CAST(start % 512 AS BIGINT) AS offset_in_seq
FROM __s"""


# Token-bucket admission (stages/relational.token_bucket): capacity 3
# tokens (micro-units), cost 1/event, refill dt_us // 36000 (1 token per
# 10 h); bucket starts full; recursive replay of the identical floors.
TOKEN_BUCKET = """WITH RECURSIVE __e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events
),
__b AS (
  SELECT event_id, user_id, t, pos,
         CAST(1 AS BIGINT) AS admitted,
         CAST(2000000 AS BIGINT) AS rem
  FROM __e WHERE pos = 1
  UNION ALL
  SELECT e.event_id, e.user_id, e.t, e.pos,
         CAST(CASE WHEN LEAST(3000000, b.rem + (e.t - b.t) // 36000)
                        >= 1000000 THEN 1 ELSE 0 END AS BIGINT) AS admitted,
         LEAST(3000000, b.rem + (e.t - b.t) // 36000)
           - CASE WHEN LEAST(3000000, b.rem + (e.t - b.t) // 36000)
                       >= 1000000 THEN 1000000 ELSE 0 END AS rem
  FROM __e e JOIN __b b ON e.user_id = b.user_id AND e.pos = b.pos + 1
)
SELECT event_id, user_id, admitted FROM __b"""


# Per-source duplication report (stages/relational.dedup_stats_by_source)
# over the duplicated dedup corpus (documents ∪ shifted copy, source kept).
DEDUP_STATS_BY_SOURCE = """WITH __c AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents
),
__d AS (SELECT source, md5(text) AS h FROM __c)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
       CAST(10000 * (count(*) - count(DISTINCT h)) // count(*) AS BIGINT)
         AS dup_rate_bp
FROM __d GROUP BY source"""


# CCNet-style perplexity filter (stages/textstats.nll_percentile_filter,
# q=7500 bp): keep docs at or below the p75 of mean per-bigram NLL
# (micro-nats, integer floors; same quantile ceil-position rule).
NLL_PERCENTILE_FILTER = """WITH __t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
__i AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i FROM __t),
__p AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2 FROM __i),
__b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM __p GROUP BY w1, w2),
__c AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cc FROM __b GROUP BY w1),
__v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS w FROM __t)),
__s AS (
  SELECT p.doc_id,
         CAST(floor(-ln((b.cb + 1.0) / (c.cc + (SELECT v FROM __v))) * 1000000)
              AS BIGINT) AS nfp
  FROM __p p JOIN __b b USING (w1, w2) JOIN __c c USING (w1)
),
__m AS (
  SELECT doc_id,
         CAST(SUM(nfp) // count(*) AS BIGINT) AS mean_nll_fp
  FROM __s GROUP BY doc_id
),
__n AS (SELECT count(*) AS n FROM __m),
__r AS (SELECT mean_nll_fp AS v,
               row_number() OVER (ORDER BY mean_nll_fp) AS rn FROM __m),
__thr AS (
  SELECT v FROM __r
  WHERE rn = GREATEST(1, (7500 * (SELECT n FROM __n) + 9999) // 10000)
)
SELECT doc_id, mean_nll_fp FROM __m
WHERE mean_nll_fp <= (SELECT v FROM __thr)"""


# Denormalized per-conversation feature table
# (stages/relational.conv_features): five aggregates on ONE exchange.
CONV_FEATURES = f"""WITH {kg_cte()},
__tf AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok,
         CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_user_turns,
         CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tool_turns
  FROM transcripts_v GROUP BY conv_id
),
__mf AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_mentions,
         CAST(count(DISTINCT entity_id) AS BIGINT) AS n_entities
  FROM __mentions GROUP BY conv_id
)
SELECT t.conv_id, t.n_turns, t.n_tok, t.n_user_turns, t.n_tool_turns,
       COALESCE(m.n_mentions, 0) AS n_mentions,
       COALESCE(m.n_entities, 0) AS n_entities
FROM __tf t LEFT JOIN __mf m USING (conv_id)"""


# Inverse-frequency source rebalancing weights
# (stages/textstats.source_weights).
SOURCE_WEIGHTS = """WITH __g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
__t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS s FROM __g)
SELECT source, n_docs,
       CAST(10000 * (SELECT n FROM __t)
            // ((SELECT s FROM __t) * n_docs) AS BIGINT) AS weight_bp
FROM __g"""


# Corpus-novelty share per doc (stages/textstats.novelty_scores):
# bigram positions whose bigram is globally unique (count == 1).
NOVELTY_SCORES = """WITH __t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
__i AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i FROM __t),
__p AS (SELECT doc_id, toks[i + 1] || chr(1) || toks[i + 2] AS bg FROM __i),
__b AS (SELECT bg, count(*) AS c FROM __p GROUP BY bg)
SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(10000 * SUM(CASE WHEN b.c = 1 THEN 1 ELSE 0 END) // count(*)
            AS BIGINT) AS novel_bp
FROM __p p JOIN __b b USING (bg)
GROUP BY p.doc_id"""


# One-row corpus datasheet (stages/textstats.corpus_summary) over the
# duplicated dedup corpus (documents UNION ALL documents).
CORPUS_SUMMARY = """WITH __c AS (
  SELECT text, lang, source FROM documents
  UNION ALL
  SELECT text, lang, source FROM documents
)
SELECT
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
  CAST(10000 * (count(*) - count(DISTINCT md5(text))) // count(*)
       AS BIGINT) AS dup_rate_bp,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM __c"""


# Diurnal load profile (stages/relational.hourly_activity): UTC
# hour-of-day x event_type counts.
HOURLY_ACTIVITY = """SELECT
  CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
  event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2"""
