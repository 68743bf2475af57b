"""DuckDB oracle SQL for every SQL-expressible query in ``__ray_entry__``.

Each SQL string runs against the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) and must produce the SAME columns/types/values as the matching
Ray pipeline. Shared CTE fragments guarantee the transcript derivation and
gazetteer cannot drift between engine and oracle.
"""

from __future__ import annotations

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

ADJACENCY_EDGES = f"""WITH {_PAIR_CTE}
SELECT subj_id AS entity_id, obj_id AS neighbor_id, pred, support AS weight FROM __triples
UNION ALL
SELECT obj_id AS entity_id, subj_id AS neighbor_id, pred, support AS weight FROM __triples"""

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
