"""Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of
mariosaenger/bio-re-with-entity-embeddings (corpus-level co-occurrence
relation extraction: mention detection -> entity linking/canonicalization
-> doc/entity mappings -> candidate (subj, pred, obj) triples -> embedding
scoring), re-expressed as streaming Ray Data pipelines over Parquet
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Nothing in here calls ``ray.init`` / ``ray.shutdown`` — the caller (driver,
bench.py, pytest fixture) owns the Ray session.
"""

from bio_re_with_entity_embeddings_ray.context import quiet_ray_data

__all__ = ["quiet_ray_data"]
