"""Declarative pipeline composition — the engine's user-extension surface.

Reference analog (SURVEY.md §2.9): an sklearn ``Pipeline`` of
DataFrame->DataFrame ``PipelineMixin`` steps with a static factory
(/root/reference/utils/pandas_utils.py:13-38, used at
prepare_entity_dataset.py:50-70) plus a JSON hyperparameter config
(learn_embeddings.py:97-101). Here a pipeline is a list of STEP
DESCRIPTORS (plain dicts, JSON-serializable) compiled onto one
``ray.data.Dataset`` chain — every step stays lazy and streaming; nothing
round-trips through driver memory.

    pipe = compile_pipeline([
        {"step": "not_null", "column": "text"},
        {"step": "map_column", "source": "text", "target": "n_chars",
         "fn": "len"},
        {"step": "rename_columns", "mapping": {"doc_id": "id"}},
    ])
    out = pipe(ds)

Register custom steps with :func:`register_step` (the analog of
subclassing PipelineMixin).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from bio_re_with_entity_embeddings_ray.stages import aggregate

StepFactory = Callable[..., Callable]  # params -> (ds -> ds)

_REGISTRY: dict[str, StepFactory] = {}


def register_step(name: str, factory: StepFactory) -> None:
    """Add a step type to the registry (extension surface)."""
    _REGISTRY[name] = factory


def step_names() -> list[str]:
    return sorted(_REGISTRY)


# --------------------------------------------------------------- built-ins
# Named scalar fns usable from JSON configs (no eval of arbitrary code).
_SAFE_FNS: dict[str, Callable] = {
    "len": len,
    "lower": str.lower,
    "upper": str.upper,
    "strip": str.strip,
    # single-space split to match the engine's canonical tokenization
    # (functions/textfns.tokenize) and the SQL string_split(text, ' ');
    # str.split() without a sep disagrees on empty strings (0 vs 1 tokens)
    # and consecutive/leading whitespace
    "word_count": lambda s: len(s.split(" ")),
}


def _not_null(column: str):
    """reference NotNull, utils/pandas_utils.py:41-57"""

    def apply(ds):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[column].notnull()]

        return ds.map_batches(fn, batch_format="pandas", batch_size=None)

    return apply


def _map_column(source: str, target: str, fn: str):
    """reference MapFunction, utils/pandas_utils.py:60-71; ``fn`` is a
    registered safe scalar name, not arbitrary code."""
    scalar = _SAFE_FNS[fn]

    def apply(ds):
        def run(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy(deep=False)
            batch[target] = batch[source].map(scalar)
            return batch

        return ds.map_batches(run, batch_format="pandas", batch_size=None)

    return apply


def _rename_columns(mapping: dict[str, str]):
    """reference RenameColumns, utils/pandas_utils.py:73-83.

    Implemented as an explicit pandas-batch rename rather than Ray's
    ``Dataset.rename_columns``: the built-in renames with an Arrow-batch
    UDF, and operator fusion after a pandas-format stage hands it a
    pandas DataFrame (AttributeError in Ray 2.49)."""

    def apply(ds):
        def run(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.rename(columns=mapping)

        return ds.map_batches(run, batch_format="pandas", batch_size=None)

    return apply


def _select_columns(columns: list[str]):
    def apply(ds):
        return ds.select_columns(columns)

    return apply


def _ids_to_string(column: str, sep: str = aggregate.SET_SEP):
    """reference set_to_string (sorted deterministic serialization),
    prepare_entity_dataset.py:76-81"""

    def apply(ds):
        def run(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy(deep=False)
            batch[column] = batch[column].map(lambda v: sep.join(sorted(set(v))))
            return batch

        return ds.map_batches(run, batch_format="pandas", batch_size=None)

    return apply


def _unique_values(column: str, num_buckets: int = 64):
    """reference UniqueValueExtractor -> first-class distinct (A3)"""

    def apply(ds):
        return aggregate.unique_values(ds, column, num_buckets)

    return apply


def _drop_duplicates(subset: list[str], order_col: str, num_buckets: int = 64):
    """reference DropDuplicates (A4)"""

    def apply(ds):
        return aggregate.drop_duplicates(ds, subset, order_col, num_buckets)

    return apply


def _write_parquet(path: str):
    """terminal sink step; returns the dataset for further chaining/count"""

    def apply(ds):
        ds.write_parquet(path)
        return ds

    return apply


# ---- training-data curation steps (config-driven curation pipelines) ----


def _quality_filter(min_tokens: int = 5, min_distinct_bp: int = 3000):
    """stages: length + distinct-token-ratio quality gate (curate front)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.pipelines import curate

        return curate.quality_filter(ds, min_tokens, min_distinct_bp)

    return apply


def _hash_sample(rate_bp: int, key: str = "doc_id", salt: str = "sample"):
    """deterministic salted-hash sample (stages/sampling.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import sampling

        return sampling.hash_sample(ds, rate_bp, key, salt)

    return apply


def _cap_per_group(group_col: str, n: int, key: str = "doc_id", salt: str = "cap"):
    """per-group cap by smallest salted hash (domain capping)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import sampling

        return sampling.cap_per_group(ds, group_col, n, key, salt)

    return apply


def _dedup_exact(num_buckets: int = 64):
    """exact content dedup keeping min doc_id (stages/dedup.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import dedup

        return dedup.exact_dedup(ds, num_buckets)

    return apply


def _normalize_text(out_col: str = "text"):
    """C4-style lower/collapse/trim; defaults to out_col='text' so the
    normalized corpus chains into quality_filter / dedup steps"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import safety

        return safety.normalize_text(ds, out_col=out_col)

    return apply


def _pii_scrub_step():
    """redact emails/phones; re-emits (doc_id, text) with clean text"""

    def apply(ds):
        import pandas as pd

        from bio_re_with_entity_embeddings_ray.stages import safety

        def rename(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"doc_id": batch["doc_id"], "text": batch["clean_text"]}
            )

        return safety.pii_scrub(ds).map_batches(
            rename, batch_format="pandas", batch_size=None
        )

    return apply


def _decontaminate(bench_path: str, k: int = 3, threshold_bp: int = 1000):
    """drop rows overlapping the benchmark parquet at bench_path"""

    def apply(ds):
        import ray.data as rd

        from bio_re_with_entity_embeddings_ray.stages import safety

        bench = rd.read_parquet(bench_path, columns=["doc_id", "text"])
        return safety.decontaminate_filter(ds, bench, k=k, threshold_bp=threshold_bp)

    return apply


def _pack_sequences(budget: int = 512, num_ranges: int = 16):
    """concatenate-and-chunk packing manifest (stages/ordered.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import ordered

        return ordered.pack_sequences(ds, budget=budget, num_ranges=num_ranges)

    return apply


def _deterministic_shuffle(key: str = "doc_id", salt: str = "shuffle", num_ranges: int = 16):
    """reproducible salted-hash global shuffle rank (stages/ordered.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import ordered

        return ordered.deterministic_shuffle(ds, key=key, salt=salt, num_ranges=num_ranges)

    return apply


def _weighted_sample(weight_col: str, scale: int = 10000,
                     key: str = "doc_id", salt: str = "wsample"):
    """quality-weighted deterministic Bernoulli keep (stages/sampling.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import sampling

        return sampling.weighted_sample(
            ds, weight_col, scale=scale, key=key, salt=salt
        )

    return apply


def _winsorize(col: str, lo_bp: int = 500, hi_bp: int = 9500,
               num_buckets: int = 16):
    """clip col into exact [p_lo, p_hi] global quantiles (textstats.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import textstats

        return textstats.winsorize(ds, col, lo_bp, hi_bp, num_buckets)

    return apply


def _keep_latest(key_cols: list, order_cols: list, num_buckets: int = 16):
    """CDC/upsert compaction: newest row per key (stages/aggregate.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import aggregate

        return aggregate.keep_latest(ds, key_cols, order_cols, num_buckets)

    return apply


def _explode_list(list_col: str, out_col: str):
    """flatten an Arrow list column to one row per element (unnest)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import relational

        return relational.explode_list(ds, list_col, out_col)

    return apply


def _stratified_sample(rates_bp: dict, default_bp: int = 0,
                       stratum_col: str = "lang", key: str = "doc_id",
                       salt: str = "strat"):
    """per-stratum deterministic keep rates (stages/sampling.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import sampling

        return sampling.stratified_sample(
            ds, rates_bp, default_bp=default_bp, stratum_col=stratum_col,
            key=key, salt=salt,
        )

    return apply


def _drop_repeated_turns(num_buckets: int = 16):
    """consecutive-duplicate turn removal (stages/relational.py)"""

    def apply(ds):
        from bio_re_with_entity_embeddings_ray.stages import relational

        return relational.drop_repeated_turns(ds, num_buckets)

    return apply


for _name, _factory in {
    "not_null": _not_null,
    "map_column": _map_column,
    "rename_columns": _rename_columns,
    "select_columns": _select_columns,
    "ids_to_string": _ids_to_string,
    "unique_values": _unique_values,
    "drop_duplicates": _drop_duplicates,
    "write_parquet": _write_parquet,
    "quality_filter": _quality_filter,
    "hash_sample": _hash_sample,
    "cap_per_group": _cap_per_group,
    "dedup_exact": _dedup_exact,
    "normalize_text": _normalize_text,
    "pii_scrub": _pii_scrub_step,
    "decontaminate": _decontaminate,
    "pack_sequences": _pack_sequences,
    "deterministic_shuffle": _deterministic_shuffle,
    "weighted_sample": _weighted_sample,
    "winsorize": _winsorize,
    "keep_latest": _keep_latest,
    "explode_list": _explode_list,
    "stratified_sample": _stratified_sample,
    "drop_repeated_turns": _drop_repeated_turns,
}.items():
    register_step(_name, _factory)


# --------------------------------------------------------------- compiler


def compile_pipeline(steps: list[dict]) -> Callable:
    """Compile step descriptors into one ``ds -> ds`` callable. Unknown
    step names raise immediately (config-time, not run-time)."""
    compiled = []
    for desc in steps:
        desc = dict(desc)
        name = desc.pop("step")
        if name not in _REGISTRY:
            raise KeyError(
                f"unknown pipeline step {name!r}; known: {step_names()}"
            )
        compiled.append(_REGISTRY[name](**desc))

    def run(ds):
        for apply in compiled:
            ds = apply(ds)
        return ds

    return run


def run_config(config: dict):
    """Execute a full JSON-style pipeline config (the analog of the
    reference's doc2vec JSON config + CLI entry points):

        {"input": {"path": ".../documents.parquet", "columns": [...]},
         "steps": [...], }
    """
    import ray.data as rd

    inp = config["input"]
    ds = rd.read_parquet(inp["path"], columns=inp.get("columns"))
    return compile_pipeline(config["steps"])(ds)
