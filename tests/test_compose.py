"""Pipeline-composition surface: descriptor compilation, step registry
extension, JSON-config execution with a parquet sink."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bio_re_with_entity_embeddings_ray.pipelines import compose


def _ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a b c", None, "d", "a b c"], pa.string()),
            }
        )
    )


def test_compile_and_run_chain():
    pipe = compose.compile_pipeline(
        [
            {"step": "not_null", "column": "text"},
            {"step": "map_column", "source": "text", "target": "n_words", "fn": "word_count"},
            {"step": "rename_columns", "mapping": {"doc_id": "id"}},
        ]
    )
    out = pipe(_ds()).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(out.columns) == ["id", "text", "n_words"]
    assert list(out["id"]) == [1, 3, 4]
    assert list(out["n_words"]) == [3, 1, 3]


def test_unknown_step_raises_at_compile_time():
    with pytest.raises(KeyError, match="unknown pipeline step"):
        compose.compile_pipeline([{"step": "nope"}])


def test_register_custom_step():
    def double(column):
        def apply(ds):
            def run(b: pd.DataFrame) -> pd.DataFrame:
                b = b.copy(deep=False)
                b[column] = b[column] * 2
                return b

            return ds.map_batches(run, batch_format="pandas", batch_size=None)

        return apply

    compose.register_step("double", double)
    pipe = compose.compile_pipeline([{"step": "double", "column": "doc_id"}])
    out = pipe(_ds()).to_pandas()
    assert sorted(out["doc_id"]) == [2, 4, 6, 8]


def test_run_config_with_sink(tmp_path):
    cfg = {
        "input": {
            "path": "/root/testdata/sf0.001/documents.parquet",
            "columns": ["doc_id", "text"],
        },
        "steps": [
            {"step": "not_null", "column": "text"},
            {"step": "map_column", "source": "text", "target": "n_words", "fn": "word_count"},
            {"step": "write_parquet", "path": str(tmp_path / "out")},
        ],
    }
    ds = compose.run_config(cfg)
    assert ds.count() > 0
    back = rd.read_parquet(str(tmp_path / "out")).to_pandas()
    assert set(back.columns) == {"doc_id", "text", "n_words"}
    assert len(back) == ds.count()


def test_config_driven_curation_steps(ray_session, tmp_path):
    """The curation family is reachable from declarative configs: quality
    filter -> exact dedup -> deterministic sample, end to end."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    rows = {
        "doc_id": list(range(40)),
        "text": (
            ["alpha beta gamma delta epsilon"] * 20   # dups -> one survivor
            + [f"doc {i} unique words here now" for i in range(18)]
            + ["short", "a a a a a a"]                # quality-dropped
        ),
    }
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table(rows), path)

    out = compose.run_config(
        {
            "input": {"path": path, "columns": ["doc_id", "text"]},
            "steps": [
                {"step": "quality_filter", "min_tokens": 5, "min_distinct_bp": 3000},
                {"step": "dedup_exact", "num_buckets": 4},
                {"step": "hash_sample", "rate_bp": 10000},
            ],
        }
    ).to_pandas()
    # 20 dups -> 1 (min id 0); 18 unique survive; 2 quality-dropped
    assert len(out) == 19
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])


def test_cap_per_group_step_registered():
    assert "cap_per_group" in compose.step_names()


def test_tsv_roundtrip_quoting(ray_session, tmp_path):
    """TSV sink/source survives tabs, quotes and newlines inside fields."""
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.sources import tsv

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ['tab\there', 'quote "inside"', 'new\nline'],
        }
    )
    out = str(tmp_path / "tsv")
    tsv.write_tsv(rd.from_pandas(df), out)
    back = tsv.read_tsv(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_jsonl_roundtrip_unicode(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.sources import jsonl

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ['ümläut "quoted"', "tab\tand\nnewline"]}
    )
    out = str(tmp_path / "jl")
    jsonl.write_jsonl(rd.from_pandas(df), out)
    back = jsonl.read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["doc_id", "text"]], df)


def test_round3_steps_chain_config(ray_session, tmp_path):
    """normalize -> pii_scrub -> quality -> dedup -> shuffle as one
    config-driven chain over a messy corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bio_re_with_entity_embeddings_ray.pipelines import compose

    texts = [
        "Hello   WORLD this is a Fine document",
        "hello world this is a fine document",   # dup after normalize
        "ping me at x@y.org about the big launch plan",
        "a a a",                                  # fails quality
        "another perfectly reasonable clean document here",
    ]
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        p,
    )
    out = compose.run_config(
        {
            "input": {"path": p, "columns": ["doc_id", "text"]},
            "steps": [
                {"step": "normalize_text"},
                {"step": "pii_scrub"},
                {"step": "quality_filter", "min_tokens": 5},
                {"step": "dedup_exact", "num_buckets": 4},
                {"step": "deterministic_shuffle", "key": "doc_id", "num_ranges": 2},
            ],
        }
    ).to_pandas()
    # docs 0/1 collapse to one, 3 dropped; shuffle ranks are a permutation
    assert len(out) == 3
    assert sorted(out["shuffle_pos"]) == [0, 1, 2]


def test_round3_steps_compose(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bio_re_with_entity_embeddings_ray.pipelines import compose

    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "w": rng.randint(0, 12000, 200).astype(np.int64),
            "n": rng.randint(0, 5000, 200).astype(np.int64),
        }
    )
    fn = compose.compile_pipeline(
        [
            {"step": "winsorize", "col": "n", "num_buckets": 4},
            {"step": "weighted_sample", "weight_col": "w", "key": "doc_id"},
        ]
    )
    out = fn(rd.from_pandas(df).repartition(3)).to_pandas()
    assert {"doc_id", "w", "n", "clipped"} <= set(out.columns)
    assert 0 < len(out) < len(df)
    # keep_latest through the config surface
    fn2 = compose.compile_pipeline(
        [{"step": "keep_latest", "key_cols": ["w"], "order_cols": ["doc_id"],
          "num_buckets": 4}]
    )
    latest = fn2(rd.from_pandas(df).repartition(3)).to_pandas()
    assert latest["w"].is_unique
