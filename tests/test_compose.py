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
