"""Property-based conformance (SURVEY.md §5): row-order permutation
invariance of reassembly and aggregation, determinism of normalizers over
adversarial ids, and scanner/oracle token-semantics agreement on random
texts. Hypothesis drives the inputs; Ray work happens on tiny datasets."""

from __future__ import annotations

import string

import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from bio_re_with_entity_embeddings_ray.functions import normalize as nz
from bio_re_with_entity_embeddings_ray.stages.mentions import MentionScanner
from bio_re_with_entity_embeddings_ray.stages.reassembly import conversations

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_words = st.lists(
    st.sampled_from(["join", "sort", "table", "key", "alpha", "beta", "x1"]),
    min_size=1,
    max_size=8,
)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 6), _words),
        min_size=1,
        max_size=12,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.randoms(use_true_random=False),
)
@settings(**_SETTINGS)
def test_reassembly_permutation_invariant(turn_specs, rnd):
    """Input row order must not affect conversation text (stable turn_idx
    sort — reference doc order invariant, data/pubtator.py:289-316)."""
    rows = [
        (f"c{c}", t, " ".join(ws)) for c, t, ws in turn_specs
    ]
    shuffled = rows[:]
    rnd.shuffle(shuffled)

    def run(rs):
        tbl = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rs]),
                "turn_idx": pa.array([r[1] for r in rs], pa.int32()),
                "text": pa.array([r[2] for r in rs]),
            }
        )
        out = conversations(rd.from_arrow(tbl), num_buckets=4).to_pandas()
        return out.sort_values("conv_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(run(rows), run(shuffled))


@given(st.text(alphabet=string.printable, max_size=30))
@settings(**_SETTINGS)
def test_normalizers_total_and_deterministic(raw):
    """Every normalizer is total (no exception on arbitrary input) and
    deterministic; outputs are always lists of non-empty strings."""
    for fn in (
        nz.normalize_default,
        nz.normalize_chemical,
        nz.normalize_cellline,
        nz.normalize_gene,
        nz.normalize_mutation,
        nz.normalize_species,
        nz.make_normalize_drug({"MESH:D1": "DB1|DB2"}),
        nz.make_normalize_disease({"MESH:D1": "DOID:1"}),
    ):
        a, b = fn(raw), fn(raw)
        assert a == b
        assert isinstance(a, list)
        assert all(isinstance(x, str) and x for x in a)


@given(_words)
@settings(**_SETTINGS)
def test_scanner_token_and_regex_agree(ws):
    """The vectorized token engine and the regex engine emit identical
    mentions for single-word gazetteers over space-separated text."""
    text = " ".join(ws)
    batch = pa.table(
        {
            "conv_id": pa.array(["c"]),
            "turn_idx": pa.array([0], pa.int32()),
            "text": pa.array([text]),
            "tool": pa.array([None], pa.string()),
        }
    )
    tok = MentionScanner(include_tool=True)(batch).to_pandas()
    rex = MentionScanner(include_tool=True, mode="regex")(batch).to_pandas()
    key = ["turn_idx", "start", "entity_type", "entity_id"]
    pd.testing.assert_frame_equal(
        tok.sort_values(key).reset_index(drop=True),
        rex.sort_values(key).reset_index(drop=True),
    )
