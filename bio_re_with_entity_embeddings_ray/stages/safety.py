"""Training-data safety operators: benchmark decontamination and PII
scrubbing.

Both are first-class needs of an LLM pretraining pipeline the reference
(a KG-extraction engine) has no analog for:

- :func:`decontaminate` flags documents whose k-gram shingles overlap a
  held-out benchmark/eval suite (the standard n-gram decontamination of
  GPT-3 appendix C / PaLM §7), so eval data never leaks into training.
- :func:`pii_scrub` counts and redacts personally-identifying substrings
  (emails, phone-like numbers) with RE2 regexes that DuckDB evaluates
  identically, so the scrub is oracle-checkable bit-for-bit.

Scale shapes:
- The benchmark side of decontamination is SMALL by contract (eval
  suites are 10^3-10^5 documents, so ≤ ~10^7 distinct shingle hashes ≈
  80 MB) — the classic broadcast side: distinct-hashed once, ``ray.put``
  once, read in every task. The corpus side stays a narrow map: shingle
  hashes are md5'd once per DISTINCT shingle per batch (same trick as
  textstats.fingerprints) and membership is a sorted ``searchsorted``.
  If a benchmark ever outgrows broadcast, the same output is a hash
  semi-join of shingle tables (relational.key_semi_anti_join's plan).
- pii_scrub is a pure narrow map over Arrow string kernels
  (``count_substring_regex`` / ``replace_substring_regex``) — zero
  Python per row, no shuffle, streams at full scan speed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bio_re_with_entity_embeddings_ray.stages.textstats import (
    distinct_shingle_hashes_per_row as _distinct_shingle_hashes_per_row,
)


def benchmark_shingle_hashes(bench_docs, k: int = 3) -> np.ndarray:
    """Sorted distinct md5int8 shingle hashes of the benchmark corpus —
    the broadcast side of :func:`decontaminate`. Per-batch distinct via
    the vectorized kernel, global distinct on the (small) union."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        _, _, h = _distinct_shingle_hashes_per_row(batch["text"], k)
        return pd.DataFrame({"h": np.unique(h)})

    tab = bench_docs.map_batches(
        local, batch_format="pandas", batch_size=None
    ).to_pandas()
    if "h" not in tab.columns:  # every batch empty (no doc reaches k tokens)
        return np.empty(0, dtype=np.int64)
    return np.unique(tab["h"].to_numpy())


def decontaminate(docs, bench_docs, k: int = 3, threshold_bp: int = 1000):
    """Per-document benchmark-overlap report:
    (doc_id, n_shingles, n_overlap, contam_bp, contaminated) where
    ``n_shingles`` counts DISTINCT k-token shingles, ``n_overlap`` those
    also present anywhere in ``bench_docs``, ``contam_bp`` = 10000 *
    n_overlap // max(n_shingles, 1), and ``contaminated`` = 1 iff
    contam_bp >= threshold_bp. Documents with < k tokens have no
    shingles and report all-zero (never contaminated).

    A curation pipeline drops (or quarantines) rows with
    ``contaminated = 1`` before training. Engine and oracle both match
    shingles by md5int8 hash, so they agree bit-for-bit by construction
    (including on the astronomically-unlikely 32-bit collision)."""
    import ray

    bench_ref = ray.put(benchmark_shingle_hashes(bench_docs, k))

    class Overlap:
        def __init__(self, bref):
            self.bench = ray.get(bref)  # sorted int64

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n, sh_row, sh_hash = _distinct_shingle_hashes_per_row(batch["text"], k)
            n_sh = np.bincount(sh_row, minlength=n).astype(np.int64)
            if len(self.bench):
                pos = np.clip(
                    np.searchsorted(self.bench, sh_hash), 0, len(self.bench) - 1
                )
                hit = self.bench[pos] == sh_hash
            else:
                hit = np.zeros(len(sh_hash), dtype=bool)
            n_ov = np.bincount(sh_row[hit], minlength=n).astype(np.int64)
            bp = 10000 * n_ov // np.maximum(n_sh, 1)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_shingles": n_sh,
                    "n_overlap": n_ov,
                    "contam_bp": bp,
                    "contaminated": (bp >= threshold_bp).astype(np.int64),
                }
            )

    return docs.map_batches(
        Overlap,
        fn_constructor_args=(bench_ref,),
        batch_format="pandas",
        concurrency=(1, 8),
    )


def decontaminate_filter(ds, bench_docs, k: int = 3, threshold_bp: int = 1000):
    """Drop rows whose benchmark shingle overlap reaches ``threshold_bp``
    (same contamination definition as :func:`decontaminate`), keeping all
    input columns — the inline curation form used by
    pipelines.curate.curate_decontam. A pure narrow map against the
    broadcast benchmark hash set: no join, no exchange, text never
    moves."""
    import ray

    bench_ref = ray.put(benchmark_shingle_hashes(bench_docs, k))

    class Keep:
        def __init__(self, bref):
            self.bench = ray.get(bref)  # sorted int64

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n, sh_row, sh_hash = _distinct_shingle_hashes_per_row(batch["text"], k)
            n_sh = np.bincount(sh_row, minlength=n).astype(np.int64)
            if len(self.bench):
                pos = np.clip(
                    np.searchsorted(self.bench, sh_hash), 0, len(self.bench) - 1
                )
                hit = self.bench[pos] == sh_hash
            else:
                hit = np.zeros(len(sh_hash), dtype=bool)
            n_ov = np.bincount(sh_row[hit], minlength=n).astype(np.int64)
            bp = 10000 * n_ov // np.maximum(n_sh, 1)
            return batch[bp < threshold_bp]

    return ds.map_batches(
        Keep,
        fn_constructor_args=(bench_ref,),
        batch_format="pandas",
        batch_size=None,
        concurrency=(1, 8),
    )


# RE2 syntax, evaluated identically by pyarrow (RE2) and DuckDB (RE2).
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z][a-z]+"
PHONE_RE = r"\b[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]\b"


def normalize_text(docs, out_col: str = "norm_text"):
    """C4-style text normalization: (doc_id, <out_col>) = lowercase,
    collapse whitespace runs (space/tab/newline) to single spaces, trim.
    Pure Arrow kernels (``utf8_lower`` + RE2 ``replace_substring_regex``
    + ``utf8_trim_whitespace``) mirrored exactly by DuckDB
    lower/regexp_replace/trim — the canonicalization pass that runs
    before exact dedup so formatting variants collapse. Pass
    ``out_col="text"`` to chain into downstream text operators."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(batch["text"], type=pa.string())
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(arr), "[ \t\n]+", " ")
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                out_col: norm.to_numpy(zero_copy_only=False),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def pii_scrub(docs):
    """(doc_id, n_emails, n_phones, clean_text): count PII matches and
    redact them to ``<EMAIL>`` / ``<PHONE>`` placeholders. Emails are
    replaced first so a phone-like digit run inside an address can't be
    double-redacted. Pure Arrow kernels — no Python per row."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(batch["text"], type=pa.string())
        n_email = pc.count_substring_regex(arr, EMAIL_RE).to_numpy().astype(np.int64)
        n_phone = pc.count_substring_regex(arr, PHONE_RE).to_numpy().astype(np.int64)
        clean = pc.replace_substring_regex(arr, EMAIL_RE, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_emails": n_email,
                "n_phones": n_phone,
                "clean_text": clean.to_numpy(zero_copy_only=False),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


# the default term blocklist for blocklist_hits — deliberately made of
# tokens that EXIST in the synthetic corpus so the op has positives
BLOCKLIST = ("alpha", "delta", "sigma")


def blocklist_hits(docs, terms: tuple[str, ...] = BLOCKLIST):
    """Dictionary-based safety scoring: per document, the number of
    token positions matching a (case-insensitive) blocklist term and the
    hit rate in basis points — the cheap pre-filter stage every safety
    pipeline runs before model-based scoring. Returns
    (doc_id, n_tokens, n_blocked, blocked_bp).

    Scale shape: pure narrow map; membership is decided once per batch
    on the tiny batch VOCABULARY (the token_quality_arrays discipline)
    and propagated to the token stream by integer isin + bincount — the
    blocklist itself is process-constant (no broadcast needed)."""
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        _flat_token_codes,
    )

    lowered = tuple(t.lower() for t in terms)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, codes, vocab = _flat_token_codes(batch["text"])
        n = len(n_tok)
        vlow = np.char.lower(vocab.astype(str))
        bad_codes = np.flatnonzero(np.isin(vlow, lowered))
        n_blocked = np.bincount(
            row_idx[np.isin(codes, bad_codes)], minlength=n
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_blocked": n_blocked,
                "blocked_bp": 10000 * n_blocked // np.maximum(n_tok, 1),
            }
        )

    return docs.map_batches(fn, batch_format="pandas", batch_size=None)
