"""Deterministic text/hash primitives shared by engine, oracle SQL and tests.

Every function here has an exact DuckDB-SQL equivalent (documented inline)
so the driver's side-by-side oracle can reproduce results bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# SQL equivalent: CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
def md5int8(s: str) -> int:
    """First 8 hex chars of md5 as an int (0 .. 2^32-1). Stable everywhere."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def md5int8_array(values) -> np.ndarray:
    """Vectorized-ish md5int8 over an iterable of strings -> int64 ndarray."""
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(v.encode("utf-8")).hexdigest()[:8], 16) for v in values),
        dtype=np.int64,
        count=len(values),
    )


# SQL equivalent: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
def md5int15_array(values) -> np.ndarray:
    """First 15 hex chars of md5 as int64 (60 bits). For EQUALITY checks
    (e.g. CDC changed-doc detection) where 32 bits gives a ~2^-32 per-key
    false-negative — non-trivial at billions of docs; 60 bits is ~2^-60
    while the exchange payload stays 8 B/key."""
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(v.encode("utf-8")).hexdigest()[:15], 16) for v in values),
        dtype=np.int64,
        count=len(values),
    )


def hash_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic partition bucket for arbitrary string keys.

    Uses pandas' C-level ``hash_array`` (fixed default hash key, stable
    across processes) — this is internal partitioning only; it never needs
    a SQL equivalent.
    """
    arr = np.asarray(values, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(num_buckets)).astype(np.int64)


def tokenize(text: str) -> list[str]:
    """Single-space tokenization. SQL: string_split(text, ' ')."""
    return text.split(" ")


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """k-token shingles, ' '-joined. Documents with fewer than k tokens
    yield NO shingles — exactly the SQL equivalent's behavior
    (oracles._SHINGLES: range(1, len(parts) - 1) is empty for len < 3),
    so engine and oracle agree on short documents.

    SQL: parts[i] || ' ' || parts[i+1] || ' ' || parts[i+2] for
    i in range(1, len(parts)-k+2) (1-based list indexing).
    """
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


# n-gram Jaccard candidate generation: shingles appearing in more than
# NGRAM_MAX_DF documents are pruned BEFORE pairing (standard LSH hygiene —
# a stopword trigram shared by millions of docs would otherwise make the
# per-shingle self-join quadratic). Shared constant so the engine
# (stages/dedup.ngram_jaccard_pairs) and the SQL oracle (oracles.NGRAM_JACCARD)
# cap identically.
NGRAM_MAX_DF = 256

# MinHash: h_i(x) = (a_i * x + b_i) % MINHASH_PRIME over x = md5int8(shingle).
# Fixed coefficients so Python and SQL agree; 16 permutations, 4 bands x 4 rows.
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_NUM_PERMS = 16
MINHASH_BAND_ROWS = 4
_rng = np.random.RandomState(1234)
MINHASH_A = (_rng.randint(1, MINHASH_PRIME, size=MINHASH_NUM_PERMS)).astype(np.int64)
MINHASH_B = (_rng.randint(0, MINHASH_PRIME, size=MINHASH_NUM_PERMS)).astype(np.int64)


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """MinHash signature (len = MINHASH_NUM_PERMS) of a set of shingle hashes."""
    if len(shingle_hashes) == 0:
        return np.full(MINHASH_NUM_PERMS, MINHASH_PRIME - 1, dtype=np.int64)
    # reduce x mod p FIRST so a*x stays < 2^62 (no int64 overflow; the SQL
    # oracle does the same): a < 2^31, x%p < 2^31
    x = shingle_hashes % MINHASH_PRIME
    h = (MINHASH_A[:, None] * x[None, :] + MINHASH_B[:, None]) % MINHASH_PRIME
    return h.min(axis=1)


def simhash32(token_hashes: np.ndarray) -> int:
    """32-bit SimHash over md5int8 token hashes (multiset semantics).

    bit_j(doc) = 1 iff sum over tokens of (+1 if bit j of md5int8(tok) else -1) > 0.
    SQL equivalent: unnest tokens x range(32), sum +-1 per bit, rebuild int.
    """
    if len(token_hashes) == 0:
        return 0
    bits = (token_hashes[:, None] >> np.arange(32)[None, :]) & 1  # (T, 32)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.int64) << np.arange(32)).sum())
