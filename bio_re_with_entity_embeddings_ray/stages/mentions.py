"""Stage 1 — mention detection over transcript turns.

Two modes, both emitting the MENTIONS schema:

- :class:`MentionScanner` — gazetteer scan of turn ``text`` (the
  transcript-domain analog of PubTator annotation lines): a callable CLASS
  for ``map_batches(..., concurrency=N)`` so the compiled alternation regex
  and surface->id map are built ONCE per actor (reference ships the
  extractor object to every multiprocessing task instead,
  /root/reference/data/pubtator.py:363-371).

- :func:`verify_annotations` — the reference's actual mode: pre-supplied
  annotation rows with character offsets are span-verified against the
  turn text (drop if ``start > len(text)`` or
  ``text[start:end].lower() != mention_text.lower()``,
  data/pubtator.py:74-84) and their raw ids normalized 1->N
  (data/pubtator.py:96-278).

- ``tool`` column promotion — a non-null ``tool`` value is a pre-linked
  mention (input_hint), emitted as entity_type='tool'.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from bio_re_with_entity_embeddings_ray.functions import normalize
from bio_re_with_entity_embeddings_ray.sources.dictionaries import (
    DictEntry,
    GAZETTEER,
    surface_map,
)

_EMPTY = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "entity_type": pa.array([], pa.string()),
        "entity_id": pa.array([], pa.string()),
        "mention_text": pa.array([], pa.string()),
        "start": pa.array([], pa.int32()),
        "end": pa.array([], pa.int32()),
    }
)


def promote_tool_table(batch: pa.Table) -> pa.Table | None:
    """Vectorized promotion of the pre-linked ``tool`` column to mention
    rows (entity_type='tool', id 'TOOL:'+upper, sentinel -1 offsets).
    Returns None when the batch has no tool values. Single definition
    shared by the token scan path and :func:`tool_mentions`."""
    import pyarrow.compute as pc

    mask = pc.and_(pc.is_valid(batch["tool"]), pc.not_equal(batch["tool"], ""))
    sel = batch.filter(mask)
    if sel.num_rows == 0:
        return None
    tool_up = pc.utf8_upper(sel["tool"])
    return pa.table(
        {
            "conv_id": sel["conv_id"],
            "turn_idx": sel["turn_idx"],
            "entity_type": pa.array(["tool"] * sel.num_rows, pa.string()),
            "entity_id": pc.binary_join_element_wise(
                pa.array(["TOOL:"] * sel.num_rows), tool_up, ""
            ),
            "mention_text": sel["tool"],
            "start": pa.array([-1] * sel.num_rows, pa.int32()),
            "end": pa.array([-1] * sel.num_rows, pa.int32()),
        }
    )


class MentionScanner:
    """Actor-pool gazetteer scanner.

    Two match engines, chosen in ``__init__`` (mode='auto'):

    - **token** (vectorized, the default when every surface is one bare
      word): ``pc.split_pattern`` -> ``pc.index_in`` against the surface
      set — C-speed hash matching, numpy offset math, no Python loop.
      This is the engine's CANONICAL semantics and exactly the oracle's
      (oracles.kg_cte: token equality on lowered words).
    - **regex** (general fallback): compiled word-boundary alternation,
      required for multi-word or punctuated surfaces.

    The engines are NOT equivalent on punctuated text: token mode needs
    whole-token equality ("join," does not match surface "join"), regex
    mode matches at word boundaries inside tokens. They agree exactly on
    space-separated word text (pinned by tests/test_properties.py). For a
    corpus with punctuation attached to entity mentions, pass
    ``mode="regex"`` explicitly — and note the SQL oracle then diverges
    by design.

    Normalization (1->N per raw id, data/pubtator.py:96-278 analogs) is
    PRECOMPUTED per surface in ``__init__`` into flat expansion arrays, so
    the batch path never calls a normalizer.
    """

    def __init__(
        self,
        entries: list[DictEntry] | None = None,
        normalizers: dict | None = None,
        include_tool: bool = False,
        mode: str = "auto",
    ):
        entries = entries if entries is not None else GAZETTEER
        self.surfaces = surface_map(entries)
        # longest-first so overlapping surfaces prefer the longest match
        alternation = "|".join(
            re.escape(s) for s in sorted(self.surfaces, key=len, reverse=True)
        )
        self.pattern = re.compile(r"(?<!\w)(?:" + alternation + r")(?!\w)", re.IGNORECASE)
        self.normalizers = normalizers or {}
        self.include_tool = include_tool

        if mode == "auto":
            mode = (
                "token"
                if all(re.fullmatch(r"\w+", s) for s in self.surfaces)
                else "regex"
            )
        self.mode = mode
        if mode == "token":
            # expansion tables: surface index -> contiguous run of
            # (entity_type, canonical_id) rows after normalization
            surf_list = sorted(self.surfaces)
            exp_type: list[str] = []
            exp_id: list[str] = []
            counts = np.zeros(len(surf_list), dtype=np.int64)
            for i, s in enumerate(surf_list):
                for entity_type, raw_id in self.surfaces[s]:
                    for canon in self._normalize(entity_type, raw_id):
                        exp_type.append(entity_type)
                        exp_id.append(canon)
                        counts[i] += 1
            self._surf_arr = pa.array(surf_list, pa.string())
            self._exp_type = np.asarray(exp_type, dtype=object)
            self._exp_id = np.asarray(exp_id, dtype=object)
            self._exp_off = np.concatenate(([0], np.cumsum(counts)))
            self._exp_cnt = counts

    def _normalize(self, entity_type: str, raw_id: str) -> list[str]:
        fn = self.normalizers.get(entity_type)
        if fn is None:
            # same fallback chain as AnnotationVerifier: the per-type
            # registry first (chemical/gene/mutation/... rules), default
            # only for unregistered types
            fn = normalize.get(entity_type)
        return fn(raw_id)

    def _scan_token(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tok = pc.split_pattern(text, " ")
        la = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
        offs = la.offsets.to_numpy().astype(np.int64)
        flat = la.values
        lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
        ntok = len(flat)
        nrow = batch.num_rows

        # char start of each token within its row (same cumsum trick as
        # sources/transcripts.derive_batch)
        cs = np.zeros(ntok + 1, dtype=np.int64)
        np.cumsum(lens + 1, out=cs[1:])
        row_idx = np.repeat(np.arange(nrow), np.diff(offs))
        tok_start = cs[:-1] - cs[offs[:-1]][row_idx]

        sidx = pc.fill_null(
            pc.index_in(pc.utf8_lower(flat), value_set=self._surf_arr), -1
        ).to_numpy()
        hit = np.flatnonzero(sidx >= 0)
        surf_i = sidx[hit].astype(np.int64)

        # 1->N expansion: each hit token repeats for every normalized id
        reps = self._exp_cnt[surf_i]
        tok_rep = np.repeat(hit, reps)
        # flat expansion index: run start per hit + intra-run position
        run_start = np.repeat(self._exp_off[surf_i], reps)
        intra = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)))[:-1], reps
        )
        exp_i = run_start + intra

        rows = row_idx[tok_rep]
        mention = flat.take(pa.array(tok_rep))
        starts = tok_start[tok_rep]
        ends = starts + lens[tok_rep]
        out = pa.table(
            {
                "conv_id": batch["conv_id"].take(pa.array(rows)),
                "turn_idx": batch["turn_idx"].take(pa.array(rows)),
                "entity_type": pa.array(self._exp_type[exp_i], pa.string()),
                "entity_id": pa.array(self._exp_id[exp_i], pa.string()),
                "mention_text": mention,
                "start": pa.array(starts, pa.int32()),
                "end": pa.array(ends, pa.int32()),
            }
        )
        if self.include_tool:
            tool_tbl = promote_tool_table(batch)
            if tool_tbl is not None:
                out = pa.concat_tables([out, tool_tbl]).combine_chunks()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "token":
            return self._scan_token(batch)
        conv_ids = batch["conv_id"].to_pylist()
        turn_idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        tools = batch["tool"].to_pylist() if self.include_tool else None

        o_conv: list[str] = []
        o_turn: list[int] = []
        o_type: list[str] = []
        o_id: list[str] = []
        o_text: list[str] = []
        o_start: list[int] = []
        o_end: list[int] = []

        finditer = self.pattern.finditer
        surfaces = self.surfaces
        for row, text in enumerate(texts):
            cid = conv_ids[row]
            tix = turn_idxs[row]
            for m in finditer(text):
                surface = m.group(0).lower()
                for entity_type, raw_id in surfaces.get(surface, ()):
                    for canon in self._normalize(entity_type, raw_id):
                        o_conv.append(cid)
                        o_turn.append(tix)
                        o_type.append(entity_type)
                        o_id.append(canon)
                        o_text.append(m.group(0))
                        o_start.append(m.start())
                        o_end.append(m.end())
            if tools is not None:
                tool = tools[row]
                if tool:
                    o_conv.append(cid)
                    o_turn.append(tix)
                    o_type.append("tool")
                    o_id.append("TOOL:" + tool.upper())
                    o_text.append(tool)
                    o_start.append(-1)
                    o_end.append(-1)

        return pa.table(
            {
                "conv_id": pa.array(o_conv, pa.string()),
                "turn_idx": pa.array(o_turn, pa.int32()),
                "entity_type": pa.array(o_type, pa.string()),
                "entity_id": pa.array(o_id, pa.string()),
                "mention_text": pa.array(o_text, pa.string()),
                "start": pa.array(o_start, pa.int32()),
                "end": pa.array(o_end, pa.int32()),
            }
        )


def scan_mentions(
    transcripts,
    entries: list[DictEntry] | None = None,
    normalizers: dict | None = None,
    include_tool: bool = False,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
):
    """Gazetteer mention scan.

    Default (``concurrency=None``): a STATELESS task pool — the scanner
    (compiled regex + surface map) is built once on the driver and shipped
    in the task closure, giving full-cluster elastic parallelism with no
    actor ramp-up. Pass ``concurrency`` to switch to an actor pool, which
    is the right shape when the dictionary state is heavy (the reference's
    ~177k-entry vocabularies, README.md:55-146) and per-task shipping
    would dominate.

    ``batch_size=None`` (whole upstream block per call) is deliberate: a
    row-count batch size makes Ray Data bundle *input* blocks of the fused
    operator chain up to that many rows, which collapses parallelism when
    the upstream emits few-row work-item blocks that fan out into large
    outputs (measured: 1 task instead of 128). Block size is already
    bounded by DataContext.target_max_block_size.
    """
    if concurrency is None:
        scanner = MentionScanner(entries, normalizers, include_tool)
        return transcripts.map_batches(
            lambda batch: scanner(batch),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return transcripts.map_batches(
        MentionScanner,
        fn_constructor_kwargs={
            "entries": entries,
            "normalizers": normalizers,
            "include_tool": include_tool,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def tool_mentions(transcripts):
    """Promote the pre-linked ``tool`` column to mentions (vectorized)."""

    def _promote(batch: pa.Table) -> pa.Table:
        out = promote_tool_table(batch)
        return out if out is not None else _EMPTY

    return transcripts.map_batches(_promote, batch_format="pyarrow")


def _span_keep_mask_ascii(
    texts: np.ndarray, starts: np.ndarray, ends: np.ndarray,
    mentions: np.ndarray,
) -> np.ndarray:
    """Vectorized span verification for all-ASCII batches: every text and
    mention is concatenated into ONE byte buffer each (a single C-level
    join), and the t[s:e].lower() == m.lower() comparison becomes a
    fancy-indexed gather + one masked equality over a (rows x max_width)
    uint8 matrix — no per-row Python. Char offsets == byte offsets only
    for ASCII; callers must route non-ASCII batches to the loop path."""
    tlen = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    mlen = np.fromiter((len(m) for m in mentions), dtype=np.int64,
                       count=len(mentions))
    bounds = (0 <= starts) & (starts <= ends) & (ends <= tlen)
    width = ends - starts
    keep = bounds & (width == mlen)
    if not keep.any():
        return keep
    tbuf = np.frombuffer("".join(texts).encode("ascii"), dtype=np.uint8)
    mbuf = np.frombuffer("".join(mentions).encode("ascii"), dtype=np.uint8)
    toff = np.concatenate(([0], np.cumsum(tlen)[:-1]))
    moff = np.concatenate(([0], np.cumsum(mlen)[:-1]))
    maxw = int(width[keep].max())
    if maxw == 0:
        return keep  # zero-width spans: equal by definition
    col = np.arange(maxw, dtype=np.int64)[None, :]
    valid = col < width[:, None]
    # out-of-range gathers are clipped then masked out by `valid`
    tg = tbuf[np.clip((toff + starts)[:, None] + col, 0, len(tbuf) - 1)]
    mg = mbuf[np.clip(moff[:, None] + col, 0, max(len(mbuf) - 1, 0))]
    lower = lambda a: np.where((a >= 65) & (a <= 90), a + 32, a)  # noqa: E731
    eq = (lower(tg) == lower(mg)) | ~valid
    return keep & eq.all(axis=1)


class AnnotationVerifier:
    """Span-verify pre-supplied annotations against turn text and normalize
    ids (reference M4 semantics, data/pubtator.py:48-84).

    Input batches: annotation rows ALREADY joined with their turn text
    (column ``text``). Emits MENTIONS rows.

    The span check is fully vectorized for ASCII batches (one gather +
    masked equality over a uint8 matrix — the 30M-annotation compat
    corpus no longer pays a per-row Python loop); any non-ASCII text or
    mention in the batch routes the whole batch to the exact per-row
    path, because the reference's offsets are CHARACTER offsets and
    byte-indexed gathers would misalign past the first multi-byte char.
    """

    def __init__(self, normalizers: dict | None = None):
        self.normalizers = normalizers or {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _EMPTY.to_pandas()
        texts = batch["text"].to_numpy()
        starts = batch["start"].to_numpy().astype(np.int64)
        ends = batch["end"].to_numpy().astype(np.int64)
        mentions = np.array([str(m) for m in batch["mention_text"]],
                            dtype=object)
        try:
            keep = _span_keep_mask_ascii(texts, starts, ends, mentions)
        except UnicodeEncodeError:
            # non-ASCII present: exact per-row path (char offsets)
            keep = np.fromiter(
                (
                    0 <= s <= e <= len(t) and t[s:e].lower() == m.lower()
                    for t, s, e, m in zip(texts, starts, ends, mentions)
                ),
                dtype=bool,
                count=len(batch),
            )
        kept = batch.loc[keep]

        # normalization vectorized: each distinct (type, raw id) pair is
        # normalized ONCE, then the 1->N expansion is a C-level merge
        uniq = kept[["entity_type", "raw_id"]].drop_duplicates()
        rows = []
        for etype, raw in uniq.itertuples(index=False):
            fn = self.normalizers.get(etype, normalize.get(etype))
            for canon in fn(raw):
                rows.append((etype, raw, canon))
        mapping = pd.DataFrame(rows, columns=["entity_type", "raw_id", "entity_id"])
        out = kept.merge(mapping, on=["entity_type", "raw_id"])
        out = pd.DataFrame(
            {
                "conv_id": out["conv_id"],
                "turn_idx": out["turn_idx"].astype("int32"),
                "entity_type": out["entity_type"],
                "entity_id": out["entity_id"],
                "mention_text": out["mention_text"],
                "start": out["start"].astype("int32"),
                "end": out["end"].astype("int32"),
            }
        )
        return out


def verify_annotations(
    annotations,
    transcripts,
    normalizers: dict | None = None,
    num_partitions: int = 32,
):
    """Join annotations to turn text on (conv_id, turn_idx), then verify
    spans + normalize. Uses the hash join (Ray 2.49 ``Dataset.join``)."""
    turns = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    joined = annotations.join(
        turns,
        join_type="inner",
        num_partitions=num_partitions,
        on=("conv_id", "turn_idx"),
    )
    return joined.map_batches(
        AnnotationVerifier,
        fn_constructor_kwargs={"normalizers": normalizers},
        batch_format="pandas",
        concurrency=(1, 4),
    )


def fuzzy_link(transcripts, min_len: int = 4, num_buckets: int = 16):
    """Typo-tolerant entity linking: link every turn token of at least
    ``min_len`` chars that is within EDIT DISTANCE 1 of a gazetteer
    surface form (exact matches included — this is a superset of the
    exact scanner for long-enough tokens). The KG answer to noisy
    transcripts (misspelled tool/operator names), built from the
    engine's FastSS machinery: the gazetteer's deletion-key index is
    vocabulary-bounded and broadcast once; per batch the DISTINCT
    (conv, token) set fans out its deletion keys, candidate (token,
    surface) pairs come from index collisions only, and the exact check
    is the vectorized :func:`~bio_re_with_entity_embeddings_ray.stages.
    textstats._ed1_mask`. Output: distinct (conv_id, entity_id, token).

    Scale shape: one narrow pass over the transcripts (per-batch
    distinct combiner), a distinct merge of (conv, entity, token) rows
    through the measured plan — the candidate work is bounded by the
    gazetteer, not the corpus.
    """
    import ray

    from bio_re_with_entity_embeddings_ray.sources.dictionaries import (
        GAZETTEER,
    )
    from bio_re_with_entity_embeddings_ray.stages.common import merge_partials
    from bio_re_with_entity_embeddings_ray.stages.textstats import (
        _deletion_keys,
        _ed1_mask,
    )

    surfaces = np.array(sorted({e.surface for e in GAZETTEER}), dtype=object)
    skeys, sowners = _deletion_keys(surfaces)
    key2surf: dict = {}
    for k, s in zip(skeys, sowners):
        key2surf.setdefault(k, set()).add(s)
    surf2ids: dict = {}
    for e in GAZETTEER:
        surf2ids.setdefault(e.surface, []).append(e.canonical_id)
    ref = ray.put((key2surf, surf2ids))

    def link(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        k2s, s2i = ray.get(ref)  # per-worker cached
        empty = pa.table(
            {
                "conv_id": pa.array([], type=pa.string()),
                "entity_id": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.string()),
            }
        )
        if len(batch) == 0:
            return empty
        toks = batch["text"].str.lower().str.split(" ")
        counts = toks.map(len).to_numpy()
        conv = np.repeat(batch["conv_id"].to_numpy(), counts)
        flat = np.concatenate(toks.to_numpy())
        keep = np.char.str_len(flat.astype("U")) >= min_len
        ct = (
            pd.DataFrame({"conv_id": conv[keep], "token": flat[keep]})
            .drop_duplicates()
        )
        if len(ct) == 0:
            return empty
        # candidate surfaces per DISTINCT token via index collisions
        utoks = ct["token"].unique()
        tkeys, towners = _deletion_keys(np.asarray(utoks, dtype=object))
        cand_t, cand_s = [], []
        for k, t in zip(tkeys, towners):
            for s in k2s.get(k, ()):
                cand_t.append(t)
                cand_s.append(s)
        if not cand_t:
            return empty
        cand = pd.DataFrame({"token": cand_t, "surface": cand_s}).drop_duplicates()
        ok = _ed1_mask(
            cand["token"].to_numpy(), cand["surface"].to_numpy()
        )
        matched = cand[ok]
        if len(matched) == 0:
            return empty
        rows = matched.assign(
            entity_id=matched["surface"].map(lambda s: s2i[s])
        ).explode("entity_id")[["token", "entity_id"]]
        out = ct.merge(rows, on="token")[["conv_id", "entity_id", "token"]]
        return pa.table(
            {
                "conv_id": pa.array(out["conv_id"], type=pa.string()),
                "entity_id": pa.array(out["entity_id"], type=pa.string()),
                "token": pa.array(out["token"], type=pa.string()),
            }
        )

    partials = transcripts.map_batches(link, batch_format="pandas")
    return merge_partials(
        partials,
        ["conv_id", "entity_id", "token"],
        lambda b: b.drop_duplicates(["conv_id", "entity_id", "token"]),
        lambda b: b,
        num_buckets,
    )
