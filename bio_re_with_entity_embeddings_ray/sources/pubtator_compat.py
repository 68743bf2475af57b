"""PubTator offset-format compatibility reader.

The reference's native input (S1/M1, /root/reference/data/pubtator.py:14-15,
:336-355): a text file of blank-line-delimited documents —

    <pmid>|t|<title>
    <pmid>|a|<abstract>
    <pmid>\\t<start>\\t<end>\\t<mention>\\t<type>\\t<raw_id>   (0+ lines)
    <blank line>

The reference loads the ENTIRE multi-GB corpus into one driver-side Python
list (read_plain_documents) — the key non-scalable design we do not copy.
Here:

- :func:`read_pubtator` — one task per FILE (``read_binary_files``); right
  when the corpus is many moderate files.
- :func:`read_pubtator_sharded` — byte-range sharding of ONE huge file:
  the driver seeks to each ~shard_bytes offset and scans a few KB forward
  to the next blank-line boundary (analogous to Parquet row-group
  pruning), then each task reads and parses only its own range. This is
  the 70 GB single-file scale path; no task ever sees the whole file.

Documents parse to the ``documents``-style table (doc_id, title, abstract,
text); annotation lines parse to pre-linked annotation rows that flow into
:func:`stages.mentions.verify_annotations` (span check + id normalization,
the reference's extraction semantics).
"""

from __future__ import annotations

import re

import pyarrow as pa

TITLE_RE = re.compile(r"^([0-9]+)\|t\|(.*)$")  # data/pubtator.py:14
ABSTRACT_RE = re.compile(r"^([0-9]+)\|a\|(.*)$")  # data/pubtator.py:15

_DOC_SCHEMA = pa.schema(
    {
        "doc_id": pa.string(),
        "title": pa.string(),
        "abstract": pa.string(),
        "text": pa.string(),
    }
)
_ANN_SCHEMA = pa.schema(
    {
        "doc_id": pa.string(),
        "start": pa.int32(),
        "end": pa.int32(),
        "mention_text": pa.string(),
        "entity_type": pa.string(),
        "raw_id": pa.string(),
    }
)


def _doc_text(title: str, abstract: str) -> str:
    # Document.text(): title + " " + abstract, tabs stripped, stripped
    # (data/pubtator.py:25-30)
    return (title + " " + abstract).replace("\t", " ").strip()


def parse_blocks(blob: str):
    """Yield (doc_row, [ann_rows]) per blank-line-delimited block."""
    for block in re.split(r"\n\s*\n", blob):
        block = block.strip("\n")
        if not block.strip():
            continue
        doc_id = title = abstract = None
        anns = []
        for line in block.split("\n"):
            m = TITLE_RE.match(line)
            if m:
                doc_id, title = m.group(1), m.group(2)
                continue
            m = ABSTRACT_RE.match(line)
            if m:
                doc_id, abstract = m.group(1), m.group(2)
                continue
            cols = line.split("\t")
            if len(cols) >= 6:  # malformed-line guard, data/pubtator.py:101-103
                try:
                    anns.append(
                        (cols[0], int(cols[1]), int(cols[2]), cols[3], cols[4], cols[5])
                    )
                except ValueError:
                    # 6+-column non-annotation line (e.g. a relation row):
                    # skip like other malformed lines, don't kill the task
                    continue
        if doc_id is None:
            continue
        yield (doc_id, title or "", abstract or ""), anns


def _parse_batch(blobs: list[str]) -> tuple[pa.Table, pa.Table]:
    d_rows, a_rows = [], []
    for blob in blobs:
        for (doc_id, title, abstract), anns in parse_blocks(blob):
            d_rows.append((doc_id, title, abstract, _doc_text(title, abstract)))
            a_rows.extend(anns)
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in d_rows], pa.string()),
            "title": pa.array([r[1] for r in d_rows], pa.string()),
            "abstract": pa.array([r[2] for r in d_rows], pa.string()),
            "text": pa.array([r[3] for r in d_rows], pa.string()),
        },
        schema=_DOC_SCHEMA,
    )
    anns = pa.table(
        {
            "doc_id": pa.array([r[0] for r in a_rows], pa.string()),
            "start": pa.array([r[1] for r in a_rows], pa.int32()),
            "end": pa.array([r[2] for r in a_rows], pa.int32()),
            "mention_text": pa.array([r[3] for r in a_rows], pa.string()),
            "entity_type": pa.array([r[4] for r in a_rows], pa.string()),
            "raw_id": pa.array([r[5] for r in a_rows], pa.string()),
        },
        schema=_ANN_SCHEMA,
    )
    return docs, anns


def read_pubtator(paths, annotations: bool = False):
    """Parse PubTator file(s), one task per file. Returns the documents
    Dataset, or the annotations Dataset with ``annotations=True``."""
    import ray.data as rd

    which = 1 if annotations else 0

    def parse(batch: pa.Table) -> pa.Table:
        blobs = [b.decode("utf-8") for b in batch["bytes"].to_pylist()]
        return _parse_batch(blobs)[which]

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )


def shard_offsets(path: str, shard_bytes: int) -> list[tuple[int, int]]:
    """Driver-side boundary scan: [start, end) byte ranges aligned to
    blank-line document boundaries. Reads only a few KB per boundary."""
    import os

    size = os.path.getsize(path)
    cuts = [0]
    with open(path, "rb") as f:
        pos = shard_bytes
        while pos < size:
            # scan forward window by window until a boundary appears — a
            # single document larger than one probe window must not
            # collapse the rest of the file into one giant shard
            f.seek(pos)
            cut = None
            while pos < size:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                hit = re.search(rb"\n\s*\n", chunk)
                if hit is not None:
                    cut = pos + hit.end()
                    break
                # overlap by 2 bytes so a separator straddling the window
                # edge is still found
                pos += len(chunk) - 2
                f.seek(pos)
            if cut is None:
                break  # genuinely no boundary until EOF
            cuts.append(cut)
            pos = cut + shard_bytes
    cuts.append(size)
    return [(a, b) for a, b in zip(cuts, cuts[1:]) if b > a]


def read_pubtator_sharded(
    path: str, shard_bytes: int = 64 << 20, annotations: bool = False
):
    """Byte-range sharded parse of one large PubTator file: one Ray task
    per ~shard_bytes range, each reading ONLY its slice of the file."""
    import ray.data as rd

    ranges = shard_offsets(path, shard_bytes)
    which = 1 if annotations else 0

    def load(batch) -> pa.Table:
        blobs = []
        with open(path, "rb") as f:
            for s, e in zip(batch["start"], batch["end"]):
                f.seek(int(s))
                blobs.append(f.read(int(e) - int(s)).decode("utf-8"))
        return _parse_batch(blobs)[which]

    items = pa.table(
        {
            "start": pa.array([r[0] for r in ranges], pa.int64()),
            "end": pa.array([r[1] for r in ranges], pa.int64()),
        }
    )
    return rd.from_arrow(items).repartition(len(ranges)).map_batches(
        load, batch_format="numpy", batch_size=1
    )
