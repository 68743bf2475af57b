"""CLI surface: each command runs end to end against the sf0.001 tables
and writes real Parquet artifacts. main() is invoked in-process (the test
session owns Ray; the CLI only inits when nothing has)."""

import json
import os

from bio_re_with_entity_embeddings_ray import cli

SF = "/root/testdata/sf0.001"


def test_cli_kg(ray_session, tmp_path, capsys):
    rc = cli.main(["kg", "--sf-dir", SF, "--out", str(tmp_path / "kg"), "--num-buckets", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["triples"] > 0 and out["embeddings"] > 0
    assert os.path.isdir(tmp_path / "kg" / "triples")


def test_cli_curate(ray_session, tmp_path, capsys):
    rc = cli.main(["curate", "--sf-dir", SF, "--out", str(tmp_path / "cur"), "--num-buckets", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["curated_rows"] == out["n_docs"] > 0
    assert out["total_tokens"] > 0


def test_cli_curate_neardup(ray_session, tmp_path, capsys):
    rc = cli.main(
        ["curate", "--sf-dir", SF, "--out", str(tmp_path / "nd"), "--num-buckets", "4", "--neardup"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "neardup" and out["n_docs"] > 0


def test_cli_pipeline(ray_session, tmp_path, capsys):
    cfg = {
        "input": {"path": f"{SF}/documents.parquet", "columns": ["doc_id", "text"]},
        "steps": [
            {"step": "not_null", "column": "text"},
            {"step": "map_column", "source": "text", "target": "n_words", "fn": "word_count"},
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = cli.main(["pipeline", "--config", str(cfg_path), "--out", str(tmp_path / "p")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0


def test_cli_kg_checkpointed_resume(ray_session, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    args = [
        "kg", "--sf-dir", SF, "--out", str(tmp_path / "kg1"),
        "--num-buckets", "4", "--checkpoint-dir", ckpt,
    ]
    assert cli.main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["computed_partitions"] == 4 and first["reused_partitions"] == 0

    args[4] = str(tmp_path / "kg2")
    assert cli.main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["reused_partitions"] == 4 and second["computed_partitions"] == 0
    # resumed run produces identical artifacts
    for key in ("nodes", "triples", "scored", "adjacency"):
        assert second[key] == first[key]


def test_cli_graph(ray_session, tmp_path, capsys):
    rc = cli.main(
        ["graph", "--sf-dir", SF, "--out", str(tmp_path / "g"),
         "--num-buckets", "4"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["edges"] > 0 and out["nodes"] > 0 and out["walks"] > 0
    assert os.path.isdir(tmp_path / "g" / "edges")
    assert os.path.isfile(tmp_path / "g" / "pagerank.parquet")
    import pandas as pd

    pr = pd.read_parquet(tmp_path / "g" / "pagerank.parquet")
    assert set(pr.columns) == {"node", "rank_mu"} and (pr["rank_mu"] > 0).all()
