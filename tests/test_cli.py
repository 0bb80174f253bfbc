"""CLI smoke tests (build -> stats -> query round trip)."""

import json

import pytest

from hyperdb_tpu.__main__ import main


@pytest.fixture
def corpus_file(tmp_path):
    path = tmp_path / "docs.jsonl"
    docs = [
        {"name": "ember", "info": {"type": "fire", "description": "sleeps near warm rocks"}},
        {"name": "tide", "info": {"type": "water", "description": "hunts in rivers"}},
        {"name": "gale", "info": {"type": "wind", "description": "rides mountain storms"}},
    ]
    path.write_text("\n".join(json.dumps(d) for d in docs))
    return str(path)


def test_build_stats_query(corpus_file, tmp_path, capsys):
    ckpt = str(tmp_path / "corpus.ckpt")
    main(["build", "--input", corpus_file, "--output", ckpt,
          "--metadata-keys", "info.type"])
    capsys.readouterr()

    main(["stats", "--db", ckpt])
    stats = json.loads(capsys.readouterr().out)
    assert stats["documents"] == 3
    assert stats["metadata_keys"] == ["info.type"]

    main(["query", "--db", ckpt, "--text", "sleeps near rocks", "-k", "2"])
    out_lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(out_lines) == 2
    top = json.loads(out_lines[0])
    assert top["document"]["name"] == "ember"


def test_query_with_filters(corpus_file, tmp_path, capsys):
    ckpt = str(tmp_path / "c2.ckpt")
    main(["build", "--input", corpus_file, "--output", ckpt,
          "--metadata-keys", "info.type"])
    capsys.readouterr()
    main(["query", "--db", ckpt, "--text", "anything", "-k", "3",
          "--filters", '[["metadata", {"info.type": "water"}]]'])
    # stdout carries both results and the engine's INFO/Warning prints
    # (reference Q20 parity); keep only the JSON result lines
    out_lines = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert len(out_lines) == 1
    assert json.loads(out_lines[0])["document"]["name"] == "tide"


def test_pickle_output_format(corpus_file, tmp_path, capsys):
    pkl = str(tmp_path / "corpus.pickle.gz")
    main(["build", "--input", corpus_file, "--output", pkl])
    capsys.readouterr()
    main(["stats", "--db", pkl])
    stats = json.loads(capsys.readouterr().out)
    assert stats["documents"] == 3


def test_serve_warmup_metrics_parsing(corpus_file, tmp_path, capsys, monkeypatch):
    """--warmup-metrics tolerates spaces, validates names up front with a
    clear error (advisor r3: a typo used to crash deep inside the warmup
    query), and text warmup uses the FIRST metric listed."""
    ckpt = str(tmp_path / "c3.ckpt")
    main(["build", "--input", corpus_file, "--output", ckpt])
    capsys.readouterr()

    with pytest.raises(SystemExit, match="bogus"):
        main(["serve", "--db", ckpt, "--warmup",
              "--warmup-metrics", "cosine_similarity,bogus"])

    seen = {}
    from hyperdb_tpu.core.db import HyperDB

    monkeypatch.setattr(HyperDB, "warmup", lambda self, **kw: seen.update(kw))
    import hyperdb_tpu.server as _server

    monkeypatch.setattr(_server, "serve", lambda db, **kw: 0)
    main(["serve", "--db", ckpt, "--warmup",
          "--warmup-metrics", "cosine_similarity, dot_product"])
    assert seen["metric"] == ("cosine_similarity", "dot_product")


def test_selectembed_measures_corpus(tmp_path, capsys):
    """`selectembed` runs the split-half self-eval on the user's corpus and
    prints one ranked JSON row per candidate encoder plus the env-knob
    recommendation (VERDICT r3 #3: the default deserves a build-time
    measured justification)."""
    import numpy as np

    rng = np.random.default_rng(4)
    vocab = [f"word{j}" for j in range(500)]
    path = tmp_path / "corpus.jsonl"
    path.write_text("\n".join(
        json.dumps({"text": " ".join(rng.choice(vocab, size=24).tolist())})
        for _ in range(40)
    ))
    main(["selectembed", "--input", str(path), "--max-docs", "40"])
    captured = capsys.readouterr()
    rows = [json.loads(l) for l in captured.out.strip().splitlines()]
    names = {r["encoder"] for r in rows}
    assert {"hash_384", "lexical_4096"} <= names
    assert all("recall@10" in r and "mrr" in r for r in rows)
    # rows arrive ranked best-first
    r10 = [r["recall@10"] for r in rows]
    assert r10 == sorted(r10, reverse=True)
    assert "HYPERDB_DEFAULT_EMBEDDER=" in captured.err
