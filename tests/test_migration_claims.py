"""Pin every executable claim in docs/MIGRATION.md so the guide cannot rot.

Each test mirrors a code snippet or table row in the migration guide; if a
rename breaks one of these, the guide (and a migrating reference user) is
broken too.
"""

import subprocess
import sys

import numpy as np


def test_compat_import_surface():
    # "Imports" section: reference code keeps working verbatim
    from hyperdb import HyperDB, EMBEDDING_MODEL, MAX_LENGTH  # noqa: F401
    from hyperdb.ranking_algorithm import (  # noqa: F401
        cosine_similarity,
        euclidean_metric,
        hyperDB_ranking_algorithm_sort,
    )

    assert MAX_LENGTH == 510
    db = HyperDB([{"t": "hello world"}])
    # reference methods live on the instance
    assert callable(db.text_to_chunks)
    assert callable(db.get_embedding)


def test_load_format_kwargs(tmp_path):
    # "Loading existing databases" table: format= spellings
    from hyperdb_tpu import HyperDB

    rng = np.random.default_rng(0)
    v = rng.standard_normal((6, 8)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(6)], vectors=v)
    for fmt, name in (("pickle", "m.pickle.gz"), ("json", "m.json"),
                      ("sqlite", "m.db")):
        path = str(tmp_path / name)
        db.save(path, format=fmt)
        fresh = HyperDB()
        fresh.load(path, format=fmt)
        assert len(fresh.documents) == 6
        assert fresh.vectors.shape == (6, 8)


def test_constructor_knobs_named_in_guide():
    from hyperdb_tpu import HyperDB

    rng = np.random.default_rng(1)
    v = rng.standard_normal((4, 8)).astype(np.float32)
    db = HyperDB(documents=[{"i": 0}, {"i": 1}, {"i": 2}, {"i": 3}],
                 vectors=v, device_precision="int8")
    assert db.query_batch(v[:2], top_k=2, ann_percent=5)


def test_env_knob_names_exist():
    # "Environment knobs" table rows must match config.py field spellings
    import inspect

    from hyperdb_tpu import config as cfg

    src = inspect.getsource(cfg)
    for name in (
        "HYPERDB_IVF_THRESHOLD",
        "HYPERDB_GROUPED_TOPK_MIN_ROWS",
        "HYPERDB_PALLAS_GMAX",
        "HYPERDB_PALLAS_GMAX_F_MIN_BATCH",
        "HYPERDB_HOST_PATH_MAX_CELLS",
    ):
        assert name in src, name
    from hyperdb_tpu.core import chunker

    assert "HYPERDB_CHUNK_TOKENIZER" in inspect.getsource(chunker)
    from hyperdb_tpu.models import embedder

    assert "HYPERDB_DEFAULT_EMBEDDER" in inspect.getsource(embedder)
    from hyperdb_tpu.core import db as dbmod

    assert "HYPERDB_DEVICE_PRECISION" in inspect.getsource(dbmod)


def test_cli_top_k_alias(tmp_path):
    # README/MIGRATION show --top-k; the CLI must accept both spellings
    import json
    import os

    docs = tmp_path / "docs.jsonl"
    with open(docs, "w") as f:
        for i in range(5):
            f.write(json.dumps({"text": f"topic {i}"}) + "\n")
    out = str(tmp_path / "c.hdb")
    # The subprocess must NEVER reach the TPU: the image's sitecustomize
    # overrides JAX_PLATFORMS whenever the axon site-dir is importable
    # (CLAUDE.md), and a second process touching the chip steals/blocks the
    # claim. Strip it from PYTHONPATH so the child falls back to CPU.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        HYPERDB_DEFAULT_EMBEDDER="hash",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo,
    )
    r = subprocess.run(
        [sys.executable, "-m", "hyperdb_tpu", "build",
         "--input", str(docs), "--output", out],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    for flag in (["-k", "2"], ["--top-k", "2"]):
        r = subprocess.run(
            [sys.executable, "-m", "hyperdb_tpu", "query", "--db", out,
             "--text", "topic 1", *flag],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-500:]
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        assert len(lines) == 2


def test_foreign_annoy_sidecar_warns_and_rebuilds(tmp_path, capsys):
    """MIGRATION.md "Reference Annoy sidecars are NOT silently honored":
    an unparseable (Annoy-binary-style) .ann sidecar next to a reference
    save triggers the documented warning, the load succeeds, and queries
    after it are EXACT (default config: the rebuilt index is the exact-scan
    null index, so the sidecar's loss costs nothing)."""
    from hyperdb_tpu import HyperDB

    rng = np.random.default_rng(7)
    v = rng.standard_normal((32, 16)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(32)], vectors=v)
    path = str(tmp_path / "ref.pickle")
    db.save(path, format="pickle", save_ann_index=False)
    # a reference-produced sidecar is an Annoy C++ binary forest — any
    # non-npz bytes reproduce the failure mode
    with open(path + ".ann", "wb") as f:
        f.write(b"annoy-forest-not-an-npz\x00\x01\x02")

    fresh = HyperDB()
    fresh.load(path, format="pickle")
    out = capsys.readouterr().out
    assert "could not parse ANN index sidecar" in out
    assert "rebuilding the index from the loaded vectors" in out

    # post-warning queries are exact (NumPy oracle on cosine)
    q = v[[5]]
    res = fresh.query_batch(q, top_k=3)[0]
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    qn = q[0] / np.linalg.norm(q[0])
    oracle = np.argsort(-(vn @ qn))[:3]
    assert [r[2] for r in res] == oracle.tolist()
