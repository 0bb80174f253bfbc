"""DB-level int8 device-precision modes."""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB


def _db(precision):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((300, 32)).astype(np.float32)
    docs = [{"i": int(i)} for i in range(len(v))]
    return HyperDB(documents=docs, vectors=v, device_precision=precision), v


def test_int8_exact_matches_auto():
    db8, v = _db("int8")
    dba, _ = _db("auto")
    q = v[42] + 0.01
    r8 = db8.query(q, top_k=5)
    ra = dba.query(q, top_k=5)
    assert [r[2] for r in r8] == [r[2] for r in ra]
    assert r8[0][0]["i"] == 42


def test_int8_pure_cosine_works():
    db, v = _db("int8-pure")
    res = db.query(v[7], top_k=3)
    assert res[0][0]["i"] == 7


def test_int8_pure_rejects_other_metrics():
    db, v = _db("int8-pure")
    with pytest.raises(ValueError):
        db.query(v[0], metric="manhattan_distance")


def test_int8_pure_dot():
    db, v = _db("int8-pure")
    res = db.query(v[3], top_k=3, metric="dot_product")
    assert len(res) == 3


def test_invalid_precision():
    with pytest.raises(ValueError):
        HyperDB(device_precision="fp4")


def test_int8_with_filters_and_recency():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((100, 16)).astype(np.float32)
    docs = [{"i": int(i), "ts": float(i), "grp": "a" if i < 50 else "b"}
            for i in range(100)]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["grp", "ts"],
                 device_precision="int8")
    res = db.query(v[0], top_k=5, filters=[("metadata", {"grp": "b"})],
                   recency_bias=100.0, timestamp_key="ts")
    assert all(doc["grp"] == "b" for doc, *_ in res)
    assert res[0][0]["i"] == 99  # max timestamp dominates with huge bias


def test_int8_pure_with_ivf_index_queries(monkeypatch):
    """int8-pure stores keep no float device rows; the IVF gather fast path
    must fall through to the masked int8 scan instead of KeyError-ing on
    dv['rows_norm'] (the ANN restriction already rides the doc mask, Q12)."""
    from hyperdb_tpu import core as _core
    from hyperdb_tpu.core import db as _dbmod

    monkeypatch.setattr(_dbmod, "IVF_THRESHOLD", 500)
    rng = np.random.default_rng(11)
    n, d = 2048, 32
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    from hyperdb_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 0)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v,
                 device_precision="int8-pure")
    assert db.ann_index is not None and db.ann_index.is_ann
    q = v[37] + 0.01 * rng.standard_normal(d).astype(np.float32)
    res = db.query(q.astype(np.float32), top_k=5)
    assert res and res[0][2] == 37
    # batched surface too (forced through the batched-IVF decision point)
    monkeypatch.setattr(CONFIG, "batch_ivf_min_rows", 100)
    out = db.query_batch(np.stack([q, v[99]]).astype(np.float32), top_k=3)
    assert out[0][0][2] == 37 and out[1][0][2] == 99


def test_projscan_engine_routing(monkeypatch):
    """Opt-in two-stage index (HYPERDB_PROJSCAN_THRESHOLD): a full-rank
    projection through the ENGINE reproduces the int8-pure exact results
    identically; the index persists and reloads."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.index.projscan import ProjScanIndex

    monkeypatch.setattr(CONFIG, "projscan_threshold", 1)
    monkeypatch.setattr(CONFIG, "projscan_dprime", 32)  # == d: exact
    monkeypatch.setattr(CONFIG, "projscan_overfetch", 64)

    db, v = _db("int8-pure")
    assert isinstance(db.ann_index, ProjScanIndex)
    exact, _ = _db("int8-pure")
    exact.ann_index = None  # force the plain int8-pure scan

    rng = np.random.default_rng(5)
    q = (v[11] + 0.01 * rng.standard_normal(32)).astype(np.float32)
    got = db.query(q, top_k=5)
    want = exact.query(q, top_k=5)
    assert [r[2] for r in got] == [r[2] for r in want]
    for (_, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-5)

    # batch path + filters thread through both stages
    docs_parity = [("metadata", {"i": 11})]
    db2 = HyperDB(
        documents=[{"i": int(i)} for i in range(len(v))],
        vectors=v, device_precision="int8-pure", metadata_keys=["i"],
    )
    gotf = db2.query(q, top_k=3, filters=docs_parity)
    assert len(gotf) == 1 and gotf[0][0]["i"] == 11


def test_projscan_save_load_roundtrip(tmp_path, monkeypatch):
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.index.projscan import ProjScanIndex

    monkeypatch.setattr(CONFIG, "projscan_threshold", 1)
    monkeypatch.setattr(CONFIG, "projscan_dprime", 16)
    # gate off: this test exercises persistence plumbing on iid data,
    # whose d'=16/32 captured variance sits exactly at the 0.5 boundary
    monkeypatch.setattr(CONFIG, "projscan_min_variance", 0.0)
    db, v = _db("int8-pure")
    assert isinstance(db.ann_index, ProjScanIndex)
    path = str(tmp_path / "db.pickle")
    db.save(path)

    new_db = HyperDB(device_precision="int8-pure")
    new_db.load(path)
    assert isinstance(new_db.ann_index, ProjScanIndex)
    assert new_db.ann_index.d_prime == 16
    res = new_db.query(v[3], top_k=3)
    assert res[0][0]["i"] == 3


def test_projscan_probe_never_returns_pad_rows(monkeypatch):
    """probe() must mask the padded tail (review r3: pad rows surfaced
    whenever budget >= real rows, and the engine then indexed
    source_indices out of bounds on every single-query db.query())."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.index.projscan import ProjScanIndex

    monkeypatch.setattr(CONFIG, "projscan_threshold", 1)
    monkeypatch.setattr(CONFIG, "projscan_dprime", 16)
    monkeypatch.setattr(CONFIG, "projscan_min_variance", 0.0)
    rng = np.random.default_rng(9)
    n = 300  # pads to 320 on the bucket ladder
    v = rng.standard_normal((n, 32)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v,
                 device_precision="int8-pure")
    assert isinstance(db.ann_index, ProjScanIndex)
    assert db.ann_index.num_valid == n

    cand = db.ann_index.probe(v[0], budget=10_000)  # budget >> rows
    assert cand.size and cand.max() < n


def test_projscan_declines_flat_spectrum(capsys, monkeypatch):
    """An opted-in db whose corpus spectrum is flat gets the EXACT scan,
    not a known-poor-recall projected index (the on-chip ground truth:
    0.19-0.41 recall@10 at 10M, BASELINE.md projscan_crossover) — and the
    decline is cached until the corpus outgrows the probe by 50%."""
    from hyperdb_tpu.config import CONFIG

    monkeypatch.setattr(CONFIG, "projscan_threshold", 1)
    monkeypatch.setattr(CONFIG, "projscan_dprime", 4)  # 4/32 iid: ~12%
    rng = np.random.default_rng(13)
    v = rng.standard_normal((300, 32)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(len(v))],
                 vectors=v, device_precision="int8-pure")
    assert db.ann_index is None
    assert "projscan declined" in capsys.readouterr().out
    # queries serve through the exact int8-pure scan
    assert db.query(v[7], top_k=1)[0][0]["i"] == 7

    # a small append must NOT re-probe (the decline is cached)
    import hyperdb_tpu.index.projscan as ps

    def boom(*a, **k):  # pragma: no cover - fails the test if called
        raise AssertionError("re-probed a declined corpus before 1.5x growth")

    monkeypatch.setattr(ps.ProjScanIndex, "build_from_device_rows", boom)
    db.add_document({"i": 300}, vectors=v[0])
    assert db.ann_index is None

    # the engine's single-query ANN pre-filter path end to end
    res = db.query(v[17] + 0.01, top_k=20)
    assert len(res) == 20 and res[0][0]["i"] == 17


def test_projscan_rebuilds_after_mutation(monkeypatch):
    """ProjScan has no incremental add_rows: mutations must rebuild the
    index (stale projected rows would desynchronize from the store)."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.index.projscan import ProjScanIndex

    monkeypatch.setattr(CONFIG, "projscan_threshold", 1)
    monkeypatch.setattr(CONFIG, "projscan_dprime", 32)
    db, v = _db("int8-pure")
    first = db.ann_index
    assert isinstance(first, ProjScanIndex)

    rng = np.random.default_rng(3)
    extra = rng.standard_normal((4, 32)).astype(np.float32)
    db.add([{"i": 300 + j} for j in range(4)], vectors=extra)
    assert isinstance(db.ann_index, ProjScanIndex)
    assert db.ann_index is not first  # rebuilt, not grafted
    res = db.query(extra[2], top_k=1)
    assert res[0][0]["i"] == 302

    db.remove_document([0, 1])
    res = db.query(extra[2], top_k=1)
    assert res[0][0]["i"] == 302


def test_projscan_single_query_skips_probe(monkeypatch):
    """The single-query path must NOT pay ProjScanIndex.probe (review r3:
    the probe ran a stage-A scan plus a 5%-of-N device top_k whose output
    the int8-pure ranker then could not use — _rank_block's projscan
    branch requires cand_rows is None — so every db.query() was strictly
    slower than with no index at all)."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.index.projscan import ProjScanIndex

    monkeypatch.setattr(CONFIG, "projscan_threshold", 1)
    monkeypatch.setattr(CONFIG, "projscan_dprime", 16)
    monkeypatch.setattr(CONFIG, "projscan_min_variance", 0.0)
    db, v = _db("int8-pure")
    assert isinstance(db.ann_index, ProjScanIndex)

    def boom(*a, **k):  # pragma: no cover - fails the test if called
        raise AssertionError("single-query path paid the useless probe")

    monkeypatch.setattr(ProjScanIndex, "probe", boom)
    res = db.query(v[5] + 0.01, top_k=3)
    assert res[0][0]["i"] == 5
