"""Hybrid (dense trained ⊕ lexical hash) encoder sweep on BOTH evals.

benchmarks/eval_ood.py surfaced the round-2 blind spot: the trained
encoder saturates the in-distribution concept benchmarks but scores
recall@10 0.26 on held-out stdlib-subpackage docstring retrieval, where
the lexical hash encoder scores 0.54 (topical halves share vocabulary).
The natural production encoder is the CONCATENATION of the two unit
vectors with mixing weight w:

    e(x) = [ sqrt(w) * dense(x)/|dense(x)| ; sqrt(1-w) * hash(x)/|hash(x)| ]

whose cosine similarity is exactly  w * s_dense + (1-w) * s_hash — so one
dense-embedding pass per eval suffices and the full w sweep is matrix
algebra. This script reports recall@10 across w on:

  A. the hard concept paraphrase benchmark (in-distribution; hash ~0)
  B. the OOD held-out docstring-half retrieval  (hash 0.54, dense 0.26)

and records the sweep in results.jsonl. The shipped default follows the
measured dominant point (models/embedder.py).

Run: python benchmarks/eval_hybrid.py   (pure host/CPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HYPERDB_CHIP_LOCK_BYPASS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict):
    record["bench"] = "hybrid_encoder_sweep"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def _norm(x):
    x = np.asarray(x, dtype=np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _recall_at_10(sims, targets):
    order = np.argsort(-sims, axis=1)
    hits = [int(np.where(order[i] == t)[0][0]) < 10 for i, t in enumerate(targets)]
    return float(np.mean(hits))


def main() -> int:
    from hyperdb_tpu.models.embedder import HashEmbedder
    from hyperdb_tpu.models.localdata import (
        CONCEPTS_HARD,
        heldout_span_eval_set,
        retrieval_eval_set,
    )
    from hyperdb_tpu.models.minilm import MiniLMEmbedder

    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--hash-dim", type=int, default=384)
    parser.add_argument("--sublinear-tf", action="store_true")
    parser.add_argument("--assets", default=None,
                        help="staged encoder assets dir (candidate vetting)")
    parser.add_argument("--num-docs", type=int, default=300)
    parser.add_argument("--skip-docs", type=int, default=0,
                        help="sweep w on a later, disjoint held-out slice "
                             "(skip_docs=800 = the validation slice) so the "
                             "chosen w is never tuned on the reported eval")
    args = parser.parse_args()

    hash_enc = HashEmbedder(dim=args.hash_dim, sublinear_tf=args.sublinear_tf)
    dense = MiniLMEmbedder.from_local_assets(assets_dir=args.assets)
    if dense is None:
        emit({"error": "trained assets unavailable"})
        return 1

    evals = {}
    cd, cq, ct = retrieval_eval_set(pool=CONCEPTS_HARD)
    evals["concept_hard"] = (cd, cq, ct)
    od, oq, ot = heldout_span_eval_set(num_docs=args.num_docs,
                                       skip_docs=args.skip_docs)
    evals["ood_stdlib"] = (od, oq, ot)

    for name, (docs, queries, targets) in evals.items():
        print(f"[{name}] encoding {len(docs)} docs / {len(queries)} queries",
              flush=True)
        s_hash = _norm(hash_enc.encode(queries)) @ _norm(hash_enc.encode(docs)).T
        s_dense = _norm(dense.encode(queries)) @ _norm(dense.encode(docs)).T
        row = {"eval": name, "num_docs": len(docs),
               "hash_dim": args.hash_dim, "sublinear_tf": args.sublinear_tf,
               "assets": args.assets or "shipped",
               "skip_docs": args.skip_docs}
        for w in (0.0, 0.2, 0.35, 0.5, 0.6, 0.65, 0.7, 0.75, 0.85, 0.9, 1.0):
            sims = w * s_dense + (1.0 - w) * s_hash
            row[f"recall@10_w{w}"] = round(_recall_at_10(sims, targets), 4)
        # Reciprocal-rank fusion: rank-based, scale-free — the standard
        # way two retrievers with incomparable score distributions combine
        # without one's noise drowning the other's margins.
        rank_d = np.argsort(np.argsort(-s_dense, axis=1), axis=1)
        rank_h = np.argsort(np.argsort(-s_hash, axis=1), axis=1)
        for kk in (20, 60):
            rrf = 1.0 / (kk + rank_d) + 1.0 / (kk + rank_h)
            row[f"recall@10_rrf{kk}"] = round(_recall_at_10(rrf, targets), 4)
        emit(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
