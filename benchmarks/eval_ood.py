"""Out-of-distribution encoder eval: held-out stdlib docstring retrieval.

VERDICT r3 #5: the round-2 encoder evidence was self-referential — the
concept benchmarks were authored alongside the encoder, and the stdlib
docstrings used for eval text were also the pretraining text source. This
eval separates train and eval text STRUCTURALLY: queries/documents come
from stdlib SUBPACKAGE modules (email/, logging/, unittest/, ...), which
the training pipeline (localdata.stdlib_texts — top-level files only)
never walked; exact-duplicate paragraphs are dropped besides.

Task: each held-out docstring splits into two disjoint sentence halves;
given the first half, retrieve the second among N distractors (plain
cosine). Reported for the hash encoder, the trained local encoder, and a
lexical-overlap oracle-ish TF baseline. Appends to results.jsonl.

Run: python benchmarks/eval_ood.py [--num-docs 800] [--cpu]
     (forces CPU by default — this is a host-side eval, keep the chip free)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict):
    record["bench"] = "ood_encoder_eval"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-docs", type=int, default=800)
    parser.add_argument("--tpu", action="store_true",
                        help="allow the default (TPU) backend")
    parser.add_argument("--assets", default=None,
                        help="evaluate a STAGED encoder assets dir instead "
                             "of the shipped one (candidate vetting before "
                             "promotion)")
    args = parser.parse_args()

    if not args.tpu:
        os.environ["HYPERDB_CHIP_LOCK_BYPASS"] = "1"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from benchmarks._chiplock import claim_chip

        claim_chip()

    import numpy as np

    from hyperdb_tpu.models.embedder import HashEmbedder
    from hyperdb_tpu.models.localdata import (
        evaluate_retrieval,
        heldout_span_eval_set,
    )
    from hyperdb_tpu.models.minilm import MiniLMEmbedder

    eval_set = heldout_span_eval_set(num_docs=args.num_docs)
    docs, queries, targets = eval_set
    print(f"held-out eval: {len(docs)} docs / {len(queries)} queries", flush=True)
    if len(docs) < 100:
        emit({"error": f"held-out pool too small ({len(docs)})"})
        return 1

    # hash (lexical) encoder — the fallback embedder
    hash_enc = HashEmbedder(dim=384)
    m = evaluate_retrieval(hash_enc.encode, eval_set=eval_set)
    emit({"encoder": "hash", "num_docs": len(docs), **{k: round(v, 4) for k, v in m.items()}})

    # lexical sqrt-tf at 4096 dims — the strongest cheap encoder here
    lex = HashEmbedder(dim=4096, sublinear_tf=True)
    m = evaluate_retrieval(lex.encode, eval_set=eval_set)
    emit({"encoder": "lexical_4096", "num_docs": len(docs), **{k: round(v, 4) for k, v in m.items()}})

    # trained local encoder (repo assets, or a staged candidate dir)
    trained = MiniLMEmbedder.from_local_assets(assets_dir=args.assets)
    if trained is None:
        emit({"encoder": "trained_local", "error": "assets unavailable"})
        return 1
    tag = "_staged" if args.assets else ""
    m = evaluate_retrieval(trained.encode, eval_set=eval_set)
    emit({"encoder": "trained_local" + tag, "num_docs": len(docs), **{k: round(v, 4) for k, v in m.items()}})

    # the w=0.65 hybrid — the shipped zero-egress DEFAULT since round 4
    from hyperdb_tpu.models.embedder import HybridEmbedder

    hybrid = HybridEmbedder(trained, w=0.65)
    m = evaluate_retrieval(hybrid.encode, eval_set=eval_set)
    emit({"encoder": "hybrid_w65_default" + tag, "num_docs": len(docs), **{k: round(v, 4) for k, v in m.items()}})
    return 0


if __name__ == "__main__":
    sys.exit(main())
