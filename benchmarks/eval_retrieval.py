"""Retrieval quality: trained local encoder vs hash encoder, through HyperDB.

Runs the held-out paraphrase benchmark (models/localdata.retrieval_eval_set)
end-to-end through the REAL engine — documents ingested with each encoder's
embedding_function, queries answered by ``db.query`` — and reports
recall@1/recall@10/MRR per encoder. This is the acceptance measurement for
VERDICT round-1 item 1 ("prove retrieval quality"); numbers land in
BASELINE.md.

Usage: python benchmarks/eval_retrieval.py [--cpu] [--docs N] [--queries N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

import numpy as np


def run_db_eval(make_db, docs, queries, targets, top_k=10):
    db = make_db(docs)
    ranks = []
    t0 = time.time()
    for q, tgt in zip(queries, targets):
        results = db.query(q, top_k=top_k)
        ids = [r[2] for r in results]
        ranks.append(ids.index(tgt) if tgt in ids else top_k)
    wall = time.time() - t0
    ranks = np.asarray(ranks)
    return {
        "recall@1": float(np.mean(ranks < 1)),
        "recall@10": float(np.mean(ranks < 10)),
        "mrr@10": float(np.mean(np.where(ranks < top_k, 1.0 / (ranks + 1), 0.0))),
        "query_wall_s": round(wall, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--docs", type=int, default=1000)
    parser.add_argument("--queries", type=int, default=200)
    parser.add_argument("--pool", choices=["base", "hard"], default="base")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        claim_chip()

    from hyperdb_tpu import HyperDB
    from hyperdb_tpu.core.chunker import WordTokenizer
    from hyperdb_tpu.models import localdata
    from hyperdb_tpu.models.embedder import HashEmbedder, make_embedding_function
    from hyperdb_tpu.models.minilm import MiniLMEmbedder

    pool = localdata.CONCEPTS_HARD if args.pool == "hard" else None
    docs, queries, targets = localdata.retrieval_eval_set(
        num_docs=args.docs, num_queries=args.queries, pool=pool
    )
    doc_dicts = [{"text": d} for d in docs]

    encoders = {}
    local = MiniLMEmbedder.from_local_assets()
    if local is not None:
        encoders["local-trained"] = (local, local.chunk_tokenizer)
    encoders["hash"] = (HashEmbedder(dim=384), WordTokenizer())

    out = {}
    for name, (emb, tok) in encoders.items():
        fn = make_embedding_function(emb, tok)
        out[name] = run_db_eval(
            lambda dd, fn=fn: HyperDB(documents=dd, embedding_function=fn),
            doc_dicts, queries, targets,
        )
        print(f"{name}: {out[name]}", flush=True)

    print(json.dumps({"eval_retrieval": out}))
    if "local-trained" in out:
        ok = out["local-trained"]["recall@10"] > out["hash"]["recall@10"]
        print(f"local-trained beats hash: {ok}")
        return 0 if ok else 1
    print("no local assets found (run benchmarks/train_encoder.py first)")
    return 2


if __name__ == "__main__":
    sys.exit(main())
