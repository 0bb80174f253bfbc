"""OOD eval, hybrid row only (the full eval_ood.py re-runs the dense pass
for the hybrid and can outlive a batch timeout on a busy host — this
computes just the shipped-default hybrid row on the same held-out set).

Run: python benchmarks/eval_ood_hybrid.py [--num-docs 800]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-docs", type=int, default=800)
    parser.add_argument("--assets", default=None,
                        help="staged encoder assets dir (candidate vetting)")
    args = parser.parse_args()

    os.environ["HYPERDB_CHIP_LOCK_BYPASS"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from hyperdb_tpu.models.embedder import HybridEmbedder
    from hyperdb_tpu.models.localdata import (
        evaluate_retrieval,
        heldout_span_eval_set,
    )
    from hyperdb_tpu.models.minilm import MiniLMEmbedder

    eval_set = heldout_span_eval_set(num_docs=args.num_docs)
    trained = MiniLMEmbedder.from_local_assets(assets_dir=args.assets)
    if trained is None:
        print("assets unavailable")
        return 1
    hybrid = HybridEmbedder(trained)  # the SHIPPED default mix
    m = evaluate_retrieval(hybrid.encode, eval_set=eval_set)
    tag = "_staged" if args.assets else ""
    rec = {"encoder": f"hybrid_w{round(hybrid.w * 100)}_default" + tag,
           "num_docs": len(eval_set[0]),
           **{k: round(v, 4) for k, v in m.items()},
           "bench": "ood_encoder_eval",
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
