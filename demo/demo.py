"""End-to-end demo: ingest 151 documents, save/load, query top-5.

Mirrors the reference demo flow (/root/reference/demo/demo.py): build the DB
from a JSONL corpus, round-trip it through a gzip pickle, then run a text
query and pretty-print the results.

Run from the repo root:  python demo/demo.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:  # run off-TPU (e.g. while the chip is busy)
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    try:  # serialize behind the advisory chip claim (benchmarks/_chiplock)
        from benchmarks._chiplock import claim_chip

        claim_chip()
    except ImportError:  # pragma: no cover
        pass

from hyperdb_tpu import HyperDB  # noqa: E402


def load_documents():
    path = os.path.join(os.path.dirname(__file__), "creatures.jsonl")
    if not os.path.exists(path):
        from make_demo_data import main as gen  # noqa

        sys.path.insert(0, os.path.dirname(__file__))
        from make_demo_data import make_documents

        docs = make_documents()
        with open(path, "w") as f:
            for doc in docs:
                f.write(json.dumps(doc) + "\n")
        return docs
    with open(path) as f:
        return [json.loads(line) for line in f]


def format_entry(creature, score=None):
    lines = []

    def walk(d, indent=0):
        for key, value in d.items():
            if isinstance(value, dict):
                lines.append("  " * indent + f"{key.capitalize()}:")
                walk(value, indent + 1)
            elif isinstance(value, list):
                lines.append("  " * indent + f"{key.capitalize()}:")
                for i, item in enumerate(value, 1):
                    if isinstance(item, dict):
                        lines.append(
                            "  " * (indent + 1)
                            + f"{i}. "
                            + ", ".join(f"{k}={v}" for k, v in item.items())
                        )
                    else:
                        lines.append("  " * (indent + 1) + f"{i}. {item}")
            else:
                lines.append("  " * indent + f"{key.capitalize()}: {value}")

    walk(creature)
    if score is not None:
        lines.append(f"Similarity: {score}")
    return "\n".join(lines)


def main():
    documents = load_documents()
    db = HyperDB(documents)

    save_path = os.path.join(os.path.dirname(__file__), "creatures_hyperdb.pickle.gz")
    db.save(save_path)
    db.load(save_path)

    results = db.query("Likes to sleep.", top_k=5)
    for res in results:
        if isinstance(res, tuple):
            document, similarity = res[0], res[1]
        else:
            document, similarity = res, None
        print(format_entry(document, similarity))
        print("-" * 40)


if __name__ == "__main__":
    main()
