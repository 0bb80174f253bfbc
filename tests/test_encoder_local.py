"""WordPiece trainer/tokenizer, local training data, and encoder assets."""

import json
import os

import numpy as np
import pytest

from hyperdb_tpu.models import localdata
from hyperdb_tpu.models.wordpiece import (
    CLS,
    PAD,
    SEP,
    SPECIALS,
    UNK,
    WordPieceTokenizer,
    train_wordpiece,
)


class TestWordPiece:
    def test_train_learns_frequent_merges(self):
        vocab = train_wordpiece(["low lower lowest " * 50], vocab_size=40)
        tok = WordPieceTokenizer(vocab)
        # 'low' appears in every word; it must have merged into one piece
        assert "low" in vocab
        assert tok.word_ids("low") == [tok.token_to_id["low"]]

    def test_greedy_longest_match(self):
        vocab = list(SPECIALS) + ["un", "##able", "##b", "a", "##ble", "unable"]
        tok = WordPieceTokenizer(vocab)
        # full-word match wins over any split
        assert tok.word_ids("unable") == [tok.token_to_id["unable"]]

    def test_unk_for_unsplittable(self):
        vocab = list(SPECIALS) + ["a", "##b"]
        tok = WordPieceTokenizer(vocab)
        assert tok.word_ids("xyz") == [tok.unk_id]

    def test_encode_decode_roundtrip(self):
        texts = localdata.stdlib_texts(max_files=20)[:50]
        vocab = train_wordpiece(texts, vocab_size=2000)
        tok = WordPieceTokenizer(vocab)
        sample = "the quick brown fox jumps over the lazy dog"
        ids = tok.encode(sample)  # chunker protocol: plain id list
        assert tok.decode(ids) == sample

    def test_model_interface_specials(self):
        vocab = train_wordpiece(["hello world " * 10], vocab_size=64)
        tok = WordPieceTokenizer(vocab)
        ids, mask = tok.encode("hello world", 16)
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
        assert len(ids) == len(mask) and all(m == 1 for m in mask)
        assert tok.pad_id == 0  # PAD is vocab slot 0

    def test_max_len_truncation(self):
        vocab = train_wordpiece(["word " * 30], vocab_size=64)
        tok = WordPieceTokenizer(vocab)
        ids, _ = tok.encode("word " * 30, 8)
        assert len(ids) == 8 and ids[-1] == tok.sep_id

    def test_save_load(self, tmp_path):
        vocab = train_wordpiece(["alpha beta gamma " * 20], vocab_size=128)
        tok = WordPieceTokenizer(vocab)
        p = str(tmp_path / "vocab.txt")
        tok.save(p)
        tok2 = WordPieceTokenizer.load(p)
        assert tok2.vocab == tok.vocab
        assert tok2.encode("alpha beta", 16) == tok.encode("alpha beta", 16)

    def test_chunker_integration(self):
        from hyperdb_tpu.core.chunker import text_to_chunks

        vocab = train_wordpiece(["word " * 50], vocab_size=64)
        tok = WordPieceTokenizer(vocab)
        chunks = text_to_chunks("word " * 700, tok, max_length=510)
        assert len(chunks) == 2
        assert chunks[0].split()[0] == "word"


class TestLocalData:
    def test_eval_set_deterministic(self):
        a = localdata.retrieval_eval_set(num_docs=50, num_queries=10)
        b = localdata.retrieval_eval_set(num_docs=50, num_queries=10)
        assert a == b

    def test_query_surface_differs_from_doc(self):
        docs, queries, targets = localdata.retrieval_eval_set(
            num_docs=100, num_queries=40
        )
        # a query must never contain its target doc's full concept surface
        hits = sum(1 for q, t in zip(queries, targets) if q[12:] in docs[t])
        assert hits == 0

    def test_training_pairs_shapes(self):
        pairs = localdata.training_pairs(100)
        assert len(pairs) == 100
        assert all(isinstance(q, str) and isinstance(d, str) for q, d in pairs)

    def test_stdlib_texts_available(self):
        texts = localdata.stdlib_texts(max_files=30)
        assert len(texts) > 20
        assert all(len(t) >= 60 for t in texts)

    def test_span_pairs_random_crops(self):
        texts = [
            "First sentence with enough words to pass the length cut here. "
            "Second sentence also has plenty of words in it for the test. "
            "Third sentence rounds out the paragraph with more material.",
        ] * 5
        pairs = localdata.span_pairs(texts, 20, seed=3, crops_per_text=3)
        assert 0 < len(pairs) <= 20
        for a, b in pairs:
            assert len(a) >= 40 and len(b) >= 40
            assert a != b
        # deterministic per seed
        assert pairs == localdata.span_pairs(texts, 20, seed=3,
                                             crops_per_text=3)

    def test_heldout_eval_skip_docs_disjoint(self):
        first = localdata.heldout_span_eval_set(num_docs=20)
        later = localdata.heldout_span_eval_set(num_docs=20, skip_docs=20)
        assert first[0] and later[0]
        assert not set(first[0]) & set(later[0])

    def test_package_texts_hygiene(self):
        # only packages present in the image count; capped walk stays fast
        texts = localdata.package_texts(packages=("numpy",), max_texts=50)
        assert len(texts) == 50
        assert all(len(t) >= 60 for t in texts)
        # held-out OOD eval paragraphs can never appear in training text
        held = set(localdata.stdlib_heldout_texts(max_texts=500))
        assert not held & set(texts)

    def test_evaluate_retrieval_perfect_encoder(self):
        docs, queries, targets = localdata.retrieval_eval_set(
            num_docs=30, num_queries=10
        )

        def oracle_encode(texts):
            # one-hot on the target mapping: doc i -> e_i; query j -> e_target
            out = np.zeros((len(texts), 30), dtype=np.float32)
            for i, t in enumerate(texts):
                if t in docs:
                    out[i, docs.index(t)] = 1.0
                else:
                    out[i, targets[queries.index(t)]] = 1.0
            return out

        metrics = localdata.evaluate_retrieval(
            oracle_encode, eval_set=(docs, queries, targets)
        )
        assert metrics["recall@1"] == 1.0 and metrics["mrr"] == 1.0


class TestEncoderAssets:
    def _make_tiny_assets(self, tmp_path):
        import jax.numpy as jnp

        from hyperdb_tpu.models.minilm import (
            EncoderConfig,
            MiniLM,
            save_params,
        )

        vocab = train_wordpiece(
            [t for p in localdata.training_pairs(50) for t in p],
            vocab_size=256,
        )
        tok = WordPieceTokenizer(vocab)
        config = EncoderConfig(
            hidden=32, layers=1, heads=2, intermediate=64,
            vocab_size=max(256, tok.vocab_size), max_positions=64,
        )
        import jax

        model = MiniLM(config=config)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4), dtype=jnp.int32),
            jnp.ones((1, 4), dtype=jnp.int32),
        )
        tok.save(str(tmp_path / "vocab.txt"))
        save_params(params, str(tmp_path / "encoder_local.npz"))
        manifest = {
            "config": {
                "hidden": 32, "layers": 1, "heads": 2, "intermediate": 64,
                "vocab_size": config.vocab_size, "max_positions": 64,
            }
        }
        with open(tmp_path / "manifest.json", "w") as f:
            json.dump(manifest, f)
        return params

    def test_save_load_params_roundtrip(self, tmp_path):
        from hyperdb_tpu.models.minilm import load_saved_params

        params = self._make_tiny_assets(tmp_path)
        loaded = load_saved_params(str(tmp_path / "encoder_local.npz"))
        import jax

        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(loaded)
        assert len(flat_a) == len(flat_b)
        # f16 storage: values round-trip within half precision
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32),
                atol=2e-3, rtol=2e-2,
            )

    def test_from_local_assets_end_to_end(self, tmp_path):
        from hyperdb_tpu.models.minilm import MiniLMEmbedder

        self._make_tiny_assets(tmp_path)
        emb = MiniLMEmbedder.from_local_assets(str(tmp_path))
        assert emb is not None
        assert emb.dim == 32
        out = emb.encode(["a creature that naps", "lives near water"])
        assert out.shape == (2, 32)
        norms = np.linalg.norm(out, axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-3)
        # deterministic: same text -> same embedding
        out2 = emb.encode(["a creature that naps", "lives near water"])
        np.testing.assert_allclose(out, out2, atol=1e-6)
        # chunk tokenizer exposed for the DB's chunking path
        assert emb.chunk_tokenizer is not None

    def test_from_local_assets_missing_dir(self, tmp_path):
        from hyperdb_tpu.models.minilm import MiniLMEmbedder

        assert MiniLMEmbedder.from_local_assets(str(tmp_path / "nope")) is None

    def test_default_embedder_hash_mode(self, monkeypatch):
        import hyperdb_tpu.models.embedder as embmod

        monkeypatch.setenv("HYPERDB_DEFAULT_EMBEDDER", "hash")
        monkeypatch.setattr(embmod, "_DEFAULT_EMBEDDERS", {})
        emb = embmod.default_embedder()
        assert isinstance(emb, embmod.HashEmbedder)


class TestShippedAssets:
    """The repo-artifact encoder (models/assets/, trained on TPU by
    benchmarks/train_encoder.py) must load and beat the hash encoder on a
    small slice of the held-out paraphrase benchmark."""

    @pytest.fixture(scope="class")
    def shipped(self):
        from hyperdb_tpu.models.minilm import ASSETS_DIR, MiniLMEmbedder

        emb = MiniLMEmbedder.from_local_assets()
        if emb is None:
            pytest.skip(f"no trained assets in {ASSETS_DIR}")
        return emb

    def test_loads_and_encodes(self, shipped):
        out = shipped.encode(["a creature that naps in the sun"])
        assert out.shape == (1, 384)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-3)

    def test_beats_hash_on_heldout(self, shipped):
        from hyperdb_tpu.models.embedder import HashEmbedder

        eval_set = localdata.retrieval_eval_set(num_docs=150, num_queries=30)
        local = localdata.evaluate_retrieval(shipped.encode, eval_set=eval_set)
        hash_m = localdata.evaluate_retrieval(
            HashEmbedder(dim=384).encode, eval_set=eval_set
        )
        assert local["recall@10"] > hash_m["recall@10"]
        assert local["mrr"] > hash_m["mrr"]

    def test_manifest_records_eval(self):
        from hyperdb_tpu.models.minilm import ASSETS_DIR

        path = os.path.join(ASSETS_DIR, "manifest.json")
        if not os.path.exists(path):
            pytest.skip("no manifest")
        with open(path) as f:
            manifest = json.load(f)
        assert manifest["beats_hash"] is True
        assert manifest["eval"]["local"]["recall@10"] > (
            manifest["eval"]["hash_baseline"]["recall@10"]
        )

    def test_default_embedder_auto_is_hybrid(self, monkeypatch):
        """The zero-egress auto default is the measured HYBRID (VERDICT r3
        #3): pure dense loses to a lexical hash on unseen text by the
        repo's own OOD eval, and since round 5 the dense channel is
        lexically DISTILLED and the default mix is w=0.70 — the measured
        best point holding in-dist >= 0.95 (concept-hard 0.965 / OOD-val
        0.641 on the disjoint validation slice)."""
        import hyperdb_tpu.models.embedder as embmod
        from hyperdb_tpu.models.minilm import MiniLMEmbedder

        monkeypatch.setenv("HYPERDB_DEFAULT_EMBEDDER", "auto")
        monkeypatch.setattr(embmod, "_DEFAULT_EMBEDDERS", {})
        emb = embmod.default_embedder()
        if isinstance(emb, embmod.HashEmbedder):
            pytest.skip("no trained assets")
        assert isinstance(emb, embmod.HybridEmbedder)
        assert isinstance(emb.dense, MiniLMEmbedder)
        assert emb.w == pytest.approx(0.70)
        assert emb.dim == 384 + 4096
        # the pure dense encoder stays one env knob away
        monkeypatch.setenv("HYPERDB_DEFAULT_EMBEDDER", "local")
        monkeypatch.setattr(embmod, "_DEFAULT_EMBEDDERS", {})
        assert isinstance(embmod.default_embedder(), MiniLMEmbedder)

    def test_existing_corpus_pins_text_query_dim(self, monkeypatch):
        """A vectors-supplied 384-d corpus (the migrated-reference shape)
        must keep getting 384-d TEXT query vectors after the hybrid became
        the new-corpus default — default_embedder(dim) returns an encoder
        PRODUCING the corpus dim, never the 4480-d hybrid."""
        import hyperdb_tpu.models.embedder as embmod
        from hyperdb_tpu import HyperDB

        monkeypatch.setenv("HYPERDB_DEFAULT_EMBEDDER", "auto")
        monkeypatch.setattr(embmod, "_DEFAULT_EMBEDDERS", {})
        rng = np.random.default_rng(0)
        v = rng.standard_normal((20, 384)).astype(np.float32)
        db = HyperDB(
            documents=[{"t": f"doc {i}"} for i in range(20)], vectors=v
        )
        emb = db._embedder()
        assert emb.dim == 384, type(emb)
        assert not isinstance(emb, embmod.HybridEmbedder)
        res = db.query("some text query about doc five", top_k=3)
        assert len(res) == 3

    def test_select_embedder_for_corpus_measures(self):
        """The build-time self-eval ranks encoders on the USER'S corpus;
        on a word-overlap corpus the lexical family must win (dense has
        never seen it, exactly the OOD failure mode the tool exists for)."""
        from hyperdb_tpu.models.embedder import select_embedder_for_corpus

        rng = np.random.default_rng(9)
        vocab = [f"tok{j}" for j in range(600)]
        texts = [
            " ".join(rng.choice(vocab, size=24).tolist()) for _ in range(60)
        ]
        best, emb, report = select_embedder_for_corpus(texts, max_docs=60)
        assert set(report) >= {"hash_384", "lexical_4096"}
        assert best in report and hasattr(emb, "encode")
        assert best in ("lexical_4096", "hash_384", "hybrid_w70")
        assert report[best]["recall@10"] >= max(
            r["recall@10"] for r in report.values()
        )


class TestDBWithLocalEncoder:
    def test_db_retrieval_with_tiny_trained_encoder(self, tmp_path):
        """End-to-end: train a tiny encoder for a few steps on CPU, plug it
        into HyperDB via the injectable boundary, retrieve."""
        import jax

        from hyperdb_tpu import HyperDB
        from hyperdb_tpu.models.embedder import make_embedding_function
        from hyperdb_tpu.models.minilm import (
            EncoderConfig, MiniLMEmbedder,
        )

        pairs = localdata.training_pairs(200, seed=5)
        vocab = train_wordpiece([t for p in pairs for t in p], vocab_size=512)
        tok = WordPieceTokenizer(vocab)
        config = EncoderConfig(
            hidden=32, layers=1, heads=2, intermediate=64,
            vocab_size=max(512, tok.vocab_size), max_positions=64,
        )
        emb = MiniLMEmbedder(params=None, tokenizer=tok, config=config)

        docs, queries, targets = localdata.retrieval_eval_set(
            num_docs=30, num_queries=5
        )
        db = HyperDB(
            documents=[{"text": d} for d in docs],
            embedding_function=make_embedding_function(emb, tok),
        )
        res = db.query(queries[0], top_k=3)
        assert len(res) == 3  # untrained weights: just a working pipeline


def test_shipped_encoder_sits_at_the_eval_ceiling():
    """The benchmark's two-concept queries tie ~11 docs exactly, so a
    PERFECT concept retriever's expected recall@10 under random tie order
    is ~0.86 (localdata.retrieval_eval_ceiling). The shipped checkpoint's
    manifest eval must sit within a whisker of that ceiling — 'data-bound'
    here means the benchmark is saturated, not that the encoder is weak."""
    import json
    import os

    from hyperdb_tpu.models import localdata
    from hyperdb_tpu.models.minilm import ASSETS_DIR

    manifest = os.path.join(ASSETS_DIR, "manifest.json")
    if not os.path.exists(manifest):
        pytest.skip("no shipped encoder assets")
    with open(manifest) as f:
        ev = json.load(f)["eval"]
    base_ceiling = localdata.retrieval_eval_ceiling()["recall@10"]
    assert 0.80 <= base_ceiling <= 0.92  # structural tie ceiling (24 concepts)
    assert ev["local"]["recall@10"] >= base_ceiling - 0.05
    if "hard" in ev:  # the 56-concept benchmark: ceiling ~1.0
        hard_ceiling = localdata.retrieval_eval_ceiling(
            pool=localdata.CONCEPTS_HARD
        )["recall@10"]
        assert hard_ceiling >= 0.98
        assert ev["hard"]["recall@10"] >= hard_ceiling - 0.05


class TestHeldOutOODEval:
    """Out-of-distribution eval source (VERDICT r3 #5): text structurally
    disjoint from the encoder's training pipeline."""

    def test_heldout_pool_is_disjoint_and_substantial(self):
        from hyperdb_tpu.models.localdata import (
            stdlib_heldout_texts,
            stdlib_texts,
        )

        held = stdlib_heldout_texts(max_texts=500)
        assert len(held) >= 300  # stdlib subpackages carry plenty of prose
        train = set(stdlib_texts())
        assert not (set(held) & train)  # exact-duplicate scrub holds

    def test_eval_set_shape_and_split(self):
        from hyperdb_tpu.models.localdata import heldout_span_eval_set

        docs, queries, targets = heldout_span_eval_set(num_docs=50)
        assert len(docs) == len(queries) == len(targets) == 50
        assert targets == list(range(50))
        # halves are disjoint sentence runs of one docstring
        for d, q in zip(docs[:10], queries[:10]):
            assert d != q and len(d) >= 40 and len(q) >= 40

    def test_hash_encoder_ood_floor(self):
        """The lexical baseline retrieves held-out docstring halves well
        above chance (measured 0.54 recall@10 at 300 docs on 2026-08-17;
        the round-3 trained dense encoder alone measured 0.26, the
        retrained round-4 one 0.37 at 800 docs — the honest OOD story
        recorded in BASELINE.md, motivating the hybrid encoder)."""
        import numpy as np

        from hyperdb_tpu.models.embedder import HashEmbedder
        from hyperdb_tpu.models.localdata import (
            evaluate_retrieval,
            heldout_span_eval_set,
        )

        eval_set = heldout_span_eval_set(num_docs=120)
        m = evaluate_retrieval(HashEmbedder(dim=384).encode, eval_set=eval_set)
        assert m["recall@10"] >= 0.4, m


def test_hybrid_embedder_mix_is_weighted_cosine(monkeypatch):
    """cosine over the hybrid concat == w*s_dense + (1-w)*s_lexical, and
    the env-selected hybrid wires through default_embedder."""
    import numpy as np

    from hyperdb_tpu.models import embedder as emb_mod

    class TinyDense:
        dim = 8

        def encode(self, texts):
            out = np.zeros((len(texts), 8), dtype=np.float32)
            for i, t in enumerate(texts):
                out[i, len(t) % 8] = 2.0
            return out

    hy = emb_mod.HybridEmbedder(TinyDense(), w=0.3, hash_dim=64)
    texts = ["alpha beta gamma", "alpha beta gamma", "totally different words"]
    e = hy.encode(texts)
    assert e.shape == (3, 8 + 64)
    s01 = float(e[0] @ e[1])
    d = emb_mod.HybridEmbedder._unit(TinyDense().encode(texts))
    h = emb_mod.HybridEmbedder._unit(
        emb_mod.HashEmbedder(dim=64, sublinear_tf=True).encode(texts)
    )
    expect = 0.3 * float(d[0] @ d[1]) + 0.7 * float(h[0] @ h[1])
    assert abs(s01 - expect) < 1e-5
    # identical texts -> unit self-similarity
    assert abs(s01 - 1.0) < 1e-5

    monkeypatch.setenv("HYPERDB_DEFAULT_EMBEDDER", "hybrid")
    monkeypatch.setenv("HYPERDB_HYBRID_W", "0.5")
    emb_mod._DEFAULT_EMBEDDERS.clear()
    try:
        chosen = emb_mod.default_embedder()
        # trained assets exist in-repo, so the hybrid must be selected
        assert type(chosen).__name__ == "HybridEmbedder"
        assert chosen.w == 0.5
    finally:
        emb_mod._DEFAULT_EMBEDDERS.clear()


def test_sublinear_tf_flattens_repetition():
    import numpy as np

    from hyperdb_tpu.models.embedder import HashEmbedder

    plain = HashEmbedder(dim=256)
    damped = HashEmbedder(dim=256, sublinear_tf=True)
    a = "the the the the the the the the cat sat"
    b = "dog runs fast the"
    # with sqrt-tf damping, the repeated function word dominates less of
    # the similarity than under raw counts
    sp = float(plain.encode([a])[0] @ plain.encode([b])[0])
    sd = float(damped.encode([a])[0] @ damped.encode([b])[0])
    assert sd < sp


class TestRound5TrainingData:
    """Round-5 encoder push (VERDICT r4 #3): image prose mining, source
    tags for hard negatives, and the lexical-distillation loss."""

    def test_image_texts_are_prose_and_deterministic(self):
        a = localdata.image_texts(max_texts=200)
        assert len(a) == 200
        # deterministic walk order
        assert a == localdata.image_texts(max_texts=200)
        # every paragraph passed the prose filter: sentence-shaped, mostly
        # alphabetic, no markdown furniture lines
        for t in a[:50]:
            assert len(t) >= 80
            assert localdata._SENTENCE_RE.search(t)
            alpha = sum(c.isalpha() or c == " " for c in t)
            assert alpha / len(t) >= 0.8

    def test_image_texts_scrub_ood_eval_source(self):
        heldout = set(localdata.stdlib_heldout_texts())
        mined = localdata.image_texts(max_texts=500)
        assert not heldout.intersection(mined)

    def test_package_texts_with_source_tags(self):
        tagged = localdata.package_texts(
            packages=("numpy",), max_texts=50, with_source=True
        )
        assert tagged and all(pkg == "numpy" for pkg, _ in tagged)
        untagged = localdata.package_texts(
            packages=("numpy",), max_texts=50
        )
        assert [t for _, t in tagged] == untagged

    def test_distill_loss_pulls_dense_sims_toward_lexical(self):
        import jax
        import jax.numpy as jnp

        from hyperdb_tpu.models.minilm import EncoderConfig, MiniLM
        from hyperdb_tpu.models.train import (
            info_nce_distill_loss,
            info_nce_loss,
        )

        config = EncoderConfig(layers=1, hidden=32, heads=2,
                               intermediate=64, vocab_size=128)
        model = MiniLM(config=config)
        rng = np.random.default_rng(0)
        b, seq = 8, 12
        batch = {
            "q_ids": rng.integers(5, 128, (b, seq)).astype(np.int32),
            "q_mask": np.ones((b, seq), np.int32),
            "d_ids": rng.integers(5, 128, (b, seq)).astype(np.int32),
            "d_mask": np.ones((b, seq), np.int32),
        }
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        )
        base = float(info_nce_loss(params, model, batch))

        # target == the model's own sims -> the distill term vanishes and
        # the loss reduces exactly to InfoNCE
        q = model.apply(params, batch["q_ids"], batch["q_mask"])
        d = model.apply(params, batch["d_ids"], batch["d_mask"])
        own = np.asarray(q @ d.T)
        b0 = dict(batch, lex_sims=jnp.asarray(own))
        same = float(info_nce_distill_loss(params, model, b0,
                                           distill_weight=7.0))
        assert abs(same - base) < 1e-5

        # a different off-diagonal target adds a positive penalty scaled
        # by the weight; the DIAGONAL is excluded (InfoNCE owns it)
        target = own.copy()
        target[0, 1] += 0.5
        b1 = dict(batch, lex_sims=jnp.asarray(target))
        offdiag = float(info_nce_distill_loss(params, model, b1,
                                              distill_weight=7.0))
        expected = 7.0 * 0.5 ** 2 / (b * b - b)
        assert abs(offdiag - base - expected) < 1e-4
        target2 = own.copy()
        target2[2, 2] += 5.0  # diagonal-only change: no effect
        b2 = dict(batch, lex_sims=jnp.asarray(target2))
        diag = float(info_nce_distill_loss(params, model, b2,
                                           distill_weight=7.0))
        assert abs(diag - base) < 1e-5

        # gradients flow from the distill term
        g = jax.grad(lambda p: info_nce_distill_loss(
            p, model, b1, distill_weight=7.0
        ) - info_nce_loss(p, model, batch))(params)
        total = sum(
            float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g)
        )
        assert total > 0.0
