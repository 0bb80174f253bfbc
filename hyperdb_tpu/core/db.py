"""HyperDB — the public DB facade.

Drop-in capability parity with the reference class
(/root/reference/hyperdb/hyperdb.py:29-1586), rebuilt around the TPU-native
core: the host keeps the document payloads and chunk bookkeeping
(``documents`` / ``source_indices`` / ``split_info`` / ``_metadata_index``),
while all scoring runs as fused XLA programs over a padded device view of
the vector matrix (hyperdb_tpu.core.store / hyperdb_tpu.ops /
hyperdb_tpu.query.engine).

Public surface (SURVEY.md §1 L7): constructor knobs, add / add_document /
add_documents / commit_pending / remove_document, query (+ batched
query_batch), set_ann_metric, save / load, size, dict,
compute_and_save_word_frequencies, clear_cache, get_cache_size_and_info,
plus the exposed helpers (filter_document, get_nested_value, text_to_chunks,
prepare_texts_and_indices, tokenize, validate_*).
"""

from __future__ import annotations

import collections
import datetime
import string
from typing import Any, Iterable

import numpy as np

from hyperdb_tpu.core import chunker as _chunker
from hyperdb_tpu.core import nested as _nested
from hyperdb_tpu.core.store import VectorStore
from hyperdb_tpu.index.flat import FlatIndex
from hyperdb_tpu.persist import io as _persist
from hyperdb_tpu.query import engine as _engine
from hyperdb_tpu.query import filters as _filters
from hyperdb_tpu.utils import log
from hyperdb_tpu.utils.lru import LRUCache
from hyperdb_tpu.utils.sizeof import deep_sizeof
from hyperdb_tpu.utils.trace import Stats

_ACCEPTED_ANN_METRICS = ("angular", "euclidean", "manhattan", "hamming", "dot", "cosine")
_FP_PRECISIONS = ("float16", "float32", "float64")

# Corpora with at least this many rows get a real IVF index; the default is
# disabled because the exact scan beats the IVF gather at every measured
# scale on TPU (config.py:ivf_threshold cites the runs). Opt in via
# HYPERDB_IVF_THRESHOLD (hyperdb_tpu/config.py) or by rebinding this name.
from hyperdb_tpu.config import CONFIG as _CONFIG  # noqa: E402

IVF_THRESHOLD = _CONFIG.ivf_threshold


class HyperDB:
    """TPU-native document store and similarity search engine.

    Args mirror the reference constructor (hyperdb.py:45-57):
      documents, vectors, select_keys, embedding_function, fp_precision,
      add_timestamp, metadata_keys, ann_metric, n_trees, cache_size.
    ``n_trees`` is kept for API parity and seeds the IVF sizing heuristic.
    """

    # The reference's precomputed-vectors constructor branch never populates
    # the metadata index (hyperdb.py:127-135), so its metadata filters on
    # such corpora match nothing. hyperdb_tpu fixes that (True); the compat
    # ``hyperdb`` package overrides to False for bug-for-bug reference
    # behavior (its own suite depends on the vacuous-empty results — see
    # benchmarks/reference_groundtruth.py).
    _index_constructor_metadata = True

    def __init__(
        self,
        documents=None,
        vectors=None,
        select_keys=None,
        embedding_function=None,
        fp_precision: str = "float32",
        add_timestamp: bool = False,
        metadata_keys=None,
        ann_metric: str = "cosine",
        n_trees: int = 10,
        cache_size: int = 256,
        device_precision: str | None = None,
    ):
        # LRU query cache (C21)
        self.lru_cache = LRUCache(maxsize=cache_size)
        self.cache_hits = 0
        self.cache_misses = 0

        if fp_precision not in _FP_PRECISIONS:
            raise ValueError("Unsupported floating-point precision.")
        if ann_metric not in _ACCEPTED_ANN_METRICS:
            raise ValueError(
                "Unsupported ANN metric. Accepted values are: "
                + ", ".join(_ACCEPTED_ANN_METRICS)
            )

        self.source_indices: list[int] = []
        self.split_info: dict[int, int] = {}
        self.documents: list = []
        self.select_keys = select_keys
        self.add_timestamp = add_timestamp

        self.fp_precision = getattr(np, fp_precision)
        # device representation: 'auto' | 'int8' (scan int8, re-score full
        # precision — exact) | 'int8-pure' (half the HBM, dot/cosine only)
        if device_precision is None:
            import os

            device_precision = os.environ.get("HYPERDB_DEVICE_PRECISION", "auto")
        if device_precision not in ("auto", "int8", "int8-pure"):
            raise ValueError("device_precision must be auto, int8 or int8-pure.")
        self._store = VectorStore(self.fp_precision, precision=device_precision)
        self.embedding_function = embedding_function or self.get_embedding
        self.n_trees = n_trees

        if isinstance(self.select_keys, str):
            self.select_keys = [self.select_keys]

        self.vectors_normalized = False

        # Pending (staged) ingest state (C8): per staged document we keep the
        # document, its vector rows, its chunk count, and whether the chunk
        # count should be recorded in split_info (embedded docs only — the
        # reference never records split_info for precomputed vectors).
        self.pending_vectors: list[np.ndarray] = []
        self.pending_documents: list = []
        self.pending_source_indices: list[int] = []
        self._pending_splits: list[tuple[int, bool]] = []

        self._metadata_index: dict[int, dict] = {}
        self.metadata_keys = metadata_keys or []
        if isinstance(metadata_keys, str):
            self.metadata_keys = [metadata_keys]

        self.document_keys: list[str] = []
        if self.add_timestamp and "timestamp" not in self.metadata_keys:
            self.metadata_keys.append("timestamp")
            self.document_keys.append("timestamp")

        # Observability: per-phase counters/latencies (SURVEY.md §5 —
        # tracing is a first-class feature here, unlike the reference)
        self.stats = Stats()

        # Derived acceleration state (rebuilt on mutation)
        self._metadata_codes = _filters.MetadataCodes()
        self._key_embed_cache: dict = {}
        self._sentence_mask_cache: dict = {}
        self._timestamp_cache: dict = {}  # timestamp_key -> (N,) f64 array
        self._tokenizer_obj = None
        self._embedder_obj = None

        if documents:
            documents = self.validate_and_convert_documents(documents)

        if documents and isinstance(documents[0], dict):
            self.document_keys = self.collect_document_keys(documents)
            if self.metadata_keys:
                if self.select_keys:
                    self.validate_keys(
                        self.metadata_keys, self.select_keys,
                        "metadata_keys", "select_keys",
                    )
                self.validate_keys(
                    self.metadata_keys, self.document_keys,
                    "metadata_keys", "document_keys",
                )

        self.ann_metric = ann_metric
        self.ann_index = None
        self.ann_dim: int | None = None

        if vectors is not None:
            self.validate_vector_uniformity(vectors)
            self.ann_dim = len(vectors[0])
            self._store.set(np.asarray(vectors, dtype=self.fp_precision))
            self.documents = list(documents) if documents else []
            if self.select_keys:
                self.documents = [self.filter_document(d) for d in self.documents]
            self.source_indices = list(range(len(self.documents)))
            # Conscious fix over the reference: the precomputed-vectors branch
            # also indexes metadata (the reference skips _store_metadata here,
            # hyperdb.py:127-135, leaving metadata filters vacuously empty —
            # ground-truthed by benchmarks/reference_groundtruth.py). The
            # compat package sets _index_constructor_metadata = False to be
            # bug-for-bug with the reference's own test suite.
            if self._index_constructor_metadata:
                for i, doc in enumerate(self.documents):
                    self._store_metadata(doc, i)
            self._build_ann_index()
        elif documents:
            self.add(documents, vectors=None, add_timestamp=self.add_timestamp)

    # ------------------------------------------------------------------
    # properties / small helpers
    # ------------------------------------------------------------------

    @property
    def vectors(self):
        return self._store.vectors

    @vectors.setter
    def vectors(self, value):
        self._store.set(value)

    @property
    def dim(self) -> int | None:
        d = self._store.dim
        if d is not None:
            return d
        if self.ann_dim is not None:
            return int(self.ann_dim)
        emb = self._embedder()
        return getattr(emb, "dim", None)

    def _tokenizer(self):
        if self._tokenizer_obj is None:
            # The trained local encoder chunks with its own WordPiece vocab
            # (the reference pairs BertTokenizerFast with MiniLM the same
            # way, hyperdb.py:248); other embedders use word tokens.
            chunk_tok = getattr(self._embedder(), "chunk_tokenizer", None)
            self._tokenizer_obj = chunk_tok or _chunker.default_tokenizer()
        return self._tokenizer_obj

    def _embedder(self):
        if self._embedder_obj is None:
            from hyperdb_tpu.models.embedder import default_embedder

            # an existing corpus pins the embedder's output dim (a migrated
            # 384-d corpus must keep getting 384-d TEXT query vectors);
            # a fresh corpus gets the measured best default (the hybrid)
            known = self._store.dim
            if known is None and self.ann_dim is not None:
                known = int(self.ann_dim)
            self._embedder_obj = default_embedder(known)
        return self._embedder_obj

    def _on_mutation(self) -> None:
        """Invalidate every derived/cached structure after add/remove/load."""
        self._metadata_codes.invalidate()
        self._key_embed_cache.clear()
        self._sentence_mask_cache.clear()
        self._timestamp_cache.clear()
        self._store.invalidate()

    # ------------------------------------------------------------------
    # validation (C1)
    # ------------------------------------------------------------------

    def validate_vector_uniformity(self, vectors) -> None:
        """All vectors must share one dimension and form a 2-D matrix
        (reference hyperdb.py:139-164)."""
        if vectors is None or len(vectors) == 0:
            raise ValueError("Input is None or the list of vectors is empty.")
        first_len = len(vectors[0])
        if not all(len(vec) == first_len for vec in vectors):
            raise ValueError("All vectors must have the same dimension.")
        arr = np.array(vectors, dtype=self.fp_precision)
        if arr.ndim == 1:
            arr = arr[None, :]
        elif arr.ndim != 2:
            raise ValueError("Vectors do not have the expected structure.")
        if self.ann_dim is None:
            self.ann_dim = arr.shape[1]

    def validate_and_convert_documents(self, documents):
        """Wrap non-dict documents as {'document': doc}
        (reference hyperdb.py:166-196)."""
        if isinstance(documents, (list, tuple)):
            return [
                {"document": d} if not isinstance(d, dict) else d for d in documents
            ]
        if isinstance(documents, (str, dict)):
            return (
                [documents] if isinstance(documents, dict) else [{"document": documents}]
            )
        if isinstance(documents, Iterable) and not isinstance(documents, (str, bytes)):
            return [
                {"document": d} if not isinstance(d, dict) else d for d in documents
            ]
        raise ValueError(
            f"Unsupported document type: {type(documents)}. "
            "Expected list, tuple, or dict."
        )

    def validate_keys(self, keys_to_validate, keys_validation, name_a, name_b):
        _nested.validate_keys(keys_to_validate, keys_validation, name_a, name_b)

    def collect_document_keys(self, documents):
        return _nested.collect_document_keys(documents)

    # ------------------------------------------------------------------
    # embedding / chunking (C2, C3)
    # ------------------------------------------------------------------

    def text_to_chunks(self, text: str, max_length: int = _chunker.MAX_TOKENS):
        return _chunker.text_to_chunks(text, self._tokenizer(), max_length)

    def prepare_texts_and_indices(self, documents):
        return _chunker.prepare_texts_and_indices(documents, self._tokenizer())

    def get_embedding(self, documents):
        """Default embedding function (reference get_embedding,
        hyperdb.py:311-337): chunk then encode; returns
        (embeddings, source_indices, split_info)."""
        if documents is None:
            raise ValueError("Documents cannot be None.")
        try:
            texts, source_indices, split_info = self.prepare_texts_and_indices(
                documents
            )
            embeddings = np.asarray(
                self._embedder().encode(texts), dtype=self.fp_precision
            )
        except ValueError:
            raise
        except Exception as e:
            raise RuntimeError(
                f"An error occurred while generating embeddings: {e}"
            )
        return embeddings, source_indices, split_info

    def generate_query_vector(self, query_text: str):
        query_vector = self.embedding_function([query_text])
        if query_vector is None or len(query_vector) == 0:
            raise ValueError("Failed to generate an embedding for the query text.")
        return query_vector[0]

    # ------------------------------------------------------------------
    # document projection / metadata (C5, C6, C7)
    # ------------------------------------------------------------------

    def filter_document(self, document):
        return _nested.filter_document(document, self.select_keys)

    def get_nested_value(self, dictionary, keys):
        return _nested.get_nested_value(dictionary, keys)

    def _store_metadata(self, document, unique_index: int) -> None:
        """Index declared metadata keys for one document
        (reference hyperdb.py:373-392)."""
        metadata = self._compute_metadata(document, unique_index)
        if metadata:
            self._metadata_index[unique_index] = metadata

    def _compute_metadata(self, document, unique_index: int) -> dict:
        """Pure half of :meth:`_store_metadata`: build (without storing) the
        metadata entry for ``document`` at ``unique_index``. commit_pending
        uses this to stage every entry BEFORE mutating any state, so a
        failure during metadata extraction cannot leave rows/docs committed
        while the 'Rolling back' message claims otherwise."""
        if not isinstance(document, dict):
            return {}
        filtered = self.filter_document(document)
        metadata = {}
        for key in self.metadata_keys:
            if key == "timestamp":
                existing = self._metadata_index.get(unique_index, {}).get("timestamp")
                if existing is None and isinstance(document.get("metadata"), dict):
                    # per-call add_timestamp stamps the document itself
                    # (reference Q16); index that value
                    existing = document["metadata"].get("timestamp")
                if existing is None and self.add_timestamp is True:
                    metadata[key] = float(datetime.datetime.now().timestamp())
                elif existing is not None:
                    metadata[key] = existing
            else:
                # Select-key-filtered documents store flattened literal keys
                # (Q14); try the literal key first, then the nested path.
                if isinstance(filtered, dict) and key in filtered:
                    value = filtered[key]
                else:
                    value = _nested.get_nested_value(filtered, [key])
                if value is not None:
                    metadata[key] = value
        return metadata

    # ------------------------------------------------------------------
    # ANN index (C10)
    # ------------------------------------------------------------------

    def _build_ann_index(self) -> None:
        if self.vectors is None or self.vectors.shape[0] == 0:
            # a stale index over deleted rows must not survive: a later bulk
            # add could satisfy the incremental add_rows condition and graft
            # fresh rows onto clusters of vanished vectors
            self.ann_index = None
            self._ivf_built_rows = 0
            return
        if self.ann_dim is None:
            self.ann_dim = int(self.vectors.shape[1])
        # Parity attribute: cosine indexes are built over normalized vectors
        # (reference hyperdb.py:205-209, Q2).
        self.vectors_normalized = self.ann_metric == "cosine"
        if (
            self._store.precision == "int8-pure"
            and self.vectors.shape[0] >= _CONFIG.projscan_threshold
            and self.ann_metric in ("cosine", "angular", "dot")
        ):
            # Two-stage reduced-rank scan (opt-in, VERDICT r3 #6): stage-A
            # projected int8 corpus built from the store's own device
            # planes; stage B rescores against those planes at query time.
            from hyperdb_tpu.index.projscan import ProjScanIndex

            # a flat-spectrum decline stands until the corpus outgrows the
            # probed sample by 50% (same growth rule as the IVF rebuild):
            # re-probing on every mutation would pull the host sample over
            # the tunnel each add for a corpus already measured unsuitable
            declined = int(getattr(self, "_projscan_declined_rows", 0))
            if declined and self.vectors.shape[0] <= int(declined * 1.5):
                self.ann_index = None
                self._ivf_built_rows = 0
                return

            dv = self._store.device_view(self.source_indices)
            # project the plane the query path scores (cosine/angular ->
            # normalized rows, dot -> raw rows) so stage-A ranking and
            # stage-B rescore see the same geometry
            plane = (
                (dv["rows_q"], dv["row_scales"])
                if self.ann_metric == "dot"
                else (dv["rowsn_q"], dv["rown_scales"])
            )
            self.ann_index = ProjScanIndex.build_from_device_rows(
                plane,
                num_rows=int(dv["n_pad"]),
                d_prime=_CONFIG.projscan_dprime,
                # pad rows must never surface from probe(): the engine
                # indexes source_indices with its output (review r3)
                num_valid=int(self._store.num_rows),
                # decline flat spectra (exact scan instead): captured
                # variance predicts stage-A recall (BASELINE.md)
                min_variance=_CONFIG.projscan_min_variance or None,
            )
            if self.ann_index is None:
                self._projscan_declined_rows = int(self.vectors.shape[0])
                self._ivf_built_rows = 0
                return
            self._projscan_declined_rows = 0
            self._ivf_built_rows = int(self.vectors.shape[0])
            return
        if self.vectors.shape[0] >= IVF_THRESHOLD:
            from hyperdb_tpu.index.ivf import IVFIndex

            # Reuse the store's device view for the build: queries need that
            # upload anyway, so sampling/assignment run on the resident rows
            # instead of re-shipping the corpus (upload dominated 2M+ builds).
            device_rows = None
            if self._store.precision != "int8-pure":
                try:
                    dv = self._store.device_view(self.source_indices)
                    # IVFIndex normalizes for cosine/angular/dot (ivf.py),
                    # so the device plane must match that set — raw rows for
                    # a 'dot' index would cluster on magnitudes the probe
                    # then ignores
                    device_rows = (
                        dv["rows_norm"]
                        if self.ann_metric in ("cosine", "angular", "dot")
                        else dv["rows"]
                    )
                except Exception:
                    device_rows = None
            self.ann_index = IVFIndex.build(
                self.vectors,
                metric=self.ann_metric,
                n_trees=self.n_trees,
                device_rows=device_rows,
            )
            self._ivf_built_rows = int(self.vectors.shape[0])
        else:
            self.ann_index = FlatIndex(self.ann_metric, int(self.vectors.shape[1]))

    def _update_ann_index(self) -> None:
        """Refresh the index after a mutation.

        Appends assign new rows to the existing IVF clusters (one matmul)
        instead of the reference's full rebuild on every mutation
        (hyperdb.py:222-223); a full re-clustering happens once the corpus
        outgrows the clustering by 50%. Removals and metric switches always
        rebuild (row ids are renumbered)."""
        idx = self.ann_index
        n = self._store.num_rows
        if (
            idx is not None
            and getattr(idx, "is_ann", False)
            and hasattr(idx, "add_rows")  # projscan rebuilds instead
            and self.vectors is not None
            and n > idx.num_rows
            and n <= int(getattr(self, "_ivf_built_rows", 0) * 1.5)
        ):
            idx.add_rows(self.vectors[idx.num_rows :], idx.num_rows)
            return
        self._build_ann_index()

    def set_ann_metric(self, new_metric: str) -> None:
        """Switch the index metric and rebuild (reference hyperdb.py:225-235)."""
        if self.ann_metric != new_metric:
            self.ann_metric = new_metric
            self.vectors_normalized = False
        self._update_ann_index()

    # ------------------------------------------------------------------
    # ingest (C8)
    # ------------------------------------------------------------------

    def add(self, documents, vectors=None, add_timestamp: bool = False) -> None:
        """Add one document or a list (reference hyperdb.py:548-566)."""
        if documents is None or (
            isinstance(documents, (list, tuple, str, dict)) and not documents
        ):
            return
        if isinstance(documents, list):
            filtered = [self.filter_document(d) for d in documents]
            self.add_documents(filtered, vectors, add_timestamp)
        else:
            filtered = self.filter_document(documents)
            self.add_document(filtered, vectors, add_timestamp=add_timestamp)
            self.commit_pending()
            self._update_ann_index()
        self.clear_cache()

    def add_document(
        self, document, vectors=None, count: int = 1, add_timestamp: bool = False
    ) -> None:
        """Stage a single document (reference hyperdb.py:568-626). The staged
        state is applied by :meth:`commit_pending`."""
        if not document:
            return
        if isinstance(document, dict) and add_timestamp:
            document.setdefault("metadata", {})["timestamp"] = float(
                datetime.datetime.now().timestamp()
            )

        record_split = False
        if vectors is None:
            embeddings, _, split_info = self.embedding_function([document])
            rows = np.asarray(embeddings, dtype=self.fp_precision)
            record_split = True
        else:
            rows = np.asarray(vectors, dtype=self.fp_precision)
        if rows.ndim == 1:
            rows = rows[None, :]
        self.validate_vector_uniformity(rows)

        chunk_count = int(rows.shape[0])
        for _ in range(count):
            doc_index = len(self.documents) + len(self.pending_documents)
            self.pending_documents.append(document)
            self.pending_vectors.append(rows)
            self._pending_splits.append((chunk_count, record_split))
            self.pending_source_indices.extend([doc_index] * chunk_count)

    def add_documents(
        self, documents, vectors=None, add_timestamp: bool = False
    ) -> None:
        """Transactional batch add (reference hyperdb.py:628-689): embed once,
        stage per document, consistency-check, commit or roll back."""
        if not documents:
            return
        if vectors is not None and len(documents) != len(vectors):
            print("Error: The number of documents must match the number of vectors.")
            return

        saved_state = (
            list(self.pending_vectors),
            list(self.pending_documents),
            list(self.pending_source_indices),
            list(self._pending_splits),
            dict(self._metadata_index),
        )
        committed = False
        try:
            if isinstance(documents, dict):
                documents = [documents]
            if add_timestamp:
                # both arms: the reference stamps documents regardless of
                # whether vectors were precomputed (hyperdb.py:664)
                now = float(datetime.datetime.now().timestamp())
                for doc in documents:
                    if isinstance(doc, dict):
                        doc.setdefault("metadata", {})["timestamp"] = now
            if vectors is None:
                embeddings, _, split_info = self.embedding_function(documents)
                rows_all = np.asarray(embeddings, dtype=self.fp_precision)
                record_split = True
            else:
                rows_all = np.asarray(vectors, dtype=self.fp_precision)
                split_info = {i: 1 for i in range(len(documents))}
                record_split = False
            if rows_all.ndim == 1:
                rows_all = rows_all[None, :]
            self.validate_vector_uniformity(rows_all)

            cursor = 0
            for i, document in enumerate(documents):
                chunk_count = int(split_info.get(i, 1))
                rows = rows_all[cursor : cursor + chunk_count]
                cursor += chunk_count
                doc_index = len(self.documents) + len(self.pending_documents)
                self.pending_documents.append(document)
                self.pending_vectors.append(rows)
                self._pending_splits.append((chunk_count, record_split))
                self.pending_source_indices.extend([doc_index] * chunk_count)

            total_rows = sum(v.shape[0] for v in self.pending_vectors)
            if total_rows != len(self.pending_source_indices) or cursor != int(
                rows_all.shape[0]
            ):
                print(
                    "Inconsistency in add_documents detected between the number "
                    f"of pending vectors and documents. Total vectors calculated: "
                    f"{total_rows}, Total pending documents: "
                    f"{len(self.pending_documents)}. Transaction rolled back."
                )
                (
                    self.pending_vectors,
                    self.pending_documents,
                    self.pending_source_indices,
                    self._pending_splits,
                    self._metadata_index,
                ) = saved_state
                return

            self.commit_pending()
            committed = True
            self._update_ann_index()
        except (ValueError, TypeError) as e:
            # Input-validation failures print and roll back (reference Q20
            # soft-failure contract, hyperdb.py:681-689). A failure AFTER a
            # successful commit (index rebuild) must NOT restore the
            # snapshot: that would strip the committed documents' metadata
            # and re-stage already-committed rows.
            print(f"An exception occurred: {e}")
            if not committed:
                (
                    self.pending_vectors,
                    self.pending_documents,
                    self.pending_source_indices,
                    self._pending_splits,
                    self._metadata_index,
                ) = saved_state
        except Exception:
            # Anything else is an engine bug, not bad input: roll back the
            # staging state but RE-RAISE instead of masking it as a print
            # (the reference's blanket except swallows these too).
            if not committed:
                (
                    self.pending_vectors,
                    self.pending_documents,
                    self.pending_source_indices,
                    self._pending_splits,
                    self._metadata_index,
                ) = saved_state
            raise

    def add_stream(
        self,
        documents,
        batch_size: int = 1024,
        add_timestamp: bool = False,
        prefetch: int = 2,
        defer_index: bool = False,
    ) -> int:
        """Streaming ingest: pipeline host embedding with commit/index work.

        ``documents`` is any iterable (a generator over a file works); a
        producer thread tokenizes + embeds batch i+1 while the caller thread
        stages, commits, and updates the index for batch i — the
        double-buffered ingest the reference's synchronous add loop
        (hyperdb.py:628-689) cannot overlap. ``prefetch`` bounds the number
        of embedded batches held in flight (host RAM = prefetch * batch_size
        rows).

        Each batch commits as its own transaction, so a failure mid-stream
        keeps previously committed batches (the exception is re-raised).
        ``defer_index=True`` skips per-batch index updates and builds once at
        the end — preferable when streaming far past the IVF rebuild
        threshold. Returns the number of documents added.

        The overlap pays off when per-batch embedding cost is uniform and
        releases the GIL (a jitted device encoder); the default memoized
        HashEmbedder front-loads its cost into the first batch, leaving
        little to pipeline.
        """
        import queue as _queue
        import threading

        done = object()
        q: _queue.Queue = _queue.Queue(maxsize=max(1, prefetch))

        def produce():
            try:
                batch: list = []

                def flush():
                    if not batch:
                        return
                    if add_timestamp:
                        now = float(datetime.datetime.now().timestamp())
                        for doc in batch:
                            if isinstance(doc, dict):
                                doc.setdefault("metadata", {})["timestamp"] = now
                    embeddings, _, split_info = self.embedding_function(batch)
                    q.put((list(batch), np.asarray(embeddings), dict(split_info)))
                    batch.clear()

                for doc in documents:
                    if doc is None or (
                        isinstance(doc, (list, tuple, str, dict)) and not doc
                    ):
                        continue
                    batch.append(self.filter_document(doc))
                    if len(batch) >= batch_size:
                        flush()
                flush()
                q.put(done)
            except BaseException as e:  # propagate to the consumer thread
                q.put(e)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()

        added = 0
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                if isinstance(item, BaseException):
                    raise item
                batch_docs, rows_all, split_info = item
                rows_all = rows_all.astype(self.fp_precision, copy=False)
                if rows_all.ndim == 1:
                    rows_all = rows_all[None, :]
                self.validate_vector_uniformity(rows_all)
                cursor = 0
                for i, document in enumerate(batch_docs):
                    chunk_count = int(split_info.get(i, 1))
                    rows = rows_all[cursor : cursor + chunk_count]
                    cursor += chunk_count
                    doc_index = len(self.documents) + len(self.pending_documents)
                    self.pending_documents.append(document)
                    self.pending_vectors.append(rows)
                    self._pending_splits.append((chunk_count, True))
                    self.pending_source_indices.extend([doc_index] * chunk_count)
                self.commit_pending()
                if not defer_index:
                    self._update_ann_index()
                added += len(batch_docs)
        finally:
            worker.join(timeout=5.0)
            if added:
                # commit_pending already invalidated per batch; invalidating
                # again here would discard the device view the per-batch
                # index builds warmed (the double-upload commit_pending's
                # ordering comment exists to avoid)
                if defer_index:
                    self._update_ann_index()
                self.clear_cache()
        return added

    def commit_pending(self) -> None:
        """Apply staged documents/vectors to the main storage with a
        consistency check + rollback (reference hyperdb.py:496-545)."""
        if not self.pending_vectors:
            return
        try:
            concatenated = np.concatenate(self.pending_vectors, axis=0)
            if concatenated.shape[0] != len(self.pending_source_indices):
                raise ValueError("Inconsistency detected in new source indices.")
            start = len(self.documents)
            # metadata is computed at COMMIT, not staging (a rolled-back
            # transaction must leave no ghost entries) — but BEFORE any
            # mutation: metadata extraction is the only commit step that can
            # fail after the first append, and failing there would commit
            # rows/docs while "Rolling back" prints and the pending buffers
            # stay populated for a double-commit on the next call.
            staged_metadata = [
                (start + offset, self._compute_metadata(document, start + offset))
                for offset, document in enumerate(self.pending_documents)
            ]
            self._store.append(concatenated)
            self.source_indices.extend(self.pending_source_indices)
            for offset, (chunk_count, record_split) in enumerate(self._pending_splits):
                if record_split:
                    self.split_info[start + offset] = chunk_count
            self.documents.extend(self.pending_documents)
            for unique_index, metadata in staged_metadata:
                if metadata:
                    self._metadata_index[unique_index] = metadata
        except Exception as e:
            print(f"Error occurred during commit: {e}. Rolling back transaction.")
            return
        self.pending_vectors.clear()
        self.pending_documents.clear()
        self.pending_source_indices.clear()
        self._pending_splits.clear()
        # Invalidate derived caches HERE, before any index rebuild: callers
        # run _update_ann_index right after commit, and the IVF build warms
        # the padded device view — invalidating afterwards would discard
        # that whole-corpus upload and force a second one at first query.
        self._on_mutation()

    # ------------------------------------------------------------------
    # delete (C9)
    # ------------------------------------------------------------------

    def remove_document(self, indices) -> None:
        """Remove documents by index (reference hyperdb.py:692-766), with the
        chunk rows derived from ``source_indices`` (fixes SURVEY.md Q22 while
        matching every tested post-condition: renumbered contiguous
        source_indices, shifted split_info and metadata)."""
        if isinstance(indices, int):
            indices = [indices]
        num_docs = len(self.documents)
        normalized = []
        for i in indices:
            i = int(i)
            if i < 0:  # python-list semantics: -1 is the last document
                i += num_docs
            if not 0 <= i < num_docs:
                raise IndexError(
                    f"document index {i} out of range (0..{num_docs - 1})"
                )
            normalized.append(i)
        removed = sorted(set(normalized))
        removed_set = set(removed)

        rows_to_remove = [
            r for r, src in enumerate(self.source_indices) if src in removed_set
        ]

        for idx in sorted(removed, reverse=True):
            self.documents.pop(idx)

        if self.vectors is not None and rows_to_remove:
            self._store.delete_rows(rows_to_remove)

        removed_arr = np.asarray(removed, dtype=np.int64)

        def shift(i: int) -> int:
            return int(np.searchsorted(removed_arr, i, side="left"))

        self.source_indices = [
            src - shift(src) for src in self.source_indices if src not in removed_set
        ]
        self.split_info = {
            idx - shift(idx): count
            for idx, count in self.split_info.items()
            if idx not in removed_set
        }
        self._metadata_index = {
            idx - shift(idx): meta
            for idx, meta in self._metadata_index.items()
            if idx not in removed_set
        }

        # removals renumber row ids -> the index must be rebuilt, not
        # patched; invalidate first so the rebuild's device view survives
        self._on_mutation()
        self._build_ann_index()
        self.clear_cache()

    # ------------------------------------------------------------------
    # introspection (C24)
    # ------------------------------------------------------------------

    def size(self, with_chunks: bool = False, metadata: dict | None = None) -> int:
        """Document count (reference hyperdb.py:410-442)."""
        if metadata:
            if not isinstance(metadata, dict):
                raise ValueError(
                    "metadata must be a dictionary of {key: value} pairs."
                )
            self.validate_keys(
                metadata.keys(), self.metadata_keys, "metadata", "metadata_keys"
            )
            mask = _filters.metadata_doc_mask(self, metadata)
            if with_chunks:
                return int(
                    sum(self.split_info.get(int(i), 1) for i in np.flatnonzero(mask))
                )
            return int(mask.sum())
        if with_chunks:
            # One entry per chunk ROW. The reference returns len(documents),
            # which equals the row count only on its precomputed-vectors path
            # (SURVEY.md Q1/Q19); this rebuild stores one documents entry per
            # document, so the faithful chunk-inclusive count is the row map.
            return len(self.source_indices)
        return len(set(self.source_indices))

    def dict(self, vectors: bool = False, metadata=None):
        """Database export (reference hyperdb.py:444-494). Unlike the
        reference this works for chunked corpora (each document is paired
        with its first chunk's vector) and never mutates stored documents."""
        try:
            if not self.source_indices:
                print("Debug: source_indices is empty.")
                return []
            if not self.documents:
                print("Debug: documents is empty.")
                return []

            if metadata:
                if isinstance(metadata, dict):
                    metadata_filter = metadata
                elif isinstance(metadata, tuple) and len(metadata) == 2:
                    metadata_filter = {metadata[0]: metadata[1]}
                else:
                    raise ValueError(
                        "metadata must be a dictionary of {key: value} pairs "
                        "or a tuple of (key, value)."
                    )
                self.validate_keys(
                    metadata_filter.keys(), self.metadata_keys,
                    "metadata", "metadata_keys",
                )
                mask = _filters.metadata_doc_mask(self, metadata_filter)
                doc_ids = np.flatnonzero(mask)
            else:
                doc_ids = np.arange(len(self.documents))

            first_row = {}
            for row, src in enumerate(self.source_indices):
                first_row.setdefault(int(src), row)

            output = []
            for i in doc_ids:
                doc = self.documents[int(i)]
                if vectors and self.vectors is not None:
                    row = first_row.get(int(i))
                    entry = dict(doc) if isinstance(doc, dict) else {"document": doc}
                    if row is not None and row < len(self.vectors):
                        entry["vector"] = self.vectors[row].tolist()
                    output.append(entry)
                else:
                    output.append(doc)
            return output
        except Exception as e:
            print(f"Error while generating dictionary: {e}")
            return []

    def compute_and_save_word_frequencies(self, output_file_path) -> None:
        """Word histogram over stored documents (reference hyperdb.py:1007-1033)."""
        word_frequencies: dict[str, int] = collections.defaultdict(int)
        table = str.maketrans("", "", string.punctuation)

        def count(text: str) -> None:
            for word in text.translate(table).split():
                word_frequencies[word.lower()] += 1

        for document in self.documents:
            if isinstance(document, dict):
                for value in document.values():
                    count(str(value))
            elif isinstance(document, str):
                count(document)

        ordered = sorted(word_frequencies.items(), key=lambda x: x[1], reverse=True)
        with open(output_file_path, "w") as f:
            for word, freq in ordered:
                f.write(f"{word}: {freq}\n")

    # ------------------------------------------------------------------
    # filters — list-based public helpers (API parity; the engine itself
    # uses the mask-based pipeline in hyperdb_tpu.query.filters)
    # ------------------------------------------------------------------

    def tokenize(self, text: str):
        return _filters.tokenize(text)

    def recursive_sentence_filter(self, obj, sentence_filter_tokens) -> bool:
        return _filters._recursive_sentence_match(obj, sentence_filter_tokens)

    def apply_skip_doc(self, vectors, documents, skip_doc: int):
        """(reference hyperdb.py:1119-1134)"""
        mask = _filters.skip_doc_mask(len(documents), skip_doc)
        kept = np.flatnonzero(mask)
        vec = np.asarray(vectors)[kept] if vectors is not None else None
        return vec, [documents[i] for i in kept], kept.tolist()

    def filter_by_sentence(self, vectors, documents, sentence_filters):
        """(reference hyperdb.py:1160-1176)"""
        if not isinstance(sentence_filters, (list, tuple)):
            sentence_filters = [sentence_filters]
        tokenized = [_filters.tokenize(s) for s in sentence_filters]
        kept_vecs, kept_docs = [], []
        for vec, doc in zip(vectors, documents):
            if all(_filters._recursive_sentence_match(doc, toks) for toks in tokenized):
                kept_vecs.append(vec)
                kept_docs.append(doc)
        return kept_vecs, kept_docs

    def filter_by_key(self, vectors, documents, keys):
        """(reference hyperdb.py:1061-1110)"""
        if not isinstance(keys, (list, tuple)):
            keys = [keys]
        self.validate_keys(keys, self.document_keys, "query_keys", "document_keys")
        if self.select_keys:
            self.validate_keys(keys, self.select_keys, "query_keys", "select_keys")
        dim = self.dim or (np.asarray(vectors).shape[1] if len(vectors) else 0)
        kept_vecs, kept_docs = [], []
        for doc in documents:
            if not isinstance(doc, dict):
                continue
            per_key = []
            for key in keys:
                sub = _nested.get_nested_value(doc, [key])
                if sub is not None:
                    emb = np.asarray(
                        self.embedding_function([str(sub)])[0], dtype=np.float32
                    )
                    vec = emb.mean(axis=0) if emb.ndim == 2 else emb.reshape(-1)
                else:
                    vec = np.zeros(dim, dtype=np.float32)
                per_key.append(vec)
            if not per_key:
                continue
            kept_vecs.append(np.mean(per_key, axis=0))
            kept_docs.append(doc)
        return kept_vecs, kept_docs

    def _filter_by_metadata(
        self, metadata_filter, filtered_vectors, filtered_documents, kept_indices=None
    ):
        """(reference hyperdb.py:1218-1256)"""
        self.validate_keys(
            metadata_filter.keys(), self.metadata_keys,
            "metadata_filter", "metadata_keys",
        )
        mask = _filters.metadata_doc_mask(self, metadata_filter)
        pos_by_id = {id(doc): i for i, doc in enumerate(self.documents)}
        kept_vecs, kept_docs = [], []
        for vec, doc in zip(filtered_vectors, filtered_documents):
            pos = pos_by_id.get(id(doc))
            if pos is not None and mask[pos]:
                kept_vecs.append(vec)
                kept_docs.append(doc)
        return np.array(kept_vecs, dtype=self.fp_precision), kept_docs

    def _apply_filters(self, filters, kept_indices=None, base_vectors=None, base_documents=None):
        """List-based combinator for API parity (reference hyperdb.py:1258-1308)."""
        vecs = self.vectors if base_vectors is None else base_vectors
        docs = self.documents if base_documents is None else base_documents
        doc_ids = set(id(d) for d in docs)
        for name, params in filters or []:
            if name not in _filters.FILTER_NAMES:
                raise ValueError(f"Invalid filter name {name}")
            if name == "skip_doc":
                continue
            if name == "key":
                vecs, sel = self.filter_by_key(vecs, docs, params)
            elif name == "metadata":
                if not self.metadata_keys:
                    raise ValueError(
                        "The 'metadata_keys' parameter has not been set in "
                        "HyperDB(). Cannot filter by metadata."
                    )
                _, sel = self._filter_by_metadata(dict(params), vecs, docs)
            elif name == "sentence":
                _, sel = self.filter_by_sentence(vecs, docs, params)
            doc_ids &= set(id(d) for d in sel)
        kept_vecs = [v for v, d in zip(vecs, docs) if id(d) in doc_ids]
        kept_docs = [d for d in docs if id(d) in doc_ids]
        return kept_vecs, kept_docs

    # ------------------------------------------------------------------
    # query (C20-C22)
    # ------------------------------------------------------------------

    def _generate_and_validate_query_vector(self, query_input):
        return _engine.generate_and_validate_query_vector(self, query_input)

    def _handle_timestamps(self, recency_bias, timestamp_key, filtered_documents):
        """(reference hyperdb.py:1310-1346) — list-based parity helper.

        Identity (id()) lookup instead of the reference's documents.index(d)
        per filtered doc (O(N^2), SURVEY.md Q21); falls back to .index for
        equal-but-distinct dict copies so the reference contract still holds.
        """
        pos_by_id = {id(doc): i for i, doc in enumerate(self.documents)}
        doc_indices = [
            pos_by_id.get(id(d), None) for d in filtered_documents
        ]
        doc_indices = [
            i if i is not None else self.documents.index(d)
            for i, d in zip(doc_indices, filtered_documents)
        ]
        dense = _engine.handle_timestamps(
            self, recency_bias, timestamp_key, doc_indices
        )
        if dense is None:
            return None
        return dense[np.asarray(doc_indices, dtype=np.int64)]

    def _execute_query(
        self,
        query_input,
        top_k: int = 5,
        return_similarities: bool = True,
        filters=None,
        recency_bias: float = 0,
        timestamp_key=None,
        metric: str = "cosine_similarity",
        ann_percent: int = 5,
    ):
        return _engine.execute_query(
            self,
            query_input,
            top_k=top_k,
            return_similarities=return_similarities,
            filters=filters,
            recency_bias=recency_bias,
            timestamp_key=timestamp_key,
            metric=metric,
            ann_percent=ann_percent,
        )

    def _hashable_key(
        self, query_input, top_k, return_similarities, filters,
        recency_bias, timestamp_key, metric, ann_percent,
    ):
        """(reference hyperdb.py:1368-1379)

        Arrays key on (shape, dtype, raw bytes) instead of the reference's
        per-element float tuple: one memoryview hash instead of hashing
        hundreds of PyFloats per lookup (3 hashes per cached query), with
        identical hit behavior for repeated array queries.
        """
        if isinstance(query_input, np.ndarray):
            query_input = (
                "ndarray",
                query_input.shape,
                query_input.dtype.str,
                query_input.tobytes(),
            )
        elif isinstance(query_input, (list, tuple)):
            query_input = tuple(
                tuple(x) if isinstance(x, (list, tuple)) else x for x in query_input
            )
        from hyperdb_tpu.query.filters import hashable_filters

        return (
            query_input, top_k, return_similarities,
            hashable_filters(filters),
            recency_bias, timestamp_key, metric, ann_percent,
        )

    def _cached_query(self, hashable_key, args=None):
        """``args`` carries the original call arguments (the key's array
        component is an opaque bytes token, not a usable query input);
        omitting it keeps the reference behavior of executing the key."""
        if hashable_key in self.lru_cache:
            self.cache_hits += 1
            return self.lru_cache[hashable_key]
        self.cache_misses += 1
        result = self._execute_query(*(hashable_key if args is None else args))
        self.lru_cache[hashable_key] = result
        return result

    def query(
        self,
        query_input,
        top_k: int = 5,
        return_similarities: bool = True,
        filters=None,
        recency_bias: float = 0,
        timestamp_key=None,
        metric: str = "cosine_similarity",
        ann_percent: int = 5,
    ):
        """Retrieve the top-k documents for one query
        (reference hyperdb.py:1584-1586)."""
        key = self._hashable_key(
            query_input, top_k, return_similarities, filters,
            recency_bias, timestamp_key, metric, ann_percent,
        )
        return self._cached_query(
            key,
            args=(
                query_input, top_k, return_similarities, filters,
                recency_bias, timestamp_key, metric, ann_percent,
            ),
        )

    def query_batch(
        self,
        query_inputs,
        top_k: int = 5,
        return_similarities: bool = True,
        filters=None,
        recency_bias: float = 0,
        timestamp_key=None,
        metric: str = "cosine_similarity",
        ann_percent: int = 5,
        n_valid: int | None = None,
    ):
        """Batched multi-query search — one (B, d) x (d, N) device program
        for the whole batch (a capability the reference lacks; BASELINE.json
        configs 2 and 4). Returns a list of per-query result lists.
        ``n_valid`` (serving): only the leading n_valid rows of a pre-padded
        block are real queries — results are sliced to them."""
        return _engine.execute_query_batch(
            self,
            query_inputs,
            top_k=top_k,
            return_similarities=return_similarities,
            filters=filters,
            recency_bias=recency_bias,
            timestamp_key=timestamp_key,
            metric=metric,
            ann_percent=ann_percent,
            n_valid=n_valid,
        )

    def query_batch_arrays(
        self,
        query_vectors,
        top_k: int = 5,
        filters=None,
        recency_bias: float = 0,
        timestamp_key=None,
        metric: str = "cosine_similarity",
        ann_percent: int = 5,
        n_valid: int | None = None,
    ):
        """Array-level batched search: ``(B, d) -> ((B, k) int64 doc ids,
        (B, k) float32 scores)`` with ``k = min(top_k, surviving docs)``.

        The zero-Python-objects twin of :meth:`query_batch` for serving
        front-ends (the native C++ server formats wire responses straight
        from these arrays); documents hydrate separately by id via
        ``db.documents[i]``. ``query_vectors`` may be a committed device
        block (``jax.Array``) from the text hot path; ``n_valid`` slices
        pre-padded blocks' results to the real query count."""
        return _engine.execute_query_batch_arrays(
            self,
            query_vectors,
            top_k=top_k,
            filters=filters,
            recency_bias=recency_bias,
            timestamp_key=timestamp_key,
            metric=metric,
            ann_percent=ann_percent,
            n_valid=n_valid,
        )

    def warmup(self, top_ks=(5, 10), batch_sizes=(1,),
               metric="cosine_similarity", max_batch=None, dtypes=None,
               text_max_batch=None, text_seq_tokens=(12, 48)):
        """Precompile the query programs for the current corpus shape.

        Remote/first-time XLA compilation can take minutes per program
        (one per (corpus bucket, k bucket, batch, dtype) combination);
        serving deployments call this once after load/ingest so user
        queries never hit a compile ON the serving path.

        ``max_batch`` warms every power-of-two batch bucket up to it (the
        dynamic batchers flush arbitrary sizes, which pad to pow2), in
        EVERY wire dtype the server will use: low-precision corpora get
        f16 flush blocks (wire_dtype='auto'), a distinct jit signature.
        ``dtypes`` overrides the dtype set explicitly.

        ``text_max_batch`` additionally warms the TEXT hot path: the
        encoder's device-resident forward (one program per encoder batch
        bucket x seq bucket) plus the chained scan, so a server's first
        text flush doesn't eat the encoder compiles. ``text_seq_tokens``
        picks which sequence buckets to warm (token counts; the defaults
        cover the 32- and 64-token buckets typical of search queries —
        every extra bucket is another full set of remote compiles).

        ``metric`` accepts one name or a tuple: each metric is a distinct
        program family, and some also pay a ONE-TIME device plane build on
        first use (pearson's centered unit-norm plane, hamming/jaccard's
        binarized plane — a full-corpus upload, tens of seconds at 1M rows
        over this platform's tunnel), which warming moves off the serving
        path."""
        if self.vectors is None or len(self.vectors) == 0 or not self.documents:
            return
        metrics = (metric,) if isinstance(metric, str) else tuple(metric)
        if max_batch is not None:
            sizes = []
            b = 1
            while b <= max_batch:
                sizes.append(b)
                b *= 2
            batch_sizes = tuple(sizes)
        if dtypes is None:
            dtypes = ["float32"]
            if self._store.low_precision_device:
                dtypes.append("float16")
        rng = np.random.default_rng(0)
        for b in batch_sizes:
            base = rng.standard_normal((b, self.dim)).astype(np.float32)
            for dt in dtypes:
                queries = base.astype(dt)
                for k in top_ks:
                    for m in metrics:
                        if b == 1:
                            _engine.execute_query(
                                self, np.asarray(queries[0], dtype=np.float32),
                                top_k=k, metric=m,
                            )
                        else:
                            _engine.execute_query_batch(
                                self, queries, top_k=k, metric=m
                            )
        if text_max_batch:
            self._warmup_text(
                text_max_batch, text_seq_tokens, top_ks, metrics[0]
            )

    def _warmup_text(self, text_max_batch, text_seq_tokens, top_ks, metric):
        """Warm the text hot path: encoder forwards (device-resident when
        the embedder supports them, host otherwise) and the chained scan."""
        sizes, b = [], 1
        while b <= text_max_batch:
            sizes.append(b)
            b *= 2
        k = max(top_ks)
        probe = _engine.generate_query_vectors_batch(self, ["warmup probe"])
        if self.dim is not None and probe.shape[1] != self.dim:
            # text queries can never run against this corpus (embedder dim
            # != corpus dim) — nothing to warm, and raising here would fail
            # an otherwise-valid vector-serving warmup
            print(
                f"INFO: skipping text warmup — embedder dimension "
                f"{probe.shape[1]} does not match corpus dimension {self.dim}"
            )
            return
        for n_tok in text_seq_tokens:
            words = " ".join(f"w{i}" for i in range(max(1, int(n_tok))))
            for b in sizes:
                texts = [f"warm {i} {words}" for i in range(b)]
                block = _engine.generate_query_vectors_batch_device(
                    self, texts
                )
                if block is None:
                    # host-embedder path: still warms the encoder's own
                    # device programs (hash embedders are pure host, free)
                    block = _engine.generate_query_vectors_batch(self, texts)
                    _engine.execute_query_batch_arrays(
                        self, block, top_k=k, metric=metric
                    )
                else:
                    _engine.execute_query_batch_arrays(
                        self, block, top_k=k, metric=metric, n_valid=len(texts)
                    )

    # ------------------------------------------------------------------
    # cache (C21)
    # ------------------------------------------------------------------

    def clear_cache(self) -> None:
        self.lru_cache.clear()
        self.cache_hits = 0
        self.cache_misses = 0

    def get_cache_size_and_info(self):
        """(reference hyperdb.py:1398-1427)"""
        cache_info = {
            "hits": self.cache_hits,
            "misses": self.cache_misses,
            "maxsize": self.lru_cache.maxsize,
            "currsize": len(self.lru_cache),
        }
        size_bytes = deep_sizeof(self.lru_cache)
        if size_bytes >= 1024 * 1024:
            cache_size_str = f"{size_bytes / (1024 * 1024):.2f} MB"
        elif size_bytes >= 1024:
            cache_size_str = f"{size_bytes / 1024:.2f} KB"
        else:
            cache_size_str = f"{int(size_bytes)} bytes"
        return {"cache_info": cache_info, "cache_memory_size": cache_size_str}

    # ------------------------------------------------------------------
    # persistence (C23)
    # ------------------------------------------------------------------

    def save(
        self,
        storage_file,
        format: str = "pickle",
        save_ann_index: bool = True,
        rows_per_shard: int | None = None,
    ):
        """(reference hyperdb.py:769-794) Formats: pickle[.gz] / json /
        sqlite (reference-compatible) or 'checkpoint' — a self-describing
        binary directory format (persist/checkpoint.py) recommended for
        large corpora. ``rows_per_shard`` (checkpoint format only) splits
        the vector matrix into independently-readable shard files so it can
        later stream straight onto a device mesh
        (ShardedHyperDB.from_checkpoint) without one-host materialization."""
        if format == "checkpoint":
            from hyperdb_tpu.persist.checkpoint import save_checkpoint

            save_checkpoint(
                self, str(storage_file), save_ann_index,
                rows_per_shard=rows_per_shard,
            )
            return
        if self.vectors is None or len(self.vectors) == 0 or not self.documents:
            print("Nothing to save. Exit.")
            return
        data = {
            "vectors": [vector.tolist() for vector in self.vectors]
            if format != "pickle"
            else self.vectors,
            "documents": self.documents,
            "source_indices": self.source_indices,
            "split_info": self.split_info,
            "metadata_index": self._metadata_index,
            "vectors_normalized": self.vectors_normalized,
        }
        _persist.save_payload(str(storage_file), data, format=format)
        if save_ann_index and self.ann_index is not None:
            self._save_ann_index(storage_file)

    def _save_ann_index(self, storage_file) -> None:
        ann_index_file = str(storage_file) + ".ann"
        try:
            np.savez_compressed(
                ann_index_file, **_flatten_state(self.ann_index.state())
            )
            import os

            # np.savez appends .npz; keep the reference's exact sidecar name.
            if os.path.exists(ann_index_file + ".npz"):
                os.replace(ann_index_file + ".npz", ann_index_file)
        except Exception as e:
            raise RuntimeError(f"An exception occurred during ANN index save: {e}")

    def load(
        self,
        storage_file,
        format: str = "pickle",
        load_ann_index: bool = True,
        preload_ann_into_memory: bool = False,
    ):
        """(reference hyperdb.py:901-925)"""
        if format == "checkpoint":
            from hyperdb_tpu.persist.checkpoint import load_checkpoint

            load_checkpoint(self, str(storage_file), load_ann_index)
            if preload_ann_into_memory:
                self._preload_into_memory(str(storage_file))
            return
        data = _persist.load_payload(str(storage_file), format=format)
        self._store.set(np.array(data["vectors"], dtype=self.fp_precision))
        if self.vectors is not None and len(self.vectors) > 0:
            self.ann_dim = int(self.vectors.shape[1])
        self.documents = data["documents"]
        self.source_indices = list(data.get("source_indices", []))
        self._metadata_index = data.get("metadata_index", {})
        self.split_info = data.get("split_info", {})
        self.vectors_normalized = data.get("vectors_normalized", False)
        self._on_mutation()
        self.clear_cache()
        if load_ann_index and self.ann_dim is not None:
            self._load_ann_index(storage_file, preload_ann_into_memory)
        else:
            # a previous corpus's index must not survive into the new state
            self.ann_index = None
            self._ivf_built_rows = 0

    def _load_ann_index(self, storage_file, preload_ann_into_memory: bool = True):
        import os

        ann_index_file = str(storage_file) + ".ann"
        try:
            if not os.path.exists(ann_index_file):
                # No sidecar: rebuild from the loaded vectors (the reference
                # silently skips; rebuilding is cheap and strictly better).
                self._build_ann_index()
            else:
                if preload_ann_into_memory:
                    size_gb = os.path.getsize(ann_index_file) / (1024**3)
                    if size_gb > 2:
                        # Reference hyperdb.py:932-939 — its message loses the
                        # f-string prefix and prints the braces literally; we
                        # keep the warning and fix the formatting.
                        print(
                            f"Warning: The ANN index file is {size_gb:.2f}GB "
                            "and may consume a lot of memory. Make sure your "
                            "machine has enough available memory or set "
                            "preload_ann_into_memory to False."
                        )
                try:
                    with np.load(ann_index_file, allow_pickle=False) as f:
                        state = _unflatten_state(dict(f.items()))
                except Exception as e:
                    # Foreign/unparseable sidecar — most importantly a
                    # reference-produced Annoy binary forest (the reference
                    # writes one next to every save by default,
                    # hyperdb.py:769,796-801). Migration must not crash on
                    # it: warn and rebuild from the loaded vectors, which is
                    # strictly better than the reference's mmap'd forest
                    # (the exact scan needs no index at all).
                    print(
                        "Warning: could not parse ANN index sidecar "
                        f"'{ann_index_file}' ({e}); rebuilding the index "
                        "from the loaded vectors instead."
                    )
                    self._build_ann_index()
                    if preload_ann_into_memory:
                        self._preload_into_memory(str(storage_file))
                    return
                from hyperdb_tpu.index import index_from_state

                self.ann_index = index_from_state(state)
                if getattr(self.ann_index, "is_ann", False):
                    # record the restored build size so the next add takes
                    # the incremental add_rows path instead of a full
                    # k-means rebuild (the whole point of persisting it)
                    self._ivf_built_rows = int(self.ann_index.num_rows)
        except Exception as e:
            raise RuntimeError(f"An exception occurred during ANN index load: {e}")
        if preload_ann_into_memory:
            self._preload_into_memory(str(storage_file))

    def _preload_into_memory(self, storage_file: str) -> None:
        """Prefault the serving state (reference ``prefault=True`` analogue,
        hyperdb.py:927-944): eagerly build the padded device view so the
        corpus upload + first compile happen at load time, not on the first
        query. No-ops on an empty corpus; failures degrade to lazy loading
        (Q20 — soft failures print, never raise)."""
        if self._store.num_rows == 0 or not self.source_indices:
            return
        try:
            import jax

            dv = self._store.device_view(self.source_indices)
            # An explicit prefault request warms EVERY plane serving can
            # touch (queries choose their metric per call, and int8 mode
            # rescores from the float planes), forcing the lazy uploads
            # (store._LazyDeviceView) to happen now rather than at first
            # query. int8-pure holds no float planes.
            for key in ("rowsn_q", "rows_q"):
                if key in dv:
                    jax.block_until_ready(dv[key])
            if self._store.precision != "int8-pure":
                jax.block_until_ready(dv["rows_norm"])
                jax.block_until_ready(dv["rows"])
        except Exception as e:  # pragma: no cover - device-specific failures
            print(f"INFO: preload_ann_into_memory failed, staying lazy: {e}")


def _flatten_state(state: dict) -> dict:
    out = {}
    for key, value in state.items():
        out[key] = np.asarray(value) if not isinstance(value, np.ndarray) else value
    return out


def _unflatten_state(arrays: dict) -> dict:
    out = {}
    for key, value in arrays.items():
        if value.ndim == 0:
            item = value.item()
            out[key] = item
        else:
            out[key] = value
    return out
