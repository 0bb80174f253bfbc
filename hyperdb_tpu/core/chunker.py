"""Token-based document chunking (long-document support).

Mirrors the reference's chunking data model
(/root/reference/hyperdb/hyperdb.py:26,251-309): texts are tokenized without
truncation, sliced into ``MAX_TOKENS``-token windows (512 minus 2 special
tokens), decoded back to text, and embedded per chunk; ``source_indices``
maps each chunk row to its originating document and ``split_info`` records
chunks-per-document.

Tokenization is a host-side workload (SURVEY.md §2.3), isolated behind the
small :class:`Tokenizer` protocol:

- :class:`WordTokenizer` — the hermetic default: whitespace/word-boundary
  tokens, identity decode. One word == one token, so chunk arithmetic matches
  the reference tests' "word " * N constructions without model downloads.
- :class:`NativeWordTokenizer` — same semantics backed by the in-repo C++
  tokenizer (hyperdb_tpu/native) when the shared library is built.
- A HuggingFace fast tokenizer can be plugged via :class:`HFTokenizer` when
  its assets are available locally, reproducing the reference's
  BertTokenizerFast behavior (hyperdb.py:259-265).
"""

from __future__ import annotations

import re
from typing import Any, Protocol

# 512 - 2 to account for the special tokens a BERT-style encoder adds
# (reference MAX_LENGTH, hyperdb.py:26).
MAX_TOKENS = 510

_WORD_RE = re.compile(r"\S+")


class Tokenizer(Protocol):
    def encode(self, text: str) -> list:
        """Text -> token list (no truncation)."""
        ...

    def decode(self, tokens: list) -> str:
        """Token list -> text."""
        ...


class WordTokenizer:
    """Whitespace word tokenizer with identity decode (hermetic default)."""

    def encode(self, text: str) -> list[str]:
        return _WORD_RE.findall(text)

    def decode(self, tokens: list[str]) -> str:
        return " ".join(tokens)


class HFTokenizer:
    """Adapter for a HuggingFace fast tokenizer (e.g. BertTokenizerFast)."""

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer

    def encode(self, text: str) -> list[int]:
        return self._tok(text, truncation=False)["input_ids"]

    def decode(self, tokens: list[int]) -> str:
        return self._tok.decode(tokens, clean_up_tokenization_spaces=True)


def text_to_chunks(
    text: str, tokenizer: Tokenizer, max_length: int = MAX_TOKENS
) -> list[str]:
    """Split text into decoded windows of at most ``max_length`` tokens
    (reference text_to_chunks, hyperdb.py:251-267)."""
    tokens = tokenizer.encode(text)
    return [
        tokenizer.decode(tokens[i : i + max_length])
        for i in range(0, len(tokens), max_length)
    ]


def document_text(doc: Any) -> str:
    """The text embedded for a dict document: values only, insertion order
    (reference hyperdb.py:297, SURVEY.md Q15)."""
    return " ".join(str(val) for val in doc.values())


def prepare_texts_and_indices(
    documents: Any, tokenizer: Tokenizer, max_length: int = MAX_TOKENS
):
    """Chunk documents into texts + chunk->doc bookkeeping
    (reference prepare_texts_and_indices, hyperdb.py:269-309).

    Returns:
        (texts, source_indices, split_info) where ``source_indices[r]`` is
        the in-batch document index that produced chunk ``r`` and
        ``split_info[i]`` the number of chunks of document ``i``.
    """
    if documents is None or not documents:
        raise ValueError("Documents cannot be empty or None.")

    texts: list[str] = []
    source_indices: list[int] = []
    split_info: dict[int, int] = {}

    def process(text: str, index: int) -> None:
        chunks = text_to_chunks(text, tokenizer, max_length)
        texts.extend(chunks)
        source_indices.extend([index] * len(chunks))
        split_info[index] = split_info.get(index, 0) + len(chunks)

    if isinstance(documents, str):
        process(documents, 0)
        return texts, source_indices, split_info

    if isinstance(documents, list):
        for i, doc in enumerate(documents):
            if isinstance(doc, dict):
                process(document_text(doc), i)
            elif isinstance(doc, list):
                for sub in doc:
                    process(str(sub), i)
            elif isinstance(doc, str):
                process(doc, i)
            else:
                raise ValueError("Unsupported document type.")
        return texts, source_indices, split_info

    raise ValueError("Documents should either be a string or a list.")


def default_tokenizer() -> Tokenizer:
    """Best tokenizer available without network access.

    Prefers the native C++ word tokenizer, falls back to the pure-Python one;
    both share semantics. HF tokenizers are opt-in via the DB config since
    they require downloaded assets.
    """
    try:
        from hyperdb_tpu.native.tokenizer import NativeWordTokenizer

        tok = NativeWordTokenizer.maybe_load()
        if tok is not None:
            return tok
    except Exception:
        pass
    return WordTokenizer()
