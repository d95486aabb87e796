"""Tokenizer actor-pool stage (C2) — the reference holds an HF
tokenizer inside the chunker (``HybridChunker._count_tokens``,
genon/preprocessor/facade/intelligent_processor.py:352-415); here the
deterministic WordPiece stand-in is held in a map_batches ACTOR POOL:
vocabulary/trie built once per actor in ``__init__``, batches tokenized
in ``__call__`` — the stateful-stage exemplar on the equality path.
"""

from __future__ import annotations

import pyarrow as pa

from doc_parser_ray.functions.wordpiece import DeterministicWordPiece


class TokenCounter:
    """Callable class for ``map_batches(TokenCounter, concurrency=N)``:
    appends an ``n_tokens_bpe`` column with WordPiece counts."""

    def __init__(self, text_col: str = "text", piece_chars: int = 300):
        self.tokenizer = DeterministicWordPiece()  # once per actor
        self.text_col = text_col
        self.piece_chars = piece_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = pa.array(
            [self.tokenizer.count_tokens_hf(t, self.piece_chars)
             for t in texts],
            pa.int32(),
        )
        return batch.append_column("n_tokens_bpe", counts)


def count_tokens_dataset(ds, *, text_col: str = "text",
                         concurrency=(1, 4), batch_size: int = 256):
    """Attach WordPiece token counts via the actor pool."""
    return ds.map_batches(
        TokenCounter,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WordPieceChunker:
    """Actor-pool chunking stage with REAL tokenizer counts: the
    reference's HybridChunker shape — tokenizer state lives in the
    actor, ``chunk_batch`` runs with ``count_fn`` bound to it
    (intelligent_processor.py:553-748 under tokenizer counting)."""

    def __init__(self, max_tokens: int = 2000,
                 table_split_tokens: int = 4096):
        from doc_parser_ray.stages.chunk import chunk_batch

        self.tokenizer = DeterministicWordPiece()  # once per actor
        self.max_tokens = max_tokens
        self.table_split_tokens = table_split_tokens
        self._chunk_batch = chunk_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._chunk_batch(
            batch,
            max_tokens=self.max_tokens,
            table_split_tokens=self.table_split_tokens,
            count_fn=self.tokenizer.count_tokens_hf,
        )


def chunk_turns_wordpiece(ds, *, max_tokens: int = 2000,
                          table_split_tokens: int = 4096,
                          concurrency=(1, 4), batch_size: int = 128):
    """C1–C4 with WordPiece token budgets (actor pool)."""
    return ds.map_batches(
        WordPieceChunker,
        fn_constructor_kwargs={
            "max_tokens": max_tokens,
            "table_split_tokens": table_split_tokens,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
