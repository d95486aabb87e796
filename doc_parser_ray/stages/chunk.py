"""Chunking stage: extracted items → token-bounded chunk records.

Re-expresses the reference facade's chunker family
(genon/preprocessor/facade/intelligent_processor.py):

  C1 ``HierarchicalChunker``    — heading-by-level context dict, cleared
                                  at-or-below on each new header (:276-282)
  C3 ``_split_document_by_tokens`` — greedy accumulate items while the
                                  chunk stays ≤ max_tokens (:553-748);
                                  tables always form their own chunk;
                                  oversize items split at a larger budget
                                  (semchunk at 4096, :627-653); heading
                                  context prepended to the chunk text
                                  (:417-472, compose :1274)
  C4 ``_merge_small_chunks``    — chunks < max_tokens//3 merge into the
                                  following chunk while ≤ max (:750-856)
  C5 ``compose_vectors``        — per-chunk n_char/n_word/n_line counters
                                  (:921-927) and positional indices
                                  (i_chunk_on_page / n_chunk_of_page /
                                  i_chunk_on_doc, :1222-1304)

Mapping to the transcript table: one *turn* plays the reference's
*page* (intra-turn indices ``i_chunk_on_turn`` / ``n_chunk_of_turn``
computed locally in the map task), one *conversation* plays the
*document* (global ``i_chunk_on_conv`` / ``n_chunk_of_conv`` need the
conv-keyed exchange — reuse stages/assemble.py with the chunk row's
composite order key).

Everything here is a stateless ``map_batches`` UDF: 1 extracted row →
N chunk rows, no shuffle; the only wide step is the optional
conversation-level counter pass.
"""

from __future__ import annotations

import json

import pyarrow as pa

from doc_parser_ray.datamodel import SECTION_HEADER, TABLE, TITLE
from doc_parser_ray.functions.textstats import count_tokens, n_lines, n_words

CHUNK_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("chunk_idx", pa.int32()),        # i_chunk_on_turn (0-based)
        ("n_chunk_of_turn", pa.int32()),
        ("chunk_text", pa.string()),
        ("headings", pa.string()),        # JSON list, heading context
        ("n_tokens", pa.int32()),
        ("n_char", pa.int32()),
        ("n_word", pa.int32()),
        ("n_line", pa.int32()),
        ("is_table", pa.bool_()),
        # provenance: char-offset range of the chunk's body items within
        # the turn's extracted_text (the 1-D analog of the reference's
        # per-chunk bbox provenance ``chunk_bboxes``,
        # intelligent_processor.py:950-974; -1 when offsets unknown)
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
    ]
)


def _split_oversize(text: str, budget_tokens: int,
                    count_fn=count_tokens) -> list[str]:
    """Split one oversize item into ≤ budget_tokens pieces on word
    boundaries (the deterministic analog of the reference's semchunk
    table split, intelligent_processor.py:627-653)."""
    words = text.split(" ")
    pieces: list[str] = []
    cur: list[str] = []
    cur_tokens = 0
    for w in words:
        t = count_fn(w) or 1
        if cur and cur_tokens + t > budget_tokens:
            pieces.append(" ".join(cur))
            cur, cur_tokens = [], 0
        cur.append(w)
        cur_tokens += t
    if cur:
        pieces.append(" ".join(cur))
    return pieces or [""]


def chunk_items(
    items: list[dict],
    texts: list[str],
    *,
    max_tokens: int = 2000,
    table_split_tokens: int = 4096,
    merge_min_tokens: int | None = None,
    count_fn=count_tokens,
) -> list[dict]:
    """C1+C3+C4 over one turn's item list.

    ``items``: span dicts ({label, ...}) aligned with ``texts`` (the
    sliced item texts). Returns chunk dicts with text/headings/tokens.
    ``count_fn``: token counter — the default is the reference's
    words*1.3 fallback estimate; the WordPiece actor stage
    (stages/tokenize.py) binds its per-actor tokenizer here (C2).
    """
    if merge_min_tokens is None:
        merge_min_tokens = max_tokens // 3

    # --- C1: walk items, maintain heading context, emit (ctx, item) runs
    headings: dict[int, str] = {}
    annotated: list[tuple] = []
    for sp, text in zip(items, texts):
        label = sp.get("label", "text")
        if label in (TITLE, SECTION_HEADER):
            # TITLE sits above all section headers (render level for a
            # section header is h-level minus 1, so shift by +1)
            level = 1 if label == TITLE else int(sp.get("level", 1)) + 1
            # clear this level and deeper (reference :276-282)
            for lv in [lv for lv in headings if lv >= level]:
                del headings[lv]
            headings[level] = text
            continue
        ctx = tuple(headings[lv] for lv in sorted(headings))
        span = (int(sp.get("start", -1)), int(sp.get("end", -1)))
        annotated.append((ctx, label, text, count_fn(text), span))

    # --- C3: greedy accumulation, tables standalone, oversize split
    chunks: list[dict] = []

    def emit(ctx: tuple[str, ...], parts: list[str], tokens: int,
             is_table: bool, span: tuple[int, int]) -> None:
        body = "\n".join(parts)
        text = "\n".join([*ctx, body]) if ctx else body
        chunks.append(
            {
                "text": text,
                "headings": list(ctx),
                "n_tokens": count_fn(text),
                "body_tokens": tokens,
                "is_table": is_table,
                "span": span,
            }
        )

    def merge_span(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
        if a[0] < 0:
            return b
        if b[0] < 0:
            return a
        return (min(a[0], b[0]), max(a[1], b[1]))

    cur_ctx: tuple[str, ...] | None = None
    cur_parts: list[str] = []
    cur_tokens = 0
    cur_span: tuple[int, int] = (-1, -1)

    def flush() -> None:
        nonlocal cur_parts, cur_tokens, cur_span
        if cur_parts:
            emit(cur_ctx or (), cur_parts, cur_tokens, False, cur_span)
        cur_parts, cur_tokens, cur_span = [], 0, (-1, -1)

    for ctx, label, text, tokens, span in annotated:
        if label == TABLE:
            # reference: a table is always its own chunk (:627-653)
            flush()
            if tokens > table_split_tokens:
                for piece in _split_oversize(text, table_split_tokens, count_fn):
                    emit(ctx, [piece], count_fn(piece), True, span)
            else:
                emit(ctx, [text], tokens, True, span)
            cur_ctx = ctx
            continue
        if ctx != cur_ctx:
            # section change closes the chunk (:417-472)
            flush()
            cur_ctx = ctx
        if tokens > max_tokens:
            flush()
            for piece in _split_oversize(text, max_tokens, count_fn):
                emit(ctx, [piece], count_fn(piece), False, span)
            continue
        if cur_parts and cur_tokens + tokens > max_tokens:
            flush()
        cur_parts.append(text)
        cur_tokens += tokens
        cur_span = merge_span(cur_span, span)
    flush()

    # --- C4: merge small chunks forward while the pair stays ≤ max and
    # shares heading context; tables never merge (:750-856)
    merged: list[dict] = []
    i = 0
    while i < len(chunks):
        c = chunks[i]
        while (
            not c["is_table"]
            and c["body_tokens"] < merge_min_tokens
            and i + 1 < len(chunks)
            and not chunks[i + 1]["is_table"]
            and chunks[i + 1]["headings"] == c["headings"]
            and c["body_tokens"] + chunks[i + 1]["body_tokens"] <= max_tokens
        ):
            nxt = chunks[i + 1]
            ctx = tuple(c["headings"])
            # re-emit as one chunk: strip the duplicated heading prefix
            prefix = "\n".join(ctx) + "\n" if ctx else ""
            body = (
                c["text"][len(prefix):] + "\n" + nxt["text"][len(prefix):]
            )
            sa, sb = c["span"], nxt["span"]
            if sa[0] < 0:
                merged_span = sb
            elif sb[0] < 0:
                merged_span = sa
            else:
                merged_span = (min(sa[0], sb[0]), max(sa[1], sb[1]))
            c = {
                "text": prefix + body,
                "headings": c["headings"],
                "n_tokens": count_fn(prefix + body),
                "body_tokens": c["body_tokens"] + nxt["body_tokens"],
                "is_table": False,
                "span": merged_span,
            }
            del chunks[i + 1]
        merged.append(c)
        i += 1
    return merged


def chunk_batch(batch: pa.Table, *, max_tokens: int = 2000,
                table_split_tokens: int = 4096,
                count_fn=count_tokens) -> pa.Table:
    """1 extracted row → N chunk rows (stateless flat map)."""
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    span_strs = batch.column("spans").to_pylist()
    full_texts = batch.column("extracted_text").to_pylist()

    cols: dict[str, list] = {name: [] for name in CHUNK_SCHEMA.names}
    for conv_id, turn_idx, spans_s, full in zip(
        conv_ids, turn_idxs, span_strs, full_texts
    ):
        spans = json.loads(spans_s) if spans_s else []
        texts = [full[sp["start"]: sp["end"]] for sp in spans]
        chunks = chunk_items(
            spans, texts, max_tokens=max_tokens,
            table_split_tokens=table_split_tokens, count_fn=count_fn,
        )
        n_of_turn = len(chunks)
        for ci, ch in enumerate(chunks):
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(turn_idx)
            cols["chunk_idx"].append(ci)
            cols["n_chunk_of_turn"].append(n_of_turn)
            cols["chunk_text"].append(ch["text"])
            cols["headings"].append(json.dumps(ch["headings"]))
            cols["n_tokens"].append(ch["n_tokens"])
            cols["n_char"].append(len(ch["text"]))
            cols["n_word"].append(n_words(ch["text"]))
            cols["n_line"].append(n_lines(ch["text"]))
            cols["is_table"].append(ch["is_table"])
            cols["span_start"].append(ch["span"][0])
            cols["span_end"].append(ch["span"][1])
    return pa.table(
        {name: pa.array(cols[name], CHUNK_SCHEMA.field(name).type)
         for name in CHUNK_SCHEMA.names},
        schema=CHUNK_SCHEMA,
    )


def chunk_turns(ds, *, max_tokens: int = 2000, table_split_tokens: int = 4096,
                batch_size: int = 128):
    """Attach the chunking stage to a Dataset of extracted rows."""
    return ds.map_batches(
        lambda b: chunk_batch(b, max_tokens=max_tokens,
                              table_split_tokens=table_split_tokens),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def _chunk_counter_partition(part: pa.Table) -> pa.Table:
    """Vectorized global chunk rank/total per conversation (C5
    ``i_chunk_on_doc`` / ``n_chunk_of_doc`` analog) for every
    conversation in one hash partition."""
    import numpy as np

    from doc_parser_ray.stages.assemble import _group_spans

    part = part.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("chunk_idx", "ascending")]
    )
    n = part.num_rows
    if n == 0:
        return part.drop_columns(["pkey"])
    conv = np.asarray(part.column("conv_id").to_pylist(), dtype=object)
    gid, starts = _group_spans([conv])
    idx = np.arange(n, dtype=np.int64)
    local = idx - starts[gid]
    counts = np.bincount(gid)
    part = part.drop_columns(["pkey"])
    part = part.append_column("chunk_ord", pa.array(local.astype("int32")))
    return part.append_column(
        "n_chunks_of_conv", pa.array(counts[gid].astype("int32"))
    )


def assemble_chunk_counters(ds, num_partitions: int = 64):
    """The conversation-keyed exchange for chunk rows: same bounded
    hash-partition shape as stages/assemble.py, ordered by the composite
    (turn_idx, chunk_idx) key."""
    from doc_parser_ray.stages.assemble import _add_pkey

    ds = ds.map_batches(
        lambda b: _add_pkey(b, num_partitions, None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds.groupby("pkey").map_groups(
        _chunk_counter_partition, batch_format="pyarrow"
    )


# ----------------------------------------------------- C7 legacy path

LEGACY_CHUNK_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("chunk_idx", pa.int32()),
    ("chunk_text", pa.string()),
    ("n_char", pa.int32()),
    ("n_word", pa.int32()),
    ("n_line", pa.int32()),
    ("page", pa.int32()),
    ("i_chunk_on_page", pa.int32()),
    ("n_chunk_of_page", pa.int32()),
])


def legacy_chunk_batch(batch: pa.Table, *, chunk_size: int = 400,
                       chunk_overlap: int = 40) -> pa.Table:
    """C7: the legacy service's RecursiveCharacterTextSplitter path
    (genon/preprocessor/src/preprocessor.py:186-221 semantics) over
    extracted turns. A turn stands in for a page: its 0-based turn_idx
    becomes the 1-based ``page`` via the legacy page fix, and the
    per-page chunk counters are turn-local (batch-computable — no
    exchange needed for them)."""
    from doc_parser_ray.functions.legacy_split import fix_page, recursive_split

    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    full_texts = batch.column("extracted_text").to_pylist()

    cols: dict[str, list] = {name: [] for name in LEGACY_CHUNK_SCHEMA.names}
    for conv_id, turn_idx, full in zip(conv_ids, turn_idxs, full_texts):
        pieces = [p for p in recursive_split(
            full or "", chunk_size=chunk_size, chunk_overlap=chunk_overlap
        ) if p]
        page = fix_page(turn_idx)
        n_on_page = len(pieces)
        for ci, text in enumerate(pieces):
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(turn_idx)
            cols["chunk_idx"].append(ci)
            cols["chunk_text"].append(text)
            cols["n_char"].append(len(text))
            cols["n_word"].append(n_words(text))
            cols["n_line"].append(n_lines(text))
            cols["page"].append(page)
            cols["i_chunk_on_page"].append(ci)
            cols["n_chunk_of_page"].append(n_on_page)
    return pa.table(
        {name: pa.array(cols[name], LEGACY_CHUNK_SCHEMA.field(name).type)
         for name in LEGACY_CHUNK_SCHEMA.names},
        schema=LEGACY_CHUNK_SCHEMA,
    )


def legacy_chunk_turns(ds, *, chunk_size: int = 400, chunk_overlap: int = 40,
                       batch_size: int = 128):
    """Attach the C7 splitter to a Dataset of extracted rows; chain
    ``assemble_chunk_counters`` for the i/n_chunk_of_doc analogs."""
    return ds.map_batches(
        lambda b: legacy_chunk_batch(b, chunk_size=chunk_size,
                                     chunk_overlap=chunk_overlap),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def compose_vector_text(headings: list[str], chunk_text: str) -> str:
    """GenOS vector text (facade/basic_processor.py:1134-1136): the
    heading context joined as a 'HEADER: h1, h2' first line, then the
    chunk body; no marker line when the chunk has no heading context."""
    if headings:
        return "HEADER: " + ", ".join(headings) + "\n" + chunk_text
    return chunk_text


def add_vector_text(tab: pa.Table) -> pa.Table:
    """Batch transform: materialize the vector ``text`` field from the
    headings JSON + chunk_text columns."""
    heads = tab.column("headings").to_pylist()
    texts = tab.column("chunk_text").to_pylist()
    vt = [compose_vector_text(json.loads(h) if h else [], t)
          for h, t in zip(heads, texts)]
    return tab.append_column("vector_text", pa.array(vt, pa.string()))
