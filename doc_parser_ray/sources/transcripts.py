"""Deterministic synthetic transcript generator.

Produces the BASELINE.json ``input_hint`` table —
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — with the FIXTURES.md §1 payload mix: 60% HTML,
20% markdown, 15% plain text, 5% base64 PDF, plus edge rows; Zipf-ish
conversation lengths so skew handling is exercised; turn rows emitted in
a shuffled order so correctness requires the explicit per-conversation
sort.

Everything is a pure function of (seed, conv_idx): generation scales out
as a ``map_batches`` over ``ray.data.range(n_convs)`` — no driver-side
loop — so bench-scale inputs are built in parallel too.
"""

from __future__ import annotations

import base64
import random

import pyarrow as pa

from doc_parser_ray.datamodel import TRANSCRIPT_SCHEMA
from doc_parser_ray.sources.pdf_gen import simple_text_pdf

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_WORDS = (
    "data pipeline stream shuffle batch arrow block actor task cluster "
    "document heading section table figure caption markdown extraction "
    "boilerplate content layout column paragraph token chunk index hash "
    "throughput latency memory spill backpressure lineage checkpoint"
).split()

_ROLES = ("user", "assistant", "tool")


def _sentence(rng: random.Random, n_words: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(5, 14)) for _ in range(rng.randint(1, 4)))


def _html_payload(rng: random.Random) -> str:
    parts = [
        "<html><head><title>t</title><script>var x=1;</script>",
        "<style>.a{color:red}</style></head><body>",
        "<nav><ul><li>Home</li><li>Docs</li></ul></nav>",
    ]
    parts.append(f"<h1>{_sentence(rng, 4)[:-1]}</h1>")
    for _ in range(rng.randint(1, 5)):
        kind = rng.random()
        if kind < 0.5:
            parts.append(f"<p>{_paragraph(rng)}</p>")
        elif kind < 0.65:
            parts.append(f"<h2>{_sentence(rng, 3)[:-1]}</h2>")
        elif kind < 0.8:
            items = "".join(f"<li>{_sentence(rng, 4)}</li>" for _ in range(rng.randint(2, 5)))
            tag = "ol" if rng.random() < 0.4 else "ul"
            start = ' start="3"' if (tag == "ol" and rng.random() < 0.3) else ""
            parts.append(f"<{tag}{start}>{items}</{tag}>")
        elif kind < 0.9:
            rows = "".join(
                "<tr>" + "".join(f"<td>c{r}{c}</td>" for c in range(3)) + "</tr>"
                for r in range(rng.randint(2, 4))
            )
            parts.append(f"<table><tr><th>a</th><th>b</th><th>c</th></tr>{rows}</table>")
        else:
            parts.append(f"<div>{_sentence(rng, 6)}<p>{_sentence(rng, 8)}</p></div>")
    parts.append("</body></html>")
    return "".join(parts)


def _md_payload(rng: random.Random) -> str:
    parts = [f"# {_sentence(rng, 4)[:-1]}", ""]
    for _ in range(rng.randint(1, 4)):
        kind = rng.random()
        if kind < 0.5:
            parts += [_paragraph(rng), ""]
        elif kind < 0.65:
            parts += [f"## {_sentence(rng, 3)[:-1]}", ""]
        elif kind < 0.8:
            parts += [f"- {_sentence(rng, 5)}" for _ in range(rng.randint(2, 4))]
            parts.append("")
        elif kind < 0.9:
            parts += ["| a | b |", "|---|---|", f"| {rng.choice(_WORDS)} | {rng.choice(_WORDS)} |", ""]
        else:
            parts += ["```", f"print('{rng.choice(_WORDS)}')", "```", ""]
    return "\n".join(parts)


def _text_payload(rng: random.Random) -> str:
    return "\n\n".join(_paragraph(rng) for _ in range(rng.randint(1, 4)))


def _pdf_payload(rng: random.Random) -> str:
    paras = [_paragraph(rng) for _ in range(rng.randint(1, 3))]
    pdf = simple_text_pdf(paras, two_column=rng.random() < 0.3)
    return base64.b64encode(pdf).decode("ascii")


def conv_turn_count(rng: random.Random, max_turns: int) -> int:
    """Zipf-ish heavy tail: median ~6, occasional conversations near
    ``max_turns`` (FIXTURES.md §4: skew must be measurable)."""
    u = rng.random()
    return min(max_turns, max(1, int(3.0 * (1.0 - u) ** -0.6)))


def synth_conv(conv_idx: int, seed: int = 42, max_turns: int = 500,
               edge_rows: bool = True) -> dict[str, list]:
    """All rows of one conversation (deterministic in (seed, conv_idx)),
    in shuffled turn order."""
    rng = random.Random((seed << 32) ^ conv_idx)
    n_turns = conv_turn_count(rng, max_turns)
    conv_id = f"conv-{conv_idx:08d}"

    rows: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for t in range(n_turns):
        u = rng.random()
        if edge_rows and rng.random() < 0.01:
            choice = rng.random()
            if choice < 0.4:
                text, tool = "", "text"
            elif choice < 0.7:
                text, tool = "   \n  ", ""
            else:
                text, tool = "JVBERi0hundef!!notbase64", "pdf"
        elif u < 0.60:
            text, tool = _html_payload(rng), "html"
        elif u < 0.80:
            text, tool = _md_payload(rng), "markdown"
        elif u < 0.95:
            text, tool = _text_payload(rng), "text"
        else:
            text, tool = _pdf_payload(rng), "pdf"
        # sometimes leave the discriminator blank → content sniffing path
        if rng.random() < 0.15:
            tool = ""
        rows["conv_id"].append(conv_id)
        rows["turn_idx"].append(t)
        rows["role"].append(_ROLES[t % 3])
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(_EPOCH_US + conv_idx * 3_600_000_000 + t * 7_000_000)

    # shuffled write order: correctness requires the explicit sort
    order = list(range(n_turns))
    rng.shuffle(order)
    return {k: [v[i] for i in order] for k, v in rows.items()}


def _conv_batch_to_table(batch: dict, seed: int, max_turns: int) -> pa.Table:
    cols: dict[str, list] = {k: [] for k in
                             ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for conv_idx in batch["id"]:
        rows = synth_conv(int(conv_idx), seed=seed, max_turns=max_turns)
        for k in cols:
            cols[k].extend(rows[k])
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_dataset(n_convs: int, seed: int = 42, max_turns: int = 500,
                        convs_per_batch: int = 64):
    """Distributed deterministic transcript Dataset (no driver-side loop)."""
    import ray.data

    return ray.data.range(n_convs).map_batches(
        lambda b: _conv_batch_to_table(b, seed, max_turns),
        batch_size=convs_per_batch,
        batch_format="numpy",
    )


def write_transcripts(path: str, n_convs: int, seed: int = 42,
                      max_turns: int = 500, num_files: int | None = None) -> None:
    """Materialize a transcript corpus to Parquet (bench/fixture input).

    ``num_files`` controls output sharding (resume granularity downstream).
    """
    ds = transcripts_dataset(n_convs, seed=seed, max_turns=max_turns)
    if num_files:
        ds = ds.repartition(num_files)
    ds.write_parquet(path)


def synth_table(n_convs: int, seed: int = 42, max_turns: int = 500) -> pa.Table:
    """Driver-local small corpus (tests)."""
    tables = [
        _conv_batch_to_table({"id": [i]}, seed, max_turns) for i in range(n_convs)
    ]
    return pa.concat_tables(tables)
