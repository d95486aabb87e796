"""Text sanitization — reimplements the observable behavior of
``PageAssembleModel.sanitize_text`` (reference:
docling/models/page_assemble_model.py:34-65).

Semantics:
  - single line: returned joined as-is (no normalization!);
  - multi-line: de-hyphenate a line break when the previous line ends
    with "-" and both the last word before and the first word after are
    alphanumeric; otherwise join lines with a single space;
  - then normalize unicode punctuation: "⁄"→"/", curly quotes→ASCII,
    "•"→"·"; strip the result.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"\b[\w]+\b")


def sanitize_text(lines: list[str]) -> str:
    lines = list(lines)
    if len(lines) <= 1:
        return " ".join(lines)

    # Pairwise pass exactly as the reference does: iterate over lines[1:],
    # mutating the *previous* line (de-hyphenation) or appending a space.
    for ix in range(1, len(lines)):
        prev_line = lines[ix - 1]
        line = lines[ix]
        if prev_line.endswith("-"):
            prev_words = _WORD_RE.findall(prev_line)
            line_words = _WORD_RE.findall(line)
            if (
                prev_words
                and line_words
                and prev_words[-1].isalnum()
                and line_words[0].isalnum()
            ):
                lines[ix - 1] = prev_line[:-1]
        else:
            lines[ix - 1] = prev_line + " "

    out = "".join(lines)
    out = out.replace("⁄", "/")
    out = out.replace("’", "'")
    out = out.replace("‘", "'")
    out = out.replace("“", '"')
    out = out.replace("”", '"')
    out = out.replace("•", "·")
    return out.strip()
