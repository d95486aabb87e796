"""Payload format sniffing — content-heuristic analog of the reference's
``_DocumentConversionInput._guess_format`` + ``_detect_html_xhtml`` + CSV
sniffer (/root/reference/docling/datamodel/document.py:306-506): mime
first (here: the transcript ``tool`` column), then content sniffing on
the head of the payload.

Formats: "html" | "markdown" | "text" | "pdf" | "csv" | "asciidoc" |
"docx" | "office_zip" | "unknown".
A base64-encoded PDF payload ("JVBERi0" prefix = base64 of "%PDF-") is
recognized as "pdf"; a base64-encoded zip ("UEsDB" = base64 of
"PK\\x03\\x04") as "office_zip" — the extract dispatcher disambiguates
docx/xlsx/pptx from the archive's member names, the analog of the
reference's zip disambiguation (document.py:306-410).
"""

from __future__ import annotations

import re

_HTML_DECL_RE = re.compile(r"<!doctype\s+html|<html\b|<body\b|<head\b", re.I)
_HTML_TAG_RE = re.compile(
    r"<(div|p|h[1-6]|ul|ol|li|table|tr|td|th|br|pre|code|figure|img|span|a)\b[^>]*>",
    re.I,
)
_MD_RE = re.compile(
    r"^#{1,6}\s+\S"        # ATX heading
    r"|^```"               # fence
    r"|^[-*+]\s+\S"        # bullet
    r"|^\d+[.)]\s+\S"      # ordered item
    r"|^\|.*\|\s*$"        # pipe table row
    r"|\[[^\]]+\]\([^)]+\)",  # link
    re.M,
)

VALID_TOOLS = {"html", "markdown", "text", "pdf", "csv", "asciidoc",
               "docx", "xlsx", "pptx", "hwpx", "jats", "uspto",
               "doc_json", "bok_json"}

# JATS needs positive evidence beyond an <article> tag: HTML5 pages use
# <article> for ordinary content, so require a JATS DOCTYPE or a
# JATS-shaped root (<article ...> with front matter / JATS namespace)
_JATS_DOCTYPE_RE = re.compile(r"<!DOCTYPE\s+article[^>]*JATS", re.I)
_JATS_BODY_RE = re.compile(
    r"<front>|<article-meta|jats\.nlm\.nih\.gov|dtd-version=", re.I,
)
_USPTO_RE = re.compile(
    r"<!DOCTYPE\s+(?:us-patent-application|us-patent-grant|PATDOC"
    r"|patent-application-publication)\b", re.I,
)


def sniff_format(text: str, tool: str = "") -> str:
    """Return the payload format for one turn.

    ``tool`` (the transcript discriminator column) wins when it names a
    known format — the analog of mime-type dispatch; otherwise the first
    4 KiB of content is sniffed (document.py:440-477 analog).
    """
    tool = (tool or "").strip().lower()
    if tool in VALID_TOOLS:
        return tool
    if tool:  # unknown discriminator → let content decide, else unknown
        pass
    if not text or not text.strip():
        return "text"
    head = text[:4096]
    stripped = head.lstrip()
    if stripped.startswith("%PDF-") or stripped.startswith("JVBERi0"):
        return "pdf"
    if stripped.startswith("UEsDB"):  # base64 of zip magic PK\x03\x04
        return "office_zip"
    if stripped.startswith("{") and '"doc_parser_ray/items@1"' in head:
        return "doc_json"  # S10: lossless document-JSON re-load
    if stripped.startswith("{") and '"body"' in head and '"contents"' in head:
        return "bok_json"  # P15: BOK page/contents document JSON
    if stripped.startswith("PATN\n") or stripped == "PATN":
        return "uspto"  # APS grant text format
    if stripped.startswith("<?xml") or stripped.startswith("<!DOCTYPE"):
        # XML prolog: USPTO / JATS detection (document.py:440-477 analog);
        # an HTML doctype never sniffs as an XML article format
        if _USPTO_RE.search(head):
            return "uspto"
        if not _HTML_DECL_RE.search(head) and (
            _JATS_DOCTYPE_RE.search(head)
            or (_JATS_BODY_RE.search(head) and "<article" in head)
        ):
            return "jats"
    elif stripped.startswith("<article") and _JATS_BODY_RE.search(head):
        return "jats"
    if _HTML_DECL_RE.search(head):
        return "html"
    if _HTML_TAG_RE.search(head):
        return "html"
    if _MD_RE.search(head):
        return "markdown"
    return "text"
