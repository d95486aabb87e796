"""Pure per-payload extraction / normalization functions.

Everything here is stateless and picklable; Ray stages wrap these in
``map_batches`` UDFs (stateless tasks) or actor-pool callables.
"""

from doc_parser_ray.functions.sanitize import sanitize_text
from doc_parser_ray.functions.sniff import sniff_format
from doc_parser_ray.functions.html_extract import extract_html
from doc_parser_ray.functions.md_extract import extract_markdown
from doc_parser_ray.functions.text_extract import extract_plain_text
from doc_parser_ray.functions.extract import extract_payload

__all__ = [
    "sanitize_text",
    "sniff_format",
    "extract_html",
    "extract_markdown",
    "extract_plain_text",
    "extract_payload",
]
