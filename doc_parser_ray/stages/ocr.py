"""M2 — the OCR page stage's deterministic half as an actor-pool
``map_batches`` stage: per-page OCR-region selection, engine dispatch,
OCR-vs-programmatic cell filtering, and combine/re-index.

Reference shape (docling/models/base_ocr_model.py): a per-page model
object built once (engine init in ``__init__`` —
``base_ocr_model.py:25-37``) and called per page batch — exactly the
actor-pool contract here (state in ``__init__`` once per worker, work
in ``__call__`` per Arrow batch, the same shape as ``stages/media.py``).
Engines are pluggable the way the reference's factory is
(docling/models/factories/__init__.py:13-27 builds an engine registry);
this container has no OCR weights or binaries, so the only registered
engine is the deterministic fake — asking for a real one raises a
clearly-marked ``NotImplementedError`` instead of faking silently
(the ``stages/media.py`` codec rule).

The geometry itself (dilated-mask coverage, component boxes, the
0.75/0.05 thresholds, closed-interval overlap filtering, re-indexing)
lives in ``functions/ocr_region.py`` and is brute-force-pinned against
a raster twin in tests/test_ocr_region.py.

Input batch schema (one row per page):
  page_id int64, width float64, height float64,
  bitmap_rects list<list<double>>  -- [l, t, r, b] per bitmap
  prog_boxes   list<list<double>>  -- programmatic text cells
  prog_texts   list<string>

Output: one row per selected OCR region (or one sentinel row with
``region_idx = -1`` and ``-1`` boxes for pages where coverage is below
the area threshold — "drop all bitmap rectangles",
base_ocr_model.py:111-112), with the page-level decision attached:
  page_id, mode ('full_page' | 'rects' | 'none'), area int64 (exact
  dilated-mask pixel count), n_regions, region_idx, l, t, r, b (int64),
  n_cells_final (cell count after engine → filter → combine).

Scale note: per-page work is O(rects²) integer math on tens of rects
(vs the reference's O(W×H) ≈ 500k-pixel raster per page), so a batch
of pages is dominated by the engine call, not the geometry; batches
stream through the actor pool with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from doc_parser_ray.functions.ocr_region import (
    DEFAULT_BITMAP_AREA_THRESHOLD,
    combine_cells,
    select_ocr_regions,
)


class FakeOcrEngine:
    """Deterministic stand-in engine: one cell per region, box inset by
    2 px (clamped to the region), text derived from (page_id, idx)."""

    def recognize(self, page_id: int, regions) -> tuple[list, list[str]]:
        boxes, texts = [], []
        for i, (l, t, r, b) in enumerate(regions):
            boxes.append((min(l + 2.0, r), min(t + 2.0, b),
                          max(r - 2.0, l), max(b - 2.0, t)))
            texts.append(f"ocr:{page_id}:{i}")
        return boxes, texts


def _build_engine(name: str):
    if name == "fake":
        return FakeOcrEngine()
    # real engines (tesserocr / easyocr / rapidocr ... — the reference's
    # registered plugins) are not present in this container
    raise NotImplementedError(
        f"OCR engine {name!r} is unavailable here (no OCR binaries or "
        "weights in this environment); only the deterministic 'fake' "
        "engine is registered"
    )


class OcrRegionStage:
    """Actor-pool stage: region selection → engine → filter → combine.

    Use as ``ds.map_batches(OcrRegionStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B, batch_format="pyarrow")``.
    """

    def __init__(self, engine: str = "fake",
                 bitmap_area_threshold: float = DEFAULT_BITMAP_AREA_THRESHOLD,
                 force_full_page: bool = False):
        self._engine = _build_engine(engine)
        self._area_threshold = float(bitmap_area_threshold)
        self._force_full_page = bool(force_full_page)

    def _one_page(self, page_id, width, height, rects, prog_boxes,
                  prog_texts):
        mode, area, regions = select_ocr_regions(
            width, height, rects,
            bitmap_area_threshold=self._area_threshold,
            force_full_page=self._force_full_page)
        if regions:
            ocr_boxes, ocr_texts = self._engine.recognize(page_id, regions)
        else:
            ocr_boxes, ocr_texts = [], []
        boxes, texts, from_ocr, index = combine_cells(
            prog_boxes, prog_texts, ocr_boxes, ocr_texts,
            force_full_page=self._force_full_page)
        n_cells = len(texts)
        rows = []
        if regions:
            for i, (l, t, r, b) in enumerate(regions):
                rows.append((page_id, mode, area, len(regions), i,
                             int(l), int(t), int(r), int(b), n_cells))
        else:
            rows.append((page_id, mode, area, 0, -1, -1, -1, -1, -1,
                         n_cells))
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        page_ids = batch.column("page_id").to_numpy()
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        rects_col = batch.column("bitmap_rects").to_pylist()
        prog_b = batch.column("prog_boxes").to_pylist()
        prog_t = batch.column("prog_texts").to_pylist()
        rows: list[tuple] = []
        for pid, w, h, rects, pb, pt in zip(
                page_ids, widths, heights, rects_col, prog_b, prog_t):
            rows.append(self._one_page(
                int(pid), float(w), float(h),
                np.asarray(rects or [], np.float64).reshape(-1, 4),
                np.asarray(pb or [], np.float64).reshape(-1, 4),
                pt or []))
        flat = [r for page in rows for r in page]
        cols = list(zip(*flat)) if flat else [[]] * 10
        names = ["page_id", "mode", "area", "n_regions", "region_idx",
                 "l", "t", "r", "b", "n_cells_final"]
        types = [pa.int64(), pa.string()] + [pa.int64()] * 8
        return pa.table({n: pa.array(list(c), typ)
                         for n, c, typ in zip(names, cols, types)})
