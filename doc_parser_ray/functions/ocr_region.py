"""OCR-region selection heuristics — the deterministic half of the
reference's page-OCR stage (M2), reimplemented with rect arithmetic.

Reference semantics (docling/models/base_ocr_model.py:40-171):

  get_ocr_rects (``:40-111``): draw every bitmap rect (rounded coords,
  inclusive endpoints — PIL ``1``-mode canvas) into a binary page mask,
  binary-dilate with a 20×20 ones structure ("10 pixels in all
  directions"), label the 4-connected components, take each component's
  bounding box, and compute the covered-area fraction of the page.
  Decision (``:97-111``): ``force_full_page_ocr`` or coverage >
  max(0.75, bitmap_area_threshold) → ONE full-page rect (0, 0, width,
  height); coverage > bitmap_area_threshold (pipeline_options.py:78-80,
  default 0.05) → the component boxes; else → no OCR at all.

  _filter_ocr_cells (``:115-138``): drop any OCR cell whose bounding
  box intersects ANY programmatic cell (R-tree query — closed
  intervals, touching counts).

  _combine_cells (``:163-177``): ``force_full_page_ocr`` → OCR cells
  only; otherwise existing cells + filtered OCR cells; re-index 0..n-1.

Implementation note — rect arithmetic, not bitmaps: dilation
distributes over union, so the dilated mask of a set of rects IS the
union of the per-rect dilations, its exact pixel area follows from
coordinate compression (interval union per x-band), and its 4-connected
components are the connected components of the rect-adjacency graph.
That turns the reference's O(W×H) per-page raster (612×792 ≈ 500k
pixels) into O(rects²) integer math (a page holds tens of bitmap
rects), which is what you want when the stage runs inside ``map_batches``
over millions of pages. A brute-force sliding-window bitmap
implementation pins equality in tests/test_ocr_region.py.

Even-kernel convention: a 20×20 structure has no center pixel; this
module uses scipy's ``size // 2`` origin, i.e. a filled input pixel
q illuminates output pixels [q - 10, q + 9] per axis (documented
contract, pinned by the tests' brute-force twin).

Threshold comparisons are done as ``area > threshold * (w*h)`` with
``area`` an exact integer — bit-identical between numpy and the SQL
twins because both engines round the identical product once.
"""

from __future__ import annotations

import numpy as np

BITMAP_COVERAGE_THRESHOLD = 0.75   # base_ocr_model.py:43
DEFAULT_BITMAP_AREA_THRESHOLD = 0.05  # pipeline_options.py:78-80
DILATION_SIZE = 20                 # base_ocr_model.py:61-65
_PAD_LO = DILATION_SIZE // 2       # 10 px gained left/top
_PAD_HI = DILATION_SIZE - 1 - _PAD_LO  # 9 px gained right/bottom


def dilated_pixel_rects(rects, width: float, height: float) -> np.ndarray:
    """(n, 4) int64 array of CLIPPED dilated pixel rects
    [x0, y0, x1, y1] (inclusive endpoints) from float bitmap rects.

    Mirrors the reference raster order exactly: round the coords
    (banker's rounding — PIL receives Python ``round``), clip the DRAWN
    rect to the canvas (PIL clips at draw time), then expand by the
    dilation support and clip again. Degenerate/off-canvas rects vanish
    like pixels that were never drawn."""
    wr, hr = int(np.rint(width)), int(np.rint(height))
    r = np.rint(np.asarray(rects, dtype=np.float64)).astype(np.int64)
    r = r.reshape(-1, 4)
    if len(r) == 0:
        return np.empty((0, 4), np.int64)
    # clip the drawn rect to the canvas
    x0 = np.clip(r[:, 0], 0, wr - 1)
    y0 = np.clip(r[:, 1], 0, hr - 1)
    x1 = np.clip(r[:, 2], 0, wr - 1)
    y1 = np.clip(r[:, 3], 0, hr - 1)
    keep = (r[:, 2] >= r[:, 0]) & (r[:, 3] >= r[:, 1]) \
        & (r[:, 2] >= 0) & (r[:, 0] <= wr - 1) \
        & (r[:, 3] >= 0) & (r[:, 1] <= hr - 1)
    x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
    # dilate + clip
    x0 = np.maximum(x0 - _PAD_LO, 0)
    y0 = np.maximum(y0 - _PAD_LO, 0)
    x1 = np.minimum(x1 + _PAD_HI, wr - 1)
    y1 = np.minimum(y1 + _PAD_HI, hr - 1)
    return np.stack([x0, y0, x1, y1], axis=1)


def union_pixel_area(prects: np.ndarray) -> int:
    """Exact pixel count of the union of inclusive int rects, by
    coordinate compression: for every x-band between consecutive
    distinct x edges, merge the y intervals of the rects spanning it."""
    if len(prects) == 0:
        return 0
    x0, y0, x1, y1 = (prects[:, i] for i in range(4))
    xs = np.unique(np.concatenate([x0, x1 + 1]))
    area = 0
    for i in range(len(xs) - 1):
        lo, hi = xs[i], xs[i + 1]
        sel = (x0 <= lo) & (x1 + 1 >= hi)
        if not sel.any():
            continue
        ys0, ys1 = y0[sel], y1[sel] + 1
        order = np.argsort(ys0, kind="stable")
        ys0, ys1 = ys0[order], ys1[order]
        covered = 0
        cur_lo, cur_hi = ys0[0], ys1[0]
        for a, b in zip(ys0[1:], ys1[1:]):
            if a > cur_hi:
                covered += cur_hi - cur_lo
                cur_lo, cur_hi = a, b
            else:
                cur_hi = max(cur_hi, b)
        covered += cur_hi - cur_lo
        area += int(covered) * int(hi - lo)
    return area


def rect_components(prects: np.ndarray) -> list[np.ndarray]:
    """4-connected components of the pixel union of inclusive int
    rects, as the connected components of the rect-adjacency graph:
    two rects are 4-adjacent iff their intervals overlap on one axis
    and overlap-or-touch (gap ≤ 1 px) on the other. Returns bounding
    boxes [l, t, r, b] in ``scipy.ndimage.label`` order — labels are
    assigned at each component's first pixel in raster scan, i.e. sort
    by (top row, leftmost x among rects whose top edge IS the top row);
    note that key is NOT the bbox (t, l) — an L-shape can have bbox l
    left of its topmost run."""
    n = len(prects)
    if n == 0:
        return []
    x0, y0, x1, y1 = (prects[:, i] for i in range(4))
    xo = (x0[:, None] <= x1[None, :]) & (x0[None, :] <= x1[:, None])
    yo = (y0[:, None] <= y1[None, :]) & (y0[None, :] <= y1[:, None])
    xg = (x0[:, None] <= x1[None, :] + 1) & (x0[None, :] <= x1[:, None] + 1)
    yg = (y0[:, None] <= y1[None, :] + 1) & (y0[None, :] <= y1[:, None] + 1)
    adj = (xo & yg) | (yo & xg)
    # label propagation over the small boolean matrix (n = tens)
    label = np.arange(n)
    while True:
        new = np.where(adj, label[None, :], n).min(axis=1)
        new = np.minimum(new, label)
        if np.array_equal(new, label):
            break
        label = new
        # pointer jumping
        while True:
            nn = label[label]
            if np.array_equal(nn, label):
                break
            label = nn
    boxes = []
    for lab in np.unique(label):
        m = label == lab
        top = y0[m].min()
        first_x = x0[m][y0[m] == top].min()
        boxes.append((int(top), int(first_x),
                      np.array([x0[m].min(), y0[m].min(),
                                x1[m].max(), y1[m].max()], np.int64)))
    boxes.sort(key=lambda k: (k[0], k[1]))
    return [b for _, _, b in boxes]


def select_ocr_regions(width: float, height: float, rects,
                       *, bitmap_area_threshold: float =
                       DEFAULT_BITMAP_AREA_THRESHOLD,
                       force_full_page: bool = False):
    """The get_ocr_rects decision (base_ocr_model.py:40-111).

    Returns ``(mode, area, regions)`` where ``mode`` ∈ {"full_page",
    "rects", "none"}, ``area`` is the exact dilated-mask pixel count,
    and ``regions`` is a list of (l, t, r, b) float tuples — component
    boxes have inclusive int endpoints (find_objects' stop-1), the
    full-page box is (0, 0, width, height) exactly as the reference
    builds it from page.size."""
    prects = dilated_pixel_rects(rects, width, height)
    area = union_pixel_area(prects)
    total = float(width) * float(height)
    if force_full_page or area > max(
            BITMAP_COVERAGE_THRESHOLD, bitmap_area_threshold) * total:
        return "full_page", area, [(0.0, 0.0, float(width), float(height))]
    if area > bitmap_area_threshold * total:
        boxes = rect_components(prects)
        return "rects", area, [tuple(float(v) for v in b) for b in boxes]
    return "none", area, []


def filter_ocr_cells(ocr_boxes: np.ndarray,
                     prog_boxes: np.ndarray) -> np.ndarray:
    """Boolean keep-mask over OCR cells: drop any cell whose box
    intersects (closed intervals — touching counts, like the rtree
    query at base_ocr_model.py:115-138) any programmatic cell."""
    ocr_boxes = np.asarray(ocr_boxes, np.float64).reshape(-1, 4)
    prog_boxes = np.asarray(prog_boxes, np.float64).reshape(-1, 4)
    if len(ocr_boxes) == 0:
        return np.zeros(0, dtype=bool)
    if len(prog_boxes) == 0:
        return np.ones(len(ocr_boxes), dtype=bool)
    ox0, oy0, ox1, oy1 = (ocr_boxes[:, i][:, None] for i in range(4))
    px0, py0, px1, py1 = (prog_boxes[:, i][None, :] for i in range(4))
    hit = (ox0 <= px1) & (px0 <= ox1) & (oy0 <= py1) & (py0 <= oy1)
    return ~hit.any(axis=1)


def combine_cells(existing_boxes, existing_texts, ocr_boxes, ocr_texts,
                  *, force_full_page: bool = False):
    """_combine_cells (base_ocr_model.py:163-177): force_full_page →
    OCR cells replace everything; otherwise existing + overlap-filtered
    OCR cells. Returns (boxes, texts, from_ocr, index) arrays with
    index re-assigned 0..n-1."""
    existing_boxes = np.asarray(existing_boxes, np.float64).reshape(-1, 4)
    ocr_boxes = np.asarray(ocr_boxes, np.float64).reshape(-1, 4)
    if force_full_page:
        boxes = ocr_boxes
        texts = list(ocr_texts)
        from_ocr = np.ones(len(boxes), dtype=bool)
    else:
        keep = filter_ocr_cells(ocr_boxes, existing_boxes)
        boxes = np.concatenate([existing_boxes, ocr_boxes[keep]]) \
            if len(existing_boxes) or keep.any() \
            else np.empty((0, 4), np.float64)
        texts = list(existing_texts) + [t for t, k in zip(ocr_texts, keep)
                                        if k]
        from_ocr = np.concatenate([np.zeros(len(existing_boxes), bool),
                                   np.ones(int(keep.sum()), bool)])
    return boxes, texts, from_ocr, np.arange(len(texts), dtype=np.int64)
