"""M2 OCR-region selection — rect-arithmetic impl vs a brute-force
raster twin (the reference's actual algorithm: draw → 20×20 dilate →
4-connected label → bbox; base_ocr_model.py:40-111), plus the
filter/combine semantics and the actor-pool stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from doc_parser_ray.functions.ocr_region import (
    BITMAP_COVERAGE_THRESHOLD,
    DEFAULT_BITMAP_AREA_THRESHOLD,
    combine_cells,
    dilated_pixel_rects,
    filter_ocr_cells,
    rect_components,
    select_ocr_regions,
    union_pixel_area,
)
from doc_parser_ray.stages.ocr import FakeOcrEngine, OcrRegionStage


# ---------------------------------------------------------------- twin

def raster_mask(width, height, rects):
    """The reference's pixel pipeline, hand-rolled (no scipy here):
    draw rounded rects clipped to the canvas, then dilate with a 20×20
    ones structure at scipy's size//2 origin — a set input pixel q
    illuminates output pixels [q-10, q+9] on each axis."""
    wr, hr = int(np.rint(width)), int(np.rint(height))
    img = np.zeros((hr, wr), bool)
    for rect in np.asarray(rects, np.float64).reshape(-1, 4):
        x0, y0, x1, y1 = (int(np.rint(v)) for v in rect)
        if x1 < x0 or y1 < y0:
            continue  # degenerate: contract says "never drawn"
        xa, ya = max(x0, 0), max(y0, 0)
        xb, yb = min(x1, wr - 1), min(y1, hr - 1)
        if xa > xb or ya > yb:
            continue
        img[ya:yb + 1, xa:xb + 1] = True
    out = np.zeros_like(img)
    ys, xs = np.nonzero(img)
    for y, x in zip(ys, xs):
        out[max(y - 10, 0):min(y + 9, hr - 1) + 1,
            max(x - 10, 0):min(x + 9, wr - 1) + 1] = True
    return out


def raster_components(mask):
    """4-connected flood fill in raster scan order → bboxes [l,t,r,b],
    in label order (first-pixel scan order, like scipy.ndimage.label)."""
    h, w = mask.shape
    seen = np.zeros_like(mask)
    boxes = []
    for y in range(h):
        for x in range(w):
            if not mask[y, x] or seen[y, x]:
                continue
            stack = [(y, x)]
            seen[y, x] = True
            t_, b_, l_, r_ = y, y, x, x
            while stack:
                cy, cx = stack.pop()
                t_, b_ = min(t_, cy), max(b_, cy)
                l_, r_ = min(l_, cx), max(r_, cx)
                for ny, nx in ((cy - 1, cx), (cy + 1, cx),
                               (cy, cx - 1), (cy, cx + 1)):
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] \
                            and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            boxes.append([l_, t_, r_, b_])
    return boxes


def rand_rects(rng, w, h, n):
    """Valid (x1>=x0, y1>=y0) float rects, some hanging off-canvas,
    some with .5 coords to exercise banker's rounding."""
    x0 = rng.uniform(-15, w + 5, n)
    y0 = rng.uniform(-15, h + 5, n)
    x1 = x0 + rng.uniform(0, w * 0.6, n)
    y1 = y0 + rng.uniform(0, h * 0.6, n)
    r = np.stack([x0, y0, x1, y1], axis=1)
    halves = rng.random(n) < 0.3
    r[halves] = np.floor(r[halves] * 2) / 2.0  # exact .5 values
    return r


@pytest.mark.parametrize("seed", range(8))
def test_area_and_components_match_raster(seed):
    rng = np.random.default_rng(1000 + seed)
    for _ in range(25):
        w = int(rng.integers(40, 140))
        h = int(rng.integers(40, 140))
        n = int(rng.integers(0, 9))
        rects = rand_rects(rng, w, h, n)
        mask = raster_mask(w, h, rects)
        prects = dilated_pixel_rects(rects, w, h)
        assert union_pixel_area(prects) == int(mask.sum())
        want = raster_components(mask)
        got = [b.tolist() for b in rect_components(prects)]
        assert got == want, (w, h, rects.tolist())


def test_degenerate_and_offcanvas_rects_vanish():
    # inverted, zero-canvas-overlap, and fully negative rects draw nothing
    rects = [(30, 30, 10, 40), (200, 10, 220, 20), (-50, -50, -40, -41)]
    assert len(dilated_pixel_rects(rects, 100, 100)) == 0
    mode, area, regions = select_ocr_regions(100, 100, rects)
    assert (mode, area, regions) == ("none", 0, [])


def test_threshold_decision_matches_reference_constants():
    # coverage fractions use the exact reference expressions:
    # full page when area > max(0.75, thr) * (w*h); rects when > thr*(w*h)
    assert BITMAP_COVERAGE_THRESHOLD == 0.75
    assert DEFAULT_BITMAP_AREA_THRESHOLD == 0.05
    w, h = 100, 100
    # a single rect dilated to cover > 75% of the page → full page
    # (inclusive endpoints: 5..85 dilates to 0..94 = 95 px per axis)
    mode, area, regions = select_ocr_regions(w, h, [(5, 5, 85, 85)])
    assert area == 95 * 95 and mode == "full_page"
    assert regions == [(0.0, 0.0, 100.0, 100.0)]
    # mid coverage → component rects (inclusive pixel boxes)
    mode, area, regions = select_ocr_regions(w, h, [(20, 20, 40, 40)])
    assert mode == "rects" and area == 40 * 40
    assert regions == [(10.0, 10.0, 49.0, 49.0)]
    # tiny coverage → none (0.05 * 10000 = 500 pixels; a 1×1 rect
    # dilates to 20×20 = 400 ≤ threshold is false: 400 < 500 → none)
    mode, area, regions = select_ocr_regions(w, h, [(50, 50, 50, 50)])
    assert mode == "none" and area == 400 and regions == []
    # force_full_page wins even with zero rects
    mode, area, regions = select_ocr_regions(w, h, [], force_full_page=True)
    assert mode == "full_page" and area == 0
    assert regions == [(0.0, 0.0, 100.0, 100.0)]


def test_dilation_merges_across_19px_gap_only():
    # dilated intervals [x0-10, x1+9]: gap g merges iff g <= 19
    near = [(10, 10, 20, 20), (40, 10, 50, 20)]   # g = 19 → merge
    far = [(10, 10, 20, 20), (41, 10, 51, 20)]    # g = 20 → two comps
    assert len(rect_components(dilated_pixel_rects(near, 200, 60))) == 1
    assert len(rect_components(dilated_pixel_rects(far, 200, 60))) == 2


def test_filter_ocr_cells_touching_counts():
    prog = [(10, 10, 20, 20)]
    ocr = [(20, 20, 30, 30),   # touches at corner → intersects (closed)
           (21, 10, 30, 20),   # 1px gap in x → kept
           (0, 0, 9, 9),       # 1px gap both axes → kept
           (15, 15, 16, 16)]   # contained → dropped
    keep = filter_ocr_cells(np.array(ocr), np.array(prog))
    assert keep.tolist() == [False, True, True, False]
    # no programmatic cells → everything kept
    assert filter_ocr_cells(np.array(ocr), np.empty((0, 4))).all()


def test_combine_cells_semantics():
    ex_b = [(0, 0, 10, 10), (30, 30, 40, 40)]
    ex_t = ["a", "b"]
    ocr_b = [(5, 5, 8, 8), (60, 60, 70, 70)]
    ocr_t = ["x", "y"]
    boxes, texts, from_ocr, idx = combine_cells(ex_b, ex_t, ocr_b, ocr_t)
    assert texts == ["a", "b", "y"]          # overlapping OCR cell dropped
    assert from_ocr.tolist() == [False, False, True]
    assert idx.tolist() == [0, 1, 2]         # re-indexed 0..n-1
    boxes, texts, from_ocr, idx = combine_cells(
        ex_b, ex_t, ocr_b, ocr_t, force_full_page=True)
    assert texts == ["x", "y"] and from_ocr.all()  # OCR replaces all
    assert idx.tolist() == [0, 1]


def _page_batch():
    return pa.table({
        "page_id": pa.array([1, 2, 3], pa.int64()),
        "width": pa.array([100.0, 100.0, 100.0]),
        "height": pa.array([100.0, 100.0, 100.0]),
        "bitmap_rects": pa.array(
            [[[5.0, 5.0, 85.0, 85.0]],           # full page
             [[20.0, 20.0, 40.0, 40.0]],          # rects
             []],                                  # none
            pa.list_(pa.list_(pa.float64()))),
        "prog_boxes": pa.array(
            [[[0.0, 0.0, 50.0, 50.0]], [], [[1.0, 1.0, 2.0, 2.0]]],
            pa.list_(pa.list_(pa.float64()))),
        "prog_texts": pa.array([["p"], [], ["q"]],
                               pa.list_(pa.string())),
    })


def test_stage_over_batch():
    out = OcrRegionStage(engine="fake")(_page_batch())
    rows = {r["page_id"]: r for r in out.to_pylist()}
    assert rows[1]["mode"] == "full_page"
    # full-page OCR cell (2,2,98,98) overlaps the prog cell → dropped;
    # final cells = the 1 programmatic cell
    assert rows[1]["n_cells_final"] == 1
    assert (rows[1]["l"], rows[1]["t"], rows[1]["r"], rows[1]["b"]) \
        == (0, 0, 100, 100)
    assert rows[2]["mode"] == "rects" and rows[2]["n_cells_final"] == 1
    assert (rows[2]["l"], rows[2]["t"], rows[2]["r"], rows[2]["b"]) \
        == (10, 10, 49, 49)
    assert rows[3]["mode"] == "none" and rows[3]["region_idx"] == -1
    assert rows[3]["n_cells_final"] == 1  # prog cell survives


def test_stage_in_ray_actor_pool(ray_session):
    import ray

    ds = ray.data.from_arrow(_page_batch())
    out = ds.map_batches(OcrRegionStage, fn_constructor_kwargs={},
                         concurrency=1, batch_format="pyarrow").take_all()
    assert {r["page_id"] for r in out} == {1, 2, 3}


def test_real_engine_unavailable_raises():
    with pytest.raises(NotImplementedError, match="unavailable"):
        OcrRegionStage(engine="tesseract")


def test_fake_engine_deterministic():
    e = FakeOcrEngine()
    assert e.recognize(7, [(0.0, 0.0, 10.0, 10.0)]) == \
        ([(2.0, 2.0, 8.0, 8.0)], ["ocr:7:0"])
