"""M4 LayoutPostprocessor heuristics on synthetic overlapping-cell pages.

Mirrors the behaviors of the reference's
docling/utils/layout_postprocessor.py (confidence gates, label remapping,
orphan promotion, Union-Find overlap dedup with the label preference rules,
wrapper child capture, cross-type wrapper-vs-table removal, full-page
picture filter, sort modes) on hand-built pages — no Ray needed.
"""

from doc_parser_ray.functions.layout_post import (
    BBox,
    CODE,
    Cluster,
    FORM,
    KEY_VALUE_REGION,
    LayoutPostprocessor,
    LCell,
    LIST_ITEM,
    PICTURE,
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
)


def cell(i, x, y, w=50, h=10, text="w"):
    return LCell(index=i, text=text, bbox=BBox(x, y, x + w, y + h))


def run(cells, clusters, w=612.0, h=792.0, **kw):
    post = LayoutPostprocessor(cells, clusters, page_width=w, page_height=h, **kw)
    return post.postprocess()[0]


def test_low_confidence_clusters_dropped_and_cells_orphaned():
    cells = [cell(0, 10, 10), cell(1, 10, 30)]
    clusters = [
        Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 25), confidence=0.9),
        Cluster(id=1, label=TEXT, bbox=BBox(0, 25, 100, 45), confidence=0.1),
    ]
    out = run(cells, clusters)
    # low-confidence cluster dropped; its cell promoted to a singleton TEXT
    assert len(out) == 2
    assert {c.label for c in out} == {TEXT}
    orphan = [c for c in out if c.id not in (0, 1)][0]
    assert [c.index for c in orphan.cells] == [1]
    assert orphan.bbox.l == 10 and orphan.bbox.t == 30


def test_title_remapped_to_section_header():
    cells = [cell(0, 10, 10)]
    clusters = [Cluster(id=0, label=TITLE, bbox=BBox(0, 0, 100, 25), confidence=0.9)]
    out = run(cells, clusters)
    assert out[0].label == SECTION_HEADER


def test_empty_clusters_removed():
    cells = [cell(0, 10, 10)]
    clusters = [
        Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 25), confidence=0.9),
        Cluster(id=1, label=TEXT, bbox=BBox(400, 400, 500, 425), confidence=0.9),
    ]
    out = run(cells, clusters)
    assert [c.id for c in out] == [0]


def test_overlap_dedup_merges_duplicate_proposals():
    # two near-identical TEXT proposals over the same cells -> one survivor
    cells = [cell(0, 10, 10), cell(1, 10, 22)]
    clusters = [
        Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 40), confidence=0.8),
        Cluster(id=1, label=TEXT, bbox=BBox(2, 2, 102, 42), confidence=0.6),
    ]
    out = run(cells, clusters)
    assert len(out) == 1
    assert sorted(c.index for c in out[0].cells) == [0, 1]


def test_list_item_similar_area_rule():
    # Rule 1 keeps a lower-confidence LIST_ITEM in the running against a
    # TEXT of similar area (it would fail the conf-threshold fallback);
    # outside the 20% area band the fallback applies and rejects it.
    post = LayoutPostprocessor([], [], 612.0, 792.0)
    params = {"area_threshold": 1.3, "conf_threshold": 0.05}
    text = Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 40), confidence=0.95)
    li_similar = Cluster(id=1, label=LIST_ITEM, bbox=BBox(0, 0, 101, 40), confidence=0.55)
    li_small = Cluster(id=2, label=LIST_ITEM, bbox=BBox(0, 0, 60, 40), confidence=0.55)
    assert post._should_prefer(li_similar, text, params) is True
    assert post._should_prefer(li_small, text, params) is False
    # and a merged group still collapses to one survivor with all cells
    cells = [cell(0, 10, 10)]
    out = run(cells, [text, li_similar])
    assert len(out) == 1
    assert [c.index for c in out[0].cells] == [0]


def test_code_absorbs_contained_clusters():
    cells = [cell(0, 10, 10), cell(1, 10, 30)]
    clusters = [
        Cluster(id=0, label=CODE, bbox=BBox(0, 0, 200, 100), confidence=0.6),
        Cluster(id=1, label=TEXT, bbox=BBox(5, 5, 150, 90), confidence=0.99),
    ]
    out = run(cells, clusters)
    assert len(out) == 1
    assert out[0].label == CODE
    assert sorted(c.index for c in out[0].cells) == [0, 1]


def test_confidence_beats_area_within_threshold():
    # higher-confidence smaller cluster wins when area ratio <= 1.3 and
    # conf gap > 0.05 (the "regular" fallback rule)
    cells = [cell(0, 10, 10)]
    clusters = [
        Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 40), confidence=0.95),
        Cluster(id=1, label=TEXT, bbox=BBox(0, 0, 110, 44), confidence=0.55),
    ]
    out = run(cells, clusters)
    assert len(out) == 1
    assert out[0].id == 0


def test_wrapper_captures_contained_children():
    cells = [cell(0, 10, 10), cell(1, 10, 30), cell(2, 10, 300)]
    clusters = [
        Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 25), confidence=0.9),
        Cluster(id=1, label=TEXT, bbox=BBox(0, 25, 100, 45), confidence=0.9),
        Cluster(id=2, label=TEXT, bbox=BBox(0, 290, 100, 315), confidence=0.9),
        Cluster(id=3, label=TABLE, bbox=BBox(0, 0, 120, 50), confidence=0.9),
    ]
    out = run(cells, clusters)
    table = [c for c in out if c.label == TABLE][0]
    assert sorted(ch.id for ch in table.children) == [0, 1]
    assert sorted(c.index for c in table.cells) == [0, 1]
    # contained regulars removed from the top level; distant one remains
    top_regular_ids = {c.id for c in out if c.label == TEXT}
    assert top_regular_ids == {2}


def test_form_bbox_shrinks_to_children_table_does_not():
    cells = [cell(0, 10, 10)]
    regs = [Cluster(id=0, label=TEXT, bbox=BBox(5, 5, 100, 25), confidence=0.9)]
    form = Cluster(id=1, label=FORM, bbox=BBox(0, 0, 400, 400), confidence=0.9)
    out = run(cells, regs + [form])
    f = [c for c in out if c.label == FORM][0]
    # regular refinement snaps the child's bbox to its cell hull first,
    # so the FORM shrinks to that hull (reference order of operations)
    assert (f.bbox.l, f.bbox.t, f.bbox.r, f.bbox.b) == (10, 10, 60, 20)

    regs = [Cluster(id=0, label=TEXT, bbox=BBox(5, 5, 100, 25), confidence=0.9)]
    table = Cluster(id=1, label=TABLE, bbox=BBox(0, 0, 400, 400), confidence=0.9)
    out = run([cell(0, 10, 10)], regs + [table])
    t = [c for c in out if c.label == TABLE][0]
    assert (t.bbox.l, t.bbox.t, t.bbox.r, t.bbox.b) == (0, 0, 400, 400)


def test_kv_region_dropped_when_overlapping_table():
    cells = [cell(0, 10, 10)]
    clusters = [
        Cluster(id=0, label=TABLE, bbox=BBox(0, 0, 200, 100), confidence=0.9),
        Cluster(id=1, label=KEY_VALUE_REGION, bbox=BBox(1, 1, 199, 99), confidence=0.9),
        Cluster(id=2, label=TEXT, bbox=BBox(0, 0, 100, 25), confidence=0.9),
    ]
    # the regular TABLE used for the cross-type rule lives in regular? No —
    # TABLE is a wrapper type; the rule compares wrappers against *regular*
    # TABLE proposals, so build one of each.
    clusters[0].label = TEXT  # placeholder to keep ids stable
    clusters[0] = Cluster(id=0, label=TABLE, bbox=BBox(0, 0, 200, 100), confidence=0.9)
    post = LayoutPostprocessor(cells, clusters, 612.0, 792.0)
    post.regular_clusters.append(
        Cluster(id=9, label=TABLE, bbox=BBox(1, 1, 199, 99), confidence=0.9)
    )
    kept = post._cross_type_overlaps([c for c in clusters if c.label in (TABLE, KEY_VALUE_REGION)])
    assert all(c.label != KEY_VALUE_REGION for c in kept)


def test_full_page_picture_filtered():
    cells = [cell(0, 10, 10)]
    clusters = [
        Cluster(id=0, label=PICTURE, bbox=BBox(0, 0, 600, 780), confidence=0.9),
        Cluster(id=1, label=PICTURE, bbox=BBox(0, 0, 100, 100), confidence=0.9),
        Cluster(id=2, label=TEXT, bbox=BBox(0, 0, 100, 25), confidence=0.9),
    ]
    out = run(cells, clusters, w=612.0, h=792.0)
    pics = [c for c in out if c.label == PICTURE]
    assert [p.id for p in pics] == [1]


def test_blank_cells_never_assigned_or_orphaned():
    cells = [cell(0, 10, 10), cell(1, 10, 30, text="   ")]
    clusters = [Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 100, 45), confidence=0.9)]
    out = run(cells, clusters)
    assert len(out) == 1
    assert [c.index for c in out[0].cells] == [0]


def test_bbox_snaps_to_cell_hull():
    cells = [cell(0, 10, 10), cell(1, 30, 30)]
    clusters = [Cluster(id=0, label=TEXT, bbox=BBox(0, 0, 400, 400), confidence=0.9)]
    out = run(cells, clusters)
    b = out[0].bbox
    assert (b.l, b.t, b.r, b.b) == (10, 10, 80, 40)


def test_sort_modes():
    # two columns: left cluster printed second (higher cell index)
    cells = [cell(0, 300, 10), cell(1, 10, 10)]
    left = Cluster(id=0, label=TEXT, bbox=BBox(5, 5, 100, 25), confidence=0.9)
    right = Cluster(id=1, label=TEXT, bbox=BBox(295, 5, 400, 25), confidence=0.9)

    out = run(list(cells), [right, left], sort_mode="id")
    assert [c.id for c in out] == [1, 0]  # print order: right cell first

    out = run(list(cells), [right, left], sort_mode="lrtb")
    assert [c.id for c in out] == [0, 1]  # geometric: left column first

    out = run(list(cells), [right, left], sort_mode="input")
    assert [c.id for c in out] == [1, 0]  # caller's order preserved


def test_iterative_refinement_converges():
    # duplicate stacks reduce over iterations without oscillation
    cells = [cell(i, 10, 10 + 12 * i) for i in range(4)]
    clusters = [
        Cluster(id=j, label=TEXT, bbox=BBox(j, j, 100 + j, 60 + j), confidence=0.9)
        for j in range(5)
    ]
    out = run(cells, clusters)
    assert len(out) == 1
    assert sorted(c.index for c in out[0].cells) == [0, 1, 2, 3]


def test_xy_cut_path_unchanged_by_postprocessor():
    # the PDF path feeds disjoint XY-cut blocks through the postprocessor;
    # that must be an identity pass (cluster count, order, cell sets)
    from doc_parser_ray.functions.pdf_extract import TextCell, cells_to_items

    cells = [
        TextCell(text="Left column para one.", l=10, t=10, r=200, b=22),
        TextCell(text="Left column para two.", l=10, t=60, r=200, b=72),
        TextCell(text="Right column text here.", l=300, t=10, r=500, b=22),
    ]
    items = [i.text for i in cells_to_items(cells)]
    assert items == [
        "Left column para one.",
        "Left column para two.",
        "Right column text here.",
    ]
