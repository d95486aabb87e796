"""M4 layout postprocessing: cluster cleanup heuristics for the PDF path.

Ports the deterministic cluster-refinement semantics of the reference's
``docling/utils/layout_postprocessor.py:17-670`` (LayoutPostprocessor):

- per-label confidence thresholds + TITLE -> SECTION_HEADER remapping
  (``:171-195``),
- best-overlap cell assignment at min_overlap 0.2, skipping blank cells
  (``:566-605``),
- orphan-cell promotion to singleton TEXT clusters (``:275-295``),
- iterative refinement (<=3 rounds): bbox snap-to-cells (union with the
  original bbox for TABLE) then overlap dedup (``:297-305``, ``:608-637``),
- overlap dedup via Union-Find groups over pairs passing
  iou > overlap_threshold OR either-way containment > containment_threshold,
  winner chosen by the reference's preference rules (LIST_ITEM beats TEXT at
  ~equal area; CODE absorbs >0.8-contained others; else area/confidence
  thresholds per cluster type), losers' cells merged into the winner
  (``:404-530``),
- special-cluster handling: cross-type removal of wrapper proposals ~identical
  to a TABLE (overlap > 0.9, conf_diff < 0.1), full-page picture filter
  (> 0.90 page area), child capture of regular clusters >0.8-contained in a
  special, bbox shrink-to-children for FORM/KEY_VALUE_REGION only
  (``:306-368``, ``:369-402``),
- final sort modes ``id`` (min cell index, then t, l), ``tblr``, ``lrtb``
  (``:652-670``).

The reference needs an R-tree because its candidate sets come from a spatial
index; semantically the index is only a pruner — a pair is merged iff
``check_overlap`` passes — so this port evaluates the overlap predicate over
all pairs per page (tens of clusters), which is the same fixed point without
the rtree dependency (absent in this env).

Labels are plain strings (the subset of DocItemLabel this repo uses).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# -- labels (DocItemLabel subset) ---------------------------------------

CAPTION = "caption"
FOOTNOTE = "footnote"
FORMULA = "formula"
LIST_ITEM = "list_item"
PAGE_FOOTER = "page_footer"
PAGE_HEADER = "page_header"
PICTURE = "picture"
SECTION_HEADER = "section_header"
TABLE = "table"
TEXT = "text"
TITLE = "title"
CODE = "code"
CHECKBOX_SELECTED = "checkbox_selected"
CHECKBOX_UNSELECTED = "checkbox_unselected"
FORM = "form"
KEY_VALUE_REGION = "key_value_region"
DOCUMENT_INDEX = "document_index"

WRAPPER_TYPES = {FORM, KEY_VALUE_REGION, TABLE, DOCUMENT_INDEX}
SPECIAL_TYPES = WRAPPER_TYPES | {PICTURE}

# reference layout_postprocessor.py:171-188
CONFIDENCE_THRESHOLDS = {
    CAPTION: 0.5,
    FOOTNOTE: 0.5,
    FORMULA: 0.5,
    LIST_ITEM: 0.5,
    PAGE_FOOTER: 0.5,
    PAGE_HEADER: 0.5,
    PICTURE: 0.5,
    SECTION_HEADER: 0.45,
    TABLE: 0.5,
    TEXT: 0.5,
    TITLE: 0.45,
    CODE: 0.45,
    CHECKBOX_SELECTED: 0.45,
    CHECKBOX_UNSELECTED: 0.45,
    FORM: 0.45,
    KEY_VALUE_REGION: 0.45,
    DOCUMENT_INDEX: 0.45,
}

LABEL_REMAPPING = {TITLE: SECTION_HEADER}

# reference layout_postprocessor.py:157-162
OVERLAP_PARAMS = {
    "regular": {"area_threshold": 1.3, "conf_threshold": 0.05},
    "picture": {"area_threshold": 2.0, "conf_threshold": 0.3},
    "wrapper": {"area_threshold": 2.0, "conf_threshold": 0.2},
}


@dataclass
class BBox:
    """Axis-aligned box, top-left origin (t < b)."""

    l: float
    t: float
    r: float
    b: float

    def area(self) -> float:
        return max(0.0, self.r - self.l) * max(0.0, self.b - self.t)

    def intersection_area(self, other: "BBox") -> float:
        w = min(self.r, other.r) - max(self.l, other.l)
        h = min(self.b, other.b) - max(self.t, other.t)
        if w <= 0 or h <= 0:
            return 0.0
        return w * h

    def iou(self, other: "BBox") -> float:
        inter = self.intersection_area(other)
        union = self.area() + other.area() - inter
        return inter / union if union > 0 else 0.0

    def intersection_over_self(self, other: "BBox") -> float:
        a = self.area()
        return self.intersection_area(other) / a if a > 0 else 0.0


@dataclass
class LCell:
    """One positioned text cell with its native (print) order index."""

    index: int
    text: str
    bbox: BBox
    confidence: float = 1.0


@dataclass
class Cluster:
    """A labeled layout region proposal."""

    id: int
    label: str
    bbox: BBox
    confidence: float = 1.0
    cells: list[LCell] = field(default_factory=list)
    children: list["Cluster"] = field(default_factory=list)


class _UnionFind:
    def __init__(self, elems):
        self.parent = {e: e for e in elems}
        self.rank = dict.fromkeys(elems, 0)

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if self.rank[rx] < self.rank[ry]:
            rx, ry = ry, rx
        self.parent[ry] = rx
        if self.rank[rx] == self.rank[ry]:
            self.rank[rx] += 1

    def groups(self) -> dict:
        out: dict = {}
        for e in self.parent:
            out.setdefault(self.find(e), []).append(e)
        return out


def _check_overlap(
    b1: BBox, b2: BBox, overlap_threshold: float, containment_threshold: float
) -> bool:
    if b1.area() <= 0 or b2.area() <= 0:
        return False
    return (
        b1.iou(b2) > overlap_threshold
        or b1.intersection_over_self(b2) > containment_threshold
        or b2.intersection_over_self(b1) > containment_threshold
    )


def _dedup_cells(cells: list[LCell]) -> list[LCell]:
    seen: set[int] = set()
    out = []
    for c in cells:
        if c.index not in seen:
            seen.add(c.index)
            out.append(c)
    return out


def _sort_cells(cells: list[LCell]) -> list[LCell]:
    return sorted(cells, key=lambda c: c.index)


class LayoutPostprocessor:
    """Refine cluster proposals over a page's text cells.

    ``sort_mode`` extends the reference with ``"input"`` (keep the caller's
    cluster order) so a caller whose proposal order already encodes reading
    order — the XY-cut path — is not re-ordered by PDF print order.
    """

    def __init__(
        self,
        cells: list[LCell],
        clusters: list[Cluster],
        page_width: float,
        page_height: float,
        create_orphan_clusters: bool = True,
        sort_mode: str = "id",
    ) -> None:
        self.cells = cells
        self.page_area = page_width * page_height
        self.all_clusters = clusters
        self.create_orphan_clusters = create_orphan_clusters
        self.sort_mode = sort_mode
        self.regular_clusters = [c for c in clusters if c.label not in SPECIAL_TYPES]
        self.special_clusters = [c for c in clusters if c.label in SPECIAL_TYPES]
        self._input_order = {c.id: i for i, c in enumerate(clusters)}

    # -- public ----------------------------------------------------------

    def postprocess(self) -> tuple[list[Cluster], list[LCell]]:
        self.regular_clusters = self._process_regular()
        self.special_clusters = self._process_special()

        contained_ids = {
            child.id
            for wrapper in self.special_clusters
            for child in wrapper.children
        }
        self.regular_clusters = [
            c for c in self.regular_clusters if c.id not in contained_ids
        ]

        final = self._sort_clusters(self.regular_clusters + self.special_clusters)
        for cluster in final:
            cluster.cells = _sort_cells(cluster.cells)
            for child in cluster.children:
                child.cells = _sort_cells(child.cells)
        return final, self.cells

    # -- regular ---------------------------------------------------------

    def _process_regular(self) -> list[Cluster]:
        clusters = [
            c
            for c in self.regular_clusters
            if c.confidence >= CONFIDENCE_THRESHOLDS.get(c.label, 0.5)
        ]
        for c in clusters:
            if c.label in LABEL_REMAPPING:
                c.label = LABEL_REMAPPING[c.label]

        clusters = self._assign_cells(clusters)
        clusters = [c for c in clusters if c.cells]

        unassigned = self._unassigned_cells(clusters)
        if unassigned and self.create_orphan_clusters:
            next_id = max((c.id for c in self.all_clusters), default=0) + 1
            for i, cell in enumerate(unassigned):
                orphan = Cluster(
                    id=next_id + i,
                    label=TEXT,
                    bbox=BBox(cell.bbox.l, cell.bbox.t, cell.bbox.r, cell.bbox.b),
                    confidence=cell.confidence,
                    cells=[cell],
                )
                # keep orphans after their source order for "input" sorting
                self._input_order[orphan.id] = len(self._input_order)
                clusters.append(orphan)

        prev = len(clusters) + 1
        for _ in range(3):
            if prev == len(clusters):
                break
            prev = len(clusters)
            clusters = self._adjust_bboxes(clusters)
            # containment 0.1 matches the reference's downstream fork
            # (layout_postprocessor.py:303 — paragraph-overlap prevention)
            clusters = self._remove_overlapping(
                clusters, "regular", containment_threshold=0.1
            )
        return clusters

    # -- special ---------------------------------------------------------

    def _process_special(self) -> list[Cluster]:
        specials = [
            c
            for c in self.special_clusters
            if c.confidence >= CONFIDENCE_THRESHOLDS.get(c.label, 0.5)
        ]
        specials = self._cross_type_overlaps(specials)

        if self.page_area > 0:
            specials = [
                c
                for c in specials
                if not (c.label == PICTURE and c.bbox.area() / self.page_area > 0.90)
            ]

        for special in specials:
            contained = [
                c
                for c in self.regular_clusters
                if c.bbox.intersection_over_self(special.bbox) > 0.8
            ]
            if not contained:
                continue
            contained = self._sort_clusters(contained, mode="id")
            special.children = contained
            if special.label in (FORM, KEY_VALUE_REGION):
                special.bbox = BBox(
                    l=min(c.bbox.l for c in contained),
                    t=min(c.bbox.t for c in contained),
                    r=max(c.bbox.r for c in contained),
                    b=max(c.bbox.b for c in contained),
                )
            all_cells: list[LCell] = []
            for child in contained:
                all_cells.extend(child.cells)
            special.cells = _sort_cells(_dedup_cells(all_cells))

        pictures = [c for c in specials if c.label == PICTURE]
        pictures = self._remove_overlapping(pictures, "picture")
        wrappers = [c for c in specials if c.label in WRAPPER_TYPES]
        wrappers = self._remove_overlapping(wrappers, "wrapper")
        return pictures + wrappers

    def _cross_type_overlaps(self, specials: list[Cluster]) -> list[Cluster]:
        """Drop wrapper proposals near-identical to a regular TABLE."""
        drop: set[int] = set()
        for wrapper in specials:
            if wrapper.label not in WRAPPER_TYPES:
                continue
            for regular in self.regular_clusters:
                if regular.label != TABLE:
                    continue
                overlap = wrapper.bbox.intersection_over_self(regular.bbox)
                conf_diff = wrapper.confidence - regular.confidence
                if overlap > 0.9 and conf_diff < 0.1:
                    drop.add(wrapper.id)
                    break
        return [c for c in specials if c.id not in drop]

    # -- overlap resolution ----------------------------------------------

    def _should_prefer(self, candidate: Cluster, other: Cluster, params: dict) -> bool:
        # Rule 1: LIST_ITEM beats TEXT at similar area (within 20%)
        if candidate.label == LIST_ITEM and other.label == TEXT:
            if other.bbox.area() > 0:
                ratio = candidate.bbox.area() / other.bbox.area()
                if abs(1 - ratio) < 0.2:
                    return True
        # Rule 2: CODE absorbs clusters >80% contained in it
        if candidate.label == CODE:
            if other.bbox.intersection_over_self(candidate.bbox) > 0.8:
                return True
        # Fallback: area/confidence thresholds
        if other.bbox.area() > 0:
            area_ratio = candidate.bbox.area() / other.bbox.area()
            conf_diff = other.confidence - candidate.confidence
            if area_ratio <= params["area_threshold"] and conf_diff > params["conf_threshold"]:
                return False
        return True

    def _select_best(self, group: list[Cluster], params: dict) -> Cluster:
        best = None
        for candidate in group:
            if any(
                not self._should_prefer(candidate, other, params)
                for other in group
                if other is not candidate
            ):
                continue
            if best is None:
                best = candidate
            elif (
                candidate.bbox.area() > best.bbox.area()
                and best.confidence - candidate.confidence <= params["conf_threshold"]
            ):
                best = candidate
        return best if best is not None else group[0]

    def _remove_overlapping(
        self,
        clusters: list[Cluster],
        cluster_type: str,
        overlap_threshold: float = 0.8,
        containment_threshold: float = 0.8,
    ) -> list[Cluster]:
        if not clusters:
            return []
        params = OVERLAP_PARAMS[cluster_type]
        by_id = {c.id: c for c in clusters}
        uf = _UnionFind(by_id.keys())
        ids = list(by_id)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if _check_overlap(
                    by_id[a].bbox,
                    by_id[b].bbox,
                    overlap_threshold,
                    containment_threshold,
                ):
                    uf.union(a, b)
        result = []
        for group_ids in uf.groups().values():
            if len(group_ids) == 1:
                result.append(by_id[group_ids[0]])
                continue
            group = [by_id[cid] for cid in group_ids]
            best = self._select_best(group, params)
            for c in group:
                if c is not best:
                    best.cells.extend(c.cells)
            best.cells = _sort_cells(_dedup_cells(best.cells))
            result.append(best)
        return result

    # -- cells -----------------------------------------------------------

    def _assign_cells(self, clusters: list[Cluster], min_overlap: float = 0.2) -> list[Cluster]:
        for c in clusters:
            c.cells = []
        for cell in self.cells:
            if not cell.text.strip():
                continue
            if cell.bbox.area() <= 0:
                continue
            best_overlap = min_overlap
            best_cluster = None
            for cluster in clusters:
                overlap = cell.bbox.intersection_over_self(cluster.bbox)
                if overlap > best_overlap:
                    best_overlap = overlap
                    best_cluster = cluster
            if best_cluster is not None:
                best_cluster.cells.append(cell)
        for c in clusters:
            c.cells = _dedup_cells(c.cells)
        return clusters

    def _unassigned_cells(self, clusters: list[Cluster]) -> list[LCell]:
        assigned = {cell.index for c in clusters for cell in c.cells}
        return [c for c in self.cells if c.index not in assigned and c.text.strip()]

    def _adjust_bboxes(self, clusters: list[Cluster]) -> list[Cluster]:
        for cluster in clusters:
            if not cluster.cells:
                continue
            hull = BBox(
                l=min(c.bbox.l for c in cluster.cells),
                t=min(c.bbox.t for c in cluster.cells),
                r=max(c.bbox.r for c in cluster.cells),
                b=max(c.bbox.b for c in cluster.cells),
            )
            if cluster.label == TABLE:
                cluster.bbox = BBox(
                    l=min(cluster.bbox.l, hull.l),
                    t=min(cluster.bbox.t, hull.t),
                    r=max(cluster.bbox.r, hull.r),
                    b=max(cluster.bbox.b, hull.b),
                )
            else:
                cluster.bbox = hull
        return clusters

    # -- ordering --------------------------------------------------------

    def _sort_clusters(self, clusters: list[Cluster], mode: str | None = None) -> list[Cluster]:
        import sys

        mode = mode or self.sort_mode
        if mode == "id":
            return sorted(
                clusters,
                key=lambda c: (
                    min((cell.index for cell in c.cells), default=sys.maxsize),
                    c.bbox.t,
                    c.bbox.l,
                ),
            )
        if mode == "tblr":
            return sorted(clusters, key=lambda c: (c.bbox.t, c.bbox.l))
        if mode == "lrtb":
            return sorted(clusters, key=lambda c: (c.bbox.l, c.bbox.t))
        if mode == "input":
            return sorted(
                clusters,
                key=lambda c: self._input_order.get(c.id, len(self._input_order)),
            )
        return clusters
