"""S2CellUnion algebra, driver-side (s2cell_union.cc).

Normalize / Denormalize / Union / Intersection / Difference on sorted
lists of CID.  The DataFrame analogs live in operators/cellops.py.
"""

from __future__ import annotations

from .cid import CID, M64, MAX_LEVEL


def _are_siblings(a: CID, b: CID, c: CID, d: CID) -> bool:
    """AreSiblings (s2cell_union.cc:140-157)."""
    if (a.id ^ b.id ^ c.id) != d.id:
        return False
    mask = (d.lsb() << 1) & M64
    mask = ~(mask + (mask << 1)) & M64
    id_masked = d.id & mask
    return (
        (a.id & mask) == id_masked
        and (b.id & mask) == id_masked
        and (c.id & mask) == id_masked
        and not d.is_face()
    )


def normalize(ids: list[CID]) -> list[CID]:
    """S2CellUnion::Normalize (s2cell_union.cc:171-197): sort, dedupe
    contained cells, collapse complete sibling groups into parents."""
    ids = sorted(ids, key=lambda c: c.id)
    out: list[CID] = []
    for cid in ids:
        if out and out[-1].contains(cid):
            continue
        while out and cid.contains(out[-1]):
            out.pop()
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], cid):
            cid = cid.parent()
            del out[-3:]
        out.append(cid)
    return out


def denormalize(ids: list[CID], min_level: int, level_mod: int) -> list[CID]:
    """S2CellUnion::Denormalize (s2cell_union.cc:204-233)."""
    out: list[CID] = []
    for cid in ids:
        level = cid.level()
        new_level = max(min_level, level)
        if level_mod > 1:
            new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(MAX_LEVEL, new_level)
        if new_level == level:
            out.append(cid)
        else:
            end = cid.child_end(new_level)
            child = cid.child_begin(new_level)
            while child != end:
                out.append(child)
                child = child.next()
    return out


def union(a: list[CID], b: list[CID]) -> list[CID]:
    return normalize(list(a) + list(b))


def intersection(a: list[CID], b: list[CID]) -> list[CID]:
    """Exact port of the sorted-merge intersection with binary-search
    skipping (s2cell_union.cc:379-423)."""
    import bisect

    x = sorted(a, key=lambda c: c.id)
    y = sorted(b, key=lambda c: c.id)
    out: list[CID] = []
    i = j = 0
    while i < len(x) and j < len(y):
        imin = x[i].range_min()
        jmin = y[j].range_min()
        if imin.id > jmin.id:
            if x[i].id <= y[j].range_max().id:
                out.append(x[i])
                i += 1
            else:
                j = bisect.bisect_left(y, imin, j + 1)
                if x[i].id <= y[j - 1].range_max().id:
                    j -= 1
        elif jmin.id > imin.id:
            if y[j].id <= x[i].range_max().id:
                out.append(y[j])
                j += 1
            else:
                i = bisect.bisect_left(x, jmin, i + 1)
                if y[j].id <= x[i - 1].range_max().id:
                    i -= 1
        else:
            if x[i].id < y[j].id:
                out.append(x[i])
                i += 1
            else:
                out.append(y[j])
                j += 1
    return out


def contains_id(ids: list[CID], cid: CID) -> bool:
    import bisect

    i = bisect.bisect_left(ids, cid)
    if i < len(ids) and ids[i].range_min().id <= cid.id:
        return True
    return i > 0 and ids[i - 1].range_max().id >= cid.id


def difference(a: list[CID], b: list[CID]) -> list[CID]:
    """Recursive subdivide (s2cell_union.cc:424-448)."""
    b_sorted = sorted(b, key=lambda c: c.id)

    def intersects_any(cid: CID) -> bool:
        import bisect

        i = bisect.bisect_left(b_sorted, cid)
        if i < len(b_sorted) and b_sorted[i].range_min().id <= cid.range_max().id:
            return True
        return i > 0 and b_sorted[i - 1].range_max().id >= cid.range_min().id

    out: list[CID] = []

    def add_diff(cid: CID):
        if not intersects_any(cid):
            out.append(cid)
        elif not contains_id(b_sorted, cid):
            for k in range(4):
                add_diff(cid.child(k))

    for cid in sorted(a, key=lambda c: c.id):
        add_diff(cid)
    return normalize(out)


def from_begin_end(begin: CID, end: CID) -> list[CID]:
    """FromBeginEnd via maximum_tile (s2cell_union.cc:122-138)."""
    import numpy as np

    from . import cellid as K

    out: list[CID] = []
    cid = begin
    while cid.id < end.id:
        tile = CID(
            int(K.maximum_tile(np.uint64(cid.id), np.uint64(end.id)))
        )
        out.append(tile)
        cid = tile.range_max().next()
    return out


def expand_level(ids: list[CID], expand_level: int) -> list[CID]:
    """S2CellUnion::Expand(level) (s2cell_union.cc:454-469): buffer the
    union by one ring of neighbors at `expand_level` — the kNN/"within
    distance" ring-expansion primitive."""
    import numpy as np

    from . import cellid as K

    ids = sorted(ids, key=lambda c: c.id)
    level_lsb = CID.lsb_for_level(expand_level)
    output: list[CID] = []
    i = len(ids) - 1
    while i >= 0:
        cid = ids[i]
        if cid.lsb() < level_lsb:
            cid = cid.parent(expand_level)
            while i > 0 and cid.contains(ids[i - 1]):
                i -= 1
        output.append(cid)
        nbrs = K.all_neighbors(np.array([cid.id], dtype=np.uint64), expand_level)[0]
        output.extend(CID(int(n)) for n in nbrs)
        i -= 1
    return normalize(output)


def expand_radius(ids: list[CID], min_radius_rad: float, max_level_diff: int = 8) -> list[CID]:
    """S2CellUnion::Expand(min_radius, max_level_diff) (s2cell_union.cc:471-484)."""
    from . import metrics

    if not ids:
        return []
    min_level = min(c.level() for c in ids)
    radius_level = metrics.MIN_WIDTH.get_level_for_min_value(min_radius_rad)
    if radius_level == 0 and min_radius_rad > metrics.MIN_WIDTH.get_value(0):
        ids = expand_level(ids, 0)
    return expand_level(ids, min(min_level + max_level_diff, radius_level))


def leaf_cells_covered(ids: list[CID]) -> int:
    """LeafCellsCovered (s2cell_union.cc:487-494)."""
    return sum(1 << ((MAX_LEVEL - c.level()) << 1) for c in ids)


def is_valid(ids: list[CID]) -> bool:
    """S2CellUnion::IsValid (s2cell_union.cc:145-152): every id valid,
    sorted, and non-overlapping (prev.range_max < next.range_min)."""
    if ids and not ids[0].is_valid():
        return False
    for i in range(1, len(ids)):
        if not ids[i].is_valid():
            return False
        if ids[i - 1].range_max() >= ids[i].range_min():
            return False
    return True


def is_normalized(ids: list[CID]) -> bool:
    """S2CellUnion::IsNormalized: valid + no four siblings present."""
    if not is_valid(ids):
        return False
    for i in range(3, len(ids)):
        if _are_siblings(ids[i - 3], ids[i - 2], ids[i - 1], ids[i]):
            return False
    return True


def whole_sphere() -> list[CID]:
    """S2CellUnion::WholeSphere (s2cell_union.cc:69-73): the six faces."""
    return [CID.from_face(f) for f in range(6)]


def intersects(a: list[CID], b: list[CID]) -> bool:
    """S2CellUnion::Intersects: any cell of a intersects any of b."""
    return any(any(x.intersects(y) for y in b) for x in a)


def contains_union(a: list[CID], b: list[CID]) -> bool:
    """S2CellUnion::Contains(S2CellUnion): every cell of b is contained."""
    return all(contains_id(a, y) for y in b)


def intersection_id(ids: list[CID], cid: CID) -> list[CID]:
    """S2CellUnion::Intersection(S2CellId) (s2cell_union.cc:262-282)."""
    out: list[CID] = []
    if contains_id(ids, cid):
        out.append(cid)
    else:
        for x in ids:
            if cid.contains(x):
                out.append(x)
    return out


def to_string(ids: list[CID]) -> str:
    """S2CellUnion::ToString (s2cell_union.cc:568-577): token list capped
    at 500 entries with a ",..." suffix."""
    k_max = 500
    out = f"Size:{len(ids)} S2CellIds:" + ",".join(
        c.token() for c in ids[:k_max]
    )
    if len(ids) > k_max:
        out += ",..."
    return out
