"""DuckDB oracle-SQL generators for the driver's correctness gate.

Each generator emits ANSI-ish SQL (DuckDB dialect) that recomputes a
query's result *independently* of the engine: geometry constants (edge
normals, cross products, hyperplanes) are precomputed here in Python
with full double precision and embedded as literals (repr(float) is
read back bit-exactly), while the per-row arithmetic mirrors the NumPy
kernels operation-for-operation so double results agree bitwise except
for sub-ulp trig library differences.  Threshold comparisons (cap
membership, closest-edge radius filters) are GUARANTEED stable against
such differences: every generator that emits a `<`/`<=` against a
radius verifies at generation time that no scatter point lands within
LIBM_GUARD (1e-11, ~5 orders above any plausible cross-libm deviation
of these expressions) of the threshold, and raises instead of emitting
a fragile oracle (round-2 ADVICE #4 / round-3 directive 6).

These oracles verify the *spherical geometry core* — PIP joins,
closest-edge distances (s2edge_distances.cc semantics), loop measures
(s2loop_measures.h), kNN chord distances — with plain dot/cross-product
algebra that DuckDB executes, giving the driver a hard rows+schema+hash
signal instead of pytest-only coverage.
"""

from __future__ import annotations

import math

import numpy as np

DBL_EPSILON = 2.220446049250313e-16

# Deterministic global point scatter derived from the customer table —
# shared by the Spark queries and the SQL oracles (same formulas).
TILE_LAT = "((c_custkey * 7919) % 17000) / 100.0 - 85.0 + 0.005"
TILE_LNG = "((c_custkey * 104729) % 36000) / 100.0 - 180.0 + 0.005"

# Threshold-stability guard: the DuckDB and NumPy evaluations of an
# oracle expression can differ only through trig-library ulps on the
# point coordinates (+ - * / sqrt are IEEE-exact on both engines), a
# deviation of order 1e-15 on squared-chord quantities.  LIBM_GUARD
# leaves ~4 orders of margin on top of that.
LIBM_GUARD = 1e-11
# Scatter keys covered by the generation-time check — superset of every
# driver scale factor's c_custkey range (sf0.1 has 15 000 customers).
GUARD_KEYS = 20_000


def scatter_xyz(n_keys: int = GUARD_KEYS) -> np.ndarray:
    """The customer scatter's unit vectors for keys 1..n_keys, computed
    with the same kernel ops as the Spark side (TILE_LAT/TILE_LNG are
    exact integer/decimal arithmetic — only the trig differs by ulps)."""
    from ..kernel.coords import latlng_to_xyz

    keys = np.arange(1, n_keys + 1, dtype=np.int64)
    lat = ((keys * 7919) % 17000) / 100.0 - 85.0 + 0.005
    lng = ((keys * 104729) % 36000) / 100.0 - 180.0 + 0.005
    x, y, z = latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], -1)


def verify_threshold_margin(
    values: np.ndarray, limit: float, what: str, guard: float = LIBM_GUARD
) -> None:
    """Raise unless every |value − limit| exceeds the libm guard — a
    membership comparison generated against this limit then cannot flip
    under any sub-guard evaluation difference between engines."""
    margin = float(np.abs(np.asarray(values, float) - limit).min())
    if margin <= guard:
        raise ValueError(
            f"oracle threshold fragile for {what}: a scatter point lies "
            f"{margin:.3e} from the limit {limit!r} (guard {guard:.0e}) — "
            "adjust the fixture radius so no point straddles the boundary"
        )


def pts_cte(limit: str | None = None) -> str:
    """(key, lat, lng, px, py, pz) rows from the customer table; xyz via
    the same operation order as kernel.coords.latlng_to_xyz."""
    where = f"WHERE {limit}" if limit else ""
    return f"""
    pts AS (
      SELECT c_custkey AS key, {TILE_LAT} AS lat, {TILE_LNG} AS lng
      FROM customer {where}),
    xyz AS (
      SELECT key, lat, lng,
             cos(radians(lng)) * cos(radians(lat)) AS px,
             sin(radians(lng)) * cos(radians(lat)) AS py,
             sin(radians(lat)) AS pz
      FROM pts)
    """


# --------------------------------------------------------------- face/i/j
def face_ij_sql(level: int) -> str:
    """SELECT-able CTE chain computing (face, i<level>, j<level>) from
    (px,py,pz) — the XYZtoFaceUV → UVtoST → STtoIJ tower (s2coords.h)
    with the quadratic projection, no Hilbert needed: (face,i,j) at a
    level is a bijection with the cell, so a histogram keyed by it
    verifies the whole from_latlng path including the Hilbert encode
    (a curve bug would scramble the decode on the Spark side)."""
    shift = 30 - level
    lim = 1 << 30
    return f"""
    fuv AS (
      SELECT key,
        CASE WHEN abs(px) > abs(py) THEN (CASE WHEN abs(px) > abs(pz) THEN 0 ELSE 2 END)
             ELSE (CASE WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END) END AS axis,
        px, py, pz FROM xyz),
    fuv2 AS (
      SELECT key,
        CASE WHEN axis = 0 AND px < 0 THEN 3
             WHEN axis = 1 AND py < 0 THEN 4
             WHEN axis = 2 AND pz < 0 THEN 5
             ELSE axis END AS face, px, py, pz FROM fuv),
    uv AS (
      SELECT key, face,
        CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py WHEN 2 THEN -px/pz
                  WHEN 3 THEN pz/px WHEN 4 THEN pz/py ELSE -py/pz END AS u,
        CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py WHEN 2 THEN -py/pz
                  WHEN 3 THEN py/px WHEN 4 THEN -px/py ELSE -px/pz END AS v
      FROM fuv2),
    st AS (
      SELECT key, face,
        CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
             ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s,
        CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v)
             ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t
      FROM uv),
    ij AS (
      SELECT key, face,
        least(trunc(CASE WHEN s > 0 THEN {float(lim)!r} * s ELSE 0.0 END)::BIGINT, {lim - 1}) AS i,
        least(trunc(CASE WHEN t > 0 THEN {float(lim)!r} * t ELSE 0.0 END)::BIGINT, {lim - 1}) AS j
      FROM st),
    fij AS (
      SELECT key, face, i >> {shift} AS i{level}, j >> {shift} AS j{level} FROM ij)
    """


# ----------------------------------------------------------- convex loops
def _loop_convex_sides(vertices: np.ndarray):
    """For a strictly convex loop: per-edge normals n_e = v_e × v_{e+1}
    and the common sign σ such that interior points satisfy
    σ·(p·n_e) > 0 for every edge.  Raises if the loop is not convex."""
    v = np.asarray(vertices, float).reshape(-1, 3)
    d = np.roll(v, -1, axis=0)
    normals = np.cross(v, d)
    centroid = v.sum(axis=0)
    centroid = centroid / np.linalg.norm(centroid)
    signs = np.sign(normals @ centroid)
    if not (np.all(signs > 0) or np.all(signs < 0)):
        raise ValueError("loop is not convex w.r.t. its vertex centroid")
    # verify convexity: every vertex on the non-negative side of every edge
    # (tolerance absorbs the ~1e-17 roundoff of vertices on their own edges)
    side = (v @ normals.T) * signs[None, :]
    if np.any(side < -1e-12):
        raise ValueError("loop is not convex")
    return normals, float(signs[0])


def convex_loop_contains_sql(
    vertices: np.ndarray, interior_is_small: bool, p=("px", "py", "pz")
) -> str:
    """Boolean SQL: point strictly inside the loop's interior region.
    `interior_is_small` False means the loop's interior is the complement
    of the small convex region (CW vertex order)."""
    normals, sigma = _loop_convex_sides(vertices)
    px, py, pz = p
    tests = []
    for n in normals:
        expr = f"({px}*{n[0]!r} + {py}*{n[1]!r} + {pz}*{n[2]!r})"
        tests.append(f"{expr} {'>' if sigma > 0 else '<'} 0.0")
    small = "(" + " AND ".join(tests) + ")"
    return small if interior_is_small else f"(NOT {small})"


def polygon_contains_sql(polygon, p=("px", "py", "pz")) -> str:
    """Even-odd polygon containment (XOR over loops) for polygons whose
    loops are all strictly convex small regions or their complements.
    Each loop's orientation is resolved against the kernel itself (does
    the loop contain its own vertex centroid?), so the SQL is an
    independent re-derivation, not a re-run of the kernel."""
    terms = []
    for loop in polygon.loops:
        v = loop.vertices
        centroid = v.sum(axis=0)
        centroid = centroid / np.linalg.norm(centroid)
        interior_is_small = bool(loop.contains(centroid[None])[0])
        terms.append(convex_loop_contains_sql(v, interior_is_small, p))
    if not terms:
        return "FALSE"
    acc = " + ".join(f"(CASE WHEN {t} THEN 1 ELSE 0 END)" for t in terms)
    return f"(({acc}) % 2 = 1)"


# ------------------------------------------------------ point↔edge dist2
def edge_dist2_sql(a: np.ndarray, b: np.ndarray, p=("px", "py", "pz")) -> str:
    """Squared-chord distance point→edge mirroring
    kernel.distance.point_edge_dist2 operation-for-operation
    (AlwaysUpdateMinInteriorDistance + vertex fallback,
    s2edge_distances.cc).  Edge constants are precomputed doubles."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    c = np.cross(a - b, a + b)  # RobustCrossProd stable tier (2·a×b)
    axc = np.cross(a, c)
    bxc = np.cross(b, c)
    c2 = float((c * c).sum())
    ab2 = float(((a - b) ** 2).sum())
    k1 = 4.75 * DBL_EPSILON
    k2 = 8 * DBL_EPSILON * DBL_EPSILON
    px, py, pz = p

    def dot(vec):
        return f"({px}*{vec[0]!r} + {py}*{vec[1]!r} + {pz}*{vec[2]!r})"

    def d2(vec):
        # parenthesize literals: "pz--0.17" would parse as a SQL comment
        return (
            f"(({px}-({vec[0]!r}))*({px}-({vec[0]!r}))"
            f" + ({py}-({vec[1]!r}))*({py}-({vec[1]!r}))"
            f" + ({pz}-({vec[2]!r}))*({pz}-({vec[2]!r})))"
        )

    xa2, xb2 = d2(a), d2(b)
    vertex = f"least({xa2}, {xb2})"
    maybe = f"(abs({xa2} - {xb2}) < {ab2!r} + ({k1!r} * ({xa2} + {xb2} + {ab2!r}) + {k2!r}))"
    w1 = dot(axc)
    w2 = dot(bxc)
    xdc = dot(c)
    ratio = f"least(greatest(({xdc} * {xdc}) / {c2!r}, 0.0), 1.0)"
    # cx = c × x per point; qr from |c×x|²/|c|² directly (the kernel's
    # reference-parity form, s2edge_distances.cc:180-188)
    cx0 = f"({c[1]!r}*{pz} - ({c[2]!r})*{py})"
    cx1 = f"({c[2]!r}*{px} - ({c[0]!r})*{pz})"
    cx2_ = f"({c[0]!r}*{py} - ({c[1]!r})*{px})"
    cx_n2 = f"({cx0}*{cx0} + {cx1}*{cx1} + {cx2_}*{cx2_})"
    qr = f"(1.0 - sqrt(least(greatest({cx_n2} / {c2!r}, 0.0), 1.0)))"
    interior_d2 = f"({ratio} + {qr} * {qr})"
    cond = f"({maybe} AND {w1} < 0 AND {w2} > 0 AND {c2!r} > 0)"
    return f"(CASE WHEN {cond} THEN least({interior_d2}, {vertex}) ELSE {vertex} END)"


def closest_edges_sql(
    shapes,
    k: int,
    max_distance_rad: float | None,
    include_interiors: bool,
    pts_where: str | None = None,
) -> str:
    """Full oracle for closest_edges_join over the customer scatter:
    candidates = per-(point, edge) dist2 UNION interior hits (edge_id -1,
    dist 0), ranked by (dist2, shape_id, edge_id)."""
    limit2 = None
    if max_distance_rad is not None:
        s = 2 * math.sin(0.5 * min(math.pi, max_distance_rad))
        limit2 = s * s
        # generation-time stability guarantee: no scatter point may sit
        # within LIBM_GUARD of the radius threshold for any edge
        from ..kernel.distance import point_edge_dist2

        P = scatter_xyz()
        for shape in shapes:
            d2 = point_edge_dist2(P, shape.edges_c, shape.edges_d)
            verify_threshold_margin(
                d2.ravel(), limit2, f"closest_edges shape {shape.shape_id}"
            )
    # edge hits use a strict < on the limit, interior hits always pass
    selects = []
    for shape in shapes:
        for e in range(len(shape.edges_c)):
            expr = edge_dist2_sql(shape.edges_c[e], shape.edges_d[e])
            w = f" WHERE {expr} < {limit2!r}" if limit2 is not None else ""
            selects.append(
                f"SELECT key, {shape.shape_id} AS shape_id, {e} AS edge_id,"
                f" {expr} AS dist2 FROM xyz{w}"
            )
        if include_interiors and shape.polygon is not None:
            inside = polygon_contains_sql(shape.polygon)
            selects.append(
                f"SELECT key, {shape.shape_id} AS shape_id, -1 AS edge_id,"
                f" 0.0 AS dist2 FROM xyz WHERE {inside}"
            )
    cand = " UNION ALL ".join(selects)
    return f"""
    WITH {pts_cte(pts_where)},
    cand AS ({cand}),
    ranked AS (
      SELECT key, shape_id, edge_id, dist2,
             row_number() OVER (PARTITION BY key
                                ORDER BY dist2, shape_id, edge_id) AS rn
      FROM cand)
    SELECT key, shape_id, edge_id, round(dist2, 12) AS dist2_r
    FROM ranked WHERE rn <= {k}
    ORDER BY key, shape_id, edge_id
    """


# ------------------------------------------------------------ loop terms
def _stable_angle_sql(a=("ax", "ay", "az"), b=("bx", "by", "bz")) -> str:
    """Kahan stable angle 2·atan2(|an-bn|, |an+bn|) with explicit
    normalization, mirroring kernel.measures.stable_angle."""

    def norm(v):
        return f"sqrt({v[0]}*{v[0]} + {v[1]}*{v[1]} + {v[2]}*{v[2]})"

    na, nb = norm(a), norm(b)
    terms_m = " + ".join(
        f"({a[i]}/{na} - {b[i]}/{nb})*({a[i]}/{na} - {b[i]}/{nb})" for i in range(3)
    )
    terms_p = " + ".join(
        f"({a[i]}/{na} + {b[i]}/{nb})*({a[i]}/{na} + {b[i]}/{nb})" for i in range(3)
    )
    return f"2.0 * atan2(sqrt({terms_m}), sqrt({terms_p}))"


def loop_measures_sql(named_loops) -> str:
    """Oracle for loop_measures: per-edge signed-area terms via the
    van Oosterom–Strackee closed form 2·atan2(det, 1 + n·c + c·d + d·n)
    with n = north pole — an independent formula from the kernel's
    l'Huilier/Girard port (equal to ~1e-15 per term; outputs rounded to
    1e-9).  Perimeter matches Kahan's stable angle exactly."""
    rows = []
    for loop_id, verts in named_loops:
        v = np.asarray(verts, float).reshape(-1, 3)
        d = np.roll(v, -1, axis=0)
        for i in range(len(v)):
            rows.append(
                f"('{loop_id}', {v[i][0]!r}, {v[i][1]!r}, {v[i][2]!r},"
                f" {d[i][0]!r}, {d[i][1]!r}, {d[i][2]!r})"
            )
    values = ", ".join(rows)
    det = "(cx*dy - cy*dx)"
    denom = "(1.0 + cz + (cx*dx + cy*dy + cz*dz) + dz)"
    angle = _stable_angle_sql(("cx", "cy", "cz"), ("dx", "dy", "dz"))
    two_pi = 2 * math.pi
    four_pi = 4 * math.pi
    return f"""
    WITH edges(loop_id, cx, cy, cz, dx, dy, dz) AS (VALUES {values}),
    terms AS (
      SELECT loop_id,
             2.0 * atan2({det}, {denom}) AS area_term,
             {angle} AS edge_len
      FROM edges),
    agg AS (
      SELECT loop_id, sum(area_term) AS raw, sum(edge_len) AS perimeter
      FROM terms GROUP BY loop_id),
    folded AS (
      SELECT loop_id,
             CASE WHEN fmod(raw, {four_pi!r}) < 0
                  THEN fmod(raw, {four_pi!r}) + {four_pi!r}
                  ELSE fmod(raw, {four_pi!r}) END AS pm, perimeter
      FROM agg),
    signed AS (
      SELECT loop_id,
             CASE WHEN pm > {two_pi!r} THEN pm - {four_pi!r} ELSE pm END AS s,
             perimeter
      FROM folded)
    SELECT loop_id,
           round(CASE WHEN s < 0 THEN s + {four_pi!r} ELSE s END, 9) AS area_r,
           round(perimeter, 9) AS perimeter_r
    FROM signed ORDER BY loop_id
    """


# ------------------------------------------------------------------- kNN
def knn_sql(queries, k: int) -> str:
    """Exact brute-force kNN over the customer scatter; queries is a list
    of (query_id, lat_deg, lng_deg).  Query xyz embedded as the same
    doubles the Spark side computes (kernel latlng_to_xyz)."""
    from ..kernel.coords import latlng_to_xyz

    rows = []
    for qid, lat, lng in queries:
        x, y, z = latlng_to_xyz(np.float64(lat), np.float64(lng))
        rows.append(f"('{qid}', {float(x)!r}, {float(y)!r}, {float(z)!r})")
    values = ", ".join(rows)
    return f"""
    WITH {pts_cte()},
    q(query_id, qx, qy, qz) AS (VALUES {values}),
    scored AS (
      SELECT query_id, key,
             (px-qx)*(px-qx) + (py-qy)*(py-qy) + (pz-qz)*(pz-qz) AS chord2
      FROM xyz CROSS JOIN q),
    ranked AS (
      SELECT query_id, key, chord2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY chord2, key) AS rn
      FROM scored)
    SELECT query_id, key,
           round(2.0 * asin(0.5 * sqrt(least(chord2, 4.0))), 9) AS dist_rad_r
    FROM ranked WHERE rn <= {k}
    ORDER BY query_id, dist_rad_r, key
    """


# -------------------------------------------------------------- PIP join
def pip_join_sql(polygons) -> str:
    """Per-polygon containment counts over the customer scatter; each
    fixture polygon's loops are convex, so containment is a pure
    side-test conjunction (XOR across loops for holes)."""
    selects = []
    for pid, poly in polygons:
        cond = polygon_contains_sql(poly)
        selects.append(
            f"SELECT '{pid}' AS polygon_id, count(*) AS n_points"
            f" FROM xyz WHERE {cond}"
        )
    body = " UNION ALL ".join(selects)
    return f"""
    WITH {pts_cte()}
    SELECT * FROM ({body}) WHERE n_points > 0 ORDER BY polygon_id
    """


# --------------------------------------------------------------- sign-LSH
def _dlist(row) -> str:
    return "[" + ", ".join(repr(float(v)) for v in row) + "]"


_DDOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')"
)


def _cos_sql(a: str, b: str, round_digits: int = 6) -> str:
    return (
        f"round({_DDOT.format(a=a, b=b)} / "
        f"(sqrt({_DDOT.format(a=a, b=a)}) * sqrt({_DDOT.format(a=b, b=b)})), {round_digits})"
    )


def _cos_raw_sql(a: str, b: str) -> str:
    """Unrounded sequential-fold cosine — bit-identical to the Spark
    expression form (list_aggregate 'sum' ≍ F.aggregate), used where an
    ORDERING must agree across engines without a rounding rule."""
    return (
        f"{_DDOT.format(a=a, b=b)} / "
        f"(sqrt({_DDOT.format(a=a, b=a)}) * sqrt({_DDOT.format(a=b, b=b)}))"
    )


def lsh_bucket_sql(emb: str, planes: np.ndarray) -> str:
    """Sign-LSH bucket id mirroring operators.similarity.lsh_bucket_expr:
    per-bit sequential-fold dot against the ±1 hyperplane (embedded as
    literals), sign → bit.  list_aggregate('sum') is a sequential left
    fold in DuckDB, bit-identical to Spark's F.aggregate."""
    terms = []
    for j, row in enumerate(planes):
        dot = (
            f"list_aggregate(list_transform(list_zip({emb}, {_dlist(row)}),"
            f" p -> p[1]::DOUBLE * p[2]), 'sum')"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def ann_lsh_sql(
    n_queries: int = 10, k: int = 5, bits: int = 6, dim: int = 64,
    multiprobe: bool = True,
) -> str:
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits)
    bucket = lsh_bucket_sql("embedding", planes)
    if multiprobe:
        probes = (
            "SELECT query_id, q_emb, "
            "CASE WHEN f = 0 THEN q_bucket ELSE xor(q_bucket, (1::BIGINT << (f - 1))) END AS q_bucket "
            f"FROM q, (SELECT unnest(generate_series(0, {bits})) AS f)"
        )
    else:
        probes = "SELECT query_id, q_emb, q_bucket FROM q"
    cos = _cos_sql("q_emb", "c_emb")
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
          FROM b WHERE vec_id < {n_queries}),
    probes AS ({probes}),
    c AS (SELECT vec_id AS cand_id, embedding AS c_emb, bucket AS c_bucket FROM b),
    scored AS (
      SELECT query_id, cand_id, {cos} AS cosine
      FROM c JOIN probes ON c_bucket = q_bucket AND cand_id <> query_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored)
    SELECT query_id, cand_id, cosine, rank::INT AS rank
    FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def ann_ivf_sql(
    n_queries: int = 10, k: int = 5, n_centroids: int = 8, nprobe: int = 2
) -> str:
    """Relational mirror of operators.similarity.ann_ivf_topk: the same
    md5-sampled codebook (ORDER BY md5(vec_id) LIMIT C, ids in vec_id
    order), nearest-list assignment and probe selection as row_number
    windows over the cosines (score desc, centroid id asc — the
    array_position-first-max / (−score, id) sort rules), then the shared
    re-rank shape.  Assignment/probe scores are UNROUNDED — the
    sequential fold is bit-identical across engines, so the windows
    order identically."""
    cos_assign = _cos_raw_sql("e.embedding", "c.cent_emb")
    cos = _cos_sql("q_emb", "c_emb")
    return f"""
    WITH sel AS (
      SELECT vec_id, embedding FROM embeddings
      ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {n_centroids}),
    cent AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid,
             embedding AS cent_emb
      FROM sel),
    sa AS (
      SELECT e.vec_id, e.embedding, c.cid, {cos_assign} AS cs
      FROM embeddings e CROSS JOIN cent c),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, cid ASC) AS rn
        FROM sa)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, embedding AS q_emb, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, cid ASC) AS rn
        FROM sa WHERE vec_id < {n_queries})
      WHERE rn <= {nprobe}),
    c AS (SELECT vec_id AS cand_id, embedding AS c_emb, cid FROM assign),
    scored AS (
      SELECT query_id, cand_id, {cos} AS cosine
      FROM c JOIN probes USING (cid) WHERE cand_id <> query_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored)
    SELECT query_id, cand_id, cosine, rank::INT AS rank
    FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


_D2_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE)),"
    " 'sum')"
)


def ann_pq_sql(
    n_queries: int = 10,
    k: int = 5,
    n_codewords: int = 8,
    m_subspaces: int = 4,
    r_candidates: int = 20,
    dim: int = 64,
) -> str:
    """Relational mirror of operators.similarity.ann_pq_topk: the same
    md5-sampled codebook split into per-subspace codewords, argmin-d2
    encoding as a row_number window (d2 asc, code asc — the
    first-min/smaller-id rule), and the ADC scan written as the same
    j-ascending left-associated m-term sum (one cw join per subspace, m
    is a literal), so candidate sets and ranks agree bit-for-bit with
    the Spark expression plan.  Sub-d2 and sub-dot folds are UNROUNDED;
    only the re-rank cosine is rounded, like the other ANN oracles."""
    dsub = dim // m_subspaces
    m = m_subspaces
    d2 = _D2_SQL.format(
        a=f"e.embedding[w.j*{dsub}+1 : w.j*{dsub}+{dsub}]", b="w.sub"
    )
    code_cols = ",\n             ".join(
        f"max(CASE WHEN j = {j} THEN code END) AS c{j}" for j in range(m)
    )
    pair_codes = ", ".join(f"cp.c{j}" for j in range(m))
    cw_joins = "\n      ".join(
        f"JOIN cw w{j} ON w{j}.j = {j} AND w{j}.cid = p.c{j}"
        for j in range(m)
    )
    adc = " + ".join(
        "("
        + _DDOT.format(
            a=f"p.q_emb[{j * dsub + 1}:{j * dsub + dsub}]", b=f"w{j}.sub"
        )
        + ")"
        for j in range(m)
    )
    cos = _cos_sql("q_emb", "c_emb")
    return f"""
    WITH sel AS (
      SELECT vec_id, embedding FROM embeddings
      ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {n_codewords}),
    cent AS (
      SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid,
             embedding AS cent_emb
      FROM sel),
    js AS (SELECT unnest(generate_series(0, {m - 1}))::INT AS j),
    cw AS (
      SELECT c.cid, js.j,
             c.cent_emb[js.j*{dsub}+1 : js.j*{dsub}+{dsub}] AS sub
      FROM cent c CROSS JOIN js),
    sa AS (
      SELECT e.vec_id, w.j, w.cid, {d2} AS d2
      FROM embeddings e CROSS JOIN cw w),
    codes AS (
      SELECT vec_id, j, cid AS code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, j
                                     ORDER BY d2 ASC, cid ASC) AS rn
        FROM sa)
      WHERE rn = 1),
    cp AS (
      SELECT vec_id,
             {code_cols}
      FROM codes GROUP BY vec_id),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb
          FROM embeddings WHERE vec_id < {n_queries}),
    p AS (
      SELECT q.query_id, q.q_emb, e.vec_id AS cand_id,
             e.embedding AS c_emb, {pair_codes}
      FROM cp JOIN embeddings e USING (vec_id) CROSS JOIN q
      WHERE e.vec_id <> q.query_id),
    adc AS (
      SELECT p.query_id, p.q_emb, p.cand_id, p.c_emb,
             {adc} AS adc
      FROM p
      {cw_joins}),
    cand AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc DESC, cand_id ASC) AS arank
        FROM adc)
      WHERE arank <= {r_candidates}),
    scored AS (SELECT query_id, cand_id, {cos} AS cosine FROM cand),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored)
    SELECT query_id, cand_id, cosine, rank::INT AS rank
    FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def near_dup_sql(threshold: float, bits: int = 8, dim: int = 64) -> str:
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits)
    bucket = lsh_bucket_sql("embedding", planes)
    cos = _cos_sql("a.embedding", "b.embedding")
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}
    ORDER BY vec_a, vec_b
    """


# ------------------------------------------------------------- multimodal
def multimodal_sql(n: int) -> str:
    """Oracle for the deterministic fake-media feature pipeline: payload
    'MEDIA<id>' → sha256 digest bytes / 255 as the feature vector, norm
    formatted to 6 decimals (mirrors operators.multimodal._decode_stub)."""
    return f"""
    WITH m AS (SELECT unnest(generate_series(0, {n - 1})) AS media_id),
    base AS (
      SELECT media_id,
        CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        'MEDIA' || media_id AS payload
      FROM m),
    h AS (
      SELECT media_id, kind, length(payload)::BIGINT AS n_bytes,
             sha256(payload) AS hx
      FROM base),
    feats AS (
      SELECT media_id, kind, n_bytes,
        list_transform(generate_series(0, 31),
                       i -> (('0x' || substr(hx, i*2 + 1, 2))::INT)::DOUBLE / 255.0) AS f
      FROM h)
    SELECT media_id, kind, n_bytes, 32::INT AS feat_dim,
           printf('%.6f', sqrt(list_aggregate(list_transform(f, v -> v*v), 'sum'))) AS feat_norm
    FROM feats ORDER BY media_id
    """


# ------------------------------------------------------- polyline project
def polyline_project_sql(vertices: np.ndarray, round_digits: int = 9) -> str:
    """Oracle for project_points_onto_polyline: per scatter point the
    fraction along the polyline of its projection
    (S2Polyline::Project + UnInterpolate, s2polyline.cc:278-325),
    mirrored as per-segment closed forms: n = (a×b)/|a×b| precomputed,
    p = ((n×x)×n)/|…|, interior wedge test with a×n / b×n literals,
    vertex fallback, then argmin over segments by the exact point-edge
    distance."""
    from ..kernel.measures import stable_angle

    v = np.asarray(vertices, float).reshape(-1, 3)
    seg = stable_angle(v[:-1], v[1:])
    total = float(seg.sum())
    cums = [0.0]
    for s in seg[:-1]:
        cums.append(cums[-1] + float(s))

    selects = []
    for i in range(len(v) - 1):
        a, b = v[i], v[i + 1]
        n = np.cross(a, b)
        n = n / np.linalg.norm(n)
        axn = np.cross(a, n)
        bxn = np.cross(b, n)
        d2 = edge_dist2_sql(a, b)
        # p = ((n×x)×n) normalized
        cx = f"({n[1]!r}*pz - {n[2]!r}*py)"
        cy = f"({n[2]!r}*px - {n[0]!r}*pz)"
        cz = f"({n[0]!r}*py - {n[1]!r}*px)"
        qx = f"({cy}*{n[2]!r} - {cz}*{n[1]!r})"
        qy = f"({cz}*{n[0]!r} - {cx}*{n[2]!r})"
        qz = f"({cx}*{n[1]!r} - {cy}*{n[0]!r})"
        qn = f"sqrt({qx}*{qx} + {qy}*{qy} + {qz}*{qz})"
        ix, iy, iz = f"({qx}/{qn})", f"({qy}/{qn})", f"({qz}/{qn})"
        interior = (
            f"(({ix}*{axn[0]!r} + {iy}*{axn[1]!r} + {iz}*{axn[2]!r}) < 0"
            f" AND ({ix}*{bxn[0]!r} + {iy}*{bxn[1]!r} + {iz}*{bxn[2]!r}) > 0)"
        )
        xa2 = (
            f"((px-({a[0]!r}))*(px-({a[0]!r})) + (py-({a[1]!r}))*(py-({a[1]!r}))"
            f" + (pz-({a[2]!r}))*(pz-({a[2]!r})))"
        )
        xb2 = (
            f"((px-({b[0]!r}))*(px-({b[0]!r})) + (py-({b[1]!r}))*(py-({b[1]!r}))"
            f" + (pz-({b[2]!r}))*(pz-({b[2]!r})))"
        )
        def pick(ii, va, vb):
            return (
                f"CASE WHEN {interior} THEN {ii}"
                f" WHEN {xa2} <= {xb2} THEN {va!r} ELSE {vb!r} END"
            )
        selects.append(
            f"SELECT key, {i} AS seg, {d2} AS d2,"
            f" {pick(ix, a[0], b[0])} AS gx,"
            f" {pick(iy, a[1], b[1])} AS gy,"
            f" {pick(iz, a[2], b[2])} AS gz"
            f" FROM xyz"
        )
    cand = " UNION ALL ".join(selects)
    cum_case = " ".join(
        f"WHEN seg = {i} THEN {cums[i]!r}" for i in range(len(v) - 1)
    )
    va_x = " ".join(f"WHEN seg = {i} THEN {v[i][0]!r}" for i in range(len(v) - 1))
    va_y = " ".join(f"WHEN seg = {i} THEN {v[i][1]!r}" for i in range(len(v) - 1))
    va_z = " ".join(f"WHEN seg = {i} THEN {v[i][2]!r}" for i in range(len(v) - 1))
    angle = _stable_angle_sql(("vax", "vay", "vaz"), ("gx", "gy", "gz"))
    return f"""
    WITH {pts_cte()},
    cand AS ({cand}),
    best AS (
      SELECT key, seg, gx, gy, gz,
             row_number() OVER (PARTITION BY key ORDER BY d2, seg) AS rn
      FROM cand),
    sel AS (
      SELECT key, seg, gx, gy, gz,
             CASE {cum_case} END AS cum,
             CASE {va_x} END AS vax,
             CASE {va_y} END AS vay,
             CASE {va_z} END AS vaz
      FROM best WHERE rn = 1)
    SELECT key,
           round(gx, {round_digits}) AS proj_x_r,
           round(gy, {round_digits}) AS proj_y_r,
           round(gz, {round_digits}) AS proj_z_r,
           round(least(1.0, (cum + {angle}) / {total!r}), {round_digits}) AS fraction_r
    FROM sel ORDER BY key
    """


# -------------------------------------------------------------- rasterize
def rasterize_sql(polygon, level: int) -> str:
    """Center-sampling rasterization oracle: enumerate the (face, i, j)
    grid, compute cell centers with the trig-free tower (st→uv→xyz,
    mirrored operation-for-operation), keep centers inside the convex
    polygon (side tests)."""
    n_side = 1 << level
    total = 6 * n_side * n_side
    st_uv = (
        "CASE WHEN {s} >= 0.5 THEN (1.0/3.0) * (4.0*{s}*{s} - 1.0)"
        " ELSE (1.0/3.0) * (1.0 - 4.0*(1.0-{s})*(1.0-{s})) END"
    )
    inside = polygon_contains_sql(polygon, p=("cx", "cy", "cz"))
    return f"""
    WITH g AS (
      SELECT (t.id // {n_side * n_side})::INT AS face,
             ((t.id // {n_side}) % {n_side})::BIGINT AS i,
             (t.id % {n_side})::BIGINT AS j
      FROM range({total}) AS t(id)),
    st AS (
      SELECT face, i, j,
             (i + 0.5) / {float(n_side)!r} AS s,
             (j + 0.5) / {float(n_side)!r} AS t
      FROM g),
    uv AS (
      SELECT face, i, j,
             {st_uv.format(s='s')} AS u,
             {st_uv.format(s='t')} AS v
      FROM st),
    xyz0 AS (
      SELECT face, i, j,
        CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -u WHEN 2 THEN -u
                  WHEN 3 THEN -1.0 WHEN 4 THEN v ELSE v END AS x,
        CASE face WHEN 0 THEN u WHEN 1 THEN 1.0 WHEN 2 THEN -v
                  WHEN 3 THEN -v WHEN 4 THEN -1.0 ELSE u END AS y,
        CASE face WHEN 0 THEN v WHEN 1 THEN v WHEN 2 THEN 1.0
                  WHEN 3 THEN -u WHEN 4 THEN -u ELSE -1.0 END AS z
      FROM uv),
    c AS (
      SELECT face, i, j,
             x / sqrt(x*x + y*y + z*z) AS cx,
             y / sqrt(x*x + y*y + z*z) AS cy,
             z / sqrt(x*x + y*y + z*z) AS cz
      FROM xyz0)
    SELECT face, i, j FROM c WHERE {inside}
    ORDER BY face, i, j
    """


# ----------------------------------------------------- chain interpolate
def polyline_interpolate_sql(
    vertices: np.ndarray, frac_expr: str = "((key % 1000)) / 1000.0",
    round_digits: int = 9,
) -> str:
    """Oracle for S2ChainInterpolationQuery semantics
    (kernel.measures.polyline_interpolate, s2polyline.h:158-236): per
    scatter key, the point at fraction f along the fixed polyline —
    segment selection by the kernel's cumulative-length walk, then slerp
    with per-segment angle literals (sin() parity with NumPy verified)."""
    from ..kernel.measures import stable_angle

    v = np.asarray(vertices, float).reshape(-1, 3)
    seg = stable_angle(v[:-1], v[1:])
    # mirror the kernel's sequential accumulation exactly
    cums_after = []
    acc = 0.0
    for d in seg:
        cums_after.append(acc + float(d))
        acc = acc + float(d)
    total = float(seg.sum())  # kernel uses seg.sum() for the total
    n = len(seg)

    seg_case = "CASE " + " ".join(
        f"WHEN {cums_after[i]!r} >= target THEN {i}" for i in range(n - 1)
    ) + f" ELSE {n - 1} END"

    def comp_case(coord: int) -> str:
        whens = []
        for i in range(n):
            a, b = v[i], v[i + 1]
            omega = float(seg[i])
            acc_before = cums_after[i] - float(seg[i])
            t = f"CASE WHEN {omega!r} = 0 THEN 0.0 ELSE (target - ({acc_before!r})) / {omega!r} END"
            sa = f"(sin((1.0 - ({t})) * {omega!r}) / sin({omega!r}))"
            sb = f"(sin(({t}) * {omega!r}) / sin({omega!r}))"
            whens.append(
                f"WHEN seg = {i} THEN {sa} * ({a[coord]!r}) + {sb} * ({b[coord]!r})"
            )
        return "CASE " + " ".join(whens) + " END"

    ox, oy, oz = comp_case(0), comp_case(1), comp_case(2)
    return f"""
    WITH pts AS (
      SELECT c_custkey AS key FROM customer),
    f AS (
      SELECT key,
             least(greatest({frac_expr}, 0.0), 1.0) * {total!r} AS target
      FROM pts),
    s AS (SELECT key, target, {seg_case} AS seg FROM f),
    o AS (SELECT key, {ox} AS ox, {oy} AS oy, {oz} AS oz FROM s)
    SELECT key,
           round(ox / sqrt(ox*ox + oy*oy + oz*oz), {round_digits}) AS px_r,
           round(oy / sqrt(ox*ox + oy*oy + oz*oz), {round_digits}) AS py_r,
           round(oz / sqrt(ox*ox + oy*oy + oz*oz), {round_digits}) AS pz_r
    FROM o ORDER BY key
    """


# ------------------------------------------- overlay / winding area oracles
_TWO_PI = 2 * math.pi
_FOUR_PI = 4 * math.pi


def _parse_latlng_loop(s: str) -> list[tuple[float, float]]:
    return [
        (float(p.split(":")[0]), float(p.split(":")[1]))
        for p in s.split(",")
        if p.strip()
    ]


def _area_fold_ctes(edges: str, out: str) -> str:
    """CTE chain: edge table ``edges(grp, loop_id, sgn, cx..dz)`` →
    ``out(grp, area)``; per-loop Oosterom–Strackee sum folded into
    (-2π, 2π] exactly like kernel.measures.normalize_signed_area, then
    summed per grp weighted by the depth sign (holes subtract —
    S2Polygon::GetArea semantics, s2polygon.cc:550-562)."""
    det = "(cx*dy - cy*dx)"
    denom = "(1.0 + cz + (cx*dx + cy*dy + cz*dz) + dz)"
    return f"""
    {out}_raw AS (
      SELECT grp, loop_id, sgn,
             sum(2.0 * atan2({det}, {denom})) AS raw
      FROM {edges} GROUP BY grp, loop_id, sgn),
    {out}_fold AS (
      SELECT grp, sgn,
             CASE WHEN pm > {_TWO_PI!r} THEN pm - {_FOUR_PI!r} ELSE pm END AS s
      FROM (SELECT grp, sgn,
              CASE WHEN fmod(raw, {_FOUR_PI!r}) < 0
                   THEN fmod(raw, {_FOUR_PI!r}) + {_FOUR_PI!r}
                   ELSE fmod(raw, {_FOUR_PI!r}) END AS pm
            FROM {out}_raw)),
    {out} AS (SELECT grp, sum(sgn * s) AS area FROM {out}_fold GROUP BY grp)
    """


def _xyz_edge_values(rows) -> str:
    """VALUES rows for (grp, loop_id, sgn, vertex-array) loops with the
    loop edges as full-precision double literals."""
    parts = []
    for grp, loop_id, sgn, verts in rows:
        v = np.asarray(verts, float).reshape(-1, 3)
        d = np.roll(v, -1, axis=0)
        for i in range(len(v)):
            parts.append(
                f"('{grp}', {loop_id}, {sgn}, {v[i][0]!r}, {v[i][1]!r},"
                f" {v[i][2]!r}, {d[i][0]!r}, {d[i][1]!r}, {d[i][2]!r})"
            )
    return ", ".join(parts)


def _latlng_edges_cte(name: str, rows) -> str:
    """Edge table computed IN SQL from (lat, lng) degree literals — an
    input-side area source fully independent of the Python kernels
    (rows: (grp, loop_id, [(lat, lng), ...]))."""
    vals = []
    for grp, loop_id, ll in rows:
        n = len(ll)
        for i in range(n):
            a, b = ll[i], ll[(i + 1) % n]
            vals.append(
                f"('{grp}', {loop_id}, 1, {a[0]!r}, {a[1]!r}, {b[0]!r}, {b[1]!r})"
            )
    values = ", ".join(vals)
    return f"""
    {name}_ll(grp, loop_id, sgn, alat, alng, blat, blng) AS (VALUES {values}),
    {name} AS (
      SELECT grp, loop_id, sgn,
             cos(radians(alng))*cos(radians(alat)) AS cx,
             sin(radians(alng))*cos(radians(alat)) AS cy,
             sin(radians(alat)) AS cz,
             cos(radians(blng))*cos(radians(blat)) AS dx,
             sin(radians(blng))*cos(radians(blat)) AS dy,
             sin(radians(blat)) AS dz
      FROM {name}_ll)
    """


def _os_term(c, d) -> str:
    det = f"({c[0]}*{d[1]} - {c[1]}*{d[0]})"
    den = (
        f"(1.0 + {c[2]} + ({c[0]}*{d[0]} + {c[1]}*{d[1]} + {c[2]}*{d[2]})"
        f" + {d[2]})"
    )
    return f"2.0*atan2({det}, {den})"


def _tri_area_sql(p, q, r) -> str:
    """Signed spherical area of triangle (p,q,r) via the north-pole
    Oosterom–Strackee per-edge closed form (sum of three edge terms)."""
    return f"({_os_term(p, q)} + {_os_term(q, r)} + {_os_term(r, p)})"


def boolean_fixture_sql(
    fixtures, ops=("difference", "intersection", "union"), tol: float = 1e-9,
    degeneracies: bool = False, snapped: bool = False,
) -> str:
    """Oracle for boolean_ops_join over hole-free input polygons.

    The engine's output loops are pinned as double literals (the same
    precedent as the cap-filter oracle), but the area column is
    RECOMPUTED in DuckDB via the Oosterom–Strackee excess SQL, and the
    whole result is gated on independent closed-form identities whose
    right-hand sides come only from the INPUT vertices (computed in SQL
    from the lat:lng degree literals):

        area(a∩b) + area(a∪b) = area(a) + area(b)      (inclusion–exclusion)
        area(a−b)            = area(a) − area(a∩b)
        area(aΔb)            = area(a) + area(b) − 2·area(a∩b)

    If any identity fails, the gating WHERE drops every row and the
    driver records a mismatch — so a wrong overlay (geometry OR area)
    cannot pass."""
    from ..kernel import booleans as B
    from ..kernel import measures as M
    from ..kernel.contains import parse_polygon

    fns = {
        "intersection": B.intersection,
        "union": B.union,
        "difference": B.difference,
        "symmetric_difference": B.symmetric_difference,
    }
    out_rows, meta_rows, in_rows, pairs = [], [], [], []
    for pair, sa, sb in fixtures:
        pairs.append(pair)
        pa, pb = parse_polygon(sa), parse_polygon(sb)
        for side, txt in (("a", sa), ("b", sb)):
            for li, loop_s in enumerate(txt.split(";")):
                in_rows.append((f"{pair}|{side}", li, _parse_latlng_loop(loop_s)))
        for op in ops:
            if snapped:
                res = B.boolean_op_snapped(pa, pb, op)
                nde = ndp = 0
            elif degeneracies:
                res, de, dp = B.boolean_op_with_degeneracies(pa, pb, op)
                nde, ndp = len(de), len(dp)
            else:
                res = fns[op](pa, pb)
                nde = ndp = 0
            grp = f"{pair}|{op}"
            signs = M.even_odd_signs([l.vertices for l in res.loops])
            for li, (sgn, l) in enumerate(zip(signs, res.loops)):
                out_rows.append((grp, li, sgn, l.vertices))
            meta_rows.append((pair, op, len(res.loops), nde, ndp))
    meta_vals = ", ".join(
        f"('{p}', '{o}', {n}, {nde}, {ndp})"
        for p, o, n, nde, ndp in meta_rows
    )

    def _a(grp: str) -> str:
        return f"coalesce((SELECT area FROM oarea WHERE grp = '{grp}'), 0.0)"

    def _ia(grp: str) -> str:
        return f"coalesce((SELECT area FROM iarea WHERE grp = '{grp}'), 0.0)"

    conds = []
    for p in pairs:
        conds.append(
            f"abs({_a(p + '|intersection')} + {_a(p + '|union')}"
            f" - {_ia(p + '|a')} - {_ia(p + '|b')}) < {tol!r}"
        )
        if "difference" in ops:
            conds.append(
                f"abs({_a(p + '|difference')}"
                f" - ({_ia(p + '|a')} - {_a(p + '|intersection')})) < {tol!r}"
            )
        if "symmetric_difference" in ops:
            conds.append(
                f"abs({_a(p + '|symmetric_difference')}"
                f" - ({_ia(p + '|a')} + {_ia(p + '|b')}"
                f" - 2 * {_a(p + '|intersection')})) < {tol!r}"
            )
    return f"""
    WITH oedges(grp, loop_id, sgn, cx, cy, cz, dx, dy, dz)
      AS (VALUES {_xyz_edge_values(out_rows)}),
    {_area_fold_ctes('oedges', 'oarea')},
    {_latlng_edges_cte('iedges', in_rows)},
    {_area_fold_ctes('iedges', 'iarea')},
    meta(pair, op, n_loops, n_deg_edges, n_deg_points)
      AS (VALUES {meta_vals}),
    checks AS (SELECT ({' AND '.join(conds)}) AS ok)
    SELECT m.pair, m.op, m.n_loops,
           round(coalesce(o.area, 0.0), 9) AS area_r
           {', m.n_deg_edges, m.n_deg_points' if degeneracies else ''}
    FROM meta m LEFT JOIN oarea o ON o.grp = m.pair || '|' || m.op
    WHERE (SELECT ok FROM checks)
    ORDER BY m.pair, m.op
    """


def winding_fixture_sql(jobs, tol: float = 1e-9) -> str:
    """Oracle for winding_ops_join over the contract fixtures.

    Engine output loops are pinned as literals; areas are recomputed by
    the excess SQL, gated on input-only identities:

    - ``rect_pos``: output area == SQL area of the input rectangle.
    - ``bowtie*``: output area == the closed-form two-lobe area built
      entirely in SQL — crossing point C = normalize((v0×v1)×(v2×v3))
      from the input vertices, lobes = triangles (C,v1,v2) and (C,v3,v0).
    - ``stairs_*``: layer-cake identity — Σ_k area(winding ≥ k) over
      k=1..5 equals Σ_i area(square_i), each square's area from its own
      input vertices (exact measure-theoretic identity on the sphere).
    """
    from ..kernel import measures as M
    from ..kernel.contains import parse_points
    from ..kernel.winding import WindingRule, winding_operation

    out_rows, meta_rows = [], []
    in_rows = []
    stairs_jobs, bowtie_jobs = [], []
    rect_ll = None
    bowtie_ll = None
    sq_lls: list = []
    for row in jobs:
        job, loops_s, ref_s, ref_w, rule = row[:5]
        degen = bool(row[5]) if len(row) > 5 else False
        loops = [parse_points(s) for s in loops_s.split(";") if s.strip()]
        if degen:
            res, full, degens = winding_operation(
                loops, parse_points(ref_s)[0], int(ref_w),
                getattr(WindingRule, rule), include_degeneracies=True,
            )
            n_pts = len(degens["points"])
            n_sib = len(degens["sibling_edges"])
        else:
            res, full = winding_operation(
                loops, parse_points(ref_s)[0], int(ref_w),
                getattr(WindingRule, rule),
            )
            n_pts = n_sib = 0
        signs = M.even_odd_signs(list(res)) if res else []
        for li, (sgn, v) in enumerate(zip(signs, res)):
            out_rows.append((job, li, sgn, v))
        meta_rows.append((job, len(res), bool(full), n_pts, n_sib))
        if job == "rect_pos":
            rect_ll = _parse_latlng_loop(loops_s)
        if job.startswith("stairs"):
            stairs_jobs.append(job)
            sq_lls = [
                _parse_latlng_loop(s) for s in loops_s.split(";") if s.strip()
            ]
        if job.startswith("bowtie"):
            bowtie_jobs.append(job)
            bowtie_ll = _parse_latlng_loop(loops_s)

    if rect_ll is not None:
        in_rows.append(("in|rect", 0, rect_ll))
    for i, sq in enumerate(sq_lls):
        in_rows.append((f"in|sq{i}", 0, sq))
    if not in_rows:  # keep the iedges CTE well-formed with no area gates
        in_rows.append(("in|_none", 0, [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0)]))
    meta_vals = ", ".join(
        f"('{j}', {n}, {'TRUE' if f else 'FALSE'}, {np_}, {ns})"
        for j, n, f, np_, ns in meta_rows
    )

    def _a(grp: str) -> str:
        return f"coalesce((SELECT area FROM oarea WHERE grp = '{grp}'), 0.0)"

    # bow-tie closed form: vertex xyz + crossing point, all in SQL.
    # Every identity gate below is built only when its fixture is present
    # in `jobs` (a partial jobs list must degrade to fewer gates, not a
    # NameError / broken SQL — round-3 ADVICE).
    bw_pts = []
    for k, (lat, lng) in enumerate(bowtie_ll or []):
        bw_pts.append(
            f"cos(radians({lng!r}))*cos(radians({lat!r})) AS v{k}x,"
            f" sin(radians({lng!r}))*cos(radians({lat!r})) AS v{k}y,"
            f" sin(radians({lat!r})) AS v{k}z"
        )
    v = [(f"v{k}x", f"v{k}y", f"v{k}z") for k in range(4)]

    def _cross(a, b, name):
        return (
            f"({a[1]}*{b[2]} - {a[2]}*{b[1]}) AS {name}x,"
            f" ({a[0]}*{b[2]} - {a[2]}*{b[0]}) * -1.0 AS {name}y,"
            f" ({a[0]}*{b[1]} - {a[1]}*{b[0]}) AS {name}z"
        )

    n0 = ("n0x", "n0y", "n0z")
    n2 = ("n2x", "n2y", "n2z")
    c_raw = ("crx", "cry", "crz")
    c = ("ccx", "ccy", "ccz")
    bw_sql = "" if bowtie_ll is None else f"""
    bw0 AS (SELECT {', '.join(bw_pts)}),
    bw1 AS (SELECT *, {_cross(v[0], v[1], 'n0')}, {_cross(v[2], v[3], 'n2')} FROM bw0),
    bw2 AS (SELECT *, {_cross(n0, n2, 'cr')} FROM bw1),
    bw3 AS (SELECT *,
        CASE WHEN crx < 0 THEN -1.0 ELSE 1.0 END
          / sqrt(crx*crx + cry*cry + crz*crz) AS cs
      FROM bw2),
    bw AS (SELECT *, crx*cs AS ccx, cry*cs AS ccy, crz*cs AS ccz FROM bw3),
    bwexp AS (SELECT abs({_tri_area_sql(c, v[1], v[2])})
                   + abs({_tri_area_sql(c, v[3], v[0])}) AS expected FROM bw)
    """
    conds = []
    if rect_ll is not None:
        conds.append(f"abs({_a('rect_pos')} - {_ia_rect()}) < {tol!r}")
    if stairs_jobs and sq_lls:
        stairs_sum = " + ".join(_a(j) for j in stairs_jobs)
        sq_sum = " + ".join(
            f"coalesce((SELECT area FROM iarea WHERE grp = 'in|sq{i}'), 0.0)"
            for i in range(len(sq_lls))
        )
        conds.append(f"abs(({stairs_sum}) - ({sq_sum})) < {tol!r}")
    for j in bowtie_jobs:
        conds.append(
            f"abs({_a(j)} - (SELECT expected FROM bwexp)) < {tol!r}"
        )
    if not conds:
        conds = ["TRUE"]
    return f"""
    WITH oedges(grp, loop_id, sgn, cx, cy, cz, dx, dy, dz)
      AS (VALUES {_xyz_edge_values(out_rows)}),
    {_area_fold_ctes('oedges', 'oarea')},
    {_latlng_edges_cte('iedges', in_rows)},
    {_area_fold_ctes('iedges', 'iarea')},
    meta(job, n_loops, is_full, n_deg_points, n_deg_edges)
      AS (VALUES {meta_vals}),
    {bw_sql + ',' if bw_sql else ''}
    checks AS (SELECT ({' AND '.join(conds)}) AS ok)
    SELECT m.job, m.n_loops, m.is_full,
           round(coalesce(o.area, 0.0), 9) AS area_r,
           m.n_deg_points, m.n_deg_edges
    FROM meta m LEFT JOIN oarea o ON o.grp = m.job
    WHERE (SELECT ok FROM checks)
    ORDER BY m.job
    """


def _ia_rect() -> str:
    return "coalesce((SELECT area FROM iarea WHERE grp = 'in|rect'), 0.0)"


def buffer_fixture_sql(jobs, convex_jobs, steiner_rel_tol: float = 5e-3) -> str:
    """Oracle for buffer_ops_join.

    Engine output loops are pinned as literals; areas are recomputed by
    the excess SQL.  Independent gates (right-hand sides computed in SQL
    from INPUT lat:lng literals only):

    - every job: strict growth, area(buffer) > area(input);
    - convex jobs: the spherical Steiner formula
          A(r) = A + L·sin(r) + (2π − A)·(1 − cos(r))
      (Gauss–Bonnet: total turning of a convex boundary = 2π − A) must
      match the recomputed area within `steiner_rel_tol` of the grown
      part — the polygonized offset arcs (circle_segments) sit within
      that band, a wrong overlay does not.
    """
    import math as _math

    from ..kernel import measures as M
    from ..kernel.booleans import buffer_polygon_winding
    from ..kernel.contains import parse_polygon

    out_rows, meta_rows, in_rows = [], [], []
    for job, loops_s, radius_deg, segments in jobs:
        poly = parse_polygon(loops_s)
        buf = buffer_polygon_winding(
            poly, _math.radians(float(radius_deg)), float(segments)
        )
        signs = M.even_odd_signs([l.vertices for l in buf.loops])
        for li, (sgn, l) in enumerate(zip(signs, buf.loops)):
            out_rows.append((job, li, sgn, l.vertices))
        meta_rows.append((job, len(buf.loops)))
        for li, loop_s in enumerate(loops_s.split(";")):
            in_rows.append((f"in|{job}", li, _parse_latlng_loop(loop_s)))
    meta_vals = ", ".join(f"('{j}', {n})" for j, n in meta_rows)

    def _a(grp: str) -> str:
        return f"coalesce((SELECT area FROM oarea WHERE grp = '{grp}'), 0.0)"

    def _iarea(job: str) -> str:
        return f"coalesce((SELECT area FROM iarea WHERE grp = 'in|{job}'), 0.0)"

    angle = _stable_angle_sql(("cx", "cy", "cz"), ("dx", "dy", "dz"))
    perim_cte = f"""
    iperim AS (
      SELECT grp, sum({angle}) AS perim FROM iedges GROUP BY grp)
    """

    def _iperim(job: str) -> str:
        return f"(SELECT perim FROM iperim WHERE grp = 'in|{job}')"

    conds = []
    for job, _loops_s, radius_deg, _segments in jobs:
        conds.append(f"{_a(job)} > {_iarea(job)}")
        if job in convex_jobs:
            r = _math.radians(float(radius_deg))
            steiner = (
                f"({_iarea(job)} + {_iperim(job)} * {_math.sin(r)!r}"
                f" + ({2 * _math.pi!r} - {_iarea(job)}) * {(1 - _math.cos(r))!r})"
            )
            conds.append(
                f"abs({_a(job)} - {steiner})"
                f" <= {steiner_rel_tol!r} * ({steiner} - {_iarea(job)})"
            )
    return f"""
    WITH oedges(grp, loop_id, sgn, cx, cy, cz, dx, dy, dz)
      AS (VALUES {_xyz_edge_values(out_rows)}),
    {_area_fold_ctes('oedges', 'oarea')},
    {_latlng_edges_cte('iedges', in_rows)},
    {_area_fold_ctes('iedges', 'iarea')},
    {perim_cte},
    meta(job, n_loops) AS (VALUES {meta_vals}),
    checks AS (SELECT ({' AND '.join(conds)}) AS ok)
    SELECT m.job, m.n_loops, round(coalesce(o.area, 0.0), 9) AS area_r
    FROM meta m LEFT JOIN oarea o ON o.grp = m.job
    WHERE (SELECT ok FROM checks)
    ORDER BY m.job
    """


def mixed_fixture_sql(fixtures, ops) -> str:
    """Oracle for operators/mixed_ops.mixed_ops_join: per (pair, op,
    models) row the kernel's feature counts and canonical digest,
    emitted as pinned VALUES literals.  The mixed-boolean SEMANTICS are
    pinned independently against the reference's own model matrix
    (tests/test_mixed_ops.py ports s2boolean_operation_test.cc:203-1033
    and compares per-dimension edge multisets exactly as the
    reference's IndexMatchingLayer does); this oracle then gates the
    DISTRIBUTED mapInPandas path row-for-row and digest-for-digest
    against the kernel."""
    from ..kernel.mixed import MixedOptions, mixed_boolean_op, parse_mixed
    from ..operators.mixed_ops import _canonical_features

    rows = []
    for name, a_s, b_s, pgm, plm, lhb in fixtures:
        a, b = parse_mixed(a_s), parse_mixed(b_s)
        for op in ops:
            res = mixed_boolean_op(a, b, op, MixedOptions(pgm, plm, lhb))
            n_p, n_l, n_g, n_d, dig = _canonical_features(res)
            rows.append(
                f"('{name}', '{op}', '{pgm}', '{plm}',"
                f" {n_p}, {n_l}, {n_g}, {n_d}, '{dig}')"
            )
    values = ", ".join(rows)
    return f"""
    SELECT pair, op, polygon_model, polyline_model,
           CAST(n_points AS INTEGER) AS n_points,
           CAST(n_line_edges AS INTEGER) AS n_line_edges,
           CAST(n_poly_edges AS INTEGER) AS n_poly_edges,
           CAST(n_deg_features AS INTEGER) AS n_deg_features,
           digest
    FROM (VALUES {values})
      AS t(pair, op, polygon_model, polyline_model, n_points,
           n_line_edges, n_poly_edges, n_deg_features, digest)
    ORDER BY pair, op
    """


# ------------------------------------------------------- DTW alignment
def dtw_fixture_sql(fixtures, round_digits: int = 6) -> str:
    """Oracle for polyline vertex alignment (Dynamic Timewarp) — an
    INDEPENDENT re-derivation of the DP inside DuckDB, not a pinned
    golden: a recursive CTE iterates the cost table row by row, with
    the in-row left recursion c[j] = w[j] + min(m[j], c[j-1]) unrolled
    to c[j] = S[j] + min_{k<=j}(m[k] - S[k-1]) via list lambdas (the
    same closed form the kernel uses, kernel/alignment.py:_row_costs,
    so the two engines evaluate identical expression trees down to
    summation order).  The per-group medoid is then the argmin of the
    mirrored pair-cost sums with the reference's lowest-ord tie-break
    (s2polyline_alignment.cc:352-372).

    fixtures: [(grp, ord, [(lat_deg, lng_deg), ...]), ...].

    Build-time guards (the cap-filter precedent): every exact pair
    cost must sit > LIBM_GUARD from its round() boundary, and within
    every group the best-vs-second medoid total gap must exceed
    LIBM_GUARD unless the totals are EXACTLY equal (the 2-trajectory
    tie the reference contract resolves by lowest index)."""
    from ..kernel.alignment import exact_alignment_cost
    from ..kernel.contains import parse_points

    lines = {}
    vrows = []
    for grp, order, lls in fixtures:
        pts = parse_points(", ".join(f"{la}:{ln}" for la, ln in lls))
        lines[(grp, order)] = pts
        for vi, (la, ln) in enumerate(lls):
            # bare numeric literals type as DECIMAL in DuckDB; the cast
            # makes the parse a shortest-round-trip double, bit-equal to
            # the Python float the Spark side consumes
            vrows.append(
                f"('{grp}', {order}, {vi}, CAST({la!r} AS DOUBLE),"
                f" CAST({ln!r} AS DOUBLE))"
            )

    # Kernel-side recomputation for the guards only (never emitted).
    pair_costs = {}
    groups = sorted({g for g, _ in lines})
    for grp in groups:
        ords = sorted(o for g, o in lines if g == grp)
        for i, oa in enumerate(ords):
            for ob in ords[i + 1:]:
                c = exact_alignment_cost(lines[grp, oa], lines[grp, ob])
                pair_costs[(grp, oa, ob)] = c
                scaled = c * 10.0**round_digits
                if abs(scaled - math.floor(scaled) - 0.5) * 10.0**-round_digits <= LIBM_GUARD:
                    raise ValueError(
                        f"dtw oracle fragile: cost {c!r} for {grp}|{oa}|{ob} "
                        f"straddles a round({round_digits}) boundary"
                    )
    for grp in groups:
        ords = sorted(o for g, o in lines if g == grp)
        totals = {o: 0.0 for o in ords}
        for (g, oa, ob), c in pair_costs.items():
            if g == grp:
                totals[oa] += c
                totals[ob] += c
        ranked = sorted(totals.values())
        if len(ranked) > 1 and ranked[1] != ranked[0] and ranked[1] - ranked[0] <= LIBM_GUARD:
            raise ValueError(
                f"dtw oracle fragile: medoid totals in {grp} separated by "
                f"{ranked[1] - ranked[0]:.3e}"
            )

    dist = (
        "sqrt((p.av[d.row_i+2][1]-q[1])*(p.av[d.row_i+2][1]-q[1])"
        " + (p.av[d.row_i+2][2]-q[2])*(p.av[d.row_i+2][2]-q[2])"
        " + (p.av[d.row_i+2][3]-q[3])*(p.av[d.row_i+2][3]-q[3]))"
    )
    dist0 = (
        "sqrt((av[1][1]-q[1])*(av[1][1]-q[1])"
        " + (av[1][2]-q[2])*(av[1][2]-q[2])"
        " + (av[1][3]-q[3])*(av[1][3]-q[3]))"
    )
    cumsum = "list_transform(range(bn), j -> list_sum(list_slice(w, 1, j + 1)))"
    return f"""
    WITH RECURSIVE
    tv(grp, ord, vidx, lat, lng) AS (VALUES {", ".join(vrows)}),
    txyz AS (
      SELECT grp, ord, vidx,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM tv),
    tlist AS (
      SELECT grp, ord, list([x, y, z] ORDER BY vidx) AS vs
      FROM txyz GROUP BY grp, ord),
    pairv AS (
      SELECT a.grp || '|' || a.ord || '|' || b.ord AS pair,
             a.grp AS grp, a.ord AS ord_a, b.ord AS ord_b,
             a.vs AS av, b.vs AS bv,
             len(a.vs) AS an, len(b.vs) AS bn
      FROM tlist a JOIN tlist b
        ON a.grp = b.grp AND a.ord < b.ord),
    dp(pair, row_i, costs) AS (
      SELECT pair, 0, {cumsum}
      FROM (SELECT pair, bn,
                   list_transform(bv, q -> {dist0}) AS w
            FROM pairv)
      UNION ALL
      SELECT pair, row_i,
             list_transform(range(bn),
               j -> S[j + 1] + list_min(list_slice(q, 1, j + 1))) AS costs
      FROM (
        SELECT pair, row_i, bn, S,
               list_transform(range(bn),
                 k -> m[k + 1] - CASE WHEN k = 0 THEN 0.0 ELSE S[k] END) AS q
        FROM (
          SELECT pair, row_i, bn, w, costs,
                 {cumsum} AS S,
                 list_transform(range(bn),
                   k -> CASE WHEN k = 0 THEN costs[1]
                        ELSE least(costs[k], costs[k + 1]) END) AS m
          FROM (
            SELECT p.pair, d.row_i + 1 AS row_i, p.bn, d.costs,
                   list_transform(p.bv, q -> {dist}) AS w
            FROM dp d JOIN pairv p ON p.pair = d.pair
            WHERE d.row_i + 1 < p.an
          )
        )
      )
    ),
    pcost AS (
      SELECT p.grp, p.ord_a, p.ord_b, d.costs[p.bn] AS cost
      FROM pairv p JOIN dp d
        ON d.pair = p.pair AND d.row_i = p.an - 1),
    totals AS (
      SELECT grp, ord, sum(cost) AS total FROM (
        SELECT grp, ord_a AS ord, cost FROM pcost
        UNION ALL
        SELECT grp, ord_b AS ord, cost FROM pcost
      ) GROUP BY grp, ord),
    med AS (
      SELECT grp, ord AS medoid_ord FROM (
        SELECT grp, ord,
               row_number() OVER (PARTITION BY grp ORDER BY total, ord) AS rn
        FROM totals) WHERE rn = 1)
    SELECT p.grp, p.ord_a, p.ord_b,
           round(p.cost, {round_digits}) AS cost_r, m.medoid_ord
    FROM pcost p JOIN med m ON m.grp = p.grp
    ORDER BY p.grp, p.ord_a, p.ord_b
    """


# ---------------------------------------------------- shape nesting
def nesting_fixture_sql(rings, guard_frac: float = 0.05) -> str:
    """Oracle for shape_nesting_join over canonically-oriented nested
    geodesic rings — an INDEPENDENT geometric re-derivation in SQL:

        depth(i)  = #{j != i : disc(j) contains rep-vertex(i)}
        parent(i) = containing ring with the greatest depth
        output    = parent if depth odd else -1 (the even/odd rule,
                    s2shape_nesting_query.cc:272-286)

    For cleanly nested, interior-facing fixtures (alternating
    orientations), this closed form IS the reference's answer; the
    orientation-sensitive cases (facing-away shells, shared vertices,
    concave arcs) are covered bit-for-bit by the pytest port
    (tests/test_nesting.py).

    rings: [(shape, ring_id, center_xyz, cos_radius, rep_xyz), ...]
    where rep is the ring's vertex 0 (an input vertex, not an output).

    Build-time guards: every (ring j, rep i) containment dot must sit
    > guard_frac · sin(radius_j) from the cos(radius_j) threshold (so
    polygonal chord sag and cross-engine ulps cannot flip it), and the
    direct-parent argmax must be strictly unique."""
    vals, recs = [], []
    for shape, ring, c, cosr, p in rings:
        c = np.asarray(c, float)
        p = np.asarray(p, float)
        recs.append((shape, ring, c, float(cosr), p))
        vals.append(
            f"('{shape}', {ring}, "
            + ", ".join(
                f"CAST({v!r} AS DOUBLE)"
                for v in (c[0], c[1], c[2], cosr, p[0], p[1], p[2])
            )
            + ")"
        )

    # guards + parent uniqueness, evaluated with the same expressions
    depth = {}
    contains = {}
    for shape, i, _, _, p in recs:
        d = 0
        for shape2, j, c, cosr, _ in recs:
            if shape2 != shape or j == i:
                continue
            dot = float(c @ p)
            sinr = math.sqrt(max(0.0, 1.0 - cosr * cosr))
            if abs(dot - cosr) <= guard_frac * sinr:
                raise ValueError(
                    f"nesting oracle fragile: ring {shape}|{j} vs rep "
                    f"{shape}|{i} margin {abs(dot - cosr):.3e}"
                )
            if dot > cosr:
                contains[(shape, j, i)] = True
                d += 1
        depth[(shape, i)] = d
    for shape, i, _, _, _ in recs:
        if depth[shape, i] % 2 == 1:
            best = sorted(
                (
                    depth[shape, j]
                    for s2, j, _, _, _ in recs
                    if s2 == shape and contains.get((shape, j, i))
                ),
                reverse=True,
            )
            if len(best) > 1 and best[0] == best[1]:
                raise ValueError(
                    f"nesting oracle fragile: non-unique direct parent "
                    f"for {shape}|{i}"
                )

    return f"""
    WITH rings(shape, ring, cx, cy, cz, cosr, px, py, pz)
      AS (VALUES {", ".join(vals)}),
    cont AS (
      SELECT c.shape, c.ring AS j, p.ring AS i
      FROM rings c JOIN rings p
        ON p.shape = c.shape AND p.ring <> c.ring
      WHERE c.cx * p.px + c.cy * p.py + c.cz * p.pz > c.cosr),
    depth AS (
      SELECT r.shape, r.ring, count(c.j) AS d
      FROM rings r LEFT JOIN cont c
        ON c.shape = r.shape AND c.i = r.ring
      GROUP BY r.shape, r.ring),
    par AS (
      SELECT c.shape, c.i AS ring, c.j AS parent,
             row_number() OVER (
               PARTITION BY c.shape, c.i ORDER BY dj.d DESC, c.j) AS rn
      FROM cont c JOIN depth dj
        ON dj.shape = c.shape AND dj.ring = c.j)
    SELECT d.shape AS shape_id, d.ring AS chain_id,
           CAST(CASE WHEN d.d % 2 = 1 THEN p.parent ELSE -1 END
                AS INTEGER) AS parent_id,
           CAST(CASE WHEN d.d % 2 = 0 THEN 1 ELSE 0 END
                AS INTEGER) AS is_shell_i
    FROM depth d LEFT JOIN par p
      ON p.shape = d.shape AND p.ring = d.ring AND p.rn = 1
    ORDER BY shape_id, chain_id
    """


# ---------------------------------------------------- loop relations
def loop_relations_fixture_sql(pairs, guard: float = 0.05) -> str:
    """Oracle for geo_loop_relations over interior-facing (CCW)
    geodesic-disc pairs — an INDEPENDENT re-derivation in SQL from
    center/radius literals alone:

        d             = acos(ca · cb)
        contains(a,b) = d <= ra - rb
        intersects    = d <  ra + rb
        cmp_boundary  = +1 contains / -1 disjoint-or-contained / 0 cross
        (S2Loop::Contains/Intersects/CompareBoundary semantics for
        disc regions, s2loop.cc:1056-1235)

    pairs: [(pair_id, ca_xyz, ra_rad, cb_xyz, rb_rad), ...].

    Build-time guard: every pair's center distance must sit > `guard`
    radians away from BOTH decision thresholds |ra−rb| and ra+rb, so
    24-gon chord sag (<1% of r) and cross-engine acos ulps cannot flip
    any classification.  Shared-edge / complement cases are covered by
    the pytest matrix (tests/test_loop_relations.py), not this oracle.
    """
    vals = []
    for pid, ca, ra, cb, rb in pairs:
        ca = np.asarray(ca, float)
        cb = np.asarray(cb, float)
        d = math.acos(max(-1.0, min(1.0, float(ca @ cb))))
        for thr in (abs(ra - rb), ra + rb):
            if abs(d - thr) <= guard:
                raise ValueError(
                    f"loop-relations oracle fragile: pair {pid} "
                    f"distance {d:.4f} within {guard} of threshold {thr:.4f}"
                )
        vals.append(
            f"('{pid}', "
            + ", ".join(
                f"CAST({v!r} AS DOUBLE)"
                for v in (ca[0], ca[1], ca[2], ra, cb[0], cb[1], cb[2], rb)
            )
            + ")"
        )
    return f"""
    WITH pairs(pair_id, cax, cay, caz, ra, cbx, cby, cbz, rb)
      AS (VALUES {", ".join(vals)}),
    rel AS (
      SELECT pair_id, ra, rb,
             acos(least(1.0, greatest(-1.0,
                 cax * cbx + cay * cby + caz * cbz))) AS d
      FROM pairs)
    SELECT pair_id,
           CAST(CASE WHEN d <= ra - rb THEN 1 ELSE 0 END
                AS INTEGER) AS contains_ab_i,
           CAST(CASE WHEN d <= rb - ra THEN 1 ELSE 0 END
                AS INTEGER) AS contains_ba_i,
           CAST(CASE WHEN d < ra + rb THEN 1 ELSE 0 END
                AS INTEGER) AS intersects_i,
           CAST(CASE WHEN d <= ra - rb THEN 1
                     WHEN d >= ra + rb OR d <= rb - ra THEN -1
                     ELSE 0 END AS INTEGER) AS cmp_boundary
    FROM rel
    ORDER BY pair_id
    """


# -------------------------------------------------- polyline simplify
def simplify_fixture_sql(fixtures) -> str:
    """Oracle for operators/polyline_ops.simplify_polylines_join: per
    (job, line) the kernel's input/output vertex counts and canonical
    simplified-chain digest as pinned VALUES.  The simplify SEMANTICS
    are pinned independently against the reference's own fixtures
    (tests/test_simplifier.py ports s2builder_test.cc:866-1019 and
    s2polyline_simplifier_test.cc); this oracle then gates the
    DISTRIBUTED applyInPandas path row-for-row."""
    import numpy as np

    from ..kernel.builder import simplify_snapped_polylines
    from ..kernel.coords import latlng_to_xyz
    from ..operators.polyline_ops import _make_snap, simplify_digest

    rows = []
    for name, kind, param, polys in fixtures:
        arrs = []
        for poly in polys:
            lat = np.array([p[0] for p in poly], np.float64)
            lng = np.array([p[1] for p in poly], np.float64)
            x, y, z = latlng_to_xyz(lat, lng)
            arrs.append(np.stack([x, y, z], -1))
        out = simplify_snapped_polylines(arrs, _make_snap(kind, float(param)))
        for li, (p, c) in enumerate(zip(arrs, out)):
            rows.append(
                f"('{name}', {li}, {len(p)}, {len(c)}, '{simplify_digest(c)}')"
            )
    values = ", ".join(rows)
    return f"""
    SELECT job, CAST(line_idx AS INTEGER) AS line_idx,
           CAST(n_in AS INTEGER) AS n_in,
           CAST(n_out AS INTEGER) AS n_out, digest
    FROM (VALUES {values}) AS t(job, line_idx, n_in, n_out, digest)
    ORDER BY job, line_idx
    """


# ---------------------------------------------------- convex hull
def convex_hull_fixture_sql(fixtures) -> str:
    """Oracle for the geo_convex_hull contract query: per group the
    kernel's hull size, status, and canonical digest as pinned VALUES
    (hull SEMANTICS are reference-gated in tests/test_hull_query.py;
    this gates the distributed applyInPandas path row-for-row)."""
    import hashlib

    import numpy as np

    from ..kernel.coords import latlng_to_xyz, xyz_to_latlng
    from ..kernel.hull import EMPTY, FULL, convex_hull_of_points

    rows = []
    for gid, pts in fixtures:
        lat = np.array([p[0] for p in pts], float)
        lng = np.array([p[1] for p in pts], float)
        x, y, z = latlng_to_xyz(lat, lng)
        result = convex_hull_of_points(np.stack([x, y, z], -1))
        if isinstance(result, str):
            status = FULL if result == FULL else EMPTY
            n_vertices = 0
            entries = ["-1@0.000000000,0.000000000"]
        else:
            status = "loop"
            n_vertices = len(result)
            hlat, hlng = xyz_to_latlng(result[:, 0], result[:, 1], result[:, 2])
            entries = [
                f"{i}@{round(float(a), 9):.9f},{round(float(b), 9):.9f}"
                for i, (a, b) in enumerate(zip(hlat, hlng))
            ]
        digest = hashlib.md5(";".join(sorted(entries)).encode()).hexdigest()
        rows.append(f"('{gid}', '{status}', {n_vertices}, '{digest}')")
    values = ", ".join(rows)
    return f"""
    SELECT group_id, status, CAST(n_vertices AS BIGINT) AS n_vertices, digest
    FROM (VALUES {values}) AS t(group_id, status, n_vertices, digest)
    ORDER BY group_id
    """


def layer_fixture_sql(fixtures) -> str:
    """Oracle for operators/layer_ops.assemble_layers_join: per (job,
    piece) the kernel's piece count, vertex count, and canonical digest
    as pinned VALUES.  The LAYER SEMANTICS are pinned independently
    against the reference's own fixtures (tests/test_builder_layers.py
    + tests/test_polygon_layer.py port the three s2builderutil layer
    suites); this oracle gates the DISTRIBUTED applyInPandas path
    row-for-row."""
    import numpy as np

    from ..kernel.coords import latlng_to_xyz
    from ..operators.layer_ops import assemble_job, piece_digest

    rows = []
    for name, kind, chains in fixtures:
        arrs = []
        for chain in chains:
            lat = np.array([p[0] for p in chain], np.float64)
            lng = np.array([p[1] for p in chain], np.float64)
            x, y, z = latlng_to_xyz(lat, lng)
            arrs.append(np.stack([x, y, z], -1))
        pieces = assemble_job(kind, arrs)
        canon = sorted((piece_digest(p), len(p)) for p in pieces)
        for pi, (d, n) in enumerate(canon):
            rows.append(f"('{name}', {pi}, {n}, '{d}')")
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(job, piece_idx, n_vertices, digest)"
        " ORDER BY job, piece_idx"
    )


def furthest_edges_sql(
    shapes,
    k: int,
    include_interiors: bool,
    pts_where: str | None = None,
) -> str:
    """Oracle for furthest_edges_join: the kernel resolves max distance
    through the antipode identity max_d2 = 4 − min_d2(−x)
    (s2edge_distances.cc:236-249), so the SQL mirror evaluates the SAME
    edge_dist2_sql expression on the negated point columns and maps
    through 4 −; interior hits report (shape_id, −1, Straight = 4.0)
    when the polygon contains the antipode.  Ranking mirrors
    find_furthest_edges' sorted(..., reverse=True): ties break toward
    HIGHER (shape_id, edge_id)."""
    neg = ("(0-px)", "(0-py)", "(0-pz)")
    selects = []
    for shape in shapes:
        for e in range(len(shape.edges_c)):
            expr = edge_dist2_sql(shape.edges_c[e], shape.edges_d[e], p=neg)
            selects.append(
                f"SELECT key, {shape.shape_id} AS shape_id, {e} AS edge_id,"
                f" 4.0 - ({expr}) AS dist2 FROM xyz"
            )
        if include_interiors and shape.polygon is not None:
            inside = polygon_contains_sql(shape.polygon, p=neg)
            selects.append(
                f"SELECT key, {shape.shape_id} AS shape_id, -1 AS edge_id,"
                f" 4.0 AS dist2 FROM xyz WHERE {inside}"
            )
    cand = " UNION ALL ".join(selects)
    return f"""
    WITH {pts_cte(pts_where)},
    cand AS ({cand}),
    ranked AS (
      SELECT key, shape_id, edge_id, dist2,
             row_number() OVER (PARTITION BY key
                                ORDER BY dist2 DESC, shape_id DESC,
                                         edge_id DESC) AS rn
      FROM cand)
    SELECT key, shape_id, edge_id, round(dist2, 12) AS dist2_r
    FROM ranked WHERE rn <= {k}
    ORDER BY key, shape_id, edge_id
    """


def meridian_fixture_sql(fixtures) -> str:
    """Oracle for operators/meridian.split_meridian_join: per (job,
    piece) the kernel's vertex count, meridian-crossing flag (always
    FALSE — the transform's contract) and canonical digest as pinned
    VALUES.  The SPLIT SEMANTICS are pinned independently against the
    reference's own MeridianSplitting expected strings
    (tests/test_mixed_ops.py::test_meridian_splitting, e=9 geodesic
    intersection latitudes); this oracle gates the DISTRIBUTED
    applyInPandas path row-for-row."""
    import numpy as np

    from ..kernel.coords import latlng_to_xyz
    from ..operators.layer_ops import piece_digest
    from ..operators.meridian import _crosses_meridian, split_job

    rows = []
    for name, kind, chains in fixtures:
        arrs = []
        for chain in chains:
            lat = np.array([p[0] for p in chain], np.float64)
            lng = np.array([p[1] for p in chain], np.float64)
            x, y, z = latlng_to_xyz(lat, lng)
            arrs.append(np.stack([x, y, z], -1))
        pieces = split_job(kind, arrs)
        canon = sorted(
            (piece_digest(p), len(p),
             bool(_crosses_meridian(p, kind == "polygon")))
            for p in pieces
        )
        for pi, (d, n, c) in enumerate(canon):
            rows.append(
                f"('{name}', {pi}, {n}, {'TRUE' if c else 'FALSE'}, '{d}')"
            )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(job, piece_idx, n_vertices, crosses_meridian, digest)"
        " ORDER BY job, piece_idx"
    )
