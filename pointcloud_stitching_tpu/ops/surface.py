"""Isosurface reconstruction from a scalar field / the accumulated voxel map.

TPU-native role of ``pcl::MarchingCubes`` (Hoppe/RBF variants): turn the
persistent scene model into a *surface* — a triangle mesh — instead of a
point set. The reference system never reconstructs surfaces (its viewer
draws raw points; reference: src/pcs-multicamera-client.cpp render loop,
SURVEY.md §1 L4); PCL ships the capability and a rig operator doing scene
capture expects it, so this module provides it on top of
``models/voxel_map.py``: accumulate frames → occupancy field → isosurface.

Design — **marching tetrahedra**, not the classic 256-case cubes table:

  * Each grid cell splits into 6 tetrahedra (the Kuhn/Freudenthal split
    around the main diagonal, which tiles space *consistently* — shared
    cube faces get the same diagonal from both sides, so the mesh is
    crack-free by construction, verified by the watertightness test).
  * A tetrahedron has 16 sign configurations and at most 2 triangles —
    the whole case table is 16×2×3 small integers (vs 256×16), has no
    ambiguous saddle cases (cubes' cases 3/6/7/10/12/13 need disambiguation
    to avoid holes; tets never do), and every step is a tiny gather —
    exactly what the VPU wants. The cost is ~2× more (smaller) triangles,
    which the host-side ``weld_mesh`` dedups anyway.
  * Fixed shapes throughout: cells whose corner values straddle the iso
    level are compacted to a static ``cell_capacity`` with
    ``jnp.nonzero(size=...)`` (surface cells are O(n²) of an n³ grid), and
    every active cell emits a constant 12-triangle block with a validity
    mask — one compiled program per grid size, no recompiles as the scene
    evolves.

Winding is fixed *geometrically* (each triangle is flipped so its normal
points away from the tet's inside-corner centroid, i.e. outward along
-∇field for an occupancy field), which keeps the case table orientation-
free and branchless.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# --- static geometry tables (numpy: no jax work at import time — the
# multihost children initialise jax.distributed after import) ------------

# cube corners in the classic MC order; c0=(0,0,0) .. c6=(1,1,1)
_CORNER = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)

# Kuhn 6-tet decomposition: every tet contains the main diagonal c0-c6,
# volumes are all 1/6 (checked), and the induced face diagonals agree
# between neighbouring cubes (translation-invariant split).
_TETS = np.array([[0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
                  [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], np.int32)

# tet-local edges 0..5 between tet-local vertices 0..3
_EDGE_V = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]],
                   np.int32)

# case -> up to 2 triangles of tet-local edge ids (-1 = unused slot).
# bit i of the case = tet vertex i is inside (value > iso). Winding is
# irrelevant here (fixed geometrically below).
_N = -1
_TRI_TABLE = np.array([
    [[_N, _N, _N], [_N, _N, _N]],   # 0000
    [[0, 1, 2],    [_N, _N, _N]],   # 0001  v0 in: edges 01,02,03
    [[0, 3, 4],    [_N, _N, _N]],   # 0010  v1
    [[1, 3, 4],    [1, 4, 2]],      # 0011  v0,v1: quad 02,12,13,03
    [[1, 3, 5],    [_N, _N, _N]],   # 0100  v2
    [[0, 3, 5],    [0, 5, 2]],      # 0101  v0,v2: quad 01,12,23,03
    [[0, 1, 5],    [0, 5, 4]],      # 0110  v1,v2: quad 01,02,23,13
    [[2, 4, 5],    [_N, _N, _N]],   # 0111  v3 out
    [[2, 4, 5],    [_N, _N, _N]],   # 1000  v3
    [[0, 4, 5],    [0, 5, 1]],      # 1001  v0,v3: quad 01,13,23,02
    [[0, 2, 5],    [0, 5, 3]],      # 1010  v1,v3: quad 01,03,23,12
    [[1, 3, 5],    [_N, _N, _N]],   # 1011  v2 out
    [[1, 2, 4],    [1, 4, 3]],      # 1100  v2,v3: quad 02,03,13,12
    [[0, 3, 4],    [_N, _N, _N]],   # 1101  v1 out
    [[0, 1, 2],    [_N, _N, _N]],   # 1110  v0 out
    [[_N, _N, _N], [_N, _N, _N]],   # 1111
], np.int32)

# per-(tet, tet-local-edge) cube-corner endpoints, precomposed so the
# kernel does single flat gathers instead of chained index math
_TET_EDGE_A = _TETS[:, _EDGE_V[:, 0]]          # [6 tets, 6 edges]
_TET_EDGE_B = _TETS[:, _EDGE_V[:, 1]]

# triangles emitted per cell: 6 tets x 2 slots
TRIS_PER_CELL = 12


@partial(jax.jit, static_argnames=("cell_capacity", "chunk"))
def marching_tetrahedra(field: jax.Array, iso, cell_capacity: int,
                        origin=None, leaf=1.0, node_valid=None,
                        chunk: int = 4096):
    """Extract the ``field == iso`` surface as a triangle soup.

    Args:
      field: [X, Y, Z] float32 scalar samples at grid nodes; "inside" is
        ``field > iso`` (an occupancy field from ``field_from_map`` uses
        iso≈0.5, a signed distance uses iso=0 with inside positive).
      iso: traced iso level.
      cell_capacity: static bound on *active* cells (cells whose corners
        straddle iso). Active cells are the surface shell — for an n³
        grid budget O(n²·k), and check the returned count for saturation.
      origin: world position of grid node (0,0,0) ([3] f32, default 0).
      leaf: grid node spacing in meters (traced scalar).
      node_valid: optional [X, Y, Z] bool — nodes where the field value
        is meaningful. Cells touching any invalid node are skipped
        entirely (a TSDF volume passes ``weight > 0`` so occlusion
        boundaries — observed surface meeting never-observed space —
        don't grow fake walls).
      chunk: static cells processed per ``lax.map`` step. Bounds the
        padded size of the per-cell geometry temporaries (TPU tiles the
        two minor dims to (8, 128), so tiny-trailing-dim shapes like
        [cells, 6, 2, 3, 3] occupy ~42× their logical bytes in HBM —
        measured: unchunked extraction at 2^19 cells asks for 27 GB).

    Returns ``(verts, valid, n_active)``:
      verts: [3, 3, cell_capacity·12] f32 — ``verts[i, j, t]`` is world
        coordinate j of corner i of triangle t (coordinate-major SoA:
        the triangle axis is minor so the buffer tiles cleanly on TPU;
        the AoS [T, 3, 3] layout would pad 42×). Host code converts with
        ``soup_triangles(verts, valid)``. Triangles wind so normals
        point outward (away from the inside region).
      valid: [cell_capacity·12] bool — real triangles.
      n_active: scalar int32 — active cells found; if this exceeds
        ``cell_capacity`` the surface is truncated (raise the capacity).
    """
    X, Y, Z = field.shape
    if min(X, Y, Z) < 2:
        raise ValueError("field must be at least 2 nodes per axis")
    iso = jnp.asarray(iso, jnp.float32)
    leaf = jnp.asarray(leaf, jnp.float32)
    origin = (jnp.zeros((3,), jnp.float32) if origin is None
              else jnp.asarray(origin, jnp.float32))
    cx, cy, cz = X - 1, Y - 1, Z - 1

    # -- per-cell corner straddle test: fold max/min over the 8 shifted
    # views rather than stacking them (a 256³ grid stacked 8x is 536 MB)
    cmax = cmin = None
    all_ok = None
    for ox, oy, oz in _CORNER:
        s = field[ox:cx + ox, oy:cy + oy, oz:cz + oz]
        cmax = s if cmax is None else jnp.maximum(cmax, s)
        cmin = s if cmin is None else jnp.minimum(cmin, s)
        if node_valid is not None:
            m = node_valid[ox:cx + ox, oy:cy + oy, oz:cz + oz]
            all_ok = m if all_ok is None else (all_ok & m)
    straddle = (cmax > iso) & (cmin <= iso)
    if all_ok is not None:
        straddle = straddle & all_ok
    active = straddle.reshape(-1)
    n_active = jnp.sum(active.astype(jnp.int32))

    # -- compact active cells to the static capacity (padded to a whole
    # number of chunks; the tail is sliced off the outputs, so behavior
    # at saturation — truncate, report the count — is unchanged)
    chunk = max(1, min(int(chunk), cell_capacity))
    n_chunks = -(-cell_capacity // chunk)
    cap_pad = n_chunks * chunk
    (sel,) = jnp.nonzero(active, size=cap_pad, fill_value=0)
    cell_ok = jnp.arange(cap_pad) < n_active

    fflat = field.reshape(-1)
    off = jnp.asarray(_CORNER)                                # [8,3]
    offf = off.astype(jnp.float32)
    tets = jnp.asarray(_TETS)                                 # [6,4]
    tri_table = jnp.asarray(_TRI_TABLE)
    tea = jnp.asarray(_TET_EDGE_A).reshape(-1)
    teb = jnp.asarray(_TET_EDGE_B).reshape(-1)

    def cell_geom(args):
        sel_c, ok_c = args                                    # [chunk]
        ci = sel_c // (cy * cz)
        cj = (sel_c // cz) % cy
        ck = sel_c % cz
        cell_ijk = jnp.stack([ci, cj, ck], -1).astype(jnp.float32)

        # 8 corner values per active cell (flat gathers)
        idx8 = ((ci[:, None] + off[:, 0]) * (Y * Z)
                + (cj[:, None] + off[:, 1]) * Z
                + (ck[:, None] + off[:, 2]))                  # [chunk,8]
        vals8 = fflat[idx8]                                   # [chunk,8]

        # tet cases
        tvals = vals8[:, tets]                                # [chunk,6,4]
        inside = tvals > iso
        case = jnp.sum(inside.astype(jnp.int32)
                       * jnp.asarray([1, 2, 4, 8], jnp.int32), -1)

        # triangle edge ids from the case table
        tri_e = tri_table[case]                               # [chunk,6,2,3]
        tri_valid = (tri_e[..., 0] >= 0) & ok_c[:, None, None]
        e = jnp.maximum(tri_e, 0)                             # clamp pads

        # edge endpoints as cube corner ids: table[tet, edge]
        tet_id = jnp.arange(6, dtype=jnp.int32)[None, :, None, None]
        ca = tea[tet_id * 6 + e]                              # [chunk,6,2,3]
        cb = teb[tet_id * 6 + e]

        def corner_gather(tab, c):                            # vals8 by id
            flat = c.reshape(chunk, -1)
            return jnp.take_along_axis(tab, flat, axis=1).reshape(c.shape)

        va = corner_gather(vals8, ca)
        vb = corner_gather(vals8, cb)
        pa = cell_ijk[:, None, None, None, :] + offf[ca]      # [chunk,6,2,3,3]
        pb = cell_ijk[:, None, None, None, :] + offf[cb]

        # interpolate the crossing; a used edge always straddles iso so
        # the denominator is nonzero, but guard the padded slots
        denom = vb - va
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = jnp.clip((iso - va) / denom, 0.0, 1.0)
        verts = origin + leaf * (pa + t[..., None] * (pb - pa))

        # orient: normal away from the tet's inside-corner centroid
        pcorn = (origin + leaf
                 * (cell_ijk[:, None, None, :] + offf[tets]))  # [chunk,6,4,3]
        w_in = inside.astype(jnp.float32)[..., None]
        pin = (jnp.sum(pcorn * w_in, 2)
               / jnp.maximum(jnp.sum(w_in, 2), 1e-12))        # [chunk,6,3]
        v0, v1, v2 = verts[..., 0, :], verts[..., 1, :], verts[..., 2, :]
        n = jnp.cross(v1 - v0, v2 - v0)
        cen = (v0 + v1 + v2) / 3.0
        flip = jnp.sum(n * (cen - pin[:, :, None, :]), -1) < 0
        v1f = jnp.where(flip[..., None], v2, v1)
        v2f = jnp.where(flip[..., None], v1, v2)
        verts = jnp.stack([v0, v1f, v2f], axis=-2)            # [chunk,6,2,3,3]

        # (corner, axis)-major SoA: the big triangle axis goes minor
        soa = verts.reshape(chunk * TRIS_PER_CELL, 9).T
        return (soa.reshape(3, 3, chunk * TRIS_PER_CELL),
                tri_valid.reshape(chunk * TRIS_PER_CELL))

    if n_chunks == 1:
        verts_soa, tri_valid = cell_geom((sel, cell_ok))
    else:
        verts_c, valid_c = jax.lax.map(
            cell_geom, (sel.reshape(n_chunks, chunk),
                        cell_ok.reshape(n_chunks, chunk)))
        verts_soa = jnp.moveaxis(verts_c, 0, 2).reshape(
            3, 3, cap_pad * TRIS_PER_CELL)
        tri_valid = valid_c.reshape(-1)

    ntri = cell_capacity * TRIS_PER_CELL
    return verts_soa[..., :ntri], tri_valid[:ntri], n_active


@partial(jax.jit, static_argnames=("shape", "smooth_iters"))
def field_from_map(ijk: jax.Array, weight: jax.Array, origin_ijk: jax.Array,
                   shape: tuple[int, int, int], min_weight=0.0,
                   saturate=1.0, smooth_iters: int = 1) -> jax.Array:
    """Densify a sparse voxel map into an occupancy field for meshing.

    Args:
      ijk: [cap, 3] absolute biased voxel indices (``VoxelMap.ijk``;
        sentinel rows ignored).
      weight: [cap] evidence weights (``VoxelMap.weight``).
      origin_ijk: [3] int32 — absolute biased index mapped to grid node
        (0,0,0) (choose from the occupied bounds, e.g. ``map_grid_bounds``).
      shape: static (X, Y, Z) node counts.
      min_weight: voxels below this evidence are treated as empty.
      saturate: weight at which occupancy clips to 1 (weights ramp
        occupancy linearly up to it — a barely-seen voxel pulls the
        surface inward rather than flipping it).
      smooth_iters: 3³ box-filter passes over the field. One pass turns
        the binary occupancy into a field whose iso-0.5 crossing sits
        between occupied and empty nodes with sub-voxel interpolation
        (0 = blocky Minecraft surface exactly on voxel faces).

    Returns [X, Y, Z] float32 occupancy in [0, 1]. World position of node
    (i, j, k) is ``(origin_ijk - BIAS + (i,j,k) + 0.5) * map_leaf`` —
    ``marching_tetrahedra(origin=...)`` gets that from ``map_grid_bounds``.
    """
    from ..models.voxel_map import _SENTINEL
    X, Y, Z = shape
    occ = ((ijk[:, 0] != _SENTINEL)
           & (weight >= jnp.asarray(min_weight, jnp.float32)))
    g = ijk - jnp.asarray(origin_ijk, jnp.int32)[None, :]
    inb = jnp.all((g >= 0) & (g < jnp.asarray([X, Y, Z])), axis=-1)
    val = jnp.where(occ & inb,
                    jnp.clip(weight / jnp.asarray(saturate, jnp.float32),
                             0.0, 1.0), 0.0)
    gi = jnp.where((occ & inb)[:, None], g, 0)
    field = jnp.zeros((X, Y, Z), jnp.float32)
    field = field.at[gi[:, 0], gi[:, 1], gi[:, 2]].max(val)
    for _ in range(smooth_iters):
        field = _box3(field)
    return field


def _box3(f: jax.Array) -> jax.Array:
    """Separable 3³ box filter with zero (empty-space) borders."""
    for ax in range(3):
        z = jnp.zeros_like(jax.lax.slice_in_dim(f, 0, 1, axis=ax))
        lo = jnp.concatenate([z, jax.lax.slice_in_dim(
            f, 0, f.shape[ax] - 1, axis=ax)], axis=ax)
        hi = jnp.concatenate([jax.lax.slice_in_dim(
            f, 1, f.shape[ax], axis=ax), z], axis=ax)
        f = (lo + f + hi) / 3.0
    return f


def map_grid_bounds(vmap, min_weight: float = 0.0, pad: int = 2,
                    max_nodes: int = 256):
    """Host-side: fit a dense grid to a map's occupied voxels.

    Returns ``(origin_ijk [3] int32, shape (X,Y,Z), origin_world [3]
    f32)`` sized to the occupied bounding box plus ``pad`` empty layers
    (so the surface can close around the outermost voxels), clamped to
    ``max_nodes`` per axis. Pulls the index array to the host — an
    offline meshing step, not a streaming-path op.
    """
    from ..models.voxel_map import _BIAS, _SENTINEL
    ijk = np.asarray(vmap.ijk)
    w = np.asarray(vmap.weight)
    occ = (ijk[:, 0] != _SENTINEL) & (w >= min_weight)
    if not occ.any():
        raise ValueError("map has no occupied voxels at this min_weight")
    lo = ijk[occ].min(0) - pad
    hi = ijk[occ].max(0) + pad
    shape = tuple(int(min(h - l + 2, max_nodes)) for l, h in zip(lo, hi))
    leaf = float(np.asarray(vmap.leaf))
    origin_world = ((lo - _BIAS).astype(np.float32) + 0.5) * leaf
    return (lo.astype(np.int32), shape,
            np.asarray(origin_world, np.float32))


def reconstruct_surface(vmap, iso: float = 0.5, min_weight: float = 0.0,
                        saturate: float = 1.0, smooth_iters: int = 1,
                        cell_capacity: int | None = None, pad: int = 2,
                        max_nodes: int = 256):
    """Voxel map → crack-free triangle mesh, one call.

    Composes ``map_grid_bounds`` → ``field_from_map`` →
    ``marching_tetrahedra`` and welds the soup on the host. Returns
    ``(verts [V,3] np.f32, faces [F,3] np.int32, n_active int)``. Feed
    straight to ``io.plyio.save_mesh``.
    """
    origin_ijk, shape, origin_world = map_grid_bounds(
        vmap, min_weight=min_weight, pad=pad, max_nodes=max_nodes)
    field = field_from_map(vmap.ijk, vmap.weight, origin_ijk, shape,
                           min_weight=min_weight, saturate=saturate,
                           smooth_iters=smooth_iters)
    if cell_capacity is None:
        ncells = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)
        # surface shell heuristic: ~n² cells of the n³ grid, padded 8x
        cell_capacity = int(min(ncells, max(4096, 8 * ncells ** (2 / 3))))
    verts, valid, n_active = marching_tetrahedra(
        field, iso, cell_capacity, origin=origin_world, leaf=vmap.leaf)
    n_active = int(n_active)
    if n_active > cell_capacity:
        raise ValueError(
            f"surface has {n_active} active cells > capacity "
            f"{cell_capacity}; pass a larger cell_capacity")
    v, f = weld_mesh(np.asarray(verts), np.asarray(valid))
    return v, f, n_active


def soup_triangles(verts, valid=None) -> np.ndarray:
    """Device triangle soup → host [n, 3, 3] f32 (triangle-major AoS).

    Accepts either ``marching_tetrahedra``'s coordinate-major [3, 3, T]
    layout or a triangle-major [T, 3, 3] array; ``valid`` (if given)
    selects the real triangles.
    """
    v = np.asarray(verts, np.float32)
    if v.ndim != 3:
        raise ValueError(f"expected a triangle soup, got shape {v.shape}")
    if v.shape[0] == 3 and v.shape[1] == 3 and v.shape[2] != 3:
        v = np.moveaxis(v, 2, 0)
    if valid is not None:
        v = v[np.asarray(valid, bool)]
    return np.ascontiguousarray(v)


def weld_mesh(verts: np.ndarray, valid: np.ndarray, decimals: int = 6):
    """Host-side soup → indexed mesh: dedup shared vertices, drop
    degenerate triangles. Marching-tet neighbours emit bit-identical
    crossing coordinates (same edge, same two field values), so welding
    on rounded coordinates closes the mesh exactly.

    Accepts either soup layout (see ``soup_triangles``). Returns
    ``(vertices [V,3] f32, faces [F,3] int32)``.
    """
    tris = soup_triangles(verts, valid)
    if tris.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    flat = tris.reshape(-1, 3)
    key = np.round(flat, decimals)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # degenerate = a triangle whose interpolated corners collapsed
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return uniq.astype(np.float32), faces[ok]
