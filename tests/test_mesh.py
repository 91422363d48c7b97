"""Organized meshing (pcl::OrganizedFastMesh role)."""
import os

import jax.numpy as jnp
import numpy as np

from pointcloud_stitching_tpu.ops import organized_mesh
from pointcloud_stitching_tpu.ops.mesh import mesh_cloud_arrays


def _grid(h=8, w=10, z=1.0, pitch=0.01):
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    xyz = np.stack([u * pitch, v * pitch, np.full_like(u, z, np.float64)],
                   -1).astype(np.float32)
    return xyz, np.ones((h, w), bool)


def test_full_grid_meshes_completely():
    xyz, mask = _grid()
    tri, ok = organized_mesh(jnp.asarray(xyz), jnp.asarray(mask),
                             max_edge=0.05)
    h, w = mask.shape
    assert tri.shape == (2 * (h - 1) * (w - 1), 3)
    assert bool(jnp.all(ok))
    # every triangle is a real triangle with distinct, in-range vertices
    t = np.asarray(tri)
    assert t.min() >= 0 and t.max() < h * w
    assert (t[:, 0] != t[:, 1]).all() and (t[:, 1] != t[:, 2]).all()


def test_depth_discontinuity_cuts_triangles():
    xyz, mask = _grid()
    xyz2 = xyz.copy()
    xyz2[:, 5:, 2] += 1.0  # a 1 m jump between columns 4 and 5
    _, ok1 = organized_mesh(jnp.asarray(xyz), jnp.asarray(mask), 0.05)
    tri, ok2 = organized_mesh(jnp.asarray(xyz2), jnp.asarray(mask), 0.05)
    assert int(ok2.sum()) < int(ok1.sum())
    # no surviving triangle spans the jump
    t = np.asarray(tri)[np.asarray(ok2)]
    cols = t % xyz.shape[1]
    assert not np.any((cols.min(axis=1) <= 4) & (cols.max(axis=1) >= 5))


def test_holes_remove_incident_triangles():
    xyz, mask = _grid()
    mask2 = mask.copy()
    mask2[3, 4] = False
    _, ok_full = organized_mesh(jnp.asarray(xyz), jnp.asarray(mask), 0.05)
    tri, ok = organized_mesh(jnp.asarray(xyz), jnp.asarray(mask2), 0.05)
    lost = int(ok_full.sum()) - int(ok.sum())
    assert lost == 6  # a grid-interior vertex touches 6 triangles
    t = np.asarray(tri)[np.asarray(ok)]
    assert not np.any(t == 3 * xyz.shape[1] + 4)


def test_winding_faces_the_sensor():
    """Counter-clockwise from the sensor at the origin looking along +z:
    every triangle normal must point back toward the sensor (-z)."""
    xyz, mask = _grid()
    verts, faces = mesh_cloud_arrays(xyz, mask, max_edge=0.05)
    p = verts[faces]
    n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    assert (n[:, 2] < 0).all()


def test_save_mesh_ply(tmp_path):
    from pointcloud_stitching_tpu.io import save_mesh
    xyz, mask = _grid(4, 5)
    verts, faces = mesh_cloud_arrays(xyz, mask, max_edge=0.05)
    p = str(tmp_path / "m.ply")
    save_mesh(p, verts, faces, binary=False)
    text = open(p).read().splitlines()
    assert f"element vertex {len(verts)}" in text
    assert f"element face {len(faces)}" in text
    body = text[text.index("end_header") + 1:]
    face_rows = body[len(verts):]
    assert all(r.startswith("3 ") for r in face_rows if r)
    # binary round: header parses, sizes consistent
    pb = str(tmp_path / "mb.ply")
    save_mesh(pb, verts, faces, binary=True)
    raw = open(pb, "rb").read()
    assert b"element face" in raw


def test_mesh_cli_end_to_end(tmp_path):
    from pointcloud_stitching_tpu.tools import mesh_cli
    rng = np.random.default_rng(0)
    depth = np.full((32, 48), 1000, np.uint16)
    depth[10:14, 20:26] = 0  # a hole
    npy = str(tmp_path / "d.npy")
    np.save(npy, depth)
    out = str(tmp_path / "mesh.ply")
    n = mesh_cli.main([npy, out, "--max-edge", "0.2"])
    assert n > 2000
    assert os.path.getsize(out) > 1000
