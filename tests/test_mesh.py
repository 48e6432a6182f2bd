"""Mesh oracles: generated MC tables validated structurally, sphere mesh
vertex RMSE (SURVEY §4: mesh vertices at |v| ~ r within quantization
tolerance), watertightness, PLY round trip."""

import numpy as np

from chad_tsdf_tpu.mesh import marching_cubes, read_ply, write_ply
from chad_tsdf_tpu.mesh.tables import CORNERS, EDGES, TRI_TABLE
from chad_tsdf_tpu.ops import morton


def test_tables_structure():
    assert TRI_TABLE.shape == (256, 16)
    assert (TRI_TABLE[0] == -1).all() and (TRI_TABLE[255] == -1).all()
    for case in range(256):
        row = TRI_TABLE[case]
        n = (row != -1).sum()
        assert n % 3 == 0
        assert (row[n:] == -1).all()


def test_tables_separate_inside_outside():
    """Every case's patch must use exactly the sign-crossing edges."""
    for case in range(256):
        inside = [(case >> i) & 1 for i in range(8)]
        crossing = {e for e, (a, b) in enumerate(EDGES)
                    if inside[a] != inside[b]}
        used = {int(e) for e in TRI_TABLE[case] if e >= 0}
        assert used <= crossing
        # every crossing edge must appear in the triangulation
        assert crossing <= used or not crossing


def test_face_consistency_between_neighbours():
    """Boundary segments on a shared face must match between the two cells,
    so meshes never crack.  Each cube-face boundary is determined by the
    face's 4 corner signs; check all 256 cases agree with a canonical
    per-face-pattern segment multiset."""
    faces = {
        "z0": [0, 1, 2, 3], "z1": [4, 5, 6, 7],
        "y0": [0, 1, 5, 4], "y1": [3, 2, 6, 7],
        "x0": [0, 3, 7, 4], "x1": [1, 2, 6, 5],
    }
    edge_on_face = {}
    for fname, cs in faces.items():
        s = set(cs)
        edge_on_face[fname] = {e for e, (a, b) in enumerate(EDGES)
                               if a in s and b in s}
    canon: dict = {}
    for case in range(256):
        # boundary edges of the triangulated patch = edges used an odd
        # number of... use: patch boundary segments = triangle edges that
        # appear exactly once in the patch (interior edges appear twice)
        row = [int(e) for e in TRI_TABLE[case] if e >= 0]
        segs: dict = {}
        for t in range(0, len(row), 3):
            tri = row[t:t + 3]
            for i in range(3):
                a, b = tri[i], tri[(i + 1) % 3]
                k = frozenset((a, b))
                segs[k] = segs.get(k, 0) + 1
        boundary = {k for k, v in segs.items() if v == 1}
        for fname, cs in faces.items():
            pat = tuple((case >> c) & 1 for c in cs)
            onface = frozenset(k for k in boundary
                               if set(k) <= edge_on_face[fname])
            key = (fname, pat)
            if key in canon:
                assert canon[key] == onface, f"case {case} face {fname}"
            else:
                canon[key] = onface


def _sphere_samples(r=2.0, res=0.05, band=0.1):
    """Every voxel whose grid position is within ``band`` of the sphere."""
    n = int(np.ceil((r + 2 * band) / res)) + 1
    axis = np.arange(-n, n + 1, dtype=np.int32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    vox = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    dist = np.linalg.norm(vox.astype(np.float64) * res, axis=1) - r
    sel = np.abs(dist) <= band
    vox, dist = vox[sel], dist[sel]
    codes = morton.np_encode63(vox)
    order = np.argsort(codes)
    sd = np.clip(-dist, -band, band).astype(np.float32)
    return codes[order], sd[order]


def test_sphere_mesh_rmse_and_watertight():
    r, res = 2.0, 0.05
    codes, sd = _sphere_samples(r, res)
    mesh = marching_cubes(codes, sd, res)
    assert mesh.n_vertices > 10000
    assert mesh.n_faces > 10000
    radii = np.linalg.norm(mesh.vertices, axis=1)
    err = np.abs(radii - r)
    assert err.max() < res  # vertices within one voxel of the sphere
    assert np.sqrt((err ** 2).mean()) < 0.01

    # watertight where sampled: almost every edge shared by exactly 2 faces
    f = mesh.faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    # boundary edges only at the shell's sampling frontier
    assert (counts == 2).mean() > 0.95

    # normals defined and outward-ish or inward-ish consistently
    vdir = mesh.vertices / np.maximum(radii[:, None], 1e-9)
    cos = (mesh.vertex_normals * vdir).sum(1)
    assert (np.abs(cos) > 0.7).mean() > 0.95
    assert (cos > 0).all() or (cos < 0).all() or np.abs(cos.mean()) > 0.9


def test_ply_roundtrip(tmp_path):
    codes, sd = _sphere_samples(2.0, 0.1, 0.2)
    mesh = marching_cubes(codes, sd, 0.1)
    p = str(tmp_path / "m.ply")
    write_ply(p, mesh)
    back = read_ply(p)
    np.testing.assert_allclose(back.vertices, mesh.vertices, rtol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    np.testing.assert_allclose(back.vertex_normals, mesh.vertex_normals,
                               rtol=1e-6)


def test_taubin_smoothing_improves_noisy_sphere():
    """Contour smoothing (reference parity: optimizePlanarFaces,
    lvr2.cpp:262-266) must reduce quantization staircase noise without
    shrinking the surface."""
    import jax.numpy as jnp
    from chad_tsdf_tpu.mesh.optimize import taubin_smooth
    from chad_tsdf_tpu.ops import codec

    codes, sd = _sphere_samples(2.0, 0.05)
    # 8-bit quantization noise like a real finalized submap
    sd_q = np.asarray(codec.decode_sd(
        jnp, codec.encode_sd(jnp, jnp.asarray(sd), 0.1), 0.1))
    mesh = marching_cubes(codes, sd_q, 0.05)
    sm = taubin_smooth(mesh, 5)
    assert sm.n_vertices == mesh.n_vertices
    assert sm.n_faces == mesh.n_faces
    r0 = np.linalg.norm(mesh.vertices, axis=1)
    r1 = np.linalg.norm(sm.vertices, axis=1)
    assert abs(r1.mean() - r0.mean()) < 0.005   # no shrink/inflate
    assert r1.std() < r0.std()                  # staircase noise reduced


def test_device_mc_matches_host_mc():
    """The JAX marching-cubes backend must weld to the identical vertex set
    and triangle set as the numpy oracle (order-independent comparison —
    the two pipelines enumerate cells in different orders)."""
    from chad_tsdf_tpu.mesh.device_mc import marching_cubes_device

    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 1.0).astype(np.float32)

    # build sparse samples via a real map (covers block-boundary cells)
    from chad_tsdf_tpu import MapConfig, TSDFMap
    m = TSDFMap(config=MapConfig(max_points=20480, block_capacity=4096,
                                 touched_capacity=4096,
                                 accumulate_impl="xla"))
    m.insert(pts, np.zeros(3))
    codes, sd = m.voxel_samples()
    assert codes.shape[0] > 1000

    host = marching_cubes(codes, sd, 0.05)
    dev = marching_cubes_device(codes, sd, 0.05, cell_cap=1024)  # force retry

    # vertices are keyed by sorted unique canonical edge keys -> identical
    np.testing.assert_allclose(dev.vertices, host.vertices, atol=1e-6)
    # faces as canonical sorted set
    f1 = {tuple(sorted(f)) for f in host.faces.tolist()}
    f2 = {tuple(sorted(f)) for f in dev.faces.tolist()}
    assert f1 == f2
    assert dev.faces.shape == host.faces.shape


def test_golden_mesh_regression():
    """Golden-mesh fidelity scaffold (BASELINE "matches reference mesh"
    proxy): rebuild the fixed-seed sphere workload from scratch and require
    (a) the voxel set to match the committed golden exactly, and (b) vertex
    RMSE vs the golden mesh below a tenth of the quantization step.
    Regenerate via tools/make_golden.py only on intentional numerics
    changes."""
    import os
    from chad_tsdf_tpu import MapConfig, TSDFMap
    from chad_tsdf_tpu.mesh.rmse import analytic_sphere_rmse, vertex_rmse

    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "sphere_r2_seed420.npz"))
    rng = np.random.default_rng(420)
    d = rng.uniform(-1.0, 1.0, (65536, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * 2.0).astype(np.float32)

    m = TSDFMap(config=MapConfig(max_points=65536, block_capacity=16384,
                                 touched_capacity=8192,
                                 accumulate_impl="xla", mesh_impl="host"))
    m.insert(pts, np.zeros(3, np.float32))
    codes, sd = m.voxel_samples()
    np.testing.assert_array_equal(codes, g["codes"])
    # sd is quantized to trunc/127 by the codec; exact equality expected on
    # an unchanged pipeline, but allow one step for cross-platform f32 drift
    step = 0.1 / 127
    assert np.abs(sd - g["sd"]).max() <= step + 1e-7

    mesh = m.extract_mesh()
    r = vertex_rmse(mesh.vertices, g["vertices"])
    assert r["rmse"] < step / 10, r
    assert r["hausdorff"] < 2 * step, r
    # and both meshes must sit on the analytic r=2 sphere
    assert analytic_sphere_rmse(mesh.vertices, 2.0) < 1e-3
    assert analytic_sphere_rmse(g["vertices"], 2.0) < 1e-3


def _plane_samples(normal, offset, res=0.05, half=1.0, band=0.1):
    """Voxels within ``band`` of the plane n.p = offset over a square patch."""
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    m = int(np.ceil(half / res))
    axis = np.arange(-m, m + 1, dtype=np.int32)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    vox = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    dist = vox.astype(np.float64) * res @ n - offset
    keep = np.abs(dist) <= band
    vox, dist = vox[keep], dist[keep]
    return morton.np_encode63(vox), dist.astype(np.float32), n


def test_planar_optimize_coplanarizes_tilted_plane():
    """Reference parity: optimizePlanarFaces (lvr2.cpp:262-266).  A tilted
    plane meshed from 8-bit-quantized samples has staircase artifacts; the
    planar pass must pull vertices onto the regression plane without moving
    the surface (no volume loss)."""
    import jax.numpy as jnp
    from chad_tsdf_tpu.mesh.optimize import optimize_planar_faces
    from chad_tsdf_tpu.ops import codec

    codes, sd, n = _plane_samples([0.2, 0.1, 1.0], 0.1234)
    sd_q = np.asarray(codec.decode_sd(
        jnp, codec.encode_sd(jnp, jnp.asarray(sd), 0.1), 0.1))
    mesh = marching_cubes(codes, sd_q, 0.05)
    assert mesh.n_faces > 100
    opt = optimize_planar_faces(mesh, 5)

    def planarity_rms(v):
        # RMS distance to the BEST-FIT plane: the 8-bit codec's floor bias
        # shifts the whole surface ~half a quantum along the normal, so
        # distance to the *true* plane measures that bias, not staircase.
        # Interior only: the patch's cut border has open fan geometry the
        # optimizer rightly treats as contour.
        r = np.max(np.abs(v[:, :2]))
        v = v[np.all(np.abs(v[:, :2]) < 0.8 * r, axis=1)]
        c = v.mean(axis=0)
        w = np.linalg.svd(v - c, full_matrices=False)[2][-1]
        d = (v - c) @ w
        return float(np.sqrt(np.mean(d * d)))

    rms0 = planarity_rms(mesh.vertices.astype(np.float64))
    rms1 = planarity_rms(opt.vertices.astype(np.float64))
    assert rms1 < 0.2 * rms0, (rms0, rms1)
    # no volume loss/drift: mean offset along the normal stays put
    d0 = mesh.vertices.astype(np.float64) @ n
    d1 = opt.vertices.astype(np.float64) @ n
    assert abs(d1.mean() - d0.mean()) < 0.001


def test_planar_optimize_leaves_sphere_alone():
    """The planarity gate must reject smoothly curved regions: pairwise
    normal agreement chains around a sphere, but the cluster-level check
    discards it, so the sphere mesh is returned unchanged."""
    from chad_tsdf_tpu.mesh.optimize import optimize_planar_faces

    codes, sd = _sphere_samples(2.0, 0.05)
    mesh = marching_cubes(codes, sd, 0.05)
    opt = optimize_planar_faces(mesh, 5)
    disp = np.linalg.norm(opt.vertices - mesh.vertices, axis=1)
    assert float(disp.max()) < 1e-6


def test_reference_mesh_rmse():
    """BASELINE target 2: vertex RMSE vs the C++ reference's mesh.

    Auto-upgrading: skips until the out-of-band artifact
    tests/golden/reference_sphere.ply exists (produced by building the
    reference on a networked host — protocol in tools/compare_reference.py),
    then enforces the RMSE criterion."""
    import os

    import pytest

    ref_ply = os.path.join(os.path.dirname(__file__), "golden",
                           "reference_sphere.ply")
    if not os.path.exists(ref_ply):
        pytest.skip("reference mesh artifact not present; see "
                    "tools/compare_reference.py for the protocol")
    from chad_tsdf_tpu.mesh import read_ply
    from chad_tsdf_tpu.mesh.rmse import vertex_rmse

    codes, sd = _sphere_samples(5.0, 0.05)
    mesh = marching_cubes(codes, sd, 0.05)
    stats = vertex_rmse(mesh.vertices, read_ply(ref_ply).vertices)
    assert stats["rmse"] < 0.1 / 127 + 0.5 * 0.05


def test_device_weld_keys():
    """The device weld's u32 key pair must reproduce the host weld's u64
    canonical key exactly — including the host's silent truncation of
    bit 64 (axis-2 coordinate bit 20 after the <<2 shift)."""
    import jax.numpy as jnp

    from chad_tsdf_tpu.mesh.device_mc import _canonical_key_pair
    from chad_tsdf_tpu.ops import morton as mops

    rng = np.random.default_rng(1)
    coords = rng.integers(-(1 << 20), (1 << 20) - 1,
                          size=(4096, 3)).astype(np.int32)
    # include the bias-boundary neighbourhood where high bits flip
    coords[:8] = [[0, 0, 0], [-1, -1, -1], [1, 1, 1],
                  [-1, 0, 0], [0, -1, 0], [0, 0, -1],
                  [(1 << 20) - 1] * 3, [-(1 << 20)] * 3]
    axis = rng.integers(0, 3, size=4096).astype(np.int32)

    host_key = (mops.np_encode63(coords) << np.uint64(2)) | \
        axis.astype(np.uint64)
    khi, klo = _canonical_key_pair(
        (jnp.asarray(coords[:, 0])[None, :],
         jnp.asarray(coords[:, 1])[None, :],
         jnp.asarray(coords[:, 2])[None, :]),
        jnp.asarray(axis)[None, :])
    got = (np.asarray(khi)[0].astype(np.uint64) << np.uint64(32)) | \
        np.asarray(klo)[0].astype(np.uint64)
    np.testing.assert_array_equal(got, host_key)


def test_device_mc_no_surface():
    """An all-positive SDF field (no zero crossing) must mesh to an empty
    TriangleMesh through the full device path — exercises the n_tris=0 /
    n_verts=0 edges of the two-pass sizing and the device weld."""
    from chad_tsdf_tpu.mesh.device_mc import marching_cubes_device

    coords = np.stack(np.meshgrid(np.arange(8), np.arange(8), np.arange(8),
                                  indexing="ij"), -1).reshape(-1, 3)
    codes = np.sort(morton.np_encode63(coords.astype(np.int32)))
    sd = np.full(len(codes), 0.07, np.float32)       # all outside
    mesh = marching_cubes_device(codes, sd, 0.05)
    assert mesh.n_vertices == 0 and mesh.n_faces == 0
