"""Shared-vertex device-side mesh (reference Mesh.hs; VERDICT r1 #5).

The compiled mesh keeps verts/norms as SoA device tables; per-triangle
params are differentiable index gathers (group_device_params), so
gradients w.r.t. a vertex accumulate over every triangle sharing it,
and a 100k-triangle scene compiles in about a second instead of a
100k-iteration host loop.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import glome_tpu as G
from glome_tpu.intersect import intersect
from glome_tpu.materials import Surface, Uniform, light


def _quad_mesh(norms=False):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    nrm = np.array([[0, 0, -1], [0, -0.5, -1], [0, 0.5, -1], [0, 0, -1]],
                   float)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    ni = (np.array([[0, 1, 2], [1, 3, 2]], np.int32) if norms
          else np.full((2, 3), -1, np.int32))
    tris = np.concatenate(
        [np.array([[0, 1, 2], [1, 3, 2]], np.int32), ni,
         np.full((2, 2), -1, np.int32)], axis=1)
    return verts, (nrm if norms else None), tris


def test_mesh_is_soa_on_device():
    verts, _, tris = _quad_mesh()
    compiled = G.compile_scene(G.mesh(verts, None, tris), ())
    g = compiled.scenes[0].groups[0]
    assert g.mesh_src is not None
    arrays = compiled.arrays()
    assert set(arrays["scenes"][0][0].keys()) == {"verts"}
    assert arrays["scenes"][0][0]["verts"].shape == (4, 3)


def test_mesh_matches_baked_triangles():
    verts, _, tris = _quad_mesh()
    cm = G.compile_scene(G.mesh(verts, None, tris), ())
    cb = G.compile_scene(G.group([
        G.noshadow(G.triangle(verts[0], verts[1], verts[2])),
        G.noshadow(G.triangle(verts[1], verts[3], verts[2]))]), ())
    rng = np.random.default_rng(0)
    o = np.concatenate([rng.uniform([0, 0, -3], [1, 1, -1], (64, 3)),
                        [[5, 5, -2]]]).astype(np.float32)
    d = np.tile(np.float32([0, 0, 1]), (65, 1))
    hm = jax.jit(lambda a: intersect(cm, a, 0, jnp.asarray(o),
                                     jnp.asarray(d)))(cm.arrays())
    hb = jax.jit(lambda a: intersect(cb, a, 0, jnp.asarray(o),
                                     jnp.asarray(d)))(cb.arrays())
    np.testing.assert_allclose(np.asarray(hm.t), np.asarray(hb.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hm.hit), np.asarray(hb.hit))
    np.testing.assert_allclose(np.asarray(hm.norm), np.asarray(hb.norm),
                               atol=1e-6)


def test_mesh_smooth_normals():
    verts, nrm, tris = _quad_mesh(norms=True)
    cm = G.compile_scene(G.mesh(verts, nrm, tris), ())
    g = cm.scenes[0].groups[0]
    assert g.ptype == "trianglenorm"
    o = jnp.asarray([[0.5, 0.2, -2.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    h = jax.jit(lambda a: intersect(cm, a, 0, o, d))(cm.arrays())
    n = np.asarray(h.norm)[0]
    # interpolated normal: not the flat (0,0,-1)
    assert abs(n[1]) > 1e-3 and n[2] < 0


def test_mesh_gradients_accumulate_on_shared_verts():
    verts, _, tris = _quad_mesh()
    cm = G.compile_scene(G.mesh(verts, None, tris), ())
    arrays = jax.tree.map(jnp.asarray, cm.arrays())
    # one ray through each triangle: both depend on shared verts 1, 2
    o = jnp.asarray([[0.4, 0.3, -2.0], [0.9, 0.9, -2.0]], jnp.float32)
    d = jnp.asarray([[0, 0, 1.0]] * 2, jnp.float32)

    def loss(a):
        h = intersect(cm, a, 0, o, d)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    gv = np.asarray(jax.jit(jax.grad(loss))(arrays)["scenes"][0][0]["verts"])
    assert gv.shape == (4, 3)
    # every vertex of a hit triangle received gradient; shared verts sum
    assert np.all(np.abs(gv[:, 2]) > 1e-6)
    # moving the whole mesh +z moves both hits +z: total dt/dz == 2
    np.testing.assert_allclose(gv[:, 2].sum(), 2.0, rtol=1e-4)


def test_mesh_per_tri_textures_and_tags():
    verts, _, tris = _quad_mesh()
    tris = tris.copy()
    tris[0, 6] = 0   # tri 0 -> texture 0
    tris[1, 7] = 0   # tri 1 -> tag 0
    tex = Uniform(Surface(color=(1, 0, 0), ambient=1.0))
    cm = G.compile_scene(G.mesh(verts, None, tris, textures=(tex,),
                                tags=("lid",)), ())
    g = cm.scenes[0].groups[0]
    # per-tri stacks live on the innermost layer (Mesh.hs:148-153)
    serial_to_row = {int(s): i for i, s in enumerate(g.prim_serial)}
    r0, r1 = serial_to_row[0], serial_to_row[1]
    assert g.tex_stack[r0, 0] >= 0 and g.tex_stack[r1, 0] < 0
    assert g.tag_stack[r1, 0] >= 0 and g.tag_stack[r0, 0] < 0
    assert cm.tag_names[g.tag_stack[r1, 0]] == "lid"


def test_mesh_100k_compiles_fast():
    from glome_tpu.scenes.meshscene import mesh_scene
    t0 = time.time()
    solid, lights, cam = mesh_scene(100_000)
    compiled = G.compile_scene(solid, lights)
    dt = time.time() - t0
    g = [g for g in compiled.scenes[0].groups if g.mesh_src is not None][0]
    assert g.size > 90_000
    assert g.accel is not None          # per-mesh BVH attached
    assert dt < 60.0, f"mesh compile took {dt:.1f}s"
    # a few rays actually traverse the 100k-tri BVH
    o = jnp.asarray([[0.0, 1.2, -3.4]] * 4, jnp.float32)
    at = jnp.asarray([[0, 0, 0], [0.3, 0.2, 0], [-0.4, 0.1, 0],
                      [8, 8, 0]], jnp.float32)
    d = at - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h = jax.jit(lambda a: intersect(compiled, a, 0, o, d))(compiled.arrays())
    assert bool(np.asarray(h.hit)[:3].all())


def test_mega_external_group_offload(monkeypatch):
    """Oversized mesh groups run as a separate dense launch merged with
    the megakernel result (MEGA_EXT_MIN); parity with the jnp path."""
    from glome_tpu import megakernel as MK
    monkeypatch.setattr(MK, "MEGA_EXT_MIN", 8)
    monkeypatch.setattr(MK, "BLOCK_VMEM_MAX", 0)

    rng = np.random.default_rng(3)
    V = rng.uniform(-1, 1, (40, 3))
    tri_idx = rng.integers(0, 40, (60, 3)).astype(np.int32)
    ok = (tri_idx[:, 0] != tri_idx[:, 1]) & (tri_idx[:, 1] != tri_idx[:, 2])
    tri_idx = tri_idx[ok]
    tris = np.concatenate([tri_idx, np.full((len(tri_idx), 5), -1,
                                            np.int32)], axis=1)
    solid = G.group([G.mesh(V, None, tris),
                     G.sphere((0, 0, 3.0), 0.5)])
    compiled = G.compile_scene(solid, (light((0, 5, 0), (10, 10, 10)),))
    plan = MK.get_plan(compiled)
    assert plan.external, "mesh group was not externalized"
    arrays = compiled.arrays()
    o = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    o[:, 2] = -4.0
    at = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    d = at - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    got = MK.mega_intersect(compiled, arrays, o, d, interpret=True)
    want = intersect(compiled, arrays, 0, o, d)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.prim_serial),
                                  np.asarray(want.prim_serial))
    # shadow variant
    tm = jnp.full((o.shape[0],), 8.0, jnp.float32)
    gs = MK.mega_shadow(compiled, arrays, o, d, tmax=tm, interpret=True)
    from glome_tpu.intersect import shadow_query
    ws = shadow_query(compiled, arrays, 0, o, d, tm)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))


def test_mega_mesh_block_routing(monkeypatch):
    """VMEM-sized mesh groups route to the block kernel (whole table
    resident, ordered walk) instead of the HBM-DMA external pass;
    parity with the jnp path, intersect and shadow."""
    from glome_tpu import megakernel as MK
    monkeypatch.setattr(MK, "MEGA_EXT_MIN", 8)
    monkeypatch.setattr(MK, "BLOCK_MIN", 8)

    rng = np.random.default_rng(7)
    V = rng.uniform(-1, 1, (40, 3))
    tri_idx = rng.integers(0, 40, (60, 3)).astype(np.int32)
    ok = (tri_idx[:, 0] != tri_idx[:, 1]) & (tri_idx[:, 1] != tri_idx[:, 2])
    tri_idx = tri_idx[ok]
    tris = np.concatenate([tri_idx, np.full((len(tri_idx), 5), -1,
                                            np.int32)], axis=1)
    solid = G.group([G.mesh(V, None, tris),
                     G.sphere((0, 0, 3.0), 0.5)])
    compiled = G.compile_scene(solid, (light((0, 5, 0), (10, 10, 10)),))
    from glome_tpu import megakernel as MK2
    plan = MK2.get_plan(compiled)
    assert plan.blocks and not plan.external
    arrays = compiled.arrays()
    o = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    o[:, 2] = -4.0
    at = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    d = at - o
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    got = MK2.mega_intersect(compiled, arrays, o, d, interpret=True)
    want = intersect(compiled, arrays, 0, o, d)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.prim_serial),
                                  np.asarray(want.prim_serial))
    tm = jnp.full((o.shape[0],), 8.0, jnp.float32)
    gs = MK2.mega_shadow(compiled, arrays, o, d, tmax=tm, interpret=True)
    from glome_tpu.intersect import shadow_query
    ws = shadow_query(compiled, arrays, 0, o, d, tm)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))


def test_mesh_cast_shadows_option():
    """mesh(..., cast_shadows=True) makes triangles occlude shadow
    rays; the default preserves the reference's no-shadow quirk
    (Mesh.hs:210) -- VERDICT r3 #7."""
    from glome_tpu.intersect import shadow_query

    verts, _n, tris = _quad_mesh()
    matte = Uniform(Surface(color=(1, 1, 1), kd=1.0))
    lights = [light((0.5, 0.5, -5.0), (1, 1, 1))]
    # a shadow segment passing straight through the quad at z=0
    o = jnp.asarray(np.array([[0.4, 0.4, -2.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    tmax = jnp.asarray(np.array([4.0], np.float32))

    for cast, want in ((False, False), (True, True)):
        solid = G.tex(G.mesh(verts, None, tris, cast_shadows=cast),
                      matte)
        compiled = G.compile_scene(solid, lights)
        blocked = shadow_query(compiled, compiled.arrays(), 0, o, d,
                               tmax)
        assert bool(np.asarray(blocked)[0]) == want, (cast, blocked)
        # primary visibility is unaffected by the shadow flag
        h = intersect(compiled, compiled.arrays(), 0, o, d)
        assert bool(np.asarray(h.hit)[0])
