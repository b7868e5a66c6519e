"""rayint_debug work-counter parity (Solid.hs:155, Bih.hs:378-412).

The counters must reflect the engine's real execution model: dense
groups cost their full size per ray, BVH rays only pay for the node
boxes their tile descends and the leaf prims it tests -- so a ray that
misses the whole structure counts far less than one through the middle.
"""

import numpy as np
import jax
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.debug import ray_debug_counts
from glome_tpu.materials import Surface, Uniform


def test_dense_group_counts_full_size():
    scene = G.group([G.sphere((i, 0, 0), 0.3) for i in range(10)])
    compiled = G.compile_scene(scene, ())
    o = jnp.asarray([[0, 0, -5]], jnp.float32)
    d = jnp.asarray([[0, 0, 1]], jnp.float32)
    prims, nodes = ray_debug_counts(compiled, compiled.arrays(), o, d)
    assert int(prims[0]) == 10
    assert int(nodes[0]) == 0


def test_bvh_counts_depend_on_ray():
    # large lattice -> BVH; a ray through the middle tests many nodes,
    # a ray missing everything tests only the root's rejection
    lat = [G.sphere((0.5 * a, 0.5 * b, 5 + 0.5 * c), 0.2)
           for a in range(15) for b in range(15) for c in range(15)]
    compiled = G.compile_scene(G.group(lat), (), accel_min_size=512)
    g = compiled.scenes[0].groups[0]
    assert g.accel is not None
    o = jnp.asarray([[3.5, 3.5, -5], [400, 400, -5]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    fn = jax.jit(lambda a, o_, d_: ray_debug_counts(compiled, a, o_, d_))
    prims, nodes = fn(compiled.arrays(), o, d)
    # through the lattice: real traversal work, but far below brute force
    assert 0 < int(prims[0]) < len(lat)
    assert int(nodes[0]) > 10
    # clean miss: no nodes hit (tile-mates share the miss here)
    assert int(nodes[1]) == 0 and int(prims[1]) == 0


def test_debug_image_runs():
    from glome_tpu.debug import debug_image
    from glome_tpu.scenes.testscene import cust_cam
    m = Uniform(Surface(color=(1, 0, 0), ambient=1.0))
    scene = G.tex(G.sphere((0, 0, 0), 1.0), m)
    compiled = G.compile_scene(scene, ())
    img, prims, nodes = debug_image(compiled, compiled.arrays(),
                                    cust_cam(), 32, 24)
    assert img.shape == (24, 32, 3)
    assert np.all((img >= 0) & (img <= 1))
    assert prims.max() > 0


def test_trace_debug_full_trace():
    """trace_debug parity (Trace.hs:86-109): the full-trace counters
    include shadow and child-ray work, so a lit reflective pixel costs
    strictly more than its primary-only rayint count, and deeper
    recursion never costs less."""
    from glome_tpu.debug import trace_debug_counts
    from glome_tpu.materials import Reflect, light
    mirror = Uniform(Reflect())
    matte = Uniform(Surface(color=(0.5, 0.5, 0.5), ambient=0.1, kd=0.9))
    scene = G.group([
        G.tex(G.sphere((0.0, 0.0, 0.0), 1.0), mirror),
        G.tex(G.plane((0.0, -1.5, 0.0), (0.0, 1.0, 0.0)), matte),
    ])
    # camera-side light so the front hit point faces it (preshade
    # culls back-facing lights, Shader.hs:70-80)
    lights = [light((3.0, 4.0, -6.0), (1.0, 1.0, 1.0))]
    compiled = G.compile_scene(scene, lights)
    arrays = compiled.arrays()
    # ray 0 hits the mirror sphere (shadow + reflection child);
    # ray 1 misses everything but the floor far away
    o = jnp.asarray([[0, 0, -4], [50, 0.5, -4]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    p0, n0 = ray_debug_counts(compiled, arrays, o, d)
    def fn(r):
        return jax.jit(lambda a, o_, d_: trace_debug_counts(
            compiled, a, o_, d_, recurs=r))
    p1, _ = fn(1)(arrays, o, d)
    p2, _ = fn(2)(arrays, o, d)
    p3, _ = fn(3)(arrays, o, d)
    # full trace strictly exceeds primary-only on the hit pixel
    assert int(p1[0]) > int(p0[0])
    # deeper recursion monotonically adds child work
    assert int(p2[0]) > int(p1[0])
    assert int(p3[0]) >= int(p2[0])
