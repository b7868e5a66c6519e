"""CSG semantics tests against the reference's rayint_difference /
rayint_intersection behavior (Csg.hs:33-90)."""

import numpy as np
import jax.numpy as jnp

import glome_tpu as G
from glome_tpu.config import INFINITY
from glome_tpu.intersect import intersect
from glome_tpu.materials import Surface, light


import jax


def _setup(solid):
    compiled = G.compile_scene(solid, ())
    return compiled, compiled.arrays()


def _hits(compiled, arrays, origins, dirs):
    # jit the whole query: eager mode on this CI box pays ~0.5s of XLA
    # compile per *distinct op*, which makes unjitted intersect unusable
    o = np.asarray(origins, dtype=np.float32).reshape(-1, 3)
    d = np.asarray(dirs, dtype=np.float64).reshape(-1, 3)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    fn = jax.jit(lambda a, o_, d_: intersect(compiled, a, 0, o_, d_))
    return fn(arrays, o, d)


def test_difference_sphere_sphere():
    # unit sphere at origin minus sphere at (1,0,0) r=0.75
    s = G.difference(G.sphere((0, 0, 0), 1.0), G.sphere((1, 0, 0), 0.75))
    compiled, arrays = _setup(s)
    h = _hits(compiled, arrays,
              [[-5, 0, 0], [5, 0, 0], [0, 0, -5]],
              [[1, 0, 0], [-1, 0, 0], [0, 0, 1]])
    # from -x: A's entry surface at t=4 (not inside B)
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-4)
    np.testing.assert_allclose(h.norm[0], [-1, 0, 0], atol=1e-4)
    # from +x: first valid surface is B's boundary inside A (the scooped
    # bowl): B spans x in [0.25, 1.75]; ray enters B at x=1.75 (outside A,
    # invalid), exits B at x=0.25 which is inside A -> t = 5 - 0.25 = 4.75,
    # with B's normal flipped (pointing +x)
    np.testing.assert_allclose(h.t[1], 4.75, rtol=1e-4)
    np.testing.assert_allclose(h.norm[1], [1, 0, 0], atol=1e-4)
    # from -z straight at the middle: plain A hit at t=4
    np.testing.assert_allclose(h.t[2], 4.0, rtol=1e-4)


def test_difference_origin_inside_b():
    # origin inside the subtracted sphere: ray exits B inside A -> B's
    # exit surface with flipped normal (Csg.hs:35-43)
    s = G.difference(G.sphere((0, 0, 0), 2.0), G.sphere((0, 0, 0), 1.0))
    compiled, arrays = _setup(s)
    h = _hits(compiled, arrays, [[0, 0, 0]], [[0, 0, 1]])
    np.testing.assert_allclose(h.t[0], 1.0, rtol=1e-4)
    np.testing.assert_allclose(h.norm[0], [0, 0, -1], atol=1e-4)


def test_difference_miss_when_fully_subtracted():
    s = G.difference(G.sphere((0, 0, 0), 1.0), G.sphere((0, 0, 0), 2.0))
    compiled, arrays = _setup(s)
    h = _hits(compiled, arrays, [[-5, 0, 0]], [[1, 0, 0]])
    assert not bool(h.hit[0])


def test_intersection_of_spheres():
    # lens: spheres at +-0.5 with radius 1 -> overlap x in [-0.5, 0.5]
    s = G.intersection([G.sphere((-0.5, 0, 0), 1.0),
                        G.sphere((0.5, 0, 0), 1.0)])
    compiled, arrays = _setup(s)
    h = _hits(compiled, arrays, [[-5, 0, 0], [0, 0, 0]],
              [[1, 0, 0], [1, 0, 0]])
    # entry: surface of right sphere at x=-0.5 -> t=4.5
    np.testing.assert_allclose(h.t[0], 4.5, rtol=1e-4)
    np.testing.assert_allclose(h.norm[0], [-1, 0, 0], atol=1e-4)
    # from inside the lens: exit = left sphere's surface at x=0.5
    np.testing.assert_allclose(h.t[1], 0.5, rtol=1e-4)
    np.testing.assert_allclose(h.norm[1], [1, 0, 0], atol=1e-4)


def test_intersection_of_planes_cube():
    # 6 half-spaces forming a unit cube (polyhedra from planes,
    # Csg.hs:60-63 / TestScene icosahedron construction)
    planes = [G.plane_offset(np.array(n, dtype=float), 1.0)
              for n in [(1, 0, 0), (-1, 0, 0), (0, 1, 0),
                        (0, -1, 0), (0, 0, 1), (0, 0, -1)]]
    s = G.intersection(planes)
    compiled, arrays = _setup(s)
    h = _hits(compiled, arrays, [[-5, 0.2, 0.3], [0, 0, 0]],
              [[1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(h.t[0], 4.0, rtol=1e-4)
    np.testing.assert_allclose(h.norm[0], [-1, 0, 0], atol=1e-4)
    np.testing.assert_allclose(h.t[1], 1.0, rtol=1e-4)
    np.testing.assert_allclose(h.norm[1], [0, 1, 0], atol=1e-4)


def test_difference_group_retexture():
    # difference of a *group* (two boxes) minus a sphere spanning both;
    # B-surface hits take the texture of the containing A member
    # (get_metainfo semantics, Csg.hs:39-41)
    m1 = G.t_uniform(Surface(color=(1, 0, 0)))
    m2 = G.t_uniform(Surface(color=(0, 1, 0)))
    a = G.group([G.tex(G.box((-2, -1, -1), (0, 1, 1)), m1),
                 G.tex(G.box((0, -1, -1), (2, 1, 1)), m2)])
    s = G.difference(a, G.sphere((0, 0, 0), 0.8))
    compiled, arrays = _setup(s)
    # ray along x through the center: A entry at x=-2 is valid (outside B)
    h = _hits(compiled, arrays, [[-5, 0, 0]], [[1, 0, 0]])
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-4)
    # ray entering through the hollow: origin at center of sphere, moving +x;
    # B exit at x=0.8 is inside box 2 -> retextured with m2 (tex id 1)
    h = _hits(compiled, arrays, [[0, 0, 0]], [[1, 0, 0]])
    np.testing.assert_allclose(h.t[0], 0.8, rtol=1e-4)
    assert int(h.tex_stack[0, 0]) == 1
    # B's outward normal (1,0,0) is inverted (Csg.hs:41) to face the hollow
    np.testing.assert_allclose(h.norm[0], [-1, 0, 0], atol=1e-4)


def test_difference_of_transformed_group():
    # chessboard pattern: scaled boxes minus sphere (TestScene.hs:185)
    boxes = [G.box((x, 0, 0), (x + 1, 1, 1)) for x in (-2, -1, 0, 1)]
    a = G.transform(G.group(boxes), [G.scale((1, 2, 1))])
    s = G.difference(a, G.sphere((0, 1, 0.5), 0.9))
    compiled, arrays = _setup(s)
    # ray down the y axis at x=-1.5: boxes scale to y in [0,2]; the sphere
    # doesn't reach x=-1.5, so plain top face at y=2
    h = _hits(compiled, arrays, [[-1.5, 5, 0.5]], [[0, -1, 0]])
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-4)
    # ray down at x=0.5 z=0.5 through sphere center: top face y=2 valid
    # (outside sphere radius 0.9 centered y=1)... 2 > 1+0.9 so valid
    h = _hits(compiled, arrays, [[0.5, 5, 0.5]], [[0, -1, 0]])
    np.testing.assert_allclose(h.t[0], 3.0, rtol=1e-4)


def test_csg_shadow_pass():
    # shadows must respect CSG: a fully-subtracted solid casts no shadow
    s = G.difference(G.sphere((0, 0, 0), 1.0), G.sphere((0, 0, 0), 2.0))
    compiled, arrays = _setup(s)
    from glome_tpu.intersect import shadow_query
    o = jnp.asarray([[-5.0, 0, 0]])
    d = jnp.asarray([[1.0, 0, 0]])
    blocked = shadow_query(compiled, arrays, 0, o, d,
                           jnp.asarray([10.0]))
    assert not bool(blocked[0])


def test_convex_fast_path_matches_general_path():
    # an icosahedron-style convex intersection (planes + bounding sphere,
    # some transformed members) must produce identical hits through the
    # convex interval fast path and the general inline/deferred path
    rng = np.random.RandomState(7)
    members = []
    for i in range(9):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        members.append(G.plane_offset(n, rng.uniform(0.6, 1.2)))
    members.append(G.sphere((0.1, -0.05, 0.0), 1.15))
    members.append(G.transform(
        G.cylinder((0, 0, -1.2), (0, 0, 1.2), 1.1),
        [G.rotate((1, 0, 0), 10.0)]))
    solid = G.intersection(members)

    compiled, arrays = _setup(solid)
    assert any(c.convex for c in compiled.scenes[0].csgs)

    from glome_tpu.compile import Compiler
    orig = Compiler._convex_cids
    try:
        Compiler._convex_cids = lambda self, build: set()
        compiled_gen, arrays_gen = _setup(solid)
    finally:
        Compiler._convex_cids = orig
    assert not any(c.convex for c in compiled_gen.scenes[0].csgs)

    n = 512
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3))
    dd = (dd / np.linalg.norm(dd, axis=-1, keepdims=True)).astype(np.float32)

    fa = jax.jit(lambda a, o_, d_: intersect(compiled, a, 0, o_, d_))
    fb = jax.jit(lambda a, o_, d_: intersect(compiled_gen, a, 0, o_, d_))
    ha = fa(arrays, o, dd)
    hb = fb(arrays_gen, o, dd)
    np.testing.assert_array_equal(np.asarray(ha.hit), np.asarray(hb.hit))
    hit = np.asarray(ha.hit)
    np.testing.assert_allclose(np.asarray(ha.t)[hit], np.asarray(hb.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ha.norm)[hit],
                               np.asarray(hb.norm)[hit],
                               rtol=1e-3, atol=1e-3)


# --- nested CSG (Csg.hs:14-15: members are arbitrary SolidItems) -----------

def _march_oracle(inside_fn, o, d, tmax=20.0, steps=8000):
    """First boundary crossing of a point-set membership function along
    a ray (dense march + bisection refine) -- the scalar oracle for
    nested CSG surface semantics."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    d = d / np.linalg.norm(d)
    ts = np.linspace(1e-6, tmax, steps)
    ins = inside_fn(o[None] + ts[:, None] * d[None])
    flip = np.nonzero(ins[1:] != ins[:-1])[0]
    if len(flip) == 0:
        return None
    lo, hi = ts[flip[0]], ts[flip[0] + 1]
    ref = ins[flip[0]]
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if inside_fn((o + mid * d)[None])[0] != ref:
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


def _in_sphere(c, r):
    c = np.asarray(c, np.float64)
    return lambda p: np.sum((p - c) ** 2, axis=-1) < r * r


def _sweep_vs_oracle(solid, inside_fn, seed=0, n=64):
    """Random ray sweep: engine nearest-hit == oracle first crossing.

    Origins INSIDE the region are skipped: the reference advances past
    subtracted-cavity entry walls seen from within the solid
    (rayint_advance, Csg.hs:43,52) and reports the far wall, so the
    naive membership-flip oracle only matches for outside origins.
    test_inside_origin_cavity_semantics pins the inside-origin
    behavior directly against the reference's case analysis."""
    rng = np.random.default_rng(seed)
    o = rng.normal(0, 3.0, (n, 3))
    at = rng.normal(0, 0.6, (n, 3))
    d = at - o
    compiled, arrays = _setup(solid)
    h = _hits(compiled, arrays, o, d)
    t = np.asarray(h.t)
    hit = np.asarray(h.hit)
    for i in range(n):
        if inside_fn(o[i][None])[0]:
            continue
        want = _march_oracle(inside_fn, o[i], d[i])
        if want is None:
            assert not hit[i], f"ray {i}: engine hit {t[i]}, oracle miss"
        else:
            assert hit[i], f"ray {i}: engine miss, oracle {want}"
            np.testing.assert_allclose(t[i], want, rtol=2e-3, atol=2e-3,
                                       err_msg=f"ray {i}")


def test_difference_of_intersection():
    # (s1 & s2) - s3: a lens with a bite taken out
    s1, r1 = (-0.5, 0, 0), 1.0
    s2, r2 = (0.5, 0, 0), 1.0
    s3, r3 = (0.0, 0.45, 0), 0.5
    solid = G.difference(
        G.intersection([G.sphere(s1, r1), G.sphere(s2, r2)]),
        G.sphere(s3, r3))
    in1, in2, in3 = _in_sphere(s1, r1), _in_sphere(s2, r2), _in_sphere(s3, r3)
    _sweep_vs_oracle(solid, lambda p: in1(p) & in2(p) & ~in3(p))


def test_intersection_containing_difference():
    # (s1 - s2) & s3
    s1, r1 = (0, 0, 0), 1.0
    s2, r2 = (0.6, 0, 0), 0.7
    s3, r3 = (-0.2, 0.1, 0), 0.9
    solid = G.intersection([
        G.difference(G.sphere(s1, r1), G.sphere(s2, r2)),
        G.sphere(s3, r3)])
    in1, in2, in3 = _in_sphere(s1, r1), _in_sphere(s2, r2), _in_sphere(s3, r3)
    _sweep_vs_oracle(solid, lambda p: in1(p) & ~in2(p) & in3(p), seed=1)


def test_difference_of_difference():
    # (s1 - s2) - s3
    s1, r1 = (0, 0, 0), 1.2
    s2, r2 = (0.8, 0, 0), 0.6
    s3, r3 = (-0.8, 0.2, 0), 0.6
    solid = G.difference(
        G.difference(G.sphere(s1, r1), G.sphere(s2, r2)),
        G.sphere(s3, r3))
    in1, in2, in3 = _in_sphere(s1, r1), _in_sphere(s2, r2), _in_sphere(s3, r3)
    _sweep_vs_oracle(solid, lambda p: in1(p) & ~in2(p) & ~in3(p), seed=2)


def test_nested_csg_under_instance():
    # transform wrapped around a nested CSG distributes onto every clause
    import glome_tpu.xfm as X
    inner = G.intersection([G.sphere((-0.5, 0, 0), 1.0),
                            G.sphere((0.5, 0, 0), 1.0)])
    solid = G.transform(G.difference(inner, G.sphere((0, 0.45, 0), 0.5)),
                        [X.translate((0, 0, 2.0))])
    in1 = _in_sphere((-0.5, 0, 2.0), 1.0)
    in2 = _in_sphere((0.5, 0, 2.0), 1.0)
    in3 = _in_sphere((0, 0.45, 2.0), 0.5)
    _sweep_vs_oracle(solid, lambda p: in1(p) & in2(p) & ~in3(p), seed=3)


# --- non-conjunctive nesting: DNF expansion with sibling-region
# exclusion (Csg.hs members are arbitrary SolidItems) -----------------

def test_difference_of_intersection_member():
    # a - (b & c)  ==  (a-b) | (a-c): sibling validation must discard
    # union-interior surfaces
    a, b, c = ((0, 0, 0), 1.2), ((0.45, 0, 0), 0.9), ((-0.45, 0, 0), 0.9)
    solid = G.difference(G.sphere(*a),
                         G.intersection([G.sphere(*b), G.sphere(*c)]))
    ina, inb, inc = (_in_sphere(*a), _in_sphere(*b), _in_sphere(*c))
    _sweep_vs_oracle(solid, lambda p: ina(p) & ~(inb(p) & inc(p)), seed=4)


def test_difference_of_difference_member():
    # a - (b - c)  ==  (a-b) | (a & c)
    a, b, c = ((0, 0, 0), 1.2), ((0.5, 0, 0), 0.9), ((0.3, 0.3, 0), 0.6)
    solid = G.difference(G.sphere(*a),
                         G.difference(G.sphere(*b), G.sphere(*c)))
    ina, inb, inc = (_in_sphere(*a), _in_sphere(*b), _in_sphere(*c))
    _sweep_vs_oracle(solid, lambda p: ina(p) & ~(inb(p) & ~inc(p)),
                     seed=5)


def test_union_containing_csg_member():
    # (a | (b & c)) - e: a union whose member is itself a CSG
    a, b, c = ((-0.6, 0, 0), 0.8), ((0.5, 0, 0), 0.9), ((0.9, 0, 0), 0.9)
    e = ((0, 0.5, 0), 0.5)
    solid = G.difference(
        G.group([G.sphere(*a),
                 G.intersection([G.sphere(*b), G.sphere(*c)])]),
        G.sphere(*e))
    ina, inb, inc, ine = (_in_sphere(*a), _in_sphere(*b),
                          _in_sphere(*c), _in_sphere(*e))
    _sweep_vs_oracle(
        solid, lambda p: (ina(p) | (inb(p) & inc(p))) & ~ine(p), seed=6)


def test_nonconjunctive_megakernel_parity():
    """The Pallas megakernel path (interpret mode here) agrees with the
    jnp path on a non-conjunctive scene."""
    from glome_tpu import megakernel as MK
    a, b, c = ((0, 0, 0), 1.2), ((0.45, 0, 0), 0.9), ((-0.45, 0, 0), 0.9)
    solid = G.difference(G.sphere(*a),
                         G.intersection([G.sphere(*b), G.sphere(*c)]))
    compiled, arrays = _setup(solid)
    rng = np.random.default_rng(7)
    o = rng.normal(0, 3.0, (256, 3)).astype(np.float32)
    d = rng.normal(0, 1.0, (256, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    h1 = _hits(compiled, arrays, o, d)
    h2 = MK.mega_intersect(compiled, arrays, jnp.asarray(o),
                           jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m],
                               rtol=1e-4, atol=1e-4)


def test_inside_origin_cavity_semantics():
    """From INSIDE the solid looking into a subtracted cavity, the
    reference advances past the cavity's entry wall and reports its FAR
    wall with flipped normal (Csg.hs:33-54: origin-outside-B branch
    advances past bd, the recast's origin-inside-B branch returns B's
    exit).  Pin that exactly."""
    solid = G.difference(G.sphere((0, 0, 0), 2.0),
                         G.sphere((1.0, 0, 0), 0.5))
    compiled, arrays = _setup(solid)
    h = _hits(compiled, arrays, [[0, 0, 0]], [[1, 0, 0]])
    np.testing.assert_allclose(h.t[0], 1.5, rtol=1e-5)
    np.testing.assert_allclose(h.norm[0], [-1, 0, 0], atol=1e-5)
    # the same through a non-conjunctive subtracted side: the recast
    # lands on the subtracted intersection's exit (B exits first)
    solid2 = G.difference(
        G.sphere((0, 0, 0), 2.0),
        G.intersection([G.sphere((1.0, 0, 0), 0.5),
                        G.sphere((1.1, 0, 0), 0.6)]))
    compiled2, arrays2 = _setup(solid2)
    h2 = _hits(compiled2, arrays2, [[0, 0, 0]], [[1, 0, 0]])
    np.testing.assert_allclose(h2.t[0], 1.5, rtol=1e-5)
