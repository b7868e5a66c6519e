"""Host-side scene building / compiling structure checks (fast, no jit)."""

import numpy as np

import glome_tpu as G
from glome_tpu.scenes import test_scene, simple_scene
from glome_tpu.scenes.testscene import chessboard, icosahedron, coil, oak


def test_primcount_parity_shape():
    solid, lights, cam = test_scene()
    prims, xfms, bounds = G.primcount(solid)
    # lattice 9261 + oak (1023 cones + 1024 leaves) + chessboard 64 +
    # spheres/planes of the polyhedra + portal + refract sphere
    assert prims > 11000
    assert xfms > 2000
    assert bounds == 1023  # oak's manual bound spheres (Bound.hs)


def test_testscene_compiles():
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    sc = compiled.scenes[0]
    total = sum(g.size for g in sc.groups)
    # compile-time CSG simplification drops lattice spheres wholly inside
    # the subtracted sphere, so fewer prims than the raw DAG count
    assert 5000 < total < G.primcount(solid)[0]
    # boundary-crossing lattice spheres keep an inline constraint group
    inline = [g for g in sc.groups if g.vclass == "inline"]
    assert any(g.size >= 1000 for g in inline)
    # the portal frame is its own sub-scene
    assert len(compiled.scenes) == 2
    assert len(compiled.warp_mats) == 1
    assert compiled.warp_mats[0].target_scene == 0
    # CSG objects: chessboard diff, dodeca+icosa intersections,
    # lattice diff, portal frame diff
    kinds = sorted(c.kind for c in sc.csgs)
    assert kinds.count("difference") == 3
    assert kinds.count("intersection") == 2
    assert "dodecahedron" in compiled.tag_names
    assert "tree" in compiled.tag_names


def test_instance_merging():
    s = G.transform(G.transform(G.sphere((1, 0, 0), 1.0),
                                [G.scale((2, 1, 1))]),
                    [G.translate((0, 5, 0))])
    # nested transforms collapse into one Instance (Solid.hs:494-496)
    from glome_tpu.solids import Instance, Sphere
    assert isinstance(s, Instance)
    assert isinstance(s.item, Sphere)
    np.testing.assert_allclose(s.xfm.point([1, 0, 0]), [2, 5, 0], atol=1e-9)


def test_sphere_baking_under_uniform_scale():
    s = G.transform(G.sphere((1, 0, 0), 1.0),
                    [G.rotate((0, 0, 1), G.deg(90)), G.scale((2, 2, 2))])
    compiled = G.compile_scene(s, ())
    g = compiled.scenes[0].groups[0]
    assert g.m_inv is None  # baked, not matrix-traced
    np.testing.assert_allclose(g.params["center"][0], [0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(g.params["radius"][0], 2.0)


def test_nonuniform_sphere_keeps_matrix():
    s = G.transform(G.sphere((0, 0, 0), 1.0), [G.scale((1, 0.4, 1))])
    compiled = G.compile_scene(s, ())
    g = compiled.scenes[0].groups[0]
    assert g.m_inv is not None


def test_mesh_expansion():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    tris = np.array([[0, 1, 2, -1, -1, -1, -1, -1],
                     [1, 3, 2, -1, -1, -1, -1, -1]], np.int32)
    m = G.mesh(verts, None, tris)
    compiled = G.compile_scene(m, ())
    g = compiled.scenes[0].groups[0]
    assert g.ptype == "triangle" and g.size == 2
    # mesh triangles don't cast shadows (reference Mesh.hs:210)
    assert g.noshadow.all()


def test_group_flattening_and_void():
    s = G.group([G.group([]), G.sphere((0, 0, 0), 1)])
    from glome_tpu.solids import Sphere
    assert isinstance(s, Sphere)  # single-item group collapses


def test_point_queries_inside_and_metainfo():
    import glome_tpu as G
    import numpy as np
    import jax.numpy as jnp
    from glome_tpu.materials import Surface, Uniform

    red = Uniform(Surface(color=(1, 0, 0)))
    s = G.group([
        G.tex(G.tag(G.sphere((0, 0, 0), 1.0), "ball"), red),
        G.difference(G.box((2, -1, -1), (4, 1, 1)),
                     G.sphere((3, 0, 0), 0.9)),
        G.intersection([G.sphere((-3, 0, 0), 1.0),
                        G.sphere((-2.5, 0, 0), 1.0)]),
    ])
    compiled = G.compile_scene(s, ())
    arrays = compiled.arrays()
    pts = jnp.asarray([
        [0.0, 0.0, 0.0],      # in tagged sphere
        [3.0, 0.0, 0.0],      # in subtracted hollow -> NOT inside
        [2.05, 0.0, 0.0],     # in box, outside the subtracted sphere
        [-2.75, 0.0, 0.0],    # in the lens intersection
        [-3.9, 0.0, 0.0],     # in first sphere only -> NOT inside
        [9.0, 9.0, 9.0],      # nowhere
    ])
    ins = np.asarray(G.inside(compiled, arrays, pts))
    np.testing.assert_array_equal(ins, [True, False, True, True,
                                        False, False])
    found, tex, tag = G.metainfo(compiled, arrays, pts)
    found = np.asarray(found)
    np.testing.assert_array_equal(found, ins)
    tagname = compiled.tag_names[int(np.asarray(tag)[0, 0])]
    assert tagname == "ball"


def test_pick_session_reuses_compile():
    """Persistent pick loop (VERDICT r3 missing #3): one compile, many
    picks; tag stacks match the one-shot pick path."""
    import io
    import time as _time

    import glome_tpu as G
    from glome_tpu.config import RenderConfig
    from glome_tpu.pick import PickSession, pick
    from glome_tpu.materials import Surface, Uniform, light

    solid = G.group([
        G.tag(G.tex(G.sphere((0, 0, 0), 1.0),
                    Uniform(Surface(color=(1, 0, 0)))), "ball"),
        G.tag(G.tex(G.plane((0, -1.5, 0), (0, 1, 0)),
                    Uniform(Surface(color=(0, 1, 0)))), "floor"),
    ])
    lights = [light((3, 4, 3), (1, 1, 1))]
    cam = G.camera((0, 0.5, 4), (0, 0, 0), (0, 1, 0), 45)
    compiled = G.compile_scene(solid, lights)
    cfg = RenderConfig(xres=64, yres=48, maxdepth=1, min_tiles=1)
    tracer = G.Tracer(compiled, cfg)
    arrays = compiled.arrays()

    sess = PickSession(tracer, cam, arrays)
    h1 = sess.pick(32, 24)          # center: the ball
    assert h1["tags"] == ["ball"], h1
    assert h1["tags"] == pick(tracer, cam, arrays, 32, 24)
    t0 = _time.time()
    h2 = sess.pick(32, 46)          # bottom: the floor
    dt = _time.time() - t0
    assert h2["tags"] == ["floor"], h2
    assert dt < 2.0, f"pick re-compiled? {dt:.1f}s"

    out = io.StringIO()
    sess.run(inp=io.StringIO("32 24\nbogus\n32 46\nq\n"), out=out)
    text = out.getvalue()
    assert "ball" in text and "floor" in text and "?" in text, text
