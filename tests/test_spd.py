"""NFF parser tests (Spd.hs grammar)."""

import numpy as np

import glome_tpu as G
from glome_tpu import spd

NFF = """
# balls-style header
v
from 2.1 1.3 1.7
at 0 0 0
up 0 0 1
angle 45
hither 0.001
resolution 512 512
b 0.078 0.361 0.753
l 4 3 2
l 1 -4 4 0.5 0.5 0.5
f 1 0.75 0.33 1 0 0.0001 0 0
s 0 0 0 0.5
c
0 0 0 0.2
0 0 1 0.1
p 4
1 1 0
-1 1 0
-1 -1 0
1 -1 0
f 1 0 0 0.8 0.2 5 0 0
pp 3
0 0 0 0 0 1
1 0 0 0 0 1
0 1 0 0 0 1
"""


def test_parse_nff():
    s = spd.parse(NFF)
    assert s.resolution == (512, 512)
    np.testing.assert_allclose(s.background, (0.078, 0.361, 0.753))
    assert len(s.lights) == 2
    np.testing.assert_allclose(s.lights[1].color, (0.5, 0.5, 0.5))
    assert s.cam is not None
    # geometry: sphere + cone + 2 fan triangles under fill 1,
    # 1 triangle-with-normals under fill 2
    prims, xfms, bounds = G.primcount(s.geom)
    assert prims == 5
    compiled = G.compile_scene(s.geom, s.lights)
    types = sorted((g.ptype, g.size) for g in compiled.scenes[0].groups)
    assert ("trianglenorm", 1) in types
    assert ("triangle", 2) in types
    assert ("sphere", 1) in types
    assert ("cone", 1) in types
    # two distinct fill materials -> two textures
    assert len(compiled.textures) == 2


def test_light_default_color():
    s = spd.parse("l 1 2 3")
    np.testing.assert_allclose(s.lights[0].color, (1, 1, 1))
