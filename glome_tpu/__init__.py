"""glome-tpu: a TPU-native differentiable ray tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Glome ray tracer (jimsnow/glome): primitives, CSG, instancing,
acceleration structures, Whitted shading with portals and layered
procedural textures, adaptive antialiasing, NFF scene import, tags for
picking -- rebuilt as branchless SoA array programs with gradients
flowing from pixels to geometry/material/transform parameters, sharded
over device meshes via shard_map.

See SURVEY.md at the repo root for the reference structural analysis
this framework is built against.
"""

from .config import RenderConfig, DELTA, INFINITY, deg, rot
from .materials import (AdditiveLayers, Blend, BlendFn, Light, Reflect,
                        Refract, Surface, Uniform, Warp, light, t_uniform)
from .solids import (bih, bound_object, box, cone, cylinder, difference,
                     difference_retexture, disc, group, intersection, mesh,
                     nothing, noshadow, onlyshadow, plane, plane_offset,
                     primcount, sphere, tag, tex, transform, triangle,
                     trianglenorm, triangles, trianglesnorms)
from . import xfm
from .xfm import compose, rotate, scale, translate, xyz_to_uvw
from .compile import compile_scene, CompiledScene
from .trace import Tracer, TraceResult
from .trace_wavefront import WavefrontTracer
from .render import Camera, Renderer, camera
from .intersect import Hit, intersect, shadow_query
from .query import inside, metainfo
from .soft import SoftTracer

__version__ = "0.1.0"
