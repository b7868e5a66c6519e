"""Queue-capacity safety: the tuned schedule must drop ZERO rays on
TestScene (TraceResult.overflow) and produce the same image as the
exact schedule -- the round-1 silent-truncation class (VERDICT #4,
ADVICE r1 medium) now fails a test instead of corrupting renders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import glome_tpu as G
from glome_tpu.config import RenderConfig
from glome_tpu.render import Renderer
from glome_tpu.scenes import test_scene


@pytest.fixture(scope="module")
def scene():
    solid, lights, cam = test_scene()
    compiled = G.compile_scene(solid, lights)
    return compiled, compiled.arrays(), cam


def _render(compiled, arrays, cam, cfg):
    tracer = G.WavefrontTracer(compiled, cfg)
    r = Renderer(tracer, cam, cfg)
    rgb, _ = r.render(arrays)
    return np.asarray(rgb), r.last_overflow, tracer.overflow_labels


@pytest.mark.slow
def test_tuned_schedule_zero_overflow(scene):
    compiled, arrays, cam = scene
    cfg = RenderConfig.tuned(xres=96, yres=64)
    rgb_t, ov, labels = _render(compiled, arrays, cam, cfg)
    assert ov is not None
    ov = np.asarray(ov)
    assert not ov.any(), dict(zip(labels, ov))

    cfg_exact = RenderConfig(xres=96, yres=64)
    rgb_e, ov_e, _ = _render(compiled, arrays, cam, cfg_exact)
    np.testing.assert_allclose(rgb_t, rgb_e, atol=1e-6)


@pytest.mark.slow
def test_overflow_detected_when_capped(scene):
    """Deliberate undersizing must be *reported*, not silent."""
    compiled, arrays, cam = scene
    cfg = RenderConfig(xres=96, yres=64,
                       reflect_capacity=(0.001,),
                       shadow_capacity=(0.01,),
                       min_tiles=0)  # disable the small-render floor
    rgb, ov, labels = _render(compiled, arrays, cam, cfg)
    assert ov is not None and np.asarray(ov).sum() > 0
    assert np.isfinite(rgb).all()  # degraded, never crashed
