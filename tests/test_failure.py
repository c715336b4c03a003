"""Failure detection & recovery (SURVEY §5 aux subsystems, VERDICT r2
partial): NaN guards over the hot integrators and fault injection on the
checkpoint/resume path.

The reference's only 'recovery' is EntryPoint.h restarting the app loop;
ours is durable progressive state + guards that refuse to continue from
poisoned inputs.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo as mc
from cpu_based_ray_tracer_tpu.models import offline, whitted as wmodel
from cpu_based_ray_tracer_tpu.scenes import cornell, rtiow, whitted_scene
from cpu_based_ray_tracer_tpu.utils import checkpoint as ckpt
from cpu_based_ray_tracer_tpu.utils import rng


def test_integrators_nan_free_under_debug_nans():
    """jax.debug_nans raises on ANY NaN produced anywhere inside jitted
    code — even inside masked-out lanes.  The integrators must be clean
    (this is what the where-before-sqrt/division guards in ops/ are for)."""
    with jax.debug_nans(True):
        cfg = RenderConfig(width=16, height=16, spp=2, max_depth=3,
                           rr_survival=0.8)
        key = rng.render_key(0)
        img = mc.render(cornell.cornell_scene(), cornell.cornell_camera(),
                        cfg, key)
        jax.block_until_ready(img)
        img2 = offline.render(rtiow.rtiow_classic_scene(),
                              rtiow.offline_camera(1.0),
                              cfg.replace(max_depth=4), key)
        jax.block_until_ready(img2)
        img3 = wmodel.render(whitted_scene.whitted_scene(),
                             whitted_scene.whitted_camera(), cfg)
        jax.block_until_ready(img3)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(img2)).all()
    assert np.isfinite(np.asarray(img3)).all()


def test_gradients_nan_free_under_debug_nans():
    with jax.debug_nans(True):
        scene = cornell.cornell_scene()
        cam = cornell.cornell_camera()
        cfg = RenderConfig(width=8, height=8, spp=1, max_depth=2,
                           rr_survival=0.8)
        key = rng.render_key(1)

        def loss(albedo):
            s = scene.replace(
                materials=scene.materials.replace(albedo=albedo))
            return jnp.mean(mc.render(s, cam, cfg, key))

        g = jax.grad(loss)(scene.materials.albedo)
        jax.block_until_ready(g)
    assert np.isfinite(np.asarray(g)).all()


def test_resume_rejects_truncated_checkpoint(tmp_path):
    """Fault injection: a checkpoint file truncated mid-write (the crash
    the checkpoint system exists for) must be rejected loudly, not parsed
    into garbage state."""
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2)
    path = str(tmp_path / "state.npz")
    acc = jnp.ones((8, 8, 3))
    ckpt.save_render_state(path, acc, 2, jnp.uint32(7), cfg)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:len(raw) // 3])      # torn write
    with pytest.raises(Exception):
        ckpt.load_render_state(path, cfg)


def test_resume_rejects_tampered_config(tmp_path):
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2)
    path = str(tmp_path / "state.npz")
    ckpt.save_render_state(path, jnp.ones((8, 8, 3)), 2, jnp.uint32(7), cfg)
    with pytest.raises(ValueError):
        ckpt.load_render_state(path, cfg.replace(max_depth=3))


def test_resume_continues_through_simulated_crash():
    """Kill-and-resume equivalence: accumulating 2+2 samples through a
    checkpoint round-trip equals a straight 4-sample accumulation."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg2 = RenderConfig(width=16, height=16, spp=2, max_depth=3)
    key = rng.render_key(5)
    acc0 = jnp.zeros((16, 16, 3), jnp.float32)
    a1, s1 = mc.render_progressive(scene, cam, cfg2, key, acc0, 0)
    # "crash": only the saved npz survives.
    import io
    buf = io.BytesIO()
    np.savez(buf, acc=np.asarray(a1), s=int(s1))
    buf.seek(0)
    z = np.load(buf)
    a1b, s1b = jnp.asarray(z["acc"]), int(z["s"])
    a2, s2 = mc.render_progressive(scene, cam, cfg2, key, a1b, s1b)

    cfg4 = cfg2.replace(spp=4)
    ref, _ = mc.render_progressive(scene, cam, cfg4, key, acc0, 0)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(ref))
    assert s2 == 4
