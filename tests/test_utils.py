"""Utility subsystems: checkpoint/resume, profiling, RNG quality."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpu_based_ray_tracer_tpu.config import RenderConfig
from cpu_based_ray_tracer_tpu.models import monte_carlo
from cpu_based_ray_tracer_tpu.scenes import cornell
from cpu_based_ray_tracer_tpu.utils import checkpoint, profiling, rng


def test_checkpoint_resume_exact(tmp_path):
    """Interrupt-and-resume produces the EXACT image of an uninterrupted run
    (counter-based RNG + saved (accum, samples, seed) state)."""
    scene, cam = cornell.cornell_scene(), cornell.cornell_camera()
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=2)
    key = rng.render_key(5)

    full = np.asarray(monte_carlo.render(scene, cam, cfg.replace(spp=4), key))

    accum = jnp.zeros((16, 16, 3), jnp.float32)
    accum, done = monte_carlo.render_progressive(scene, cam, cfg, key,
                                                 accum, 0)
    p = tmp_path / "state.npz"
    checkpoint.save_render_state(p, accum, done, rng.seed_from_key(key), cfg)
    accum2, done2, _ = checkpoint.load_render_state(p, cfg)
    accum2, done2 = monte_carlo.render_progressive(scene, cam, cfg, key,
                                                   accum2, done2)
    assert int(done2) == 4
    np.testing.assert_allclose(np.asarray(accum2) / 4.0, full, atol=1e-6)


def test_checkpoint_config_mismatch(tmp_path):
    cfg = RenderConfig(width=8, height=8, spp=1)
    p = tmp_path / "s.npz"
    checkpoint.save_render_state(p, jnp.zeros((8, 8, 3)), 1,
                                 jnp.uint32(0), cfg)
    with pytest.raises(ValueError):
        checkpoint.load_render_state(p, cfg.replace(spp=2))


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.uint32(3))}
    p = tmp_path / "t.npz"
    checkpoint.save_pytree(p, tree)
    back = checkpoint.load_pytree(p, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(back["b"][0]), np.ones((2, 2)))


def test_runlog(tmp_path):
    import json
    p = tmp_path / "run.jsonl"
    log = profiling.RunLog(str(p))
    log.emit("render", rays_per_s=1.5e8, cfg="cornell")
    log.close()
    rec = json.loads(p.read_text().splitlines()[0])
    assert rec["event"] == "render" and rec["rays_per_s"] == 1.5e8


def test_hash_rng_uniformity():
    """pcg4d draws: mean/var close to U[0,1), lanes decorrelated, streams
    decorrelated."""
    pix = jnp.arange(1 << 14, dtype=jnp.uint32)
    a, b, c, d = rng.uniforms4(jnp.uint32(123), pix, 0, 0, rng.SCATTER)
    for u in (a, b, c, d):
        u = np.asarray(u)
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1.0 / 12.0) < 0.005
        # Chi-square over 16 bins, 16384 draws: expect ~1024/bin.
        hist = np.histogram(u, bins=16, range=(0, 1))[0]
        chi2 = (((hist - 1024.0) ** 2) / 1024.0).sum()
        assert chi2 < 50.0  # df=15, p>0.001 bound ~37.7; generous
    # Different streams are decorrelated.
    a2, *_ = rng.uniforms4(jnp.uint32(123), pix, 0, 0, rng.RR)
    corr = np.corrcoef(np.asarray(a), np.asarray(a2))[0, 1]
    assert abs(corr) < 0.03
    # Adjacent pixels decorrelated.
    u = np.asarray(a)
    corr2 = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(corr2) < 0.03


def test_scoped_timer_output(capsys):
    with profiling.scoped_timer("unit"):
        pass
    out = capsys.readouterr().out
    assert "[TIMER] unit" in out


def test_one_hot_gather_is_exact():
    """A gather must be a gather: take_rows reproduces table rows BIT-EXACT.

    Regression for the r3 TPU bug where the one-hot matmul ran at the MXU's
    default bf16 precision and rounded gathered values to 8 mantissa bits
    (the Cornell light's y=5.487 became 5.5 -> every NEE sample occluded).
    precision=HIGHEST is required on the dot; this pins it on every backend.
    """
    import jax.numpy as jnp
    from cpu_based_ray_tracer_tpu.ops import gather

    rng_ = np.random.default_rng(9)
    table = jnp.asarray(rng_.uniform(-7, 7, (37, 5)).astype(np.float32))
    idx = jnp.asarray(rng_.integers(0, 37, 256))
    out = np.asarray(gather.take_rows(table, idx))
    np.testing.assert_array_equal(out, np.asarray(table)[np.asarray(idx)])


def test_vec_cross_matches_numpy():
    """vec.cross (componentwise) == numpy cross, under jit too.  Regression
    anchor for the r3 XLA-TPU miscompile of jnp.cross fused with a
    reduction (see ops/vec.py:cross); bench.py re-asserts this on-chip."""
    import jax
    import jax.numpy as jnp
    from cpu_based_ray_tracer_tpu.ops import vec

    rng_ = np.random.default_rng(2)
    a = rng_.normal(size=(33, 3)).astype(np.float32)
    b = rng_.normal(size=(33, 3)).astype(np.float32)
    ref = np.cross(a, b)
    got = np.asarray(vec.cross(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    got_j = np.asarray(jax.jit(
        lambda x, y: jnp.linalg.norm(vec.cross(x, y), axis=-1))(
            jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got_j, np.linalg.norm(ref, axis=-1),
                               rtol=1e-5)
