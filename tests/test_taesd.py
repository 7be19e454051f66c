"""TAESD structural tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.taesd import TAESD


def test_taesd_roundtrip_shapes():
    t = TAESD()
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    z = jax.jit(t.encode)(params, x)
    assert z.shape == (1, 8, 8, 4)
    y = jax.jit(t.decode)(params, z)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_taesd_param_keys_match_torch_indices():
    from stable_renderer_tpu.models.weights import flatten

    t = TAESD()
    keys = set(flatten(t.init(jax.random.PRNGKey(0))))
    assert "encoder.0.weight" in keys          # conv(3,64)
    assert "encoder.1.conv.0.weight" in keys   # first block
    assert "encoder.2.weight" in keys          # stride-2 conv
    assert "decoder.1.weight" in keys          # conv(4,64) after clamp
    assert "decoder.3.conv.0.weight" in keys   # first decoder block
    assert "encoder.2.bias" not in keys        # stride convs are bias-free


def test_realtime_taesd_pipeline_mode():
    """RenderConfig(realtime_taesd=True) swaps the full VAE for TAESD in the
    compiled render program (PERF.md realtime knob)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow.config import RenderConfig

    cfg = RenderConfig(prompt="x", steps=2, cfg_scale=1.0, sampler="euler",
                       realtime_taesd=True)
    pipe = DiffusionPipeline.from_random(cfg, tiny=True).with_taesd()
    k = jax.random.PRNGKey(0)
    n, size = 1, 64  # taesd is always 8x; use 64 so latents are 8x8
    ed = EngineData(
        frame_indices=jnp.arange(n),
        color_maps=jax.random.uniform(k, (n, size, size, 3)),
        noise_maps=jax.random.normal(jax.random.fold_in(k, 1), (n, 8, 8, 4)),
    )
    out = pipe.render(ed, key=jax.random.PRNGKey(3))
    assert out.shape == (n, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # and the flag actually changes the program vs the full VAE
    cfg2 = RenderConfig(prompt="x", steps=2, cfg_scale=1.0, sampler="euler")
    pipe2 = DiffusionPipeline.from_random(cfg2, tiny=True)
    out2 = pipe2.render(ed, key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-3)
