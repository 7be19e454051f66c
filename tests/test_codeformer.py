"""CodeFormer face-restoration tests (VERDICT r1 missing #9 face-restore zoo;
reference face/codeformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.codeformer import (
    TINY_CODEFORMER_CONFIG,
    CodeFormer,
    CodeFormerConfig,
    _encoder_plan,
    _generator_plan,
    detect_codeformer_config,
)


def test_plans_match_reference_fuse_indices():
    """The structural plan reproduces the reference's hardcoded Sequential
    fuse indices for the official 512 config (codeformer.py:697-715)."""
    cfg = CodeFormerConfig()
    _, enc_fuse = _encoder_plan(cfg)
    assert enc_fuse == {512: 2, 256: 5, 128: 8, 64: 11, 32: 14, 16: 18}
    _, gen_fuse = _generator_plan(cfg)
    assert gen_fuse == {16: 6, 32: 9, 64: 12, 128: 15, 256: 18, 512: 21}


def test_codeformer_tiny_forward_and_weight_knob():
    model = CodeFormer(TINY_CODEFORMER_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3)) * 2 - 1
    out = jax.jit(lambda p, a: model.apply(p, a, weight=0.5))(params, x)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # fidelity weight changes the output (SFT fusion active vs pure prior)
    out0 = model.apply(params, x, weight=0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out0), atol=1e-5)


def test_codeformer_detection():
    from stable_renderer_tpu.models.weights import flatten

    model = CodeFormer(TINY_CODEFORMER_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_codeformer_config(flat)
    assert det is not None
    assert det.codebook_size == 32 and det.emb_dim == 16
    assert det.dim_embd == 16 and det.n_layers == 2


def test_multihead_attention_matches_torch():
    """The TransformerSALayer's in_proj/out_proj attention equals torch
    nn.MultiheadAttention with the same weights (q=k=x+pos, v=x)."""
    torch = pytest.importorskip("torch")
    from stable_renderer_tpu.models.codeformer import _transformer_layer

    rng = np.random.RandomState(0)
    e, heads, n, b = 16, 2, 6, 2
    in_w = rng.randn(3 * e, e).astype(np.float32) * 0.1
    in_b = rng.randn(3 * e).astype(np.float32) * 0.1
    out_w = rng.randn(e, e).astype(np.float32) * 0.1
    out_b = rng.randn(e).astype(np.float32) * 0.1
    l1w = rng.randn(2 * e, e).astype(np.float32) * 0.1
    l1b = np.zeros(2 * e, np.float32)
    l2w = rng.randn(e, 2 * e).astype(np.float32) * 0.1
    l2b = np.zeros(e, np.float32)
    x = rng.randn(b, n, e).astype(np.float32)
    pos = rng.randn(n, e).astype(np.float32)

    p = {"self_attn": {"in_proj_weight": jnp.asarray(in_w),
                       "in_proj_bias": jnp.asarray(in_b),
                       "out_proj": {"weight": jnp.asarray(out_w),
                                    "bias": jnp.asarray(out_b)}},
         "linear1": {"weight": jnp.asarray(l1w), "bias": jnp.asarray(l1b)},
         "linear2": {"weight": jnp.asarray(l2w), "bias": jnp.asarray(l2b)},
         "norm1": {"weight": jnp.ones(e), "bias": jnp.zeros(e)},
         "norm2": {"weight": jnp.ones(e), "bias": jnp.zeros(e)}}
    ours = np.asarray(_transformer_layer(p, jnp.asarray(x), jnp.asarray(pos),
                                         heads))

    m = torch.nn.MultiheadAttention(e, heads)
    with torch.no_grad():
        m.in_proj_weight.copy_(torch.from_numpy(in_w))
        m.in_proj_bias.copy_(torch.from_numpy(in_b))
        m.out_proj.weight.copy_(torch.from_numpy(out_w))
        m.out_proj.bias.copy_(torch.from_numpy(out_b))
        # torch MHA expects (N, B, E)
        tx = torch.from_numpy(x).permute(1, 0, 2)
        tpos = torch.from_numpy(pos).unsqueeze(1)
        ln = torch.nn.functional.layer_norm(tx, (e,))
        qk = ln + tpos
        att, _ = m(qk, qk, ln)
        t = tx + att
        ln2 = torch.nn.functional.layer_norm(t, (e,))
        ff = torch.nn.functional.linear(
            torch.nn.functional.gelu(
                torch.nn.functional.linear(ln2, torch.from_numpy(l1w),
                                           torch.from_numpy(l1b))),
            torch.from_numpy(l2w), torch.from_numpy(l2b))
        theirs = (t + ff).permute(1, 0, 2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
