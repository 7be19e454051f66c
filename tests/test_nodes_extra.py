"""Tier-2 comfy_extras pack tests (workflow/nodes_extra.py) — one per pack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.workflow.executor import NODE_REGISTRY, InferenceContext


class _N:
    def __init__(self, type, widgets=None, id=1):
        self.type = type
        self.widgets = widgets or []
        self.id = id


def _ictx():
    return InferenceContext(model_dirs=(), jit_cache={})


def _tiny_model(ictx):
    class _Ck:
        widgets = ["none.safetensors"]
        type = "CheckpointLoaderSimple"

    return NODE_REGISTRY["CheckpointLoaderSimple"](ictx, _Ck())


# --- custom sampler pack ----------------------------------------------------

def test_custom_sampler_pack_end_to_end():
    ictx = _ictx()
    model, clip, vae = _tiny_model(ictx)
    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _N("CLIPTextEncode", ["hi"]), clip=clip)
    (latent,) = NODE_REGISTRY["EmptyLatentImage"](ictx, _N("EmptyLatentImage", [64, 64, 1]))
    (sampler,) = NODE_REGISTRY["KSamplerSelect"](ictx, _N("KSamplerSelect", ["euler"]))
    (sigmas,) = NODE_REGISTRY["BasicScheduler"](
        ictx, _N("BasicScheduler", ["karras", 4, 1.0]), model=model)
    assert sigmas.shape == (5,) and sigmas[0] > sigmas[-2] and sigmas[-1] == 0
    out, out_denoised = NODE_REGISTRY["SamplerCustom"](
        ictx, _N("SamplerCustom", [True, 42, "fixed", 1.5]),
        model=model, positive=pos, negative=pos, sampler=sampler,
        sigmas=sigmas, latent_image=latent)
    assert out["samples"].shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out["samples"])).all()


def test_scheduler_nodes():
    ictx = _ictx()
    model, _, _ = _tiny_model(ictx)
    for node_type, widgets in [
        ("KarrasScheduler", [6, 14.6, 0.03, 7.0]),
        ("ExponentialScheduler", [6, 14.6, 0.03]),
        ("PolyexponentialScheduler", [6, 14.6, 0.03, 1.0]),
        ("VPScheduler", [6, 19.9, 0.1, 0.001]),
    ]:
        (s,) = NODE_REGISTRY[node_type](ictx, _N(node_type, widgets))
        assert s.shape == (7,), node_type
        assert s[0] > s[-2] > s[-1] == 0.0, node_type
    (s,) = NODE_REGISTRY["SDTurboScheduler"](
        ictx, _N("SDTurboScheduler", [2, 1.0]), model=model)
    assert s.shape == (3,) and s[-1] == 0.0
    (k,) = NODE_REGISTRY["KarrasScheduler"](
        ictx, _N("KarrasScheduler", [6, 14.6, 0.03, 7.0]))
    s1, s2 = NODE_REGISTRY["SplitSigmas"](ictx, _N("SplitSigmas", [3]), sigmas=k)
    assert s1.shape == (4,) and s2.shape == (4,)
    assert s1[-1] == s2[0]
    (f,) = NODE_REGISTRY["FlipSigmas"](ictx, _N("FlipSigmas"), sigmas=k)
    assert f[0] > 0.0  # zero head replaced


# --- model merging ----------------------------------------------------------

def test_model_merge_pack(tmp_path, monkeypatch):
    ictx = _ictx()
    model, clip, vae = _tiny_model(ictx)
    (merged,) = NODE_REGISTRY["ModelMergeSimple"](
        ictx, _N("ModelMergeSimple", [0.25]), model1=model, model2=model)
    a = model["params"]["time_embed"]["0"]["weight"]
    b = merged["params"]["time_embed"]["0"]["weight"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    (sub,) = NODE_REGISTRY["ModelMergeSubtract"](
        ictx, _N("ModelMergeSubtract", [1.0]), model1=model, model2=model)
    assert float(jnp.abs(sub["params"]["time_embed"]["0"]["weight"]).max()) < 1e-6

    (blocks,) = NODE_REGISTRY["ModelMergeBlocks"](
        ictx, _N("ModelMergeBlocks", [1.0, 0.0, 0.5]), model1=model, model2=sub)
    # input blocks fully take model2 (=0 weights), middle keeps model1
    in_w = blocks["params"]["input_blocks"]["0"]["0"]["weight"]
    assert float(jnp.abs(in_w).max()) < 1e-6
    mid_w = blocks["params"]["middle_block"]["0"]["in_layers"]["2"]["weight"]
    ref = model["params"]["middle_block"]["0"]["in_layers"]["2"]["weight"]
    np.testing.assert_allclose(np.asarray(mid_w), np.asarray(ref), atol=1e-6)

    (cmerged,) = NODE_REGISTRY["CLIPMergeSimple"](
        ictx, _N("CLIPMergeSimple", [0.5]), clip1=clip, clip2=clip)
    assert "params" in cmerged

    import stable_renderer_tpu.utils.paths as paths

    monkeypatch.setattr(paths, "OUTPUT_DIR", tmp_path)
    (path,) = NODE_REGISTRY["CheckpointSave"](
        ictx, _N("CheckpointSave", ["checkpoints/test_merge"]),
        model=model, clip=clip, vae=vae)
    # round-trip: the saved file must load through the standard loader
    from stable_renderer_tpu.models.weights import load_checkpoint

    unet_p, vae_p, clip_p, ucfg = load_checkpoint(path)
    assert ucfg.model_channels == model["unet"].config.model_channels
    assert unet_p and vae_p and clip_p


# --- model patches ----------------------------------------------------------

def _run_ksampler(ictx, model, pos, latent, steps=2, node_id=77):
    (out,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", steps, 2.0, "euler", "normal", 1.0],
                 id=node_id),
        model=model, positive=pos, negative=pos, latent_image=latent)
    return np.asarray(out["samples"])


def test_freeu_and_sag_and_perpneg_change_output():
    ictx = _ictx()
    model, clip, _ = _tiny_model(ictx)
    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _N("CLIPTextEncode", ["x"]), clip=clip)
    (latent,) = NODE_REGISTRY["EmptyLatentImage"](ictx, _N("EmptyLatentImage", [64, 64, 1]))
    base = _run_ksampler(ictx, model, pos, latent, node_id=70)

    (m_freeu,) = NODE_REGISTRY["FreeU"](ictx, _N("FreeU", [1.5, 1.6, 0.5, 0.3]), model=model)
    out_f = _run_ksampler(ictx, m_freeu, pos, latent, node_id=71)
    assert not np.allclose(base, out_f)

    (m_freeu2,) = NODE_REGISTRY["FreeU_V2"](ictx, _N("FreeU_V2", [1.5, 1.6, 0.5, 0.3]), model=model)
    out_f2 = _run_ksampler(ictx, m_freeu2, pos, latent, node_id=72)
    assert not np.allclose(base, out_f2) and not np.allclose(out_f, out_f2)

    (m_sag,) = NODE_REGISTRY["SelfAttentionGuidance"](
        ictx, _N("SelfAttentionGuidance", [0.8, 2.0]), model=model)
    out_s = _run_ksampler(ictx, m_sag, pos, latent, node_id=73)
    assert np.isfinite(out_s).all() and not np.allclose(base, out_s)

    # empty conditioning must differ from pos/neg or perp-neg degenerates to
    # plain CFG algebraically (pos = neg = 0 vectors)
    (empty,) = NODE_REGISTRY["CLIPTextEncode"](
        ictx, _N("CLIPTextEncode", [""], id=99), clip=clip)
    (m_pn,) = NODE_REGISTRY["PerpNeg"](
        ictx, _N("PerpNeg", [1.0]), model=model, empty_conditioning=empty)
    out_p = _run_ksampler(ictx, m_pn, pos, latent, node_id=74)
    assert np.isfinite(out_p).all() and not np.allclose(base, out_p)


def test_hypertile_patch_runs():
    ictx = _ictx()
    model, clip, _ = _tiny_model(ictx)
    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _N("CLIPTextEncode", ["x"]), clip=clip)
    (latent,) = NODE_REGISTRY["EmptyLatentImage"](ictx, _N("EmptyLatentImage", [128, 128, 1]))
    (m_ht,) = NODE_REGISTRY["HyperTile"](ictx, _N("HyperTile", [16, 1, 0]), model=model)
    out = _run_ksampler(ictx, m_ht, pos, latent, node_id=75)
    assert out.shape == (1, 16, 16, 4) and np.isfinite(out).all()


def test_differential_diffusion_mask_threshold():
    ictx = _ictx()
    model, clip, _ = _tiny_model(ictx)
    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _N("CLIPTextEncode", ["x"]), clip=clip)
    latent_arr = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    grad_mask = jnp.linspace(0.0, 1.0, 8)[None, :, None] * jnp.ones((1, 8, 8))
    latent = {"samples": latent_arr, "noise_mask": grad_mask}
    # plain noise_mask run for comparison: binary keep/denoise per pixel
    (plain,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 4, 1.0, "euler", "normal", 1.0], id=75),
        model=model, positive=pos, negative=None, latent_image=latent)
    (m_dd,) = NODE_REGISTRY["DifferentialDiffusion"](
        ictx, _N("DifferentialDiffusion"), model=model)
    (out,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 4, 1.0, "euler", "normal", 1.0], id=76),
        model=m_dd, positive=pos, negative=None, latent_image=latent)
    o = np.asarray(out["samples"])
    assert np.isfinite(o).all()
    # the mask value sets WHEN a pixel starts denoising (threshold ramps
    # 1 -> 0, nodes_differential_diffusion.py forward); by the end every pixel
    # has denoised, so the result differs from both the source latent and the
    # binary-mask run
    assert not np.allclose(o, np.asarray(latent_arr))
    assert not np.allclose(o, np.asarray(plain["samples"]))


def test_hypernetwork_loader_patch(tmp_path):
    import torch

    dim = 32  # tiny UNet attention width
    sd = {"activation_func": "relu", "is_layer_norm": False,
          "use_dropout": False, "activate_output": False}
    sd[dim] = [
        {"0.weight": torch.randn(64, dim) * 0.01, "0.bias": torch.zeros(64),
         "1.weight": torch.randn(dim, 64) * 0.01, "1.bias": torch.zeros(dim)}
        for _ in range(2)
    ]
    p = tmp_path / "hypernet.pt"
    torch.save(sd, p)
    ictx = InferenceContext(model_dirs=(str(tmp_path),), jit_cache={})
    model, clip, _ = _tiny_model(ictx)
    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _N("CLIPTextEncode", ["x"]), clip=clip)
    (latent,) = NODE_REGISTRY["EmptyLatentImage"](ictx, _N("EmptyLatentImage", [64, 64, 1]))
    (m_hn,) = NODE_REGISTRY["HypernetworkLoader"](
        ictx, _N("HypernetworkLoader", ["hypernet.pt", 1.0]), model=model)
    assert m_hn.get("patches"), "hypernetwork patch not attached"
    base = _run_ksampler(ictx, model, pos, latent, node_id=78)
    out = _run_ksampler(ictx, m_hn, pos, latent, node_id=79)
    assert np.isfinite(out).all() and not np.allclose(base, out)


# --- morphology / compositing / rebatch / sdupscale -------------------------

def test_morphology_ops():
    img = np.zeros((1, 9, 9, 1), np.float32)
    img[0, 4, 4, 0] = 1.0
    ictx = _ictx()
    (dil,) = NODE_REGISTRY["Morphology"](ictx, _N("Morphology", ["dilate", 3]), image=img)
    assert float(np.asarray(dil).sum()) == 9.0  # 3x3 block
    (ero,) = NODE_REGISTRY["Morphology"](ictx, _N("Morphology", ["erode", 3]), image=img)
    assert float(np.asarray(ero).sum()) == 0.0
    (opened,) = NODE_REGISTRY["Morphology"](ictx, _N("Morphology", ["open", 3]), image=img)
    assert float(np.asarray(opened).sum()) == 0.0  # single pixel removed
    (grad,) = NODE_REGISTRY["Morphology"](ictx, _N("Morphology", ["gradient", 3]), image=img)
    assert np.asarray(grad).max() == 1.0


def test_compositing_nodes():
    ictx = _ictx()
    src = np.full((1, 4, 4, 3), 0.8, np.float32)
    dst = np.full((1, 4, 4, 3), 0.2, np.float32)
    sa = np.ones((1, 4, 4), np.float32)
    da = np.full((1, 4, 4), 0.5, np.float32)
    img, alpha = NODE_REGISTRY["PorterDuffImageComposite"](
        ictx, _N("PorterDuffImageComposite", ["SRC_OVER"]),
        source=src, source_alpha=sa, destination=dst, destination_alpha=da)
    assert np.asarray(img).shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(alpha), 1.0, atol=1e-6)

    rgba = np.concatenate([src, da[..., None]], axis=-1)
    rgb, mask = NODE_REGISTRY["SplitImageWithAlpha"](
        ictx, _N("SplitImageWithAlpha"), image=rgba)
    np.testing.assert_allclose(np.asarray(mask), 0.5, atol=1e-6)
    (joined,) = NODE_REGISTRY["JoinImageWithAlpha"](
        ictx, _N("JoinImageWithAlpha"), image=rgb, alpha=mask)
    np.testing.assert_allclose(np.asarray(joined), np.asarray(rgba), atol=1e-6)


def test_rebatch_nodes():
    ictx = _ictx()
    lat = {"samples": jnp.zeros((5, 4, 4, 4))}
    (out,) = NODE_REGISTRY["RebatchLatents"](
        ictx, _N("RebatchLatents", [2]), latents=lat)
    assert [o["samples"].shape[0] for o in out] == [2, 2, 1]
    (imgs,) = NODE_REGISTRY["RebatchImages"](
        ictx, _N("RebatchImages", [3]), images=[np.zeros((2, 4, 4, 3)),
                                                np.zeros((2, 4, 4, 3))])
    assert [i.shape[0] for i in imgs] == [3, 1]


def test_sd4x_upscale_conditioning():
    ictx = _ictx()
    img = np.random.rand(1, 16, 16, 3).astype(np.float32)
    pos, neg, latent = NODE_REGISTRY["SD_4XUpscale_Conditioning"](
        ictx, _N("SD_4XUpscale_Conditioning", [4.0, 0.1]),
        images=img, positive={"context": jnp.zeros((1, 7, 64))},
        negative={"context": jnp.zeros((1, 7, 64))})
    assert latent["samples"].shape == (1, 16, 16, 4)
    assert pos["concat_image"].shape == (1, 16, 16, 3)
    assert pos["noise_augmentation"] == pytest.approx(0.1)


def test_tome_patch_merge_unmerge_identity_and_runs():
    """ToMe (nodes_tomesd.py): the merged attention path runs and produces
    finite output that differs from the unpatched run; with ratio=0 the patch
    is an exact no-op."""
    ictx = _ictx()
    model, clip, _ = _tiny_model(ictx)
    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _N("CLIPTextEncode", ["x"]), clip=clip)
    (latent,) = NODE_REGISTRY["EmptyLatentImage"](ictx, _N("EmptyLatentImage", [64, 64, 1]))
    base = _run_ksampler(ictx, model, pos, latent, node_id=90)
    (m_tome,) = NODE_REGISTRY["TomePatchModel"](
        ictx, _N("TomePatchModel", [0.4]), model=model)
    out = _run_ksampler(ictx, m_tome, pos, latent, node_id=91)
    assert np.isfinite(out).all()
    assert not np.allclose(base, out)
    (m_zero,) = NODE_REGISTRY["TomePatchModel"](
        ictx, _N("TomePatchModel", [0.0]), model=model)
    out0 = _run_ksampler(ictx, m_zero, pos, latent, node_id=92)
    np.testing.assert_allclose(base, out0, atol=1e-5)


def test_photomaker_encode_replaces_trigger_token():
    """PhotoMakerEncode (nodes_photomaker.py): the 'photomaker' trigger word's
    embedding is replaced by the fused identity embedding; the rest of the
    prompt conditioning is unchanged vs encoding without the trigger."""
    ictx = _ictx()
    _, clip, _ = _tiny_model(ictx)
    (pm,) = NODE_REGISTRY["PhotoMakerLoader"](
        ictx, _N("PhotoMakerLoader", ["none.bin"]))
    assert "vision" in pm and "fuse_module" in pm["params"]
    img = np.random.rand(1, 28, 28, 3).astype(np.float32)
    (with_id,) = NODE_REGISTRY["PhotoMakerEncode"](
        ictx, _N("PhotoMakerEncode", ["portrait of photomaker person"]),
        photomaker=pm, image=img, clip=clip)
    (plain,) = NODE_REGISTRY["PhotoMakerEncode"](
        ictx, _N("PhotoMakerEncode", ["portrait of person"], id=2),
        photomaker=pm, image=img, clip=clip)
    a, b = np.asarray(with_id["context"]), np.asarray(plain["context"])
    assert a.shape == b.shape
    assert not np.allclose(a, b)  # identity embedding injected
    # a different reference image changes the conditioning
    (with_id2,) = NODE_REGISTRY["PhotoMakerEncode"](
        ictx, _N("PhotoMakerEncode", ["portrait of photomaker person"], id=3),
        photomaker=pm, image=img * 0.2, clip=clip)
    assert not np.allclose(a, np.asarray(with_id2["context"]))
