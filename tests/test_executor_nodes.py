"""Builtin-node implementations (executor registry) unit tests."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.workflow import Workflow
from stable_renderer_tpu.workflow.executor import NODE_REGISTRY, PromptExecutor


def _wf(nodes, links):
    return Workflow(
        nodes={n.id: n for n in nodes}, unknown_types=[], path=None
    )


def _node(id, type, widgets=None, inputs=None, outputs=None):
    from stable_renderer_tpu.workflow.loader import WorkflowNode

    return WorkflowNode(
        id=id, type=type, widgets=widgets or [], inputs=inputs or {},
        output_names=outputs or [],
    )


def test_registry_covers_reference_workflow_nodes():
    # every node type in every shipped reference workflow must be implemented
    import os

    wf_dir = "/root/reference/resources/example-workflows"
    if not os.path.isdir(wf_dir):
        pytest.skip("reference not mounted")
    missing = set()
    for f in os.listdir(wf_dir):
        wf = Workflow.Load(os.path.join(wf_dir, f))
        for n in wf.nodes.values():
            if n.type not in NODE_REGISTRY:
                missing.add(n.type)
    assert not missing, f"unimplemented workflow nodes: {sorted(missing)}"


def test_empty_latent_and_upscale_nodes():
    ex = PromptExecutor(_wf([
        _node(1, "EmptyLatentImage", widgets=[64, 64, 2]),
        _node(2, "LatentUpscale", widgets=["nearest", 128, 128], inputs={"samples": (1, 0)}),
    ], []))
    from stable_renderer_tpu.data.engine_data import EngineData

    ctx = ex.execute(engine_data=EngineData(frame_indices=jnp.arange(1)))
    z = ctx.outputs[2][0]["samples"]
    assert z.shape == (2, 16, 16, 4)


def test_image_scale_and_save(tmp_path, monkeypatch):
    import stable_renderer_tpu.utils.paths as paths

    monkeypatch.setattr(paths, "OUTPUT_DIR", tmp_path)
    monkeypatch.setattr(
        "stable_renderer_tpu.workflow.executor.save_image.__globals__",
        save_globals := dict(NODE_REGISTRY["SaveImage"].__globals__),
        raising=False,
    ) if False else None
    ex = PromptExecutor(_wf([
        _node(1, "EmptyLatentImage", widgets=[32, 32, 1]),
    ], []))
    # direct node-impl calls
    img = jnp.zeros((1, 16, 16, 3))
    out = NODE_REGISTRY["ImageScale"](None, _node(9, "ImageScale", widgets=["nearest", 32, 32]), image=img)
    assert out[0].shape == (1, 32, 32, 3)
    out2 = NODE_REGISTRY["ImageScaleBy"](None, _node(9, "ImageScaleBy", widgets=["nearest", 0.5]), image=img)
    assert out2[0].shape == (1, 8, 8, 3)


def test_ksampler_advanced_windowed_two_stage():
    """KSamplerAdvanced start/end step windows: stage 1 runs steps [0,2) with
    leftover noise, stage 2 finishes [2,4) from the stage-1 latent — the
    two-stage refine pattern (nodes.py KSamplerAdvanced -> common_ksampler
    start_step/last_step/force_full_denoise/disable_noise)."""
    import jax

    from stable_renderer_tpu.workflow.executor import (
        NODE_REGISTRY,
        InferenceContext,
    )

    ictx = InferenceContext(model_dirs=(), jit_cache={})

    class _Ck:
        widgets = ["none.safetensors"]
        type = "CheckpointLoaderSimple"

    model, clip, vae = NODE_REGISTRY["CheckpointLoaderSimple"](ictx, _Ck())

    class _Enc:
        widgets = ["hi"]
        type = "CLIPTextEncode"

    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _Enc(), clip=clip)

    class _Lat:
        widgets = [64, 64, 1]
        type = "EmptyLatentImage"

    (latent,) = NODE_REGISTRY["EmptyLatentImage"](ictx, _Lat())

    def adv(widgets, latent_in):
        class _N:
            type = "KSamplerAdvanced"
            id = hash(tuple(widgets)) % 1000

        _N.widgets = widgets
        (out,) = NODE_REGISTRY["KSamplerAdvanced"](
            ictx, _N(), model=model, positive=pos, negative=pos,
            latent_image=latent_in)
        return out

    # stage 1: steps [0,2) of 4, keep leftover noise
    s1 = adv(["enable", 7, "fixed", 4, 1.0, "euler", "normal", 0, 2, "enable"],
             latent)
    # stage 2: steps [2,4), no fresh noise, full denoise
    s2 = adv(["disable", 7, "fixed", 4, 1.0, "euler", "normal", 2, 10000,
              "disable"], s1)
    import numpy as np

    a1 = np.asarray(s1["samples"] if isinstance(s1, dict) else s1)
    a2 = np.asarray(s2["samples"] if isinstance(s2, dict) else s2)
    assert a1.shape == a2.shape == (1, 8, 8, 4)
    assert np.isfinite(a1).all() and np.isfinite(a2).all()
    assert not np.allclose(a1, a2)  # second stage continued denoising
    # a window leaving no steps raises
    import pytest

    with pytest.raises(ValueError, match="no steps"):
        adv(["enable", 7, "fixed", 4, 1.0, "euler", "normal", 4, 4, "disable"],
            latent)


def test_inpaint_encode_and_noise_mask_flow():
    """VAEEncodeForInpaint neutralizes masked pixels, attaches a grown
    noise_mask, and KSampler restricts denoising to the hole
    (nodes.py:349-386 + comfy sample.py prepare_mask)."""
    import jax
    import numpy as np

    from stable_renderer_tpu.workflow.executor import (
        NODE_REGISTRY,
        InferenceContext,
    )

    ictx = InferenceContext(model_dirs=(), jit_cache={})

    class _Ck:
        widgets = ["none.safetensors"]
        type = "CheckpointLoaderSimple"

    model, clip, vae = NODE_REGISTRY["CheckpointLoaderSimple"](ictx, _Ck())

    class _Enc:
        widgets = ["hi"]
        type = "CLIPTextEncode"

    (pos,) = NODE_REGISTRY["CLIPTextEncode"](ictx, _Enc(), clip=clip)

    pixels = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64)).at[:, 16:48, 16:48].set(1.0)

    class _Inp:
        widgets = [6]
        type = "VAEEncodeForInpaint"

    (lat,) = NODE_REGISTRY["VAEEncodeForInpaint"](ictx, _Inp(), pixels=pixels,
                                                  vae=vae, mask=mask)
    assert "noise_mask" in lat
    assert lat["noise_mask"].shape[1:3] == (64, 64)
    # grown mask strictly contains the original
    assert float(lat["noise_mask"].sum()) >= float(mask.sum())

    class _K:
        widgets = [0, "fixed", 2, 1.0, "euler", "normal", 1.0]
        type = "KSampler"
        id = 991

    (out,) = NODE_REGISTRY["KSampler"](ictx, _K(), model=model, positive=pos,
                                       negative=pos, latent_image=lat)
    arr = np.asarray(out["samples"])
    assert np.isfinite(arr).all()
    # outside the mask the latent must equal the encoded input (not denoised)
    z0 = np.asarray(lat["samples"])
    nm = np.asarray(lat["noise_mask"])
    # downsample mask to latent res by slicing (tiny VAE factor differs; just
    # check the far corner which is well outside any grown mask)
    assert np.allclose(arr[:, :2, :2], z0[:, :2, :2], atol=1e-5)
    assert not np.allclose(arr, z0, atol=1e-3)  # hole was denoised


def test_latent_composite_and_image_nodes():
    import numpy as np

    from stable_renderer_tpu.workflow.executor import (
        NODE_REGISTRY,
        InferenceContext,
    )

    ictx = InferenceContext(model_dirs=(), jit_cache={})
    to = {"samples": jnp.zeros((1, 8, 8, 4))}
    frm = {"samples": jnp.ones((1, 4, 4, 4))}

    class _C:
        widgets = [16, 8, 0]  # x=16px->2 cells, y=8px->1 cell
        type = "LatentComposite"

    (out,) = NODE_REGISTRY["LatentComposite"](ictx, _C(), samples_to=to,
                                              samples_from=frm)
    s = np.asarray(out["samples"])
    assert s[0, 1, 2, 0] == 1.0 and s[0, 0, 0, 0] == 0.0
    assert s[0, 1:5, 2:6].sum() == 4 * 4 * 4

    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.ones((1, 8, 8, 3))

    class _B:
        widgets = [0.5, "normal"]
        type = "ImageBlend"

    (blend,) = NODE_REGISTRY["ImageBlend"](ictx, _B(), image1=a, image2=b)
    np.testing.assert_allclose(np.asarray(blend), 0.5)

    class _I:
        widgets = []
        type = "ImageInvert"

    (inv,) = NODE_REGISTRY["ImageInvert"](ictx, _I(), image=b)
    np.testing.assert_allclose(np.asarray(inv), 0.0)

    class _Ba:
        widgets = []
        type = "ImageBatch"

    (batch,) = NODE_REGISTRY["ImageBatch"](ictx, _Ba(), image1=a, image2=b)
    assert batch.shape == (2, 8, 8, 3)


def test_postprocessing_and_mask_node_pack():
    """comfy_extras node pack: Blur/Sharpen/Quantize + mask ops parity."""
    import jax
    import numpy as np
    import pytest

    from stable_renderer_tpu.workflow.executor import (
        NODE_REGISTRY,
        InferenceContext,
    )

    ictx = InferenceContext(model_dirs=(), jit_cache={})
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))

    def run(ntype, widgets, **kw):
        class _N:
            pass

        _N.type = ntype
        _N.widgets = widgets
        return NODE_REGISTRY[ntype](ictx, _N(), **kw)

    (blurred,) = run("ImageBlur", [2, 1.0], image=img)
    assert blurred.shape == img.shape
    assert float(jnp.std(blurred)) < float(jnp.std(img))  # blur reduces variance
    (sharp,) = run("ImageSharpen", [2, 1.0, 0.5], image=img)
    assert float(jnp.std(sharp)) > float(jnp.std(blurred))
    (quant,) = run("ImageQuantize", [4], image=img)
    assert len(np.unique(np.asarray(quant).round(6))) <= 4

    mask = jnp.zeros((1, 8, 8)).at[:, 3:5, 3:5].set(1.0)
    (m2i,) = run("MaskToImage", [], mask=mask)
    assert m2i.shape == (1, 8, 8, 3)
    (i2m,) = run("ImageToMask", ["green"], image=m2i)
    np.testing.assert_allclose(np.asarray(i2m), np.asarray(mask))
    (inv,) = run("InvertMask", [], mask=mask)
    np.testing.assert_allclose(np.asarray(inv), 1.0 - np.asarray(mask))
    (thr,) = run("ThresholdMask", [0.5], mask=mask * 0.6)
    np.testing.assert_allclose(np.asarray(thr), np.asarray(mask))

    # GrowMask parity vs scipy grey_dilation (nodes_mask.py:309-344)
    scipy = pytest.importorskip("scipy")
    import scipy.ndimage

    (grown,) = run("GrowMask", [2, True], mask=mask)
    ref = np.asarray(mask[0])
    kernel = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for _ in range(2):
        ref = scipy.ndimage.grey_dilation(ref, footprint=kernel)
    np.testing.assert_allclose(np.asarray(grown[0]), ref, atol=1e-6)
    (shrunk,) = run("GrowMask", [-1, True], mask=grown)
    ref2 = scipy.ndimage.grey_erosion(np.asarray(grown[0]), footprint=kernel)
    np.testing.assert_allclose(np.asarray(shrunk[0]), ref2, atol=1e-6)

    (feath,) = run("FeatherMask", [2, 2, 0, 0], mask=jnp.ones((1, 8, 8)))
    assert float(feath[0, 0, 0]) < 0.51  # corner feathered
    assert float(feath[0, 7, 7]) == 1.0

    lat = {"samples": jnp.ones((1, 4, 4, 4))}
    (added,) = run("LatentAdd", [], samples1=lat, samples2=lat)
    np.testing.assert_allclose(np.asarray(added["samples"]), 2.0)
    (mul,) = run("LatentMultiply", [0.5], samples1=lat)
    np.testing.assert_allclose(np.asarray(mul["samples"]), 0.5)


def test_outpaint_pad_and_zero_out():
    import numpy as np

    from stable_renderer_tpu.workflow.executor import (
        NODE_REGISTRY,
        InferenceContext,
    )

    ictx = InferenceContext(model_dirs=(), jit_cache={})
    img = jnp.full((1, 8, 8, 3), 0.25)

    class _P:
        widgets = [4, 0, 4, 0, 0]  # left=4, right=4
        type = "ImagePadForOutpaint"

    new, mask = NODE_REGISTRY["ImagePadForOutpaint"](ictx, _P(), image=img)
    assert new.shape == (1, 8, 16, 3)
    assert mask.shape == (1, 8, 16)
    np.testing.assert_allclose(np.asarray(new[:, :, 4:12]), 0.25)
    np.testing.assert_allclose(np.asarray(new[:, :, :4]), 0.5)  # pad value
    assert float(mask[0, 0, 0]) == 1.0    # padded region = hole
    assert float(mask[0, 4, 8]) == 0.0    # interior kept

    class _Z:
        widgets = []
        type = "ConditioningZeroOut"

    cond = {"context": jnp.ones((1, 77, 64)), "controls": []}
    (z,) = NODE_REGISTRY["ConditioningZeroOut"](ictx, _Z(), conditioning=cond)
    np.testing.assert_allclose(np.asarray(z["context"]), 0.0)
