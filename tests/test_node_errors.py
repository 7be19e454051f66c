"""Structured per-node execution errors (VERDICT r3 missing #4 / weak #6).

Reference behavior: execution.py:950-993 handle_execution_error builds
error_details {node_id, node_type, exception_message, exception_type,
traceback, current_inputs, executed}, pushes an "execution_error" message,
and prunes cached outputs downstream of the failure.
"""

from __future__ import annotations

import numpy as np
import pytest

from stable_renderer_tpu.workflow.executor import (
    NODE_REGISTRY,
    NodeExecutionError,
    PromptExecutor,
    register_node,
)
from stable_renderer_tpu.workflow.loader import Workflow, WorkflowNode


def _wf(nodes):
    return Workflow(nodes=nodes, unknown_types=[], path=None)


@pytest.fixture
def boom_graph():
    """loader -> boom -> sink; loader output is cacheable, boom raises."""

    @register_node("_OkLoaderTest")
    def ok_loader(ctx, node):
        return ("model-object",)

    @register_node("_BoomNodeTest")
    def boom(ctx, node, model=None):
        raise ValueError("deliberate kaboom")

    @register_node("_SinkNodeTest")
    def sink(ctx, node, x=None):
        return (x,)

    wf = _wf({
        1: WorkflowNode(id=1, type="_OkLoaderTest", widgets=[], inputs={},
                        output_names=[]),
        2: WorkflowNode(id=2, type="_BoomNodeTest", widgets=[],
                        inputs={"model": (1, 0)}, output_names=[]),
        3: WorkflowNode(id=3, type="_SinkNodeTest", widgets=[],
                        inputs={"x": (2, 0)}, output_names=[]),
    })
    yield wf
    for name in ("_OkLoaderTest", "_BoomNodeTest", "_SinkNodeTest"):
        NODE_REGISTRY.pop(name, None)


def test_error_details_shape(boom_graph):
    ex = PromptExecutor(boom_graph, validate=False)
    with pytest.raises(NodeExecutionError) as ei:
        ex.execute()
    d = ei.value.details
    assert d["node_id"] == 2
    assert d["node_type"] == "_BoomNodeTest"
    assert d["exception_type"] == "ValueError"
    assert "deliberate kaboom" in d["exception_message"]
    assert any("deliberate kaboom" in ln for ln in d["traceback"])
    # inputs are summarized, not raw objects
    assert d["current_inputs"] == {"model": "'model-object'"}
    # upstream loader DID run before the failure
    assert 1 in d["executed"]


def test_innermost_failing_node_reported(boom_graph):
    """The sink consumes the boom node; the error must name the boom node,
    not the sink that requested it."""
    ex = PromptExecutor(boom_graph, validate=False)
    with pytest.raises(NodeExecutionError) as ei:
        ex.execute()
    assert ei.value.details["node_id"] == 2


def test_downstream_cache_pruned_on_error(boom_graph):
    """Cached outputs not recomputed in the failing run are dropped
    (execution.py:984-993) — but freshly-executed upstream nodes are kept in
    ctx.outputs for inspection."""
    ex = PromptExecutor(boom_graph, validate=False)
    # boom + sink re-run every frame; a previous run left a stale cached
    # output for the sink
    ex._frame_tainted = {2, 3}
    ex._cache[3] = ("stale-downstream",)
    with pytest.raises(NodeExecutionError):
        ex.execute()
    assert 3 not in ex._cache


def test_unknown_type_suggests_close_match():
    wf = _wf({
        1: WorkflowNode(id=1, type="KSamplerr", widgets=[], inputs={},
                        output_names=[]),
    })
    ex = PromptExecutor(wf, validate=False)
    with pytest.raises(NodeExecutionError) as ei:
        ex.execute()
    assert "KSampler" in ei.value.details["exception_message"]


def test_server_history_records_error_details(boom_graph):
    """serve_workflows: a failing prompt lands in history with the structured
    details and an execution_error event is posted."""
    import json

    from stable_renderer_tpu.server import FrameServer, serve_workflows

    server = FrameServer(port=0)  # never start()ed — worker loop only
    wf_dict = {
        "nodes": [
            {"id": 1, "type": "_OkLoaderTest", "widgets_values": []},
            {"id": 2, "type": "_BoomNodeTest", "widgets_values": [],
             "inputs": [{"name": "model", "link": 10}]},
            {"id": 3, "type": "_SinkNodeTest", "widgets_values": [],
             "inputs": [{"name": "x", "link": 11}]},
        ],
        "links": [
            [10, 1, 0, 2, 0, "MODEL"],
            [11, 2, 0, 3, 0, "ANY"],
        ],
    }
    events = []
    server.post_event = lambda etype, data: events.append((etype, data))
    pid = server.queue.put(wf_dict)
    serve_workflows(server, max_prompts=1, poll_timeout=0.05)

    hist = server.queue.get_history_item(pid)
    assert hist is not None and hist["status"] == "error"
    details = hist["messages"][0]
    assert details["node_id"] == 2
    assert details["exception_type"] == "ValueError"
    err_events = [d for t, d in events if t == "execution_error"]
    assert err_events and err_events[0]["node_id"] == 2
    # details survive JSON serialization (the /history endpoint)
    json.dumps(hist)
