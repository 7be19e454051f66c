"""Import the REFERENCE's torch modules for numeric parity oracles.

The reference (/root/reference/source/comfyUI/comfy) is a torch codebase whose
plumbing (common_utils) drags in UI/runtime deps (PySide6, dotenv, rotating log
handlers) that aren't in this image and aren't needed for math. This helper
injects minimal behavior-preserving stand-ins for exactly those plumbing
modules, then imports the real comfy model code on torch-CPU.

Stubbed (plumbing only — none of it touches the model math):
  concurrent_log_handler       -> no-op logging handler
  dotenv                       -> no-op load_dotenv
  common_utils.debug_utils     -> stdlib logging loggers
  common_utils.global_utils    -> env-var helpers (same semantics)
  common_utils.type_utils      -> real implementations (inspect-based, copied
                                  semantics: empty-method + **kwargs checks)
  common_utils.path_utils      -> COMFYUI_DIR constant
  common_utils.stable_render_utils -> structural Corresponder protocol

Everything under comfy.* (UNet, VAE, CLIP, ControlNet, k_diffusion, samplers)
is the reference's own code, unmodified.
"""

from __future__ import annotations

import inspect
import logging
import os
import re
import sys
import types

REF = "/root/reference/source"


def _install_stubs() -> None:
    if "common_utils" in sys.modules:
        return

    clh = types.ModuleType("concurrent_log_handler")

    class _NullHandler(logging.Handler):
        def __init__(self, *a, **k):
            super().__init__()

        def emit(self, record):
            pass

    clh.ConcurrentTimedRotatingFileHandler = _NullHandler
    sys.modules["concurrent_log_handler"] = clh

    # torchvision is only imported by comfy/ldm/cascade/stage_c_coder.py for
    # the EfficientNet backbone (constructed lazily, never in parity tests).
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")

        def _no_tv(*a, **k):
            raise RuntimeError("torchvision stubbed out in parity tests")

        tvm.efficientnet_v2_s = _no_tv
        tv.models = tvm
        tv.__version__ = "0.0.0"
        # transformers probes availability via importlib.util.find_spec,
        # which raises on a module whose __spec__ is None
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tvm.__spec__ = importlib.machinery.ModuleSpec("torchvision.models", None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm

    if "torchsde" not in sys.modules:
        # k_diffusion/sampling.py imports torchsde for the SDE samplers'
        # BrownianTree noise. Parity tests cover the deterministic samplers;
        # this stub just satisfies the import (and gives seeded gaussian
        # increments if an SDE sampler is ever exercised).
        import torch as _torch

        tsde = types.ModuleType("torchsde")

        class _BrownianTree:
            def __init__(self, t0, w0, t1=None, entropy=0, **kwargs):
                self._gen = _torch.Generator().manual_seed(int(entropy) & (2**63 - 1))
                self._shape = w0.shape
                self._dtype = w0.dtype

            def __call__(self, t0, t1):
                dt = abs(float(t1) - float(t0))
                return _torch.randn(self._shape, generator=self._gen,
                                    dtype=self._dtype) * (dt ** 0.5)

        tsde.BrownianTree = _BrownianTree
        sys.modules["torchsde"] = tsde

    if "deprecated" not in sys.modules:
        dep = types.ModuleType("deprecated")

        def deprecated(*a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]
            return lambda f: f

        dep.deprecated = deprecated
        sys.modules["deprecated"] = dep

    dotenv = types.ModuleType("dotenv")
    dotenv.load_dotenv = lambda *a, **k: None
    dotenv.find_dotenv = lambda *a, **k: ""
    sys.modules["dotenv"] = dotenv

    cu = types.ModuleType("common_utils")
    cu.__path__ = []  # mark as package
    sys.modules["common_utils"] = cu

    dbg = types.ModuleType("common_utils.debug_utils")

    def _mk_logger(name):
        lg = logging.getLogger(name)
        # the reference's loggers expose a .print method (debug_utils.py)
        lg.print = lambda *a, **k: None  # type: ignore[attr-defined]
        return lg

    dbg.ComfyUILogger = _mk_logger("comfyui-ref")
    dbg.EngineLogger = _mk_logger("engine-ref")
    dbg.DefaultLogger = _mk_logger("default-ref")
    dbg.format_data_for_console_log = lambda data, *a, **k: repr(data)
    dbg.get_log_level_by_name = lambda name: logging.INFO
    sys.modules["common_utils.debug_utils"] = dbg
    cu.debug_utils = dbg

    # Point the stub package's search path at the REAL common_utils directory:
    # modules NOT pre-seeded above (type_utils, math_utils, data_struct, ...)
    # import the reference's actual implementations; the plumbing modules
    # stubbed into sys.modules above take precedence.
    cu.__path__ = [os.path.join(REF, "common_utils")]

    sru = types.ModuleType("common_utils.stable_render_utils")

    class Corresponder:  # structural protocol only
        pass

    sru.Corresponder = Corresponder
    sys.modules["common_utils.stable_render_utils"] = sru
    cu.stable_render_utils = sru


def load_reference_comfy():
    """sys.path + stubs, then return the imported `comfy` package.

    Forces the reference onto torch-CPU (comfy.cli_args args.cpu=True) BEFORE
    comfy.model_management import-time device probing runs — this image has
    torch-cpu only.
    """
    _install_stubs()
    for p in (os.path.join(REF, "comfyUI"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    # comfy/model_base.py:36 subscripts typing.TypeAlias (invalid on py>=3.11,
    # where the reference's own version guard routes INTO the broken branch).
    # Shim a subscriptable stand-in — it's only ever used as an annotation.
    import typing

    class _SubscriptableAlias:
        def __getitem__(self, item):
            return typing.Any

    typing.TypeAlias = _SubscriptableAlias()  # type: ignore[assignment]

    import comfy  # noqa: F401
    import comfy.cli_args

    comfy.cli_args.args.cpu = True
    import comfy.model_management  # noqa: F401  (device probe happens here)

    return comfy
