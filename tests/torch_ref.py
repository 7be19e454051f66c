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

    dotenv = types.ModuleType("dotenv")
    dotenv.load_dotenv = lambda *a, **k: None
    dotenv.find_dotenv = lambda *a, **k: ""
    sys.modules["dotenv"] = dotenv

    cu = types.ModuleType("common_utils")
    cu.__path__ = []  # mark as package
    sys.modules["common_utils"] = cu

    dbg = types.ModuleType("common_utils.debug_utils")
    dbg.ComfyUILogger = logging.getLogger("comfyui-ref")
    dbg.EngineLogger = logging.getLogger("engine-ref")
    dbg.DefaultLogger = logging.getLogger("default-ref")
    sys.modules["common_utils.debug_utils"] = dbg
    cu.debug_utils = dbg

    glb = types.ModuleType("common_utils.global_utils")
    _globals: dict = {}

    def GetEnv(key, default=None, type=str):
        try:
            val = os.environ[key]
        except KeyError:
            return default
        try:
            if type is bool:
                return val.lower() in ("1", "true", "yes")
            return type(val)
        except Exception:
            return default

    glb.GetEnv = GetEnv
    glb.is_dev_mode = lambda: False
    glb.is_verbose_mode = lambda: False
    glb.is_dev_verbose = lambda: False
    glb.is_engine_looping = lambda: False
    glb.is_game_mode = lambda: False
    glb.is_editor_mode = lambda: False
    glb.is_release_mode = lambda: True
    glb.is_comfy_main = lambda: False
    glb.SetGlobalValue = _globals.__setitem__
    glb.GetGlobalValue = lambda k, d=None: _globals.get(k, d)

    def GetOrCreateGlobalValue(key, creator, *a, **k):
        if key not in _globals:
            _globals[key] = creator(*a, **k)
        return _globals[key]

    glb.GetOrCreateGlobalValue = GetOrCreateGlobalValue
    sys.modules["common_utils.global_utils"] = glb
    cu.global_utils = glb

    tu = types.ModuleType("common_utils.type_utils")

    def is_empty_method(method):
        doc_str = getattr(method, "__doc__", None)
        source = inspect.getsource(method)
        if doc_str:
            source = source.replace(doc_str, "")
        pat = re.compile(r"(async)?\s*def\s+\w+\s*\(.*\).*?:", re.MULTILINE | re.DOTALL)
        source = re.sub(pat, "", source, count=1)
        lines = [ln.strip() for ln in source.split("\n") if ln.strip()]
        lines = [ln for ln in lines
                 if not ln.startswith(("#", '"""', "'''")) and ln != "pass"]
        return not lines

    def check_func_has_kwarg(func, return_sig=False):
        sig = inspect.signature(func)
        has = any(p.kind == inspect.Parameter.VAR_KEYWORD
                  for p in sig.parameters.values())
        return (sig, has) if return_sig else has

    tu.is_empty_method = is_empty_method
    tu.check_func_has_kwarg = check_func_has_kwarg
    sys.modules["common_utils.type_utils"] = tu
    cu.type_utils = tu

    pu = types.ModuleType("common_utils.path_utils")
    pu.COMFYUI_DIR = os.path.join(REF, "comfyUI")
    sys.modules["common_utils.path_utils"] = pu
    cu.path_utils = pu

    sru = types.ModuleType("common_utils.stable_render_utils")

    class Corresponder:  # structural protocol only
        pass

    sru.Corresponder = Corresponder
    sys.modules["common_utils.stable_render_utils"] = sru
    cu.stable_render_utils = sru


def load_reference_comfy():
    """sys.path + stubs, then return the imported `comfy` package."""
    _install_stubs()
    for p in (os.path.join(REF, "comfyUI"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import comfy  # noqa: F401

    return comfy
