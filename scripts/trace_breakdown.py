"""Device-trace breakdown of the UNet eval and VAE decode.

Captures a jax.profiler trace of the realtime hot ops (UNet cfg-batch-2 eval,
VAE 512^2 decode), parses the trace.json.gz event stream, and prints per-op
time grouped by HLO category (fusion / convolution / custom-call / copy ...)
plus the top individual ops. This is the authoritative per-op view through
the axon tunnel (PERF.md methodology: dispatch floors contaminate host-side
micro timing; device traces do not).

Run: python scripts/trace_breakdown.py [--what unet|vae|both]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(tmpdir: str):
    paths = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found under", tmpdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-side track pids (TPU core threads usually labeled "/device:TPU" or "TensorFlow Ops")
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Device" in n or "/device" in n.lower()}
    by_op = collections.Counter()
    n_by_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # skip the outer run markers and loop parents (children are counted)
        if name.startswith(("jit_", "while")) or name in ("run", "Steps"):
            continue
        by_op[name] += dur
        n_by_op[name] += 1

    def cat_of(name: str) -> str:
        if "flash" in name or "custom-call" in name:
            return "custom-call(pallas)"
        if "conv" in name and "convert" not in name:
            return "convolution"
        if name.startswith(("copy", "bitcast", "transpose")):
            return "copy/transpose"
        if "fusion" in name:
            base = name.split(".")[0]
            return base
        return name.split(".")[0]

    print(f"\ntrace: {path}")
    # split by repetition count: n divisible by 4 -> unet loop, by 2 -> vae loop
    groups = {"unet(/eval)": 4, "vae(/decode)": 2}
    for label, div in groups.items():
        ops = {k: v for k, v in by_op.items() if n_by_op[k] % div == 0
               and (div == 4 or n_by_op[k] % 4 != 0)}
        total = sum(ops.values()) / div
        if not ops:
            continue
        by_cat = collections.Counter()
        for k, v in ops.items():
            by_cat[cat_of(k)] += v / div
        print(f"\n== {label}: {total:.2f} ms ==")
        for cat, ms in by_cat.most_common(14):
            print(f"  {cat:<28s} {ms:9.3f} ms ({ms / max(total, 1e-9) * 100:5.1f}%)")
        print("  top ops:")
        for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
            print(f"    {ms / div:8.3f} ms  n={n_by_op[name]:<4d} {name[:100]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="unet", choices=["unet", "vae", "both"])
    ap.add_argument("--int8", action="store_true",
                    help="quantize conv params (static calibrated scales)")
    ap.add_argument("--out", default="/tmp/sr_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.models.vae import SD15_VAE_CONFIG, VAE
    from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

    use_pallas_attention(True)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    runs = []
    if args.what in ("unet", "both"):
        unet = UNetModel(SD15_UNET_CONFIG)
        up = jax.jit(unet.init, static_argnames="dtype")(key, dtype=dt)
        x = jax.random.normal(key, (2, 64, 64, 4), dt)
        t = jnp.full((2,), 500.0)
        c = jax.random.normal(key, (2, 77, 768), dt)
        if args.int8:
            from stable_renderer_tpu.models.quant import (
                calibrate_act_scales, quantize_tree)
            sc = calibrate_act_scales(lambda p, *a: unet.apply(p, *a), up, x, t, c)
            up = quantize_tree(up, sc)

        @jax.jit
        def run_unet(p, x, t, c):
            def body(i, acc):
                return unet.apply(p, acc, t, c) * 0.05 + acc
            return jax.lax.fori_loop(0, 4, body, x)

        runs.append(("unet x4", run_unet, (up, x, t, c)))
    if args.what in ("vae", "both"):
        vae = VAE(SD15_VAE_CONFIG)
        vp = jax.jit(vae.init, static_argnames="dtype")(key, dtype=dt)
        z = jax.random.normal(key, (1, 64, 64, 4), dt)
        if args.int8:
            from stable_renderer_tpu.models.quant import (
                calibrate_act_scales, quantize_tree)
            vsc = calibrate_act_scales(lambda p, zz: vae.decode(p, zz), vp, z)
            vp = quantize_tree(vp, vsc)

        @jax.jit
        def run_vae(p, z):
            def body(i, acc):
                img = vae.decode(p, acc)
                return acc + 0.0 * img[:, :64, :64, :1].astype(acc.dtype)
            return jax.lax.fori_loop(0, 2, body, z)

        runs.append(("vae decode x2", run_vae, (vp, z)))

    for name, fn, a in runs:
        r = fn(*a)
        np.asarray(jax.device_get(r)).reshape(-1)[0]
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for name, fn, a in runs:
            r = fn(*a)
            np.asarray(jax.device_get(r)).reshape(-1)[0]
    parse_trace(args.out)


if __name__ == "__main__":
    main()
