"""Sampling-step roofline bisection — the sampling counterpart of trainscan.

The headline bench line (BASELINE.md north star) is the 2000-step reverse
chain at 16->128; BENCH_r04 reported 0.585 img/s/chip at MFU 0.53 with no
checked-in defense of whether 0.53 is the floor or laziness. This tool
measures where the sampling milliseconds go:

1. batch sweep of the compiled chain (f32 params vs pre-cast bf16 params),
   timed with an explicit ``jax.device_get`` round-trip — on the tunneled
   axon platform ``block_until_ready`` can return before remote completion
   (measured: a 0.77 s chain "completes" in 0.9 ms without the fetch),
2. per-step flops / bytes from XLA cost analysis of a standalone
   ``p_sample_step``, with an explicit correction for scan loop-invariant
   code motion: inside the chain XLA hoists the f32->bf16 weight converts
   out of the ``lax.scan`` (verified by the bf16-params null below), so the
   standalone step over-counts weight traffic by (f32 read + bf16 write)
   of the 97.8 M params,
3. roofline verdict: compute floor (flops / 197 TFLOPS bf16), corrected
   bytes ESTIMATE (bytes / 819 GB/s), measured wall. Cost-analysis bytes
   are an upper bound — they count operands fusion never materializes in
   HBM — so "measured / bytes-estimate" is a LOWER bound on achieved HBM
   efficiency. Batch 1 proves the over-count: measured 1.6 ms/step beats
   the 2.7 ms naive floor outright.

Findings (docs/SAMPLESCAN_r05.txt, v5e-1 via axon):
- pre-casting params to bf16 is a NULL at every batch (deltas within
  +-1.5% rep noise): the scan already reads bf16 weights per step; the
  cast is hoisted. (Chain outputs match the f32-param chain to 5.8e-3
  max abs on [-1,1] — at most one bf16 ulp through 100 steps.)
- batch 8 (the knee): measured ~7.1 ms/step vs the 5.8 ms upper-bound
  bytes estimate -> >=0.82x of the HBM roofline (compute floor 3.6 ms,
  so bytes-bound). The residual <=18% is conv im2col/GN multi-pass
  overhead that the round-2 fused-conv kernels already measured SLOWER
  to remove (docs/FUSED_CONV.md) — ~0.53 MFU IS the operating roofline
  for this model in bf16-compute/f32-param form; no sampling-side dtype
  lever remains.
- batch 4 costs the same ms/step as batch 8 (7.0 vs 7.1): sub-knee
  batches pad to the same tile occupancy; batch 8 is the right default.

Run: python tools/samplescan.py   (TPU; ~3 min)
Writes docs/SAMPLESCAN_r05.txt (override with SCAN_OUT). Env knobs:
SCAN_CONFIG, SCAN_STEPS (chain length, default 100), SCAN_BATCHES
(csv, default "1,2,4,8,16"), SCAN_COST_BATCHES (csv, default "1,8"),
SCAN_REPS (default 3). tests/test_samplescan.py drives main() on a
micro model on CPU.

Reference analog: none — the reference publishes no sampling-perf
analysis; its chain is a Python loop over 2000 ``p_sample`` calls
(/root/reference/model/sr3_modules/diffusion.py:139-151).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sr3_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sr3_tpu.models.networks import define_G, init_params  # noqa: E402
from sr3_tpu.models.schedule import make_schedule  # noqa: E402
from sr3_tpu.utils.config import (  # noqa: E402
    dict_to_nonedict, load_json_with_comments,
)

V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819e9
LINES = []


def log(msg):
    print(msg, flush=True)
    LINES.append(msg)


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0) or 0), float(
            ca.get("bytes accessed", 0) or 0)
    except Exception:
        return None, None


def time_chain(compiled, args, steps, reps=None):
    if reps is None:
        reps = int(os.environ.get("SCAN_REPS", 3))
    """ms/step, with a device_get round-trip to defeat the tunnel's
    optimistic block_until_ready (see module docstring)."""
    out = compiled(*args)
    jax.device_get(out)
    t0 = time.time()
    for i in range(reps):
        a = list(args)
        a[3] = jax.random.PRNGKey(100 + i)
        out = compiled(*a)
    last = jax.device_get(out)
    dt = (time.time() - t0) / reps
    return dt / steps * 1e3, last


def main():
    del LINES[:]
    config = os.environ.get("SCAN_CONFIG", "configs/sr_sr3_16_128.json")
    steps = int(os.environ.get("SCAN_STEPS", 100))
    opt = dict_to_nonedict(load_json_with_comments(config))
    opt["phase"] = "val"
    diff = define_G(opt)
    params = init_params(diff, jax.random.PRNGKey(0))
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    sched = make_schedule(
        {"schedule": "linear", "n_timestep": steps,
         "linear_start": 1e-6, "linear_end": 1e-2})
    res = opt["model"]["diffusion"]["image_size"]
    log(f"backend={jax.default_backend()} config={config} "
        f"params={nparams / 1e6:.1f}M res={res} chain_steps={steps}")

    fn = jax.jit(
        lambda p, s, x, k: diff.super_resolution(p, s, x, k, False))
    pbf = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)

    batches = tuple(
        int(b) for b in
        os.environ.get("SCAN_BATCHES", "1,2,4,8,16").split(","))
    cost_batches = tuple(
        int(b) for b in
        os.environ.get("SCAN_COST_BATCHES", "1,8").split(","))

    log("\n-- chain ms/step: f32 params vs pre-cast bf16 params "
        "(img/s normalized to 2000 steps)")
    results = {}
    outs = {}
    for B in batches:
        x_sr = jnp.zeros((B, res, res, 3), jnp.float32)
        for tag, p in (("f32", params), ("bf16", pbf)):
            c = fn.lower(p, sched, x_sr, jax.random.PRNGKey(1)).compile()
            ms, out = time_chain(
                c, [p, sched, x_sr, jax.random.PRNGKey(1)], steps)
            results[(B, tag)] = ms
            outs[(B, tag)] = out
            log(f"batch {B:2d} {tag:4s}: {ms:7.3f} ms/step   "
                f"{B / (ms * steps / 1e3) * steps / 2000.0:.4f} img/s@2000")
        d = np.abs(outs[(B, 'f32')].astype(np.float32)
                   - outs[(B, 'bf16')].astype(np.float32)).max()
        rel = (results[(B, 'bf16')] - results[(B, 'f32')]) \
            / results[(B, 'f32')]
        log(f"          bf16-params delta {rel * 100:+.1f}%  "
            f"(chain max|diff| {d:.1e} on [-1,1])")

    log("\n-- per-step cost analysis (standalone p_sample_step; the scan "
        "hoists the f32->bf16 weight converts, so subtract them)")
    sched2k = make_schedule(
        {"schedule": "linear", "n_timestep": 2000,
         "linear_start": 1e-6, "linear_end": 1e-2})
    hoisted = nparams * 4 + nparams * 2  # f32 read + bf16 write per step
    for B in cost_batches:
        x_sr = jnp.zeros((B, res, res, 3), jnp.float32)
        img = jnp.zeros((B, res, res, 3), jnp.float32)
        one = jax.jit(
            lambda p, s, im, k: diff.p_sample_step(
                p, s, im, jnp.int32(1000), k, x_sr))
        c = one.lower(params, sched2k, img,
                      jax.random.PRNGKey(0)).compile()
        fl, by = _cost(c)
        if fl is None:
            log(f"batch {B}: cost analysis unavailable")
            continue
        by_scan = by - hoisted + nparams * 2  # reads bf16 copy instead
        t_c = fl / V5E_BF16_PEAK * 1e3
        t_b = by_scan / V5E_HBM_GBS * 1e3
        meas = results.get((B, "f32"))
        log(f"batch {B:2d}: flops {fl / 1e9:7.1f} G  bytes(standalone) "
            f"{by / 1e9:.3f} GB  bytes(in-scan est, upper bound) "
            f"{by_scan / 1e9:.3f} GB")
        if meas is None:
            log(f"          compute floor {t_c:.2f} ms   bytes estimate "
                f"{t_b:.2f} ms   (batch not in SCAN_BATCHES — no wall)")
            continue
        log(f"          compute floor {t_c:.2f} ms   bytes estimate "
            f"{t_b:.2f} ms   measured {meas:.2f} ms -> >= "
            f"{t_b / meas:.2f}x of HBM roofline"
            + ("   [bytes-bound]" if t_b > t_c else "   [compute-bound]"))

    out_path = os.environ.get("SCAN_OUT") or os.path.join(
        os.path.dirname(__file__), "..", "docs", "SAMPLESCAN_r05.txt")
    with open(out_path, "w") as f:
        f.write("\n".join(LINES) + "\n")
    log(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
