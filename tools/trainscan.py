"""Train-step roofline bisection (VERDICT r2 #9): where do the ms go?

Splits the flagship 16->128 train step (batch 16, 57.5 ms/step, 0.38 MFU
in BENCH_r02) into segments — forward loss, fwd+bwd, full step — and
measures targeted variants (no dropout, bf16 Adam mu, f32 GN off,
larger batch) to locate the gap between the measured step and the
compute/HBM rooflines.

Run: python tools/trainscan.py   (TPU; a few minutes)
Writes docs/TRAINSCAN_r03.txt.
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
import optax  # noqa: E402

from sr3_tpu.models.networks import define_G, init_params  # noqa: E402
from sr3_tpu.models.schedule import make_schedule  # noqa: E402
from sr3_tpu.utils.config import (  # noqa: E402
    dict_to_nonedict, load_json_with_comments,
)

LINES = []
V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819e9


def log(msg):
    print(msg, flush=True)
    LINES.append(msg)


def _flops_bytes(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0)), float(
            ca.get("bytes accessed", 0) or 0)
    except Exception:
        return None, None


def timeit(compiled, args, iters=10, vary_key_idx=None):
    out = compiled(*args)
    jax.block_until_ready(out)
    # vary an input per repeat so upstream caches can't serve results
    t0 = time.time()
    for i in range(iters):
        if vary_key_idx is not None:
            args = list(args)
            args[vary_key_idx] = jax.random.PRNGKey(100 + i)
        out = compiled(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def build(dropout_override=None, dtype=None):
    opt = dict_to_nonedict(
        load_json_with_comments("configs/sr_sr3_16_128.json"))
    opt["phase"] = "val"
    if dropout_override is not None:
        opt["model"]["unet"]["dropout"] = dropout_override
    if dtype is not None:
        opt["model"]["dtype"] = dtype
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    sched = make_schedule(opt["model"]["beta_schedule"]["train"])
    return diffusion, params, sched


def scan(batch, diffusion, params, sched, tag, mu_dtype=None, iters=10):
    data = {
        "HR": jnp.zeros((batch, 128, 128, 3), jnp.float32),
        "SR": jnp.zeros((batch, 128, 128, 3), jnp.float32),
    }
    k = jax.random.PRNGKey(0)

    # --- forward only
    fwd = jax.jit(lambda p, b, k: diffusion.p_losses(p, sched, b, k,
                                                     train=True))
    cf = fwd.lower(params, data, k).compile()
    t_fwd = timeit(cf, (params, data, k), iters, vary_key_idx=2)
    f_fwd, by_fwd = _flops_bytes(cf)

    # --- fwd + bwd
    vg = jax.jit(lambda p, b, k: jax.value_and_grad(
        lambda q: diffusion.p_losses(q, sched, b, k, train=True))(p))
    cg = vg.lower(params, data, k).compile()
    t_vg = timeit(cg, (params, data, k), iters, vary_key_idx=2)
    f_vg, by_vg = _flops_bytes(cg)

    # --- full step
    tx = optax.adam(1e-4, mu_dtype=mu_dtype)

    def step(p, o, b, k):
        loss, g = jax.value_and_grad(
            lambda q: diffusion.p_losses(q, sched, b, k, train=True))(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    p = jax.tree_util.tree_map(jnp.array, params)
    o = tx.init(p)
    cs = jstep.lower(p, o, data, k).compile()
    f_st, by_st = _flops_bytes(cs)

    ps = [p]

    def run_step(pp, oo, b, kk):
        return cs(pp, oo, b, kk)

    out = cs(p, o, data, k)
    jax.block_until_ready(out)
    p, o, _ = out
    t0 = time.time()
    for i in range(iters):
        p, o, loss = cs(p, o, data, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(loss)
    t_st = (time.time() - t0) / iters

    mfu = f_st / t_st / V5E_BF16_PEAK if f_st else 0
    hbm = by_st / t_st / V5E_HBM_GBS if by_st else 0
    log(f"[{tag} b={batch}] fwd {t_fwd*1e3:7.2f} ms | fwd+bwd "
        f"{t_vg*1e3:7.2f} ms | step {t_st*1e3:7.2f} ms "
        f"({batch/t_st:6.1f} img/s)  MFU {mfu:.3f}  HBM {hbm:.2f}x "
        f"| flops {f_st/1e12:.2f}T bytes {by_st/1e9:.2f}G")
    log(f"    segments: bwd-only ~{(t_vg-t_fwd)*1e3:.2f} ms, "
        f"optimizer ~{(t_st-t_vg)*1e3:.2f} ms; roofline floors: compute "
        f"{f_st/V5E_BF16_PEAK*1e3:.2f} ms, hbm {by_st/V5E_HBM_GBS*1e3:.2f} ms")
    return t_st


def main():
    log(f"backend={jax.default_backend()}")

    diffusion, params, sched = build()
    t16 = scan(16, diffusion, params, sched, "baseline")
    scan(32, diffusion, params, sched, "baseline")

    # dropout off: isolates RNG mask gen + apply cost
    d0, p0, s0 = build(dropout_override=0.0)
    scan(16, d0, p0, s0, "dropout=0")

    # bf16 Adam first moment: halves mu HBM traffic
    scan(16, diffusion, params, sched, "mu=bf16", mu_dtype=jnp.bfloat16)

    with open("docs/TRAINSCAN_r03.txt", "w") as f:
        f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
