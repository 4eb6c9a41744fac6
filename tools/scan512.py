"""64->512 roofline scan: do the 512^2 paths also sit on the HBM roofline?

The 16->128 flagship has a measured roofline story on both sides (sampling
~87% of HBM bandwidth, training 0.97x the bytes floor — README,
docs/TRAINSCAN_r03.txt). The 512^2 configs only had wall-clock numbers
(docs/BENCH512_r02.json: 62-69 ms/sample-step, 212-230 ms/train-step at
batch 2). This scan adds flops/bytes cost analysis and a batch sweep for
both `sr_sr3_64_512` (reference shape, attention off) and
`sr_sr3_64_512_attn` (flash attention at 32/64 + remat), so any headroom
is visible and harvestable.

Run: python tools/scan512.py   (TPU; writes docs/SCAN512_r03.txt)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sr3_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from sr3_tpu.models.networks import define_G, init_params  # noqa: E402
from sr3_tpu.models.schedule import make_schedule  # noqa: E402
from sr3_tpu.utils.config import (  # noqa: E402
    dict_to_nonedict, load_json_with_comments,
)

LINES = []
V5E_BF16_PEAK = 197e12
V5E_HBM_GBS = 819e9
# output resolution: overridable so the same scan drives other tiers
# (e.g. SCAN512_RES=1024 SCAN512_CONFIGS=configs/sr_sr3_128_1024.json:1024)
RES = int(os.environ.get("SCAN512_RES", "512"))


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


def build(config):
    opt = dict_to_nonedict(load_json_with_comments(config))
    opt["phase"] = "val"
    diffusion = define_G(opt)
    params = init_params(diffusion, jax.random.PRNGKey(0))
    return diffusion, params


def scan_sampling(tag, diffusion, params, batch, chain_steps=20, iters=3):
    """Time a compiled chain_steps reverse chain; roofline from the
    one-step cost analysis (the scan body is counted once)."""
    ep = params
    if diffusion.denoise_fn.dtype == jnp.bfloat16:
        ep = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params)
    sched = jax.device_put(make_schedule(
        {"schedule": "linear", "n_timestep": chain_steps,
         "linear_start": 1e-6, "linear_end": 1e-2}))
    x_sr = jnp.zeros((batch, RES, RES, 3), jnp.float32)

    one = jax.jit(lambda p, s, img, k: diffusion.p_sample_step(
        p, s, img, jnp.int32(chain_steps // 2), k, x_sr))
    c1 = one.lower(ep, sched, x_sr, jax.random.PRNGKey(0)).compile()
    fl, by = _flops_bytes(c1)

    fn = jax.jit(
        lambda p, s, x, k: diffusion.super_resolution(p, s, x, k, False))
    cc = fn.lower(ep, sched, x_sr, jax.random.PRNGKey(1)).compile()
    out = cc(ep, sched, x_sr, jax.random.PRNGKey(1))
    out.block_until_ready()
    t0 = time.time()
    for i in range(iters):
        out = cc(ep, sched, x_sr, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = (time.time() - t0) / iters / chain_steps

    mfu = fl / dt / V5E_BF16_PEAK if fl else 0
    hbm = by / dt / V5E_HBM_GBS if by else 0
    log(f"[{tag} sample b={batch}] {dt*1e3:7.2f} ms/step "
        f"({batch/(dt*2000):6.4f} img/s @T=2000)  MFU {mfu:.3f}  "
        f"HBM {hbm:.2f}x | step flops {fl/1e12:.3f}T bytes {by/1e9:.2f}G "
        f"floors: mxu {fl/V5E_BF16_PEAK*1e3:.1f}ms hbm "
        f"{by/V5E_HBM_GBS*1e3:.1f}ms")
    return dt


def scan_train(tag, diffusion, params, batch, iters=5):
    sched = jax.device_put(make_schedule(
        {"schedule": "linear", "n_timestep": 2000,
         "linear_start": 1e-6, "linear_end": 1e-2}))
    data = {
        "HR": jnp.zeros((batch, RES, RES, 3), jnp.float32),
        "SR": jnp.zeros((batch, RES, RES, 3), jnp.float32),
    }
    tx = optax.adam(1e-4)

    def step(p, o, s, b, k):
        loss, g = jax.value_and_grad(
            lambda q: diffusion.p_losses(q, s, b, k, train=True))(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    p = jax.tree_util.tree_map(jnp.array, params)
    o = tx.init(p)
    cs = jstep.lower(p, o, sched, data, jax.random.PRNGKey(0)).compile()
    fl, by = _flops_bytes(cs)

    p, o, loss = cs(p, o, sched, data, jax.random.PRNGKey(0))
    float(loss)  # value-materializing sync (see verify notes)
    t0 = time.time()
    for i in range(iters):
        p, o, loss = cs(p, o, sched, data, jax.random.PRNGKey(100 + i))
    float(loss)
    dt = (time.time() - t0) / iters

    mfu = fl / dt / V5E_BF16_PEAK if fl else 0
    hbm = by / dt / V5E_HBM_GBS if by else 0
    log(f"[{tag} train  b={batch}] {dt*1e3:7.2f} ms/step "
        f"({batch/dt:6.2f} img/s)  MFU {mfu:.3f}  HBM {hbm:.2f}x | "
        f"flops {fl/1e12:.2f}T bytes {by/1e9:.2f}G floors: mxu "
        f"{fl/V5E_BF16_PEAK*1e3:.1f}ms hbm {by/V5E_HBM_GBS*1e3:.1f}ms")
    return dt


def main():
    log(f"backend={jax.default_backend()}")
    only = os.environ.get("SCAN512_ONLY")
    # batch lists are env-overridable so missing points can be scanned
    # incrementally (512^2 compiles are ~1-2 min each)
    sample_bs = [int(x) for x in os.environ.get(
        "SCAN512_SAMPLE_BATCHES", "2,4,8,16").split(",") if x]
    train_bs = [int(x) for x in os.environ.get(
        "SCAN512_TRAIN_BATCHES", "2,4,8").split(",") if x]
    configs = [
        ("configs/sr_sr3_64_512.json", "noattn"),
        ("configs/sr_sr3_64_512_attn.json", "attn"),
    ]
    if os.environ.get("SCAN512_CONFIGS"):
        configs = [c.split(":") for c in
                   os.environ["SCAN512_CONFIGS"].split(",")]
    for config, tag in configs:
        if only and only != tag:
            continue
        diffusion, params = build(config)
        for b in sample_bs:
            try:
                scan_sampling(tag, diffusion, params, b)
            except Exception as e:  # OOM at large batch is a finding, not a crash
                log(f"[{tag} sample b={b}] failed: {type(e).__name__}: "
                    f"{str(e)[:200]}")
        for b in train_bs:
            try:
                scan_train(tag, diffusion, params, b)
            except Exception as e:
                log(f"[{tag} train  b={b}] failed: {type(e).__name__}: "
                    f"{str(e)[:200]}")

    mode = "a" if os.environ.get("SCAN512_APPEND") else "w"
    out = os.environ.get("SCAN512_OUT", "docs/SCAN512_r03.txt")
    with open(out, mode) as f:
        f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
