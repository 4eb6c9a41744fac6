"""Micro-experiments against the 512^2 profile findings (docs/PROF512_r03.txt).

Three measured questions, each isolated from the model:

1. GN stats formulation: does the one-pass sum/sumsq form (independent
   reduces, multi-output-fusable) beat the two-pass mean -> var form
   (dependent reduces, two HBM traversals) at the hot 512^2 shapes?
2. GN stats layout: does reshaping (B,H,W,64) -> (B,H,W/2,128) — logically
   contiguous, fills the 128 lanes — speed the stats reduce despite the
   relayout copy it may insert?
3. Reverse-chain carry layout: the C=3 carry math runs at 3/128 lane
   occupancy (~7% of the 512^2 step). Compare NHWC carry vs flattened
   (B, H*W*C) vs channels-major (B,C,H,W) carries, each paying the
   transposes needed to feed the UNet's NHWC concat input.

Run: python tools/gnexp.py   (TPU; writes docs/GNEXP_r03.txt)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sr3_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LINES = []


def log(msg):
    print(msg, flush=True)
    LINES.append(msg)


def bench(fn, args, iters=20, warmup=2):
    c = jax.jit(fn).lower(*args).compile()
    out = None
    for _ in range(warmup):
        out = c(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = c(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


# ---------------------------------------------------------------- 1: stats

def stats_twopass(x, g):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3))
    var = jnp.mean(jnp.square(xf - mean[:, None, :, None]), axis=(1, 3))
    return mean, var


def stats_onepass(x, g):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3))
    msq = jnp.mean(jnp.square(xf), axis=(1, 3))
    return mean, msq - jnp.square(mean)


def stats_onepass_packed(x, g):
    """Pack W pairs into lanes: (B,H,W,C) -> (B,H,W//2,2C) is logically
    contiguous in row-major, so the reduce runs over full 128-lane rows.
    Per-group sums just add the two packed copies of each group."""
    b, h, w, c = x.shape
    xp = x.reshape(b, h, w // 2, 2 * c)
    xf = xp.astype(jnp.float32).reshape(b, h * (w // 2), 2 * g, c // g)
    s1 = jnp.mean(xf, axis=(1, 3)).reshape(b, 2, g)
    s2 = jnp.mean(jnp.square(xf), axis=(1, 3)).reshape(b, 2, g)
    mean = jnp.mean(s1, axis=1)
    msq = jnp.mean(s2, axis=1)
    return mean, msq - jnp.square(mean)


def _pallas_group_stats(x, g, **kw):
    from sr3_tpu.ops.groupnorm import gn_stats_pallas
    b, h, w, c = x.shape
    s1, s2 = gn_stats_pallas(x, **kw)
    n = h * w
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    cg = c // g
    return (jnp.mean(mean.reshape(b, g, cg), axis=2),
            jnp.mean((var + jnp.square(mean)).reshape(b, g, cg), axis=2)
            - jnp.square(jnp.mean(mean.reshape(b, g, cg), axis=2)))


def run_stats():
    log("== GN stats formulations (time per call) ==")
    shapes = [
        ((8, 512, 512, 64), 16),
        ((8, 512, 512, 128), 16),
        ((8, 256, 256, 128), 16),
        ((8, 1024, 1024, 64), 16),
    ]
    def stats_pallas(x, g):
        return _pallas_group_stats(x, g)

    def stats_pallas_chunk(x, g):
        return _pallas_group_stats(x, g, chunked=True)

    def stats_pallas_big(x, g):
        return _pallas_group_stats(x, g, block_bytes=8 * 1024 * 1024)

    def stats_pallas_chunk_big(x, g):
        return _pallas_group_stats(
            x, g, chunked=True, block_bytes=8 * 1024 * 1024)

    variants = [("twopass", stats_twopass),
                ("onepass", stats_onepass),
                ("onepass_packed", stats_onepass_packed),
                ("pallas_stats", stats_pallas),
                ("pallas_chunk", stats_pallas_chunk),
                ("pallas_big", stats_pallas_big),
                ("pallas_chunk_big", stats_pallas_chunk_big)]
    if os.environ.get("GNEXP_VARIANTS"):
        keep = set(os.environ["GNEXP_VARIANTS"].split(","))
        variants = [v for v in variants if v[0] in keep]
    for shape, g in shapes:
        x = jax.random.normal(
            jax.random.PRNGKey(0), shape, jnp.bfloat16) + 0.3
        bytes_floor = x.size * 2 / 819e9
        m0, v0 = jax.jit(lambda a: stats_twopass(a, g))(x)
        for name, fn in variants:
            try:
                m1, v1 = jax.jit(lambda a: fn(a, g))(x)
                err = float(jnp.max(jnp.abs(v1 - v0)))
                dt = bench(lambda a: fn(a, g), (x,))
                log(f"  {str(shape):24s} {name:15s} {dt*1e3:7.3f} ms "
                    f"({dt/bytes_floor:5.2f}x 1R floor)  max|var err| {err:.2e}")
            except Exception as e:
                log(f"  {str(shape):24s} {name:15s} failed: {e}")


# ---------------------------------------------------------------- 3: carry

def make_carry_exps(b, h, w):
    """Each variant: draw noise, do the per-step elementwise chain, and
    produce the NHWC concat input the UNet actually consumes (forcing the
    layout conversions to be paid inside the timed region)."""
    cond = jnp.zeros((b, h, w, 3), jnp.float32)

    def chain(img, eps, noise):
        x_recon = jnp.clip(0.99 * img - 0.1 * eps, -1.0, 1.0)
        mean = 0.7 * x_recon + 0.29 * img
        return mean + 0.01 * noise

    def nhwc(img, eps, key):
        noise = jax.random.normal(key, img.shape, jnp.float32)
        img = chain(img, eps, noise)
        return img, jnp.concatenate([cond, img], axis=-1)

    def flat(img_flat, eps, key):
        noise = jax.random.normal(key, img_flat.shape, jnp.float32)
        img_flat = chain(img_flat, eps.reshape(b, -1), noise)
        img = img_flat.reshape(b, h, w, 3)
        return img_flat, jnp.concatenate([cond, img], axis=-1)

    def nchw(img_cm, eps, key):
        noise = jax.random.normal(key, img_cm.shape, jnp.float32)
        img_cm = chain(img_cm, eps.transpose(0, 3, 1, 2), noise)
        img = img_cm.transpose(0, 2, 3, 1)
        return img_cm, jnp.concatenate([cond, img], axis=-1)

    return nhwc, flat, nchw


def run_carry():
    log("== reverse-chain carry layouts (per-step elementwise + concat) ==")
    for b, h, w in [(8, 512, 512), (2, 1024, 1024)]:
        nhwc, flat, nchw = make_carry_exps(b, h, w)
        eps = jnp.zeros((b, h, w, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        img = jnp.zeros((b, h, w, 3), jnp.float32)
        logical = b * h * w * 3 * 4
        floor = 5 * logical / 819e9  # eps R, noise W+R(~), img R+W, out W
        for name, fn, x0 in [
            ("nhwc", nhwc, img),
            ("flat", flat, img.reshape(b, -1)),
            ("nchw", nchw, img.transpose(0, 3, 1, 2)),
        ]:
            dt = bench(fn, (x0, eps, key))
            log(f"  ({b},{h},{w}) {name:5s} {dt*1e3:7.3f} ms "
                f"({dt/floor:5.2f}x ~floor)")


def main():
    log(f"backend={jax.default_backend()}")
    if os.environ.get("GNEXP_ONLY") != "carry":
        run_stats()
    if os.environ.get("GNEXP_ONLY") != "stats":
        run_carry()
    mode = "a" if os.environ.get("GNEXP_APPEND") else "w"
    with open(os.environ.get("GNEXP_OUT", "docs/GNEXP_r03.txt"), mode) as f:
        f.write("\n".join(LINES) + "\n")


if __name__ == "__main__":
    main()
