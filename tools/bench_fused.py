"""Per-shape microbench: fused GN+SiLU+Conv3x3 Pallas kernel vs XLA.

Benches the block shapes that occur in the 16->128 SR3 UNet (batch 8 by
default). Usage (TPU):  python tools/bench_fused.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sr3_tpu.ops.conv_fused import (
    fusable,
    gn_silu_conv3x3,
    gn_silu_conv3x3_xla,
    vmem_bytes,
)

# (H, W, Cin, Cout) blocks of the sr_sr3_16_128 model (inner=64,
# mults 1/2/4/8/8): down path block1 is Cin->Cout, block2 Cout->Cout;
# up path concats skip channels.
SHAPES = [
    (128, 128, 64, 64),
    (64, 64, 64, 128), (64, 64, 128, 128),
    (32, 32, 128, 256), (32, 32, 256, 256),
    (16, 16, 256, 512), (16, 16, 512, 512),
    (8, 8, 512, 512),
    (8, 8, 1024, 512),      # up-path concat
    (16, 16, 1024, 512),
    (32, 32, 512, 256),
    (64, 64, 256, 128),
    (128, 128, 128, 64),    # widest up-path block
]


def bench(f, args, iters=30):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    groups = 32
    print(f"backend={jax.default_backend()} batch={b} dtype={dtype.__name__}")
    tot_x, tot_p = 0.0, 0.0
    for h, w, c, cout in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
        gs = jnp.ones((c,), jnp.float32)
        gb = jnp.zeros((c,), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.05, dtype)
        cb = jnp.zeros((cout,), jnp.float32)

        fx = jax.jit(lambda x, gs, gb, k, cb: gn_silu_conv3x3_xla(
            x, gs, gb, k, cb, groups))
        tx = bench(fx, (x, gs, gb, k, cb))
        tot_x += tx

        ok = fusable(x.shape, cout, groups, dtype)
        if ok:
            fp = jax.jit(lambda x, gs, gb, k, cb: gn_silu_conv3x3(
                x, gs, gb, k, cb, groups, use_pallas=True))
            tp = bench(fp, (x, gs, gb, k, cb))
            tot_p += tp
        else:
            tp = tx
            tot_p += tx
        vm = vmem_bytes(h, w, c, cout, jnp.dtype(dtype).itemsize) / 1e6
        mark = "" if ok else "  (XLA fallback)"
        print(f"{h:4d}x{w:<4d} {c:4d}->{cout:<4d} xla {tx * 1e6:8.1f}us  "
              f"pallas {tp * 1e6:8.1f}us  x{tx / tp:4.2f}  vmem {vm:5.1f}MB"
              f"{mark}")
    print(f"TOTAL xla {tot_x * 1e3:.2f}ms  pallas {tot_p * 1e3:.2f}ms  "
          f"x{tot_x / tot_p:.2f}")


if __name__ == "__main__":
    main()
