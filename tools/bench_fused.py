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


K_INNER = 20


def bench(f, args, iters=10):
    """Per-op time with dispatch overhead amortized: K_INNER chained
    applications inside one jit (the output feeds back into the input so
    XLA cannot CSE or parallelize them)."""
    x0, rest = args[0], args[1:]

    c_in, c_out = x0.shape[-1], None

    @jax.jit
    def chained(x, *rest):
        def mix(y):
            # fold y (…,Cout) back to (…,Cin): slice or tile — a real
            # data dependency XLA cannot simplify away
            cout = y.shape[-1]
            if cout >= c_in:
                return y[..., :c_in]
            reps = -(-c_in // cout)
            return jnp.concatenate([y] * reps, axis=-1)[..., :c_in]

        def body(c, _):
            y = f(c, *rest)
            return (x + 0.01 * mix(y)).astype(x.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=K_INNER)
        return c

    out = chained(x0, *rest)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        # vary the input per call — identical dispatches can be served
        # from a cache upstream, which fakes impossible speeds
        out = chained(x0 + jnp.asarray(i, x0.dtype), *rest)
    jax.block_until_ready(out)
    return (time.time() - t0) / (iters * K_INNER)


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

        fx = lambda x, gs, gb, k, cb: gn_silu_conv3x3_xla(
            x, gs, gb, k, cb, groups)
        tx = bench(fx, (x, gs, gb, k, cb))
        tot_x += tx

        ok = fusable(x.shape, cout, groups, dtype)
        if ok:
            fp = lambda x, gs, gb, k, cb: gn_silu_conv3x3(
                x, gs, gb, k, cb, groups, use_pallas=True)
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
