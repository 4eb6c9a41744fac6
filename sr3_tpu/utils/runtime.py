"""Process-level runtime setup shared by all entry points.

Call ``setup_runtime()`` BEFORE any JAX computation. It handles:

- ``SR3_PLATFORM``: force a backend (e.g. ``cpu`` for hardware-free smoke
  runs). jax.config wins over the environment's pinned JAX_PLATFORMS.
- ``SR3_MULTIHOST``: run ``jax.distributed.initialize()`` for multi-host
  (DCN) training; the mesh code then spans all hosts' devices.
- PRNG implementation: on TPU the default threefry2x32 lowers to scalar code
  that is ~3 orders of magnitude slower than the hardware RNG for the big
  dropout masks of this model (measured 27 s vs 35 ms per train step on
  v5e); default to the TPU-native ``rbg`` implementation there. Override
  with ``SR3_PRNG=threefry2x32`` when bit-exact threefry streams matter.
"""

from __future__ import annotations

import os


def setup_runtime():
    import jax

    if os.environ.get("SR3_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SR3_PLATFORM"])

    if os.environ.get("SR3_MULTIHOST"):
        # On TPU pods / known clusters jax autodetects everything; on
        # generic hosts (and in the two-process CI test) the coordinator
        # triple is passed explicitly via env:
        #   SR3_COORDINATOR=host:port SR3_NUM_PROCESSES=N SR3_PROCESS_ID=i
        kwargs = {}
        if os.environ.get("SR3_COORDINATOR"):
            kwargs = dict(
                coordinator_address=os.environ["SR3_COORDINATOR"],
                num_processes=int(os.environ["SR3_NUM_PROCESSES"]),
                process_id=int(os.environ["SR3_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kwargs)

    prng = os.environ.get("SR3_PRNG")
    if prng:
        jax.config.update("jax_default_prng_impl", prng)
    elif jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    # Persistent XLA compilation cache: first compiles of the big programs
    # (2000-step chain, fused K-step train scan) take minutes on a tunneled
    # chip; subsequent process launches reload them in seconds. On by
    # default on TPU; override the location with SR3_COMPILE_CACHE, or
    # disable with SR3_COMPILE_CACHE=0.
    cache = os.environ.get("SR3_COMPILE_CACHE")
    if cache != "0":
        if not cache and jax.default_backend() == "tpu":
            cache = os.path.expanduser("~/.cache/sr3_tpu/xla")
        if cache:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
