"""Device prefetch: overlap host->device transfer with the training step.

The training loop's steady state is bounded by host work per step
(device_put of the batch + dispatch), not by the compiled step itself
(measured 168 ms/step naive vs 33.6 ms compiled step on the tunneled v5e).
``device_prefetch`` wraps a loader iterator and keeps ``size`` batches
already resident on the mesh, so the H2D copy of batch N+1 rides under the
computation of batch N.
"""

from __future__ import annotations

import collections

from sr3_tpu.parallel.mesh import shard_batch


def device_prefetch(loader, mesh, size: int = 2):
    """Yield batches (dicts) whose array values are already device-resident
    and sharded on the mesh 'data' axis. ``size`` bounds device memory."""
    import numpy as np

    def put(batch):
        arrays = {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.ndim > 1
        }
        return {**batch, **shard_batch(arrays, mesh)}

    buf = collections.deque()
    for batch in loader:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
