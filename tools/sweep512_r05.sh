#!/bin/bash
# Round-5 512^2 refresh (VERDICT r04 item 4): re-measure the attention-on
# 64->512 model on the current kernel stack (r03 GN stats + r04 per-model
# toggles) at batches 1/2/4/8, flash vs XLA attention, train + sample.
# One bench512 invocation per cell so a tunnel drop loses one cell, not
# the sweep; cells land in docs/bench512_cells/ and are merged afterwards
# by tools/merge512.py.
set -x
cd /root/repo
mkdir -p docs/bench512_cells
B() { timeout 2400 python tools/bench512.py "$@" ; }

# headline: flash holds at batch 8 where materialized attention cannot
B --batch 8 --iters 4 --skip-sample --skip-xla-attn --skip-noattn \
  --out docs/bench512_cells/b8_flash.json
B --batch 8 --iters 4 --skip-sample --skip-flash --skip-noattn \
  --out docs/bench512_cells/b8_xla.json

# continuity with the r02 artifact (batch 2, train + sample)
B --batch 2 --iters 6 --skip-xla-attn --skip-noattn \
  --out docs/bench512_cells/b2_flash.json
B --batch 2 --iters 6 --skip-flash --skip-noattn \
  --out docs/bench512_cells/b2_xla.json

# scaling points
B --batch 4 --iters 4 --skip-sample --skip-xla-attn --skip-noattn \
  --out docs/bench512_cells/b4_flash.json
B --batch 1 --iters 8 --skip-flash --skip-noattn \
  --out docs/bench512_cells/b1_xla.json
B --batch 1 --iters 8 --skip-xla-attn --skip-noattn \
  --out docs/bench512_cells/b1_flash.json

# reference-shaped config (attention off), capability ceiling comparison
B --batch 8 --iters 4 --skip-sample --skip-flash --skip-xla-attn \
  --out docs/bench512_cells/b8_noattn.json

python tools/merge512.py docs/bench512_cells docs/BENCH512_r05.json
