#!/bin/bash
# Round-5 fewer-step sampler requal on a CONVERGED model (VERDICT r04
# item 7): ancestral vs DDIM eta=1 vs SDE-DPM++ eta=1 at 50 NFE, T=2000,
# on the 100k-step retrained checkpoint, full 6-image fixture val set,
# 6 paired noise chains per image per sampler.
set -ex
cd /root/repo

CKPT=$(ls -d experiments/traj100k_*/checkpoint/I100000_E*_gen | tail -1)
CKPT=${CKPT%_gen}
echo "checkpoint: $CKPT"

# full fixture val set (the shipped config truncates to data_len=2)
python - <<'EOF'
import json
from sr3_tpu.utils.config import load_json_with_comments
opt = load_json_with_comments("configs/_traj100k.json")
opt["datasets"]["val"]["data_len"] = -1
with open("/tmp/_traj100k_requal.json", "w") as f:
    json.dump(opt, f, indent=1)
EOF

timeout 7200 python tools/sampler_eval.py \
  --config /tmp/_traj100k_requal.json \
  --resume "$CKPT" \
  --timesteps 2000 \
  --samplers ddpm:2000 ddim:50 dpm++:50 \
  --eta 1 --reps 6 \
  --out docs/SAMPLER_REQUAL_r05.json
