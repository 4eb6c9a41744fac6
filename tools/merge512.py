"""Merge per-cell bench512 artifacts into one round artifact.

Each cell file is one JSON object from `tools/bench512.py --out` (keys like
attn_flash_train_ms plus `batch`/`backend`). The merged artifact groups
cells by batch so the README table reads straight off it.

  python tools/merge512.py docs/bench512_cells docs/BENCH512_r05.json
"""

import json
import os
import sys


def main():
    cell_dir, out = sys.argv[1], sys.argv[2]
    by_batch = {}
    backend = None
    for name in sorted(os.listdir(cell_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(cell_dir, name)) as f:
            cell = json.load(f)
        backend = cell.pop("backend", backend)
        b = cell.pop("batch")
        by_batch.setdefault(str(b), {}).update(cell)
    merged = {
        "resolution": 512,
        "config": "configs/sr_sr3_64_512_attn.json",
        "backend": backend,
        "by_batch": dict(sorted(by_batch.items(), key=lambda kv: int(kv[0]))),
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(json.dumps(merged, indent=1))


if __name__ == "__main__":
    main()
