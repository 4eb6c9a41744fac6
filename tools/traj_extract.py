"""Extract the train-loss / val-PSNR trajectory from a train.log.

Provenance artifact for the round-5 converged-model sampler requal: shows
the 100k-step retrain actually converged before samplers were compared.

  python tools/traj_extract.py experiments/traj100k_*/logs/train.log \
      --out docs/TRAJ100K_r05.json
"""

import argparse
import json
import re
import sys

STEP_RE = re.compile(
    r"<epoch:\s*(\d+), iter:\s*([\d,]+)> l_pix: ([\d.e+-]+)"
    r" step_time_ms: ([\d.e+-]+) imgs_per_sec: ([\d.e+-]+)")
VAL_RE = re.compile(r"<epoch:\s*(\d+), iter:\s*([\d,]+)> psnr: ([\d.e+-]+)")


def parse(path):
    loss, val = [], []
    with open(path) as f:
        for line in f:
            m = STEP_RE.search(line)
            if m:
                loss.append({
                    "iter": int(m.group(2).replace(",", "")),
                    "l_pix": float(m.group(3)),
                    "step_ms": round(float(m.group(4)), 2),
                    "imgs_per_sec": round(float(m.group(5)), 1),
                })
                continue
            m = VAL_RE.search(line)
            if m:
                val.append({
                    "iter": int(m.group(2).replace(",", "")),
                    "psnr_db": round(float(m.group(3)), 2),
                })
    return {"loss": loss, "val": val}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    traj = parse(args.log)
    traj["log"] = args.log
    if traj["loss"]:
        traj["final_l_pix"] = traj["loss"][-1]["l_pix"]
    if traj["val"]:
        traj["final_psnr_db"] = traj["val"][-1]["psnr_db"]
    line = json.dumps(traj, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
        print(f"# wrote {args.out}", file=sys.stderr)
    else:
        print(line)


if __name__ == "__main__":
    main()
