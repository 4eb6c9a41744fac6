"""Offline FID / Inception-Score scoring of a results directory.

The reference README's metric table has FID/IS columns it never computes
(no FID/IS code exists in /root/reference — SURVEY §6); this tool closes
that gap with the pluggable-extractor design of sr3_tpu/utils/fid.py.

  # proxy FID (seeded random-feature extractor, runs on TPU) over the
  # reference's results layout: *_sr.png generated vs *_hr.png real
  python tools/fid_eval.py -p experiments/<run>/results

  # two arbitrary directories
  python tools/fid_eval.py --real /path/hr_dir --fake /path/sr_dir

  # canonical FID from precomputed InceptionV3 features (exported on a
  # machine with egress): npz with arrays 'real' and 'fake' (N, D), or
  # 'fake' + precomputed real stats 'mu'/'sigma'
  python tools/fid_eval.py --features-npz feats.npz

Proxy-FID scores are comparable only across runs with the same
--seed/--width; they are NOT on the published Inception-FID scale.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_dir(paths):
    import sr3_tpu.utils.metrics as Metrics

    return [Metrics.load_img(p) for p in paths]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", type=str, default=None,
                    help="results dir with *_hr.png / *_sr.png pairs")
    ap.add_argument("--real", type=str, default=None)
    ap.add_argument("--fake", type=str, default=None)
    ap.add_argument("--features-npz", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--extractor", choices=["proxy", "inception"],
                    default="proxy",
                    help="'inception': torchvision InceptionV3 (2048-d "
                         "pooled features, published-scale FID + real IS); "
                         "weights via --weights or SR3_INCEPTION_WEIGHTS, "
                         "offline-tolerant")
    ap.add_argument("--weights", type=str, default=None,
                    help="local torchvision inception_v3 state_dict path")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--is-splits", type=int, default=10)
    args = ap.parse_args(argv)

    import numpy as np

    from sr3_tpu.utils import fid as F

    if args.features_npz:
        z = np.load(args.features_npz)
        fake = z["fake"]
        if "real" in z:
            stats_r = F.activation_statistics(z["real"])
        else:
            stats_r = (z["mu"], z["sigma"])
        score = F.frechet_distance(*stats_r, *F.activation_statistics(fake))
        print(f"# FID (provided features): {score:.4f}")
        if "logits" in z:  # classifier logits for the generated set
            m, s = F.inception_score(z["logits"], splits=args.is_splits)
            print(f"# IS: {m:.4f} +/- {s:.4f}")
        return

    if args.path:
        real_paths = sorted(glob.glob(f"{args.path}/*_hr.png"))
        fake_paths = sorted(glob.glob(f"{args.path}/*_sr.png"))
    elif args.real and args.fake:
        real_paths = sorted(
            glob.glob(os.path.join(args.real, "*.png"))
            + glob.glob(os.path.join(args.real, "*.jpg"))
        )
        fake_paths = sorted(
            glob.glob(os.path.join(args.fake, "*.png"))
            + glob.glob(os.path.join(args.fake, "*.jpg"))
        )
    else:
        ap.error("need -p, or --real + --fake, or --features-npz")
    if len(real_paths) < 2 or len(fake_paths) < 2:
        raise SystemExit(
            f"need >=2 images per side, got {len(real_paths)} real / "
            f"{len(fake_paths)} fake"
        )

    if args.extractor == "inception":
        extractor = F.InceptionV3FeatureExtractor(weights=args.weights)
        feats_r = extractor(np.stack(_load_dir(real_paths)), args.batch)
        feats_f, logits_f = extractor.features_and_logits(
            np.stack(_load_dir(fake_paths)), args.batch
        )
        score = F.fid_from_features(feats_r, feats_f)
        tag = ("inception-FID" if extractor.canonical
               else "inception-FID (RANDOM INIT — run-local scale only)")
        print(f"# {tag} ({len(real_paths)} real / "
              f"{len(fake_paths)} fake): {score:.4f}")
        m, sd = F.inception_score(logits_f, splits=args.is_splits)
        print(f"# IS: {m:.4f} +/- {sd:.4f}")
        return

    extractor = F.RandomFeatureExtractor(seed=args.seed, width=args.width)
    feats_r = extractor(np.stack(_load_dir(real_paths)), args.batch)
    feats_f = extractor(np.stack(_load_dir(fake_paths)), args.batch)
    score = F.fid_from_features(feats_r, feats_f)
    print(f"# proxy-FID (seed {args.seed}, width {args.width}, "
          f"{len(real_paths)} real / {len(fake_paths)} fake): {score:.4f}")
    # No proxy-IS: IS needs classifier class-probabilities; random features
    # carry no class semantics. Provide logits via --features-npz instead.


if __name__ == "__main__":
    main()
