"""Offline PSNR/SSIM scoring of a results directory (reference eval.py).

  python eval.py -p experiments/<run>/results

Fixes the reference's latent bug where the sanity index was derived from the
wrong filename so the assert could never fire (eval.py:23-24; SURVEY §7).
"""

import argparse
import glob

import sr3_tpu.utils.metrics as Metrics


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--path", type=str,
                        default="experiments/basic_sr_ffhq_210809_142238/results")
    args = parser.parse_args()
    real_names = sorted(glob.glob(f"{args.path}/*_hr.png"))
    fake_names = sorted(glob.glob(f"{args.path}/*_sr.png"))

    avg_psnr = 0.0
    avg_ssim = 0.0
    idx = 0
    for rname, fname in zip(real_names, fake_names):
        idx += 1
        ridx = rname.rsplit("_hr", 1)[0].rsplit("/", 1)[-1]
        fidx = fname.rsplit("_sr", 1)[0].rsplit("/", 1)[-1]
        assert ridx == fidx, (
            f"Image ridx:{ridx}!=fidx:{fidx}"
        )

        hr_img = Metrics.load_img(rname)
        sr_img = Metrics.load_img(fname)
        psnr = Metrics.calculate_psnr(sr_img, hr_img)
        ssim = Metrics.calculate_ssim(sr_img, hr_img)
        avg_psnr += psnr
        avg_ssim += ssim
        if idx % 20 == 0:
            print(f"Image:{idx}, PSNR:{psnr:.4f}, SSIM:{ssim:.4f}")

    avg_psnr = avg_psnr / idx
    avg_ssim = avg_ssim / idx

    print(f"# Validation # PSNR: {avg_psnr:.4e}")
    print(f"# Validation # SSIM: {avg_ssim:.4e}")


if __name__ == "__main__":
    main()
