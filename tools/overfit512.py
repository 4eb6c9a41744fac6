"""Learning validation at 512x512 with flash attention ON (VERDICT r2 #5).

Short hardware overfit on the bundled 64->512 fixtures with the
sr_sr3_64_512_attn config — Pallas flash attention forward AND backward
kernels (ops/attention.py) plus remat in the training loop at the 4096- and
1024-token feature maps, where the reference had to disable attention
entirely to fit an 11GB 1080Ti (config/sr_sr3_64_512.json:55-59,
README.md:45). Shows loss decreasing and val PSNR improving over the
untrained model, making the flash backward kernels load-bearing rather
than merely benched.

Run:  python tools/overfit512.py [n_iter]   (TPU; ~10 min at 1500 steps)
Writes docs/OVERFIT512_r03.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sr3_tpu.utils.runtime import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402
import numpy as np  # noqa: E402

N_ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
SPD = 10  # steps per fused dispatch
VAL_T = 100  # short val schedule: enough steps for a meaningful PSNR signal


def main():
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import sr3_tpu.utils.metrics as Metrics
    from sr3_tpu.data.loader import create_dataloader, create_dataset
    from sr3_tpu.training.trainer import Trainer
    from sr3_tpu.utils.config import dict_to_nonedict, load_json_with_comments

    opt = load_json_with_comments("configs/sr_sr3_64_512_attn.json")
    for phase in ("train", "val"):
        opt["datasets"][phase]["dataroot"] = "dataset/fixtures_64_512"
        opt["datasets"][phase]["data_len"] = -1
    opt["datasets"]["val"]["mode"] = "LRHR"
    opt["train"]["optimizer"]["lr"] = 1e-4  # overfit demo (config ships 3e-6)
    opt["phase"] = "train"
    opt = dict_to_nonedict(opt)

    os.makedirs("/tmp/overfit512_ckpt", exist_ok=True)
    opt["path"]["checkpoint"] = "/tmp/overfit512_ckpt"

    train_set = create_dataset(opt["datasets"]["train"], "train")
    loader = create_dataloader(train_set, opt["datasets"]["train"], "train")
    val_set = create_dataset(opt["datasets"]["val"], "val")

    t = Trainer(opt)
    val_sched = {"schedule": "linear", "n_timestep": VAL_T,
                 "linear_start": 1e-6, "linear_end": 1e-2}

    items = [val_set[i] for i in range(len(val_set))]
    base_key = jax.random.PRNGKey(42)
    keys = np.asarray(
        jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            np.arange(2))
    )

    def eval_psnr(tag):
        t.set_new_noise_schedule(val_sched, schedule_phase=f"val_{tag}")
        psnrs = []
        for g0 in range(0, len(items), 2):  # groups of 2: 512^2 chain memory
            group = items[g0:g0 + 2]
            xs = np.stack([it["SR"] for it in group])
            out = t.test_batched(xs, keys[: len(group)], continous=False)
            for it, sr in zip(group, out):
                psnrs.append(Metrics.calculate_psnr(
                    Metrics.tensor2img(sr), Metrics.tensor2img(it["HR"])))
        return float(np.mean(psnrs))

    print("evaluating untrained model...", flush=True)
    t0 = time.time()
    psnr_before = eval_psnr("pre")
    print(f"PSNR before: {psnr_before:.3f} dB ({time.time()-t0:.0f}s)",
          flush=True)

    t.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["train"], schedule_phase="train")
    losses = []
    step = 0
    t0 = time.time()
    chunk = []
    while step < N_ITER:
        for batch in loader:
            chunk.append(batch)
            if len(chunk) < SPD:
                continue
            t.optimize_parameters_multi(chunk)
            step += len(chunk)
            chunk = []
            if step % 100 == 0:
                loss = float(np.asarray(jax.device_get(
                    t.log_dict["l_pix"])))
                losses.append({"step": step, "l_pix": round(loss, 5)})
                dt = (time.time() - t0) / step * 1e3
                print(f"step {step}: l_pix {loss:.5f} ({dt:.0f} ms/step)",
                      flush=True)
            if step >= N_ITER:
                break

    print("evaluating trained model...", flush=True)
    psnr_after = eval_psnr("post")
    print(f"PSNR after: {psnr_after:.3f} dB", flush=True)

    out = {
        "config": "sr_sr3_64_512_attn (flash attention fwd+bwd + remat, "
                  "attn at 32x32 and 64x64 feature maps)",
        "data": "dataset/fixtures_64_512 (4 synthetic triplets)",
        "n_iter": N_ITER,
        "lr": 1e-4,
        "batch": opt["datasets"]["train"]["batch_size"],
        "val_timesteps": VAL_T,
        "loss_curve": losses,
        "psnr_before_db": round(psnr_before, 3),
        "psnr_after_db": round(psnr_after, 3),
        "ms_per_train_step": round((time.time() - t0) / max(step, 1) * 1e3, 1),
        "backend": jax.default_backend(),
    }
    with open("docs/OVERFIT512_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
