"""Inference-only driver over a prepared directory (reference infer.py).

  python infer.py -c configs/sr_sr3_16_128.json
"""

import argparse
import logging
import os

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import sr3_tpu.data as Data
import sr3_tpu.utils.config as Logger
import sr3_tpu.utils.metrics as Metrics
from sr3_tpu.training import create_model
from sr3_tpu.utils.wandb_logger import WandbLogger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str,
                        default="configs/sr_sr3_16_128.json")
    parser.add_argument("-p", "--phase", type=str, choices=["val"],
                        default="val")
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)
    parser.add_argument("-debug", "-d", action="store_true")
    parser.add_argument("-enable_wandb", action="store_true")
    parser.add_argument("-log_infer", action="store_true")
    args = parser.parse_args()

    opt = Logger.parse(args)
    opt = Logger.dict_to_nonedict(opt)

    Logger.setup_logger(None, opt["path"]["log"], "train",
                        level=logging.INFO, screen=True)
    Logger.setup_logger("val", opt["path"]["log"], "val", level=logging.INFO)
    logger = logging.getLogger("base")
    logger.info(Logger.dict2str(opt))

    if opt["enable_wandb"]:
        wandb_logger = WandbLogger(opt)
    else:
        wandb_logger = None

    # val dataset only (reference infer.py:46-51)
    val_loader = None
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "val":
            val_set = Data.create_dataset(dataset_opt, phase)
            val_loader = Data.create_dataloader(val_set, dataset_opt, phase)
    logger.info("Initial Dataset Finished")

    diffusion = create_model(opt)
    logger.info("Initial Model Finished")

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"]["val"], schedule_phase="val"
    )

    logger.info("Begin Model Inference.")
    current_step = 0
    current_epoch = 0
    idx = 0

    result_path = "{}".format(opt["path"]["results"])
    os.makedirs(result_path, exist_ok=True)
    for val_data in val_loader:
        idx += 1
        diffusion.feed_data(val_data)
        diffusion.test(continous=True)
        visuals = diffusion.get_current_visuals(need_LR=False)

        hr_img = Metrics.tensor2img(visuals["HR"])
        fake_img = Metrics.tensor2img(visuals["INF"])

        sr_img_mode = "grid"
        if sr_img_mode == "single":
            sr_img = visuals["SR"]
            sample_num = sr_img.shape[0]
            for iter_ in range(sample_num):
                Metrics.save_img(
                    Metrics.tensor2img(sr_img[iter_ : iter_ + 1]),
                    f"{result_path}/{current_step}_{idx}_sr_{iter_}.png",
                )
        else:
            sr_img = Metrics.tensor2img(visuals["SR"])
            Metrics.save_img(
                sr_img, f"{result_path}/{current_step}_{idx}_sr_process.png"
            )
            Metrics.save_img(
                Metrics.tensor2img(visuals["SR"][-1:]),
                f"{result_path}/{current_step}_{idx}_sr.png",
            )

        Metrics.save_img(hr_img, f"{result_path}/{current_step}_{idx}_hr.png")
        Metrics.save_img(fake_img, f"{result_path}/{current_step}_{idx}_inf.png")

        if wandb_logger and opt["log_infer"]:
            wandb_logger.log_eval_data(
                fake_img, Metrics.tensor2img(visuals["SR"][-1:]), hr_img
            )

    if wandb_logger and opt["log_infer"]:
        wandb_logger.log_eval_table(commit=True)
    logger.info("End of Model Inference.")


if __name__ == "__main__":
    main()
