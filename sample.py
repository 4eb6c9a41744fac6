"""Unconditional-generation train/val driver (reference sample.py).

  python sample.py -p train -c configs/sample_sr3_128.json
"""

import argparse
import logging
import os

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import numpy as np

import sr3_tpu.data as Data
import sr3_tpu.utils.config as Logger
import sr3_tpu.utils.metrics as Metrics
from sr3_tpu.training import create_model
from sr3_tpu.utils.wandb_logger import WandbLogger

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str,
                        default="configs/sample_sr3_128.json")
    parser.add_argument("-p", "--phase", type=str, choices=["train", "val"],
                        default="train")
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)
    parser.add_argument("-debug", "-d", action="store_true")
    parser.add_argument("-enable_wandb", action="store_true")
    parser.add_argument("-log_wandb_ckpt", action="store_true")
    parser.add_argument("-log_eval", action="store_true")
    args = parser.parse_args()

    opt = Logger.parse(args)
    opt = Logger.dict_to_nonedict(opt)

    Logger.setup_logger(None, opt["path"]["log"], "train",
                        level=logging.INFO, screen=True)
    Logger.setup_logger("val", opt["path"]["log"], "val", level=logging.INFO)
    logger = logging.getLogger("base")
    logger.info(Logger.dict2str(opt))
    tb_logger = (
        SummaryWriter(log_dir=opt["path"]["tb_logger"]) if SummaryWriter else None
    )

    if opt["enable_wandb"]:
        wandb_logger = WandbLogger(opt)
        val_step = 0
    else:
        wandb_logger = None

    train_loader = val_loader = None
    sample_sum = 1
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train" and args.phase != "val":
            train_set = Data.create_dataset(dataset_opt, phase)
            train_loader = Data.create_dataloader(train_set, dataset_opt, phase)
        elif phase == "val":
            val_set = Data.create_dataset(dataset_opt, phase)
            val_loader = Data.create_dataloader(val_set, dataset_opt, phase)
            # sample count from val data_len (reference sample.py:64)
            sample_sum = len(val_set)
    logger.info("Initial Dataset Finished")

    diffusion = create_model(opt)
    logger.info("Initial Model Finished")

    current_step = diffusion.begin_step
    current_epoch = diffusion.begin_epoch
    n_iter = opt["train"]["n_iter"]

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"][opt["phase"]], schedule_phase=opt["phase"]
    )

    if opt["phase"] == "train":
        while current_step < n_iter:
            current_epoch += 1
            from sr3_tpu.data.prefetch import device_prefetch

            for train_data in device_prefetch(train_loader, diffusion.mesh):
                current_step += 1
                if current_step > n_iter:
                    break
                diffusion.feed_data(train_data)
                diffusion.optimize_parameters()

                if current_step % opt["train"]["print_freq"] == 0:
                    logs = diffusion.get_current_log()
                    message = "<epoch:{:3d}, iter:{:8,d}> ".format(
                        current_epoch, current_step
                    )
                    for k, v in logs.items():
                        message += "{:s}: {:.4e} ".format(k, v)
                        if tb_logger:
                            tb_logger.add_scalar(k, v, current_step)
                    logger.info(message)
                    if wandb_logger:
                        wandb_logger.log_metrics(logs)

                # validation: unconditional samples (reference sample.py:100-128)
                if current_step % opt["train"]["val_freq"] == 0:
                    result_path = "{}/{}".format(
                        opt["path"]["results"], current_epoch
                    )
                    os.makedirs(result_path, exist_ok=True)
                    diffusion.set_new_noise_schedule(
                        opt["model"]["beta_schedule"]["val"],
                        schedule_phase="val",
                    )
                    for idx in range(1, sample_sum + 1):
                        diffusion.sample(batch_size=1, continous=False)
                        visuals = diffusion.get_current_visuals(sample=True)
                        sample_img = Metrics.tensor2img(visuals["SAM"])
                        Metrics.save_img(
                            sample_img,
                            f"{result_path}/{current_step}_{idx}_sample.png",
                        )
                        if wandb_logger:
                            wandb_logger.log_image(
                                f"sample_{idx}", sample_img
                            )
                    diffusion.set_new_noise_schedule(
                        opt["model"]["beta_schedule"]["train"],
                        schedule_phase="train",
                    )
                    if wandb_logger:
                        wandb_logger.log_metrics(
                            {"validation/val_step": val_step}
                        )
                        val_step += 1

                if current_step % opt["train"]["save_checkpoint_freq"] == 0:
                    logger.info("Saving models and training states.")
                    diffusion.save_network(current_epoch, current_step)
                    if wandb_logger and opt["log_wandb_ckpt"]:
                        wandb_logger.log_checkpoint(current_epoch, current_step)

            if wandb_logger:
                wandb_logger.log_metrics({"epoch": current_epoch - 1})
        diffusion.wait_for_checkpoints()
        logger.info("End of training.")
    else:
        logger.info("Begin Model Evaluation.")
        result_path = "{}".format(opt["path"]["results"])
        os.makedirs(result_path, exist_ok=True)
        for idx in range(1, sample_sum + 1):
            diffusion.sample(batch_size=1, continous=True)
            visuals = diffusion.get_current_visuals(sample=True)

            # full process grid + final sample (reference sample.py:132-162)
            sample_img = Metrics.tensor2img(visuals["SAM"])
            Metrics.save_img(
                sample_img, f"{result_path}/{current_step}_{idx}_sample_process.png"
            )
            Metrics.save_img(
                Metrics.tensor2img(visuals["SAM"][-1:]),
                f"{result_path}/{current_step}_{idx}_sample.png",
            )
            if wandb_logger:
                wandb_logger.log_image(
                    f"sample_{idx}",
                    Metrics.tensor2img(visuals["SAM"][-1:]),
                )
        logger.info("End of Model Evaluation.")


if __name__ == "__main__":
    main()
