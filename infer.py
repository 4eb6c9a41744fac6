"""Inference-only driver over a prepared directory (CLI-compatible with
reference infer.py).

  python infer.py -c configs/sr_sr3_16_128.json

Builds the val dataset only and runs batched mesh-wide SR inference
(sr3_tpu.training.evaluation.infer_sr) with process-grid outputs.
"""

import argparse
import logging

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import sr3_tpu.data as Data
import sr3_tpu.utils.config as Logger
from sr3_tpu.training import create_model
from sr3_tpu.parallel.mesh import is_primary
from sr3_tpu.training.evaluation import infer_sr
from sr3_tpu.utils.wandb_logger import WandbLogger


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str,
                        default="configs/sr_sr3_16_128.json")
    parser.add_argument("-p", "--phase", type=str, choices=["val"],
                        default="val")
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)
    parser.add_argument("-debug", "-d", action="store_true")
    parser.add_argument("-enable_wandb", action="store_true")
    parser.add_argument("-log_infer", action="store_true")
    return parser.parse_args()


def main():
    args = parse_args()
    opt = Logger.dict_to_nonedict(Logger.parse(args))

    Logger.setup_logger(None, opt["path"]["log"], "train",
                        level=logging.INFO, screen=True)
    Logger.setup_logger("val", opt["path"]["log"], "val", level=logging.INFO)
    logger = logging.getLogger("base")
    logger.info(Logger.dict2str(opt))

    wandb_logger = (WandbLogger(opt)
                    if opt["enable_wandb"] and is_primary() else None)

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
    infer_sr(diffusion, val_loader, opt, wandb_logger=wandb_logger)
    logger.info("End of Model Inference.")


if __name__ == "__main__":
    main()
