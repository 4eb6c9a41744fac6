"""Unconditional-generation train/val driver (CLI-compatible with reference
sample.py).

  python sample.py -p train -c configs/sample_sr3_128.json

Shares the training skeleton (sr3_tpu.training.loops) and the grouped
unconditional sampler (sr3_tpu.training.evaluation) with the SR driver.
"""

import argparse
import itertools
import logging

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import sr3_tpu.data as Data
import sr3_tpu.utils.config as Logger
from sr3_tpu.training import create_model
from sr3_tpu.parallel.mesh import is_primary
from sr3_tpu.training.evaluation import evaluate_uncond, sample_in_train
from sr3_tpu.training.loops import train_loop
from sr3_tpu.utils.wandb_logger import WandbLogger

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def parse_args():
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
    return parser.parse_args()


def main():
    args = parse_args()
    opt = Logger.dict_to_nonedict(Logger.parse(args))

    Logger.setup_logger(None, opt["path"]["log"], "train",
                        level=logging.INFO, screen=True)
    Logger.setup_logger("val", opt["path"]["log"], "val", level=logging.INFO)
    logger = logging.getLogger("base")
    logger.info(Logger.dict2str(opt))
    tb_logger = (
        SummaryWriter(log_dir=opt["path"]["tb_logger"])
        if SummaryWriter and is_primary() else None
    )

    wandb_logger = (WandbLogger(opt)
                    if opt["enable_wandb"] and is_primary() else None)

    train_loader = None
    sample_sum = 1
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train" and args.phase != "val":
            train_set = Data.create_dataset(dataset_opt, phase)
            train_loader = Data.create_dataloader(train_set, dataset_opt, phase)
        elif phase == "val":
            # sample count comes from the val set length
            # (reference sample.py:64)
            sample_sum = len(Data.create_dataset(dataset_opt, phase))
    logger.info("Initial Dataset Finished")

    diffusion = create_model(opt)
    logger.info("Initial Model Finished")

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"][opt["phase"]], schedule_phase=opt["phase"]
    )

    if opt["phase"] == "train":
        val_counter = itertools.count()

        def on_validate(current_step, current_epoch):
            sample_in_train(diffusion, sample_sum, opt, current_step,
                            current_epoch, wandb_logger=wandb_logger)
            if wandb_logger:
                wandb_logger.log_metrics(
                    {"validation/val_step": next(val_counter)}
                )

        train_loop(diffusion, train_loader, opt, on_validate,
                   tb_logger=tb_logger, wandb_logger=wandb_logger)
    else:
        logger.info("Begin Model Evaluation.")
        evaluate_uncond(diffusion, sample_sum, opt,
                        current_step=diffusion.begin_step,
                        wandb_logger=wandb_logger)
        logger.info("End of Model Evaluation.")


if __name__ == "__main__":
    main()
