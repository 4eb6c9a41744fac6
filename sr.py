"""Super-resolution train/val driver (CLI-compatible with reference sr.py).

  python sr.py -p train -c configs/sr_sr3_16_128.json [-debug] [-enable_wandb] ...

Thin wiring only: the training skeleton lives in sr3_tpu.training.loops and
the batched mesh-wide validation/evaluation in sr3_tpu.training.evaluation.
"""

import argparse
import itertools
import logging

from sr3_tpu.utils.runtime import setup_runtime

setup_runtime()

import sr3_tpu.data as Data
import sr3_tpu.utils.config as Logger
from sr3_tpu.training import create_model
from sr3_tpu.training.evaluation import evaluate_sr, validate_in_train
from sr3_tpu.training.loops import train_loop
from sr3_tpu.utils.wandb_logger import WandbLogger

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str,
                        default="configs/sr_sr3_16_128.json",
                        help="JSON file for configuration")
    parser.add_argument("-p", "--phase", type=str, choices=["train", "val"],
                        default="train",
                        help="Run either train(training) or val(generation)")
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
    from sr3_tpu.parallel.mesh import is_primary

    # host-side sinks are primary-process-only under multi-host launches
    tb_logger = (
        SummaryWriter(log_dir=opt["path"]["tb_logger"])
        if SummaryWriter and is_primary() else None
    )

    wandb_logger = None
    if opt["enable_wandb"] and is_primary():
        import wandb

        wandb_logger = WandbLogger(opt)
        wandb.define_metric("validation/val_step")
        wandb.define_metric("epoch")
        wandb.define_metric("validation/*", step_metric="val_step")

    train_loader = val_loader = None
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train" and args.phase != "val":
            train_set = Data.create_dataset(dataset_opt, phase)
            train_loader = Data.create_dataloader(train_set, dataset_opt, phase)
        elif phase == "val":
            val_set = Data.create_dataset(dataset_opt, phase)
            val_loader = Data.create_dataloader(val_set, dataset_opt, phase)
    logger.info("Initial Dataset Finished")

    diffusion = create_model(opt)
    logger.info("Initial Model Finished")

    if opt["path"]["resume_state"]:
        logger.info(
            "Resuming training from epoch: {}, iter: {}.".format(
                diffusion.begin_epoch, diffusion.begin_step
            )
        )

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"][opt["phase"]], schedule_phase=opt["phase"]
    )

    if opt["phase"] == "train":
        val_counter = itertools.count()

        def on_validate(current_step, current_epoch):
            avg_psnr = validate_in_train(
                diffusion, val_loader, opt, current_step, current_epoch,
                tb_logger=tb_logger, wandb_logger=wandb_logger,
            )
            if wandb_logger:
                wandb_logger.log_metrics({
                    "validation/val_psnr": avg_psnr,
                    "validation/val_step": next(val_counter),
                })

        train_loop(diffusion, train_loader, opt, on_validate,
                   tb_logger=tb_logger, wandb_logger=wandb_logger)
    else:
        logger.info("Begin Model Evaluation.")
        evaluate_sr(
            diffusion, val_loader, opt,
            current_step=diffusion.begin_step,
            current_epoch=diffusion.begin_epoch,
            wandb_logger=wandb_logger,
        )


if __name__ == "__main__":
    main()
