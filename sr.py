"""Super-resolution train/val driver (reference sr.py).

CLI-compatible with the reference:
  python sr.py -p train -c configs/sr_sr3_16_128.json [-debug] [-enable_wandb] ...
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
        import wandb

        wandb_logger = WandbLogger(opt)
        wandb.define_metric("validation/val_step")
        wandb.define_metric("epoch")
        wandb.define_metric("validation/*", step_metric="val_step")
        val_step = 0
    else:
        wandb_logger = None

    # dataset
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

    current_step = diffusion.begin_step
    current_epoch = diffusion.begin_epoch
    n_iter = opt["train"]["n_iter"]

    if opt["path"]["resume_state"]:
        logger.info(
            "Resuming training from epoch: {}, iter: {}.".format(
                current_epoch, current_step
            )
        )

    diffusion.set_new_noise_schedule(
        opt["model"]["beta_schedule"][opt["phase"]], schedule_phase=opt["phase"]
    )

    if opt["phase"] == "train":
        # K fused steps per dispatch (train.steps_per_dispatch, default 1);
        # choose K dividing print/val/ckpt freqs to keep cadences exact
        spd = int(opt["train"]["steps_per_dispatch"] or 1)
        chunk = []
        while current_step < n_iter:
            current_epoch += 1
            from sr3_tpu.data.prefetch import device_prefetch

            for train_data in device_prefetch(train_loader, diffusion.mesh):
                chunk.append(train_data)
                if len(chunk) < spd:
                    continue
                current_step += spd
                if current_step > n_iter:
                    break
                if spd == 1:
                    diffusion.feed_data(chunk[0])
                    diffusion.optimize_parameters()
                else:
                    diffusion.optimize_parameters_multi(chunk)
                    diffusion.feed_data(chunk[-1])
                chunk = []
                # log
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

                # validation
                if current_step % opt["train"]["val_freq"] == 0:
                    avg_psnr = 0.0
                    idx = 0
                    result_path = "{}/{}".format(
                        opt["path"]["results"], current_epoch
                    )
                    os.makedirs(result_path, exist_ok=True)

                    diffusion.set_new_noise_schedule(
                        opt["model"]["beta_schedule"]["val"],
                        schedule_phase="val",
                    )
                    for val_data in val_loader:
                        idx += 1
                        diffusion.feed_data(val_data)
                        diffusion.test(continous=False)
                        visuals = diffusion.get_current_visuals()
                        sr_img = Metrics.tensor2img(visuals["SR"])
                        hr_img = Metrics.tensor2img(visuals["HR"])
                        lr_img = Metrics.tensor2img(visuals["LR"])
                        fake_img = Metrics.tensor2img(visuals["INF"])

                        Metrics.save_img(
                            hr_img, f"{result_path}/{current_step}_{idx}_hr.png"
                        )
                        Metrics.save_img(
                            sr_img, f"{result_path}/{current_step}_{idx}_sr.png"
                        )
                        Metrics.save_img(
                            lr_img, f"{result_path}/{current_step}_{idx}_lr.png"
                        )
                        Metrics.save_img(
                            fake_img,
                            f"{result_path}/{current_step}_{idx}_inf.png",
                        )
                        if tb_logger:
                            tb_logger.add_image(
                                f"Iter_{current_step}",
                                np.transpose(
                                    np.concatenate(
                                        (fake_img, sr_img, hr_img), axis=1
                                    ),
                                    [2, 0, 1],
                                ),
                                idx,
                            )
                        avg_psnr += Metrics.calculate_psnr(sr_img, hr_img)

                        if wandb_logger:
                            wandb_logger.log_image(
                                f"validation_{idx}",
                                np.concatenate(
                                    (fake_img, sr_img, hr_img), axis=1
                                ),
                            )

                    avg_psnr = avg_psnr / idx
                    diffusion.set_new_noise_schedule(
                        opt["model"]["beta_schedule"]["train"],
                        schedule_phase="train",
                    )
                    logger.info("# Validation # PSNR: {:.4e}".format(avg_psnr))
                    logger_val = logging.getLogger("val")
                    logger_val.info(
                        "<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}".format(
                            current_epoch, current_step, avg_psnr
                        )
                    )
                    if tb_logger:
                        tb_logger.add_scalar("psnr", avg_psnr, current_step)
                    if wandb_logger:
                        wandb_logger.log_metrics(
                            {
                                "validation/val_psnr": avg_psnr,
                                "validation/val_step": val_step,
                            }
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
        avg_psnr = 0.0
        avg_ssim = 0.0
        idx = 0
        result_path = "{}".format(opt["path"]["results"])
        os.makedirs(result_path, exist_ok=True)
        for val_data in val_loader:
            idx += 1
            diffusion.feed_data(val_data)
            diffusion.test(continous=True)
            visuals = diffusion.get_current_visuals()

            hr_img = Metrics.tensor2img(visuals["HR"])
            lr_img = Metrics.tensor2img(visuals["LR"])
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
                    sr_img,
                    f"{result_path}/{current_step}_{idx}_sr_process.png",
                )
                Metrics.save_img(
                    Metrics.tensor2img(visuals["SR"][-1:]),
                    f"{result_path}/{current_step}_{idx}_sr.png",
                )

            Metrics.save_img(hr_img, f"{result_path}/{current_step}_{idx}_hr.png")
            Metrics.save_img(lr_img, f"{result_path}/{current_step}_{idx}_lr.png")
            Metrics.save_img(fake_img, f"{result_path}/{current_step}_{idx}_inf.png")

            eval_psnr = Metrics.calculate_psnr(
                Metrics.tensor2img(visuals["SR"][-1:]), hr_img
            )
            eval_ssim = Metrics.calculate_ssim(
                Metrics.tensor2img(visuals["SR"][-1:]), hr_img
            )
            avg_psnr += eval_psnr
            avg_ssim += eval_ssim

            if wandb_logger and opt["log_eval"]:
                wandb_logger.log_eval_data(
                    fake_img,
                    Metrics.tensor2img(visuals["SR"][-1:]),
                    hr_img,
                    eval_psnr,
                    eval_ssim,
                )

        avg_psnr = avg_psnr / idx
        avg_ssim = avg_ssim / idx
        logger.info("# Validation # PSNR: {:.4e}".format(avg_psnr))
        logger.info("# Validation # SSIM: {:.4e}".format(avg_ssim))
        logger_val = logging.getLogger("val")
        logger_val.info(
            "<epoch:{:3d}, iter:{:8,d}> psnr: {:.4e}, ssim：{:.4e}".format(
                current_epoch, current_step, avg_psnr, avg_ssim
            )
        )
        if wandb_logger and opt["log_eval"]:
            wandb_logger.log_eval_table()


if __name__ == "__main__":
    main()
