from sr3_tpu.training.trainer import Trainer, create_model  # noqa: F401
