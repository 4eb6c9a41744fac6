from sr3_tpu.models.diffusion import GaussianDiffusion  # noqa: F401
from sr3_tpu.models.networks import define_G, init_params  # noqa: F401
from sr3_tpu.models.schedule import Schedule, make_beta_schedule, make_schedule  # noqa: F401
from sr3_tpu.models.unet import UNet  # noqa: F401
