from sr3_tpu.ops.attention import attention_flash, attention_xla, self_attention  # noqa: F401
from sr3_tpu.ops.groupnorm import group_norm_swish  # noqa: F401
