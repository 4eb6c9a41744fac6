from sr3_tpu.data.loader import create_dataloader, create_dataset  # noqa: F401
from sr3_tpu.data.lrhr import LRHRDataset  # noqa: F401
