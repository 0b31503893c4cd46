from .dataset import ImageDataset, load_and_resize_image, read_resize_image  # noqa: F401
from .bucketing import (  # noqa: F401
    AlignCollate, BucketSpec, default_buckets, normalize_pad_batch,
)
from .loader import DataLoader  # noqa: F401
