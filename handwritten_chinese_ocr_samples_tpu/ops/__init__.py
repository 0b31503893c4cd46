from .ctc import ctc_loss_mean  # noqa: F401
from .decode import greedy_decode_device  # noqa: F401
