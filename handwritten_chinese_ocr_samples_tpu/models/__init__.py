from .registry import get_model_info, list_models, register_model  # noqa: F401
from .hctr import HCTRModel  # noqa: F401
