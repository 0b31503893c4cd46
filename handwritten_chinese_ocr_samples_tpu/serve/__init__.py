from .engine import ServingEngine, preprocess_fixed_shape  # noqa: F401
