from .tokenizer import Tokenizer  # noqa: F401
from .model import CharTransformerLM  # noqa: F401
from .infer import LMScorer  # noqa: F401
