from .beam_host import BeamSearchDecoder, BeamSearchConfig  # noqa: F401
from .lm_interface import LMBackend, NullLM  # noqa: F401
