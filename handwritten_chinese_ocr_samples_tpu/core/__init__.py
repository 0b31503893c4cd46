from .codec import CTCCodec, load_chars_list  # noqa: F401
