from .metrics import levenshtein, cer_counts, AverageMeter  # noqa: F401
