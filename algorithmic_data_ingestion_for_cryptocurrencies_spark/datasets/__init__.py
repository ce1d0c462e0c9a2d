from .training import build_training_matrix  # noqa: F401
