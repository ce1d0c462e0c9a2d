from . import cleaning, ml, time_norm  # noqa: F401
