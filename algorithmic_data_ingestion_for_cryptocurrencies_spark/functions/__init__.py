from . import cleaning, ml, payload, time_norm  # noqa: F401
