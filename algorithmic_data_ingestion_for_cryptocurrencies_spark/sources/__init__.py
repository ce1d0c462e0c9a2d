from . import adapters, lake  # noqa: F401
