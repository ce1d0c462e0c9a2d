from . import lake  # noqa: F401
