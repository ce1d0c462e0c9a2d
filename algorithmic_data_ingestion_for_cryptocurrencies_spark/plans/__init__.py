from .inspect import explain_str, physical_plan, assert_pushed_filters  # noqa: F401
