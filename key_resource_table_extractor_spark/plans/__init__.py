from .audit import explain_str, has_broadcast_join, has_pushed_filters  # noqa: F401
