from .grits_like import grits_content  # noqa: F401
