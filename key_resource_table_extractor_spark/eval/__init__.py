from .grits_like import grits_both, grits_content, grits_topology  # noqa: F401
