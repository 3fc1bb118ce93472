from .grits_like import (  # noqa: F401
    grits_both,
    grits_content,
    grits_factored,
    grits_topology,
)
