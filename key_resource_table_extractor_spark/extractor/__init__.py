from .pipeline import extract_pandas_batch, make_map_in_pandas_fn  # noqa: F401
