from .stream_extract import run_stream_extraction  # noqa: F401
