from .stream_extract import run_stream_extraction  # noqa: F401
from .windowed_stats import (  # noqa: F401
    run_windowed_event_stats,
    windowed_event_stats,
)
from .stream_dedup import dedup_stream, run_stream_dedup  # noqa: F401
from .session_windows import (  # noqa: F401
    run_session_window_stats,
    session_window_stats,
)
from .stream_enrich import enrich_events, run_stream_enrich  # noqa: F401
