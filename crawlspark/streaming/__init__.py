from .backoff_stream import streaming_backoff
from .politeness_stream import streaming_politeness
from .seeds import drain_seed_stream, merge_seeds, watch_seed_dir
from .seen_stream import streaming_url_seen

__all__ = ["watch_seed_dir", "drain_seed_stream", "merge_seeds",
           "streaming_politeness",
           "streaming_backoff",
           "streaming_url_seen"]
