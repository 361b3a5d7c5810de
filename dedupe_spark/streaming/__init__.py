from .incremental import (  # noqa: F401
    incremental_exact_dedup,
    stream_pages,
    streaming_block_keys,
    windowed_page_counts,
)
