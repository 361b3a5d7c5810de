from .incremental import (  # noqa: F401
    incremental_exact_dedup,
    minhash_corpus_index,
    replay_minhash_near_dup,
    stream_pages,
    streaming_er_assign,
    streaming_block_keys,
    streaming_minhash_near_dup,
    windowed_page_counts,
)
