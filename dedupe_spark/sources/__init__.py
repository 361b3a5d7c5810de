from .ingest import (  # noqa: F401
    detect_fields,
    load_testdata,
    read_files_union,
    schema_mapped_merge,
)
