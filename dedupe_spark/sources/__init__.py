from .ingest import (  # noqa: F401
    detect_fields,
    drop_empty_rows,
    load_testdata,
    lookup_source_file,
    read_files_union,
    schema_mapped_merge,
    with_row_index,
    write_json,
)
