from .ingest import (  # noqa: F401
    detect_fields,
    drop_empty_rows,
    excel_to_parquet,
    load_testdata,
    lookup_source_file,
    read_excel_df,
    read_files_union,
    read_xlsx_rows,
    schema_mapped_merge,
    with_row_index,
    write_json,
)
from .warc import (  # noqa: F401
    iter_warc_records,
    read_warc,
    read_warc_ranges,
    split_http_response,
    warc_pages,
    write_warc,
)
