from .explain import (  # noqa: F401
    explain_str,
    pushed_filters,
    read_schema_columns,
    scan_reads_only,
    wholestage_codegen_spans,
)
