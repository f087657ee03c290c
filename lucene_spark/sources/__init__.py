from .pages import (  # noqa: F401
    PAGES_DDL,
    REQUIRED_PAGE_COLS,
    SourceSpec,
    has_iceberg,
    parse_source,
    read_pages,
)
