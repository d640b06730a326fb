from .pagestore import read_pagestore, read_table_dir  # noqa: F401
