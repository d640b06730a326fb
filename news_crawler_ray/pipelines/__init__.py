from . import crawl  # noqa: F401
