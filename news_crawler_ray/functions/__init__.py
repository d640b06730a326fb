from . import urlnorm  # noqa: F401
