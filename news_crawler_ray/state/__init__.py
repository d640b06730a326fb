from .bloom import CountingBloom, keys_to_matrix  # noqa: F401
from .cuckoo import CuckooFilter  # noqa: F401
