"""Device kernels: batched binary search, ragged gather, run-length scoring,
device sort/merge for term tables, and top-k selection."""

from ..utils.jaxsetup import setup as _setup

_setup()

from .binsearch import lower_bound, upper_bound, member_count
from .search_kernel import (
    SearchParams,
    search_segments,
    make_search_fn,
)
from .build import sort_postings, merge_postings_live

__all__ = [
    "lower_bound",
    "upper_bound",
    "member_count",
    "SearchParams",
    "search_segments",
    "make_search_fn",
    "sort_postings",
    "merge_postings_live",
]
