"""Structured Streaming extension (SURVEY.md §2.9, §7 step 10).

The reference is strictly batch over a closed corpus; these modules
run the same DAGs incrementally — a driver-north-star extension, not
a parity obligation.
"""
