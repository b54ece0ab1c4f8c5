"""Structured Streaming surface over the events table (SURVEY.md §2.8).

The reference is strictly batch (button-triggered, mainTesting.py:842-847);
this package is net-new north-star capability. Batch-equivalent versions
of every streaming transform register as oracle-checked queries; the
streaming execution itself is exercised in tests with file sources +
availableNow triggers.
"""

from . import events  # noqa: F401
