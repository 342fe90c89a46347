"""Extension queries: dedup, similarity search, text analysis,
multimodal plumbing, and batch-equivalents of the streaming ops.

Populated incrementally; see operators/ for the implementations.
"""

from __future__ import annotations
