"""Extension queries (LLM-data-pipeline operators): dedup, similarity
search, text analysis, multimodal plumbing, streaming restatements.

Registered into the same REGISTRY as the core relational queries.
Populated module-by-module; importing this module triggers
registration side effects.
"""

from __future__ import annotations

# Extension registrations land here as the operators are implemented.
