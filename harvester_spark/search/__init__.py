"""Query side: BM25 kernel, top-k execution, search API semantics."""
